package graft.operators

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import graft.core.Histogram

/** The typed UDAF surface promised in SURVEY §2.11 — every aggregator is
  * commutative + associative (safe under partial aggregation on any
  * partitioning), which is why the H1 decay does NOT live here: decay is
  * fold-order-dependent, so it happens once at state-merge time
  * (ProfileStore.update), and in-window histograms aggregate exact counts
  * that normalize at `finish`.
  */
object Aggregators {

  /** Builds a Histogram from (bucket, weight) observations: counts sum
    * (map-side combine applies), relative frequencies materialize once at
    * finish. The scalable form of the reference's in-reduce histogram
    * construction (HogSFlow.scala:1401-1423).
    */
  class HistogramAggregator(name: String)
      extends Aggregator[(String, Long), Map[String, Long], Histogram] {
    def zero: Map[String, Long] = Map.empty
    def reduce(acc: Map[String, Long], x: (String, Long)): Map[String, Long] =
      acc.updated(x._1, acc.getOrElse(x._1, 0L) + x._2)
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }
    def finish(acc: Map[String, Long]): Histogram = {
      val total = acc.values.sum
      Histogram(name, total,
        if (total == 0) Map.empty
        else acc.map { case (k, v) => k -> v.toDouble / total })
    }
    def bufferEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
    def outputEncoder: Encoder[Histogram] = Encoders.product[Histogram]
  }

  /** Bucket-wise max over bucket→value maps (H2, Histograms.scala:141-168)
    * — max is associative/commutative, so this one IS the reference
    * semantics exactly.
    */
  class MergeMaxAggregator
      extends Aggregator[Map[String, Double], Map[String, Double], Map[String, Double]] {
    def zero: Map[String, Double] = Map.empty
    def reduce(a: Map[String, Double], x: Map[String, Double]): Map[String, Double] = merge(a, x)
    def merge(a: Map[String, Double], b: Map[String, Double]): Map[String, Double] =
      (a.keySet ++ b.keySet).iterator.map { k =>
        k -> math.max(a.getOrElse(k, 0.0), b.getOrElse(k, 0.0))
      }.toMap
    def finish(acc: Map[String, Double]): Map[String, Double] = acc
    def bufferEncoder: Encoder[Map[String, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()
    def outputEncoder: Encoder[Map[String, Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Double]]()
  }

  /** Bounded top-K collector (O2 / SURVEY §7.4 risk 2): keeps at most `k`
    * (sortKey, payload) pairs, largest sortKey first — the
    * memory-bounded replacement for the reference's unbounded flowSet
    * HashSet. Buffer size is O(k) regardless of group cardinality, so a
    * hot key at 100 TB costs k entries, not millions.
    */
  class TopKAggregator(k: Int)
      extends Aggregator[(Long, String), Seq[(Long, String)], Seq[String]] {
    // explicit predicate order (key desc, payload asc) rather than
    // sortBy(-key): negating Long.MinValue overflows back to MinValue,
    // which would silently sort the highest-priority row last
    private def lt(a: (Long, String), b: (Long, String)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Long, String)]): Seq[(Long, String)] =
      s.sortWith(lt).take(k)
    def zero: Seq[(Long, String)] = Seq.empty
    def reduce(acc: Seq[(Long, String)], x: (Long, String)): Seq[(Long, String)] =
      trim(acc :+ x)
    def merge(a: Seq[(Long, String)], b: Seq[(Long, String)]): Seq[(Long, String)] =
      trim(a ++ b)
    def finish(acc: Seq[(Long, String)]): Seq[String] = acc.map(_._2)
    def bufferEncoder: Encoder[Seq[(Long, String)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String)]]()
    def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Top-K with an explicit tiebreak column and an arbitrary payload:
    * keeps at most `k` (sortKey, tie, payload) rows ordered by
    * (sortKey desc, tie asc) and finishes to the payloads in that order.
    * This is [[TopKAggregator]] with the total order the per-alert flow
    * render needs (bytes desc, then the flow-identity tuple ascending —
    * Detectors.flowDetail), so the render's group limit runs as a
    * map-side-combining hash aggregate instead of a window: no per-task
    * sort of the full flow stream, O(k) state per alerted key. The former
    * row_number window form relied on InsertWindowGroupLimit's partial
    * pass, which still SORTS each map task's whole input before limiting
    * — 7.9 GB of externalized sort at the 100× fixture; this buffer never
    * externalizes anything.
    *
    * The payload is generic so callers can buffer RAW fields (a narrow
    * struct) and run expensive rendering AFTER selection, over the ≤k
    * winners only — formatting the whole input stream inside the
    * aggregate cost GraftApp a measured +14% end-to-end at the 100×
    * fixture when the payload was the pre-rendered line.
    *
    * The common-case reduce is O(1): a full buffer rejects any row not
    * beating its last entry before touching the sorted sequence. Ties
    * compare with Java String order — identical to Spark/DuckDB binary
    * string comparison for the ASCII flow fields this orders. The sort
    * uses the same `lt` predicate as the fast-path rejection (never key
    * negation, which overflows at Long.MinValue).
    */
  class TopKPayloadAggregator[P: TypeTag](k: Int)
      extends Aggregator[(Long, String, P), Seq[(Long, String, P)], Seq[P]] {
    private def lt(a: (Long, String, P), b: (Long, String, P)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def trim(s: Seq[(Long, String, P)]): Seq[(Long, String, P)] =
      s.sortWith(lt).take(k)
    def zero: Seq[(Long, String, P)] = Seq.empty
    def reduce(acc: Seq[(Long, String, P)], x: (Long, String, P)): Seq[(Long, String, P)] =
      if (acc.length == k && !lt(x, acc.last)) acc else trim(acc :+ x)
    def merge(a: Seq[(Long, String, P)], b: Seq[(Long, String, P)]): Seq[(Long, String, P)] =
      if (a.isEmpty) b else if (b.isEmpty) a else trim(a ++ b)
    def finish(acc: Seq[(Long, String, P)]): Seq[P] = acc.map(_._3)
    def bufferEncoder: Encoder[Seq[(Long, String, P)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, String, P)]]()
    def outputEncoder: Encoder[Seq[P]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[P]]()
  }

  /** KMV (k-minimum-values) sketch accumulator: the k smallest DISTINCT
    * hash values of a group, ascending — the mergeable building block of
    * theta-style set sketches (Beyer et al., SIGMOD'07; the DataSketches
    * theta family). Unlike HLL registers (a13/a28), two KMV sketches
    * support set INTERSECTION estimation: with θ = min of the two kth
    * values, |A∩B| ≈ |{h ∈ K_A ∩ K_B : h < θ}| · M/θ over hash domain
    * M. Fully deterministic given the hash function — both the sketch
    * contents and the estimate hash-match an oracle engine computing the
    * same k-smallest set.
    *
    * Buffer is O(k) regardless of group cardinality (partial aggregation
    * keeps k values per map task, merges keep k), so a 100 TB group
    * costs k longs — the same boundedness contract as [[TopKAggregator]].
    */
  class MinKAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private def trim(s: Seq[Long]): Seq[Long] = s.distinct.sorted.take(k)
    def zero: Seq[Long] = Seq.empty
    def reduce(acc: Seq[Long], h: Long): Seq[Long] =
      // cheap pre-checks keep the common case allocation-free: a value
      // past the current kth can never enter a full sketch
      if (acc.length == k && h >= acc.last) acc
      else if (acc.contains(h)) acc
      else trim(acc :+ h)
    def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)
    def finish(acc: Seq[Long]): Seq[Long] = acc
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
