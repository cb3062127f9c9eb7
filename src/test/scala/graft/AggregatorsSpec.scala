package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Histogram, HistogramAlgebra}
import graft.operators.Aggregators

/** Typed Aggregator behavior: partial-aggregation safety (commutative +
  * associative merge) and the bounded-memory top-K contract.
  */
class AggregatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("HistogramAggregator builds normalized histograms from observations") {
    import spark.implicits._
    val obs = Seq(("k1", "a", 3L), ("k1", "b", 1L), ("k2", "c", 5L))
      .toDF("k", "bucket", "w").as[(String, String, Long)]
    val agg = udaf(new Aggregators.HistogramAggregator("h"))
    val out = obs.toDF("k", "bucket", "w")
      .groupBy("k").agg(agg(col("bucket"), col("w")).as("h"))
      .select(col("k"), col("h.size"), col("h.buckets"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getMap[String, Double](2))).toMap
    assert(out("k1")._1 == 4L)
    assert(math.abs(out("k1")._2("a") - 0.75) < 1e-12)
    assert(out("k2")._2("c") == 1.0)
  }

  test("TopKPayloadAggregator: rank order, tiebreaks, boundedness, merge associativity") {
    val agg = new Aggregators.TopKPayloadAggregator[String](3)
    val rows = Seq(
      (5L, "b", "5b"), (5L, "a", "5a"), (9L, "z", "9z"),
      (1L, "a", "1a"), (9L, "a", "9a"), (5L, "a", "5a2"))
    // direct fold: order is (key desc, tie asc); duplicates of the same
    // (key, tie) both occupy slots (the window's row_number did too)
    val folded = rows.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(folded) == Seq("9a", "9z", "5a"))
    // merge of arbitrary splits equals the whole fold (partial-agg safety)
    for (cut <- 1 until rows.length) {
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == agg.finish(folded), s"cut=$cut")
    }
    // buffer never exceeds k regardless of input size
    val big = (1L to 10000L).map(i => (i, s"t$i", s"p$i"))
    assert(big.foldLeft(agg.zero)(agg.reduce).length == 3)
    // duplicate (key, tie) entries: both kept while room remains
    val dup = Seq((5L, "a", "x"), (5L, "a", "x")).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(dup) == Seq("x", "x"))
    assert(agg.finish(agg.zero) == Seq.empty)
  }

  test("MergeMaxAggregator matches pure mergeMax over any grouping") {
    import spark.implicits._
    val maps = Seq(
      ("k", Map("a" -> 0.2, "b" -> 0.8)),
      ("k", Map("a" -> 0.5, "c" -> 0.1)),
      ("k", Map("b" -> 0.3)))
    val agg = udaf(new Aggregators.MergeMaxAggregator)
    val got = maps.toDF("k", "m").groupBy("k").agg(agg(col("m")))
      .head().getMap[String, Double](1)
    val expected = maps.map(m => Histogram("h", 1, m._2))
      .reduce(HistogramAlgebra.mergeMax).buckets
    assert(got.keySet == expected.keySet)
    expected.foreach { case (k, v) => assert(got(k) == v) }
  }

  test("TopKAggregator keeps exactly k best with deterministic tie-break") {
    import spark.implicits._
    val rows = Seq((10L, "low"), (99L, "best"), (50L, "mid"), (99L, "also-best"), (1L, "worst"))
      .map { case (s, p) => ("g", s, p) }
    val agg = udaf(new Aggregators.TopKAggregator(3))
    val got = rows.toDF("g", "s", "p").groupBy("g")
      .agg(agg(col("s"), col("p"))).head().getSeq[String](1)
    assert(got == Seq("also-best", "best", "mid")) // 99-tie broken by payload asc
  }

  test("TopKAggregator buffer stays bounded (merge of full buffers)") {
    val agg = new Aggregators.TopKAggregator(5)
    val big1 = (1L to 1000L).map(i => (i, s"a$i"))
    val big2 = (1L to 1000L).map(i => (i + 500, s"b$i"))
    val merged = agg.merge(agg.merge(agg.zero, big1.take(5)), big2.take(5))
    assert(merged.size <= 5)
    val folded = big1.foldLeft(agg.zero)(agg.reduce)
    assert(folded.size == 5)
    assert(agg.finish(folded) == Seq("a1000", "a999", "a998", "a997", "a996"))
  }

  test("MinKAggregator: k smallest distinct values, bounded, merge-order independent") {
    val agg = new Aggregators.MinKAggregator(4)
    val vals = Seq(9L, 3L, 7L, 3L, 1L, 8L, 1L, 5L, 100L, 2L)
    val folded = vals.foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(folded) == Seq(1L, 2L, 3L, 5L)) // distinct, ascending, capped
    // merge order independence + boundedness: split arbitrarily, same sketch
    val (l, r) = vals.splitAt(3)
    val m1 = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val m2 = agg.merge(r.foldLeft(agg.zero)(agg.reduce), l.foldLeft(agg.zero)(agg.reduce))
    assert(m1 == folded && m2 == folded)
    assert((1L to 10000L).foldLeft(agg.zero)(agg.reduce).size == 4)
    // distributed form agrees with the local fold
    import spark.implicits._
    val u = udaf(new Aggregators.MinKAggregator(4))
    val got = vals.map(("g", _)).toDF("g", "h").repartition(4)
      .groupBy("g").agg(u(col("h"))).head().getSeq[Long](1)
    assert(got == Seq(1L, 2L, 3L, 5L))
  }
}
