package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fuzzy benchmark decontamination — the verify-before-delete screen
  * shared by the `t36_near_decontaminate` query and the curation apps'
  * `curation.contamGate = fuzzy` mode (the PerplexityGate pattern):
  * candidates come from train×bench MinHash band collisions (paraphrased
  * benchmark text shares few EXACT shingle hits but still collides in
  * band space), and every candidate pair is verified with exact 3-gram
  * Jaccard before a training doc is flagged — precision matters when the
  * verdict deletes training data.
  *
  * Plan discipline: the pair set and both shingle frames are each read
  * by 2+ consumers, and Catalyst re-evaluates a subtree per reference —
  * unpinned, the band join and the two shingle explodes re-ran per
  * consumer (measured 17 scans / 16 windows). localCheckpoint pins each
  * after one evaluation AND gives AQE exact sizes, so the join strategy
  * is chosen at runtime from real statistics. No explicit broadcast
  * hints: the pair set and per-doc shingle counts are CANDIDATE-bounded,
  * not domain-bounded — in a saturated-contamination corpus (the sf1n
  * fixture's regime: >90% of docs carry candidates) they are O(train),
  * and a forced broadcast would bypass AQE's size checks and detonate
  * the driver. AQE broadcasts them when they are actually small (the
  * sf0.01/sf0.1 case) and falls back to a shuffled hash/sort-merge join
  * when they are not — all joins here are equi-joins on
  * `doc_id`/`bench_id`, so nothing requires a broadcast to be correct.
  */
object Decontaminate {

  /** Degenerate-band-bucket guard, same trade as
    * [[Dedup.lshCandidatePairs]]'s `maxBucket`: a (band, sig) bucket
    * holding kT train docs and kB bench docs expands to kT·kB candidate
    * pairs, so one boilerplate signature shared corpus-wide would own
    * the runtime (and the pair set's memory). Buckets past the cap on
    * EITHER side are dropped — their members still collide in their
    * other bands unless the text is pathologically common, in which
    * case the exact-overlap gate (t10 semantics) is the right screen.
    */
  val MaxBucket = 10000

  /** (doc_id, n_bench_candidates, max_jaccard) for every `train` doc
    * with ≥1 band-collision candidate against `bench`; docs with no
    * candidate are absent (callers default them to (0, 0.0)). Both
    * inputs need (doc_id, text).
    */
  def fuzzyScores(train: DataFrame, bench: DataFrame,
      maxBucket: Int = MaxBucket): DataFrame = {
    // bucket sizes via a window over the SAME (band, sig) key the join
    // shuffles on (the lshCandidatePairs shape — the exchange is shared,
    // and oversized buckets drop BEFORE the pair fanout materializes)
    val byBucket = Window.partitionBy(col("band"), col("sig"))
    def guarded(bands: DataFrame): DataFrame = bands
      .withColumn("bsz", count(lit(1)).over(byBucket))
      .filter(col("bsz") <= maxBucket).drop("bsz")
    val pairs = guarded(Dedup.lshBands(train))
      .join(guarded(Dedup.lshBands(bench))
        .select(col("band"), col("sig"), col("doc_id").as("bench_id")),
        Seq("band", "sig"))
      .select(col("doc_id"), col("bench_id")).distinct()
      .localCheckpoint(true)
    val tSh = graft.functions.TextFunctions.explodedShingles(
        train.join(pairs.select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .localCheckpoint(true)
    val bSh = graft.functions.TextFunctions.explodedShingles(
        bench.join(pairs.select(col("bench_id").as("doc_id")).distinct(),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .select(col("doc_id").as("bench_id"), col("shingle"))
      .localCheckpoint(true)
    val nT = tSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_t"))
    val nB = bSh.groupBy(col("bench_id")).agg(count(lit(1)).as("n_b"))
    val shared = pairs
      .join(tSh, Seq("doc_id"))
      .join(bSh, Seq("bench_id", "shingle"))
      .groupBy(col("doc_id"), col("bench_id")).agg(count(lit(1)).as("sh_n"))
    pairs
      .join(shared, Seq("doc_id", "bench_id"), "left")
      .join(nT, Seq("doc_id"))
      .join(nB, Seq("bench_id"))
      .select(col("doc_id"),
        round(coalesce(col("sh_n"), lit(0L)) /
          (col("n_t") + col("n_b") - coalesce(col("sh_n"), lit(0L))).cast("double"), 6)
          .as("jac"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_candidates"), max(col("jac")).as("max_jaccard"))
  }
}
