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
  * after one evaluation.
  *
  * Join strategies are gated on MEASURED row counts, not hints or
  * optimizer estimates. The pair set and per-doc shingle counts are
  * CANDIDATE-bounded, not domain-bounded — in a template-heavy corpus
  * (exact clone groups sharing band signatures) they are O(train), and
  * the pre-r12 unconditional `broadcast(pairs)`/`broadcast(nT)` hints
  * detonate the driver there. Estimates don't save you either: a
  * measured 7.4M-row checkpointed shingle frame carried a 3.2 MB
  * optimizer estimate (LogicalRDD stats derive from upstream
  * distinct-shrink guesses, not from the materialized blocks), so
  * Catalyst statically broadcast it and OOM'd a small driver. Since
  * every frame here is eagerly checkpointed, exact counts are one cheap
  * job each — frames at or under [[BroadcastRowCap]] are explicitly
  * broadcast (the sf0.01/sf0.1 regime, and the t36 plan golden), frames
  * above it carry a merge hint so no mis-estimated side can ever be
  * planned as a build side. All joins are equi-joins on
  * `doc_id`/`bench_id`, so nothing requires a broadcast to be correct.
  */
object Decontaminate {

  /** Measured-rows threshold between "provably broadcastable" and
    * "force a shuffled join": the [[Dedup.BroadcastIndexRowCap]] trade
    * (2^18 rows of ids/counts ≈ a few MB serialized).
    */
  val BroadcastRowCap: Long = 1L << 18

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
    // one aggregate over the materialized pair RDD measures every gate
    // input: pair count + per-side candidate-doc counts (also the nT/nB
    // row counts — one row per candidate doc)
    val m = pairs.agg(count(lit(1)), count_distinct(col("doc_id")),
      count_distinct(col("bench_id"))).head
    val (nPairs, nDocT, nDocB) = (m.getLong(0), m.getLong(1), m.getLong(2))
    // measured gate: provably-small frames broadcast, everything else is
    // pinned to a shuffled merge join so a mis-ESTIMATED frame can never
    // be chosen as a broadcast/build side (see the object doc)
    def gate(df: DataFrame, rows: Long): DataFrame =
      if (rows <= BroadcastRowCap) broadcast(df) else df.hint("merge")
    val tSh = graft.functions.TextFunctions.explodedShingles(
        train.join(gate(pairs.select(col("doc_id")).distinct(), nDocT),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .localCheckpoint(true)
    val bSh = graft.functions.TextFunctions.explodedShingles(
        bench.join(gate(pairs.select(col("bench_id").as("doc_id")).distinct(), nDocB),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .select(col("doc_id").as("bench_id"), col("shingle"))
      .localCheckpoint(true)
    val nT = tSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_t"))
    val nB = bSh.groupBy(col("bench_id")).agg(count(lit(1)).as("n_b"))
    // the shingle frames' measured sizes gate the verify join the same
    // way (their counts are one cheap job each on the pinned blocks)
    val shared = gate(pairs, nPairs)
      .join(gate(tSh, tSh.count()), Seq("doc_id"))
      .join(gate(bSh, bSh.count()), Seq("bench_id", "shingle"))
      .groupBy(col("doc_id"), col("bench_id")).agg(count(lit(1)).as("sh_n"))
    gate(pairs, nPairs)
      .join(shared, Seq("doc_id", "bench_id"), "left")
      .join(gate(nT, nDocT), Seq("doc_id"))
      .join(gate(nB, nDocB), Seq("bench_id"))
      .select(col("doc_id"),
        round(coalesce(col("sh_n"), lit(0L)) /
          (col("n_t") + col("n_b") - coalesce(col("sh_n"), lit(0L))).cast("double"), 6)
          .as("jac"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_candidates"), max(col("jac")).as("max_jaccard"))
  }
}
