package graft.operators

import org.apache.spark.sql.DataFrame
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
  * after one evaluation; the LSH-bounded frames ride explicit
  * broadcasts (the a17/exactGroupedQuantiles precedent).
  */
object Decontaminate {

  /** (doc_id, n_bench_candidates, max_jaccard) for every `train` doc
    * with ≥1 band-collision candidate against `bench`; docs with no
    * candidate are absent (callers default them to (0, 0.0)). Both
    * inputs need (doc_id, text).
    */
  def fuzzyScores(train: DataFrame, bench: DataFrame): DataFrame = {
    val pairs = Dedup.lshBands(train)
      .join(Dedup.lshBands(bench)
        .select(col("band"), col("sig"), col("doc_id").as("bench_id")),
        Seq("band", "sig"))
      .select(col("doc_id"), col("bench_id")).distinct()
      .localCheckpoint(true)
    val tSh = graft.functions.TextFunctions.explodedShingles(
        train.join(broadcast(pairs.select(col("doc_id")).distinct()),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .localCheckpoint(true)
    val bSh = graft.functions.TextFunctions.explodedShingles(
        bench.join(broadcast(pairs.select(col("bench_id").as("doc_id")).distinct()),
          Seq("doc_id"), "left_semi"),
        "doc_id", "text", 3).distinct()
      .select(col("doc_id").as("bench_id"), col("shingle"))
      .localCheckpoint(true)
    val nT = tSh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_t"))
    val nB = bSh.groupBy(col("bench_id")).agg(count(lit(1)).as("n_b"))
    val shared = broadcast(pairs)
      .join(tSh, Seq("doc_id"))
      .join(bSh, Seq("bench_id", "shingle"))
      .groupBy(col("doc_id"), col("bench_id")).agg(count(lit(1)).as("sh_n"))
    pairs
      .join(shared, Seq("doc_id", "bench_id"), "left")
      .join(broadcast(nT), Seq("doc_id"))
      .join(broadcast(nB), Seq("bench_id"))
      .select(col("doc_id"),
        round(coalesce(col("sh_n"), lit(0L)) /
          (col("n_t") + col("n_b") - coalesce(col("sh_n"), lit(0L))).cast("double"), 6)
          .as("jac"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bench_candidates"), max(col("jac")).as("max_jaccard"))
  }
}
