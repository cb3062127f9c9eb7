package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CCNet-style perplexity quality gate (Wenzek et al., LREC 2020 — the
  * production corpus-quality filter): score every document by the average
  * negative log-likelihood of its word bigrams under an add-one-smoothed
  * bigram LM trained on the corpus' own REFERENCE SLICE, and keep-gate
  * with an integer cross-multiplied average (never a float compare).
  *
  * Shared by the `t35_perplexity_filter` query and the curation apps'
  * `curation.qualityGate = perplexity` mode, so the LM lives once.
  *
  * Fixed-point convention (t24): per-bigram log-probs round to 1e-6
  * BIGINT so per-doc sums are summation-order-exact in both engines.
  *
  * Plan shape (the property `t35`'s plan golden pins): TWO explode
  * passes — the full corpus for scoring, and the PRE-FILTERED reference
  * slice for LM training (the slice filter precedes its own explode: a
  * row filter cannot be pushed through the shingle window, so filtering
  * the exploded stream would window the full corpus just to discard most
  * of it) — reference counts aggregate map-side on the gram key, head
  * counts roll up from the bigram-TYPE table (bounded by distinct
  * bigrams, far smaller than the token stream), and scoring is two
  * gram-keyed hash joins + a doc-keyed aggregate. Linear end-to-end,
  * nothing quadratic, no driver state.
  */
object PerplexityGate {

  /** Default keep threshold: avg(-logp) ≤ 3.45 nats (e^3.45 ≈ 31.5
    * perplexity — just over the fixture corpus' median, so the
    * rare-bigram tail actually drops), fixed-pointed to 1e-6.
    */
  val DefaultMaxAvgNllE6: Long = 3450000L

  /** The add-one-smoothed bigram LM of a reference slice, as three
    * frames: bigram counts `(shingle, cb)`, head-token counts `(w1, cu)`
    * (rolled up from the bigram-TYPE table — bounded by distinct bigrams,
    * far smaller than the token stream), and the one-row smoothing vocab
    * `(v)` = distinct heads. These are exactly the tables a streaming
    * deployment persists as state ([[graft.CurateStreamApp]] bootstraps
    * them once and scores every arriving batch against them — CCNet's
    * own shape: the LM trains once on the reference corpus, not per
    * arrival).
    */
  def lmFromSlice(ref: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val cb = graft.functions.TextFunctions
      .explodedShingles(ref, "doc_id", "text", 2)
      .groupBy(col("shingle")).agg(count(lit(1)).as("cb"))
    val cu = cb.withColumn("w1", substring_index(col("shingle"), " ", 1))
      .groupBy(col("w1")).agg(sum(col("cb")).as("cu"))
    val vDf = cu.agg(count(lit(1)).as("v")) // smoothing vocab = distinct heads
    (cb, cu, vDf)
  }

  /** Score `docs` against a prebuilt LM: (doc_id, n_bigrams,
    * sum_logp_e6) for every doc with ≥1 bigram (shorter docs are absent
    * — callers default them to (0, 0), which [[keepExpr]] rejects).
    * `vDf` must be one row; it rides a broadcast, and the greatest(v, 1)
    * guard makes an EMPTY LM (v=0) degrade to a defined no-op (P=1,
    * logp=0, keep everything), never log(1/0).
    */
  def scoreAgainstLm(docs: DataFrame, cb: DataFrame, cu: DataFrame,
      vDf: DataFrame): DataFrame = {
    val bi = graft.functions.TextFunctions
      .explodedShingles(docs, "doc_id", "text", 2)
      .withColumn("w1", substring_index(col("shingle"), " ", 1))
    bi
      .join(cb, Seq("shingle"), "left")
      .join(cu, Seq("w1"), "left")
      .crossJoin(broadcast(vDf)) // one-row smoothing constant
      .select(col("doc_id"),
        round(log((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
          (coalesce(col("cu"), lit(0L)) + greatest(col("v"), lit(1L))).cast("double")) * 1e6, 0)
          .cast("long").as("logp_e6"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("logp_e6")).as("sum_logp_e6"))
  }

  /** Train-and-score in one DAG: the LM comes from `docs.filter(refFilter)`
    * (the slice filter precedes its own explode — see the object doc).
    */
  def nllScores(docs: DataFrame, refFilter: Column): DataFrame = {
    val (cb, cu, vDf) = lmFromSlice(docs.filter(refFilter))
    scoreAgainstLm(docs, cb, cu, vDf)
  }

  /** Integer-exact keep gate: n_bigrams > 0 AND the cross-multiplied
    * average NLL clears the threshold. Docs with zero bigrams fail —
    * a one-word "document" carries no LM evidence either way, and a
    * quality filter that defaults to keep would wave noise through.
    */
  def keepExpr(nBigrams: Column, sumLogpE6: Column,
      maxAvgNllE6: Long = DefaultMaxAvgNllE6): Column =
    nBigrams > 0 && -sumLogpE6 <= nBigrams * maxAvgNllE6
}
