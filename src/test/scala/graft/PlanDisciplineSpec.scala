package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard: no query may introduce a cartesian
  * product or an unexpected broadcast nested-loop join. BNLJ is only
  * acceptable when the broadcast side is tiny BY CONSTRUCTION — the
  * allowlist below names each such query and why it qualifies. A new
  * query landing here must either fix its plan or argue its way into
  * the list.
  */
class PlanDisciplineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Queries whose BroadcastNestedLoopJoin is a deliberate small-side
    * broadcast (non-equi or scalar-stats joins that cannot be hash
    * joins, with a provably bounded build side):
    *  - a9_znorm, h4_kl_divergence, t12_bm25, t13_lm_score,
    *    t22_tfidf_terms, c7_zorder_cells: crossJoin of a ONE-ROW
    *    global-stats frame onto the fact side;
    *  - a26_ntile_bins: equalFrequencyBins' two tiny crossJoins — the
    *    one-row stats frame onto the fact side, and ≤2k boundary ranks
    *    onto the ≤65536 occupied-bin frame (both bounded by
    *    construction; the alternative ntile window is single-task);
    *  - j1_prefix_semijoin: startsWith against the fixed myNets prefix
    *    list (a handful of strings);
    *  - j8_longest_prefix: dictionary-prefix match, broadcast side is the
    *    (small) prefix dictionary;
    *  - v1_knn_brute: the documented all-pairs recall baseline — the
    *    broadcast side is the bounded query set;
    *  - v4_ivf_topk, v10_ivf_persisted, v5_int8_knn: ANN probes joining
    *    the bounded query set against candidate cells;
    *  - v9_coarse_rerank: stage-1 coarse scan joins the bounded query
    *    set non-equi (vec_id ≠ query_id), same shape as v1.
    *  - t23_kmv_overlap: crossJoins of ONE-ROW frames (two k=256 KMV
    *    sketch rows and a one-row exact count) — the a9 shape.
    *  - v11_recall_eval: composes v1 (ground truth) with v4 (candidate) —
    *    inherits exactly their allowlisted broadcast-query-set joins.
    *  - t31_bpe_learn: each learning iteration crossJoins the ONE-ROW
    *    argmax winner (LIMIT 1 by construction) onto the vocabulary
    *    state — the a9 one-row-stats shape, once per merge rank.
    *  - t33_lang_classifier / t34_lang_holdout: crossJoin of the
    *    ONE-ROW class-totals/vocabulary frame (an aggregate with no
    *    grouping keys) onto the per-doc numerators — the a9
    *    one-row-stats shape.
    *  - t35_perplexity_filter: crossJoin of the ONE-ROW smoothing-vocab
    *    count (an aggregate with no grouping keys) onto the scored
    *    bigram stream — the a9 one-row-stats shape.
    *  - a30_decay_profile: crossJoin of the ONE-ROW max-timestamp anchor
    *    (an aggregate with no grouping keys) onto the event stream — the
    *    a9 one-row-stats shape.
    *  - t38_mix_temperature: crossJoin of the ONE-ROW max-source-tokens
    *    anchor onto the per-source aggregate (≤ |sources| rows) — the a9
    *    one-row-stats shape on an already-tiny frame.
    */
  private val allowedBnlj = Set(
    "a9_znorm", "h4_kl_divergence", "t12_bm25", "t13_lm_score",
    "t22_tfidf_terms", "c7_zorder_cells", "a26_ntile_bins",
    "j1_prefix_semijoin", "j8_longest_prefix",
    "v1_knn_brute", "v4_ivf_topk", "v10_ivf_persisted", "v5_int8_knn",
    "v9_coarse_rerank", "t23_kmv_overlap", "v11_recall_eval",
    "t31_bpe_learn", "t33_lang_classifier", "t34_lang_holdout",
    "t35_perplexity_filter", "a30_decay_profile", "t38_mix_temperature",
    "d24_lsh_recall", "t40_ppl_buckets")

  test("no cartesian products; BNLJ only on the allowlisted tiny-broadcast queries") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, SparkTestSession.sfDir).queryExecution.executedPlan.toString()
      val cart = if (plan.contains("CartesianProduct")) Seq(s"$name: CartesianProduct") else Nil
      val bnlj = if (plan.contains("BroadcastNestedLoopJoin") && !allowedBnlj(name))
        Seq(s"$name: unexpected BroadcastNestedLoopJoin") else Nil
      cart ++ bnlj
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
