package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.PlanFingerprint

/** Plan-fingerprint regression gate over the most expensive queries: the
  * join strategies, exchange counts, and scan pushdown of each pinned
  * query must match its golden. Without this, a lost broadcast or a
  * vanished PushedFilters only surfaces as a silent bench regression; here
  * it fails CI with a diff.
  *
  * To regenerate after an INTENTIONAL plan change:
  *   cp tools/devtools/PrintPlanGoldens.scala src/main/scala/graft/tmp/ &&
  *   sbt compile && tools/run.sh graft.tmp.PrintPlanGoldens <query...>
  * and paste the printed lines — but first argue why the new plan is
  * better; this table is a ratchet, not a mirror.
  */
class PlanGoldenSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val goldens = Map(
    "q1_agg" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=1 pushed=0 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "q3_local_supplier_volume" -> "bhj=4 smj=0 shj=0 bnlj=0 cart=0 bcastx=4 shufflex=2 scans=5 pushed=5 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "q13_cust_order_dist" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=3 scans=2 pushed=1 agg=4 objagg=0 sortagg=0 window=0 wgl=0",
    "q16_supplier_cnt" -> "bhj=2 smj=0 shj=0 bnlj=0 cart=0 bcastx=2 shufflex=3 scans=3 pushed=3 agg=4 objagg=0 sortagg=0 window=0 wgl=0",
    "q17_small_qty_revenue" -> "bhj=3 smj=0 shj=0 bnlj=0 cart=0 bcastx=3 shufflex=3 scans=4 pushed=4 agg=6 objagg=0 sortagg=0 window=0 wgl=0",
    "q18_large_volume" -> "bhj=4 smj=0 shj=0 bnlj=0 cart=0 bcastx=4 shufflex=3 scans=5 pushed=3 agg=6 objagg=0 sortagg=0 window=0 wgl=0",
    "q15_top_supplier" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=4 scans=3 pushed=3 agg=6 objagg=0 sortagg=0 window=0 wgl=0",
    "q20_potential_promo" -> "bhj=6 smj=0 shj=0 bnlj=0 cart=0 bcastx=6 shufflex=6 scans=7 pushed=6 agg=10 objagg=0 sortagg=0 window=0 wgl=0",
    // q21 is the single-pass per-order aggregate rewrite: two hash
    // exchanges over the fact/pre-agg, zero self-joins, zero windows
    "q21_sole_fault" -> "bhj=2 smj=0 shj=0 bnlj=0 cart=0 bcastx=2 shufflex=4 scans=3 pushed=3 agg=8 objagg=0 sortagg=0 window=0 wgl=0",
    "j2_blacklist_anti" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=2 scans=2 pushed=1 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "j9_asof_join" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=2 pushed=2 agg=0 objagg=0 sortagg=0 window=1 wgl=0",
    "j10_range_join" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=2 scans=2 pushed=0 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "j12_interval_overlap" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=1 scans=2 pushed=2 agg=0 objagg=0 sortagg=0 window=0 wgl=0",
    "a3_rollup_topk_detail" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=3 scans=2 pushed=2 agg=2 objagg=2 sortagg=0 window=1 wgl=2",
    "a17_percentile" -> "bhj=2 smj=0 shj=0 bnlj=0 cart=0 bcastx=2 shufflex=2 scans=0 pushed=0 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "e2_sessionize" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=1 pushed=0 agg=2 objagg=0 sortagg=0 window=2 wgl=0",
    "e3_scd2" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=1 pushed=0 agg=0 objagg=0 sortagg=0 window=2 wgl=0",
    "a29_gap_fill" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=1 pushed=0 agg=0 objagg=0 sortagg=0 window=1 wgl=0",
    // d2 regenerated in r12: lshBands now computes signatures with the
    // compiled row-local MinhashSig kernel (shared with the streaming
    // form, bit-identical by spec), so the token-explode window exchange
    // and the 12-column min aggregate disappear — shufflex 4→3, window
    // 2→1 (the bucket-size gate window remains), agg 4→2
    "d2_minhash_lsh" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=3 scans=1 pushed=0 agg=2 objagg=2 sortagg=0 window=1 wgl=0",
    "d4_ngram_jaccard" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=1 scans=0 pushed=0 agg=0 objagg=0 sortagg=0 window=0 wgl=0",
    // t10 regenerated after the r11 rework (filter-before-explode bench
    // dictionary + one-pass marked-left-join counts): window 3→2 (the
    // full-corpus explode no longer re-runs per consumer), shuffle 5→4,
    // agg 10→6 (one doc aggregate instead of two joined back)
    // r12: window 2→0 — both shingle explodes now run the compiled
    // row-local TokenShingles kernel, no doc-keyed token exchange
    // r13: shufflex 4→3, agg 6→4 — the train side's per-doc shingle
    // dedup is row-local (array_distinct before the explode,
    // explodedDistinctShingles): the corpus-wide (doc_id, shingle)
    // distinct exchange disappears; identical row set by construction
    "t10_decontaminate" -> "bhj=2 smj=0 shj=0 bnlj=0 cart=0 bcastx=2 shufflex=3 scans=3 pushed=3 agg=4 objagg=0 sortagg=0 window=0 wgl=0",
    "t22_tfidf_terms" -> "bhj=0 smj=0 shj=0 bnlj=1 cart=0 bcastx=1 shufflex=5 scans=2 pushed=0 agg=4 objagg=0 sortagg=0 window=2 wgl=2",
    "s3_time_filter" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=1 scans=1 pushed=1 agg=0 objagg=0 sortagg=0 window=0 wgl=0",
    // det4's render is the bounded TopKPayloadAggregator (objagg=2 partial+
    // final), with NO window and NO sort in the plan — the fingerprint
    // pins exactly the property the 7.9 GB spill fix bought
    "det4_alert_flow_detail" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=3 scans=2 pushed=0 agg=2 objagg=2 sortagg=0 window=0 wgl=0",
    // m4's bucket gate is a count-aggregate + BROADCAST semi-join (the
    // survivor set is domain-bounded at 4×2^16 rows): window=0 pins the
    // absence of the full-stream window sort, shufflex=4 pins that the
    // banded stream is never exchanged just to apply the gate (the old
    // shuffle_hash hint cost two extra full exchanges). scans=0 (r13)
    // pins the hash-frame checkpoint: the PNG-synth + decode + aHash
    // kernel runs ONCE, not once per consumer (gate + two join sides).
    "m4_image_neardup" -> "bhj=3 smj=0 shj=0 bnlj=0 cart=0 bcastx=3 shufflex=4 scans=0 pushed=0 agg=6 objagg=0 sortagg=0 window=0 wgl=0",
    // t35 pins the filter-BEFORE-window shape: the reference-slice lang
    // filter precedes its own shingle explode (the after-window form
    // measured 19.3 s / 3034 MB vs 13.9 s / 1873 MB at 100×). window=4 =
    // 2 explode passes × 2 window ops each; bnlj=1 is the one-row
    // smoothing-constant broadcast (PlanDiscipline-allowlisted); bhj=3 =
    // the two gram-keyed LM joins + the lang join-back.
    // r12 regen: the two explode passes run the compiled TokenShingles
    // kernel — window 4→0, shufflex 10→7 (the filter-before-explode
    // property this golden pinned still holds: the lang filter precedes
    // the reference slice's shingling, now row-local). t35 measured
    // 2.0 → 1.1 s at sf0.1 on the swap.
    "t35_perplexity_filter" -> "bhj=3 smj=0 shj=0 bnlj=1 cart=0 bcastx=4 shufflex=7 scans=5 pushed=4 agg=12 objagg=0 sortagg=0 window=0 wgl=0",
    // m8/m9 fingerprint PAST the CC localCheckpoint (the iterative rounds
    // truncate lineage), so they pin the post-CC canonical-pick join and
    // that no window sort reappears in the final assembly. scans=0 since
    // r12: the codec+hash frame is pinned once (it used to re-run the
    // PNG/WAV decode kernel per consumer — 3-4 evaluations), so the final
    // assembly reads the pinned blocks, not a fresh parquet scan
    "m8_image_dedup" -> "bhj=0 smj=1 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=4 scans=0 pushed=0 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    "m9_audio_dedup" -> "bhj=1 smj=0 shj=0 bnlj=0 cart=0 bcastx=1 shufflex=3 scans=0 pushed=0 agg=4 objagg=0 sortagg=0 window=0 wgl=0",
    // d23 pins the d18-family shape: shj=1 is the shuffle-hash bucket
    // GATE semi-join (hinted — sort-merge would re-introduce the gram
    // sort the gate exists to avoid), objagg=2 the compiled pair
    // expansion's collect_list — never all-pairs
    "d23_span_containment" -> "bhj=2 smj=0 shj=1 bnlj=0 cart=0 bcastx=2 shufflex=7 scans=4 pushed=4 agg=10 objagg=2 sortagg=0 window=0 wgl=0",
    // q23: all five dims broadcast; exactly the two agg exchanges remain
    "q23_volume_shipping" -> "bhj=5 smj=0 shj=0 bnlj=0 cart=0 bcastx=5 shufflex=2 scans=6 pushed=6 agg=2 objagg=0 sortagg=0 window=0 wgl=0",
    // j14 pins the ONE-shuffle union-window as-of plan (the tolerance is
    // a post-window null-out, not a second join): window=1, bhj=0
    "j14_asof_tolerance" -> "bhj=0 smj=0 shj=0 bnlj=0 cart=0 bcastx=0 shufflex=2 scans=2 pushed=2 agg=0 objagg=0 sortagg=0 window=1 wgl=0",
    // m10 pins the constellation-match shape: one fp equi-join (the
    // query side broadcasts) + map-side-combined vote aggregate + a
    // WindowGroupLimit top-1 per query — never a cross join. scans=1
    // (r13) pins the index checkpoint: the WAV-synth + FFT kernel runs
    // once for the index (not once per consumer — the maxBucket gate
    // and the vote join) plus once for the un-pinned single-consumer
    // query side (the surviving scan).
    "m10_audio_match" -> "bhj=2 smj=0 shj=0 bnlj=0 cart=0 bcastx=2 shufflex=4 scans=1 pushed=1 agg=4 objagg=0 sortagg=0 window=1 wgl=2",
    // t36 fingerprints PAST the pinned pairs/shingle checkpoints (the
    // m8/m9 convention): scans=1 pins that the band join and the two
    // shingle explodes run ONCE (the unpinned form re-evaluated them per
    // consumer — 17 scans / 16 windows), bhj=4 the broadcast verify joins
    "t36_near_decontaminate" -> "bhj=4 smj=2 shj=0 bnlj=0 cart=0 bcastx=4 shufflex=7 scans=1 pushed=1 agg=8 objagg=0 sortagg=0 window=0 wgl=0",
  )

  goldens.toSeq.sortBy(_._1).foreach { case (name, want) =>
    test(s"plan fingerprint: $name") {
      val got = PlanFingerprint.of(SparkEntry.queries(name)(spark, SparkTestSession.sfDir))
      assert(got == want,
        s"\nplan skeleton of $name changed:\n  golden: $want\n  got:    $got\n" +
          "If intentional, regenerate via tools/devtools/PrintPlanGoldens.scala.")
    }
  }

  test("meta: the gate is sensitive — losing broadcasts changes the fingerprint") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val before = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val got = PlanFingerprint.of(
        SparkEntry.queries("q3_local_supplier_volume")(spark, SparkTestSession.sfDir))
      assert(got != goldens("q3_local_supplier_volume"),
        "fingerprint did not react to a disabled broadcast threshold — the gate is blind")
    } finally spark.conf.set(key, before)
  }
}
