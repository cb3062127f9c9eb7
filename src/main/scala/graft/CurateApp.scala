package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Catalog

/** Production corpus-curation entry point — the LLM-training-data
  * counterpart to [[GraftApp]] (detection) and [[GraftContinuousApp]]
  * (continuous auth): drives the pipeline operators end-to-end over a
  * documents table and writes a curated corpus plus a per-stage
  * attrition report.
  *
  *   spark-submit --class graft.CurateApp <jar> <inDir> <outDir> [confPath]
  *
  * Thresholds come from the conf file's `curation.*` keys (see
  * `conf/graft.conf`); programmatic callers use [[run]]'s parameters.
  *
  * Stages, in drop-precedence order (each doc is attributed to the FIRST
  * stage that rejects it, so the report partitions the corpus exactly):
  *
  *   1. `benchmark`  — held-out eval docs (doc_id ≡ 0 mod `benchMod`);
  *                     excluded from training output by definition
  *   2. `quality`    — the selected quality gate rejects it
  *                     (`curation.qualityGate`: `score` = composite
  *                     length/punct/stopword score below `qualityMin`;
  *                     `gopher` = Rae et al. 2021 rule conjunction;
  *                     `perplexity` = CCNet bigram-LM NLL above
  *                     `curation.perplexityMaxNllE6`)
  *   3. `exact_dup`  — same normalized md5 fingerprint as an earlier doc
  *                     (first occurrence keeps)
  *   4. `near_dup`   — candidate pairs from the configured generator
  *                     (`curation.nearDupMethod`: MinHash-LSH, SimHash,
  *                     or SemDeDup cosine clusters over an
  *                     embedding-bearing corpus) → connected components
  *                     → only the canonical (longest) member of each
  *                     component keeps
  *   5. `contaminated` — the selected gate (`curation.contamGate`:
  *                     `overlap` = ≥ `maxOverlap` of the doc's 3-gram
  *                     shingles appear in the benchmark set; `fuzzy` =
  *                     a MinHash-band candidate pair against a benchmark
  *                     doc verified at ≥ `curation.fuzzyMinJaccard`
  *                     exact Jaccard — the precision-leaning near-clone
  *                     screen; `surgery` = span-surgery salvage
  *                     ([[operators.Decontaminate.surgerySpans]], the
  *                     GPT-3 appendix-C treatment): a ±`surgeryPad`
  *                     window around every benchmark `surgeryNGram`-gram
  *                     is EXCISED and the doc is kept with the cleaned
  *                     text unless less than `surgeryMinKeepFrac` of it
  *                     survives — at 100 TB, dropping a 50k-token doc
  *                     over a 100-token quote wastes 99.8% clean text)
  *   6. kept         — everything else: written to `<outDir>/curated`
  *                     (under `surgery`, kept docs that were excised
  *                     carry their cleaned text and recomputed n_chars;
  *                     the report's `n_tokens` stays the ORIGINAL count
  *                     so the report still partitions the input corpus —
  *                     excised mass is surfaced separately via the
  *                     frame's `surgery_removed_tokens` column)
  *
  * Scale shape: ONE DAG end-to-end — per-stage verdicts are columns
  * and joins (fingerprint canonical pick, LSH bucket pairs, shingle
  * semi-join), never per-stage `count()` actions, and the stages the
  * DAG reuses (row-local verdicts, fingerprints, near-dup resolution)
  * are persisted memory-and-disk for the duration of the run and
  * released on exit, so quality scoring / tokenization / LSH each run
  * once no matter how many outputs consume them. Dedup stages run on
  * the survivors of earlier stages only, so clone candidates never
  * include docs already rejected for quality.
  */
object CurateApp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.CurateApp <inDir> <outDir> [confPath]")
    val inDir = args(0)
    val outDir = args(1)
    // curation thresholds come from the conf file (curation.* keys — the
    // pipeline counterpart of the reference's sflow.conf detector knobs)
    val c = if (args.length > 2) GraftConfig.load(args(2)) else GraftConfig.empty
    val spark = GraftSession.build()
    val report = run(spark, inDir, outDir,
      qualityMin = c.getDouble("curation.qualityMin", 0.5),
      benchMod = c.getInt("curation.benchMod", 50),
      maxOverlap = c.getDouble("curation.maxOverlap", 0.5),
      widths = DedupWidths.fromConfig(c),
      qualityGate = c.getString("curation.qualityGate", "score"),
      maxAvgNllE6 = c.getLong("curation.perplexityMaxNllE6",
        operators.PerplexityGate.DefaultMaxAvgNllE6),
      contamGate = c.getString("curation.contamGate", "overlap"),
      fuzzyMinJaccard = c.getDouble("curation.fuzzyMinJaccard", 0.5),
      surgeryMinKeepFrac = c.getDouble("curation.surgeryMinKeepFrac", 0.5),
      surgeryNGram = c.getInt("curation.surgeryNGram", 5),
      surgeryPad = c.getInt("curation.surgeryPad", 5))
    report.orderBy(col("stage")).show(20, truncate = false)
    spark.stop()
  }

  /** One curation pass; factored out of main so tests can drive it.
    * Writes `<outDir>/curated` (parquet) and `<outDir>/report` and
    * returns the report: (stage, n_docs, n_tokens) with `kept` as the
    * surviving-stage row (read back from the written parquet, so
    * consuming it later never re-executes the pipeline).
    *
    * The reused stages are persisted for the duration of the two writes
    * and released before returning — a long-lived session (continuous
    * curation service) accumulates no cached blocks across runs.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          qualityMin: Double = 0.5, benchMod: Int = 50,
          maxOverlap: Double = 0.5,
          widths: DedupWidths = DedupWidths.default,
          qualityGate: String = "score",
          maxAvgNllE6: Long = operators.PerplexityGate.DefaultMaxAvgNllE6,
          contamGate: String = "overlap",
          fuzzyMinJaccard: Double = 0.5,
          surgeryMinKeepFrac: Double = 0.5,
          surgeryNGram: Int = 5, surgeryPad: Int = 5): DataFrame = {
    val (frame, release) = taggedCached(spark, inDir, qualityMin, benchMod,
      maxOverlap, widths, qualityGate, maxAvgNllE6, contamGate, fuzzyMinJaccard,
      surgeryMinKeepFrac, surgeryNGram, surgeryPad)
    try {
      frame.filter(col("stage") === "kept")
        .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").parquet(s"$outDir/curated")
      report(frame).write.mode("overwrite").parquet(s"$outDir/report")
    } finally release()
    spark.read.parquet(s"$outDir/report")
  }

  /** The per-stage attrition report of [[tagged]] — also exposed as the
    * oracle-checked `c5_curate_report` query.
    */
  def report(taggedDocs: DataFrame): DataFrame =
    taggedDocs.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Every input doc with its curation verdict: the FIRST stage that
    * rejects it in `stage`, or `kept`. One lazy DAG — see the object doc.
    * Fully lazy and persist-free: composing callers that run exactly one
    * action over the result pay one pipeline execution and leak nothing.
    * Callers that run SEVERAL actions (curated write + report write, or
    * repeated aggregation) should use [[taggedCached]] instead.
    */
  def tagged(spark: SparkSession, inDir: String,
             qualityMin: Double = 0.5, benchMod: Int = 50,
             maxOverlap: Double = 0.5,
             widths: DedupWidths = DedupWidths.default,
             qualityGate: String = "score",
             maxAvgNllE6: Long = operators.PerplexityGate.DefaultMaxAvgNllE6,
             contamGate: String = "overlap",
             fuzzyMinJaccard: Double = 0.5,
             surgeryMinKeepFrac: Double = 0.5,
             surgeryNGram: Int = 5, surgeryPad: Int = 5): DataFrame =
    build(spark, Catalog.documents(spark, inDir), qualityMin, benchMod,
      maxOverlap, widths, qualityGate, maxAvgNllE6, contamGate,
      fuzzyMinJaccard, surgeryMinKeepFrac, surgeryNGram, surgeryPad,
      persistShared = false)._1

  /** [[tagged]] with the three stages the DAG reuses — the row-local
    * verdict frame, the fingerprint-joined frame, and the near-dup
    * resolution — persisted (memory-and-disk). Returns the frame plus a
    * release thunk the caller MUST invoke after its last action; the
    * thunk unpersists all shared stages, so nothing outlives the run.
    */
  def taggedCached(spark: SparkSession, inDir: String,
                   qualityMin: Double = 0.5, benchMod: Int = 50,
                   maxOverlap: Double = 0.5,
                   widths: DedupWidths = DedupWidths.default,
                   qualityGate: String = "score",
                   maxAvgNllE6: Long = operators.PerplexityGate.DefaultMaxAvgNllE6,
                   contamGate: String = "overlap",
                   fuzzyMinJaccard: Double = 0.5,
                   surgeryMinKeepFrac: Double = 0.5,
                   surgeryNGram: Int = 5, surgeryPad: Int = 5): (DataFrame, () => Unit) =
    build(spark, Catalog.documents(spark, inDir), qualityMin, benchMod,
      maxOverlap, widths, qualityGate, maxAvgNllE6, contamGate,
      fuzzyMinJaccard, surgeryMinKeepFrac, surgeryNGram, surgeryPad,
      persistShared = true)

  /** [[taggedCached]] over an in-memory corpus frame (the documents-table
    * columns, plus `embedding` for the semantic near-dup method) — what
    * lets an embedding-bearing corpus (documents ⋈ embeddings) run the
    * pipeline without a staging write. A distinct name, not an overload:
    * two overloads cannot both carry this default-argument list.
    */
  def taggedCachedOn(spark: SparkSession, docs: DataFrame,
                     qualityMin: Double = 0.5, benchMod: Int = 50,
                     maxOverlap: Double = 0.5,
                     widths: DedupWidths = DedupWidths.default,
                     qualityGate: String = "score",
                     maxAvgNllE6: Long = operators.PerplexityGate.DefaultMaxAvgNllE6,
                     contamGate: String = "overlap",
                     fuzzyMinJaccard: Double = 0.5,
                     surgeryMinKeepFrac: Double = 0.5,
                     surgeryNGram: Int = 5, surgeryPad: Int = 5): (DataFrame, () => Unit) =
    build(spark, docs, qualityMin, benchMod, maxOverlap, widths,
      qualityGate, maxAvgNllE6, contamGate, fuzzyMinJaccard,
      surgeryMinKeepFrac, surgeryNGram, surgeryPad,
      persistShared = true)

  private def build(spark: SparkSession, docs: DataFrame,
                    qualityMin: Double, benchMod: Int, maxOverlap: Double,
                    widths: DedupWidths, qualityGate: String,
                    maxAvgNllE6: Long, contamGate: String,
                    fuzzyMinJaccard: Double,
                    surgeryMinKeepFrac: Double,
                    surgeryNGram: Int, surgeryPad: Int,
                    persistShared: Boolean): (DataFrame, () => Unit) = {
    val shared = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // quality scores, tokenization, fingerprints and the LSH+CC near-dup
    // verdict each feed 2-3 downstream branches; recomputing them per
    // branch triples the scan+tokenize cost (the r4 bench's slowest query)
    def sharedStage(df: DataFrame): DataFrame =
      if (!persistShared) df
      else {
        // lazy localCheckpoint, not persist (r13): a persisted stage
        // KEEPS its lineage, so every downstream action re-optimizes the
        // full upstream subtree inside the InMemoryRelation (the c5
        // report runs ~15 actions over 3 shared stages — measured ~1.5 s
        // of inter-job planning gaps at sf0.1). The checkpoint truncates
        // each consumer's plan at a LogicalRDD (same MEMORY_AND_DISK
        // blocks, materialized by the first consuming job, same
        // spill-to-disk behavior); release() still frees the blocks via
        // the checkpointed RDD handle below.
        val p = df.localCheckpoint(false)
        shared += p
        p
      }

    // the semantic near-dup method reads embeddings where the text
    // methods read shingle signatures — demand the column up front, with
    // a configuration-shaped message, not an analysis error mid-DAG
    require(widths.method != "semantic" || docs.columns.contains("embedding"),
      "curation.nearDupMethod=semantic needs an `embedding` column on the " +
        "input corpus (an embedding-bearing documents frame, e.g. " +
        "documents ⋈ embeddings)")

    // stage 1+2: the quality gate is SELECTABLE (curation.qualityGate):
    //   score      — composite length/punct/stopword score (row-local)
    //   gopher     — the Rae et al. 2021 §A1.1 rule conjunction (row-local)
    //   perplexity — CCNet-style bigram-LM NLL gate (Wenzek LREC'20; the
    //                production corpus filter): NOT row-local — the LM
    //                trains on the corpus' own lang='en' reference slice
    //                (operators/PerplexityGate), so the verdict is a
    //                doc-keyed left join of the scored frame. Docs the
    //                scorer never saw (no bigrams) fail the gate.
    val toks = tokens(col("text"))
    val base0 = docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("is_bench", col("doc_id") % benchMod === 0)
    val tagged0 = sharedStage(qualityGate match {
      case "gopher" =>
        val g = gopherFlags(col("text"), toks)
        base0.withColumn("low_quality",
          (g("ok_word_count") * g("ok_mean_word_len") * g("ok_symbol_ratio")
            * g("ok_bullets") * g("ok_ellipses") * g("ok_alpha_words")
            * g("ok_stopwords")) === 0)
      case "perplexity" =>
        // the verdict frame feeds tagged0, which the DAG references from
        // several consumers (survivor filter, bench shingles, attribution)
        // and Catalyst re-evaluates a subtree per reference — unpinned,
        // the two-explode LM ran ~5× even for single-action callers
        // (fingerprint: 26 scans / 27 windows; pinned: the score-gate
        // shape plus one join). The scored frame is one row per doc with
        // ≥1 bigram — cheap to pin (localCheckpoint, the a17 precedent).
        val scored = operators.PerplexityGate.nllScores(
            docs.select(col("doc_id"), col("text"), col("lang")),
            col("lang") === "en")
          .localCheckpoint(true)
        base0.join(scored, Seq("doc_id"), "left")
          .withColumn("low_quality",
            !operators.PerplexityGate.keepExpr(
              coalesce(col("n_bigrams"), lit(0L)),
              coalesce(col("sum_logp_e6"), lit(0L)), maxAvgNllE6))
          .drop("n_bigrams", "sum_logp_e6")
      case "score" =>
        base0.withColumn("low_quality", qualityScore(col("text"), toks) < qualityMin)
      case other => sys.error(
        s"curation.qualityGate must be score|gopher|perplexity, got '$other'")
    })

    // stage 3: exact dedup among docs surviving 1+2 — first occurrence
    // (min doc_id) per normalized fingerprint keeps. A window min over
    // the fingerprint key, not groupBy+self-join: one shuffle, and the
    // md5 evaluates once on the exchange's map side
    val s12 = tagged0.filter(!col("is_bench") && !col("low_quality"))
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val withFp = sharedStage(s12
      .withColumn("fp", exactFingerprint(col("text")))
      .withColumn("fp_canon", min(col("doc_id")).over(byFp))
      .withColumn("exact_dup", col("doc_id") =!= col("fp_canon")))

    // stage 4: near-dup resolution among exact-dedup survivors. The
    // semantic method needs the embedding column alongside; the text
    // methods must NOT carry it (a wide array column riding through the
    // LSH shuffles for nothing).
    val s3Cols = Seq(col("doc_id"), col("text"), col("n_chars")) ++
      (if (widths.method == "semantic") Seq(col("embedding")) else Nil)
    val s3 = withFp.filter(!col("exact_dup"))
      .select(s3Cols: _*)
    val resolved = sharedStage(Dedup.resolveDuplicates(s3,
        widths.candidatePairs(s3),
        pairsDistinct = true)
      .select(col("doc_id"), col("keep").as("near_canonical")))

    // stage 5: benchmark contamination among near-dup survivors —
    // SELECTABLE (curation.contamGate):
    //   overlap — fraction of the doc's distinct 3-gram shingles found
    //             in the benchmark shingle set (t10 semantics): the
    //             recall-leaning filter (any shared-fragment mass counts)
    //   fuzzy   — train×bench MinHash band collisions verified with
    //             exact Jaccard ≥ fuzzyMinJaccard (t36 semantics /
    //             operators.Decontaminate): the precision-leaning filter
    //             (flags near-CLONES of benchmark docs, not docs that
    //             merely quote common fragments)
    // Survivors come from `resolved` directly (it has one row per s3
    // doc), not via a withFp⋈resolved frame that the attribution join
    // would then rebuild a second time.
    val survivors = s3.join(resolved.filter(col("near_canonical")), Seq("doc_id"))
    val contaminated = contamGate match {
      case "overlap" =>
        // per-doc distinct computed row-locally (r13): the old
        // explodedShingles(...).distinct() shuffled the whole exploded
        // survivor corpus on (doc_id, shingle) just to dedup within each
        // doc — array_distinct inside the row emits the same row set with
        // zero exchange, and the count aggregate below then runs map-side
        // over the scan partitioning
        val sh3 = explodedDistinctShingles(
          survivors.select(col("doc_id"), col("text")),
          "doc_id", "text", 3)
        // benchmark side is 1/benchMod of the corpus — small enough that
        // the row-local (interpreted) shingle HOF beats the window-explode
        // path's extra exchange; the shingle strings are byte-identical to
        // explodedShingles' (same n-token windows, space-joined)
        val benchShingles = tagged0.filter(col("is_bench"))
          .select(explode(array_distinct(shingles(tokens(col("text")), 3))).as("shingle"))
          .distinct()
        // ONE pass over the exploded shingle set (the pipeline's biggest
        // frame): both sides are distinct, so a left join has
        // multiplicity 1 and per-doc total and benchmark-overlap counts
        // come from a single aggregate — not two groupBys joined back
        sh3
          .join(benchShingles.withColumn("hit", lit(1)), Seq("shingle"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_overlap"))
          .withColumn("contaminated", col("n_overlap") >= col("n_sh") * maxOverlap)
          .select(col("doc_id"), col("contaminated"))
      case "fuzzy" =>
        operators.Decontaminate.fuzzyScores(
            survivors.select(col("doc_id"), col("text")),
            tagged0.filter(col("is_bench")).select(col("doc_id"), col("text")))
          .select(col("doc_id"),
            (col("max_jaccard") >= fuzzyMinJaccard).as("contaminated"))
      case "surgery" =>
        // salvage, not flag-and-drop: excise the matched spans and keep
        // the doc unless too little of it survives. `contaminated` here
        // means "kept_frac below the salvage floor"; the cleaned text and
        // excised-token count ride along for the post-attribution rewrite.
        operators.Decontaminate.surgerySpans(
            survivors.select(col("doc_id"), col("text")),
            tagged0.filter(col("is_bench")).select(col("doc_id"), col("text")),
            nGram = surgeryNGram, pad = surgeryPad)
          .select(col("doc_id"),
            (col("kept_frac") < surgeryMinKeepFrac).as("contaminated"),
            when(col("n_hits") > 0 && col("kept_frac") >= surgeryMinKeepFrac,
              col("cleaned_text")).as("surgery_text"),
            when(col("n_hits") > 0, col("removed_tokens")).as("surgery_removed"))
      case other => sys.error(
        s"curation.contamGate must be overlap|fuzzy|surgery, got '$other'")
    }

    // attribution: FIRST failing stage tags the doc; survivors are kept.
    // Docs absent from `resolved` (rejected before stage 4) read as
    // near_dup=false — the when-chain has already tagged them anyway.
    val frame0 = tagged0
      .join(withFp.select(col("doc_id"), col("exact_dup")), Seq("doc_id"), "left")
      .join(resolved, Seq("doc_id"), "left")
      .withColumn("near_dup", !coalesce(col("near_canonical"), lit(true)))
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("is_bench"), "benchmark")
          .when(col("low_quality"), "quality")
          .when(col("exact_dup"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .otherwise("kept"))
    // surgery rewrite: kept docs that were excised carry the cleaned text
    // (and recomputed n_chars) into the curated output; n_tokens stays
    // the ORIGINAL count so report() still partitions the input corpus —
    // the excised mass is its own column.
    val frame = if (contamGate == "surgery") frame0
      .withColumn("surgered",
        col("stage") === "kept" && col("surgery_text").isNotNull)
      .withColumn("surgery_removed_tokens",
        when(col("surgered"), col("surgery_removed")).otherwise(lit(0L)))
      .withColumn("text",
        when(col("surgered"), col("surgery_text")).otherwise(col("text")))
      .withColumn("n_chars",
        when(col("surgered"), length(col("text")).cast("long"))
          .otherwise(col("n_chars")))
      .drop("surgery_text", "surgery_removed")
    else frame0
    // release frees the checkpointed stages' MEMORY_AND_DISK blocks: a
    // Dataset-level unpersist is a CacheManager no-op for a checkpoint,
    // so unpersist the LogicalRDD's backing RDD handles directly (the
    // same blocks the ContextCleaner would eventually reap on GC — this
    // just makes the release deterministic for long-lived sessions)
    (frame, () => shared.foreach { p =>
      p.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }.foreach(_.unpersist(false))
    })
  }
}
