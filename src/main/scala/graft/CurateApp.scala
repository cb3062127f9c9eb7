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
  *   spark-submit --class graft.CurateApp <jar> <inDir> <outDir> \
  *     [qualityMin] [benchMod]
  *
  * Stages, in drop-precedence order (each doc is attributed to the FIRST
  * stage that rejects it, so the report partitions the corpus exactly):
  *
  *   1. `benchmark`  — held-out eval docs (doc_id ≡ 0 mod `benchMod`);
  *                     excluded from training output by definition
  *   2. `quality`    — composite quality score below `qualityMin`
  *                     (length/punctuation/stopword signals)
  *   3. `exact_dup`  — same normalized md5 fingerprint as an earlier doc
  *                     (first occurrence keeps)
  *   4. `near_dup`   — MinHash-LSH candidate pairs → connected
  *                     components → only the canonical (longest) member
  *                     of each component keeps
  *   5. `contaminated` — ≥ `maxOverlap` of the doc's 3-gram shingles
  *                     appear in the benchmark set
  *   6. kept         — everything else: written to `<outDir>/curated`
  *
  * Scale shape: ONE lazy DAG end-to-end — per-stage verdicts are columns
  * and joins (fingerprint canonical pick, LSH bucket pairs, shingle
  * semi-join), never per-stage `count()` actions, so the corpus is read
  * once for the curated write and once for the report aggregation (the
  * report is a single groupBy over the drop-stage tag; at 100 TB you'd
  * cache the tagged frame or write it partitioned by stage instead).
  * Dedup stages run on the survivors of earlier stages only, so clone
  * candidates never include docs already rejected for quality.
  */
object CurateApp {

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.CurateApp <inDir> <outDir> [qualityMin] [benchMod]")
    val inDir = args(0)
    val outDir = args(1)
    val qualityMin = if (args.length > 2) args(2).toDouble else 0.5
    val benchMod = if (args.length > 3) args(3).toInt else 50
    val spark = GraftSession.build()
    val report = run(spark, inDir, outDir, qualityMin, benchMod)
    report.orderBy(col("stage")).show(20, truncate = false)
    spark.stop()
  }

  /** One curation pass; factored out of main so tests can drive it.
    * Writes `<outDir>/curated` (parquet) and `<outDir>/report` and
    * returns the report: (stage, n_docs, n_tokens) with `kept` as the
    * surviving-stage row.
    */
  def run(spark: SparkSession, inDir: String, outDir: String,
          qualityMin: Double = 0.5, benchMod: Int = 50,
          maxOverlap: Double = 0.5): DataFrame = {
    val frame = tagged(spark, inDir, qualityMin, benchMod, maxOverlap)
    frame.filter(col("stage") === "kept")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/curated")
    val rep = report(frame)
    rep.write.mode("overwrite").parquet(s"$outDir/report")
    rep
  }

  /** The per-stage attrition report of [[tagged]] — also exposed as the
    * oracle-checked `c5_curate_report` query.
    */
  def report(taggedDocs: DataFrame): DataFrame =
    taggedDocs.groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Every input doc with its curation verdict: the FIRST stage that
    * rejects it in `stage`, or `kept`. One lazy DAG — see the object doc.
    */
  def tagged(spark: SparkSession, inDir: String,
             qualityMin: Double = 0.5, benchMod: Int = 50,
             maxOverlap: Double = 0.5): DataFrame = {
    val docs = Catalog.documents(spark, inDir)

    // stage 1+2: row-local verdicts
    val toks = tokens(col("text"))
    val tagged0 = docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("is_bench", col("doc_id") % benchMod === 0)
      .withColumn("low_quality", qualityScore(col("text"), toks) < qualityMin)

    // stage 3: exact dedup among docs surviving 1+2 — first occurrence
    // (min doc_id) per normalized fingerprint keeps
    val s12 = tagged0.filter(!col("is_bench") && !col("low_quality"))
    val fpCanon = s12
      .select(col("doc_id"), exactFingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("fp_canon"))
    val withFp = s12
      .withColumn("fp", exactFingerprint(col("text")))
      .join(fpCanon, Seq("fp"))
      .withColumn("exact_dup", col("doc_id") =!= col("fp_canon"))

    // stage 4: near-dup resolution among exact-dedup survivors
    val s3 = withFp.filter(!col("exact_dup"))
      .select(col("doc_id"), col("text"), col("n_chars"))
    val resolved = Dedup.resolveDuplicates(s3,
        Dedup.lshCandidatePairs(s3).select(col("doc1"), col("doc2")))
      .select(col("doc_id"), col("keep").as("near_canonical"))

    // stage 5: benchmark contamination among near-dup survivors —
    // fraction of the doc's distinct 3-gram shingles found in the
    // benchmark shingle set (same semantics as t10_decontaminate)
    val s4 = withFp.join(resolved, Seq("doc_id"), "left")
      .withColumn("near_dup", !coalesce(col("near_canonical"), lit(true)))
    val sh3 = explodedShingles(
      s4.filter(!col("near_dup")).select(col("doc_id"), col("text")),
      "doc_id", "text", 3).distinct()
    val benchShingles = explodedShingles(
      tagged0.filter(col("is_bench")).select(col("doc_id"), col("text")),
      "doc_id", "text", 3)
      .select(col("shingle")).distinct()
    val overlap = sh3.join(benchShingles, Seq("shingle"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_overlap"))
    val nSh = sh3.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val contaminated = nSh.join(overlap, Seq("doc_id"), "left")
      .withColumn("contaminated",
        coalesce(col("n_overlap"), lit(0L)) >= col("n_sh") * maxOverlap)
      .select(col("doc_id"), col("contaminated"))

    // attribution: FIRST failing stage tags the doc; survivors are kept
    tagged0
      .join(withFp.select(col("doc_id"), col("exact_dup")), Seq("doc_id"), "left")
      .join(s4.select(col("doc_id"), col("near_dup")), Seq("doc_id"), "left")
      .join(contaminated, Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("is_bench"), "benchmark")
          .when(col("low_quality"), "quality")
          .when(col("exact_dup"), "exact_dup")
          .when(col("near_dup"), "near_dup")
          .when(coalesce(col("contaminated"), lit(false)), "contaminated")
          .otherwise("kept"))
  }
}
