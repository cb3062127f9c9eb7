package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.operators.{Dedup, StateSwap}
import graft.streaming.StreamingJobs

/** Continuous corpus curation — the streaming sibling of [[CurateApp]]:
  * documents arrive as a stream, and each micro-batch is screened
  * against the EVOLVING corpus state before its survivors join that
  * state. This is the shape continuous ingest takes at 100 TB: the
  * expensive whole-corpus pass ([[CurateApp]]) runs once at bootstrap,
  * then every arrival pays only a quality gate plus two index lookups.
  *
  * {{{
  * spark-submit --class graft.CurateStreamApp graft.jar \
  *   <docStreamDir> <stateDir> <outDir> [intervalSecs] [confPath]
  * }}}
  *
  * Per micro-batch, in drop-precedence order:
  *   1. `quality`   — composite score below `curation.qualityMin`;
  *   2. `exact_dup` — normalized fingerprint already in the corpus
  *                    fingerprint state, or seen earlier in this batch
  *                    (first occurrence keeps);
  *   3. `near_dup`  — any MinHash band collides with the corpus band
  *                    index (`Dedup.lshBandsLocal` on the stream side —
  *                    one codegen kernel per row, no stream-side
  *                    shuffle; the corpus side carries the same
  *                    megabucket guard as the batch generators), OR with
  *                    an earlier (smaller doc_id) document of the SAME
  *                    batch — greedy first-keeps ordering, so two
  *                    near-identical docs arriving together can't both
  *                    enter the corpus;
  *   4. survivors   — appended under `<outDir>/curated/batch=<id>` and
  *                    merged into both state tables.
  *
  * Delivery contract: same as [[GraftContinuousApp]] — foreachBatch is
  * at-least-once, so the last applied batch id rides INSIDE the
  * atomically-swapped state and replays are detected and skipped; the
  * per-batch-id output directory is overwritten, never appended, so a
  * replayed write replaces itself. All three state tables (fingerprints,
  * band index, bucket sizes) live under ONE root and promote in a single
  * [[StateSwap.swapAll]] — the marker is in sync with every table, with
  * no crash window where the marker says "applied" but a table's merge
  * was lost.
  *
  * Scale shape: state lookups are semi/anti joins on content-hash keys
  * (broadcast-able while the batch is small, hash-join on the band key
  * when it isn't); state updates are unions of the batch's few rows with
  * the state tables, swapped atomically — no per-key RPCs, no driver
  * loops; the band index is the SAME (band, sig, doc_id) layout the
  * batch LSH uses, so bootstrap is just `Dedup.lshBands(corpus)`.
  */
object CurateStreamApp {

  /** Marker row inside the fingerprint state recording the last APPLIED
    * batch id (fp can never collide with an md5 hex digest).
    */
  private[graft] val BatchMarker = "__meta:last_applied_batch"

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.CurateStreamApp <docStreamDir> <stateDir> <outDir> [intervalSecs] [confPath]")
    val Array(docsDir, stateDir, outDir) = args.take(3)
    val interval = if (args.length > 3) args(3).toInt else 10
    val config = if (args.length > 4) GraftConfig.load(args(4)) else GraftConfig.empty
    val spark = GraftSession.build()
    val schema = spark.read.parquet(docsDir).schema
    val stream = spark.readStream.schema(schema).parquet(docsDir)
    val q = run(spark, stream, stateDir, outDir, interval, config)
    q.awaitTermination()
  }

  /** Wire the per-batch step onto any streaming frame (file source in
    * production, MemoryStream in tests).
    */
  def run(spark: SparkSession, stream: DataFrame, stateDir: String,
          outDir: String, intervalSecs: Int,
          config: GraftConfig = GraftConfig.empty)
      : org.apache.spark.sql.streaming.StreamingQuery =
    StreamingJobs.consumeMicroBatches(stream, intervalSecs,
        checkpointDir = Some(s"$stateDir/checkpoint")) { (batch, batchId) =>
      if (!batch.isEmpty) processBatch(spark, batch, stateDir, outDir, config, batchId)
    }

  /** One micro-batch: screen, write survivors, merge state atomically.
    * `batchId < 0` (direct test/tool invocations) appends to the output
    * root and skips replay tracking.
    */
  def processBatch(spark: SparkSession, batch: DataFrame, stateDir: String,
                   outDir: String, config: GraftConfig = GraftConfig.empty,
                   batchId: Long = -1L): Unit = {
    val qualityMin = config.getDouble("curation.qualityMin", 0.5)
    val maxBucket = config.getInt("curation.maxBucket", 10000)
    // one root, three tables, one atomic promotion per batch
    val stateRoot = s"$stateDir/corpus_state"

    val allFps = StateSwap.readTableOrElse(spark, stateRoot, "fps",
      spark.range(0).select(col("id").cast("string").as("fp"), col("id").as("doc_id")))
    val lastApplied = allFps.filter(col("fp") === BatchMarker)
      .select(col("doc_id")).collect().headOption.map(_.getLong(0))
    if (batchId >= 0 && lastApplied.exists(_ >= batchId)) return
    val stateFps = allFps.filter(col("fp") =!= BatchMarker)
    val stateBands = StateSwap.readTableOrElse(spark, stateRoot, "bands",
      spark.range(0).select(col("id").cast("int").as("band"),
        col("id").cast("string").as("sig"), col("id").as("doc_id")))

    // 1. quality gate — row-local, no shuffle
    val toks = tokens(col("text"))
    val qualified = batch
      .withColumn("fp", exactFingerprint(col("text")))
      .filter(qualityScore(col("text"), toks) >= qualityMin)

    // 2. exact dedup: first-in-batch occurrence keeps (window min over
    // the fingerprint), then drop anything the corpus already has
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val batchUnique = qualified
      .withColumn("fp_canon", min(col("doc_id")).over(byFp))
      .filter(col("doc_id") === col("fp_canon")).drop("fp_canon")
      .join(stateFps.select(col("fp")), Seq("fp"), "left_anti")

    // 3. near-dup screen: row-local band signatures against the corpus
    // band index, with the st7 megabucket guard driven by the
    // INCREMENTALLY MAINTAINED bucket-size table — recomputing sizes
    // with a window over the whole band state would shuffle the entire
    // corpus index every 10-second batch, which is exactly the per-batch
    // full-state pass this entry point exists to avoid. The oversized
    // set is config-bounded tiny; the remaining lookup is a semi join
    // whose small side is the batch (broadcast), so the state is
    // scanned, never shuffled.
    val stateSizes = StateSwap.readTableOrElse(spark, stateRoot, "bucket_sizes",
      spark.range(0).select(col("id").cast("int").as("band"),
        col("id").cast("string").as("sig"), col("id").as("n")))
    val oversized = stateSizes.filter(col("n") > maxBucket).select(col("band"), col("sig"))
    val batchBands = Dedup.lshBandsLocal(batchUnique)
    val corpusHit = batchBands
      .join(oversized, Seq("band", "sig"), "left_anti")
      .join(stateBands, Seq("band", "sig"), "left_semi")
      .select(col("doc_id")).distinct()
    // in-batch near-dups: a doc sharing any band bucket with an EARLIER
    // (smaller doc_id) doc of the same batch is dropped too — greedy
    // first-keeps, matching CurateApp's batch semantics for docs that
    // would have collided had they arrived a batch apart. The self-join
    // is batch-sized (tiny), no megabucket guard needed.
    val inBatchHit = batchBands
      .join(batchBands.groupBy(col("band"), col("sig")).agg(min(col("doc_id")).as("keeper")),
        Seq("band", "sig"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id")).distinct()
    val colliding = corpusHit.unionByName(inBatchHit).distinct()
    // materialized EAGERLY: the survivor plan reads all three state
    // tables and feeds three consumers (curated write, fp merge, band
    // merge) — one localCheckpoint avoids re-running the quality gate and
    // dedup joins per consumer, and keeps the staged state writes from
    // racing the root promotion below
    val survivors = batchUnique.join(colliding, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)

    if (batchId >= 0)
      survivors.drop("fp").write.mode(SaveMode.Overwrite)
        .parquet(s"$outDir/curated/batch=$batchId")
    else survivors.drop("fp").write.mode(SaveMode.Append).parquet(s"$outDir/curated")

    // state merge + ONE atomic swap of the whole root; the marker travels
    // with the fp table and is therefore in sync with all three tables
    val newFps = stateFps.unionByName(survivors.select(col("fp"), col("doc_id")))
    val withMarker =
      if (batchId < 0) newFps
      else newFps.unionByName(spark.range(1)
        .select(lit(BatchMarker).as("fp"), lit(batchId).as("doc_id")))
    // bucket sizes advance by the batch's per-bucket counts only (an
    // aggregation of the SURVIVORS' bands, not a rescan of the state)
    val survivorBands = Dedup.lshBandsLocal(survivors.select(col("doc_id"), col("text")))
      .localCheckpoint(true) // consumed by two staged writes below
    val newBands = stateBands.unionByName(survivorBands)
    val batchSizes = survivorBands.groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("add"))
    val newSizes = stateSizes
      .join(batchSizes, Seq("band", "sig"), "full_outer")
      .select(col("band"), col("sig"),
        (coalesce(col("n"), lit(0L)) + coalesce(col("add"), lit(0L))).as("n"))
    StateSwap.swapAll(stateRoot, Seq(
      "fps" -> withMarker, "bands" -> newBands, "bucket_sizes" -> newSizes))
  }
}
