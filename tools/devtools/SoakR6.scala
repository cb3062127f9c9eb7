package graft.tmp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CurateStreamApp, GraftApp}

/** Round-6 scale soak: repeated entry-point runs against PERSISTENT
  * state, measuring per-round latency and state growth.
  *
  *  A. four consecutive GraftApp batch rounds (fresh ~2.5M-sample sFlow
  *     parquet per round, same state/out dirs) — per-round wall time,
  *     state-table bytes/files, cumulative alert count;
  *  B. one CurateStreamApp session consuming 12 micro-batches sliced
  *     from the natural sf1 documents table through a real file-source
  *     stream — per-batch wall time, curated counts, corpus-state
  *     bytes/files.
  *
  * Emits one JSON blob (stdout + outFile) for the round artifact.
  *
  *   tools/run.sh graft.tmp.SoakR6 /tmp/SOAK_r06.json /tmp/sf1n
  */
object SoakR6 {

  private def u(id: org.apache.spark.sql.Column, salt: Int) =
    pmod(xxhash64(id, lit(salt)), lit(1000000000L)).cast("double") / 1e9
  private def h(id: org.apache.spark.sql.Column, salt: Int, n: Int) =
    pmod(xxhash64(id, lit(salt)), lit(n.toLong)).cast("int")

  private def dirStats(path: String): (Long, Long) = {
    val root = new java.io.File(path)
    if (!root.exists()) return (0L, 0L)
    var files = 0L; var bytes = 0L
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
      else { files += 1; bytes += f.length() }
    walk(root)
    (files, bytes)
  }

  /** One round of synthetic sFlow samples: ~10k internal hosts talking to
    * an external pool, a few deliberate heavy talkers/scanners so the
    * detector DAG has something to find; a fresh salt per round.
    */
  private def samples(spark: SparkSession, n: Long, round: Int): DataFrame = {
    val s = 9000 + round * 17
    spark.range(n).select(
      concat(lit("10.0."), h(col("id"), s + 1, 40), lit("."),
        h(col("id"), s + 2, 250) + 1).as("srcIP"),
      concat(lit("93."), h(col("id"), s + 3, 200), lit("."),
        h(col("id"), s + 4, 200), lit("."), h(col("id"), s + 5, 250) + 1).as("dstIP"),
      when(h(col("id"), s + 6, 100) < 3, lit("1900"))
        .otherwise((h(col("id"), s + 7, 28000) + 32768).cast("string")).as("srcPort"),
      element_at(array(lit("443"), lit("80"), lit("53"), lit("22"), lit("8080")),
        h(col("id"), s + 8, 5) + 1).as("dstPort"),
      when(h(col("id"), s + 9, 10) < 8, lit("6")).otherwise(lit("17")).as("IPprotocol"),
      (lit(60) + (u(col("id"), s + 10) * lit(1440.0)).cast("long")).as("packetSize"),
      lit(10L).as("samplingRate"),
      when(h(col("id"), s + 9, 10) < 8, lit("0x18")).otherwise(lit("0x00")).as("tcpFlags"),
      (lit(1704067200L) + lit(round * 21600L) + pmod(col("id"), lit(21600L))).as("timestamp"))
  }

  def main(args: Array[String]): Unit = {
    val outFile = if (args.nonEmpty) args(0) else "/tmp/SOAK_r06.json"
    val sfDir = if (args.length > 1) args(1) else "/tmp/sf1n"
    val work = java.nio.file.Files.createTempDirectory("soak_r6_").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- A: GraftApp batch soak ------------------------------------
    val gState = s"$work/graft/state"; val gOut = s"$work/graft/out"
    new java.io.File(gState).mkdirs()
    val nSamples = 2500000L
    val graftRounds = (1 to 4).map { r =>
      val sp = s"$work/graft/samples_$r"
      samples(spark, nSamples, r).write.mode(SaveMode.Overwrite).parquet(sp)
      val t0 = System.nanoTime()
      GraftApp.run(spark, sp, gState, gOut, Seq("10.0."))
      val dt = (System.nanoTime() - t0) / 1e9
      val (sf, sb) = dirStats(gState)
      val alerts = spark.read.parquet(s"$gOut/alerts").count()
      spark.catalog.clearCache()
      println(f"[soak] graft round $r: $dt%.1f s, state $sf files ${sb / 1048576}%d MiB, $alerts alerts")
      (r, dt, sf, sb, alerts)
    }

    // ---- B: CurateStreamApp micro-batch soak -----------------------
    val cIn = s"$work/curate/incoming"; val cState = s"$work/curate/state"
    val cOut = s"$work/curate/out"
    new java.io.File(cIn).mkdirs(); new java.io.File(cState).mkdirs()
    val docs = graft.sources.Catalog.documents(spark, sfDir)
    val nBatches = 12
    val perBatch = 4000L
    val stream = spark.readStream
      .schema(docs.schema)
      .option("pathGlobFilter", "*.parquet")
      .parquet(cIn)
    val q = CurateStreamApp.run(spark, stream, cState, cOut, intervalSecs = 1)
    val curateBatches = (0 until nBatches).map { b =>
      val slice = docs.filter(col("doc_id") >= b * perBatch &&
        col("doc_id") < (b + 1) * perBatch)
      val staged = s"$work/curate/stage_$b"
      slice.coalesce(4).write.mode(SaveMode.Overwrite).parquet(staged)
      val sd = new java.io.File(staged)
      sd.listFiles().filter(_.getName.endsWith(".parquet")).zipWithIndex.foreach {
        case (f, i) => java.nio.file.Files.move(f.toPath,
          java.nio.file.Paths.get(cIn, f"docs_$b%03d_$i.parquet"))
      }
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val dt = (System.nanoTime() - t0) / 1e9
      val (bf, bb) = dirStats(s"$cState/corpus_state")
      val (df2, db) = dirStats(s"$cState/corpus_deltas")
      val (sf, sb) = (bf + df2, bb + db)
      val curated = spark.read.option("basePath", s"$cOut/curated")
        .parquet(s"$cOut/curated").count()
      println(f"[soak] curate batch $b: $dt%.1f s, state $sf files ${sb / 1048576}%d MiB, $curated curated total")
      (b, dt, sf, sb, curated)
    }
    q.stop()

    def arr[T](xs: Seq[T])(f: T => String) = xs.map(f).mkString("[", ",", "]")
    val json =
      s"""{"round":6,"note":"soak at natural sf1: 4 GraftApp batch rounds (2.5M fresh samples each, shared state) + 1 CurateStreamApp session (12 file-source micro-batches of 4k sf1n docs, shared corpus state)",""" +
      s""""graft_rounds":${arr(graftRounds) { case (r, dt, sf, sb, al) =>
        f"""{"round":$r,"sec":$dt%.2f,"state_files":$sf,"state_bytes":$sb,"alerts_total":$al}""" }},""" +
      s""""curate_batches":${arr(curateBatches) { case (b, dt, sf, sb, cu) =>
        f"""{"batch":$b,"sec":$dt%.2f,"state_files":$sf,"state_bytes":$sb,"curated_total":$cu}""" }}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(json)
    spark.stop()
  }
}
