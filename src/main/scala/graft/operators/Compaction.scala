package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for parquet directories — the housekeeping
  * pass every micro-batch sink eventually needs: streaming appends and
  * per-batch-id output directories ([[graft.GraftContinuousApp]],
  * [[graft.CurateStreamApp]]) accumulate files far smaller than an HDFS
  * block, and at 100 TB the resulting open/seek overhead and NameNode
  * pressure dominate scan cost long before data volume does.
  *
  * [[compact]] rewrites a directory into ~`targetBytes`-sized files via
  * one repartition (an even-sized shuffle — `coalesce` would be
  * shuffle-free but inherits the input's skew, and compaction exists
  * precisely to fix layout) and replaces the directory through
  * [[StateSwap]]'s stage-then-rename, so readers never observe a
  * half-compacted table and a crash mid-compaction recovers to one of
  * the two complete states.
  *
  * The driver-side work is one file-metadata listing (size + count) —
  * the same listing any scan's split planning performs; no row data
  * touches the driver.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
                         bytes: Long, rows: Long)

  /** Rewrite `path` (a non-partitioned parquet directory) into
    * ceil(bytes / targetBytes) files. Returns before/after stats.
    * Partition-structured tables (e.g. `batch=N` sinks) should compact
    * each partition directory individually — compacting ACROSS replay
    * partitions would break the overwrite-idempotence contract.
    */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Stats = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    if (files.isEmpty) return Stats(0, 0, 0L, 0L) // nothing to compact (or marker-only dir)
    val totalBytes = files.map(_.getLen).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(path)
    val rows = df.count()
    StateSwap.swap(df.repartition(n), path)
    val after = fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    Stats(files.length, after, totalBytes, rows)
  }
}
