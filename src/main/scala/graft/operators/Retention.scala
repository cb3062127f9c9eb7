package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retention purge (SURVEY T4, `HogPrepare.scala:52-141`): the reference
  * issues driver-side time-sliced HBase scans and per-row deletes; here
  * retention is a partition-level operation on a date-partitioned table —
  * old partitions drop without touching surviving rows (the
  * `.par`-scan/delete machinery disappears entirely).
  */
object Retention {

  /** Write a frame as a date-partitioned table (the layout every
    * 100 TB fact table needs: partition pruning makes both queries and
    * retention O(partitions touched)).
    */
  def writePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("ds", date_format(col(tsCol), "yyyy-MM-dd"))
      .write.partitionBy("ds").mode("overwrite").parquet(path)

  /** Drop partitions older than `cutoffDate` (yyyy-MM-dd), keeping rows
    * matching `keepPredicate` (the reference's "flows with priority-1
    * events survive the purge" exemption, HogPrepare.scala:52-84).
    * Partition directories older than the cutoff are removed wholesale —
    * a metadata operation, never a row-by-row delete — then survivors
    * (materialized first) are appended back. Recent partitions are never
    * rewritten.
    */
  def purgeOlderThan(spark: SparkSession, path: String, cutoffDate: String,
      keepPredicate: Option[org.apache.spark.sql.Column] = None): Unit = {
    val old = spark.read.parquet(path).filter(col("ds") < cutoffDate)
    val survivors = keepPredicate.map(old.filter).getOrElse(old.limit(0)).cache()
    survivors.count() // materialize before the source partitions vanish
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("ds="))
      .filter(_.getPath.getName.stripPrefix("ds=") < cutoffDate)
      .foreach(s => fs.delete(s.getPath, true))
    if (survivors.take(1).nonEmpty)
      survivors.write.partitionBy("ds").mode("append").parquet(path)
    survivors.unpersist()
  }
}
