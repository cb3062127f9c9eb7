package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table support — the co-located-join scale path: two tables
  * bucketed by the same key join WITHOUT either side shuffling (the
  * exchange disappears from the plan; BucketingSpec asserts exactly
  * that). At 100 TB this is the difference between a join that moves
  * terabytes and one that moves nothing: facts bucketed by entity key at
  * write time amortize one shuffle across every future join/aggregation
  * on that key — the Spark-native equivalent of the reference's
  * everything-keyed-by-rowkey HBase layout.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (sorted within buckets so
    * sort-merge joins skip the sort too).
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int, keys: Seq[String]): Unit =
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
