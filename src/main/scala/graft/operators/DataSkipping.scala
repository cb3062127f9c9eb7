package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps (per-bucket min/max statistics) as a library operator — the
  * data-skipping layer file formats keep per row group and table formats
  * keep per file, materialized here as a queryable stats table so a
  * 100 TB scan can prune buckets BEFORE touching them.
  *
  * At scale `bucketOf` is the table's physical layout key (partition dir,
  * file, or sorted-range id): pruning then maps 1:1 to skipped IO. On a
  * flat fixture the pruning is a semi-join on the bucket id — the plan
  * shape is identical, only the physical skip differs.
  */
object DataSkipping {

  /** Per-bucket stats: row count plus min/max of each tracked column.
    * One map-side-combinable aggregate — stats tables are O(buckets).
    */
  def zoneMap(df: DataFrame, bucketOf: Column, cols: Seq[String]): DataFrame =
    df.groupBy(bucketOf.as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** Exact range scan that consults the zone map first: buckets whose
    * [min, max] envelope can't intersect [lo, hi] are never read; the
    * exact predicate then filters inside surviving buckets. The bucket
    * list is stats-table-sized, so the pruning join broadcasts.
    */
  def prunedRangeScan(df: DataFrame, bucketOf: Column, statsTable: DataFrame,
                      valueCol: String, lo: Column, hi: Column): DataFrame = {
    val live = statsTable
      .filter(col(s"max_$valueCol") >= lo && col(s"min_$valueCol") <= hi)
      .select(col("bucket"))
    df.withColumn("__bucket", bucketOf)
      .join(broadcast(live), col("__bucket") === col("bucket"), "left_semi")
      .drop("__bucket")
      .filter(col(valueCol) >= lo && col(valueCol) <= hi)
  }
}
