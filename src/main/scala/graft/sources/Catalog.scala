package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver-generated parquet fixtures.
  *
  * Replaces the reference's HBase table handles
  * (`/root/reference/src/org/hogzilla/hbase/HogHBaseRDD.scala:234-245`) with
  * plain parquet reads: DataSource V2 plans splits, Catalyst prunes columns
  * and pushes filters — the reference's hand-rolled `SCAN_COLUMNS` /
  * `SingleColumnValueFilter` machinery is free here.
  *
  * At 100 TB these tables would be date-partitioned (`ds=YYYY-MM-DD`) and
  * bucketed by entity key; the reader API is identical, so the local
  * fixtures stand in without code changes.
  */
object Catalog {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  /** events.parquet carries TIMESTAMP(NANOS) which vanilla Spark 4 refuses;
    * read nanos as long and rebuild a microsecond timestamp. The nanos→µs
    * division MUST be integer (`DIV`): the values exceed 2^53, so going
    * through double (`/`) loses low bits and drifts the reconstructed
    * timestamp by up to ±1 ms vs DuckDB's exact epoch arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    table(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
