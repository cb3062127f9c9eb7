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
  /** events.parquet has carried TIMESTAMP(NANOS) — which vanilla Spark 4
    * refuses — in some fixture generations and plain TIMESTAMP(MICROS) in
    * others, so adapt to what's on disk: under `nanosAsLong` a nanos
    * column reads as LongType and gets its microsecond timestamp rebuilt;
    * a micros column reads as a timestamp already and only needs the
    * NTZ→session-UTC cast to keep one output type across layouts. The
    * nanos→µs division MUST be integer (`DIV`): the values exceed 2^53,
    * so going through double (`/`) loses low bits and drifts the
    * reconstructed timestamp by up to ±1 ms vs DuckDB's exact epoch
    * arithmetic.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
