package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HistogramFunctions._

/** Read-modify-write profile state (the reference's HIST* tables).
  *
  * The reference fetches and upserts one HBase row per aggregation key from
  * inside `foreach` (HogHBaseHistogram.scala:75-136 — an RPC per key).
  * Batch-idiomatic rewrite (SURVEY §7.4): one full-outer equi-join of the
  * batch histograms against the state table, merge in columns, atomically
  * overwrite the state path. At 100 TB the state table is bucketed by
  * `name` so this join is shuffle-free on the state side.
  *
  * Schema of both sides: (name string, size long, buckets map<string,double>).
  */
object ProfileStore {

  /** Merge a batch of freshly-built histograms into the saved profiles.
    * New keys pass through; existing keys get the decayed weighted merge.
    */
  def update(state: DataFrame, batch: DataFrame): DataFrame = {
    val st = state.select(col("name"), col("size").as("s1"), col("buckets").as("b1"))
    val ba = batch.select(col("name"), col("size").as("s2"), col("buckets").as("b2"))
    st.join(ba, Seq("name"), "full_outer")
      .select(
        col("name"),
        when(col("s1").isNull, col("s2"))
          .when(col("s2").isNull, col("s1"))
          .otherwise(mergedSize(col("s1"), col("s2"))).as("size"),
        when(col("s1").isNull, col("b2"))
          .when(col("s2").isNull, col("b1"))
          .otherwise(mergeBuckets(col("s1"), col("b1"), col("s2"), col("b2"))).as("buckets"))
  }

  /** Bucket-wise-max merge of count-valued profiles (the reference's
    * Histograms.mergeMax, Histograms.scala:141-168 — HIST07 max-flows-per-
    * port): size = s1+s2, each bucket keeps the larger observed value.
    * New keys pass through unchanged.
    */
  def updateMax(state: DataFrame, batch: DataFrame): DataFrame = {
    val st = state.select(col("name"), col("size").as("s1"), col("buckets").as("b1"))
    val ba = batch.select(col("name"), col("size").as("s2"), col("buckets").as("b2"))
    st.join(ba, Seq("name"), "full_outer")
      .select(
        col("name"),
        (coalesce(col("s1"), lit(0L)) + coalesce(col("s2"), lit(0L))).as("size"),
        when(col("b1").isNull, col("b2"))
          .when(col("b2").isNull, col("b1"))
          .otherwise(mergeMaxBuckets(col("b1"), col("b2"))).as("buckets"))
  }

  /** Last-window snapshot overwrite (the reference's HIST02.1,
    * HogSFlow.scala:1722: `saveHistogram(new HogHistogram("HIST02.1-"+ip,
    * n, hist))`): keys seen this window REPLACE their snapshot; unseen
    * keys keep the previous one.
    */
  def snapshot(state: DataFrame, batch: DataFrame): DataFrame = {
    val st = state.select(col("name"), col("size").as("s1"), col("buckets").as("b1"))
    val ba = batch.select(col("name"), col("size").as("s2"), col("buckets").as("b2"))
    st.join(ba, Seq("name"), "full_outer")
      .select(
        col("name"),
        coalesce(col("s2"), col("s1")).as("size"),
        coalesce(col("b2"), col("b1")).as("buckets"))
  }

  /** Learn-then-alert: join the batch to state and emit one row per
    * atypical bucket, but only for profiles past the cold-start threshold
    * (the reference's histSize<10/30/100 learn-only gates,
    * HogSFlow.scala:1500,1638; HogAuth.scala:349).
    */
  def atypicalAlerts(state: DataFrame, batch: DataFrame, minObservations: Long): DataFrame = {
    val st = state.select(col("name"), col("size").as("s1"), col("buckets").as("b1"))
    val ba = batch.select(col("name"), col("size").as("s2"), col("buckets").as("b2"))
    ba.join(st, Seq("name"), "inner")
      .filter(col("s1") >= minObservations)
      .select(col("name"), explode(atypicalKeys(col("b1"), col("b2"))).as("bucket"))
  }

  /** Insert-if-absent upsert (S7: the reference's signature sink,
    * HogSignature.scala:35-52 — a Get-then-Put that never overwrites an
    * existing row): keys already in the state keep their exact row, only
    * genuinely new keys are appended. Generic over schema — both sides
    * just need `keyCols`. One left_anti join, broadcastable when the
    * update batch is small (signatures: a handful per run).
    */
  def insertIfAbsent(state: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    state.unionByName(
      updates.dropDuplicates(keyCols).join(state, keyCols, "left_anti"))

  /** Last-write-wins upsert (S7: the reference's inventory/sensor sinks,
    * HogHBaseInventory.scala:40-49, HogInitiate.scala:35-48 — an HBase Put
    * overwrites cells in place): update rows replace state rows with the
    * same key; unmatched state survives. Re-running the same batch is a
    * no-op — the idempotence the reference gets from HBase row identity.
    *
    * Contract: the update batch should carry one row per key. If it
    * doesn't, `dropDuplicates` keeps an arbitrary one (exactly as
    * concurrent HBase Puts race on timestamp) — resolve conflicts
    * upstream (e.g. a window over an ordering column) when the winner
    * matters.
    */
  def upsert(state: DataFrame, updates: DataFrame, keyCols: Seq[String]): DataFrame =
    updates.dropDuplicates(keyCols)
      .unionByName(state.join(updates, keyCols, "left_anti"))

  def load(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** Atomic overwrite of the state table (replaces per-row HBase Puts). */
  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}
