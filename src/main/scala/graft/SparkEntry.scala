package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one deterministic query per implemented operator from
  * SURVEY.md §2 (plus the LLM-data-pipeline operators); `oracleSql` holds
  * the DuckDB-equivalent SQL for every hash-checkable one. Column names are
  * aligned between the two by construction (the driver sorts columns by
  * name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  private val groups: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (RelationalQueries.queries, RelationalQueries.oracles),
      (HistogramQueries.queries, HistogramQueries.oracles),
      (PipelineQueries.queries, PipelineQueries.oracles),
      (ScalarQueries.queries, ScalarQueries.oracles),
      (StreamingQueries.queries, StreamingQueries.oracles),
      (MlQueries.queries, MlQueries.oracles),
      (StateQueries.queries, StateQueries.oracles),
      (ProfileQueries.queries, ProfileQueries.oracles),
      (AnalyticsQueries.queries, AnalyticsQueries.oracles),
    )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.iterator.map(_._1).reduce(_ ++ _)

  def oracleSql: Map[String, String] =
    groups.iterator.map(_._2).reduce(_ ++ _)
}
