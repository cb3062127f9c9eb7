package graft.flows

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ml.Models

/** The reference's per-protocol K-Means feature surfaces (M1/M2):
  * 17 DNS features (HogDNS.scala:125-141) and 19 HTTP features
  * (HogHTTP.scala:106-124), built over the typed [[FlowSchema]] fact
  * table and fed to [[Models.kmeansFlagger]] at the reference's k=9 /
  * k=32 (HogDNS.scala:56, HogHTTP.scala:52).
  *
  * The probe-derived scalars (`avg_packet_size`, `packet_size-0`, …) are
  * expressions over the per-packet arrays — pure codegen'd column math,
  * computed after the port filter so only matching flows pay for them.
  * Null dissector fields default to 0 exactly like the reference's
  * HashMap defaulting (HogDNS.scala:152-158).
  */
object FlowFeatures {

  private def arrStat(c: Column, f: Column => Column): Column =
    coalesce(f(c), lit(0L)).cast("double")

  private def at(c: Column, i: Int): Column = // 0-indexed like packet_size-%d
    coalesce(try_element_at(c, lit(i + 1)), lit(0L)).cast("double")

  /** Derived per-packet scalars, named after the probe's columns
    * (`-%d` → `_%d` for SQL identifier hygiene).
    */
  def withDerived(flows: DataFrame): DataFrame = {
    val ps = col("packet_sizes")
    val it = col("inter_times")
    val wide = flows
      .withColumn("avg_packet_size",
        when(size(ps) > 0, aggregate(ps, lit(0L), _ + _).cast("double") / size(ps))
          .otherwise(lit(0.0)))
      .withColumn("min_packet_size", arrStat(ps, array_min))
      .withColumn("max_packet_size", arrStat(ps, array_max))
      .withColumn("avg_inter_time",
        when(size(it) > 0, aggregate(it, lit(0L), _ + _).cast("double") / size(it))
          .otherwise(lit(0.0)))
    (0 to 4).foldLeft(wide) { (df, i) =>
      df.withColumn(s"packet_size_$i", at(ps, i))
        .withColumn(s"inter_time_$i", at(it, i))
    }
  }

  /** The 17 DNS K-Means features, reference order (HogDNS.scala:125-141). */
  val dnsFeatureCols: Seq[String] = Seq(
    "avg_packet_size", "packets_without_payload", "avg_inter_time",
    "flow_duration", "max_packet_size", "bytes", "packets", "min_packet_size",
    "packet_size_0", "inter_time_0", "packet_size_1",
    "dns_num_queries", "dns_num_answers", "dns_ret_code", "dns_bad_packet",
    "dns_query_type", "dns_rsp_type")

  /** The 19 HTTP K-Means features, reference order (HogHTTP.scala:106-124). */
  val httpFeatureCols: Seq[String] = Seq(
    "avg_packet_size", "packets_without_payload", "avg_inter_time",
    "flow_duration", "max_packet_size", "bytes", "packets", "min_packet_size",
    "packet_size_0", "inter_time_0", "packet_size_1", "inter_time_1",
    "packet_size_2", "inter_time_2", "packet_size_3", "inter_time_3",
    "packet_size_4", "inter_time_4", "http_method")

  /** Port-53 flows with >1 packet (HogDNS.scala:160-164). The reference
    * also drops flows younger than ~100 min (still mid-capture);
    * `maxFirstSeen` expresses that as an explicit watermark instead of a
    * wall-clock read, so runs are reproducible.
    */
  def dnsFlows(flows: DataFrame, maxFirstSeen: Option[Long] = None): DataFrame = {
    val aged = maxFirstSeen.map(t => flows.filter(col("first_seen") < t)).getOrElse(flows)
    aged.filter((col("lower_port") === 53 || col("upper_port") === 53) && col("packets") > 1)
  }

  /** Port-80 flows with >1 packet (HogHTTP.scala:146-150). */
  def httpFlows(flows: DataFrame, maxFirstSeen: Option[Long] = None): DataFrame = {
    val aged = maxFirstSeen.map(t => flows.filter(col("first_seen") < t)).getOrElse(flows)
    aged.filter((col("lower_port") === 80 || col("upper_port") === 80) && col("packets") > 1)
  }

  /** Feature frame: derived scalars + coalesce-to-0 defaults over the
    * chosen feature list, plus the label columns the taint rule and the
    * alert payload need (HogDNS.scala:211-216). Scale note: select the
    * feature columns FIRST (parquet reads ~20 of ~180 columns), and the
    * per-flow frame collapses to one double[] per row before any shuffle.
    */
  def featureFrame(flows: DataFrame, featureCols: Seq[String]): DataFrame = {
    val derived = withDerived(flows)
    val feats = featureCols.map(c => coalesce(col(c).cast("double"), lit(0.0)).as(c))
    derived.select(
      (Seq(col("lower_ip"), col("upper_ip"), col("host_server_name"),
        col("detected_protocol"),
        (coalesce(col("event_priority_id"), lit(0L)) === 1L).cast("double").as("dirty"))
        ++ feats): _*)
  }

  /** M1: DNS anomaly flags at the reference's k=9. Returns per-flow rows
    * with (prediction, tainted) — tainted=1 flows are the alert set.
    */
  def dnsKmeans(flows: DataFrame, k: Int = 9, seed: Long = 42L): DataFrame =
    Models.kmeansFlagger(
      featureFrame(dnsFlows(flows), dnsFeatureCols).coalesce(4),
      dnsFeatureCols, "dirty", k = k, seed = seed)

  /** M2: HTTP anomaly flags at the reference's k=32. */
  def httpKmeans(flows: DataFrame, k: Int = 32, seed: Long = 42L): DataFrame =
    Models.kmeansFlagger(
      featureFrame(httpFlows(flows), httpFeatureCols).coalesce(4),
      httpFeatureCols, "dirty", k = k, seed = seed)
}
