package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The typed nDPI flow fact table (SURVEY §2.9 prerequisite): every
  * column the reference declares for its HBase `hogzilla_flows` table
  * (HogHBaseRDD.scala:46-225), re-expressed as one parquet-friendly
  * `StructType`.
  *
  * Differences from the reference's storage model — deliberate,
  * Spark-first:
  *  - HBase dynamic per-packet columns (`flow:packet_size-%d`,
  *    `flow:inter_time-%d`, HogPrepare.scala:151-171) become two
  *    `array<long>` columns; the probe's derived scalars
  *    (`avg_packet_size`, `inter_time-0`, …) are column expressions over
  *    them ([[FlowFeatures.withDerived]]), so they're never stored
  *    denormalized and never drift from the arrays.
  *  - `char` → string, every `u_int*` → long: parquet's dictionary +
  *    RLE encodings make the width question moot, and long avoids
  *    unsigned-overflow surprises the u_int32 columns invite.
  *  - the probe-side pair identity (`lower_ip/upper_ip/lower_port/
  *    upper_port`, `detected_protocol` — read by HogDNS.scala:160-168 but
  *    absent from the declared column list) is included, since the DNS
  *    and HTTP detectors filter on it.
  *
  * At 100 TB this table is date-partitioned (`Retention.writePartitioned`)
  * and the ML extractors below prune to (ds, port) before touching any
  * wide column — parquet column pruning means a 17-column feature read
  * never pays for the ~180-column width.
  */
object FlowSchema {

  private def s(n: String) = StructField(n, StringType)
  private def l(n: String) = StructField(n, LongType)

  /** min/max/avg/std group, reference naming. */
  private def stats(prefix: String): Seq[StructField] =
    Seq(l(s"${prefix}_avg"), l(s"${prefix}_min"), l(s"${prefix}_max"), l(s"${prefix}_std"))

  /** Per-flow columns (HogHBaseRDD.scala:46-211), `flow:` family. */
  val flowFields: Seq[StructField] =
    Seq(
      l("first_seen"), s("bittorent_hash"), s("info"), s("host_server_name"),
      s("ssh_ssl_client_info"), s("ssh_ssl_server_info"),
      s("src_ip"), s("dst_ip"), l("src_port"), l("dst_port"), s("protocol"),
      s("src_name"), s("dst_name"),
      l("bytes"), l("packets"), l("payload_bytes"), l("packets_without_payload"),
      l("payload_bytes_first"), l("flow_duration"), l("flow_use_time"), l("flow_idle_time"),
      l("src2dst_pay_bytes"), l("dst2src_pay_bytes"),
      l("src2dst_header_bytes"), l("dst2src_header_bytes"),
      l("src2dst_packets"), l("dst2src_packets")) ++
    stats("src2dst_inter_time") ++ stats("dst2src_inter_time") ++
    stats("src2dst_pay_bytes") ++ stats("dst2src_pay_bytes") ++
    Seq(l("dst2src_pay_bytes_rate"), l("src2dst_pay_bytes_rate"),
      l("dst2src_packets_rate"), l("src2dst_packets_rate")) ++
    stats("inter_time") ++
    Seq(l("payload_bytes_avg"), l("payload_bytes_std"),
      l("payload_bytes_min"), l("payload_bytes_max")) ++
    stats("src2dst_header_bytes") ++ stats("dst2src_header_bytes") ++
    Seq(l("packets_syn"), l("packets_ack"), l("packets_fin"),
      l("packets_rst"), l("packets_psh"), l("packets_urg"), l("tcp_retransmissions"))

  /** Contact-aggregated columns (`flow:C_*`, HogHBaseRDD.scala:116-185):
    * the probe's rolling per-contact statistics.
    */
  val contactFields: Seq[StructField] =
    l("C_number_of_contacts") +:
    Seq("C_src2dst_pay_bytes", "C_src2dst_header_bytes", "C_src2dst_packets",
      "C_dst2src_pay_bytes", "C_dst2src_header_bytes", "C_dst2src_packets",
      "C_packets_syn", "C_packets_ack", "C_packets_fin", "C_packets_rst",
      "C_packets_psh", "C_packets_urg", "C_tcp_retransmissions",
      "C_dst2src_pay_bytes_rate", "C_src2dst_pay_bytes_rate",
      "C_dst2src_packets_rate", "C_src2dst_packets_rate",
      "C_duration", "C_idletime").flatMap(stats)

  /** Protocol-dissector columns (`flow:dns_*`, `flow:http_*`, detection
    * metadata; HogHBaseRDD.scala:186-211) plus the probe-side extras the
    * detectors read (HogDNS.scala:145-168: `dns_ret_code`,
    * `dns_bad_packet`, pair identity, `detected_protocol`).
    */
  val dissectorFields: Seq[StructField] = Seq(
    l("response_rel_time"), l("detection_completed"), s("ndpi_risk"), s("detected_os"),
    l("dns_num_queries"), l("dns_num_answers"), l("dns_reply_code"),
    l("dns_query_type"), l("dns_query_class"), l("dns_rsp_type"),
    l("dns_ret_code"), l("dns_bad_packet"),
    s("http_url"), s("http_content_type"), l("http_method"),
    l("http_num_request_headers"), l("http_num_response_headers"),
    l("http_request_version"), l("http_response_status_code"),
    s("lower_ip"), s("upper_ip"), l("lower_port"), l("upper_port"),
    s("detected_protocol"))

  /** Snort event join columns (`event:` family, HogHBaseRDD.scala:213-221). */
  val eventFields: Seq[StructField] = Seq(
    l("event_sensor_id"), l("event_event_id"), l("event_second"),
    l("event_microsecond"), l("event_signature_id"), l("event_generator_id"),
    l("event_classification_id"), l("event_priority_id"))

  /** Per-packet measurement arrays — the Spark-native shape of the
    * probe's `packet_size-%d` / `inter_time-%d` dynamic columns.
    */
  val packetFields: Seq[StructField] = Seq(
    StructField("packet_sizes", ArrayType(LongType)),
    StructField("inter_times", ArrayType(LongType)))

  val schema: StructType =
    StructType((flowFields ++ contactFields ++ dissectorFields ++ eventFields ++ packetFields)
      .map(_.copy(nullable = true)))

  def empty(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Deterministically shape the synthetic `events` table into FlowRecords
    * so the ML surfaces have a full-schema input at test scale: every
    * field is a pure expression of event columns (no randomness — the
    * same event row always produces the same flow). Unmapped columns stay
    * null, exactly like a probe that didn't emit them; the extractors'
    * coalesce-to-0 defaulting (HogDNS.scala:152-158) is what gets
    * exercised.
    */
  def fromEvents(events: DataFrame): DataFrame = {
    // archetype-structured features, not hash-uniform noise: three
    // dominant traffic shapes plus a ~1% anomalous tail, so K-Means over
    // the result behaves like real traffic (big normal clusters, tiny
    // taintable ones) instead of flagging everything
    val e = events
      .withColumn("h", abs(hash(col("event_id"))).cast("long"))
      .withColumn("arch", col("h") % 100)
      .withColumn("anom", (col("arch") === 99).cast("long"))
      // normal archetypes are exact point-masses in feature space: k-means
      // with k ≫ 3 then leaves surplus centers empty instead of shaving a
      // blob into below-threshold cells; only the anomalous tail has
      // per-flow jitter (it's allowed to look like a diffuse cluster)
      .withColumn("sz",
        when(col("arch") === 99, lit(900L) + col("h") % 100)
          .otherwise(lit(60L) + (col("arch") % 3) * 200))
    val mapped = e.select(
      col("event_id").as("first_seen"),
      concat(lit("10.0."), (col("h") % 250).cast("string"), lit("."),
        ((col("h") / 250).cast("long") % 250).cast("string")).as("lower_ip"),
      concat(lit("198.51."), ((col("h") / 7).cast("long") % 250).cast("string"), lit("."),
        ((col("h") / 11).cast("long") % 250).cast("string")).as("upper_ip"),
      // ~1/3 DNS, ~1/3 HTTP, rest high ports — drives the detector filters
      when(col("h") % 3 === 0, 53L).when(col("h") % 3 === 1, 80L)
        .otherwise(col("h") % 50000 + 1024).as("lower_port"),
      (col("h") % 60000 + 1024).as("upper_port"),
      when(col("h") % 3 === 0, "DNS").when(col("h") % 3 === 1, "HTTP")
        .otherwise("Unknown").as("detected_protocol"),
      col("event_type").as("host_server_name"),
      (col("sz") * (col("arch") % 3 + 2 + col("anom") * 30)).as("bytes"),
      (col("arch") % 3 + 2 + col("anom") * 30).as("packets"),
      (col("arch") % 3).as("packets_without_payload"),
      ((col("arch") % 3) * 8000 + 1000 +
        col("anom") * (lit(90000L) + col("h") % 500)).as("flow_duration"),
      (col("arch") % 4 + col("anom") * (lit(800L) + col("h") % 50)).as("dns_num_queries"),
      (col("arch") % 4 + col("anom") * 790).as("dns_num_answers"),
      (col("anom") * (col("h") % 4 + 1)).as("dns_ret_code"),
      col("anom").as("dns_bad_packet"),
      ((col("arch") % 3) + 1).as("dns_query_type"),
      (col("arch") % 2).as("dns_rsp_type"),
      ((col("arch") % 3) + 1 + col("anom") * 5).as("http_method"),
      (col("h") % 13).as("http_num_request_headers"),
      (col("h") % 11).as("http_num_response_headers"),
      lit(200L).as("http_response_status_code"),
      // priority-1 events mark the "dirty" rows the taint rule keys on;
      // the anomalous tail is always dirty (the planted signal)
      when(col("anom") === 1 || col("event_type") === "purchase", 1L)
        .otherwise(3L).as("event_priority_id"),
      transform(sequence(lit(0), col("arch") % 3 + 1 + col("anom") * 10),
        i => col("sz") + (i * 37) % 8).as("packet_sizes"),
      transform(sequence(lit(0), col("arch") % 3 + col("anom") * 10),
        i => (col("arch") % 3) * 1000 + (i * 13) % 50 +
          col("anom") * (lit(20000L) + col("h") % 300)).as("inter_times"))
    // widen to the full schema: anything unmapped is a null column
    val have = mapped.columns.toSet
    mapped.select(schema.fieldNames.map(n =>
      if (have(n)) col(n) else lit(null).cast(schema(n).dataType).as(n)): _*)
  }
}
