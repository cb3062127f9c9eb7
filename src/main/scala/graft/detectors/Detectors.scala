package graft.detectors

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HistogramFunctions
import graft.functions.NetFunctions

/** The reference's standing detectors (SURVEY §2.4 A3/A4, §2.3 J2-J4,
  * §2.6 O1/O2, §2.8 F9) as pure `DataFrame → DataFrame` functions over
  * the [[FlowSummary]] output. Thresholds mirror the reference's config
  * defaults (`HogSFlow.scala:118-151`); every detector takes them as
  * parameters so a config file can override, and each is independently
  * disable-able by simply not calling it (HogzillaBatch sequences the DAG).
  *
  * Scale notes baked in:
  *  - per-alert flow detail is a bounded top-K (window row_number), never
  *    an unbounded collected set (SURVEY §7.4 risk 2);
  *  - derived exclusion sets (ftpTalkers, p2pTalkers, …) stay DataFrames
  *    and exclude via left_anti joins — no collect/re-broadcast cycles
  *    (SURVEY §3.1 step 5's driver round-trips disappear);
  *  - every rollup is a hash aggregation with map-side partial combine.
  *
  * Alert schema: (detector, my_ip, alien_ip?, metric, n_flows, note).
  */
object Detectors {

  val FlowListLimit = 1000 // alert.maxFlowList

  private def alert(detector: String, myIp: Column, alienIp: Column,
      metric: Column, nFlows: Column, note: Column): Seq[Column] = Seq(
    lit(detector).as("detector"), myIp.as("my_ip"), alienIp.as("alien_ip"),
    metric.cast("double").as("metric"), nFlows.cast("long").as("n_flows"), note.as("note"))

  /** Effective (sampled) bytes both ways. */
  private val scaledBytes: Column =
    (col("bytes_up") + col("bytes_down")) * col("sample_rate")

  // ------------------------------------------------------------ derived sets

  /** (my_ip, alien_ip) pairs talking FTP — excluded from P2P/atypical
    * detectors (J3, HogSFlow.scala:1108-1133).
    */
  def ftpTalkerPairs(summary: DataFrame): DataFrame =
    summary.filter(col("my_port") === "21" || col("alien_port") === "21")
      .select("my_ip", "alien_ip").distinct()

  /** Hosts serving FTP (HogSFlow.scala:1140). */
  def ftpServers(summary: DataFrame): DataFrame =
    summary.filter(col("my_port") === "21").select("my_ip").distinct()

  // -------------------------------------------------------------- detectors

  /** Top talkers by effective upload (O1, HogSFlow.scala:1060-1082). */
  def topTalkers(summary: DataFrame, k: Int = 100): DataFrame =
    summary.groupBy("my_ip")
      .agg(sum(col("bytes_up") * col("sample_rate")).as("up"), count(lit(1)).as("nf"))
      .orderBy(col("up").desc, col("my_ip"))
      .limit(k)
      .select(alert("topTalkers", col("my_ip"), lit(null).cast("string"),
        col("up"), col("nf"), lit("top upload")): _*)

  /** SMTP talkers (A3+O1, HogSFlow.scala:1028-1099): external port-25
    * flows with >3 pkts, per-IP rollup, >1 connection, >20 pkts, effective
    * bytes over threshold, and the host is NOT a known SMTP server/sender
    * per its HIST01/HIST02 profiles (J5/H6).
    */
  def smtpTalkers(summary: DataFrame, myNets: Seq[String],
      hist01: DataFrame, hist02: DataFrame,
      minBytes: Long = 20971520L, k: Int = 100): DataFrame = {
    val rolled = summary
      .filter(col("alien_port") === "25" && col("n_pkts") > 3 &&
        !FlowSummary.isLocalIp(col("alien_ip"), myNets))
      .groupBy("my_ip")
      .agg(sum(scaledBytes).as("eff_bytes"), sum("n_pkts").as("pkts"),
        count(lit(1)).as("connections"))
      .filter(col("connections") > 1 && col("eff_bytes") > minBytes && col("pkts") > 20)
    val smtpServer = profileTypical(hist01, "25").withColumnRenamed("name", "my_ip")
    val smtpSender = profileTypical(hist02, "25").withColumnRenamed("name", "my_ip")
    rolled
      .join(smtpServer, Seq("my_ip"), "left_anti")
      .join(smtpSender, Seq("my_ip"), "left_anti")
      .orderBy(col("eff_bytes").desc, col("my_ip")).limit(k)
      .select(alert("smtpTalkers", col("my_ip"), lit(null).cast("string"),
        col("eff_bytes"), col("connections"), lit("atypical SMTP volume")): _*)
  }

  /** Keys whose profile says `bucket` is typical (frequency > ε). */
  private def profileTypical(profile: DataFrame, bucket: String): DataFrame =
    profile.filter(HistogramFunctions.isTypicalEvent(col("buckets"), lit(bucket)))
      .select("name")

  /** P2P talkers, both reference methods (A4 two-level distinct,
    * HogSFlow.scala:1160-1290). Method 1: >minPairs external pairs over
    * >minPorts local ports. Method 2 (for hosts missed by 1): >minPairs2
    * pairs, >minPorts2 distinct alien ports, >minBytes2 bytes.
    */
  def p2pTalkers(summary: DataFrame, myNets: Seq[String], ftpPairs: DataFrame,
      ftpSrv: DataFrame, minPairs: Int = 5, minPorts: Int = 4,
      minPairs2: Int = 10, minPorts2: Int = 10, minBytes2: Long = 10000000L): DataFrame = {
    val external = summary
      .filter(!FlowSummary.isLocalIp(col("alien_ip"), myNets))
      .join(ftpPairs, Seq("my_ip", "alien_ip"), "left_anti")
    val perPair = external.groupBy("my_ip", "alien_ip")
      .agg(sum("bytes_up").as("up"), sum("bytes_down").as("down"),
        collect_set("my_port").as("my_ports"), collect_set("alien_port").as("alien_ports"),
        count(lit(1)).as("nf"))
    val perIp = perPair.groupBy("my_ip")
      .agg(count(lit(1)).as("pairs"),
        size(array_distinct(flatten(collect_list("my_ports")))).as("n_my_ports"),
        size(array_distinct(flatten(collect_list("alien_ports")))).as("n_alien_ports"),
        sum(col("up") + col("down")).as("bytes"), sum("nf").as("nf"))
      .join(ftpSrv, Seq("my_ip"), "left_anti")
    val m1 = perIp.filter(col("pairs") > minPairs && col("n_my_ports") > minPorts)
      .select(alert("p2pTalkers", col("my_ip"), lit(null).cast("string"),
        col("pairs"), col("nf"), lit("p2p method1")): _*)
    val m2 = perIp
      .join(m1.select(col("my_ip")), Seq("my_ip"), "left_anti") // only hosts missed by method 1
      .filter(col("pairs") > minPairs2 && col("n_alien_ports") > minPorts2 &&
        col("bytes") > minBytes2)
      .select(alert("p2pTalkers", col("my_ip"), lit(null).cast("string"),
        col("pairs"), col("nf"), lit("p2p method2")): _*)
    m1.union(m2)
  }

  /** Media-streaming clients (HogSFlow.scala:1295-1360): long-lived
    * (5 min..2 h) download-heavy external flows, small upload, excluding
    * VPN port 1194 and P2P hosts (detector DAG J4).
    */
  def mediaStreamingClients(summary: DataFrame, myNets: Seq[String], p2pHosts: DataFrame,
      minDuration: Int = 300, maxDuration: Int = 7200,
      maxUpload: Long = 10000000L, minDownload: Long = 1000000L): DataFrame =
    summary
      .filter(!FlowSummary.isLocalIp(col("alien_ip"), myNets) &&
        col("alien_port") =!= "1194" &&
        (col("t_max") - col("t_min")).between(minDuration, maxDuration))
      .groupBy("my_ip", "alien_ip")
      .agg(sum("bytes_up").as("up"), sum("bytes_down").as("down"), count(lit(1)).as("nf"))
      .filter(col("down") > minDownload && col("up") < maxUpload)
      .join(p2pHosts, Seq("my_ip"), "left_anti")
      .select(alert("mediaStreaming", col("my_ip"), col("alien_ip"),
        col("down"), col("nf"), lit("streaming client")): _*)

  /** Atypical-open-port access (HIST01 + H5, HogSFlow.scala:1370-1520):
    * served ports this window that the host's learned profile has never
    * seen. Cold-start profiles (size < minObs) learn only.
    */
  def atypicalPorts(summary: DataFrame, hist01: DataFrame, minObs: Long = 100,
      minPktsPerFlow: Int = 2,
      excludePorts: Seq[String] = Seq("80", "443", "587", "465", "993", "995")): DataFrame = {
    val current = HistogramFunctions.buildHistogram(
      summary.filter(col("direction") < 0 && col("n_pkts") > minPktsPerFlow &&
          !col("my_port").isin(excludePorts: _*))
        .groupBy(col("my_ip"), col("my_port").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Seq("my_ip"))
    current
      .join(hist01.withColumnRenamed("name", "my_ip")
        .withColumnRenamed("size", "psize").withColumnRenamed("buckets", "pbuckets"),
        Seq("my_ip"))
      .filter(col("psize") >= minObs)
      .select(col("my_ip"),
        explode(HistogramFunctions.atypicalKeys(col("pbuckets"), col("buckets"))).as("port"))
      .select(alert("atypicalPorts", col("my_ip"), lit(null).cast("string"),
        col("port").cast("double"), lit(1), concat(lit("atypical open port "), col("port"))): _*)
  }

  /** Atypical alien-port access (HIST02, HogSFlow.scala:1530-1650) —
    * same shape from the client side: ports contacted on remote hosts.
    */
  def atypicalAlienPorts(summary: DataFrame, hist02: DataFrame, minObs: Long = 100,
      minPktsPerFlow: Int = 2): DataFrame = {
    val current = HistogramFunctions.buildHistogram(
      summary.filter(col("direction") > 0 && col("n_pkts") > minPktsPerFlow)
        .groupBy(col("my_ip"), col("alien_port").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Seq("my_ip"))
    current
      .join(hist02.withColumnRenamed("name", "my_ip")
        .withColumnRenamed("size", "psize").withColumnRenamed("buckets", "pbuckets"),
        Seq("my_ip"))
      .filter(col("psize") >= minObs)
      .select(col("my_ip"),
        explode(HistogramFunctions.atypicalKeys(col("pbuckets"), col("buckets"))).as("port"))
      .select(alert("atypicalAlienPorts", col("my_ip"), lit(null).cast("string"),
        col("port").cast("double"), lit(1), concat(lit("atypical alien port "), col("port"))): _*)
  }

  /** Atypical pair-count (HIST03 log-binned, HogSFlow.scala:1757-1824):
    * the number of distinct partners this window falls in a log bin the
    * profile has never seen.
    */
  def atypicalPairs(summary: DataFrame, hist03: DataFrame, minObs: Long = 100,
      minPairs: Int = 300): DataFrame = {
    val pairs = summary.groupBy("my_ip")
      .agg(countDistinct("alien_ip").as("pairs"))
      .filter(col("pairs") > minPairs)
      .withColumn("bin", HistogramFunctions.logBin(col("pairs").cast("double")).cast("string"))
    pairs.join(hist03.withColumnRenamed("name", "my_ip"), Seq("my_ip"))
      .filter(col("size") >= minObs &&
        !HistogramFunctions.isTypicalEvent(col("buckets"), col("bin")))
      .select(alert("atypicalPairs", col("my_ip"), lit(null).cast("string"),
        col("pairs"), col("pairs"), concat(lit("pair-count bin "), col("bin"))): _*)
  }

  /** Atypical upload volume (HIST04 log-binned bytesUp,
    * HogSFlow.scala:1863-1933).
    */
  def atypicalData(summary: DataFrame, hist04: DataFrame, minObs: Long = 100,
      minBytes: Long = 5737418240L): DataFrame = {
    val vol = summary.groupBy("my_ip")
      .agg(sum(col("bytes_up") * col("sample_rate")).as("up"), count(lit(1)).as("nf"))
      .filter(col("up") > minBytes)
      .withColumn("bin", HistogramFunctions.logBin(col("up").cast("double")).cast("string"))
    vol.join(hist04.withColumnRenamed("name", "my_ip"), Seq("my_ip"))
      .filter(col("size") >= minObs &&
        !HistogramFunctions.isTypicalEvent(col("buckets"), col("bin")))
      .select(alert("atypicalData", col("my_ip"), lit(null).cast("string"),
        col("up"), col("nf"), concat(lit("upload bin "), col("bin"))): _*)
  }

  /** Alien /24 access burst (HIST05 per network, A4+J6,
    * HogSFlow.scala:1993-2113): one external host touching many local
    * pairs.
    */
  def alienAccess(summary: DataFrame, myNets: Seq[String], minPairs: Int = 20): DataFrame =
    summary
      .filter(!FlowSummary.isLocalIp(col("alien_ip"), myNets))
      .groupBy("alien_ip")
      .agg(countDistinct("my_ip").as("pairs"), count(lit(1)).as("nf"))
      .filter(col("pairs") > minPairs)
      .select(alert("alienAccess", lit(null).cast("string"), col("alien_ip"),
        col("pairs"), col("nf"), lit("alien touching many local hosts")): _*)

  /** UDP amplification reflector (A3, HogSFlow.scala:2155-2191): UDP from
    * an amplification service port with a huge packet count and
    * essentially one-way traffic.
    */
  def udpAmplifier(summary: DataFrame, minPkts: Int = 2000,
      ampPorts: Seq[String] = Seq("19", "53", "123", "161", "389", "1900")): DataFrame =
    summary
      .filter(col("proto") === "17" && col("my_port").isin(ampPorts: _*) &&
        col("n_pkts") > minPkts)
      .groupBy("my_ip")
      .agg(sum(scaledBytes).as("eff_bytes"), sum("n_pkts").as("pkts"), count(lit(1)).as("nf"))
      .select(alert("udpAmplifier", col("my_ip"), lit(null).cast("string"),
        col("pkts"), col("nf"), lit("amplification reflector")): _*)

  /** Abused SMTP relay (keyed by pair, HogSFlow.scala:2219-2252). */
  def abusedSmtp(summary: DataFrame, minBytes: Long = 50000000L, k: Int = 100): DataFrame =
    summary.filter(col("alien_port") === "25")
      .groupBy("my_ip", "alien_ip")
      .agg(sum(scaledBytes).as("eff_bytes"), count(lit(1)).as("nf"))
      .filter(col("eff_bytes") > minBytes)
      .orderBy(col("eff_bytes").desc, col("my_ip"), col("alien_ip")).limit(k)
      .select(alert("abusedSMTP", col("my_ip"), col("alien_ip"),
        col("eff_bytes"), col("nf"), lit("smtp relay abuse")): _*)

  /** DNS tunnel (HogSFlow.scala:2281-2309): port-53 volume way past name
    * resolution.
    */
  def dnsTunnel(summary: DataFrame, minBytes: Long = 25000000L, k: Int = 30): DataFrame =
    summary.filter(col("alien_port") === "53" || col("my_port") === "53")
      .groupBy("my_ip")
      .agg(sum(scaledBytes).as("eff_bytes"), count(lit(1)).as("nf"))
      .filter(col("eff_bytes") > minBytes)
      .orderBy(col("eff_bytes").desc, col("my_ip")).limit(k)
      .select(alert("dnsTunnel", col("my_ip"), lit(null).cast("string"),
        col("eff_bytes"), col("nf"), lit("dns tunnel volume")): _*)

  /** ICMP tunnel (A2 shape, HogSFlow.scala:2341-2370): big ICMP payloads,
    * big totals.
    */
  def icmpTunnel(summary: DataFrame, minPktSize: Int = 200,
      minBytes: Long = 100000000L, k: Int = 30): DataFrame =
    summary.filter(col("proto").isin("1", "58") &&
        (col("bytes_up") + col("bytes_down")) / col("n_pkts") > minPktSize)
      .groupBy("my_ip")
      .agg(sum(scaledBytes).as("eff_bytes"), count(lit(1)).as("nf"))
      .filter(col("eff_bytes") > minBytes)
      .orderBy(col("eff_bytes").desc, col("my_ip")).limit(k)
      .select(alert("icmpTunnel", col("my_ip"), lit(null).cast("string"),
        col("eff_bytes"), col("nf"), lit("icmp tunnel volume")): _*)

  /** Horizontal port scan (3-level A4, HogSFlow.scala:2403-2463): one
    * alien probing the same port across many local hosts.
    */
  def hPortScan(summary: DataFrame, myNets: Seq[String], minFlows: Int = 100,
      excludeAlienPorts: Seq[String] = Seq("80", "443", "53"),
      excludeMyPorts: Seq[String] = Seq("123")): DataFrame =
    summary
      .filter(!FlowSummary.isLocalIp(col("alien_ip"), myNets) &&
        !col("alien_port").isin(excludeAlienPorts: _*) &&
        !col("my_port").isin(excludeMyPorts: _*))
      .groupBy("alien_ip", "my_port")
      .agg(countDistinct("my_ip").as("hosts"), count(lit(1)).as("nf"))
      .filter(col("nf") >= minFlows && col("hosts") > 1)
      .select(alert("hPortScan", lit(null).cast("string"), col("alien_ip"),
        col("hosts"), col("nf"), concat(lit("horizontal scan on port "), col("my_port"))): _*)

  /** Vertical port scan (HogSFlow.scala:2599-2640 + HIST08): one alien
    * probing many low ports on one local host.
    */
  def vPortScan(summary: DataFrame, myNets: Seq[String], minPorts: Int = 3,
      maxPortNumber: Int = 1024): DataFrame =
    summary
      .filter(!FlowSummary.isLocalIp(col("alien_ip"), myNets) &&
        col("my_port").cast("int") < maxPortNumber)
      .groupBy("my_ip", "alien_ip")
      .agg(countDistinct("my_port").as("ports"), count(lit(1)).as("nf"))
      .filter(col("ports") >= minPorts)
      .select(alert("vPortScan", col("my_ip"), col("alien_ip"),
        col("ports"), col("nf"), lit("vertical port scan")): _*)

  /** DDoS burst (A4 + F9 trimmed mean, HogSFlow.scala:2676-2731): many
    * flows from many pairs whose inter-arrival gaps — after dropping the
    * 4 largest — average under a minute.
    */
  def ddos(summary: DataFrame, minFlows: Int = 50, minPairs: Int = 20,
      maxMeanGapSecs: Double = 60.0): DataFrame = {
    val byStart = Window.partitionBy(col("my_ip")).orderBy(col("t_min"), col("alien_ip"), col("alien_port"))
    val gaps = summary
      .withColumn("gap", col("t_min") - lag(col("t_min"), 1).over(byStart))
      .filter(col("gap").isNotNull)
    val byGap = Window.partitionBy(col("my_ip")).orderBy(col("gap").desc, col("t_min"), col("alien_ip"), col("alien_port"))
    val trimmed = gaps.withColumn("gr", row_number().over(byGap)).filter(col("gr") > 4)
      .groupBy("my_ip").agg(avg("gap").as("mean_gap"))
    summary.groupBy("my_ip")
      .agg(count(lit(1)).as("nf"), countDistinct("alien_ip").as("pairs"))
      .filter(col("nf") > minFlows && col("pairs") > minPairs)
      .join(trimmed, Seq("my_ip"))
      .filter(col("mean_gap") < maxMeanGapSecs)
      .select(alert("ddos", col("my_ip"), lit(null).cast("string"),
        col("mean_gap"), col("nf"), lit("ddos burst")): _*)
  }

  /** Botnet C&C contact (J2 longest-prefix blacklist,
    * HogSFlow.scala:2770-2808): chatty flows to a blacklisted prefix.
    */
  def botnetCC(summary: DataFrame, blacklist: DataFrame, minPktsPerFlow: Int = 20): DataFrame = {
    val chatty = summary.filter(col("n_pkts") >= minPktsPerFlow)
      .select("my_ip", "alien_ip", "n_pkts")
    NetFunctions.longestPrefixJoin(chatty, "alien_ip", blacklist)
      .filter(col("best_prefix").isNotNull)
      .groupBy("my_ip")
      .agg(countDistinct("alien_ip").as("cc_hosts"), sum("n_pkts").as("pkts"))
      .select(alert("botnetCC", col("my_ip"), lit(null).cast("string"),
        col("cc_hosts"), col("pkts"), lit("blacklisted C&C contact")): _*)
  }

  /** OS discovery (J7, HogSFlow.scala:2838-2868): which update
    * repositories each host talks to → inferred OS set.
    */
  def osDiscovery(summary: DataFrame, osRepos: DataFrame): DataFrame =
    summary.join(broadcast(osRepos), col("alien_ip") === osRepos("repo_ip"))
      .groupBy("my_ip")
      .agg(concat_ws(",", array_sort(collect_set(col("os")))).as("oses"),
        count(lit(1)).as("nf"))
      .select(alert("osDiscovery", col("my_ip"), lit(null).cast("string"),
        lit(0.0), col("nf"), concat(lit("os: "), col("oses"))): _*)
}
