package graft.detectors

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HistogramFunctions
import graft.operators.ProfileStore

/** The 6-hourly batch analytics run (`Hogzilla.main`,
  * `src/Hogzilla.scala:49-78`) re-sequenced Spark-first: one cached flow
  * summary fans out to every detector; derived-set dependencies
  * (ftpTalkers → p2p → mediaStreaming, SURVEY §2.3 J4) are explicit
  * DataFrame handoffs instead of collect/re-broadcast round-trips; the
  * profile learn pass is one ProfileStore.update at the end instead of a
  * per-key RPC inside foreach (SURVEY §7.4 risk 1).
  */
object HogzillaBatch {

  case class ProfileTables(
      hist01: DataFrame, // open server ports per host
      hist02: DataFrame, // alien ports contacted per host
      hist03: DataFrame, // log-binned pair counts
      hist04: DataFrame) // log-binned upload bytes

  /** Empty profile state with the (name, size, buckets) schema. */
  def emptyProfiles(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("name", StringType), StructField("size", LongType),
        StructField("buckets", MapType(StringType, DoubleType)))))
  }

  /** Run every detector over one batch of raw sFlow samples.
    * Returns (alerts, updated profile tables).
    */
  def run(spark: SparkSession, samples: DataFrame, myNets: Seq[String],
      profiles: ProfileTables, blacklist: DataFrame, osRepos: DataFrame): (DataFrame, ProfileTables) = {

    val summary = FlowSummary.summarize(samples, myNets).cache()

    // derived exclusion sets first (the reference's detector DAG)
    val ftpPairs = Detectors.ftpTalkerPairs(summary)
    val ftpSrv = Detectors.ftpServers(summary)
    val p2p = Detectors.p2pTalkers(summary, myNets, ftpPairs, ftpSrv)
    val p2pHosts = p2p.select(col("my_ip")).distinct()

    val alerts = Seq(
      Detectors.topTalkers(summary),
      Detectors.smtpTalkers(summary, myNets, profiles.hist01, profiles.hist02),
      p2p,
      Detectors.mediaStreamingClients(summary, myNets, p2pHosts),
      Detectors.atypicalPorts(summary, profiles.hist01),
      Detectors.atypicalAlienPorts(summary, profiles.hist02),
      Detectors.atypicalPairs(summary, profiles.hist03),
      Detectors.atypicalData(summary, profiles.hist04),
      Detectors.alienAccess(summary, myNets),
      Detectors.udpAmplifier(summary),
      Detectors.abusedSmtp(summary),
      Detectors.dnsTunnel(summary),
      Detectors.icmpTunnel(summary),
      Detectors.hPortScan(summary, myNets),
      Detectors.vPortScan(summary, myNets),
      Detectors.ddos(summary),
      Detectors.botnetCC(summary, blacklist),
      Detectors.osDiscovery(summary, osRepos),
    ).reduce(_ union _)

    // learn pass: current-window histograms merged into the profiles
    // (decayed weighted mean, cold-start-safe) — S6's delete+put upsert
    // becomes one atomic state overwrite per family
    def currentHist(keyCol: String, bucketCol: org.apache.spark.sql.Column) =
      HistogramFunctions.buildHistogram(
        summary.groupBy(col(keyCol).as("name"), bucketCol.as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("name"))
    val updated = ProfileTables(
      hist01 = ProfileStore.update(profiles.hist01,
        currentHist("my_ip", col("my_port"))),
      hist02 = ProfileStore.update(profiles.hist02,
        currentHist("my_ip", col("alien_port"))),
      hist03 = ProfileStore.update(profiles.hist03,
        HistogramFunctions.buildHistogram(
          summary.groupBy("my_ip").agg(countDistinct("alien_ip").as("pairs"))
            .select(col("my_ip").as("name"),
              HistogramFunctions.logBin(col("pairs").cast("double")).cast("string").as("bucket"),
              lit(1L).as("cnt")),
          Seq("name"))),
      hist04 = ProfileStore.update(profiles.hist04,
        HistogramFunctions.buildHistogram(
          summary.groupBy("my_ip")
            .agg(sum(col("bytes_up") * col("sample_rate")).as("up"))
            .select(col("my_ip").as("name"),
              HistogramFunctions.logBin(col("up").cast("double")).cast("string").as("bucket"),
              lit(1L).as("cnt")),
          Seq("name"))))
    (alerts, updated)
  }
}
