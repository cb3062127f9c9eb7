package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.detectors.{Detectors, FlowSummary, HogzillaBatch}

/** Detector behavior on constructed sFlow scenarios with known ground
  * truth: each planted attack pattern must fire exactly its detector, and
  * benign background traffic must stay silent.
  */
class DetectorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val myNets = Seq("10.0.")

  /** (src, dst, sport, dport, proto, pktSize, rate, flags, ts) */
  private def samples(rows: Seq[(String, String, String, String, String, Long, Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("srcIP", "dstIP", "srcPort", "dstPort", "IPprotocol",
      "packetSize", "samplingRate", "tcpFlags", "timestamp")
  }

  private def benign = (1 to 5).map(i =>
    ("10.0.0.100", "93.1.1." + i, "50000", "443", "6", 1000L, 10L, "0x18", 1000L + i))

  test("direction: local SYN → +1, alien SYN → -1, orientation canonicalized") {
    val s = samples(Seq(
      ("10.0.0.1", "8.8.8.8", "5555", "80", "6", 100L, 1L, "0x02", 10L), // local initiates
      ("9.9.9.9", "10.0.0.2", "6666", "22", "6", 100L, 1L, "0x02", 20L))) // alien initiates
    val sum_ = FlowSummary.summarize(s, myNets).collect()
      .map(r => r.getAs[String]("my_ip") -> r.getAs[Long]("direction")).toMap
    assert(sum_("10.0.0.1") == 1L)
    assert(sum_("10.0.0.2") == -1L)
  }

  test("smtpTalkers fires on a bulk external sender, not on benign traffic") {
    val spam = (1 to 30).flatMap(i => Seq.fill(4)(
      ("10.0.0.5", "66.1.1." + i, "4000", "25", "6", 200000L, 10L, "0x18", 100L + i)))
    val sum_ = FlowSummary.summarize(samples(spam ++ benign), myNets)
    val empty = HogzillaBatch.emptyProfiles(spark)
    val out = Detectors.smtpTalkers(sum_, myNets, empty, empty).collect()
    assert(out.map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.5"))
    // 30 flows × 200000B × rate 10 = 60MB effective > 20MB threshold
    assert(out.head.getAs[Double]("metric") > 20971520.0)
  }

  test("smtpTalkers stays silent for a host whose profile says SMTP is typical") {
    import spark.implicits._
    val spam = (1 to 30).flatMap(i => Seq.fill(4)(
      ("10.0.0.5", "66.1.1." + i, "4000", "25", "6", 200000L, 10L, "0x18", 100L + i)))
    val sum_ = FlowSummary.summarize(samples(spam), myNets)
    val knownSender = Seq(("10.0.0.5", 1000L, Map("25" -> 0.9, "443" -> 0.1)))
      .toDF("name", "size", "buckets")
    val out = Detectors.smtpTalkers(sum_, myNets, HogzillaBatch.emptyProfiles(spark), knownSender)
    assert(out.count() == 0)
  }

  test("vPortScan catches an alien probing many low ports") {
    val scan = Seq("21", "22", "23", "25", "110").zipWithIndex.map { case (p, i) =>
      ("99.9.9.9", "10.0.0.7", "40000", p, "6", 60L, 1L, "0x02", 50L + i)
    }
    val out = Detectors.vPortScan(FlowSummary.summarize(samples(scan ++ benign), myNets), myNets)
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("my_ip") == "10.0.0.7")
    assert(rows.head.getAs[String]("alien_ip") == "99.9.9.9")
    assert(rows.head.getAs[Double]("metric") == 5.0)
  }

  test("hPortScan catches one alien probing the same port across hosts") {
    val scan = (1 to 120).map(i =>
      ("99.9.9.9", "10.0.1." + i, "40000", "3389", "6", 60L, 1L, "0x02", 50L + i))
    val out = Detectors.hPortScan(FlowSummary.summarize(samples(scan ++ benign), myNets), myNets)
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("alien_ip") == "99.9.9.9")
  }

  test("udpAmplifier fires on a huge-packet-count NTP flow") {
    val amp = Seq.fill(2100)(("10.0.0.8", "77.7.7.7", "123", "33333", "17", 400L, 1L, "0x00", 60L))
    val out = Detectors.udpAmplifier(FlowSummary.summarize(samples(amp ++ benign), myNets))
    assert(out.collect().map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.8"))
  }

  test("botnetCC fires only for blacklisted prefixes via longest-prefix match") {
    import spark.implicits._
    val cc = Seq.fill(25)(("10.0.0.9", "66.66.1.2", "5000", "8080", "6", 100L, 1L, "0x18", 70L))
    val clean = Seq.fill(25)(("10.0.0.10", "88.88.1.2", "5000", "8080", "6", 100L, 1L, "0x18", 70L))
    val blacklist = Seq("66.66.", "66.66.1.").toDF("prefix")
    val out = Detectors.botnetCC(FlowSummary.summarize(samples(cc ++ clean), myNets), blacklist)
    assert(out.collect().map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.9"))
  }

  test("ddos fires on a fast many-pair burst and respects the trimmed mean") {
    val burst = (1 to 60).map(i =>
      ("44.4.4." + i, "10.0.0.11", "50000", "80", "6", 60L, 1L, "0x02", 1000L + i))
    val out = Detectors.ddos(FlowSummary.summarize(samples(burst ++ benign), myNets))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getAs[String]("my_ip") == "10.0.0.11")
    assert(rows.head.getAs[Double]("metric") <= 1.0) // 1s gaps
  }

  test("atypicalPorts: cold-start profiles learn silently, warm profiles alert on new ports") {
    import spark.implicits._
    val oddPort = Seq.fill(3)(("55.5.5.5", "10.0.0.12", "40000", "31337", "6", 100L, 1L, "0x02", 80L))
    val sum_ = FlowSummary.summarize(samples(oddPort), myNets)
    val cold = Seq(("10.0.0.12", 5L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.atypicalPorts(sum_, cold).count() == 0) // size 5 < 100 → learn only
    val warm = Seq(("10.0.0.12", 500L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    val rows = Detectors.atypicalPorts(sum_, warm).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("note").contains("31337"))
  }

  test("p2pTalkers method 1 fires on many pairs over many local ports; ftp traffic exempt") {
    val p2p = (1 to 8).map(i =>
      ("10.0.0.7", "66.2.1." + i, (4000 + i).toString, "6881", "6", 1000L, 1L, "0x02", 100L + i))
    val sum_ = FlowSummary.summarize(samples(p2p ++ benign), myNets)
    val out = Detectors.p2pTalkers(sum_, myNets,
      Detectors.ftpTalkerPairs(sum_), Detectors.ftpServers(sum_)).collect()
    assert(out.map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.7"))
    assert(out.head.getAs[String]("note") == "p2p method1")
  }

  test("mediaStreamingClients fires on a long download-heavy flow, skips p2p hosts") {
    val stream = Seq(1000L, 2400L).map(ts =>
      ("93.9.9.9", "10.0.0.8", "443", "50000", "6", 600000L, 10L, "0x18", ts))
    val sum_ = FlowSummary.summarize(samples(stream ++ benign), myNets)
    val noP2p = sum_.select(col("my_ip")).limit(0)
    val out = Detectors.mediaStreamingClients(sum_, myNets, noP2p).collect()
    assert(out.map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.8"))
    // the same host listed as a P2P talker must be excluded (DAG J4)
    import spark.implicits._
    val p2pHosts = Seq("10.0.0.8").toDF("my_ip")
    assert(Detectors.mediaStreamingClients(sum_, myNets, p2pHosts).count() == 0)
  }

  test("dnsTunnel fires on port-53 volume far past name resolution") {
    val tunnel = Seq(
      ("10.0.0.9", "8.8.4.4", "50000", "53", "17", 300000L, 100L, "0x00", 500L))
    val sum_ = FlowSummary.summarize(samples(tunnel ++ benign), myNets)
    val out = Detectors.dnsTunnel(sum_).collect()
    assert(out.map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.9"))
    assert(Detectors.dnsTunnel(FlowSummary.summarize(samples(benign), myNets)).count() == 0)
  }

  test("alienAccess fires when one alien touches many local hosts") {
    val sweep = (1 to 25).map(i =>
      ("77.7.7.7", "10.0.0." + i, "55555", "445", "6", 100L, 1L, "0x02", 100L + i))
    val sum_ = FlowSummary.summarize(samples(sweep ++ benign), myNets)
    val out = Detectors.alienAccess(sum_, myNets).collect()
    assert(out.map(_.getAs[String]("alien_ip")).toSeq == Seq("77.7.7.7"))
  }

  test("icmpTunnel fires on big-payload high-volume ICMP, not on ordinary pings") {
    val tunnel = Seq(
      ("10.0.0.11", "44.4.4.4", "0", "0", "1", 50000L, 3000L, "0x00", 700L))
    val ping = Seq(
      ("10.0.0.12", "44.4.4.5", "0", "0", "1", 64L, 10L, "0x00", 701L))
    val sum_ = FlowSummary.summarize(samples(tunnel ++ ping ++ benign), myNets)
    val out = Detectors.icmpTunnel(sum_).collect()
    assert(out.map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.11"))
  }

  test("osDiscovery maps repo contacts to a sorted OS set per host") {
    import spark.implicits._
    val repos = Seq(("81.1.1.1", "debian"), ("81.1.1.2", "freebsd")).toDF("repo_ip", "os")
    val traffic = Seq(
      ("10.0.0.13", "81.1.1.1", "44000", "80", "6", 500L, 1L, "0x18", 800L),
      ("10.0.0.13", "81.1.1.2", "44001", "80", "6", 500L, 1L, "0x18", 801L))
    val sum_ = FlowSummary.summarize(samples(traffic ++ benign), myNets)
    val out = Detectors.osDiscovery(sum_, repos).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("note") == "os: debian,freebsd")
  }

  test("vPortScan threshold boundary: exactly minPorts distinct ports fires, one fewer stays silent") {
    def probe(nPorts: Int) = (1 to nPorts).map(i =>
      ("55.5.5.5", "10.0.0.14", "7000", (20 + i).toString, "6", 60L, 1L, "0x02", 900L + i))
    val silent = FlowSummary.summarize(samples(probe(2) ++ benign), myNets)
    assert(Detectors.vPortScan(silent, myNets).count() == 0)
    val fires = FlowSummary.summarize(samples(probe(3) ++ benign), myNets)
    assert(Detectors.vPortScan(fires, myNets).collect()
      .map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.14"))
  }

  test("HogzillaBatch.run: full DAG produces the planted alerts and learns profiles") {
    import spark.implicits._
    val spam = (1 to 30).flatMap(i => Seq.fill(4)(
      ("10.0.0.5", "66.1.1." + i, "4000", "25", "6", 200000L, 10L, "0x18", 100L + i)))
    val scan = Seq("21", "22", "23", "25", "110").zipWithIndex.map { case (p, i) =>
      ("99.9.9.9", "10.0.0.7", "40000", p, "6", 60L, 1L, "0x02", 50L + i)
    }
    val all = samples(spam ++ scan ++ benign)
    val profiles = HogzillaBatch.ProfileTables(
      HogzillaBatch.emptyProfiles(spark), HogzillaBatch.emptyProfiles(spark),
      HogzillaBatch.emptyProfiles(spark), HogzillaBatch.emptyProfiles(spark))
    val (alerts, updated) = HogzillaBatch.run(spark, all, myNets, profiles,
      blacklist = Seq("66.66.").toDF("prefix"),
      osRepos = Seq(("93.1.1.1", "debian")).toDF("repo_ip", "os"))
    val byDetector = alerts.groupBy("detector").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDetector.contains("smtpTalkers"))
    assert(byDetector.contains("vPortScan"))
    assert(byDetector.contains("topTalkers"))
    assert(byDetector.contains("osDiscovery"))
    assert(!byDetector.contains("botnetCC")) // nothing blacklisted in this batch
    // learn pass: every host now has a HIST01 profile with size > 0
    assert(updated.hist01.filter(col("name") === "10.0.0.5" && col("size") > 0).count() == 1)
  }
}
