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

  private def noHosts = {
    import spark.implicits._
    Seq.empty[String].toDF("my_ip")
  }

  /** Local host 10.0.0.7 probing nPorts distinct well-known ports on one alien. */
  private def vScanProbe(nPorts: Int) = (1 to nPorts).map(i =>
    ("10.0.0.7", "99.9.9.9", "41000", (20 + i).toString, "6", 60L, 1L, "0x02", 50L + i))

  test("vPortScan alerts on deviation from the learned HIST08 port-count profile") {
    import spark.implicits._
    val sum_ = FlowSummary.summarize(samples(vScanProbe(5) ++ benign), myNets)
    // mature profile that has typically seen bursts of up to 7 ports → silent
    val tolerant = Seq(("10.0.0.7", 50L, Map("4" -> 0.6, "7" -> 0.4)))
      .toDF("name", "size", "buckets")
    assert(Detectors.vPortScan(sum_, myNets, tolerant, noHosts).count() == 0)
    // mature profile that never saw more than 4 ports → fires
    val strict = Seq(("10.0.0.7", 50L, Map("4" -> 1.0))).toDF("name", "size", "buckets")
    val rows = Detectors.vPortScan(sum_, myNets, strict, noHosts).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("my_ip") == "10.0.0.7")
    assert(rows.head.getAs[String]("alien_ip") == "99.9.9.9")
    assert(rows.head.getAs[Double]("metric") == 5.0)
    // cold-start profile (size < 10) → learn only, never alerts
    val cold = Seq(("10.0.0.7", 5L, Map("4" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.vPortScan(sum_, myNets, cold, noHosts).count() == 0)
  }

  test("hPortScan alerts beyond the learned HIST07 per-port max, not a fixed threshold") {
    import spark.implicits._
    val scan = (1 to 120).map(i =>
      ("10.0.0.7", "66.1." + (i / 250) + "." + (i % 250), "41000", "3389", "6", 60L, 1L, "0x02", 50L + i))
    val sum_ = FlowSummary.summarize(samples(scan ++ benign), myNets)
    val empty = HogzillaBatch.emptyProfiles(spark)
    // learned max 200 on this port → 120 pairs is within profile → silent
    val wide = Seq(("10.0.0.7", 500L, Map("3389" -> 200.0))).toDF("name", "size", "buckets")
    assert(Detectors.hPortScan(sum_, myNets, wide, empty, noHosts).count() == 0)
    // learned max 110 → 120 exceeds it → fires
    val tight = Seq(("10.0.0.7", 500L, Map("3389" -> 110.0))).toDF("name", "size", "buckets")
    val rows = Detectors.hPortScan(sum_, myNets, tight, empty, noHosts).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("my_ip") == "10.0.0.7")
    assert(rows.head.getAs[String]("note").contains("3389"))
    // cold-start (size < 100) → learn only
    val cold = Seq(("10.0.0.7", 50L, Map("3389" -> 110.0))).toDF("name", "size", "buckets")
    assert(Detectors.hPortScan(sum_, myNets, cold, empty, noHosts).count() == 0)
  }

  test("hPortScan suppresses port 25 for hosts whose HIST01 profile serves SMTP") {
    import spark.implicits._
    val scan = (1 to 120).map(i =>
      ("10.0.0.7", "66.1." + (i / 250) + "." + (i % 250), "41000", "25", "6", 60L, 1L, "0x02", 50L + i))
    val sum_ = FlowSummary.summarize(samples(scan), myNets)
    val tight = Seq(("10.0.0.7", 500L, Map("25" -> 10.0))).toDF("name", "size", "buckets")
    val notSmtp = HogzillaBatch.emptyProfiles(spark)
    assert(Detectors.hPortScan(sum_, myNets, tight, notSmtp, noHosts).count() == 1)
    val smtpServer = Seq(("10.0.0.7", 500L, Map("25" -> 0.9, "443" -> 0.1)))
      .toDF("name", "size", "buckets")
    assert(Detectors.hPortScan(sum_, myNets, tight, smtpServer, noHosts).count() == 0)
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
    // 5 distinct alien source ports hit the served port → passes the
    // served-port screen (>3 distinct alien ports, diversity > 0.2)
    val oddPort = (1 to 5).flatMap(i => Seq.fill(3)(
      ("55.5.5.5", "10.0.0.12", (40000 + i).toString, "31337", "6", 100L, 1L, "0x02", 80L + i)))
    val sum_ = FlowSummary.summarize(samples(oddPort), myNets)
    val cold = Seq(("10.0.0.12", 5L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.atypicalPorts(sum_, cold, noHosts).count() == 0) // size 5 < 100 → learn only
    val warm = Seq(("10.0.0.12", 500L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    val rows = Detectors.atypicalPorts(sum_, warm, noHosts).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("note").contains("31337"))
  }

  test("atypicalPorts served-port screen drops client-side ephemeral ports") {
    import spark.implicits._
    // one alien source port repeatedly hitting 31337 → diversity 1 ≤ 3 →
    // the port is not genuinely served, no alert even with a warm profile
    val clienty = (1 to 5).map(i =>
      ("55.5.5.5", "10.0.0.12", "40000", "31337", "6", 100L, 1L, "0x02", 80L + i))
    val sum_ = FlowSummary.summarize(samples(clienty), myNets)
    val warm = Seq(("10.0.0.12", 500L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.atypicalPorts(sum_, warm, noHosts).count() == 0)
  }

  test("proxyServers derivation feeds atypicalPorts' proxy-specific screen") {
    import spark.implicits._
    // 10.0.0.20 serves clients on 8080 AND fans out to many well-known
    // alien ports from it — proxy behavior (HogSFlow.scala:1480-1489)
    val proxyish = Seq("80", "443", "25", "22").zipWithIndex.map { case (p, i) =>
      ("10.0.0.20", "70.1.1." + (i + 1), "8080", p, "6", 100L, 1L, "0x02", 90L + i)
    } ++ (1 to 3).map(i => // inbound clients hitting the listening port
      ("70.3.3." + i, "10.0.0.20", (51000 + i).toString, "8080", "6", 100L, 1L, "0x02", 93L + i))
    val sum_ = FlowSummary.summarize(samples(proxyish), myNets)
    val proxies = Detectors.proxyServers(sum_)
    assert(proxies.collect().map(_.getString(0)).toSeq == Seq("10.0.0.20"))
    // with the host whitelisted as a proxy, its served (direction<0) ports
    // still reach the profile comparison instead of being screened out
    val warm = Seq(("10.0.0.20", 500L, Map("80" -> 1.0))).toDF("name", "size", "buckets")
    val inbound = (1 to 4).flatMap(i => Seq.fill(3)(
      ("70.2.2." + i, "10.0.0.20", (50000 + i).toString, "9999", "6", 100L, 1L, "0x02", 95L + i)))
    val sum2 = FlowSummary.summarize(samples(inbound), myNets)
    assert(Detectors.atypicalPorts(sum2, warm, proxies).collect()
      .exists(_.getAs[String]("note").contains("9999")))
  }

  test("bigProviders whitelist suppresses atypicalData for traffic to that network") {
    import spark.implicits._
    // pass 1: alien /24 66.10.20.x seen by >4 local hosts with a >1 GiB flow
    val bulk = (1 to 6).map(i =>
      ("10.0.0." + i, "66.10.20." + i, "45000", "443", "6", 20000000L, 100L, "0x18", 100L + i))
    val sum_ = FlowSummary.summarize(samples(bulk), myNets)
    val prov = Detectors.bigProviders(sum_, myNets)
    assert(prov.collect().map(_.getString(0)).toSeq == Seq("66.10.20"))
    // pass 2: a host uploading 2 GB effective to the whitelisted network
    // stays silent; the same volume to an unknown network alerts
    val warm = Seq(("10.0.0.30", 500L, Map("5" -> 1.0))).toDF("name", "size", "buckets")
    def upload(dst: String) = Seq.fill(3)(
      ("10.0.0.30", dst, "45000", "443", "6", 20000000L, 100L, "0x02", 200L))
    val toProvider = FlowSummary.summarize(samples(upload("66.10.20.9")), myNets)
    assert(Detectors.atypicalData(toProvider, myNets, warm, prov, minBytes = 1000000L).count() == 0)
    val toUnknown = FlowSummary.summarize(samples(upload("88.9.9.9")), myNets)
    assert(Detectors.atypicalData(toUnknown, myNets, warm, prov, minBytes = 1000000L).count() == 1)
  }

  test("atypicalAlienPorts: snapshot leave-one-out + alien-side confirm (J6)") {
    import spark.implicits._
    // current window: 10.0.0.40 contacts external 77.1.2.3 on port 4444
    val flows = Seq.fill(3)(
      ("10.0.0.40", "77.1.2.3", "42000", "4444", "6", 500L, 1L, "0x02", 300L))
    val sum_ = FlowSummary.summarize(samples(flows), myNets)
    val hist02 = Seq(("10.0.0.40", 500L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    val snapYes = Seq(("10.0.0.40", 10L, Map("4444" -> 0.5, "443" -> 0.5)))
      .toDF("name", "size", "buckets")
    val snapNo = Seq(("10.0.0.40", 10L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    val empty = HogzillaBatch.emptyProfiles(spark)
    // alien /24 77.1.2 has a mature HIST05 that never served 4444 → confirm
    val h05 = Seq(("77.1.2", 100L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    val fires = Detectors.atypicalAlienPorts(sum_, myNets, hist02, snapYes, empty, h05)
    assert(fires.collect().map(_.getAs[String]("note")).exists(_.contains("4444")))
    // gate 2: port absent from the last-window snapshot → noise, silent
    assert(Detectors.atypicalAlienPorts(sum_, myNets, hist02, snapNo, empty, h05).count() == 0)
    // gate 3: the alien network typically serves 4444 → not atypical, silent
    val h05Serves = Seq(("77.1.2", 100L, Map("4444" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.atypicalAlienPorts(sum_, myNets, hist02, snapYes, empty, h05Serves).count() == 0)
    // gate 3: immature alien profile (size < 21) cannot confirm → silent
    val h05Cold = Seq(("77.1.2", 5L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.atypicalAlienPorts(sum_, myNets, hist02, snapYes, empty, h05Cold).count() == 0)
  }

  test("alienNetworkAtypicalPorts alerts on a new port for a profiled alien /24") {
    import spark.implicits._
    // >4 distinct local hosts touch 66.30.1.x on port 4444 this window
    val touch = (1 to 6).map(i =>
      ("10.0.0." + i, "66.30.1." + i, "43000", "4444", "6", 200L, 1L, "0x02", 400L + i))
    val sum_ = FlowSummary.summarize(samples(touch), myNets)
    val mature = Seq(("66.30.1", 2000L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    val rows = Detectors.alienNetworkAtypicalPorts(sum_, myNets, mature).collect()
    assert(rows.length == 1 && rows.head.getAs[String]("alien_ip") == "66.30.1")
    assert(rows.head.getAs[String]("note").contains("4444"))
    // immature network profile → learn only
    val cold = Seq(("66.30.1", 50L, Map("443" -> 1.0))).toDF("name", "size", "buckets")
    assert(Detectors.alienNetworkAtypicalPorts(sum_, myNets, cold).count() == 0)
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

  test("vPortScan boundary: a port count at the profile's typical max stays silent, one past it fires") {
    import spark.implicits._
    val profile = Seq(("10.0.0.7", 50L, Map("5" -> 1.0))).toDF("name", "size", "buckets")
    val atMax = FlowSummary.summarize(samples(vScanProbe(5) ++ benign), myNets)
    assert(Detectors.vPortScan(atMax, myNets, profile, noHosts).count() == 0)
    val pastMax = FlowSummary.summarize(samples(vScanProbe(6) ++ benign), myNets)
    assert(Detectors.vPortScan(pastMax, myNets, profile, noHosts).collect()
      .map(_.getAs[String]("my_ip")).toSeq == Seq("10.0.0.7"))
  }

  test("HogzillaBatch.run: full DAG produces the planted alerts and learns all 9 profile families") {
    import spark.implicits._
    // snapshot the shared session's persisted blocks: the leak assertion
    // below must only see blocks THIS test's runs add (other suites'
    // query-level caches are swept by the session-level hygiene in
    // Bench/app exits, not per-operator release thunks)
    val preexisting = spark.sparkContext.getPersistentRDDs.keySet
    val spam = (1 to 30).flatMap(i => Seq.fill(4)(
      ("10.0.0.5", "66.1.1." + i, "4000", "25", "6", 200000L, 10L, "0x18", 100L + i)))
    val scan = vScanProbe(5)
    val all = samples(spam ++ scan ++ benign)
    val profiles = HogzillaBatch.emptyProfileTables(spark)
    val (alerts, updated, reputation, release) = HogzillaBatch.run(spark, all, myNets, profiles,
      blacklist = Seq("66.66.").toDF("prefix"),
      osRepos = Seq(("93.1.1.1", "debian")).toDF("repo_ip", "os"))
    val byDetector = alerts.groupBy("detector").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDetector.contains("smtpTalkers"))
    assert(byDetector.contains("topTalkers"))
    assert(byDetector.contains("osDiscovery"))
    // alert payload: the spammer's alert carries its rendered top-K flow
    // list — lines look like "10.0.0.5:4000 => 66.1.1.x:25 (...)"
    val spamAlert = alerts.filter(col("detector") === "smtpTalkers" &&
      col("my_ip") === "10.0.0.5").select("flows").head().getString(0)
    assert(spamAlert.contains("10.0.0.5:4000") && spamAlert.contains(":25"))
    assert(spamAlert.contains("pkts") && spamAlert.contains("sampling: 1/"))
    assert(spamAlert.split("\n").length <= Detectors.FlowListLimit)
    assert(!byDetector.contains("botnetCC")) // nothing blacklisted in this batch
    // profile-relative scan detectors stay silent on run 1 (cold start)…
    assert(!byDetector.contains("vPortScan"))
    // …but the learn pass populates their profiles for the next run
    assert(updated.hist01.filter(col("name") === "10.0.0.5" && col("size") > 0).count() == 1)
    assert(updated.hist08.filter(col("name") === "10.0.0.7").count() == 1)
    assert(updated.hist02snap.filter(col("name") === "10.0.0.5").count() == 1)
    assert(reputation.proxies.count() == 0)
    // run 2 over the same traffic: the HIST08 profile now exists (still
    // below the maturity gate, and the 5-port burst is typical) → silent
    val (alerts2, _, _, release2) = HogzillaBatch.run(spark, all, myNets, updated,
      blacklist = Seq("66.66.").toDF("prefix"),
      osRepos = Seq(("93.1.1.1", "debian")).toDF("repo_ip", "os"))
    assert(alerts2.filter(col("detector") === "vPortScan").count() == 0)
    release(); release2()
    // the release thunks drop the shared summary caches: nothing persisted
    // by THESE runs survives
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- preexisting
    assert(leaked.isEmpty, s"HogzillaBatch.run leaked cached blocks: $leaked")
  }
}
