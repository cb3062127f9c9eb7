package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Models

/** Behavioral ML tests on constructed data (SURVEY §5.3: assert the
  * taint/selection logic on known structure, not exact centroids).
  */
class MlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("kmeansFlagger taints a small dirty cluster and not the big clean ones") {
    import spark.implicits._
    val rnd = new scala.util.Random(1)
    // two big clean blobs + one tiny dirty blob far away
    val big1 = Seq.fill(200)((rnd.nextGaussian() + 0.0, rnd.nextGaussian() + 0.0, 0.0))
    val big2 = Seq.fill(200)((rnd.nextGaussian() + 20.0, rnd.nextGaussian() + 20.0, 0.0))
    val tiny = Seq.fill(8)((rnd.nextGaussian() + 100.0, rnd.nextGaussian() - 60.0, 1.0))
    val df = (big1 ++ big2 ++ tiny).toDF("x", "y", "dirty")
    val out = Models.kmeansFlagger(df, Seq("x", "y"), "dirty", k = 3)
    val byTaint = out.groupBy("tainted").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byTaint(1) == 8, "exactly the tiny dirty blob is tainted")
    assert(byTaint(0) == 400)
  }

  test("histogramKMeans co-clusters identical profiles and gives them distance ~0") {
    import spark.implicits._
    val a = Map("p80" -> 0.9, "p443" -> 0.1)
    val b = Map("p22" -> 1.0)
    val c = Map("p80" -> 0.5, "p53" -> 0.5)
    val hist = Seq(
      ("h1", a), ("h2", a), ("h3", a),
      ("h4", b), ("h5", b),
      ("h6", c)).toDF("k", "buckets")
    val out = Models.histogramKMeans(hist, k = 3)
      .select("k", "prediction", "distance").collect()
    val cl = out.map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cl("h1") == cl("h2") && cl("h2") == cl("h3"))
    assert(cl("h4") == cl("h5") && cl("h4") != cl("h1") && cl("h6") != cl("h1"))
    out.filter(r => Set("h1", "h2", "h3").contains(r.getString(0)))
      .foreach(r => assert(r.getDouble(2) < 1e-9, "identical profiles sit on the centroid"))
  }

  test("randomForestLabeler learns a separable rule; unlabeled rows still scored") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 400).map { i =>
      val x = rnd.nextDouble() * 100
      val cat = if (i % 2 == 0) "HI" else "LO"
      val label = if (x > 50) 1.0 else 0.0
      (x, cat, if (i % 10 == 0) -1.0 else label) // 10% unlabeled (discard class)
    }.toDF("x", "cat", "label")
    val scored = Models.randomForestLabeler(rows, "label", Seq("cat"), Seq("x"),
      numTrees = 20, maxDepth = 5)
    assert(scored.count() == 400) // predictions for everyone, incl. unlabeled
    val acc = scored.filter(col("label") >= 0)
      .select(avg((col("prediction") === col("label")).cast("double"))).head().getDouble(0)
    assert(acc > 0.95, s"accuracy $acc")
    val conf = Models.predictionConfidence(scored)
      .select(min(col("confidence")), max(col("confidence"))).head()
    assert(conf.getDouble(0) >= 0.0 && conf.getDouble(1) <= 1.0)
  }

  test("FlowSchema declares the full reference surface; fromEvents fills it") {
    import graft.flows.FlowSchema
    val names = FlowSchema.schema.fieldNames.toSeq
    // the reference's declared column count: 70 flow + 77 contact +
    // 8 event (HogHBaseRDD.scala:46-221), plus the probe-side extras the
    // detectors read and the two per-packet arrays
    assert(names.size == 70 + 77 + 24 + 8 + 2, s"got ${names.size}")
    assert(names.distinct.size == names.size, "no duplicate columns")
    // spot fields from each family
    Seq("first_seen", "src2dst_inter_time_std", "C_idletime_max",
      "dns_reply_code", "http_response_status_code", "event_priority_id",
      "packet_sizes", "lower_port", "detected_protocol")
      .foreach(f => assert(names.contains(f), f))
    val events = graft.sources.Catalog.events(spark, "/root/testdata/sf0.001")
    val flows = FlowSchema.fromEvents(events)
    // literal-derived columns come out non-nullable; names+types must match
    assert(flows.schema.map(f => (f.name, f.dataType)) ==
      FlowSchema.schema.map(f => (f.name, f.dataType)))
    assert(flows.count() == events.count())
  }

  test("dnsKmeans: 17-feature surface, port-53 filter, planted anomaly tainted") {
    import spark.implicits._
    import graft.flows.{FlowFeatures, FlowSchema}
    val rnd = new scala.util.Random(7)
    // 300 normal DNS flows + 6 dirty exfil-shaped ones + 50 non-DNS
    def flow(port: Long, dur: Long, q: Long, prio: Long, id: Long) =
      (id, port, 40000L + id, 2L + id % 5, dur, q, prio,
        Seq.fill(5)(60L + rnd.nextInt(20)).map(_ + (if (q > 500) 900L else 0L)))
    val rows =
      (1 to 300).map(i => flow(53, 1000 + rnd.nextInt(500), rnd.nextInt(5), 3, i.toLong)) ++
      (1 to 6).map(i => flow(53, 90000 + rnd.nextInt(500), 800 + rnd.nextInt(50), 1, 300L + i)) ++
      (1 to 50).map(i => flow(4444, 1000, 0, 3, 400L + i))
    val base = rows.toDF("first_seen", "lower_port", "upper_port", "packets",
      "flow_duration", "dns_num_queries", "event_priority_id", "packet_sizes")
      .withColumn("lower_ip", concat(lit("10.0.0."), col("first_seen") % 250))
      .withColumn("upper_ip", lit("198.51.100.1"))
    val have = base.columns.toSet
    val flows = base.select(FlowSchema.schema.fieldNames.map(n =>
      if (have(n)) col(n).cast(FlowSchema.schema(n).dataType)
      else lit(null).cast(FlowSchema.schema(n).dataType).as(n)): _*)
    val out = FlowFeatures.dnsKmeans(flows, k = 5)
    assert(out.count() == 306, "non-DNS flows are filtered out")
    // every dirty exfil flow lands in a tainted cluster
    val taintedDirty = out.filter(col("dirty") === 1.0 && col("tainted") === 1).count()
    assert(taintedDirty == 6, s"dirty-and-tainted = $taintedDirty")
    // the bulk of normal traffic is not tainted
    assert(out.filter(col("dirty") === 0.0 && col("tainted") === 1).count() < 30)
  }

  test("httpKmeans runs the 19-feature surface over port-80 flows only") {
    import graft.flows.{FlowFeatures, FlowSchema}
    assert(FlowFeatures.dnsFeatureCols.size == 17)
    assert(FlowFeatures.httpFeatureCols.size == 19)
    val events = graft.sources.Catalog.events(spark, "/root/testdata/sf0.001")
    val flows = FlowSchema.fromEvents(events)
    val out = FlowFeatures.httpKmeans(flows, k = 8)
    val ports = out.select("prediction").distinct().count()
    assert(out.count() > 0 && ports <= 8)
    val onlyHttp = FlowFeatures.httpFlows(flows)
      .filter(col("lower_port") =!= 80 && col("upper_port") =!= 80).count()
    assert(onlyHttp == 0)
  }

  test("rfEstimator carries the reference's tuned knobs, clamped to the surface") {
    val rf = Models.rfEstimator("label", numFeatures = 200)
    assert(rf.getMaxBins == 500 && rf.getMaxDepth == 30 && rf.getNumTrees == 100)
    assert(rf.getFeatureSubsetStrategy == "90")
    assert(rf.getImpurity == "gini")
    // narrow surface: mtry clamps to the feature count
    assert(Models.rfEstimator("label", numFeatures = 3).getFeatureSubsetStrategy == "3")
    // the 80% decision threshold, reference encoding
    val t = Models.rfEstimator("label", 10, thresholds = Some(Array(0.2, 0.8)))
    assert(t.getThresholds.toSeq == Seq(0.2, 0.8))
  }

  test("a labeler fit with the parity knobs still learns and scores") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val rows = (1 to 300).map { i =>
      val x = rnd.nextDouble() * 100
      (x, if (x > 50) 1.0 else 0.0)
    }.toDF("x", "label")
    // defaults: maxDepth=30, maxBins=500, mtry clamp, thresholds [0.2,0.8]
    val scored = Models.randomForestLabeler(rows, "label", Nil, Seq("x"),
      numTrees = 10, thresholds = Some(Array(0.2, 0.8)))
    val acc = scored.select(avg((col("prediction") === col("label")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("seeded models are reproducible run-to-run") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(100)((rnd.nextGaussian(), rnd.nextGaussian(), 0.0)).toDF("x", "y", "dirty")
    def sizes() = Models.kmeansFlagger(df, Seq("x", "y"), "dirty", k = 4)
      .groupBy("prediction").count().orderBy("prediction")
      .collect().map(_.getLong(1)).toSeq
    assert(sizes() == sizes())
  }
}
