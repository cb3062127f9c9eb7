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
