package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Models
import graft.operators.Retention

/** T4 retention purge on a date-partitioned table + the dormant SVM path. */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("purgeOlderThan drops old partitions wholesale but keeps exempted rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_retention").toString
    val rows = Seq(
      ("2026-01-01 10:00:00", 1L, 0), ("2026-01-02 10:00:00", 2L, 1), // old; id=2 exempt
      ("2026-01-10 10:00:00", 3L, 0), ("2026-01-11 10:00:00", 4L, 0)) // recent
      .toDF("ts_s", "id", "priority")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    Retention.writePartitioned(rows, "ts", dir)
    assert(spark.read.parquet(dir).count() == 4)
    Retention.purgeOlderThan(spark, dir, "2026-01-05",
      keepPredicate = Some(col("priority") === 1))
    val left = spark.read.parquet(dir).select("id").collect().map(_.getLong(0)).sorted
    assert(left.toSeq == Seq(2L, 3L, 4L)) // id=1 purged; exempt + recent stay
    // partition directory for the fully-dead day is gone (metadata delete)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(!dirs.contains("ds=2026-01-01") && dirs.contains("ds=2026-01-02"))
  }

  test("linearSvc learns a separable boundary (M6 dormant path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 300).map { _ =>
      val x = rnd.nextDouble() * 10
      (x, x + rnd.nextGaussian() * 0.1, if (x > 5) 1.0 else 0.0)
    }.toDF("x", "y", "label")
    val scored = Models.linearSvc(df, "label", Seq("x", "y"))
    val acc = scored.select(avg((col("prediction") === col("label")).cast("double")))
      .head().getDouble(0)
    assert(acc > 0.95, s"accuracy $acc")
  }
}
