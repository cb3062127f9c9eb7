package graft.tmp

import org.apache.spark.sql.SparkSession

/** Devtool: plan fingerprints of the curation DAG per gate combination
  * (same session config as SparkTestSession — goldens are config-relative).
  */
object PrintCuratePlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    for ((q, c) <- Seq(("score", "overlap"), ("gopher", "overlap"),
        ("perplexity", "overlap"), ("score", "fuzzy"))) {
      val fp = graft.plans.PlanFingerprint.of(
        graft.CurateApp.tagged(spark, sfDir, qualityGate = q, contamGate = c))
      println(s"""GOLDEN    ("$q", "$c") -> "$fp",""")
    }
    spark.stop()
  }
}
