package graft.tmp

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.plans.PlanFingerprint

/** Devtool: print the plan-fingerprint golden map for PlanGoldenSpec.
  * MUST use the same session config as SparkTestSession (local[4],
  * shuffle=4, UTC) — goldens are config-relative.
  * Usage: tools/run.sh graft.tmp.PrintPlanGoldens <query...>
  */
object PrintPlanGoldens {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = "/root/testdata/sf0.001"
    for (name <- args) {
      val fp = PlanFingerprint.of(SparkEntry.queries(name)(spark, sfDir))
      println(s"""GOLDEN    "$name" -> "$fp",""")
    }
    spark.stop()
  }
}
