package graft.tmp

import org.apache.spark.sql.functions._

/** Saturated-contamination stress for Decontaminate.fuzzyScores (VERDICT
  * r11 finding 1 "done" criterion): on the DEGENERATE-vocab 100× fixture
  * (~93% of train docs carry bench candidates — the regime where the
  * pre-r12 broadcast(pairs)/broadcast(nT)/broadcast(nB) hints put an
  * O(train)-sized frame on the driver), the de-hinted + megabucket-
  * guarded form must COMPLETE under a deliberately small driver heap.
  *
  *   tools/run.sh graft.tmp.GenSf1Natural /tmp/sf10n_degen 100 documents degenerate
  *   SPARK_DRIVER_MEM=3g tools/run.sh graft.tmp.FuzzyStress /tmp/sf10n_degen
  *
  * Prints one JSON line: doc counts, candidate/flagged counts, wall time.
  */
object FuzzyStress {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10n_degen"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.sources.Catalog.documents(spark, dir)
      .select(col("doc_id"), col("text"))
    val train = docs.filter(col("doc_id") % 50 =!= 0)
    val bench = docs.filter(col("doc_id") % 50 === 0)
    val t0 = System.nanoTime()
    val scores = graft.operators.Decontaminate.fuzzyScores(train, bench)
      .localCheckpoint(true)
    val nCand = scores.count()
    val nFlag = scores.filter(col("max_jaccard") >= 0.5).count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nTrain = train.count(); val nBench = bench.count()
    println(s"""{"metric":"fuzzy_stress","train":$nTrain,"bench":$nBench,""" +
      s""""with_candidates":$nCand,"flagged":$nFlag,""" +
      s""""sec":${f"$secs%.1f"},"heap":"${Runtime.getRuntime.maxMemory / (1 << 20)}m"}""")
    spark.stop()
  }
}
