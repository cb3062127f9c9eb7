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
  * MEASURED (r12): the degenerate vocab saturates the OVERLAP gate
  * (~86% trigram-space coverage) but NOT band space — 490k train docs
  * spread over 1.4M (band, sig) buckets with max bucket 6, so the fuzzy
  * candidate set stays small there. The regime finding 1 actually fears
  * (an O(train)-sized pair set) comes from TEMPLATE-heavy corpora:
  * `template:<nDocs>:<nTemplates>` synthesizes exact clone groups whose
  * shared signatures produce buckets of n/T docs and ~n·(bench share)
  * candidate pairs — millions of pairs flowing through the de-hinted
  * joins, under the same small heap that the pre-r12 broadcast(pairs)
  * hint would have detonated.
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
    val docs = (if (dir.startsWith("template:")) {
      val Array(_, nd, nt) = dir.split(":")
      val (nDocs, nTemplates) = (nd.toLong, nt.toInt)
      // doc i = exact copy of template (i % T): every clone group shares
      // one signature per band, so each (band, sig) bucket holds ~n/T
      // docs and the train×bench collision set is maximal
      val words = Seq("alpha", "bravo", "cedar", "delta", "ember", "frost",
        "grove", "haste", "ionic", "jolly", "karma", "lunar", "march",
        "noble", "ochre", "piano", "quill", "rural", "siren", "tulip")
      val wArr = array(words.map(lit): _*)
      spark.range(nDocs).select(
        col("id").as("doc_id"),
        array_join(transform(sequence(lit(1), lit(40)),
          i => element_at(wArr,
            pmod(xxhash64(pmod(col("id"), lit(nTemplates.toLong)), i),
              lit(words.size.toLong)).cast("int") + 1)), " ").as("text"))
    } else graft.sources.Catalog.documents(spark, dir))
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
