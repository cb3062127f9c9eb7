package graft.tmp

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.operators.Dedup
import graft.sources.Catalog

/** dev-only: per-stage wall-clock profile of the CurateApp DAG at sf0.1 */
object CurateProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val inDir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"=== round $round ===")
      val docs = Catalog.documents(spark, inDir)
      val toks = tokens(col("text"))
      val tagged0 = docs
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("is_bench", col("doc_id") % 50 === 0)
        .withColumn("low_quality", qualityScore(col("text"), toks) < 0.5)
        .persist()
      time("tagged0 materialize")(tagged0.count())
      val s12 = tagged0.filter(!col("is_bench") && !col("low_quality"))
      val fpCanon = s12
        .select(col("doc_id"), exactFingerprint(col("text")).as("fp"))
        .groupBy(col("fp")).agg(min(col("doc_id")).as("fp_canon"))
      val withFp = s12
        .withColumn("fp", exactFingerprint(col("text")))
        .join(fpCanon, Seq("fp"))
        .withColumn("exact_dup", col("doc_id") =!= col("fp_canon"))
        .persist()
      time("withFp materialize")(withFp.count())
      val s3 = withFp.filter(!col("exact_dup"))
        .select(col("doc_id"), col("text"), col("n_chars"))
      val pairs = time("lshCandidatePairs")(
        Dedup.lshCandidatePairs(s3).select(col("doc1"), col("doc2")).persist())
      time("pairs materialize")(pairs.count())
      val resolved = time("resolveDuplicates (CC)")(
        Dedup.resolveDuplicates(s3, pairs)
          .select(col("doc_id"), col("keep").as("near_canonical")).persist())
      time("resolved materialize")(resolved.count())
      val s4 = withFp.join(resolved, Seq("doc_id"), "left")
        .withColumn("near_dup", !coalesce(col("near_canonical"), lit(true)))
      val sh3 = explodedShingles(
        s4.filter(!col("near_dup")).select(col("doc_id"), col("text")),
        "doc_id", "text", 3).distinct()
      val benchShingles = explodedShingles(
        tagged0.filter(col("is_bench")).select(col("doc_id"), col("text")),
        "doc_id", "text", 3)
        .select(col("shingle")).distinct()
      val contaminated = sh3
        .join(benchShingles.withColumn("hit", lit(1)), Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_overlap"))
        .withColumn("contaminated", col("n_overlap") >= col("n_sh") * 0.5)
        .select(col("doc_id"), col("contaminated")).persist()
      time("contamination materialize")(contaminated.count())
      val frame = tagged0
        .join(withFp.select(col("doc_id"), col("exact_dup")), Seq("doc_id"), "left")
        .join(s4.select(col("doc_id"), col("near_dup")), Seq("doc_id"), "left")
        .join(contaminated, Seq("doc_id"), "left")
        .withColumn("stage",
          when(col("is_bench"), "benchmark")
            .when(col("low_quality"), "quality")
            .when(col("exact_dup"), "exact_dup")
            .when(col("near_dup"), "near_dup")
            .when(coalesce(col("contaminated"), lit(false)), "contaminated")
            .otherwise("kept"))
      time("report agg")(frame.groupBy(col("stage"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
        .collect())
      Seq(tagged0, withFp, pairs, resolved, contaminated).foreach(_.unpersist())
    }
    spark.stop()
  }
}
