package graft.tmp

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.sources.Catalog

/** dev-only: contamination-stage variants at sf0.1 */
object ContamProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Catalog.documents(spark, "/root/testdata/sf0.1")
      .withColumn("is_bench", col("doc_id") % 50 === 0).localCheckpoint(true)
    val surv = docs.filter(!col("is_bench")).select(col("doc_id"), col("text"))
    val bench = docs.filter(col("is_bench")).select(col("doc_id"), col("text"))

    def variantA() = { // current: window-explode + distinct + join + agg
      val sh3 = explodedShingles(surv, "doc_id", "text", 3).distinct()
      val bs = explodedShingles(bench, "doc_id", "text", 3).select(col("shingle")).distinct()
      sh3.join(bs.withColumn("hit", lit(1)), Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_overlap"))
    }
    def variantB() = { // row-local HOF shingles, no pre-distinct shuffle
      val sh3 = surv.select(col("doc_id"),
        explode(array_distinct(shingles(tokens(col("text")), 3))).as("shingle"))
      val bs = bench.select(explode(array_distinct(shingles(tokens(col("text")), 3))).as("shingle")).distinct()
      sh3.join(broadcast(bs.withColumn("hit", lit(1))), Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sh"), count(col("hit")).as("n_overlap"))
    }
    def variantC() = { // window-explode, broadcast bench, count_distinct fuse
      val sh3 = explodedShingles(surv, "doc_id", "text", 3)
      val bs = explodedShingles(bench, "doc_id", "text", 3).select(col("shingle")).distinct()
      sh3.join(broadcast(bs.withColumn("hit", lit(1))), Seq("shingle"), "left")
        .groupBy(col("doc_id"))
        .agg(count_distinct(col("shingle")).as("n_sh"),
          count_distinct(when(col("hit") === 1, col("shingle"))).as("n_overlap"))
    }
    val variants = Seq("A_current" -> (() => variantA()),
      "B_rowlocal" -> (() => variantB()), "C_cntdistinct" -> (() => variantC()))
    variants.foreach { case (name, v) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        v().write.format("noop").mode("overwrite").save()
        if (i > 1) println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    // value parity check A vs B vs C
    val a = variantA().orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val b = variantB().orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val c = variantC().orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    println(s"A==B: ${a.sameElements(b)}  A==C: ${a.sameElements(c)}  n=${a.length}")
    spark.stop()
  }
}
