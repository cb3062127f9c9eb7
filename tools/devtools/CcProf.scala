package graft.tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame
import graft.operators.Dedup
import graft.sources.Catalog

/** dev-only: per-round wall-clock of the CC contraction loop at sf0.1 */
object CcProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Catalog.documents(spark, "/root/testdata/sf0.1")
    val pairs = Dedup.lshCandidatePairs(docs)
      .select(col("doc1"), col("doc2")).localCheckpoint(true)
    println(s"edges: ${pairs.count()}")

    def canon(e: DataFrame): DataFrame = e
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mn = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      canon(sym.filter(col("v") > col("u")).join(mn, "u")
        .select(col("v").as("u"), col("m").as("v")))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val mn = e.groupBy(col("u")).agg(min(col("v")).as("m"))
      val moved = e.join(mn, "u").select(col("v").as("u"), col("m").as("v"))
      canon(moved.union(mn.select(col("u"), col("m").as("v"))))
    }
    (1 to 2).foreach { run =>
      println(s"=== run $run ===")
      val t0 = System.nanoTime()
      var cur = canon(pairs.select(col("doc1").as("u"), col("doc2").as("v"))).localCheckpoint()
      def sig(e: DataFrame): (Long, Long) = {
        val r = e.agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      }
      var s = sig(cur)
      println(f"init: ${(System.nanoTime() - t0) / 1e9}%.2f s  n=${s._1}")
      var converged = false
      var i = 0
      while (!converged && i < 25) {
        val t1 = System.nanoTime()
        val next = smallStar(largeStar(cur)).localCheckpoint()
        val t2 = System.nanoTime()
        val s2 = sig(next)
        converged = s2 == s
        println(f"round $i: star+ckpt ${(t2 - t1) / 1e9}%.2f s  sig ${(System.nanoTime() - t2) / 1e9}%.2f s  n=${s2._1}")
        cur = next; s = s2; i += 1
      }
      println(f"total: ${(System.nanoTime() - t0) / 1e9}%.2f s rounds=$i")
    }
    spark.stop()
  }
}
