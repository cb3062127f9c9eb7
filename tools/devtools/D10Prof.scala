package graft.tmp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** dev-only: stage-by-stage profile of the d10 blocked edit-distance query */
object D10Prof {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/tmp/sf1n")
    val p = graft.sources.Catalog.part(spark, dir)
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s -> $r"); r
    }
    val maxDist = 2
    val blocked = p
      .withColumn("__block", concat_ws("|",
        split(col("p_name"), " ").getItem(0), col("p_size").cast("string")))
      .repartition(col("__block"))
      .withColumn("__bsz", count(lit(1)).over(Window.partitionBy(col("__block"))))
      .filter(col("__bsz").between(2, 10000))
      .select(col("__block"), col("p_partkey"), col("p_name"),
        length(col("p_name")).as("__len"))
    t("rows blocked")(blocked.count())
    val a = blocked.select(col("__block"), col("p_partkey").as("id1"),
      col("p_name").as("name1"), col("__len").as("len1"))
    val b = blocked.select(col("__block"), col("p_partkey").as("id2"),
      col("p_name").as("name2"), col("__len").as("len2"))
    val pairs = a.join(b, Seq("__block")).filter(col("id1") < col("id2"))
    t("pairs enumerated")(pairs.count())
    val lenOk = pairs.filter(abs(col("len1") - col("len2")) <= maxDist)
    t("pairs after len gap")(lenOk.count())
    val dist = lenOk.withColumn("dist",
      levenshtein(col("name1"), col("name2"), maxDist)).filter(col("dist") >= 0)
    t("pairs after dist")(dist.count())
    spark.stop()
  }
}
