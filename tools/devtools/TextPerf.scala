package graft.tmp

import org.apache.spark.sql.functions._

/** dev-only: time tokenization/lang-id expression variants at sf0.1 */
object TextPerf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val variants: Seq[(String, org.apache.spark.sql.Column)] = Seq(
      "hof_filter_split" -> size(filter(split(col("text"), " "), t => t =!= "")),
      "trim_regex_split" -> {
        val tr = trim(col("text"))
        size(when(tr === "", array().cast("array<string>")).otherwise(split(tr, " +")))
      },
      "regexp_extract_all" -> size(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))),
      "langid_current" -> length(graft.functions.TextFunctions.predictLang(
        graft.functions.TextFunctions.tokens(col("text")))),
    )
    variants.foreach { case (name, c) =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        docs.select(c.as("x")).write.format("noop").mode("overwrite").save()
        if (i > 1) println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
