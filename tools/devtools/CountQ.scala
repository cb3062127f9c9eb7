package graft.tmp

/** Count the output rows of named SparkEntry queries at a fixture dir —
  * used to attribute output-bound query cost (e.g. d6's contracted pair
  * volume) in the round scale artifacts.
  *
  *   tools/run.sh graft.tmp.CountQ <sfDir> <query> [query ...]
  */
object CountQ {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.head
    args.tail.foreach { name =>
      println(s"$name rows: ${graft.SparkEntry.queries(name)(spark, dir).count()}")
    }
    spark.stop()
  }
}
