package graft.tmp
/** dev-only: time selected queries in isolation (not part of the library) */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save()
        println(s"$name run$i: " + ((System.nanoTime()-t0)/1e9))
      }
    }
    spark.stop()
  }
}
