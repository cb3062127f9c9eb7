package graft.tmp
/** dev-only: time selected queries in isolation (not part of the library) */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { arg =>
      // "dir=name" runs against an explicit fixture dir (else env/default)
      val (dirOpt, name) = arg.split("=", 2) match {
        case Array(d, n) => (Some(d), n); case _ => (None, arg)
      }
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 5).map { i =>
        try { spark.catalog.clearCache(); System.gc() } catch { case _: Throwable => }
        val t0 = System.nanoTime()
        fn(spark, dirOpt.getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = times.drop(1)
      println(f"$name: min ${warm.min}%.2f  median ${warm.sorted.apply(warm.size / 2)}%.2f  " +
        f"all ${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
