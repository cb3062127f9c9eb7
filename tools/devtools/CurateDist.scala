package graft.tmp

/** dev-only: print CurateApp report distribution for a fixture dir */
object CurateDist {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val work = java.nio.file.Files.createTempDirectory("curate_dist_").toString
    val rep = graft.CurateApp.run(spark, dir, work)
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    println(rep.map { case (k, v) => s"$k=$v" }.mkString(" "))
    spark.stop()
  }
}
