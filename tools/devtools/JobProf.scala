package graft.tmp

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import scala.collection.concurrent.TrieMap

/** dev-only: per-Spark-job wall-clock breakdown of one query */
object JobProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = TrieMap.empty[Int, (Long, String)]
    val jobs = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") take 90)
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs.synchronized { jobs += ((j.jobId, (System.nanoTime() - t0) / 1e9, d)) }
        }
    })
    val name = args.headOption.getOrElse("c5_curate_report")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val fn = graft.SparkEntry.queries(name)
    // warm run first
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache(); System.gc()
    jobs.synchronized(jobs.clear())
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s, ${jobs.size} jobs")
    jobs.sortBy(-_._2).take(20).foreach { case (id, dt, d) =>
      println(f"  job $id%3d  $dt%6.2f s  $d")
    }
    spark.stop()
  }
}
