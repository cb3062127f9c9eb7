package graft.tmp

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** dev-only: per-stage shuffle/spill/time breakdown of one query.
  * Usage: tools/run.sh graft.tmp.StageProf <query> [sfDir]
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = scala.collection.mutable.ArrayBuffer.empty[String]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val line = f"stage ${i.stageId}%3d tasks=${i.numTasks}%4d " +
          f"time=${m.executorRunTime / 1e3}%8.1fs " +
          f"shR=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%9.1fMB " +
          f"shW=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%9.1fMB " +
          f"spill=${(m.memoryBytesSpilled + m.diskBytesSpilled) / 1048576.0}%9.1fMB " +
          s"| ${i.name.take(60)}"
        rows.synchronized { rows += line }
      }
    })
    val name = args.headOption.getOrElse("d11_substring_spans")
    val dir = if (args.length > 1) args(1) else "/tmp/sf5n"
    val fn = graft.SparkEntry.queries(name)
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    println(f"== $name on $dir: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    rows.synchronized(rows.foreach(println))
    spark.stop()
  }
}
