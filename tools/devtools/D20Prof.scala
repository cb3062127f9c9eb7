package graft.tmp

import org.apache.spark.sql.functions._

/** Stage attribution for d20_semdedup_scaled at the 100× fixture: is the
  * cost the kmeans|| INIT (driver-local k-means++ over ~2·k·steps
  * candidates — single-threaded), the distributed Lloyd iterations, the
  * assignment transform, or the within-cluster pair join?
  *
  *   tools/run.sh graft.tmp.D20Prof /tmp/sf10n
  */
object D20Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10n"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[d20prof] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = t("count")(corpus.count())
    val k = math.max(2L, (n + 127) / 128).toInt
    val cap = math.min(100000, math.max(16 * k, 10000))
    println(s"[d20prof] n=$n k=$k cap=$cap")
    val vecd = corpus.withColumn("features", array_to_vector(col("embedding")))
    val sample = vecd
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(cap)
      .repartition(4, col("vec_id")).sortWithinPartitions("vec_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sample materialize")(sample.count())
    val mPar = t("fit kmeans|| (init k-means||, 10 iter)") {
      new KMeans().setK(k).setSeed(42L).setMaxIter(10)
        .setFeaturesCol("features").setPredictionCol("cluster").fit(sample)
    }
    val mRnd = t("fit random-init (10 iter)") {
      new KMeans().setK(k).setSeed(42L).setMaxIter(10).setInitMode("random")
        .setFeaturesCol("features").setPredictionCol("cluster").fit(sample)
    }
    val asg = t("transform + checkpoint") {
      mPar.transform(vecd).select(col("vec_id"), col("cluster"))
        .localCheckpoint(true)
    }
    t("full d20 query") {
      graft.operators.SimilaritySearch
        .semanticDedupAdaptive(corpus, 0.35, targetCluster = 128)
        .write.mode("overwrite").format("noop").save()
    }
    println(s"[d20prof] costs par=${mPar.summary.trainingCost} rnd=${mRnd.summary.trainingCost} asg=${asg.count()}")
    spark.stop()
  }
}
