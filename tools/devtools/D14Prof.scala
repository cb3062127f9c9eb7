package graft.tmp

import org.apache.spark.sql.functions._

/** Bucket-skew probe for d14 at a fixture: per-table LSH bucket size
  * distribution at the adaptive plane count, plus the implied pair-eval
  * total Σ sz·(sz−1)/2, then a timed nearDupPairsAdaptive run.
  *
  *   tools/run.sh graft.tmp.D14Prof /tmp/sf10n
  */
object D14Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/sf10n"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorFunctions.{hyperplaneSigns, lshBucket}
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = corpus.count()
    val nTables = 3
    val p = graft.operators.SimilaritySearch.adaptivePlaneCount(n, 128)
    println(s"[d14prof] n=$n p=$p")
    val planes = hyperplaneSigns(p * nTables, 64)
    val tables = array((0 until nTables).map(lit): _*)
    val buckets = corpus
      .withColumn("sig", lshBucket(col("embedding"), planes))
      .withColumn("t", explode(tables))
      .withColumn("bucket", concat(col("t").cast("string"), lit(":"),
        col("sig").substr(col("t") * p + 1, lit(p))))
      .groupBy(col("bucket")).agg(count(lit(1)).as("sz"))
    val stats = buckets.agg(
      count(lit(1)).as("n_buckets"), max(col("sz")).as("max_sz"),
      expr("approx_percentile(sz, array(0.5, 0.9, 0.99))").as("pcts"),
      sum(col("sz") * (col("sz") - 1) / 2).as("pair_evals")).collect()(0)
    println(s"[d14prof] buckets=${stats.get(0)} max=${stats.get(1)} " +
      s"pcts=${stats.get(2)} pair_evals=${stats.get(3)}")
    val t0 = System.nanoTime()
    val cnt = graft.operators.SimilaritySearch
      .nearDupPairsAdaptive(corpus, 0.35, dim = 64, targetBucket = 128)
      .count()
    println(f"[d14prof] out_pairs=$cnt wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
