package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column.
  *
  * Two paths:
  *  - brute force: broadcast the (small) query set against the corpus —
  *    exact, O(|Q|·n), the correctness baseline; at 100 TB the corpus
  *    scan is embarrassingly parallel and the top-K is a per-partition
  *    heap then a tiny final merge (Spark's window + limit does this);
  *  - LSH-bucketed: random-hyperplane signatures (deterministic planes,
  *    [[graft.functions.VectorFunctions.hyperplaneSigns]]) pre-partition
  *    the corpus; each query probes only its own bucket, so the join key
  *    is the bucket id and the shuffle is O(n), never O(n²).
  *
  * Similarities are rounded to 6 dp BEFORE ranking so ordering is stable
  * across engines (ulp-level summation differences can't flip ranks).
  */
object SimilaritySearch {

  /** Exact top-k cosine neighbors for each query vector.
    * `corpus` and `queries` both need (vec_id, embedding).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val scored = corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("embedding"), col("qvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** LSH-bucketed ANN: candidates share the query's hyperplane-sign
    * bucket; exact cosine re-ranks within the bucket. Recall < 1 by
    * design (that's the scale trade-off); nPlanes controls bucket count.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int, dim: Int): DataFrame = {
    val planes = hyperplaneSigns(nPlanes, dim)
    val bucketed = corpus.withColumn("bucket", lshBucket(col("embedding"), planes))
    val q = queries
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      .withColumn("bucket", lshBucket(col("qvec"), planes))
    val scored = bucketed.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", round(cosine(col("embedding"), col("qvec")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank").cast("long").as("rank"), col("vec_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs above `minSim`, bucketed by the
    * LSH signature so the pairwise comparison never crosses buckets (the
    * 100 TB-safe variant of "all pairs with cosine ≥ τ"). Set nPlanes=0
    * for the exact brute-force variant (single bucket).
    */
  def nearDupPairs(corpus: DataFrame, minSim: Double, nPlanes: Int, dim: Int): DataFrame = {
    val withBucket =
      if (nPlanes == 0) corpus.withColumn("bucket", lit("all"))
      else corpus.withColumn("bucket", lshBucket(col("embedding"), hyperplaneSigns(nPlanes, dim)))
    val a = withBucket.select(col("bucket"), col("vec_id").as("id1"), col("embedding").as("v1"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("id2"), col("embedding").as("v2"))
    a.join(b, Seq("bucket")).filter(col("id1") < col("id2"))
      .withColumn("sim", round(cosine(col("v1"), col("v2")), 6))
      .filter(col("sim") >= minSim)
      .select(col("id1"), col("id2"), col("sim"))
  }
}
