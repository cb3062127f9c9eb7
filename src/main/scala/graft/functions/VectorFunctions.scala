package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns — no UDF, no
  * MLlib Vector conversion on the hot path. The dot product (which every
  * cosine/projection reduces to) is a custom codegen Catalyst expression
  * ([[graft.expressions.DotProduct]]): a higher-order-function
  * formulation evaluates its lambda interpreted per element, which at
  * all-pairs cardinalities is the whole query cost.
  *
  * Precision convention: every element is promoted to double BEFORE any
  * multiply and sums fold left-to-right, so results are bit-reproducible
  * and match an oracle that does the same.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with per-element double promotion, left-to-right (codegen'd
    * primitive loop; see [[graft.expressions.DotProduct]]).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe 0 when either norm is 0. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn > 0, d / nn).otherwise(lit(0.0))
  }

  /** Deterministic ±1 hyperplane signs for random-hyperplane (SimHash) LSH
    * over embeddings: sign(j,i) = +1 iff the low bit of the first hex digit
    * of md5("j-i") is 1. Pure public math — DuckDB reproduces it exactly,
    * and the planes are Scala-side constants (no per-row hashing).
    */
  def hyperplaneSigns(nPlanes: Int, dim: Int): Seq[Array[Double]] = {
    val mdt = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { j =>
      Array.tabulate(dim) { i =>
        val hex = mdt.digest(s"$j-$i".getBytes("UTF-8")).map("%02x".format(_)).mkString
        val v = Integer.parseInt(hex.substring(0, 1), 16)
        if ((v & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** LSH bucket id: one char per hyperplane, '1' iff the signed projection
    * is positive. With `b` planes this partitions the space into 2^b
    * buckets — the scale path for ANN (search only within a bucket).
    */
  def lshBucket(vec: Column, planes: Seq[Array[Double]]): Column =
    concat(planes.map { p =>
      when(dot(vec, typedLit(p.toSeq)) > 0, "1").otherwise("0")
    }: _*)
}
