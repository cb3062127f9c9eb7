package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns. AQE's skew-join splitting (enabled in
  * GraftSession) handles joins; these handle the aggregation shapes AQE
  * can't: a hot GROUP BY key whose state can't partial-aggregate.
  *
  * Algebraic aggregates (sum/count/min/max) don't need salting — Spark's
  * partial aggregation already combines map-side. The cases that DO melt
  * a single reducer are per-key DISTINCT and per-key collections, where
  * one hot key concentrates every distinct value in one task. Salting by
  * a hash OF THE VALUE (not a random number) splits each key's state
  * across `salts` tasks while keeping the split exact: a given value
  * always lands in the same salt bucket, so per-bucket distinct counts
  * add up with no cross-bucket double counting.
  */
object Skew {

  /** Exact per-key distinct count in two shuffles, each carrying at most
    * 1/salts of any key's state: groupBy(key, hash(value) % salts)
    * countDistinct, then sum the per-salt counts. Identical result to
    * countDistinct, but the hot key's distinct set never sits in one
    * aggregation buffer.
    */
  def saltedDistinct(df: DataFrame, keyCols: Seq[String], valueCol: String,
      salts: Int = 16, resultName: String = "n_distinct"): DataFrame = {
    val gs = keyCols.map(col)
    val salt = pmod(
      conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long"),
      lit(salts.toLong))
    df.select(gs :+ col(valueCol) :+ salt.as("__salt"): _*)
      .groupBy(gs :+ col("__salt"): _*)
      .agg(countDistinct(col(valueCol)).as("__d"))
      .groupBy(gs: _*)
      .agg(sum(col("__d")).as(resultName))
  }
}
