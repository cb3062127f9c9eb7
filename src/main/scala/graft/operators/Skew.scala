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

  /** Exact salted inner equi-join for a skewed probe side: the probe rows
    * scatter across `salts` sub-partitions per key (salt = deterministic
    * hash of the probe row's OTHER columns, so re-runs are stable), and the
    * build side replicates once per salt. Each probe row meets exactly one
    * replica of each matching build row, so the result multiset is
    * identical to `large.join(small, keys)`.
    *
    * When to prefer this over AQE's skew-join split: AQE splits a skewed
    * SHUFFLE partition, but all replicas of one hot key still hash-join
    * against the same build rows read by a handful of tasks, and AQE only
    * triggers on sort-merge joins it can see at runtime. Salting commits to
    * key-splitting up front — e.g. under a `groupBy` directly on the join
    * output, or inside iterative plans AQE won't re-plan per iteration.
    * Cost: the build side shuffles `salts`× — keep it the small side.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val nonKey = large.columns.filterNot(keys.contains).map(col)
    // A key-only probe table has nothing to scatter on; any constant salt
    // keeps the join exact (each row still meets exactly one replica).
    val salt =
      if (nonKey.isEmpty) lit(0L)
      else pmod(xxhash64(nonKey: _*), lit(salts.toLong))
    val salted = large.withColumn("__salt", salt)
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
