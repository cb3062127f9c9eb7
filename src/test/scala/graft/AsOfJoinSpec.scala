package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics on constructed data: latest-at-or-before match,
  * inclusive time ties, null for unmatched, left columns preserved.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("asOfJoin picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // matches right at t=10 (tie, inclusive)
      (1L, 101L, 25L), // matches right at t=20
      (1L, 102L, 5L),  // before any right row → null
      (2L, 200L, 50L)  // key with no right rows at all → null
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, 900L, 10L),
      (1L, 901L, 20L),
      (1L, 902L, 30L) // after every left row; must never match
    ).toDF("k", "rid", "t")

    val out = AsOfJoin.asOfJoin(left, right, "k", "t", Seq("rid", "t"))
      .select(col("id"), col("matched.rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(100L -> 900L, 101L -> 901L, 102L -> -1L, 200L -> -1L))
  }

  test("asOfJoin tie among right rows at the same time resolves to the largest payload") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L)).toDF("k", "id", "t")
    val right = Seq((1L, 7L, 10L), (1L, 9L, 10L), (1L, 8L, 10L)).toDF("k", "rid", "t")
    val out = AsOfJoin.asOfJoin(left, right, "k", "t", Seq("rid"))
      .select(col("matched.rid")).head().getLong(0)
    assert(out == 9L)
  }

  test("asOfJoin tolerance nulls matches older than the lookback bound") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // right at t=10: distance 0, inside any bound
      (1L, 101L, 25L), // latest right t=20: distance 5 ≤ 5 → matches
      (1L, 102L, 40L), // latest right t=30: distance 10 > 5 → nulled
      (2L, 200L, 50L)  // no right rows → null (not an error)
    ).toDF("k", "id", "t")
    val right = Seq(
      (1L, 900L, 10L), (1L, 901L, 20L), (1L, 902L, 30L)
    ).toDF("k", "rid", "t")

    val out = AsOfJoin.asOfJoin(left, right, "k", "t", Seq("rid", "t"),
        tolerance = Some(lit(5L)))
      .select(col("id"), col("matched.rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(100L -> 900L, 101L -> 901L, 102L -> -1L, 200L -> -1L))
  }

  test("asOfJoin with tolerance=None is byte-identical to the unbounded form") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 101L, 25L), (2L, 200L, 50L))
      .toDF("k", "id", "t")
    val right = Seq((1L, 900L, 10L), (1L, 901L, 20L)).toDF("k", "rid", "t")
    val a = AsOfJoin.asOfJoin(left, right, "k", "t", Seq("rid", "t"))
      .orderBy(col("id")).collect().toSeq
    val b = AsOfJoin.asOfJoin(left, right, "k", "t", Seq("rid", "t"),
        tolerance = None)
      .orderBy(col("id")).collect().toSeq
    assert(a == b)
  }
}
