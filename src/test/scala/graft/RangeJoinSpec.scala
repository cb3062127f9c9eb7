package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("rangeJoin: containment, inclusive bounds, overlaps, grid independence") {
    import spark.implicits._
    val intervals = Seq((1L, 10L, 20L), (2L, 15L, 30L), (3L, 100L, 100L))
      .toDF("iid", "s", "e")
    val points = Seq((100L, 10L), (101L, 17L), (102L, 20L), (103L, 31L), (104L, 100L))
      .toDF("pid", "v")
    def run(grid: Long) = RangeJoin.rangeJoin(points, "v", intervals, "s", "e", grid)
      .select(col("pid"), col("iid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = Set(
      (100L, 1L),             // start bound inclusive
      (101L, 1L), (101L, 2L), // inside the overlap → both intervals
      (102L, 1L), (102L, 2L), // end bound of 1 inclusive
      (104L, 3L))             // degenerate single-day interval
    // the grid width must never change results, only the plan
    assert(run(4L) == expected)
    assert(run(128L) == expected)
    assert(run(1L) == expected)
  }
}
