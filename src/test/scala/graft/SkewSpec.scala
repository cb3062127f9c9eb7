package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("saltedDistinct equals plain countDistinct, including a hot key") {
    import spark.implicits._
    // hot key: 5000 values (many repeated); cold keys: a few each
    val rows = (1 to 20000).map(i => ("hot", (i % 5000).toLong)) ++
      (1 to 50).map(i => (s"cold${i % 7}", i.toLong))
    val df = rows.toDF("k", "v")
    val exact = df.groupBy(col("k")).agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedDistinct(df, Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == exact)
  }
}
