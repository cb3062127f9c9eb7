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

  test("saltedJoin multiset-equals the plain join under a hot key") {
    import spark.implicits._
    // probe: one hot key (5000 rows) + colds, with duplicate full rows to
    // prove multiset semantics survive the salt scatter
    val probe = ((1 to 5000).map(i => (1L, s"p${i % 977}")) ++
      (1 to 40).map(i => ((i % 5 + 2).toLong, s"q$i"))).toDF("k", "pv")
    val build = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d"), (9L, "e"))
      .toDF("k", "bv")
    def bag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = bag(probe.join(build, Seq("k")))
    val salted = bag(Skew.saltedJoin(probe, build, Seq("k"), salts = 8))
    assert(salted == plain)
  }

  test("saltedJoin on a key-only probe table still joins exactly") {
    import spark.implicits._
    val probe = Seq(1L, 1L, 2L, 4L).toDF("k")
    val build = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "bv")
    val out = Skew.saltedJoin(probe, build, Seq("k"), salts = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(out.toSeq == Seq((1L, "x"), (1L, "x"), (2L, "y")))
  }
}
