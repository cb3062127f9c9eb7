package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SketchFunctions

/** HLL sketch behavior: estimation error within the m=64 statistical
  * envelope, group independence, and the register-math invariants the
  * oracle parity depends on.
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("hllDistinct estimates 50k distinct values within 3 standard errors") {
    import spark.implicits._
    val df = (1 to 50000).map(i => ("g", i.toLong)).toDF("g", "v")
    val est = SketchFunctions.hllDistinct(df, Seq("g"), "v").head().getDouble(1)
    // stderr ≈ 1.04/√64 = 13%; 3σ = 39%
    assert(math.abs(est - 50000) / 50000.0 < 0.39, s"estimate $est too far from 50000")
  }

  test("hllDistinct is insensitive to duplication (same distinct set, 3x rows)") {
    import spark.implicits._
    val once = (1 to 20000).map(i => ("g", i.toLong))
    val thrice = once ++ once ++ once
    val e1 = SketchFunctions.hllDistinct(once.toDF("g", "v"), Seq("g"), "v").head().getDouble(1)
    val e3 = SketchFunctions.hllDistinct(thrice.toDF("g", "v"), Seq("g"), "v").head().getDouble(1)
    assert(e1 == e3) // registers saturate identically — exact invariance
  }

  test("count-min never undercounts and is exact for an isolated key") {
    import spark.implicits._
    val keys = (1 to 300).flatMap(k => Seq.fill(k % 7 + 1)(("g", k.toLong)))
    val df = keys.toDF("g", "v")
    val exact = df.groupBy(col("v")).agg(count(lit(1)).as("exact")).as("e")
    val counters = SketchFunctions.cmsCounters(df, "v")
    val est = SketchFunctions.cmsEstimate(counters, exact.select(col("v")), "v")
    val joined = est.join(exact, Seq("v"))
      .select(col("v"), col("cms_count"), col("exact")).collect()
    assert(joined.forall(r => r.getLong(1) >= r.getLong(2)), "CMS undercounted a key")
    // a single-key sketch is trivially exact
    val one = Seq.fill(42)(("g", 7L)).toDF("g", "v")
    val oneEst = SketchFunctions.cmsEstimate(
      SketchFunctions.cmsCounters(one, "v"), Seq(7L).toDF("v"), "v")
      .head().getLong(1)
    assert(oneEst == 42L)
  }

  test("each count-min row's counters sum to the input row count") {
    import spark.implicits._
    val df = (1 to 5000).map(i => ("g", (i % 900).toLong)).toDF("g", "v")
    val sums = SketchFunctions.cmsCounters(df, "v")
      .groupBy(col("j")).agg(sum(col("cnt")).as("s")).collect()
    assert(sums.length == SketchFunctions.CmsRows)
    assert(sums.forall(_.getLong(1) == 5000L))
  }

  test("null values are ignored (countDistinct semantics) in both sketches") {
    import spark.implicits._
    val clean = (1 to 5000).map(i => ("g", Some(i.toLong)))
    val dirty = clean ++ Seq.fill(500)(("g", None: Option[Long]))
    val e1 = SketchFunctions.hllDistinct(clean.toDF("g", "v"), Seq("g"), "v").head().getDouble(1)
    val e2 = SketchFunctions.hllDistinct(dirty.toDF("g", "v"), Seq("g"), "v").head().getDouble(1)
    assert(e1 == e2)
    val c1 = SketchFunctions.cmsCounters(clean.toDF("g", "v"), "v")
      .agg(sum(col("cnt"))).head().getLong(0)
    val c2 = SketchFunctions.cmsCounters(dirty.toDF("g", "v"), "v")
      .agg(sum(col("cnt"))).head().getLong(0)
    assert(c1 == c2)
  }

  test("cmsEstimate answers 0 for a key absent from the sketched input") {
    import spark.implicits._
    val sketched = SketchFunctions.cmsCounters(
      (1 to 20).map(i => s"k$i").toDF("v"), "v")
    val est = SketchFunctions.cmsEstimate(sketched,
      Seq("k1", "never-seen-key-xyz").toDF("v"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("k1") >= 1L) // never undercounts
    assert(est("never-seen-key-xyz") == 0L) // unseen key → 0, not min-of-collisions
  }

  test("HLL register merge is lossless under any split of the data") {
    import spark.implicits._
    val df = (1L to 30000L).map(v => (s"g${v % 3}", v)).toDF("g", "v")
    val single = SketchFunctions.hllDistinct(df, Seq("g"), "v")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // 3-way split by an unrelated key, merged pairwise (associativity)
    val parts = (0 until 3).map(i =>
      SketchFunctions.hllRegisters(df.filter(col("v") % 7 === i || (col("v") % 7 >= 3 && i == 2)),
        Seq("g"), "v"))
    val covered = df.filter(col("v") % 7 < 3 || col("v") % 7 >= 3) // all rows
    assert(covered.count() == df.count())
    val merged = SketchFunctions.hllEstimate(
      SketchFunctions.hllMergeRegisters(
        SketchFunctions.hllMergeRegisters(parts(0), parts(1), Seq("g")),
        parts(2), Seq("g")),
      Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(merged == single, s"merged $merged != single-pass $single")
  }

  test("register/rank stay in their domains") {
    import spark.implicits._
    val df = (1 to 1000).map(_.toLong).toDF("v")
    val (reg, rank) = SketchFunctions.hllRegisterRank(col("v"))
    val rows = df.select(reg.as("reg"), rank.as("rank")).collect()
    assert(rows.forall(r => r.getLong(0) >= 0 && r.getLong(0) < 64))
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 55))
  }
}
