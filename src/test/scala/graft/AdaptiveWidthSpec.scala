package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AdaptiveWidth
import graft.sources.Catalog

/** The input-size gate behind the complete-mode wide-aggregate plans:
  * estimates must come from the optimizer (pruned through projections),
  * the small regime must hold on the test fixtures (where the plain
  * plans are the ones oracle-pinned), and unknown-estimate inputs must
  * choose the wide plan (fail toward no-spill).
  */
class AdaptiveWidthSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("estimates are positive, projection-pruned, and monotone in scale") {
    val li = Catalog.lineitem(spark, SparkTestSession.sfDir)
    val full = AdaptiveWidth.estimatedBytes(li)
    val proj = AdaptiveWidth.estimatedBytes(li.select("l_suppkey", "l_partkey"))
    assert(full > 0 && proj > 0)
    assert(proj < full, "column pruning must shrink the estimate")
    val li01 = Catalog.lineitem(spark, "/root/testdata/sf0.01")
    assert(AdaptiveWidth.estimatedBytes(li01) > full,
      "a 10x fixture must estimate larger")
  }

  test("sf0.001/sf0.01 sit in the small regime for the gated call sites") {
    // the derived thresholds the call sites use: 256 KiB/task × 32
    // partitions = 8 MB (lineitem pair/distinct plans), /4 expansion =
    // 2 MB (gram pipelines) — both fixtures the tests and the driver's
    // correctness gate run on must take the plain plan, since that is
    // the plan whose results the oracles pinned fastest
    for (dir <- Seq(SparkTestSession.sfDir, "/root/testdata/sf0.01")) {
      val li = Catalog.lineitem(spark, dir)
      assert(AdaptiveWidth.isSmallInput(li.select("l_suppkey", "l_partkey")), dir)
      val docs = Catalog.documents(spark, dir)
      assert(AdaptiveWidth.isSmallInput(docs.select("doc_id", "text"),
        expansionFactor = 4), dir)
    }
  }

  test("the regime boundary derives from shuffle partitions x the conf key") {
    val li = Catalog.lineitem(spark, SparkTestSession.sfDir)
      .select("l_suppkey", "l_partkey")
    val before = spark.conf.getOption(AdaptiveWidth.TaskInputBytesKey)
    try {
      // 1 byte/task: everything is the large regime (a deployment can
      // force the wide plans without touching code)
      spark.conf.set(AdaptiveWidth.TaskInputBytesKey, "1")
      assert(!AdaptiveWidth.isSmallInput(li))
      // a huge budget: the same input is small even at expansion 4
      spark.conf.set(AdaptiveWidth.TaskInputBytesKey, (1L << 40).toString)
      assert(AdaptiveWidth.isSmallInput(li, expansionFactor = 4))
      // and the default reproduces the previously hard-coded 8 MiB at
      // the production sessions' 32 shuffle partitions
      spark.conf.unset(AdaptiveWidth.TaskInputBytesKey)
      assert(32 * AdaptiveWidth.DefaultTaskInputBytes == 8L << 20)
    } finally {
      before match {
        case Some(v) => spark.conf.set(AdaptiveWidth.TaskInputBytesKey, v)
        case None => spark.conf.unset(AdaptiveWidth.TaskInputBytesKey)
      }
    }
  }

  test("widened derives from the data estimate, clamped to [parallelism, factor x parallelism]") {
    val li = Catalog.lineitem(spark, SparkTestSession.sfDir)
    val base = spark.sessionState.conf.numShufflePartitions
    // a tiny fixture estimate hits the LOWER clamp: never narrower than
    // the session's parallelism (every core stays busy)
    assert(AdaptiveWidth.widened(li) == base)
    // the width scales with estimate x expansionFactor / target bytes…
    val est = AdaptiveWidth.estimatedBytes(li)
    val target = AdaptiveWidth.DefaultWidthTargetBytes
    val wantRaw = (est * 1000 + target - 1) / target
    assert(AdaptiveWidth.widened(li, expansionFactor = 1000) ==
      wantRaw.max(base).min(base * 6).toInt)
    // …and a huge expansion hits the UPPER clamp: factor x parallelism,
    // the pre-r13 width (also what an unknown Long.MaxValue-ish
    // estimate lands on — the safe side)
    assert(AdaptiveWidth.widened(li, expansionFactor = Int.MaxValue) == base * 6)
    assert(AdaptiveWidth.widened(li, factor = 8,
      expansionFactor = Int.MaxValue) == base * 8)
  }

  test("an unknown (huge) estimate chooses the wide plan") {
    import spark.implicits._
    // a local relation with a one-row range joined to itself via a UDF-
    // opaque filter still carries SOME estimate; instead pin the
    // documented contract directly on the threshold boundary
    val df = Seq.fill(1000)(("x" * 1000)).toDF("s")
    val est = AdaptiveWidth.estimatedBytes(df)
    assert(!AdaptiveWidth.isSmall(df, (est - 1).toLong max 1L),
      "estimate at/over threshold must choose wide")
    assert(AdaptiveWidth.isSmall(df, est.toLong + 1))
  }
}
