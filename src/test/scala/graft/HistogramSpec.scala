package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}

import graft.core.{Histogram, HistogramAlgebra => HA}
import graft.functions.{HistogramFunctions => HF}

class HistogramAlgebraSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(100), p)
    assert(r.passed, r.status.toString)
  }

  private val bucketGen: Gen[Map[String, Double]] = for {
    n <- Gen.choose(0, 8)
    keys <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e", "f", "g", "h"))
    vals <- Gen.listOfN(n, Gen.choose(0.0, 1.0))
  } yield keys.zip(vals).toMap

  private val histGen: Gen[Histogram] = for {
    size <- Gen.choose(1L, 5000L)
    b <- bucketGen
  } yield Histogram("h", size, b)

  test("merge is a size-weighted mean (no decay below 1000)") {
    check(Prop.forAll(histGen, histGen) { (h1raw, h2) =>
      val h1 = h1raw.copy(size = h1raw.size.min(1000))
      val m = HA.merge(h1, h2)
      val keys = h1.buckets.keySet ++ h2.buckets.keySet
      keys.forall { k =>
        val expected = (h1.buckets.getOrElse(k, 0.0) * h1.size + h2.buckets.getOrElse(k, 0.0) * h2.size) /
          (h1.size + h2.size).toDouble
        math.abs(m.buckets(k) - expected) < 1e-12
      } && m.size == h1.size + h2.size
    })
  }

  test("merge decay halves the profile weight above 1000 observations") {
    val prof = Histogram("h", 2000, Map("a" -> 1.0))
    val cur = Histogram("h", 1000, Map("b" -> 1.0))
    val m = HA.merge(prof, cur)
    // weights: 2000/2=1000 vs 1000 → equal halves
    assert(math.abs(m.buckets("a") - 0.5) < 1e-12)
    assert(math.abs(m.buckets("b") - 0.5) < 1e-12)
    assert(m.size == 2000 / 2 + 1000)
  }

  test("mergeMax is commutative and idempotent on buckets") {
    check(Prop.forAll(histGen, histGen) { (h1, h2) =>
      val a = HA.mergeMax(h1, h2).buckets
      val b = HA.mergeMax(h2, h1).buckets
      val i = HA.mergeMax(h1, h1).buckets
      a == b && i == h1.buckets.map { case (k, v) => k -> math.max(v, 0.0) }
    })
  }

  test("atypical ⊆ current keys and disjoint from profile-known keys") {
    check(Prop.forAll(bucketGen, bucketGen) { (p, q) =>
      val at = HA.atypical(p, q)
      at.subsetOf(q.keySet) && at.forall(k => p.getOrElse(k, 0.0) < HA.AtypicalThreshold)
    })
  }

  test("difference inverts merge (no decay)") {
    check(Prop.forAll(histGen, histGen) { (h1raw, h2) =>
      val h1 = h1raw.copy(size = h1raw.size.min(1000))
      val m = HA.merge(h1, h2)
      val d = HA.difference(m, h2)
      d.size == h1.size && h2.buckets.keySet.forall { k =>
        math.abs(d.buckets(k) - h1.buckets.getOrElse(k, 0.0)) < 1e-9
      }
    })
  }

  test("KL divergence is 0 for identical distributions, >0 otherwise") {
    val p = Map("a" -> 0.5, "b" -> 0.5)
    assert(HA.kullbackLiebler(p, p) == 0.0)
    assert(HA.kullbackLiebler(Map("a" -> 0.9, "b" -> 0.1), p) > 0)
  }

  test("logBin matches floor(ln(x+1))") {
    assert(HA.logBin(0.0) == 0)
    assert(HA.logBin(math.E - 1 + 1e-9) == 1)
    assert(HA.logBin(1e6) == 13)
  }
}

/** Column implementations must agree with the pure algebra. */
class HistogramColumnParitySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val cases = Seq(
    (Histogram("x", 2000, Map("a" -> 0.7, "b" -> 0.3)), Histogram("x", 10, Map("b" -> 0.5, "c" -> 0.5))),
    (Histogram("x", 5, Map("a" -> 1.0)), Histogram("x", 5, Map("a" -> 0.2, "d" -> 0.8))),
    (Histogram("x", 999, Map.empty[String, Double]), Histogram("x", 1, Map("z" -> 1.0))),
  )

  test("mergeBuckets/mergedSize column forms match HistogramAlgebra.merge") {
    import spark.implicits._
    cases.foreach { case (h1, h2) =>
      val df = Seq((h1.size, h1.buckets, h2.size, h2.buckets)).toDF("s1", "b1", "s2", "b2")
      val row = df.select(
        HF.mergeBuckets($"s1", $"b1", $"s2", $"b2").as("m"),
        HF.mergedSize($"s1", $"s2").as("sz")).head()
      val expected = HA.merge(h1, h2)
      val got = row.getMap[String, Double](0)
      assert(row.getLong(1) == expected.size)
      expected.buckets.foreach { case (k, v) =>
        assert(math.abs(got.getOrElse(k, 0.0) - v) < 1e-12, s"bucket $k")
      }
    }
  }

  test("atypicalKeys column form matches HistogramAlgebra.atypical") {
    import spark.implicits._
    cases.foreach { case (h1, h2) =>
      val df = Seq((h1.buckets, h2.buckets)).toDF("b1", "b2")
      val got = df.select(HF.atypicalKeys($"b1", $"b2")).head().getSeq[String](0).toSet
      assert(got == HA.atypical(h1.buckets, h2.buckets))
    }
  }

  test("typicalKeys column form matches HistogramAlgebra.typical") {
    import spark.implicits._
    cases.foreach { case (h1, h2) =>
      val df = Seq((h1.buckets, h2.buckets)).toDF("b1", "b2")
      val got = df.select(HF.typicalKeys($"b1", $"b2")).head().getSeq[String](0).toSet
      assert(got == HA.typical(h1.buckets, h2.buckets))
    }
  }

  test("mergeMaxBuckets column form matches HistogramAlgebra.mergeMax") {
    import spark.implicits._
    cases.foreach { case (h1, h2) =>
      val df = Seq((h1.buckets, h2.buckets)).toDF("b1", "b2")
      val got = df.select(HF.mergeMaxBuckets($"b1", $"b2")).head().getMap[String, Double](0)
      val expected = HA.mergeMax(h1, h2).buckets
      assert(got.keySet == expected.keySet)
      expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-12, s"bucket $k") }
    }
  }

  test("differenceBuckets column form matches HistogramAlgebra.difference (and inverts merge)") {
    import spark.implicits._
    cases.foreach { case (h1raw, h2) =>
      val h1 = h1raw.copy(size = h1raw.size.min(1000)) // no decay so difference is exact
      val m = HA.merge(h1, h2)
      val df = Seq((m.size, m.buckets, h2.size, h2.buckets)).toDF("s1", "b1", "s2", "b2")
      val got = df.select(HF.differenceBuckets($"s1", $"b1", $"s2", $"b2")).head().getMap[String, Double](0)
      val expected = HA.difference(m, h2).buckets
      assert(got.keySet == expected.keySet, s"keys: got ${got.keySet} expected ${expected.keySet}")
      expected.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"bucket $k") }
      // and round-trips back to h1 on h2's keys
      h2.buckets.keySet.foreach { k =>
        assert(math.abs(got(k) - h1.buckets.getOrElse(k, 0.0)) < 1e-9, s"round-trip $k")
      }
    }
  }

  test("differenceBuckets keeps profile-only buckets untouched") {
    import spark.implicits._
    val b1 = Map("only_in_profile" -> 0.4, "shared" -> 0.6)
    val b2 = Map("shared" -> 1.0)
    val df = Seq((100L, b1, 10L, b2)).toDF("s1", "b1", "s2", "b2")
    val got = df.select(HF.differenceBuckets($"s1", $"b1", $"s2", $"b2")).head().getMap[String, Double](0)
    assert(got("only_in_profile") == 0.4) // NOT rescaled by s1/(s1-s2)
    assert(math.abs(got("shared") - (0.6 * 100 - 1.0 * 10) / 90.0) < 1e-12)
  }

  test("isTypicalEvent column form matches pure") {
    import spark.implicits._
    cases.foreach { case (h1, h2) =>
      (h1.buckets.keySet ++ h2.buckets.keySet ++ Set("absent")).foreach { ev =>
        val df = Seq(Tuple1(h1.buckets)).toDF("b1")
        val got = df.select(HF.isTypicalEvent($"b1", lit(ev))).head().getBoolean(0)
        assert(got == HA.isTypicalEvent(h1.buckets, ev), s"event $ev")
      }
    }
  }

  test("logBin column form matches pure") {
    import spark.implicits._
    val xs = Seq(0.0, 1.0, math.E - 1 + 1e-9, 100.0, 1e6)
    val df = xs.map(Tuple1(_)).toDF("x")
    val got = df.select(HF.logBin($"x")).collect().map(_.getLong(0))
    assert(got.toSeq == xs.map(HA.logBin(_)))
  }

  test("kullbackLiebler column form matches pure") {
    import spark.implicits._
    val p = Map("a" -> 0.6, "b" -> 0.4)
    val q = Map("a" -> 0.3, "b" -> 0.6, "c" -> 0.1)
    val df = Seq((p, q)).toDF("p", "q")
    val got = df.select(HF.kullbackLiebler($"p", $"q")).head().getDouble(0)
    assert(math.abs(got - HA.kullbackLiebler(p, q)) < 1e-12)
  }
}
