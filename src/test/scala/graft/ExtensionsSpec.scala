package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.HistogramAlgebra
import graft.extensions.GraftFunctions

/** The injected SQL functions must agree with their Column/pure forms and
  * stay inside whole-stage codegen (native expression trees, no UDF).
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("graft_logbin SQL form matches the pure algebra") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_logbin(x) FROM VALUES (0.0), (100.0), (1e6) AS t(x)")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0.0, 100.0, 1e6).map(HistogramAlgebra.logBin(_)))
  }

  test("graft_hamming SQL form matches Long.bitCount") {
    GraftFunctions.register(spark)
    val got = spark.sql("SELECT graft_hamming(12345, 54321)").head().getLong(0)
    assert(got == java.lang.Long.bitCount(12345L ^ 54321L))
  }

  test("graft_zvalue SQL form matches Layout.zvalue and the scalar interleave") {
    GraftFunctions.register(spark)
    def morton(a: Long, b: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum
    val pairs = Seq((0L, 0L), (5L, 9L), (15L, 15L), (3L, 12L))
    val rows = spark.sql(
      "SELECT graft_zvalue(a, b, 4) AS z FROM VALUES (0, 0), (5, 9), (15, 15), (3, 12) AS t(a, b)")
      .collect().map(_.getLong(0)).toSeq
    assert(rows == pairs.map { case (a, b) => morton(a, b, 4) })
    // column form agrees with the SQL form
    import spark.implicits._
    val viaColumn = Seq((5L, 9L)).toDF("a", "b")
      .select(graft.operators.Layout.zvalue(Seq(col("a"), col("b")), 4))
      .head().getLong(0)
    assert(viaColumn == morton(5, 9, 4))
    // non-literal bits arg is rejected at analysis time
    intercept[Exception] {
      spark.sql("SELECT graft_zvalue(a, a, a) FROM VALUES (1) AS t(a)").collect()
    }
  }

  test("graft_net24 truncates to the /24 network") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_net24('10.1.2.3')").head().getString(0) == "10.1.2")
  }

  test("graft_dot computes an exact dot product over float and double arrays") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)), array(2.0D, 3.0D))")
      .head().getDouble(0)
    assert(got == 1.5 * 2.0 + -2.0 * 3.0)
    // length mismatch: the extra tail is ignored by contract
    assert(spark.sql(
      "SELECT graft_dot(array(CAST(2.0 AS FLOAT), CAST(9.0 AS FLOAT)), array(3.0D))")
      .head().getDouble(0) == 6.0)
  }

  test("graft_dot matches the HOF formulation bit-for-bit on a real column") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq((Array(0.25f, -1.5f, 3f), Array(2f, 0.5f, -1f)))
      .toDF("a", "b")
    val hof = df.select(aggregate(zip_with($"a", $"b",
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x))
      .head().getDouble(0)
    val native = df.select(graft.functions.VectorFunctions.dot($"a", $"b")).head().getDouble(0)
    assert(native == hof)
  }

  test("wrong arity fails with a clear message, not IndexOutOfBounds") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_dot(array(1.0))").collect()
    }
    assert(e.getMessage.contains("graft_dot expects 2 argument"), e.getMessage)
  }

  test("graft_strip_accents strips combining marks, keeps non-decomposable chars") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_strip_accents('Café São Zürich Łódź niño François àéîõü Đß')")
      .head().getString(0)
    assert(got == "Cafe Sao Zurich Łodz nino Francois aeiou Đß")
    // ASCII fast path returns the input unchanged
    assert(spark.sql("SELECT graft_strip_accents('plain ascii!')")
      .head().getString(0) == "plain ascii!")
    // null-intolerant: null in, null out
    assert(spark.sql("SELECT graft_strip_accents(CAST(NULL AS STRING))").head().isNullAt(0))
    // Column-API form agrees
    import spark.implicits._
    val viaCol = Seq("œil Ångström").toDF("s")
      .select(graft.functions.TextFunctions.stripAccents($"s")).head().getString(0)
    assert(viaCol == "œil Angstrom")
  }

  test("graft_count_in_set counts multiset hits; null array → null") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_count_in_set(array('the','cat','the',''), array('the','a'))").head()
    assert(r.getInt(0) == 2)
    assert(spark.sql(
      "SELECT graft_count_in_set(CAST(NULL AS ARRAY<STRING>), array('a'))").head().isNullAt(0))
    // matches the interpreted HOF formulation on a real column
    import spark.implicits._
    val df = Seq("the a the b", "x y", "", "a A").toDF("text")
      .select(graft.functions.TextFunctions.tokens(col("text")).as("toks"))
    val words = Seq("the", "a")
    val viaExpr = df.select(
      graft.functions.TextFunctions.countInSet(col("toks"), words)).as[Int].collect().toSeq
    val viaHof = df.select(
      size(filter(col("toks"), t => t.isin(words.map(lit(_)): _*)))).as[Int].collect().toSeq
    assert(viaExpr == viaHof)
    // non-foldable word-set arg is rejected at analysis time
    val err = intercept[Exception] {
      spark.sql("SELECT graft_count_in_set(array('a'), array(CAST(rand() AS STRING)))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"))
  }

  test("graft_minhash_sig SQL form matches the contentHash + permutation formula") {
    GraftFunctions.register(spark)
    // one shingle ("a b c"): every permutation minimum is exactly
    // (a·h + b) mod M over that shingle's 60-bit content hash
    val sig = spark.sql("SELECT graft_minhash_sig(array('a','b','c')) AS s")
      .head().getSeq[Long](0)
    val h = spark.sql(
      "SELECT conv(substring(md5('a b c'), 1, 15), 16, 10) % 2147483647")
      .head().get(0).toString.toLong
    val expect = graft.operators.Dedup.Perms.map { case (a, b) =>
      (a * h + b) % graft.operators.Dedup.HashMod }
    assert(sig == expect)
    // sub-shingle input → all minimums stay at the modulus sentinel
    val empty = spark.sql("SELECT graft_minhash_sig(array('a','b')) AS s")
      .head().getSeq[Long](0)
    assert(empty.forall(_ == graft.operators.Dedup.HashMod))
    assert(spark.sql("SELECT graft_minhash_sig(CAST(NULL AS ARRAY<STRING>))")
      .head().isNullAt(0))
  }

  test("graft_haversine and graft_human_bytes SQL forms match the Column forms") {
    GraftFunctions.register(spark)
    val km = spark.sql(
      "SELECT graft_haversine(-23.55, -46.63, 52.52, 13.40)").head().getDouble(0)
    assert(math.abs(km - 10255) < 50, s"SP-Berlin ~10255km, got $km") // sanity
    import spark.implicits._
    val viaCol = Seq((-23.55, -46.63, 52.52, 13.40)).toDF("a", "b", "c", "d")
      .select(graft.functions.NetFunctions.haversine($"a", $"b", $"c", $"d"))
      .head().getDouble(0)
    assert(km == viaCol)
    assert(spark.sql("SELECT graft_human_bytes(1536)").head().getString(0) == "1.5KB")
    assert(spark.sql("SELECT graft_human_bytes(10)").head().getString(0) == "10B")
  }

  test("injected functions stay codegen-native (no UDF node in the plan)") {
    GraftFunctions.register(spark)
    val plan = spark.sql("SELECT graft_logbin(x) FROM VALUES (1.0) AS t(x)")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("UDF"), plan)
  }
}
