package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Every declared query must run and (where it's a data query) return rows;
  * every oracle key must have a matching query. The value-level check runs
  * against DuckDB via tools/check_oracle.py (and the driver's own gate).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** Queries that may legitimately return 0 rows on the tiny sf0.001
    * fixture (e.g. near-duplicate detection when the fixture has no dups).
    * Everything else must return rows — an empty result usually means an
    * over-tight filter or a broken join key.
    */
  val mayBeEmpty: Set[String] = Set()

  test("q21 single-pass rewrite equals Catalyst-decorrelated EXISTS form") {
    // q21 executes as one per-order aggregate pass; the textbook
    // correlated EXISTS/NOT-EXISTS form (which Catalyst decorrelates
    // into semi/anti joins — three fact-table exchanges) is pinned here
    // as the equivalence witness. Both are fully ordered (numwait desc,
    // s_name) so row-sequence equality is deterministic.
    val fast = queries.RelationalQueries
      .soleFaultSuppliers(spark, SparkTestSession.sfDir).collect().toSeq
    val textbook = queries.RelationalQueries
      .soleFaultSuppliersExistsSql(spark, SparkTestSession.sfDir).collect().toSeq
    assert(fast.nonEmpty && fast == textbook)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs on sf0.001") {
      val df = fn(spark, SparkTestSession.sfDir)
      assert(df.columns.nonEmpty)
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"query $name returned 0 rows")
    }
  }
}
