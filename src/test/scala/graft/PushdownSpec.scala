package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Scan-efficiency proof: the filter-heavy queries must reach the
  * parquet scan with pushed filters, and projection-heavy queries must
  * prune their read schema — a scan that reads every column for a
  * narrow projection, or filters only above the scan, silently costs a
  * full-table read at 100 TB. Asserted on the physical scan nodes so a
  * regression (e.g. a filter expression turning non-pushable) fails CI,
  * not a profiler session six months later.
  */
class PushdownSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fileScans(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collectWithSubqueries {
      case s: FileSourceScanExec => Seq(s)
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
    }.flatten

  private def scansOf(name: String): Seq[FileSourceScanExec] = {
    val scans = fileScans(
      SparkEntry.queries(name)(spark, SparkTestSession.sfDir).queryExecution.executedPlan)
    assert(scans.nonEmpty, s"$name: no parquet scans found")
    scans
  }

  private def pushed(s: FileSourceScanExec): Seq[String] =
    s.metadata.getOrElse("PushedFilters", "[]").stripPrefix("[").stripSuffix("]")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

  test("s3_time_filter pushes its time predicate into the events scan") {
    val filters = scansOf("s3_time_filter").flatMap(pushed)
    assert(filters.exists(f => f.startsWith("GreaterThan") || f.startsWith("LessThan")),
      s"no range filter pushed: $filters")
  }

  test("p3_pred_filter pushes its predicates into the lineitem scan") {
    val filters = scansOf("p3_pred_filter").flatMap(pushed)
    assert(filters.exists(f => !f.startsWith("IsNotNull")),
      s"only null-checks pushed: $filters")
  }

  test("q2_shipping_priority pushes date predicates on both fact scans") {
    val perScan = scansOf("q2_shipping_priority").map(pushed)
    assert(perScan.count(_.exists(f => f.contains("Than") || f.startsWith("EqualTo"))) >= 2,
      s"pushed per scan: $perScan")
  }

  test("s1_scan_project prunes the lineitem read schema to its projection") {
    // lineitem has 11 columns; the narrow projection must not read them all
    val widths = scansOf("s1_scan_project").map(_.requiredSchema.fields.length)
    assert(widths.forall(_ <= 6), s"read widths: $widths")
  }

  test("q1_agg reads only the aggregation's columns") {
    val widths = scansOf("q1_agg").map(_.requiredSchema.fields.length)
    assert(widths.forall(_ <= 8), s"read widths: $widths")
  }

  test("m1_media_features never reads document text for non-image rows' metadata") {
    // the media fixture builds bytes lazily per kind; the scan itself
    // must stay narrow (doc_id, text, n_chars — not lang/source)
    val widths = scansOf("m1_media_features").map(_.requiredSchema.fields.length)
    assert(widths.forall(_ <= 3), s"read widths: $widths")
  }

  test("q15_top_supplier pushes the ship-date window into the lineitem scan") {
    // the revenue view's date window must reach the scan (Catalyst unwraps
    // the CAST-to-DATE comparison); a filter stuck above the scan reads
    // the whole fact table to aggregate three months of it
    val filters = scansOf("q15_top_supplier").flatMap(pushed)
    assert(filters.exists(f => f.contains("Than")),
      s"no range filter pushed: $filters")
  }

  test("q20_potential_promo decorrelates to semi-joins, never a nested loop") {
    val plan = SparkEntry.queries("q20_potential_promo")(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"no LeftSemi in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"correlated subqueries fell back to a nested loop:\n$plan")
  }

  test("q16_supplier_cnt plans the NOT IN as a null-aware anti-join (NAAJ)") {
    // `x NOT IN (subq)` is three-valued; a plain LeftAnti would return
    // WRONG rows if the subquery ever produced a NULL. The physical form
    // is BroadcastHashJoin(..., LeftAnti, ..., isNullAwareAntiJoin=true),
    // printed as a trailing `true` flag.
    val plan = SparkEntry.queries("q16_supplier_cnt")(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    val naaj = plan.split("\n").filter(l =>
      l.contains("BroadcastHashJoin") && l.contains("LeftAnti") && l.contains("true"))
    assert(naaj.nonEmpty, s"no null-aware anti-join in plan:\n$plan")
  }
}
