package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilaritySearch
import graft.sources.Catalog

/** The persisted IVF index: the serving path (build once, query against
  * the on-disk layout) must be output-identical to the fused in-session
  * probe search, and its corpus scan must prune to the probed cells'
  * directories at the SOURCE.
  */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val emb = Catalog.embeddings(spark, SparkTestSession.sfDir)
  private lazy val idxDir = {
    val d = java.nio.file.Files.createTempDirectory("ivf_spec_").toString
    SimilaritySearch.buildIvfIndex(emb, "label", d)
    d
  }

  test("queryIvfIndex is output-identical to the in-session ivfTopK") {
    val queries = emb.filter(col("vec_id") < 10)
    val fused = SimilaritySearch.ivfTopK(emb, queries, "label", k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    val served = SimilaritySearch.queryIvfIndex(spark, idxDir, queries, k = 5, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(served == fused)
    assert(served.nonEmpty)
  }

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
    p.collectWithSubqueries {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        fileScans(a.executedPlan)
    }.flatten

  test("the vector scan prunes to the probed cells' directories") {
    val totalCells = emb.select(col("label")).distinct().count()
    val q = SimilaritySearch.queryIvfIndex(spark, idxDir,
      emb.filter(col("vec_id") === 0), k = 5, nProbe = 2)
    val scans = fileScans(q.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("vectors"))
    assert(scans.nonEmpty, "no file scan over the vectors directory found")
    // one query × nProbe=2 probes → exactly 2 of the cells' directories
    // survive partition pruning
    val parts = scans.map(_.selectedPartitions.partitionCount).sum
    assert(parts == 2, s"expected 2 pruned partitions of $totalCells, scanned $parts")
    assert(totalCells > 2)
  }
}
