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

  test("appendToIvfIndex lands each new vector in its nearest existing cell and makes it findable") {
    val dir = java.nio.file.Files.createTempDirectory("ivf_app_").toString
    val base = emb.filter(col("vec_id") % 2 === 0)
    val extra = emb.filter(col("vec_id") % 2 === 1)
    SimilaritySearch.buildIvfIndex(base, "label", dir)
    SimilaritySearch.appendToIvfIndex(spark, dir, extra)
    val vecs = spark.read.parquet(s"$dir/vectors")
    assert(vecs.count() == emb.count())
    // assignment correctness: recompute each appended vector's nearest
    // centroid independently and compare with the stored cell
    val assigned = vecs.filter(col("vec_id") % 2 === 1)
      .select(col("vec_id"), col("part").cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cent = spark.read.parquet(s"$dir/centroids").collect()
      .groupBy(_.getAs[Any]("part").toString.toLong)
      .view.mapValues(_.sortBy(_.getAs[Number]("i").longValue)
        .map(_.getAs[Double]("c")).toArray).toMap
    val vres = extra.select(col("vec_id"), col("embedding")).collect()
    vres.foreach { r =>
      val id = r.getLong(0)
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      val vn = math.sqrt(v.map(x => x * x).sum)
      val best = cent.toSeq.map { case (p, c) =>
        val cn = math.sqrt(c.map(x => x * x).sum)
        val sim = BigDecimal(v.zip(c).map { case (a, b) => a * b }.sum / (vn * cn))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (p, sim)
      }.maxBy { case (p, sim) => (sim, -p) }._1
      assert(assigned(id) == best, s"vec $id stored in ${assigned(id)}, nearest is $best")
    }
    // and an appended vector is findable through the query path
    val res = SimilaritySearch.queryIvfIndex(spark, dir,
      emb.filter(col("vec_id") === 1), k = 3, nProbe = 2)
    assert(res.count() == 3)
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
