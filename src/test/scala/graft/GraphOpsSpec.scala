package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

class GraphOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // Bowtie: two triangles (1,2,3) and (3,4,5) sharing node 3, plus a
  // pendant edge 5-6 and an isolated edge 7-8. Edges given messy: both
  // directions, self-loop, duplicate.
  private def bowtie() = {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 3L),
        (5L, 6L), (6L, 5L), (7L, 8L), (2L, 1L), (4L, 4L))
      .toDF("a", "b")
  }

  test("canonicalEdges orders endpoints, drops self-loops and duplicates") {
    val e = GraphOps.canonicalEdges(bowtie(), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(e == Set((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L),
      (3L, 5L), (5L, 6L), (7L, 8L)))
  }

  test("degree distribution on the bowtie") {
    val e = GraphOps.canonicalEdges(bowtie(), "a", "b")
    val dist = GraphOps.degreeDistribution(e)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // degrees: 1:2, 2:2, 3:4, 4:2, 5:3, 6:1, 7:1, 8:1
    assert(dist == Map(1L -> 3L, 2L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("triangle count: two triangles, orientation handles hub node") {
    val e = GraphOps.canonicalEdges(bowtie(), "a", "b")
    val n = GraphOps.triangleCount(e).collect().head.getLong(0)
    assert(n == 2L)
  }

  test("triangle count on K4 (every orientation case)") {
    import spark.implicits._
    val k4 = (for { u <- 1 to 4; v <- 1 to 4 if u < v } yield (u.toLong, v.toLong))
      .toDF("a", "b")
    val e = GraphOps.canonicalEdges(k4, "a", "b")
    assert(GraphOps.triangleCount(e).collect().head.getLong(0) == 4L)
  }

  test("clustering coefficient on the bowtie") {
    val e = GraphOps.canonicalEdges(bowtie(), "a", "b")
    val cc = GraphOps.clusteringCoefficient(e)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(cc(1L) == ((1L, 1.0)))        // deg 2, in 1 triangle
    assert(cc(3L) == ((2L, 0.333333)))   // deg 4, in both triangles: 4/12
    assert(cc(6L) == ((0L, 0.0)))        // pendant
    assert(cc(7L) == ((0L, 0.0)))        // isolated edge
  }

  test("fixed-point PageRank: symmetric graph stays uniform (exact fixpoint)") {
    import spark.implicits._
    // 2-cycle: every node keeps exactly unit rank: 150000 + 85% of 1000000
    val e = GraphOps.canonicalEdges(Seq((1L, 2L)).toDF("a", "b"), "a", "b")
    val ranks = GraphOps.pageRankFixedPoint(e, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks == Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("fixed-point PageRank: star hub outranks identical leaves") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(star, "a", "b")
    val ranks = GraphOps.pageRankFixedPoint(e, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1L) > ranks(2L))
    assert(ranks(2L) == ranks(3L) && ranks(3L) == ranks(4L))
    // integer arithmetic ⇒ bit-identical on re-run
    val again = GraphOps.pageRankFixedPoint(e, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == ranks)
  }

  test("fixed-point PageRank: disconnected components don't leak rank") {
    import spark.implicits._
    // a 2-cycle and a separate triangle — both symmetric, so every node
    // sits at the exact fixpoint; no cross-component flow can perturb it
    val e = GraphOps.canonicalEdges(
      Seq((1L, 2L), (10L, 11L), (11L, 12L), (10L, 12L)).toDF("a", "b"), "a", "b")
    val ranks = GraphOps.pageRankFixedPoint(e, iters = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size == 5)
    assert(ranks.values.forall(_ == 1000000L), ranks.toString)
  }

  test("triangle-free graph counts zero") {
    import spark.implicits._
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).toDF("a", "b")
    val e = GraphOps.canonicalEdges(star, "a", "b")
    assert(GraphOps.triangleCount(e).collect().head.getLong(0) == 0L)
  }
}
