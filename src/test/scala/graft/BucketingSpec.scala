package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketing

/** The co-located-join contract: bucketed tables sharing a bucket spec
  * must join with ZERO shuffle exchanges in the physical plan.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("join of co-bucketed tables has no shuffle exchange") {
    import spark.implicits._
    val facts = (1L to 10000L).map(i => (i % 500, i, i * 2.0)).toDF("k", "id", "v")
    val dims = (0L until 500L).map(i => (i, s"name$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "b_facts", 8, Seq("k"))
    Bucketing.writeBucketed(dims, "b_dims", 8, Seq("k"))
    // disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.readTable(spark, "b_facts")
        .join(Bucketing.readTable(spark, "b_dims"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(joined.count() == 10000L)
      // and the same join on the unbucketed frames DOES shuffle
      val unbucketed = facts.join(dims, Seq("k"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("bucketed groupBy on the bucket key avoids the aggregation shuffle") {
    import spark.implicits._
    val facts = (1L to 1000L).map(i => (i % 50, i)).toDF("k", "id")
    Bucketing.writeBucketed(facts, "b_agg", 4, Seq("k"))
    try {
      val agg = Bucketing.readTable(spark, "b_agg").groupBy("k").agg(sum("id"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
      assert(agg.count() == 50L)
    } finally spark.sql("DROP TABLE IF EXISTS b_agg")
  }
}
