package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Catalog
import graft.functions.HistogramFunctions
import graft.operators.ProfileStore

/** S6 — the profile-state read-modify-write cycle as an oracle query:
  * the saved state (period A histograms) full-outer-merges with the
  * current batch (period B histograms) through ProfileStore.update —
  * state-only keys pass through, batch-only keys are born, overlapping
  * keys get the decayed weighted merge. This is the batch-idiomatic
  * rewrite of the reference's per-key HBase upsert loop
  * (HogHBaseHistogram.scala:106-136; SURVEY §7.4 risk 1).
  */
object StateQueries {

  type Q = (SparkSession, String) => DataFrame

  /** (name, size, buckets) histograms for one period/key-range. */
  private def hist(s: SparkSession, dir: String, cur: Boolean, lo: Int, hi: Int): DataFrame = {
    val o = Catalog.orders(s, dir)
    val f = if (cur) col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
            else col("o_orderdate") < lit("1996-01-01").cast(TimestampType)
    HistogramFunctions.buildHistogram(
      o.filter(f && (col("o_custkey") % 15).between(lo, hi))
        .groupBy((col("o_custkey") % 15).cast(StringType).as("name"),
          col("o_orderpriority").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Seq("name"))
  }

  val queries: Map[String, Q] = Map(
    // state keys 0..11, batch keys 3..14: exercises pass-through (0..2),
    // birth (12..14), and decayed merge (3..11) in one update.
    "s6_profile_update" -> ((s, dir) => {
      val state = hist(s, dir, cur = false, 0, 11)
      val batch = hist(s, dir, cur = true, 3, 14)
      ProfileStore.update(state, batch)
        .select(col("name"), col("size"),
          explode(col("buckets")).as(Seq("bucket", "freq")))
        .select(col("name"), col("size"), col("bucket"), round(col("freq"), 6).as("freq"))
        .orderBy(col("name"), col("bucket"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "s6_profile_update" ->
      """WITH profc AS (
        |  SELECT CAST(o_custkey % 15 AS VARCHAR) AS name, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' AND (o_custkey % 15) BETWEEN 0 AND 11
        |  GROUP BY 1, 2),
        |profh AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq,
        |                 SUM(cnt) OVER (PARTITION BY name) AS size FROM profc),
        |curc AS (
        |  SELECT CAST(o_custkey % 15 AS VARCHAR) AS name, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND (o_custkey % 15) BETWEEN 3 AND 14
        |  GROUP BY 1, 2),
        |curh AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq,
        |                SUM(cnt) OVER (PARTITION BY name) AS size FROM curc),
        |sizes AS (
        |  SELECT coalesce(p.name, c.name) AS name, p.size AS s1, c.size AS s2
        |  FROM (SELECT DISTINCT name, size FROM profh) p
        |  FULL OUTER JOIN (SELECT DISTINCT name, size FROM curh) c ON p.name = c.name),
        |allb AS (
        |  SELECT name, bucket FROM profh UNION SELECT name, bucket FROM curh)
        |SELECT b.name,
        |  CAST(CASE WHEN s1 IS NULL THEN s2 WHEN s2 IS NULL THEN s1
        |       WHEN s1 > 1000 THEN s1 // 2 + s2 ELSE s1 + s2 END AS BIGINT) AS size,
        |  b.bucket,
        |  ROUND(CASE
        |    WHEN s1 IS NULL THEN c.freq
        |    WHEN s2 IS NULL THEN p.freq
        |    ELSE (coalesce(p.freq, 0) * s1 / (CASE WHEN s1 > 1000 THEN 2.0 ELSE 1.0 END)
        |          + coalesce(c.freq, 0) * s2)
        |         / (s1 / (CASE WHEN s1 > 1000 THEN 2.0 ELSE 1.0 END) + s2)
        |  END, 6) AS freq
        |FROM allb b
        |JOIN sizes USING (name)
        |LEFT JOIN profh p ON b.name = p.name AND b.bucket = p.bucket
        |LEFT JOIN curh c ON b.name = c.name AND b.bucket = c.bucket
        |ORDER BY b.name, b.bucket""".stripMargin,
  )
}
