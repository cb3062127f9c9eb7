package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Catalog
import graft.functions.HistogramFunctions._

/** SURVEY §2.5 — the histogram algebra (the reference's statistical heart,
  * Histograms.scala) exercised through [[graft.functions.HistogramFunctions]]
  * and flattened back to rows so DuckDB can oracle-check the math.
  *
  * Profile period = orders before 1996-01-01; current period = the rest.
  * Histogram key = o_custkey % 10 (or o_custkey), buckets = o_orderpriority.
  */
object HistogramQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Long-form (k, bucket, cnt) counts for one period. */
  private def periodCounts(s: SparkSession, dir: String, cur: Boolean, keyExpr: String): DataFrame = {
    val o = Catalog.orders(s, dir)
    val f = if (cur) col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
            else col("o_orderdate") < lit("1996-01-01").cast(TimestampType)
    o.filter(f)
      .withColumn("k", expr(keyExpr))
      .groupBy(col("k"), col("o_orderpriority").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** (k, size, buckets) histogram per key for one period. */
  private def periodHist(s: SparkSession, dir: String, cur: Boolean, keyExpr: String): DataFrame =
    buildHistogram(periodCounts(s, dir, cur, keyExpr), Seq("k"))

  val queries: Map[String, Q] = Map(
    // H1: decayed weighted-mean merge (Histograms.scala:103-138) — profile
    // merged with the current window, exploded to (k, bucket, freq).
    "h1_merge_decay" -> ((s, dir) => {
      val prof = periodHist(s, dir, cur = false, "o_custkey % 10")
        .withColumnRenamed("size", "s1").withColumnRenamed("buckets", "b1")
      val cur = periodHist(s, dir, cur = true, "o_custkey % 10")
        .withColumnRenamed("size", "s2").withColumnRenamed("buckets", "b2")
      prof.join(cur, Seq("k"))
        .select(col("k"),
          mergedSize(col("s1"), col("s2")).as("new_size"),
          explode(mergeBuckets(col("s1"), col("b1"), col("s2"), col("b2"))).as(Seq("bucket", "freq")))
        .select(col("k"), col("bucket"), round(col("freq"), 6).as("freq"), col("new_size"))
        .orderBy(col("k"), col("bucket"))
    }),

    // H2: bucket-wise max (Histograms.scala:141-168), per customer across
    // an even/odd orderkey split.
    "h2_mergemax" -> ((s, dir) => {
      val o = Catalog.orders(s, dir)
      def half(even: Boolean) = buildHistogram(
        o.filter((col("o_orderkey") % 2 === 0) === even)
          .groupBy(col("o_custkey").as("k"), col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("k"))
      val a = half(true).withColumnRenamed("size", "s1").withColumnRenamed("buckets", "b1")
      val b = half(false).withColumnRenamed("size", "s2").withColumnRenamed("buckets", "b2")
      a.join(b, Seq("k"))
        .select(col("k"), (col("s1") + col("s2")).as("new_size"),
          explode(mergeMaxBuckets(col("b1"), col("b2"))).as(Seq("bucket", "maxfreq")))
        .select(col("k"), col("bucket"), round(col("maxfreq"), 6).as("maxfreq"), col("new_size"))
        .orderBy(col("k"), col("bucket"))
    }),

    // H4: Kullback-Liebler divergence of each customer's priority mix vs the
    // global mix (Histograms.scala:18-36; computed-but-unused in reference).
    "h4_kl_divergence" -> ((s, dir) => {
      val o = Catalog.orders(s, dir)
      val per = buildHistogram(
        o.groupBy(col("o_custkey").as("k"), col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")), Seq("k"))
      val glob = buildHistogram(
        o.groupBy(lit(1).as("g"), col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")), Seq("g"))
        .select(col("buckets").as("gbuckets"))
      per.crossJoin(broadcast(glob))
        .select(col("k"), round(kullbackLiebler(col("buckets"), col("gbuckets")), 6).as("kl"))
        .orderBy(col("k"))
    }),

    // H5: atypical keys — buckets seen now, unseen in the profile
    // (Histograms.scala:39-59; the core alerting primitive).
    "h5_atypical_keys" -> ((s, dir) => {
      val prof = periodHist(s, dir, cur = false, "o_custkey")
        .withColumnRenamed("buckets", "b1").drop("size")
      val cur = periodHist(s, dir, cur = true, "o_custkey")
        .withColumnRenamed("buckets", "b2").drop("size")
      prof.join(cur, Seq("k"))
        .select(col("k"), explode(atypicalKeys(col("b1"), col("b2"))).as("bucket"))
        .orderBy(col("k"), col("bucket"))
    }),

    // H6: per-event typicality test (isTypicalEvent, Histograms.scala:85-100).
    "h6_typical_flag" -> ((s, dir) => {
      val prof = periodHist(s, dir, cur = false, "o_custkey")
        .withColumnRenamed("buckets", "b1").drop("size")
      val curLong = periodCounts(s, dir, cur = true, "o_custkey")
      curLong.join(prof, Seq("k"))
        .select(col("k"), col("bucket"),
          when(isTypicalEvent(col("b1"), col("bucket")), 1L).otherwise(0L).as("is_typical"))
        .orderBy(col("k"), col("bucket"))
    }),

    // H12 (H3): histogram difference — un-merge the late window from the
    // all-time histogram, recovering the early-period distribution
    // ((b1·s1 − b2·s2)/(s1 − s2), Histograms.scala difference).
    "h12_hist_difference" -> ((s, dir) => {
      val all = buildHistogram(
        Catalog.orders(s, dir)
          .withColumn("k", expr("o_custkey % 10"))
          .groupBy(col("k"), col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")), Seq("k"))
      val late = periodHist(s, dir, cur = true, "o_custkey % 10")
      all.select(col("k"), col("size").as("s1"), col("buckets").as("b1"))
        .join(late.select(col("k"), col("size").as("s2"), col("buckets").as("b2")), Seq("k"))
        .select(col("k"), (col("s1") - col("s2")).as("new_size"),
          explode(differenceBuckets(col("s1"), col("b1"), col("s2"), col("b2")))
            .as(Seq("bucket", "freq")))
        .select(col("k"), col("new_size"), col("bucket"), round(col("freq"), 6).as("freq"))
        .orderBy(col("k"), col("bucket"))
    }),

    // H7: log-binning of a heavy-tailed measure (HogSFlow.scala:1791).
    "h7_logbin" -> ((s, dir) => {
      Catalog.orders(s, dir)
        .groupBy(logBin(col("o_totalprice")).as("bin"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "h12_hist_difference" ->
      """WITH allc AS (
        |  SELECT o_custkey % 10 AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |allh AS (
        |  SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |    SUM(cnt) OVER (PARTITION BY k) AS size FROM allc),
        |latec AS (
        |  SELECT o_custkey % 10 AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1, 2),
        |lateh AS (
        |  SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |    SUM(cnt) OVER (PARTITION BY k) AS size FROM latec),
        |sizes AS (
        |  SELECT a.k, a.size AS s1, l.size AS s2 FROM
        |    (SELECT DISTINCT k, size FROM allh) a
        |    JOIN (SELECT DISTINCT k, size FROM lateh) l USING (k))
        |SELECT a.k, CAST(s1 - s2 AS BIGINT) AS new_size, a.bucket,
        |  ROUND(CASE WHEN l.freq IS NOT NULL
        |    THEN (a.freq * CAST(s1 AS DOUBLE) - l.freq * CAST(s2 AS DOUBLE))
        |         / (CAST(s1 AS DOUBLE) - CAST(s2 AS DOUBLE))
        |    ELSE a.freq END, 6) AS freq
        |FROM allh a
        |JOIN sizes USING (k)
        |LEFT JOIN lateh l ON a.k = l.k AND a.bucket = l.bucket
        |ORDER BY a.k, a.bucket""".stripMargin,

    "h1_merge_decay" ->
      """WITH prof AS (
        |  SELECT o_custkey % 10 AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1,2),
        |profh AS (SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |                 SUM(cnt) OVER (PARTITION BY k) AS size FROM prof),
        |cur AS (
        |  SELECT o_custkey % 10 AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1,2),
        |curh AS (SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |                SUM(cnt) OVER (PARTITION BY k) AS size FROM cur),
        |sizes AS (
        |  SELECT p.k, p.size AS s1, c.size AS s2 FROM
        |    (SELECT DISTINCT k, size FROM profh) p JOIN (SELECT DISTINCT k, size FROM curh) c USING (k)),
        |buckets AS (
        |  SELECT k, bucket FROM profh UNION SELECT k, bucket FROM curh)
        |SELECT b.k, b.bucket,
        |  ROUND((coalesce(p.freq,0)*s1/(CASE WHEN s1>1000 THEN 2.0 ELSE 1.0 END) + coalesce(c.freq,0)*s2)
        |        /(s1/(CASE WHEN s1>1000 THEN 2.0 ELSE 1.0 END) + s2), 6) AS freq,
        |  CAST(CASE WHEN s1>1000 THEN s1//2 ELSE s1 END + s2 AS BIGINT) AS new_size
        |FROM buckets b
        |JOIN sizes USING (k)
        |LEFT JOIN profh p ON b.k=p.k AND b.bucket=p.bucket
        |LEFT JOIN curh c ON b.k=c.k AND b.bucket=c.bucket
        |ORDER BY b.k, b.bucket""".stripMargin,

    "h2_mergemax" ->
      """WITH a AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1,2),
        |ah AS (SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |              SUM(cnt) OVER (PARTITION BY k) AS size FROM a),
        |b AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderkey % 2 <> 0 GROUP BY 1,2),
        |bh AS (SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq,
        |              SUM(cnt) OVER (PARTITION BY k) AS size FROM b),
        |sizes AS (
        |  SELECT x.k, x.size AS s1, y.size AS s2 FROM
        |    (SELECT DISTINCT k, size FROM ah) x JOIN (SELECT DISTINCT k, size FROM bh) y USING (k)),
        |buckets AS (SELECT k, bucket FROM ah UNION SELECT k, bucket FROM bh)
        |SELECT u.k, u.bucket,
        |  ROUND(greatest(coalesce(p.freq,0), coalesce(q.freq,0)), 6) AS maxfreq,
        |  CAST(s1 + s2 AS BIGINT) AS new_size
        |FROM buckets u
        |JOIN sizes USING (k)
        |LEFT JOIN ah p ON u.k=p.k AND u.bucket=p.bucket
        |LEFT JOIN bh q ON u.k=q.k AND u.bucket=q.bucket
        |ORDER BY u.k, u.bucket""".stripMargin,

    "h4_kl_divergence" ->
      """WITH per AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt FROM orders GROUP BY 1,2),
        |perh AS (SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS p FROM per),
        |gl AS (
        |  SELECT o_orderpriority AS bucket, CAST(COUNT(*) AS DOUBLE)/(SELECT COUNT(*) FROM orders) AS q
        |  FROM orders GROUP BY 1)
        |SELECT k, ROUND(SUM(CASE WHEN p=0 OR q=0 THEN 0 ELSE p*ln(p/q) END), 6) AS kl
        |FROM perh JOIN gl USING (bucket)
        |GROUP BY k ORDER BY k""".stripMargin,

    // Bucket "presence" is the reference's 1e-7 relative-frequency test, not
    // plain existence — encoded here so the oracle stays valid even if a
    // key's observation count ever exceeds 1e7 (where cnt>=1 no longer
    // implies freq > 1e-7).
    "h5_atypical_keys" ->
      """WITH profc AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1,2),
        |prof AS (
        |  SELECT k, bucket FROM (
        |    SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq FROM profc)
        |  WHERE freq > 1e-7),
        |curc AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1,2),
        |cur AS (
        |  SELECT k, bucket FROM (
        |    SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq FROM curc)
        |  WHERE freq > 1e-7)
        |SELECT c.k, c.bucket FROM cur c
        |WHERE EXISTS (SELECT 1 FROM profc p WHERE p.k = c.k)
        |  AND NOT EXISTS (SELECT 1 FROM prof p WHERE p.k = c.k AND p.bucket = c.bucket)
        |ORDER BY c.k, c.bucket""".stripMargin,

    "h6_typical_flag" ->
      """WITH profc AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1,2),
        |prof AS (
        |  SELECT k, bucket FROM (
        |    SELECT k, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k) AS freq FROM profc)
        |  WHERE freq > 1e-7),
        |cur AS (
        |  SELECT o_custkey AS k, o_orderpriority AS bucket
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1,2)
        |SELECT c.k, c.bucket,
        |  CAST(CASE WHEN EXISTS (SELECT 1 FROM prof p WHERE p.k=c.k AND p.bucket=c.bucket)
        |       THEN 1 ELSE 0 END AS BIGINT) AS is_typical
        |FROM cur c
        |WHERE EXISTS (SELECT 1 FROM profc p WHERE p.k = c.k)
        |ORDER BY c.k, c.bucket""".stripMargin,

    "h7_logbin" ->
      """SELECT CAST(floor(ln(o_totalprice + 1)) AS BIGINT) AS bin, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY bin""".stripMargin,
  )
}
