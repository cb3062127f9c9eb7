package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Catalog
import graft.functions.HistogramFunctions
import graft.functions.HistogramFunctions._
import graft.operators.ProfileStore

/** Oracle coverage for the round-3 profile families (HIST05-08 +
  * HIST02.1, HogSFlow.scala:1644-1722, 1950-2113, 2403-2640): every
  * operator composition the profile-relative detectors use —
  * gated per-network profile update, mergeMax count profiles, snapshot
  * overwrite, learned-max deviation, no-typical-at-or-above port-count
  * test, and the three-gate leave-one-out + conditional confirm — run
  * over the TPC-H fixtures so DuckDB can hash-check the math.
  */
object ProfileQueries {

  type Q = (SparkSession, String) => DataFrame

  private def period(cur: Boolean) =
    if (cur) col("o_orderdate") >= lit("1996-01-01").cast(TimestampType)
    else col("o_orderdate") < lit("1996-01-01").cast(TimestampType)

  /** HIST05-shaped build: per "network" (custkey), priority histogram over
    * rows, only for networks with >4 distinct "hosts" (orderkeys) — the
    * eligibility gate of HogSFlow.scala:1998-2001.
    */
  private def gatedNetHist(s: SparkSession, dir: String, cur: Boolean): DataFrame = {
    val rows = Catalog.orders(s, dir).filter(period(cur))
    val eligible = rows.groupBy("o_custkey")
      .agg(countDistinct("o_orderkey").as("h"))
      .filter(col("h") > 4).select("o_custkey")
    buildHistogram(
      rows.join(eligible, Seq("o_custkey"), "left_semi")
        .groupBy(col("o_custkey").as("name"), col("o_orderpriority").as("bucket"))
        .agg(count(lit(1)).as("cnt")),
      Seq("name"))
  }

  val queries: Map[String, Q] = Map(
    // H9: the HIST05 learn cycle — gated per-network histograms from the
    // current window merged into the saved profiles (decayed weighted
    // mean), exactly the ProfileStore.update the batch runs.
    "h9_hist05_update" -> ((s, dir) => {
      ProfileStore.update(
        gatedNetHist(s, dir, cur = false),
        gatedNetHist(s, dir, cur = true))
        .select(col("name"), col("size"),
          explode(col("buckets")).as(Seq("bucket", "freq")))
        .select(col("name"), col("size"), col("bucket"), round(col("freq"), 6).as("freq"))
        .orderBy(col("name"), col("bucket"))
    }),

    // H10: the HIST07 learn cycle — count-valued per-key maps (distinct
    // partners per bucket) merged bucket-wise-max (Histograms.scala:141-168),
    // size = s1+s2.
    "h10_hist07_mergemax" -> ((s, dir) => {
      def half(cur: Boolean) = buildCountMap(
        Catalog.lineitem(s, dir).filter(
          if (cur) col("l_shipdate") >= lit("1998-01-01").cast(TimestampType)
          else col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
          .groupBy((col("l_suppkey") % 15).as("name"), col("l_returnflag").as("bucket"))
          .agg(countDistinct("l_partkey").as("cnt")),
        Seq("name"))
      ProfileStore.updateMax(half(cur = false), half(cur = true))
        .select(col("name"), col("size"),
          explode(col("buckets")).as(Seq("bucket", "maxcnt")))
        .select(col("name"), col("size"), col("bucket"), col("maxcnt").cast("long").as("maxcnt"))
        .orderBy(col("name"), col("bucket"))
    }),

    // H11: the HIST02.1 snapshot overwrite (HogSFlow.scala:1722) — keys
    // seen this window replace their snapshot wholesale, unseen keys keep
    // the previous one. State keys 0..11, batch keys 3..14.
    "h11_hist_snapshot" -> ((s, dir) => {
      def hist(cur: Boolean, lo: Int, hi: Int) = buildHistogram(
        Catalog.orders(s, dir)
          .filter(period(cur) && (col("o_custkey") % 15).between(lo, hi))
          .groupBy((col("o_custkey") % 15).cast(StringType).as("name"),
            col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("name"))
      ProfileStore.snapshot(hist(cur = false, 0, 11), hist(cur = true, 3, 14))
        .select(col("name"), col("size"),
          explode(col("buckets")).as(Seq("bucket", "freq")))
        .select(col("name"), col("size"), col("bucket"), round(col("freq"), 6).as("freq"))
        .orderBy(col("name"), col("bucket"))
    }),

    // DET1: hPortScan's learned-max deviation rule (HogSFlow.scala:2495-2505):
    // a (key, bucket) fires when the mature count-profile has never seen
    // the bucket, or saw it with a smaller count than this window's.
    "det1_hportscan_profile" -> ((s, dir) => {
      val li = Catalog.lineitem(s, dir)
      def side(cur: Boolean) = li.filter(
        if (cur) col("l_shipdate") >= lit("1998-01-01").cast(TimestampType)
        else col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      val prof = buildCountMap(
        side(cur = false)
          .groupBy((col("l_suppkey") % 20).as("name"),
            col("l_linenumber").cast(StringType).as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("name"))
        .withColumnRenamed("size", "psize").withColumnRenamed("buckets", "pbuckets")
      side(cur = true)
        .groupBy((col("l_suppkey") % 20).as("name"),
          col("l_linenumber").cast(StringType).as("bucket"))
        .agg(count(lit(1)).as("pairs"))
        .filter(col("pairs") > 50)
        .join(prof, Seq("name"))
        .filter(col("psize") >= 100)
        .filter(element_at(col("pbuckets"), col("bucket")).isNull ||
          element_at(col("pbuckets"), col("bucket")) < col("pairs").cast("double"))
        .select(col("name"), col("bucket"), col("pairs"),
          coalesce(element_at(col("pbuckets"), col("bucket")), lit(-1.0))
            .cast("long").as("learned"))
        .orderBy(col("name"), col("bucket"))
    }),

    // DET2: vPortScan's port-count profile rule (HogSFlow.scala:2614-2620):
    // fire when no typical profile bucket sits at or above this window's
    // distinct count. Profile observations = per-month distinct priorities.
    "det2_vportscan_profile" -> ((s, dir) => {
      val o = Catalog.orders(s, dir)
      val profPeriod = col("o_orderdate") < lit("1999-01-01").cast(TimestampType)
      val prof = buildHistogram(
        o.filter(profPeriod)
          .groupBy((col("o_custkey") % 100).as("name"),
            date_format(col("o_orderdate"), "yyyy-MM").as("m"))
          .agg(countDistinct("o_orderpriority").as("n"))
          .groupBy(col("name"), col("n").cast(StringType).as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("name"))
        .withColumnRenamed("size", "psize").withColumnRenamed("buckets", "pbuckets")
      o.filter(!profPeriod)
        .groupBy((col("o_custkey") % 100).as("name"))
        .agg(countDistinct("o_orderpriority").as("n_ports"))
        .join(prof, Seq("name"))
        .filter(col("psize") >= 6)
        .filter(size(map_filter(col("pbuckets"), (k, v) =>
          k.cast("long") >= col("n_ports") &&
            v > HistogramFunctions.AtypicalThreshold)) === 0)
        .select(col("name"), col("n_ports"))
        .orderBy(col("name"))
    }),

    // DET3: the atypicalAlienPorts three-gate rule (HogSFlow.scala:1644-1681):
    // atypical vs the long-run profile (period A), typical vs the
    // last-window snapshot (period B), and confirmed by the "alien side"
    // profile (per-clerk histogram over period A, mature ≥21) also calling
    // the bucket atypical.
    "det3_snapshot_confirm" -> ((s, dir) => {
      val li = Catalog.lineitem(s, dir)
      val splitA = col("l_shipdate") < lit("1997-01-01").cast(TimestampType)
      val splitB = col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1999-01-01").cast(TimestampType)
      val splitC = col("l_shipdate") >= lit("1999-01-01").cast(TimestampType)
      val bucketed = li.select((col("l_suppkey") % 50).as("name"),
        (col("l_partkey") % 200).cast(StringType).as("bucket"),
        (col("l_orderkey") % 35).as("alien"), col("l_shipdate"))
      def hist(f: org.apache.spark.sql.Column) = buildHistogram(
        bucketed.filter(f).groupBy("name", "bucket").agg(count(lit(1)).as("cnt")),
        Seq("name"))
      val profA = hist(splitA)
        .withColumnRenamed("size", "psize").withColumnRenamed("buckets", "pbuckets")
      val snapB = hist(splitB)
        .withColumnRenamed("size", "ssize").withColumnRenamed("buckets", "sbuckets")
      val curC = hist(splitC)
      val alienProf = buildHistogram(
        bucketed.filter(splitA)
          .groupBy(col("alien").as("ck"), col("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("ck"))
        .withColumnRenamed("size", "csize").withColumnRenamed("buckets", "cbuckets")
      val candidates = curC
        .join(profA, Seq("name")).filter(col("psize") >= 100)
        .join(snapB, Seq("name")).filter(col("ssize") > 0)
        .select(col("name"), explode(array_intersect(
          atypicalKeys(col("pbuckets"), col("buckets")),
          typicalKeys(col("sbuckets"), col("buckets")))).as("bucket"))
      val confirming = bucketed.filter(splitC)
        .join(candidates, Seq("name", "bucket"), "left_semi")
        .join(alienProf, col("alien") === col("ck"))
        .filter(col("csize") >= 21 &&
          !isTypicalEvent(col("cbuckets"), col("bucket")))
        .select("name", "bucket")
      candidates.join(confirming, Seq("name", "bucket"), "left_semi")
        .orderBy(col("name"), col("bucket"))
    }),

    // DET4: the per-alert rendered flow payload (HogSFlow.scala:662-713) —
    // top-5 flows per host by two-way bytes, humanBytes + direction arrows,
    // newline-joined in rank order. lineitem rows stand in for a flow
    // summary; alien_port is globally unique so the sort is a total order
    // in both engines.
    "det4_alert_flow_detail" -> ((s, dir) => {
      val summary = Catalog.lineitem(s, dir).select(
        concat(lit("h"), (col("l_suppkey") % 20).cast(StringType)).as("my_ip"),
        col("l_linenumber").cast(StringType).as("my_port"),
        concat(lit("a"), (col("l_partkey") % 50).cast(StringType)).as("alien_ip"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast(StringType).as("alien_port"),
        col("l_returnflag").as("proto"),
        floor(col("l_extendedprice")).cast("long").as("bytes_up"),
        floor(col("l_quantity")).cast("long").multiply(100).as("bytes_down"),
        floor(col("l_quantity")).cast("long").as("n_pkts"),
        (col("l_suppkey") % 3 - 1).as("direction"),
        lit(0L).as("t_min"),
        (col("l_orderkey") % 500).cast("long").as("t_max"),
        lit(2.0).as("sample_rate"),
        (col("l_linenumber") % 4 === 0).cast("long").as("status"))
      graft.detectors.Detectors.flowDetail(summary, summary, "my_ip", limit = 5)
        .orderBy(col("my_ip"))
    }),
  )

  /** humanBytes in DuckDB SQL (same thresholds as NetFunctions.humanBytes). */
  private def hbSql(x: String): String =
    s"""CASE WHEN $x < 1024 THEN CAST(CAST(floor($x) AS BIGINT) AS VARCHAR) || 'B'
       |     WHEN $x < 1048576 THEN printf('%.1fKB', ($x) / 1024.0)
       |     WHEN $x < 1073741824 THEN printf('%.1fMB', ($x) / 1048576.0)
       |     ELSE printf('%.1fGB', ($x) / 1073741824.0) END""".stripMargin

  val oracles: Map[String, String] = Map(
    "det4_alert_flow_detail" ->
      s"""WITH s AS (
        |  SELECT 'h' || CAST(l_suppkey % 20 AS VARCHAR) AS my_ip,
        |    CAST(l_linenumber AS VARCHAR) AS my_port,
        |    'a' || CAST(l_partkey % 50 AS VARCHAR) AS alien_ip,
        |    CAST(l_orderkey * 10 + l_linenumber AS VARCHAR) AS alien_port,
        |    l_returnflag AS proto,
        |    CAST(floor(l_extendedprice) AS BIGINT) AS bytes_up,
        |    CAST(floor(l_quantity) AS BIGINT) * 100 AS bytes_down,
        |    CAST(floor(l_quantity) AS BIGINT) AS n_pkts,
        |    l_suppkey % 3 - 1 AS direction,
        |    CAST(l_orderkey % 500 AS BIGINT) AS duration,
        |    CASE WHEN l_linenumber % 4 = 0 THEN 1 ELSE 0 END AS status
        |  FROM lineitem),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY my_ip
        |      ORDER BY bytes_up + bytes_down DESC, alien_ip, alien_port, my_ip, my_port) AS rn
        |  FROM s),
        |k AS (SELECT * FROM r WHERE rn <= 5),
        |ln AS (
        |  SELECT my_ip, rn,
        |    my_ip || ':' || my_port ||
        |    CASE WHEN direction > 0 THEN ' => ' WHEN direction < 0 THEN ' <= '
        |         ELSE ' <?> ' END ||
        |    alien_ip || ':' || alien_port ||
        |    CASE WHEN status > 0 THEN ' [!]' ELSE '' END ||
        |    ' (' || proto || ', ' ||
        |    CASE WHEN direction > 0
        |           THEN 'Up: ' || ${hbSql("bytes_up * 2.0")} || ', Down: ' || ${hbSql("bytes_down * 2.0")}
        |         WHEN direction < 0
        |           THEN 'Down: ' || ${hbSql("bytes_up * 2.0")} || ', Up: ' || ${hbSql("bytes_down * 2.0")}
        |         ELSE 'L-to-R: ' || ${hbSql("bytes_up * 2.0")} || ', R-to-L: ' || ${hbSql("bytes_down * 2.0")} END ||
        |    ', ' || CAST(n_pkts AS VARCHAR) || ' pkts, duration: ' ||
        |    CAST(duration AS VARCHAR) || 's, sampling: 1/2)' AS line
        |  FROM k)
        |SELECT my_ip, string_agg(line, chr(10) ORDER BY rn) AS flows_detail
        |FROM ln GROUP BY my_ip ORDER BY my_ip""".stripMargin,

    "h9_hist05_update" ->
      """WITH profr AS (
        |  SELECT o_custkey AS name, o_orderpriority AS bucket, o_orderkey
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'),
        |profg AS (SELECT name FROM profr GROUP BY name HAVING COUNT(DISTINCT o_orderkey) > 4),
        |profc AS (
        |  SELECT name, bucket, COUNT(*) AS cnt FROM profr
        |  WHERE name IN (SELECT name FROM profg) GROUP BY 1, 2),
        |profh AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq,
        |                 SUM(cnt) OVER (PARTITION BY name) AS size FROM profc),
        |curr AS (
        |  SELECT o_custkey AS name, o_orderpriority AS bucket, o_orderkey
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
        |curg AS (SELECT name FROM curr GROUP BY name HAVING COUNT(DISTINCT o_orderkey) > 4),
        |curc AS (
        |  SELECT name, bucket, COUNT(*) AS cnt FROM curr
        |  WHERE name IN (SELECT name FROM curg) GROUP BY 1, 2),
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

    "h10_hist07_mergemax" ->
      """WITH a AS (
        |  SELECT l_suppkey % 15 AS name, l_returnflag AS bucket, COUNT(DISTINCT l_partkey) AS cnt
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2),
        |asz AS (SELECT name, SUM(cnt) AS s1 FROM a GROUP BY 1),
        |b AS (
        |  SELECT l_suppkey % 15 AS name, l_returnflag AS bucket, COUNT(DISTINCT l_partkey) AS cnt
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1, 2),
        |bsz AS (SELECT name, SUM(cnt) AS s2 FROM b GROUP BY 1),
        |sizes AS (
        |  SELECT coalesce(asz.name, bsz.name) AS name,
        |         coalesce(s1, 0) + coalesce(s2, 0) AS size
        |  FROM asz FULL OUTER JOIN bsz ON asz.name = bsz.name),
        |allb AS (SELECT name, bucket FROM a UNION SELECT name, bucket FROM b)
        |SELECT u.name, CAST(sz.size AS BIGINT) AS size, u.bucket,
        |  CAST(greatest(coalesce(p.cnt, 0), coalesce(q.cnt, 0)) AS BIGINT) AS maxcnt
        |FROM allb u
        |JOIN sizes sz USING (name)
        |LEFT JOIN a p ON u.name = p.name AND u.bucket = p.bucket
        |LEFT JOIN b q ON u.name = q.name AND u.bucket = q.bucket
        |ORDER BY u.name, u.bucket""".stripMargin,

    "h11_hist_snapshot" ->
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
        |                SUM(cnt) OVER (PARTITION BY name) AS size FROM curc)
        |SELECT name, CAST(size AS BIGINT) AS size, bucket, ROUND(freq, 6) AS freq FROM curh
        |UNION ALL
        |SELECT name, CAST(size AS BIGINT) AS size, bucket, ROUND(freq, 6) AS freq FROM profh
        |WHERE name NOT IN (SELECT DISTINCT name FROM curh)
        |ORDER BY name, bucket""".stripMargin,

    "det1_hportscan_profile" ->
      """WITH prof AS (
        |  SELECT l_suppkey % 20 AS name, CAST(l_linenumber AS VARCHAR) AS bucket, COUNT(*) AS cnt
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2),
        |psz AS (SELECT name, SUM(cnt) AS psize FROM prof GROUP BY 1),
        |cur AS (
        |  SELECT l_suppkey % 20 AS name, CAST(l_linenumber AS VARCHAR) AS bucket, COUNT(*) AS pairs
        |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1998-01-01' GROUP BY 1, 2
        |  HAVING COUNT(*) > 50)
        |SELECT c.name, c.bucket, c.pairs, CAST(coalesce(p.cnt, -1) AS BIGINT) AS learned
        |FROM cur c
        |JOIN psz ON c.name = psz.name
        |LEFT JOIN prof p ON c.name = p.name AND c.bucket = p.bucket
        |WHERE psz.psize >= 100 AND (p.cnt IS NULL OR p.cnt < c.pairs)
        |ORDER BY c.name, c.bucket""".stripMargin,

    "det2_vportscan_profile" ->
      """WITH pm AS (
        |  SELECT o_custkey % 100 AS name, strftime(o_orderdate, '%Y-%m') AS m,
        |         COUNT(DISTINCT o_orderpriority) AS n
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01' GROUP BY 1, 2),
        |ph AS (SELECT name, CAST(n AS VARCHAR) AS bucket, COUNT(*) AS cnt FROM pm GROUP BY 1, 2),
        |psz AS (SELECT name, SUM(cnt) AS psize FROM ph GROUP BY 1),
        |phf AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq FROM ph),
        |cur AS (
        |  SELECT o_custkey % 100 AS name, COUNT(DISTINCT o_orderpriority) AS n_ports
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01' GROUP BY 1)
        |SELECT c.name, c.n_ports
        |FROM cur c JOIN psz ON c.name = psz.name
        |WHERE psz.psize >= 6
        |  AND NOT EXISTS (
        |    SELECT 1 FROM phf p
        |    WHERE p.name = c.name AND CAST(p.bucket AS BIGINT) >= c.n_ports AND p.freq > 1e-7)
        |ORDER BY c.name""".stripMargin,

    "det3_snapshot_confirm" ->
      """WITH bucketed AS (
        |  SELECT l_suppkey % 50 AS name, CAST(l_partkey % 200 AS VARCHAR) AS bucket,
        |         l_orderkey % 35 AS alien, l_shipdate
        |  FROM lineitem),
        |a AS (SELECT name, bucket, COUNT(*) AS cnt FROM bucketed
        |      WHERE l_shipdate < TIMESTAMP '1997-01-01' GROUP BY 1, 2),
        |af AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq,
        |              SUM(cnt) OVER (PARTITION BY name) AS size FROM a),
        |b AS (SELECT name, bucket, COUNT(*) AS cnt FROM bucketed
        |      WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1999-01-01'
        |      GROUP BY 1, 2),
        |bf AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq FROM b),
        |c AS (SELECT name, bucket, COUNT(*) AS cnt FROM bucketed
        |      WHERE l_shipdate >= TIMESTAMP '1999-01-01' GROUP BY 1, 2),
        |cf AS (SELECT name, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY name) AS freq FROM c),
        |alienp AS (SELECT alien AS ck, bucket, COUNT(*) AS cnt FROM bucketed
        |           WHERE l_shipdate < TIMESTAMP '1997-01-01' GROUP BY 1, 2),
        |alienf AS (SELECT ck, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY ck) AS freq,
        |                  SUM(cnt) OVER (PARTITION BY ck) AS size FROM alienp),
        |cand AS (
        |  SELECT cf.name, cf.bucket FROM cf
        |  WHERE cf.freq > 1e-7
        |    AND EXISTS (SELECT 1 FROM af WHERE af.name = cf.name AND af.size >= 100)
        |    AND NOT EXISTS (SELECT 1 FROM af
        |                    WHERE af.name = cf.name AND af.bucket = cf.bucket AND af.freq > 1e-7)
        |    AND EXISTS (SELECT 1 FROM bf
        |                WHERE bf.name = cf.name AND bf.bucket = cf.bucket AND bf.freq > 1e-7))
        |SELECT name, bucket FROM cand
        |WHERE EXISTS (
        |  SELECT 1 FROM bucketed o
        |  WHERE o.name = cand.name AND o.bucket = cand.bucket
        |    AND o.l_shipdate >= TIMESTAMP '1999-01-01'
        |    AND EXISTS (SELECT 1 FROM alienf sz
        |                WHERE sz.ck = o.alien AND sz.size >= 21)
        |    AND NOT EXISTS (SELECT 1 FROM alienf p
        |                    WHERE p.ck = o.alien AND p.bucket = cand.bucket AND p.freq > 1e-7))
        |ORDER BY name, bucket""".stripMargin,
  )
}
