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
    // H2 as a typed Aggregator (SURVEY §2.11): per-(custkey,status)
    // priority histograms, then bucket-wise max across statuses via
    // MergeMaxAggregator — associative, so partial aggregation applies.
    "h8_mergemax_agg" -> ((s, dir) => {
      import s.implicits._
      val udafMax = udaf(new graft.operators.Aggregators.MergeMaxAggregator)
      val per = HistogramFunctions.buildHistogram(
        Catalog.orders(s, dir)
          .groupBy(col("o_custkey").as("k"), col("o_orderstatus").as("st"),
            col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("k", "st"))
      per.groupBy(col("k"))
        .agg(udafMax(col("buckets")).as("maxb"), count(lit(1)).as("n_statuses"))
        .select(col("k"), col("n_statuses"), explode(col("maxb")).as(Seq("bucket", "maxfreq")))
        .select(col("k"), col("n_statuses"), col("bucket"), round(col("maxfreq"), 6).as("maxfreq"))
        .orderBy(col("k"), col("bucket"))
    }),

    // O2 as a bounded typed Aggregator (SURVEY §7.4 risk 2): top-3 order
    // keys per customer by price, O(k) memory per group however hot the
    // key gets.
    "o3_topk_agg" -> ((s, dir) => {
      import s.implicits._
      val udafTop = udaf(new graft.operators.Aggregators.TopKAggregator(3))
      Catalog.orders(s, dir)
        .select(col("o_custkey"),
          // sortKey = price in cents (round, then cast — a bare double→long
          // cast truncates in Spark but rounds in DuckDB)
          round(col("o_totalprice") * 100).cast("long").as("price_c"),
          col("o_orderkey").cast("string").as("ok"))
        .groupBy(col("o_custkey"))
        .agg(udafTop(col("price_c"), col("ok")).as("top"),
          count(lit(1)).as("n_orders"))
        .select(col("o_custkey"), concat_ws(",", col("top")).as("top_orders"), col("n_orders"))
        .orderBy(col("o_custkey"))
    }),

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

    // S7a: insert-if-absent (signature sink semantics,
    // HogSignature.scala:35-52): existing keys keep their exact row,
    // only new keys append. State = keys ≢0 mod 3 at v1; batch = even
    // keys at v2 → only even multiples of 3 arrive as v2.
    "s7_signature_upsert" -> ((s, dir) => {
      val c = Catalog.customer(s, dir)
      val state = c.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_name"), lit("v1").as("rev"))
      val updates = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), lit("v2").as("rev"))
      ProfileStore.insertIfAbsent(state, updates, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // SIG1: the seeded numeric signature catalog (HogSignature.scala:32,
    // seeded per detector at HogSFlow.scala:61-77 etc.) — seeding twice
    // must be a no-op (saveHBase only puts absent rowkeys), and a
    // pre-existing row must survive re-seeding with its exact values.
    "sig1_catalog" -> ((s, dir) => {
      import graft.detectors.SignatureCatalog
      val pre = SignatureCatalog.catalog(s)
        .filter(col("signature_id") === 826001001L)
        .withColumn("signature_revision", lit(7)) // operator-edited row
      val seeded = SignatureCatalog.seed(s, SignatureCatalog.seed(s, pre))
      seeded.orderBy(col("signature_id"), col("signature_name"))
    }),

    // S7b: last-write-wins upsert (inventory/sensor sink semantics,
    // HogHBaseInventory.scala:40-49): batch rows replace matching state
    // rows, unmatched state survives, replay is a no-op.
    "s7_inventory_upsert" -> ((s, dir) => {
      val c = Catalog.customer(s, dir)
      val state = c.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_name"), lit("v1").as("rev"))
      val updates = c.filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), col("c_name"), lit("v2").as("rev"))
      val once = ProfileStore.upsert(state, updates, Seq("c_custkey"))
      // replay the same batch: idempotence is part of the contract
      ProfileStore.upsert(once, updates, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
  )

  /** Expected catalog after sig1's double seed: the operator-edited
    * 826001001 row (revision 7) survives re-seeding; everything else is
    * the declared catalog verbatim.
    */
  private def sig1OracleSql: String = {
    val rows = graft.detectors.SignatureCatalog.all.map { s =>
      val rev = if (s.signature_id == 826001001L) 7 else s.signature_revision
      s"(${s.signature_id}, ${s.signature_class}, '${s.signature_name}', " +
        s"${s.signature_priority}, $rev, ${s.signature_group_id})"
    }.mkString(",\n")
    s"""SELECT CAST(signature_id AS BIGINT) AS signature_id,
       |  CAST(signature_class AS INT) AS signature_class, signature_name,
       |  CAST(signature_priority AS INT) AS signature_priority,
       |  CAST(signature_revision AS INT) AS signature_revision,
       |  CAST(signature_group_id AS INT) AS signature_group_id
       |FROM (VALUES
       |$rows) AS t(signature_id, signature_class, signature_name,
       |  signature_priority, signature_revision, signature_group_id)
       |ORDER BY signature_id, signature_name""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sig1_catalog" -> sig1OracleSql,

    "s7_signature_upsert" ->
      """WITH state AS (
        |  SELECT c_custkey, c_name, 'v1' AS rev FROM customer WHERE c_custkey % 3 <> 0),
        |upd AS (
        |  SELECT c_custkey, c_name, 'v2' AS rev FROM customer WHERE c_custkey % 2 = 0)
        |SELECT * FROM state
        |UNION ALL
        |SELECT * FROM upd WHERE c_custkey NOT IN (SELECT c_custkey FROM state)
        |ORDER BY c_custkey""".stripMargin,

    "s7_inventory_upsert" ->
      """WITH state AS (
        |  SELECT c_custkey, c_name, 'v1' AS rev FROM customer WHERE c_custkey % 3 <> 0),
        |upd AS (
        |  SELECT c_custkey, c_name, 'v2' AS rev FROM customer WHERE c_custkey % 2 = 0)
        |SELECT * FROM upd
        |UNION ALL
        |SELECT * FROM state WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        |ORDER BY c_custkey""".stripMargin,

    "h8_mergemax_agg" ->
      """WITH per AS (
        |  SELECT o_custkey AS k, o_orderstatus AS st, o_orderpriority AS bucket, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2, 3),
        |perh AS (
        |  SELECT k, st, bucket, CAST(cnt AS DOUBLE)/SUM(cnt) OVER (PARTITION BY k, st) AS freq
        |  FROM per),
        |ns AS (SELECT k, COUNT(DISTINCT st) AS n_statuses FROM per GROUP BY k)
        |SELECT p.k, ns.n_statuses, p.bucket, ROUND(MAX(p.freq), 6) AS maxfreq
        |FROM perh p JOIN ns ON p.k = ns.k
        |GROUP BY p.k, ns.n_statuses, p.bucket
        |ORDER BY p.k, p.bucket""".stripMargin,

    "o3_topk_agg" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC,
        |               CAST(o_orderkey AS VARCHAR)) AS rn
        |  FROM orders),
        |n AS (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY 1)
        |SELECT r.o_custkey,
        |  string_agg(CAST(r.o_orderkey AS VARCHAR), ',' ORDER BY r.rn) AS top_orders,
        |  ANY_VALUE(n.n_orders) AS n_orders
        |FROM ranked r JOIN n ON r.o_custkey = n.o_custkey
        |WHERE r.rn <= 3
        |GROUP BY r.o_custkey
        |ORDER BY r.o_custkey""".stripMargin,

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
