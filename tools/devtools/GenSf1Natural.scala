package graft.tmp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Natural-distribution scale fixture generator (round-6 scale audit).
  *
  * The r5 10x fixture was a key-shifted clone replica of sf0.1 —
  * pathological for dedup BY DESIGN (every doc had 10 exact clones).
  * This tool draws every row FRESH from the same distributions the
  * driver's sf0.1 generator used (profiled via DuckDB: value grids,
  * category frequencies, date spans, doc-length/vocab/clone-rate,
  * embedding cluster dispersion), so dedup/ANN queries see a realistic
  * ~5% near-dup rate instead of 10-clone groups.
  *
  * All randomness is pure per-row hashing (xxhash64 of the row id and a
  * salt) — deterministic, partition-layout-independent, and fully
  * parallel; no RNG state crosses rows, so generation scales linearly.
  *
  *   tools/run.sh graft.tmp.GenSf1Natural <outDir> [scale=10]
  *
  * scale multiplies sf0.1's row counts (10 => lineitem 6M, orders 1.5M,
  * customer 150k, part 200k, supplier 10k, events 1M, documents 50k,
  * embeddings 20k; nation/region stay fixed dimension tables).
  */
object GenSf1Natural {

  /** optional table filter (set from main's 3rd arg) */
  private var tablesOnly: Option[Set[String]] = None

  /** document vocabulary mode (main's 4th arg): "natural" (default since
    * r12) draws from a ~4k-word Zipf-skewed vocabulary so 3-gram space
    * does NOT saturate (the r11 fixture's 31-word vocab covered ~86% of
    * trigram space, making every contamination/near-dup rate at 100×
    * measure fixture degeneracy, not gate behavior — VERDICT r11
    * missing #2); "degenerate" keeps the old 30-word draw as an explicit
    * saturated-regime stress fixture (the worst case for candidate-pair
    * generators, used by the fuzzy-decontamination stress run).
    */
  private var vocabMode: String = "natural"

  /** uniform [0,1) from (id, salt) — pure, no RNG state */
  private def u(id: org.apache.spark.sql.Column, salt: Int) =
    pmod(xxhash64(id, lit(salt)), lit(1000000000L)).cast("double") / 1e9

  /** integer in [0, n) */
  private def h(id: org.apache.spark.sql.Column, salt: Int, n: Int) =
    pmod(xxhash64(id, lit(salt)), lit(n.toLong)).cast("int")

  /** standard normal via Box-Muller from two hash uniforms */
  private def gauss(id: org.apache.spark.sql.Column, salt: Int) =
    sqrt(lit(-2.0) * log(u(id, salt) + lit(1e-12))) *
      cos(lit(2.0 * math.Pi) * u(id, salt + 7919))

  private def pick(id: org.apache.spark.sql.Column, salt: Int, vs: Seq[String]) =
    element_at(array(vs.map(lit): _*), h(id, salt, vs.size) + 1)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: GenSf1Natural <outDir> [scale] [tables] [natural|degenerate]")
    val outDir = args(0)
    val scale = if (args.length > 1) args(1).toInt else 10
    // optional comma-list of tables to emit (r10: the 400x probe block
    // only reads documents — generating 240M lineitem rows for it is
    // pure waste); "-" = all tables (so the vocab arg can be passed alone)
    tablesOnly = if (args.length > 2 && args(2) != "-")
      Some(args(2).split(",").toSet) else None
    vocabMode = if (args.length > 3) args(3) else "natural"
    require(vocabMode == "natural" || vocabMode == "degenerate",
      s"vocab mode must be natural|degenerate, got '$vocabMode'")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, outDir, scale)
    spark.stop()
  }

  def generate(spark: SparkSession, outDir: String, scale: Int): Unit = {
    val nCust = 15000L * scale
    val nSupp = 1000L * scale
    val nPart = 20000L * scale
    val nOrders = 150000L * scale
    val nLine = 600000L * scale
    val nEvents = 100000L * scale
    val nDocs = 5000L * scale
    val nVecs = 2000L * scale

    def write(df: DataFrame, name: String): Unit = {
      if (tablesOnly.forall(_.contains(name))) {
        df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name.parquet")
        println(s"[gen] wrote $name")
      } else println(s"[gen] skipped $name (not in tables filter)")
    }

    // fixed-size dimension tables (same contents at every sf)
    write(spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      pick(col("id") * 0 + col("id"), 1, // identity order, not random
        Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")).as("r_name"))
      .withColumn("r_name", element_at(
        array(Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST").map(lit): _*),
        col("r_regionkey") + 1)), "region")
    write(spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id")).as("n_name"),
      pmod(col("id"), lit(5)).cast("int").as("n_regionkey")), "nation")

    write(spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      h(col("id"), 101, 25).as("c_nationkey"),
      round(lit(-1000.0) + lit(11000.0) * u(col("id"), 102), 2).as("c_acctbal"),
      pick(col("id"), 103,
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))
        .as("c_mktsegment")), "customer")

    write(spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      h(col("id"), 201, 25).as("s_nationkey"),
      round(lit(-1000.0) + lit(11000.0) * u(col("id"), 202), 2).as("s_acctbal")),
      "supplier")

    val adjs = Seq("blue", "cold", "hot", "large", "new", "old", "red", "small")
    val nouns = Seq("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
    write(spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(pick(col("id"), 301, adjs), lit(" "), pick(col("id"), 302, nouns))
        .as("p_name"),
      concat(lit("Brand#"), (h(col("id"), 303, 25) + 1)).as("p_brand"),
      pick(col("id"), 304,
        Seq("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")).as("p_type"),
      (h(col("id"), 305, 50) + 1).as("p_size"),
      // sf0.1 has p_retailprice = 900.0 + 0.1 * (p_partkey % 1000)
      round(lit(900.0) + pmod(col("id"), lit(1000L)).cast("double") / 10.0, 2)
        .as("p_retailprice")), "part")

    // o_orderdate: uniform days over [1995-01-01, 2001-08-01] (2404 days)
    write(spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id"), lit(401)), lit(nCust)).as("o_custkey"),
      pick(col("id"), 402, Seq("F", "O", "P")).as("o_orderstatus"),
      round(lit(1000.0) + lit(499000.0) * u(col("id"), 403), 2).as("o_totalprice"),
      date_add(lit("1995-01-01").cast("date"), h(col("id"), 404, 2405))
        .cast("timestamp").as("o_orderdate"),
      pick(col("id"), 405, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")).as("o_orderpriority")), "orders")

    // l_shipdate independent uniform over [1995-01-02, 2001-11-04] (2498 days),
    // matching the profiled source (ship-order day offset spans -2399..+2496 —
    // the driver's generator draws them independently)
    write(spark.range(nLine).select(
      pmod(xxhash64(col("id"), lit(501)), lit(nOrders)).as("l_orderkey"),
      pmod(xxhash64(col("id"), lit(502)), lit(nPart)).as("l_partkey"),
      pmod(xxhash64(col("id"), lit(503)), lit(nSupp)).as("l_suppkey"),
      (h(col("id"), 504, 7) + 1).as("l_linenumber"),
      (h(col("id"), 505, 50) + 1).cast("double").as("l_quantity"),
      round(lit(900.0) + lit(104100.0) * u(col("id"), 506), 2).as("l_extendedprice"),
      (h(col("id"), 507, 11).cast("double") / 100.0).as("l_discount"),
      (h(col("id"), 508, 9).cast("double") / 100.0).as("l_tax"),
      pick(col("id"), 509, Seq("A", "N", "R")).as("l_returnflag"),
      pick(col("id"), 510, Seq("F", "O")).as("l_linestatus"),
      date_add(lit("1995-01-02").cast("date"), h(col("id"), 511, 2499))
        .cast("timestamp").as("l_shipdate")), "lineitem")

    // events: ts uniform over Jan 2024, value ~ Exp(mean=50) (profiled
    // quantiles 14.7/34.7/69.0 match exp(50)'s 14.4/34.7/69.3)
    write(spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros((lit(1704067200000000L) +
        (u(col("id"), 601) * lit(30.0 * 86400 * 1e6)).cast("long"))).as("ts"),
      pmod(xxhash64(col("id"), lit(602)), lit(nCust / 10)).as("user_id"),
      pick(col("id"), 603, Seq("click", "error", "purchase", "signup", "view"))
        .as("event_type"),
      round(lit(-50.0) * log(lit(1.0) - u(col("id"), 604) + lit(1e-12)), 2)
        .as("value"),
      concat(lit("{\"k\": "), h(col("id"), 605, 100), lit("}")).as("props")),
      "events")

    // documents: length uniform 10..100 words, lang en 41% / others
    // ~14.7%, source src0..19 uniform; ~5% of docs are near-dup copies of
    // a random earlier doc (last 0-2 words dropped, " dup" appended — the
    // sf0.1 marker pattern) and ~0.16% are exact clones.
    //
    // Vocabulary: "degenerate" = the historic 30-word draw (3-gram space
    // saturates — kept as the explicit stress fixture); "natural" = the
    // same 30 words as the Zipf HEAD (stopword hits for the quality gate
    // survive) plus 4096 synthetic 3-syllable tail words, rank drawn as
    // floor(V·u³) so P(rank<k) = (k/V)^⅓ — head-heavy like real text
    // ("the"-rank ≈ 6% of tokens, the 30 head words ≈ 19%) while the
    // trigram space is ~4126³ ≈ 7·10¹⁰, so contamination/near-dup rates
    // measure the gates, not the fixture.
    val vocab = Seq("spark", "window", "merge", "table", "column", "vector",
      "stream", "value", "data", "small", "join", "filter", "big", "group",
      "hash", "customer", "sort", "order", "slow", "line", "part", "fast",
      "row", "the", "agg", "key", "query", "a", "scan", "batch")
    val vocabCol = array(vocab.map(lit): _*)
    val syl = Seq("ba", "ce", "di", "fo", "gu", "hy", "ja", "ke",
      "lo", "mu", "ne", "pi", "ro", "su", "ta", "vi")
    val sylCol = array(syl.map(lit): _*)
    val nTail = 4096
    val vTotal = vocab.size + nTail
    def wordAt(i: org.apache.spark.sql.Column) = {
      if (vocabMode == "degenerate") // bit-identical to the pre-r12 draw
        element_at(vocabCol, pmod(xxhash64(col("doc_id"), lit(702), i),
          lit(30L)).cast("int") + 1)
      else {
        val uTok = pmod(xxhash64(col("doc_id"), lit(702), i), lit(1000000000L))
          .cast("double") / 1e9
        val rank = least((pow(uTok, 3.0) * vTotal).cast("int"), lit(vTotal - 1))
        val t = rank - vocab.size
        when(rank < vocab.size, element_at(vocabCol, rank + 1))
          .otherwise(concat(
            element_at(sylCol, pmod(t.cast("long") / 256, lit(16L)).cast("int") + 1),
            element_at(sylCol, pmod(t.cast("long") / 16, lit(16L)).cast("int") + 1),
            element_at(sylCol, pmod(t.cast("long"), lit(16L)).cast("int") + 1)))
      }
    }
    val base = spark.range(nDocs).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), h(col("id"), 701, 91) + 10),
        i => wordAt(i)), " ").as("text"),
      when(u(col("id"), 703) < 0.412, "en")
        .otherwise(pick(col("id"), 704, Seq("de", "es", "fr", "zh"))).as("lang"),
      concat(lit("src"), h(col("id"), 705, 20)).as("source"))
    val dupKind = pmod(xxhash64(col("doc_id"), lit(706)), lit(1000L)) // per-doc
    val docs = base
      .withColumn("kind", when(dupKind < 48, lit("near")) // ~4.8% near-dups
        .when(dupKind < 50, lit("exact")) // ~0.2% exact clones
        .otherwise(lit("orig")))
      .withColumn("base_id",
        pmod(xxhash64(col("doc_id"), lit(707)), lit(nDocs)))
    val dups = docs.filter(col("kind") =!= "orig")
      .select(col("doc_id"), col("lang"), col("source"), col("kind"), col("base_id"))
      .join(base.select(col("doc_id").as("base_id"), col("text").as("base_text")),
        "base_id")
      .select(col("doc_id"),
        when(col("kind") === "exact", col("base_text"))
          .otherwise(concat(array_join(slice(split(col("base_text"), " "), lit(1),
            greatest(size(split(col("base_text"), " ")) -
              h(col("doc_id"), 708, 3), lit(1))), " "), lit(" dup"))).as("text"),
        col("lang"), col("source"))
    val allDocs = docs.filter(col("kind") === "orig")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
      .unionByName(dups)
      .withColumn("n_chars", length(col("text")).cast("long"))
    write(allDocs.repartition(32, col("doc_id")), "documents")

    // embeddings: 64-dim unit vectors, 10 weak clusters (profiled mean
    // cos-to-centroid ~= 0.07 => raw = N(0,1)^64 + 0.6 * unit centroid)
    val rnd = new scala.util.Random(42)
    val centroids = (0 until 10).map { _ =>
      val g = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(g.map(x => x * x).sum)
      g.map(x => x / n)
    }
    val centDf = spark.createDataFrame(
      centroids.zipWithIndex.map { case (c, i) => (i, c.toSeq) })
      .toDF("label", "centroid")
    val raw = spark.range(nVecs).select(
      col("id").as("vec_id"),
      h(col("id"), 801, 10).as("label"),
      transform(sequence(lit(0), lit(63)),
        d => gauss(xxhash64(col("id"), d), 802)).as("noise"))
      .join(broadcast(centDf), "label")
      .withColumn("rawvec", zip_with(col("noise"), col("centroid"),
        (n, c) => n + lit(0.6) * c))
      .withColumn("norm", sqrt(aggregate(col("rawvec"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("rawvec"), x => (x / col("norm")).cast("float"))
          .as("embedding"),
        col("label").cast("int").as("label"))
    write(raw.repartition(32, col("vec_id")), "embeddings")
    println(s"[gen] done: $outDir at scale $scale")
  }
}
