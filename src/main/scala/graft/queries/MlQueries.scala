package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Catalog
import graft.functions.HistogramFunctions
import graft.ml.Models

/** SURVEY §2.9 — ML operators as queries. Model internals aren't
  * SQL-expressible, but the seeded fits are deterministic (see the
  * layout pinning below), so each query is hash-checked against a
  * captured golden parquet (`oracles`); MlSpec carries the behavioral
  * assertions. Outputs are aggregate shapes (cluster/class sizes).
  */
object MlQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // M1/M2/M5: z-scaled seeded K-Means + taint rule over per-customer
    // order features (the DNS/HTTP detector shape).
    "ml1_kmeans_taint" -> ((s, dir) => {
      val feats = Catalog.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice")).as("spend"),
          count(lit(1)).cast("double").as("n_orders"),
          avg(col("o_totalprice")).as("avg_price"),
          max(col("o_totalprice")).as("max_price"))
        .withColumn("dirty", (col("o_custkey") % 50 === 0).cast("double"))
      // per-entity aggregates are orders of magnitude smaller than the
      // fact table — match the partition count to the AGGREGATE size so
      // each of K-Means's ~20 iterative jobs doesn't pay 32 near-empty
      // tasks (same tuning applies at cluster scale: entities ≪ rows).
      // Keyed repartition + in-partition sort (not coalesce) so the fit
      // input layout — which seeds K-Means|| init sampling — is identical
      // under ANY session parallelism: that's what makes this query
      // golden-reproducible across runs.
      Models.kmeansFlagger(
          feats.repartition(4, col("o_custkey")).sortWithinPartitions("o_custkey"),
          Seq("spend", "n_orders", "avg_price", "max_price"),
          "dirty", k = 8)
        .groupBy(col("prediction"), col("tainted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prediction"))
    }),

    // M3: K-Means over histogram profiles (per-customer priority mix —
    // the port-histogram clustering shape) with centroid distances.
    "ml2_histogram_kmeans" -> ((s, dir) => {
      val hist = HistogramFunctions.buildHistogram(
        Catalog.orders(s, dir)
          .groupBy(col("o_custkey").as("k"), col("o_orderpriority").as("bucket"))
          .agg(count(lit(1)).as("cnt")),
        Seq("k"))
      // see ml1: iterative fit over a small per-entity aggregate, with
      // the layout pinned by key so the fit is parallelism-independent
      Models.histogramKMeans(
          hist.repartition(4, col("k")).sortWithinPartitions("k"), k = 5)
        .groupBy(col("prediction"))
        .agg(count(lit(1)).as("n"), round(avg(col("distance")), 4).as("avg_dist"))
        .orderBy(col("prediction"))
    }),

    // M4+P6+U1: 3-way label assignment, train on labeled subset, predict
    // everywhere (the Snort RandomForest detector shape).
    "ml3_rf_predict" -> ((s, dir) => {
      val labeled = Catalog.orders(s, dir)
        .withColumn("label",
          when(col("o_orderstatus") === "F", 1.0)
            .when(col("o_orderstatus") === "O", 0.0)
            .otherwise(-1.0))
      // tree training runs one distributed node-split job per depth level
      // — with a mid-sized input, 32 near-empty tasks per level dominate
      // (see ml1: partition to the data, not the session default; keyed
      // layout keeps per-partition bagging samples reproducible)
      Models.randomForestLabeler(
          labeled.repartition(8, col("o_orderkey")).sortWithinPartitions("o_orderkey"),
          "label",
          catCols = Seq("o_orderpriority"), numCols = Seq("o_totalprice"),
          numTrees = 20, maxDepth = 5)
        .groupBy(col("label"), col("prediction"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("label"), col("prediction"))
    }),

    // M1 proper: the 17-feature DNS surface over the typed FlowSchema
    // fact table at the reference's k=9 (HogDNS.scala:56,125-141).
    // Output is the (tainted × dirty) contingency — stable shape.
    "ml4_dns_kmeans" -> ((s, dir) => {
      // first_seen is the unique event id: keyed layout → reproducible fit
      val flows = graft.flows.FlowSchema.fromEvents(Catalog.events(s, dir))
        .repartition(4, col("first_seen")).sortWithinPartitions("first_seen")
      graft.flows.FlowFeatures.dnsKmeans(flows)
        .groupBy(col("tainted"))
        .agg(count(lit(1)).as("n"), sum(col("dirty")).cast("long").as("n_dirty"))
        .orderBy(col("tainted"))
    }),

    // M2 proper: the 19-feature HTTP surface at the reference's k=32
    // (HogHTTP.scala:52,106-124).
    "ml5_http_kmeans" -> ((s, dir) => {
      val flows = graft.flows.FlowSchema.fromEvents(Catalog.events(s, dir))
        .repartition(4, col("first_seen")).sortWithinPartitions("first_seen")
      graft.flows.FlowFeatures.httpKmeans(flows)
        .groupBy(col("tainted"))
        .agg(count(lit(1)).as("n"), sum(col("dirty")).cast("long").as("n_dirty"))
        .orderBy(col("tainted"))
    }),
  )

  /** Model INTERNALS aren't SQL-expressible, but the seeded fits are
    * deterministic (fixed seeds + keyed/sorted fit-input layout pinned
    * above, verified bit-stable across local[4]/local[8]/local[32] and
    * repeat runs) — so each query's sf0.01 output is captured once as a
    * golden parquet under goldens/ and the oracle is a trivial read of
    * it. Regenerate after any intentional model change with:
    * {{{ tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v ml1_... &&
    *     cp /tmp/v/<q>/part-*.parquet goldens/<q>.parquet }}}
    */
  private def golden(name: String): String =
    s"SELECT * FROM read_parquet('/root/repo/goldens/$name.parquet')"

  val oracles: Map[String, String] = Map(
    "ml1_kmeans_taint" -> golden("ml1_kmeans_taint"),
    "ml2_histogram_kmeans" -> golden("ml2_histogram_kmeans"),
    "ml3_rf_predict" -> golden("ml3_rf_predict"),
    "ml4_dns_kmeans" -> golden("ml4_dns_kmeans"),
    "ml5_http_kmeans" -> golden("ml5_http_kmeans"),
  )
}
