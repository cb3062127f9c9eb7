package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory: every knob here is a scale decision, not a
  * convenience default. Library users call `GraftSession.build()`; the
  * driver-facing mains (Verify/Bench) configure equivalently.
  */
object GraftSession {

  /** @param shufflePartitions sized so a shuffle partition of the target
    *        workload fits comfortably in executor memory; local runs use
    *        core count, a 1000-executor cluster uses O(2× total cores)
    *        with AQE coalescing the small ones back together.
    */
  def build(master: String = "local[*]", shufflePartitions: Int =
      Runtime.getRuntime.availableProcessors()): SparkSession = {
    val s = SparkSession.builder()
      .master(master)
      .appName("graft")
      // AQE: runtime re-planning — coalesces shuffle partitions, converts
      // sort-merge to broadcast when a side turns out small, splits skewed
      // partitions (the salting fallback for skewed keys)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      // typed-Aggregator plans (TopKPayloadAggregator, HistogramAggregator)
      // run as ObjectHashAggregate, which falls back to SORT-based
      // aggregation after this many in-memory groups (default 128) —
      // re-introducing exactly the per-task input sort the bounded
      // aggregators exist to avoid. Raising it session-wide removes the
      // graceful spill fallback for EVERY ObjectHashAggregate, so the
      // codebase carries a BOUNDED-BUFFER CONTRACT: any object-agg
      // buffer must be O(bounded) per group, never corpus-proportional.
      // Audit of every collect_list/collect_set site (r10): the LSH /
      // gram bucket lists pre-filter to bsz ≤ maxBucket BEFORE the
      // collect buffers them (Dedup.scala); SimilaritySearch collects
      // dims-bounded vector structs; HistogramFunctions collects
      // bin-bounded bucket structs; the detector port/os sets are
      // domain-bounded (≤64k ports) and sliced; the query-layer
      // collects are rank≤k-filtered or slice(…, k)-capped. The typed
      // Aggregators (TopK*/MinK/Histogram) are O(k) by construction
      // (AggregatorsSpec pins it). A new unbounded collect under a hot
      // key would OOM a task instead of spilling — keep new object-agg
      // buffers inside this contract or scope this config away locally.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      // the SQL-surface domain functions (graft_logbin, graft_hamming, …)
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
