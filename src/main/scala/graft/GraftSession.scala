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
      // aggregators exist to avoid. Every graft aggregator buffer is
      // O(k)-bounded, so a much larger group budget is safe: 64k groups
      // × a bounded buffer each stays far under executor memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      .config("spark.sql.session.timeZone", "UTC")
      // the SQL-surface domain functions (graft_logbin, graft_hamming, …)
      .config("spark.sql.extensions", "graft.extensions.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
