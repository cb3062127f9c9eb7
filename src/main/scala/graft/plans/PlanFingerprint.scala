package graft.plans

import org.apache.spark.sql.DataFrame

/** Physical-plan SKELETON fingerprint: join strategies, exchange counts,
  * scan pushdown — the properties that decide whether a query survives a
  * 100× scale-up. A lost broadcast, a vanished PushedFilters, or an extra
  * shuffle changes the fingerprint; renamed columns, literal values, and
  * partition counts do not. PlanGoldenSpec pins the fingerprints of the
  * most expensive queries so a plan regression fails CI instead of
  * surfacing as a silent bench slowdown months later.
  *
  * String-based on purpose: `executedPlan.toString` renders the INITIAL
  * plan even under AQE (where the tree is wrapped in AdaptiveSparkPlan and
  * not traversable via collect), and operator names in the rendered tree
  * are a stable public surface.
  */
object PlanFingerprint {

  def of(df: DataFrame): String = ofPlanString(df.queryExecution.executedPlan.toString())

  def ofPlanString(s: String): String = {
    def n(tok: String): Int = {
      var c = 0; var i = s.indexOf(tok)
      while (i >= 0) { c += 1; i = s.indexOf(tok, i + tok.length) }
      c
    }
    val bcastX = n("BroadcastExchange")
    val shuffleX = n("Exchange hashpartitioning") + n("Exchange rangepartitioning") +
      n("Exchange SinglePartition") + n("Exchange RoundRobinPartitioning")
    val pushedAll = n("PushedFilters: [")
    val pushedEmpty = n("PushedFilters: []")
    Seq(
      "bhj" -> n("BroadcastHashJoin"),
      "smj" -> n("SortMergeJoin"),
      "shj" -> n("ShuffledHashJoin"),
      "bnlj" -> n("BroadcastNestedLoopJoin"),
      "cart" -> n("CartesianProduct"),
      "bcastx" -> bcastX,
      "shufflex" -> shuffleX,
      "scans" -> n("FileScan"),
      "pushed" -> (pushedAll - pushedEmpty),
      "agg" -> n("HashAggregate"),
      "wgl" -> n("WindowGroupLimit"),
    ).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }
}
