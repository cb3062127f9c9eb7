package graft.plans

import java.util.regex.Pattern

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
  * are a stable public surface. Counting is TOKEN-anchored, not raw
  * substring: a bare operator name only matches where no identifier
  * character precedes/follows it, so `HashAggregate` no longer counts
  * `ObjectHashAggregate` rows (a hash→object strategy flip used to be
  * invisible), `Window` doesn't count `WindowGroupLimit`, and the
  * exchange count covers EVERY non-broadcast Exchange flavor (hash,
  * range, round-robin, rebalance) by anchoring the operator name alone.
  */
object PlanFingerprint {

  def of(df: DataFrame): String = ofPlanString(df.queryExecution.executedPlan.toString())

  /** Token-anchored occurrence count: identifier-boundary guards are only
    * applied on ends of `tok` that are themselves identifier characters
    * (so a token ending in `[` still matches when filter text follows).
    */
  private def n(s: String, tok: String): Int = {
    val pre = if (tok.head.isLetterOrDigit) "(?<![A-Za-z0-9])" else ""
    val post = if (tok.last.isLetterOrDigit) "(?![A-Za-z0-9])" else ""
    val m = Pattern.compile(pre + Pattern.quote(tok) + post).matcher(s)
    var c = 0
    while (m.find()) c += 1
    c
  }

  def ofPlanString(s: String): String = {
    val pushedAll = n(s, "PushedFilters: [")
    val pushedEmpty = n(s, "PushedFilters: []")
    Seq(
      "bhj" -> n(s, "BroadcastHashJoin"),
      "smj" -> n(s, "SortMergeJoin"),
      "shj" -> n(s, "ShuffledHashJoin"),
      "bnlj" -> n(s, "BroadcastNestedLoopJoin"),
      "cart" -> n(s, "CartesianProduct"),
      "bcastx" -> n(s, "BroadcastExchange"),
      // anchored "Exchange" excludes BroadcastExchange (identifier char
      // before it) and covers every shuffle partitioning flavor
      "shufflex" -> n(s, "Exchange"),
      "scans" -> n(s, "FileScan"),
      "pushed" -> (pushedAll - pushedEmpty),
      "agg" -> n(s, "HashAggregate"),
      "objagg" -> n(s, "ObjectHashAggregate"),
      "sortagg" -> n(s, "SortAggregate"),
      "window" -> n(s, "Window"),
      "wgl" -> n(s, "WindowGroupLimit"),
    ).map { case (k, v) => s"$k=$v" }.mkString(" ")
  }
}
