package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over an append-only event log — ordered
  * funnels and cohort retention. The reference's event table (`hogzilla_
  * events`, SURVEY §1.2) only ever feeds per-flow detectors; these are the
  * corpus-level questions an analytics user asks of the same data shape.
  *
  * Scale notes (100 TB event log):
  *   - `funnel` chains one aggregate per stage, all keyed on the user
  *     column — every stage shuffles on the SAME key, so Catalyst reuses
  *     the exchange instead of re-partitioning per stage.
  *   - `cohortRetention` reduces the log to distinct (user, week) pairs
  *     FIRST (the only pass over the full log); everything after runs on
  *     the reduced table (≤ users × weeks rows).
  */
object EventAnalytics {

  /** Earliest time each user reaches stage i strictly after stage i-1
    * (and, when `maxGapUs` is set, within that many microseconds of it —
    * the standard conversion-window funnel).
    *
    * Output: one row per user who reached stage 1, with nullable
    * `t1..tN` stage timestamps; `tI` is null ⇒ all later stages null.
    * A user may emit stage events out of order; only the ordered chain
    * counts (min ts of stage i among qualifying events after t(i-1)).
    */
  def funnel(events: DataFrame, stages: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type",
             maxGapUs: Option[Long] = None): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    stages.zipWithIndex.drop(1).foldLeft(first) { case (acc, (stage, i)) =>
      val prev = s"t$i"
      val carried = col(userCol) +: (1 to i).map(j => col(s"t$j"))
      val inWindow = maxGapUs.fold(lit(true))(g =>
        unix_micros(col("__ts")) - unix_micros(col(prev)) <= g)
      acc.join(
          events.filter(col(typeCol) === stage)
            .select(col(userCol), col(tsCol).as("__ts")),
          Seq(userCol), "left")
        .groupBy(carried: _*)
        .agg(min(when(col("__ts") > col(prev) && inWindow, col("__ts")))
          .as(s"t${i + 1}"))
    }
  }

  /** Stage-reached distribution: how many users stalled at each funnel
    * depth (1 = entered, stages.length = completed).
    */
  def funnelReach(events: DataFrame, stages: Seq[String],
                  userCol: String = "user_id", tsCol: String = "ts",
                  typeCol: String = "event_type",
                  maxGapUs: Option[Long] = None): DataFrame = {
    val f = funnel(events, stages, userCol, tsCol, typeCol, maxGapUs)
    // tI null ⇒ all later null, so reached = count of non-null stage cols
    val reached = (1 to stages.length)
      .map(i => when(col(s"t$i").isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    f.select(reached.as("reached"))
      .groupBy(col("reached")).agg(count(lit(1)).as("n_users"))
  }

  /** Batch sessionization: split each user's event stream into sessions at
    * gaps > `gapUs` microseconds (the batch twin of `StreamingJobs.
    * sessionCounts`' gap-based session windows), and emit one row per
    * session with start/end/size.
    *
    * One window pass (lag + running sum over the same (user, ts) sort — a
    * single exchange + sort serves both) and one aggregate that reuses the
    * user-key partitioning. Boundary flags depend only on timestamp VALUES,
    * so equal-timestamp ties can't flip session assignment whatever order
    * the sort breaks them in — the output is deterministic.
    */
  def sessionize(events: DataFrame, gapUs: Long,
                 userCol: String = "user_id", tsCol: String = "ts"): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol))
    events
      .withColumn("__gap",
        when(unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_idx",
        sum(col("__gap")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("session_idx"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * activity; `n_users` counts cohort members still active `week_offset`
    * weeks later. Weeks are `date_trunc('week', ts)` (Monday-based in both
    * Spark and DuckDB), so offsets are exact integer multiples of 7 days.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    val weeks = events
      .select(col(userCol), date_trunc("week", col(tsCol)).cast("date").as("wk"))
      .distinct()
    val cohort = weeks.groupBy(col(userCol)).agg(min(col("wk")).as("cohort_week"))
    // weeks is already distinct per (user, wk) so a plain count is a
    // distinct-user count; both sides of the join share the user key.
    weeks.join(cohort, Seq(userCol))
      .select(col("cohort_week"),
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
