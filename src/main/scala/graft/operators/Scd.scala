package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: turn an append-only change
  * log into validity-interval dimension rows — the standard warehouse shape
  * for "what was this entity's attribute value at time T", which the
  * reference approximates by overwriting profile rows in place (losing
  * history) and which an as-of join (`operators/AsOfJoin`) then consumes.
  *
  * Scale shape: one window pass over the change log, partitioned by the
  * entity key (the lag-dedup and the lead that closes intervals share the
  * same (key, order) sort, so Catalyst plans ONE exchange + sort); no
  * driver state, no collect.
  */
object Scd {

  /** Collapse a change log to SCD2 interval rows.
    *
    * @param changes  append-only log: key column(s), an event-time column,
    *                 attribute column(s), and `orderCols` extra sort keys
    *                 for deterministic ordering under equal timestamps
    *                 (e.g. a monotonically-assigned log id).
    * @return one row per effective change: keys ++ attrs ++
    *         (valid_from = its ts, valid_to = next change's ts or null,
    *         is_current). Consecutive rows whose attributes did not change
    *         are dropped (no zero-length ghost versions).
    */
  def scd2(changes: DataFrame, keyCols: Seq[String], tsCol: String,
           attrCols: Seq[String], orderCols: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val attrs = struct(attrCols.map(col): _*)
    // keep only rows that change the attribute tuple vs the previous row —
    // null-safe (<=>): a plain =!= yields NULL when an attribute goes
    // to/from NULL, silently dropping that change as a no-op
    val effective = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(attrs <=> col("__prev")))
      .drop("__prev")
    // re-rank the surviving changes: each version closes at the next one
    val w2 = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    effective
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols.map(col) ++ attrCols.map(col) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current"))): _*)
  }
}
