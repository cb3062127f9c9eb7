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

  /** CDC merge-apply: fold an ordered insert/update/delete changelog onto
    * a base snapshot and return the post-image — MERGE INTO semantics as
    * a pure batch plan (the lakehouse pattern for applying a Debezium/
    * binlog feed to a dimension table without a mutable store).
    *
    * Last-writer-wins per key: the newest change row by (`tsCol`,
    * `orderCols`) decides the key's fate — op `D` removes the key, any
    * other op replaces the key's attribute tuple VERBATIM (a NULL in the
    * change row nulls the attribute — full-row post-image semantics, not
    * per-column patching), and keys never touched keep their base row.
    * Inserts are just change keys absent from the base.
    *
    * Scale shape: ONE window pass over the changelog partitioned by key
    * picks the last change (row_number, no self-join), and the follow-up
    * full-outer join is on the same key the window just hash-partitioned
    * by, so the changelog side's exchange is reused; the base shuffles
    * once. No driver state, no collect, no iteration.
    */
  def cdcApply(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
               opCol: String, tsCol: String, attrCols: Seq[String],
               orderCols: Seq[String] = Nil, deleteOp: String = "D"): DataFrame = {
    val ord = (col(tsCol) +: orderCols.map(col)).map(_.desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    val last = changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(keyCols.map(col) ++ Seq(col(opCol).as("__op")) ++
        attrCols.map(c => col(c).as(s"__new_$c")): _*)
    base.join(last, keyCols, "full_outer")
      .filter(col("__op").isNull || col("__op") =!= deleteOp)
      .select(keyCols.map(col) ++ attrCols.map(c =>
        when(col("__op").isNotNull, col(s"__new_$c")).otherwise(col(c)).as(c)): _*)
  }
}
