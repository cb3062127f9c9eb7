package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: for every left row, attach the LATEST right
  * row with the same key and time at-or-before the left row's time
  * (classic telemetry/state-lookup semantics: "the config that was active
  * when this alert fired"). Spark has no built-in as-of join; the naive
  * formulations both collapse at scale — a per-left-row correlated probe
  * is O(|L|) point lookups, and an inequality join `r.t <= l.t` explodes
  * to O(|L|·|R|_per_key) pairs before a rank-filter prunes them.
  *
  * This implementation is the union-scan form: tag both sides, union,
  * ONE shuffle on the key, and a single linear window pass per key
  * carrying the last-seen right payload forward (`last(ignoreNulls)` over
  * an unbounded-preceding running frame — no pair blowup, no second
  * shuffle, memory O(1) per row). Right rows at exactly the left row's
  * time match (inclusive); among right ties the largest payload struct
  * wins (field-order comparison), so results are set-deterministic.
  *
  * Returns every left row (columns preserved) plus `matched` — a struct
  * of `rightPayload` columns, null when no right row precedes the left
  * row.
  *
  * Null semantics: null KEYS group together (window-partition equality),
  * unlike a SQL equi-join where null never matches null — filter null
  * keys beforehand if join semantics are required. Null TIMES sort first
  * (treated as before-everything).
  */
object AsOfJoin {

  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightPayload: Seq[String]): DataFrame =
    asOfJoin(left, right, keyCol, timeCol, rightPayload, tolerance = None)

  /** [[asOfJoin]] with a maximum-lookback `tolerance`: a right row only
    * matches while `leftTime - rightTime <= tolerance` (the pandas
    * `merge_asof(tolerance=...)` / production sensor-join contract — a
    * config row from last year must NOT silently attach to today's
    * alert). Same single-shuffle union-window plan; the tolerance is a
    * post-window null-out, so the pair blowup the naive inequality-join
    * form pays is still avoided entirely. `tolerance` must be
    * subtractable from the time column: an INTERVAL `Column` for
    * timestamp columns (the j14 caller's shape), or a numeric `Column`
    * for numeric time axes.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightPayload: Seq[String], tolerance: Option[Column]): DataFrame = {
    val leftRow = struct(left.columns.map(col): _*)
    // the matched right TIME travels with the payload (field __mt) so the
    // lookback bound can be applied after the window pass; __mt == __t for
    // right rows, so tie-break order among right ties is unchanged
    val payload = struct(col(timeCol).as("__mt"),
      struct(rightPayload.map(col): _*).as("__mp"))
    val lType = left.select(leftRow).schema.head.dataType
    val pType = right.select(payload).schema.head.dataType

    val l2 = left.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(1).as("__side"),
      lit(null).cast(pType).as("__p"), leftRow.as("__l"))
    val r2 = right.select(
      col(keyCol).as("__k"), col(timeCol).as("__t"), lit(0).as("__side"),
      payload.as("__p"), lit(null).cast(lType).as("__l"))

    // sort (time, side, payload): right rows at a tied time precede the
    // left row (inclusive match) and tie-break among right rows is by the
    // payload itself (deterministic regardless of arrival order)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc, col("__p").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // tolerance: null out a carried match that is older than the bound.
    // `tolerance` must be subtractable from the time column (an INTERVAL
    // for timestamps, a numeric for numeric time axes); right rows with a
    // null time sort before everything and never satisfy the bound.
    val matched = tolerance match {
      case Some(tol) =>
        when(col("__m")("__mt") >= col("__t") - tol, col("__m")("__mp"))
      case None => col("__m")("__mp")
    }

    l2.unionByName(r2)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col(s"__l.$c").as(c)) :+ matched.as("matched"): _*)
  }
}
