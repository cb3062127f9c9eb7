package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-containment (range) join: match each point row to every
  * interval row with start ≤ point ≤ end. Spark plans a raw inequality
  * join as a broadcast-nested-loop — O(|points|·|intervals|) comparisons,
  * which is exactly what dies first at 100 TB.
  *
  * Grid bucketing makes it an EQUI-join: pick a grid width, explode each
  * interval into the grid cells it covers, map each point to its one
  * cell, hash-join on the cell, then apply the exact range predicate to
  * the survivors. Shuffle volume is O(|points| + |intervals|·cells) and
  * the quadratic term is confined to co-resident cell populations.
  * Choose `grid` near the typical interval length: shorter grids
  * replicate intervals more, longer grids admit more false candidates —
  * the standard time-series/geo binning trade-off (same pattern as the
  * IVF/LSH bucket joins elsewhere in this library).
  */
object RangeJoin {

  /** Both `pointCol` and the interval bounds must be LONG-comparable
    * (epoch seconds/days, integer keys...). Inclusive on both ends.
    * Returns every (point row ⨯ matching interval row); points matching
    * nothing are dropped (inner semantics).
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      grid: Long): DataFrame = {
    val cells = intervals.withColumn("__cell",
      explode(sequence(floor(col(startCol) / grid).cast("long"),
        floor(col(endCol) / grid).cast("long"))))
    points
      .withColumn("__cell", floor(col(pointCol) / grid).cast("long"))
      .join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }
}
