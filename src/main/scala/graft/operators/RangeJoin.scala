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

  /** Floor division kept entirely in LONG arithmetic: `floor(c / grid)`
    * through a double loses low bits past 2^53 (epoch-micros far future,
    * arbitrary integer keys — both permitted inputs) and a misrounded
    * cell silently drops true matches before the exact residual filter
    * can see them. `c - pmod(c, g)` is an exact multiple of g, so the
    * integer DIV has no remainder to mis-truncate.
    */
  private def floorDiv(c: Column, grid: Long): Column =
    call_function("div", c - pmod(c, lit(grid)), lit(grid)).cast("long")

  /** Both `pointCol` and the interval bounds must be LONG-comparable
    * (epoch seconds/days, integer keys...). Inclusive on both ends.
    * Returns every (point row ⨯ matching interval row); points matching
    * nothing are dropped (inner semantics).
    *
    * `maxCellsPerInterval` guards the explode against degenerate inputs
    * (one interval spanning millions of grid cells — same blowup guard as
    * every other bucketed join here): such a row fails fast with a clear
    * message instead of materializing an astronomic array.
    */
  def rangeJoin(points: DataFrame, pointCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      grid: Long, maxCellsPerInterval: Long = 1L << 20): DataFrame = {
    val cells =
      cellExploded(intervals, startCol, endCol, grid, maxCellsPerInterval,
        "rangeJoin")
    points
      .withColumn("__cell", floorDiv(col(pointCol), grid))
      .join(cells, Seq("__cell"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__cell")
  }

  /** The blow-up guard lives INSIDE the exploded expression (the branch
    * `when(too-wide, raise_error).otherwise(sequence…)`), not on a separate
    * projected-then-dropped column: a guard column nothing consumes is
    * removed by Catalyst column pruning on file-backed inputs, so it would
    * only ever fire on LocalRelation test data — exactly where it matters
    * least. Inside the consumed branch it survives any pruning.
    */
  private def cellExploded(df: DataFrame, startCol: String, endCol: String,
      grid: Long, maxCellsPerInterval: Long, opName: String): DataFrame = {
    val cellStart = floorDiv(col(startCol), grid)
    val cellEnd = floorDiv(col(endCol), grid)
    df.withColumn("__cell", explode(
      when(cellEnd - cellStart + 1 > maxCellsPerInterval,
        raise_error(concat(lit(s"$opName: interval spans more than " +
          s"$maxCellsPerInterval grid cells (grid=$grid, start="),
          col(startCol), lit(", end="), col(endCol),
          lit("); raise `grid` or split the interval")))
          .cast("array<bigint>"))
        .otherwise(sequence(cellStart, cellEnd))))
  }

  /** Interval-OVERLAP join: every (left row ⨯ right row) whose closed
    * intervals intersect (`lStart ≤ rEnd AND rStart ≤ lEnd`). The naive
    * theta-join is a nested loop; here BOTH sides explode onto the grid
    * and hash-join on the cell, and each true pair is kept EXACTLY ONCE
    * without a distinct: the canonical cell of a pair is the cell of
    * `greatest(lStart, rStart)` — the overlap region's first point, which
    * by definition lies inside both intervals, so both sides emitted that
    * cell — and the pair is emitted only from it. Shuffle is
    * O(rows · cells-per-interval); the quadratic term is confined to
    * co-resident cell populations, the same bound every bucketed join in
    * this library carries. Column names must be disjoint across sides.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      grid: Long, maxCellsPerInterval: Long = 1L << 20): DataFrame = {
    val l = cellExploded(left, lStart, lEnd, grid, maxCellsPerInterval,
      "intervalOverlapJoin")
    val r = cellExploded(right, rStart, rEnd, grid, maxCellsPerInterval,
      "intervalOverlapJoin")
    l.join(r, Seq("__cell"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__cell") === floorDiv(greatest(col(lStart), col(rStart)), grid))
      .drop("__cell")
  }
}
