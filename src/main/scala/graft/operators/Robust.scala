package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD-based) statistics — outlier detection that, unlike
  * the reference's mean/stddev atypicals (`HogSFlow` thresholds) and our
  * a9 z-normalization, doesn't let the outliers drag the baseline.
  *
  * Medians are exact, computed the a17 way: a per-group window sort ranks
  * values (codegen'd sort, no value-counts map like Spark's `percentile`
  * aggregate serializes), only the ≤2 candidate rows per group survive to
  * the aggregate, and linear interpolation `lo + frac·(hi−lo)` matches
  * DuckDB's `quantile_cont` definition bit-for-bit at 6 dp.
  */
object Robust {

  /** Exact per-group quantile with linear interpolation. One window sort
    * per call — at 100 TB this is the unavoidable sort-based exact path;
    * callers that can tolerate error should use approx sketches instead.
    */
  def groupedQuantile(df: DataFrame, keys: Seq[String], value: Column,
                      p: Double, out: String): DataFrame = {
    val wg = Window.partitionBy(keys.map(col): _*)
    val ranked = df
      .select(keys.map(col) :+ value.cast("double").as("__v"): _*)
      .withColumn("__rn", row_number().over(wg.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(wg))
    val rowLo = floor((col("__n") - 1) * p) + 1 // __n is group-constant
    val vlo = max(when(col("__rn") === rowLo, col("__v")))
    val vhi = coalesce(max(when(col("__rn") === rowLo + 1, col("__v"))), vlo)
    val idx = (max(col("__n")) - 1) * p
    ranked.filter(col("__rn") === rowLo || col("__rn") === rowLo + 1)
      .groupBy(keys.map(col): _*)
      .agg((vlo + (idx - floor(idx)) * (vhi - vlo)).as(out))
  }

  /** Per-group robust outlier summary: median, MAD (median absolute
    * deviation), and the count of points with |v − med| > cutoff·MAD.
    * Two median passes (values, then deviations); the med/mad side tables
    * are one row per group, so both re-joins broadcast.
    */
  def madOutlierSummary(df: DataFrame, keys: Seq[String], value: Column,
                        cutoff: Double = 3.0): DataFrame = {
    val v = value.cast("double")
    val med = groupedQuantile(df, keys, v, 0.5, "med")
    val withMed = df.select(keys.map(col) :+ v.as("__v"): _*)
      .join(broadcast(med), keys)
    val mad = groupedQuantile(
      withMed.select(keys.map(col) :+ abs(col("__v") - col("med")).as("__d"): _*),
      keys, col("__d"), 0.5, "mad")
    withMed.join(broadcast(mad), keys)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col("__v") - col("med")) > lit(cutoff) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("med")), 6).as("med"),
        round(max(col("mad")), 6).as("mad"))
  }

  /** Single-pass approximate per-group quantile via fixed-width value
    * bins — the bounded-memory alternative to `groupedQuantile`'s exact
    * window sort. Aggregation state is one count per occupied bin (≤
    * range/width entries), so at 100 TB this is one map-side-combined
    * shuffle with no global sort; error is bounded by `width`.
    *
    * Estimate: with `target = p·n`, find the first bin whose cumulative
    * count reaches target and interpolate linearly inside it:
    * `width · (bin + (target − cum_below)/bin_count)`. Deterministic —
    * identical double math re-derives identically in the DuckDB oracle.
    */
  def binnedQuantile(df: DataFrame, keys: Seq[String], value: Column,
                     width: Double, p: Double, out: String): DataFrame = {
    require(width > 0 && p > 0 && p <= 1, s"need width>0, 0<p<=1; got $width, $p")
    val binned = df
      .select(keys.map(col) :+ floor(value.cast("double") / width).cast("long").as("__bin"): _*)
      .groupBy(keys.map(col) :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__c"))
    val wg = Window.partitionBy(keys.map(col): _*)
    val cum = binned
      .withColumn("__cum", sum(col("__c")).over(wg.orderBy(col("__bin"))))
      .withColumn("__n", sum(col("__c")).over(wg))
    val target = lit(p) * col("__n")
    cum.filter(col("__cum") >= target && (col("__cum") - col("__c")) < target)
      .groupBy(keys.map(col): _*)
      .agg(round(
        lit(width) * (max(col("__bin")) + (max(target) - max(col("__cum") - col("__c"))) /
          max(col("__c"))), 6).as(out))
  }
}
