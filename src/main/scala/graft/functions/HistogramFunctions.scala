package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column-expression forms of the histogram algebra
  * ([[graft.core.HistogramAlgebra]]) for the distributed hot path: all
  * higher-order map functions (`map_zip_with`, `map_filter`, `aggregate`),
  * no Scala UDFs, so Catalyst keeps whole-stage codegen where available and
  * never serializes closures.
  *
  * Conventions: a histogram lives in two columns — `size: long` and
  * `buckets: map<string,double>` (relative frequencies). Builders produce
  * that shape from long-form (key, bucket, cnt) aggregates.
  */
object HistogramFunctions {

  val AtypicalThreshold = 1e-7

  /** Relative-frequency bucket map from long-form counts:
    * groupBy(key) → (size, buckets). `df` must have columns (bucket, cnt).
    */
  def buildHistogram(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    val grouped = df.groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("size"),
        map_from_entries(sort_array(collect_list(struct(col("bucket"), col("cnt"))))).as("cnts"))
    grouped.select(
      keyCols.map(col) ++ Seq(
        col("size"),
        transform_values(col("cnts"), (_, v) => v.cast("double") / col("size")).as("buckets")): _*)
  }

  /** Count-valued bucket map from long-form counts — the HIST07 shape
    * ("not exactly a histogram", reference Histograms.scala:141): bucket
    * values are RAW counts (e.g. distinct partners per port), not relative
    * frequencies, so bucket-wise `mergeMax` tracks the learned per-bucket
    * maximum. `df` must have columns (bucket, cnt).
    */
  def buildCountMap(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(sum("cnt").as("size"),
        map_from_entries(sort_array(collect_list(
          struct(col("bucket"), col("cnt").cast("double"))))).as("buckets"))

  /** Weighted-mean merge with decay (HistogramAlgebra.merge) as a pure
    * column expression over (s1, b1) profile and (s2, b2) current.
    * Missing keys on either side contribute 0.
    */
  def mergeBuckets(s1: Column, b1: Column, s2: Column, b2: Column): Column = {
    val div = when(s1 > 1000L, lit(2.0)).otherwise(lit(1.0))
    map_zip_with(b1, b2, (_, p, q) =>
      (coalesce(p, lit(0.0)) * s1.cast("double") / div + coalesce(q, lit(0.0)) * s2.cast("double")) /
        (s1.cast("double") / div + s2.cast("double")))
  }

  /** New observation count after a decayed merge (integer division, as the
    * reference: histSize/div + histSize2).
    */
  def mergedSize(s1: Column, s2: Column): Column =
    when(s1 > 1000L, floor(s1 / 2).cast("long")).otherwise(s1) + s2

  /** Bucket-wise max (HistogramAlgebra.mergeMax). */
  def mergeMaxBuckets(b1: Column, b2: Column): Column =
    map_zip_with(b1, b2, (_, p, q) => greatest(coalesce(p, lit(0.0)), coalesce(q, lit(0.0))))

  /** Weighted difference h1−h2 (HistogramAlgebra.difference): only h2's
    * keys are recomputed as (p·s1 − q·s2)/(s1 − s2); keys present only in
    * h1 keep their original frequency (pure form: `h1.buckets ++ updated`).
    * A plain `map_zip_with(b2, b1, …)` would iterate the key UNION and
    * wrongly rescale h1-only buckets.
    */
  def differenceBuckets(s1: Column, b1: Column, s2: Column, b2: Column): Column = {
    val updated = map_from_entries(transform(
      filter(map_entries(b2), e =>
        coalesce(element_at(b1, e.getField("key")), lit(0.0)) > 0.0 || e.getField("value") > 0.0),
      e => struct(
        e.getField("key").as("key"),
        ((coalesce(element_at(b1, e.getField("key")), lit(0.0)) * s1.cast("double") -
          e.getField("value") * s2.cast("double")) /
          (s1.cast("double") - s2.cast("double"))).as("value"))))
    map_zip_with(b1, updated, (_, p, u) => coalesce(u, p))
  }

  /** Σ p·ln(p/q); zero-lenient like the reference. */
  def kullbackLiebler(bp: Column, bq: Column): Column =
    aggregate(
      map_entries(map_zip_with(bp, bq, (_, p, q) =>
        when(coalesce(p, lit(0.0)) === 0.0 || coalesce(q, lit(0.0)) === 0.0, lit(0.0))
          .otherwise(p * log(p / q)))),
      lit(0.0),
      (acc, e) => acc + e.getField("value"))

  /** Keys present now but unseen in the profile — sorted array. */
  def atypicalKeys(profile: Column, current: Column): Column =
    sort_array(map_keys(map_filter(
      map_zip_with(current, profile, (_, q, p) =>
        when(coalesce(q, lit(0.0)) > AtypicalThreshold &&
          coalesce(p, lit(0.0)) < AtypicalThreshold, lit(1)).otherwise(lit(0))),
      (_, v) => v === 1)))

  /** Keys present in both current and profile — sorted array. */
  def typicalKeys(profile: Column, current: Column): Column =
    sort_array(map_keys(map_filter(
      map_zip_with(current, profile, (_, q, p) =>
        when(coalesce(q, lit(0.0)) > AtypicalThreshold &&
          coalesce(p, lit(0.0)) > AtypicalThreshold, lit(1)).otherwise(lit(0))),
      (_, v) => v === 1)))

  /** profile[event] > ε. */
  def isTypicalEvent(profile: Column, event: Column): Column =
    coalesce(element_at(profile, event), lit(0.0)) > AtypicalThreshold

  /** floor(ln(x·scale+1)) — log-binning for heavy-tailed counts. */
  def logBin(x: Column, scale: Double = 1.0): Column =
    floor(log(x * scale + 1)).cast("long")
}
