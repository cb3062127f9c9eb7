package graft.core

/** Empirical histogram: a named discrete distribution (bucket → relative
  * frequency) with an observation count and optional bucket labels.
  *
  * Mirrors the reference's profile abstraction
  * (`/root/reference/src/org/hogzilla/histogram/HogHistogram.scala:25-28`)
  * as an immutable case class with a `MapType`-friendly shape, so a
  * `Dataset[Histogram]` is the state table.
  */
final case class Histogram(
    name: String,
    size: Long,
    buckets: Map[String, Double],
    labels: Map[String, String] = Map.empty)

/** The histogram algebra — pure functions, semantics matched to
  * `/root/reference/src/org/hogzilla/histogram/Histograms.scala`.
  *
  * These are the driver-side / unit-test ground truth; the distributed hot
  * path uses the equivalent Column expressions in
  * [[graft.functions.HistogramFunctions]] (map_zip_with & friends, codegen
  * where Spark provides it). Property tests assert the two agree.
  */
object HistogramAlgebra {

  /** ε below which a bucket is "unseen" (Histograms.scala:16). */
  val AtypicalThreshold: Double = 1e-7

  /** Weighted-mean merge of `current` into `profile` with exponential decay:
    * once the profile has seen >1000 observations its weight is halved, so
    * old behavior ages out (Histograms.scala:103-138).
    *
    * Deviations from the reference (documented, deliberate):
    *  - result size stays Long (the reference truncates to Int — overflow
    *    bug at scale);
    *  - buckets where both sides are absent simply stay absent (reference
    *    skips them too via the p>0||q>0 guard).
    */
  def merge(profile: Histogram, current: Histogram): Histogram = {
    val div: Double = if (profile.size > 1000) 2.0 else 1.0
    val keys = profile.buckets.keySet ++ current.buckets.keySet
    val s1 = profile.size.toDouble
    val s2 = current.size.toDouble
    val merged = keys.iterator.map { k =>
      val p = profile.buckets.getOrElse(k, 0.0)
      val q = current.buckets.getOrElse(k, 0.0)
      k -> (p * s1 / div + q * s2) / (s1 / div + s2)
    }.toMap
    val newSize = profile.size / div.toLong + current.size // integer division, as reference
    Histogram(profile.name, newSize, merged, profile.labels ++ (current.labels -- profile.labels.keySet))
  }

  /** Bucket-wise max — for "max flows per port" style profiles
    * (Histograms.scala:141-168). Sizes add.
    */
  def mergeMax(profile: Histogram, current: Histogram): Histogram = {
    val keys = profile.buckets.keySet ++ current.buckets.keySet
    val merged = keys.iterator.map { k =>
      k -> math.max(profile.buckets.getOrElse(k, 0.0), current.buckets.getOrElse(k, 0.0))
    }.toMap
    Histogram(profile.name, profile.size + current.size, merged,
      profile.labels ++ (current.labels -- profile.labels.keySet))
  }

  /** Weighted leave-one-out subtraction, h1 − h2 over h2's keys
    * (Histograms.scala:172-197).
    */
  def difference(h1: Histogram, h2: Histogram): Histogram = {
    val s1 = h1.size.toDouble
    val s2 = h2.size.toDouble
    val updated = h2.buckets.keysIterator.flatMap { k =>
      val p = h1.buckets.getOrElse(k, 0.0)
      val q = h2.buckets.getOrElse(k, 0.0)
      if (p > 0 || q > 0) Some(k -> (p * s1 - q * s2) / (s1 - s2)) else None
    }.toMap
    Histogram(h1.name, h1.size - h2.size, h1.buckets ++ updated, h1.labels)
  }

  /** Σ p·log(p/q) over the key union; p=0 contributes 0, q=0 contributes 0
    * (the reference's lenient KL, Histograms.scala:18-36).
    */
  def kullbackLiebler(p: Map[String, Double], q: Map[String, Double]): Double = {
    val keys = p.keySet ++ q.keySet
    keys.foldLeft(0.0) { (acc, k) =>
      val pv = p.getOrElse(k, 0.0)
      val qv = q.getOrElse(k, 0.0)
      if (pv == 0 || qv == 0) acc else acc + pv * math.log(pv / qv)
    }
  }

  /** Buckets present now (q>ε) but unseen in the profile (p<ε)
    * (Histograms.scala:39-59).
    */
  def atypical(profile: Map[String, Double], current: Map[String, Double]): Set[String] =
    current.collect {
      case (k, q) if q > AtypicalThreshold && profile.getOrElse(k, 0.0) < AtypicalThreshold => k
    }.toSet

  /** Buckets present in both profile and current (Histograms.scala:62-82). */
  def typical(profile: Map[String, Double], current: Map[String, Double]): Set[String] =
    current.collect {
      case (k, q) if q > AtypicalThreshold && profile.getOrElse(k, 0.0) > AtypicalThreshold => k
    }.toSet

  def isTypicalEvent(profile: Map[String, Double], event: String): Boolean =
    profile.getOrElse(event, 0.0) > AtypicalThreshold

  def isAtypicalEvent(profile: Map[String, Double], event: String): Boolean =
    !isTypicalEvent(profile, event)

  /** Log-binning for pair/byte-count histograms: floor(ln(x·scale+1))
    * (HogSFlow.scala:1791,1898,2009).
    */
  def logBin(x: Double, scale: Double = 1.0): Long =
    math.floor(math.log(x * scale + 1)).toLong
}
