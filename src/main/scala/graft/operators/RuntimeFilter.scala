package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter runtime pre-filtering for selective joins — the pattern
  * Spark's own `InjectRuntimeFilter` rule applies to shuffle joins, exposed
  * as a library operator so a query can apply it explicitly (e.g. before a
  * multi-stage pipeline where the optimizer can't see the join yet).
  *
  * Why not just broadcast the build side? A hash-set broadcast of 100 M
  * keys is gigabytes; the bloom bitmap is FIXED-SIZE (m/8 bytes, e.g.
  * 128 KiB for m=2^20) regardless of key count, at the cost of a tunable
  * false-positive rate. False positives only cost wasted shuffle rows —
  * the exact join that follows removes them, so results stay exact.
  *
  * Build = one aggregate over the build side's keys (distinct bit
  * positions → 64-bit words, OR-combined); the word map is collected
  * (≤ m/64 longs) and embedded as a literal array in the probe-side
  * filter, which stays inside whole-stage codegen.
  */
object RuntimeFilter {

  /** k probe positions for `key` via double hashing on two xxhash64
    * streams: pos_i = (h1 + i·h2) mod m. Everything in non-negative
    * long arithmetic — no doubles anywhere.
    */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] = {
    val m = lit(mBits.toLong)
    val h1 = pmod(xxhash64(key), m)
    val h2 = pmod(xxhash64(key, lit("graft_bloom_h2")), m)
    (0 until k).map(i => pmod(h1 + lit(i.toLong) * h2, m))
  }

  /** Aggregate the build side's keys into an m-bit bloom bitmap, returned
    * as a dense Array[Long] of m/64 words (missing words zero-filled).
    * Runs as a Spark job over `build`; only the fixed-size word map comes
    * back to the driver — the same shape as Spark's own runtime-filter
    * subquery result.
    */
  def buildBitmap(build: DataFrame, key: Column, mBits: Int = 1 << 20,
                  k: Int = 3): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val words = build
      .select(explode(array(positions(key, mBits, k): _*)).as("pos"))
      .distinct()
      .select(shiftright(col("pos"), 6).as("w"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy(col("w")).agg(bit_or(col("mask")).as("word"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
    bitmap
  }

  /** Probe-side membership test against a built bitmap: true iff all k
    * probe bits are set. Pure column expression over a literal array —
    * codegen-friendly, no UDF. May return true for absent keys (false
    * positive); never false for present ones.
    */
  def mightContain(key: Column, bitmap: Array[Long], mBits: Int = 1 << 20,
                   k: Int = 3): Column = {
    val words = lit(bitmap)
    positions(key, mBits, k)
      .map { pos =>
        val word = element_at(words, (shiftright(pos, 6) + 1).cast("int"))
        call_function("shiftright", word, (pos % 64).cast("int")) % 2 =!= 0
      }
      .reduce(_ && _)
  }

  /** Exact semi-join of `probe` against `build`'s keys with a bloom
    * pre-filter: the bloom pass drops the bulk of non-matching probe rows
    * before the shuffle; the exact join keeps the result identical to a
    * plain semi-join.
    */
  def bloomSemiJoin(probe: DataFrame, probeKey: String, build: DataFrame,
                    buildKey: String, mBits: Int = 1 << 20, k: Int = 3): DataFrame = {
    val keys = build.select(col(buildKey)).distinct()
    val bitmap = buildBitmap(keys, col(buildKey), mBits, k)
    probe.filter(mightContain(col(probeKey), bitmap, mBits, k))
      .join(keys, probe(probeKey) === keys(buildKey), "left_semi")
  }
}
