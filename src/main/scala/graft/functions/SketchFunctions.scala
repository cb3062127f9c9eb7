package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching for 100 TB-scale pipelines.
  *
  * `approx_count_distinct` (Spark's HLL++) is the production default, but
  * its sketch internals aren't reproducible outside Spark, so nothing
  * hash-checks it cross-engine. This is a PORTABLE HyperLogLog (Flajolet
  * et al. 2007) built from the same md5-derived 60-bit hash the rest of
  * the engine uses: every step — register assignment, rank, the harmonic
  * sum — is integer-exact (the 2^-rank terms are summed as 2^(55-rank)
  * longs, so no floating-point association order can differ between
  * engines), and the final estimate is ONE double division. The DuckDB
  * oracle reproduces it bit-for-bit.
  *
  * m = 64 registers → standard error ≈ 1.04/√64 ≈ 13%. No small-range
  * correction is applied: below ~2.5·m (≈160) distinct values the raw
  * estimate biases high — use exact countDistinct there (at that
  * cardinality it's cheap anyway).
  */
object SketchFunctions {

  val Registers = 64 // 6-bit register index
  private val RankBits = 54 // 60-bit hash minus the register bits

  /** The whole constant factor α·m²·2^55 folded into one double, so the
    * estimate is a single K/Σ division in both engines (α₆₄ = 0.709).
    */
  val HllK: Double = 0.709 * Registers * Registers * math.pow(2.0, RankBits + 1)

  /** 60-bit md5-derived hash (shared convention with Dedup.contentHash —
    * but WITHOUT the mod-p reduction; HLL needs the full uniform width).
    */
  private def hash60(v: Column): Column =
    conv(substring(md5(v.cast("string")), 1, 15), 16, 10).cast("long")

  /** (register, rank): low 6 bits pick the register; the rank is the
    * 1-based position of the highest set bit counted from the top of the
    * remaining 54-bit word — computed via the length of the binary string
    * (integer-exact; floor(log2) in doubles can misround at powers of 2).
    */
  def hllRegisterRank(v: Column): (Column, Column) = {
    val h = hash60(v)
    val reg = pmod(h, lit(Registers.toLong))
    // shiftright, NOT floor(h/64): the hash exceeds 2^53, so a double
    // division would lose low bits and misplace the top-bit position
    val w = shiftright(h, 6)
    val rank = when(w === 0, lit(RankBits + 1))
      .otherwise(lit(RankBits + 1) - length(bin(w)))
    (reg, rank)
  }

  // ------------------------------------------------------------ Count-Min

  /** Count-Min sketch geometry: d independent hash rows × w counters.
    * ε ≈ e/w (overcount bound as a fraction of total count), δ ≈ e^-d.
    */
  val CmsRows = 4
  val CmsWidth = 256

  /** Row-j bucket for a value: an affine re-hash of the shared 60-bit
    * content hash (constants reused from the MinHash permutation table —
    * same cross-engine portability argument).
    */
  def cmsBucket(v: Column, j: Int): Column = {
    val (a, b) = graft.operators.Dedup.Perms(j)
    pmod((lit(a) * pmod(hash60(v), lit(graft.operators.Dedup.HashMod)) + lit(b))
      % lit(graft.operators.Dedup.HashMod), lit(CmsWidth.toLong))
  }

  /** The d×w counter table for `valueCol`: one groupBy over an exploded
    * (row, bucket) pair per input row — d·w (=1024) rows total regardless
    * of input size, which is the whole sketch guarantee. Integer counts,
    * so cross-engine parity is exact.
    */
  def cmsCounters(df: DataFrame, valueCol: String): DataFrame = {
    val pairs = (0 until CmsRows).map(j =>
      struct(lit(j).as("j"), cmsBucket(col(valueCol), j).as("bucket")))
    df.filter(col(valueCol).isNotNull)
      .select(explode(array(pairs: _*)).as("p"))
      .groupBy(col("p.j").as("j"), col("p.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each key in `keys` (a DataFrame with
    * `keyCol`): min over the d rows of the key's counter — never an
    * underestimate, overcounts bounded by collisions (ε·N w.h.p.).
    *
    * The counter lookup is a LEFT join with a 0 default: a key absent
    * from the sketched input probes buckets with no counter row, and CMS
    * must answer 0 for it — an inner join would silently drop the empty
    * buckets and report the min of the COLLIDING ones (inflated).
    */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val probes = (0 until CmsRows).map(j =>
      struct(lit(j).as("j"), cmsBucket(col(keyCol), j).as("bucket")))
    keys
      .select(col(keyCol), explode(array(probes: _*)).as("p"))
      .select(col(keyCol), col("p.j").as("j"), col("p.bucket").as("bucket"))
      .join(broadcast(counters), Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Mergeable per-group HLL register state: (groupCols…, __reg, __r).
    * This is the sketch's COMMUTATIVE MONOID — build it per batch/day/
    * partition, [[hllMergeRegisters]] across any grouping of the data,
    * and [[hllEstimate]] at read time; the estimate is identical to a
    * single pass because register max is associative. That mergeability
    * is what makes sketch columns storable in incremental rollup tables.
    * Nulls are ignored (countDistinct semantics) — a null would hash to
    * a null register row and inflate the present-register count.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val (reg, rank) = hllRegisterRank(col(valueCol))
    val gs = groupCols.map(col)
    df.filter(col(valueCol).isNotNull)
      .select(gs :+ reg.as("__reg") :+ rank.as("__rank"): _*)
      .groupBy(gs :+ col("__reg"): _*)
      .agg(max(col("__rank")).as("__r"))
  }

  /** Merge two register tables (max per (group, register)). */
  def hllMergeRegisters(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols.map(col) :+ col("__reg")): _*)
      .agg(max(col("__r")).as("__r"))

  /** Fold a register table to the distinct estimate. */
  def hllEstimate(regs: DataFrame, groupCols: Seq[String],
      estName: String = "hll_distinct"): DataFrame = {
    val gs = groupCols.map(col)
    // Σ 2^-rank scaled by 2^55: absent registers contribute rank 0 → 2^55
    regs
      .groupBy(gs: _*)
      .agg(sum(pow(lit(2.0), lit(RankBits + 1) - col("__r")).cast("long")).as("__s"),
        count(lit(1)).as("__present"))
      .select(gs :+
        round(lit(HllK) /
          (col("__s") + (lit(Registers) - col("__present")) * lit(1L << (RankBits + 1))), 6)
          .as(estName): _*)
  }

  /** Per-group HLL distinct estimate of `valueCol`, as
    * groupBy(groupCols).agg(...): two codegen hash aggregations — exactly
    * the shape of a countDistinct, but the shuffle carries at most
    * |groups|·64 register rows instead of every distinct value, which is
    * the entire point at 100 TB.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      estName: String = "hll_distinct"): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol), groupCols, estName)
}
