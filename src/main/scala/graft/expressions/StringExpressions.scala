package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Accent stripping with full Unicode semantics (P7, the reference's
  * `StringUtils.stripAccents` calls in HogAuth.scala:299-312): NFD
  * decomposition followed by removal of every combining mark
  * (category Mn). This matches DuckDB's `strip_accents` (utf8proc)
  * byte-for-byte on Latin text — characters without a canonical
  * decomposition (Ł, Ø, Æ, ß, Đ) pass through unchanged in both
  * engines, so oracle comparisons hold.
  *
  * A custom Expression (not a UDF) so the null handling, codegen
  * splitting, and constant folding all behave like a builtin; the body
  * is a static method call, which whole-stage codegen inlines into the
  * generated operator without closure dispatch. The ASCII fast path
  * skips normalization entirely — at 100 TB most text is ASCII and pays
  * only one scan over the bytes.
  */
case class StripAccents(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_strip_accents requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    StripAccents.strip(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StripAccents.strip($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_strip_accents"
}

object StripAccents {
  /** Static entry point shared by interpreted eval and generated code. */
  def strip(u: UTF8String): UTF8String = {
    // ASCII cannot carry accents; skip the String round-trip.
    if (u.numBytes() == 0 || isAscii(u)) return u
    val nfd = Normalizer.normalize(u.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  private def isAscii(u: UTF8String): Boolean = {
    val n = u.numBytes()
    var i = 0
    while (i < n) {
      if ((u.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}

/** Distinct 64-bit hashes of every character k-gram of a string, in one
  * compiled pass — the gram-key kernel behind `Dedup.exactSubstringSpans`
  * (d11). The composed form
  * `xxhash64(explode(array_distinct(transform(sequence…, substr…))))`
  * allocates L−k+1 k-char substring copies per document and re-reads each
  * character k times (O(L·k) work, ~24× the bytes at k=24, dominated by
  * UTF8String slicing); this node slides a polynomial rolling hash over
  * the code points — O(1) per position after the first window — and
  * finalizes each window hash with a murmur-style avalanche mixer, so
  * only equality semantics change (a different 64-bit gram key space);
  * the operator's OUTPUT (shared-gram counts) is unchanged modulo 64-bit
  * collisions, exactly like the xxhash64 form it replaces.
  *
  * Grams are CHARACTER windows (code points, matching `substr`
  * semantics, surrogate pairs counted once); hashes are deduped per row
  * with an open-addressing long set (no boxing) before the array is
  * built. Strings shorter than k return an empty array; null → null.
  */
case class KGramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_kgram_hashes requires k >= 1, got $k")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_kgram_hashes requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    KGramHashes.compute(input.asInstanceOf[UTF8String], k)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.KGramHashes.compute($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_kgram_hashes"
}

object KGramHashes {
  // polynomial base (odd, large) for the rolling window hash mod 2^64
  private final val B = 0x100000001b3L

  /** murmur3 fmix64 — full-avalanche finalizer so the weak low-order
    * structure of a plain polynomial hash never reaches the shuffle
    * partitioner or the bucket grouping.
    */
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(s: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    // code-point extraction: one pass, int per character (matches the
    // character semantics of substr on any text, not just ASCII)
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    // B^(k-1) for the slide-out term
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk *= B; e += 1 }
    val m = n - k + 1
    // open-addressing distinct set sized for the worst case (all unique)
    var capBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(4L, m.toLong * 2 - 1))
    val cap = 1 << capBits
    val mask = cap - 1
    val table = new Array[Long](cap) // 0 = empty (0-hash remapped below)
    val out = new Array[Long](m)
    var outN = 0
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + cps(i); i += 1 } // first window
    var pos = 0
    while (pos < m) {
      var v = fmix64(h)
      if (v == 0L) v = 1L // reserve 0 as the empty-slot marker
      var slot = (v.toInt ^ (v >>> 32).toInt) & mask
      var seen = false
      while (!seen && table(slot) != 0L) {
        if (table(slot) == v) seen = true else slot = (slot + 1) & mask
      }
      if (!seen) {
        table(slot) = v
        out(outN) = v; outN += 1
      }
      if (pos + 1 < m) { h = (h - cps(pos) * bk) * B + cps(pos + k) }
      pos += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, outN))
  }
}

/** Winnowed k-gram fingerprints (Schleimer, Wilkerson, Aiken,
  * "Winnowing: local algorithms for document fingerprinting",
  * SIGMOD'03 — the MOSS selection rule): from every window of `w`
  * consecutive character k-grams, select the lexicographically smallest
  * gram; return the DISTINCT rolling hashes of the selected grams.
  * Expected selection density is ~2/(w+1) of all grams, and any
  * substring span of at least w+k−1 shared characters contains a full
  * window, so the two documents are guaranteed to select (and share) at
  * least one gram from it — the property that makes this the reduced-
  * volume production contract for substring-span dedup (d11's all-gram
  * form keys every position). Note the asymmetry: the density cut
  * applies fully to the KEYED ROW count (the gram shuffle), but grams
  * whose surrounding context is shared across documents are selected in
  * all of them (the guarantee depends on it), so genuinely duplicated
  * spans keep their full bucket frequency — coincidental long-tail
  * collisions thin by ~((w+1)/2)², content-bound candidates don't
  * (measured numbers in `Dedup.winnowedSubstringSpans`).
  *
  * Engine-portability contract: SELECTION compares literal grams in
  * code-point order (== UTF-8 byte order, what an oracle engine's
  * `min()` over substrings computes), while the returned KEY is the
  * same finalized rolling hash [[KGramHashes]] emits — equal grams hash
  * equal across documents, so bucket joins behave identically and an
  * oracle that selects literal grams reproduces the same pair counts
  * modulo 64-bit collisions. Short documents (fewer than w grams but at
  * least one) winnow a single whole-list window; strings shorter than k
  * return an empty array; null → null. Duplicate-value ties select the
  * value (output is a distinct value set), so tie-breaking order is
  * irrelevant — the convention an ORDER-free SQL `min()` shares.
  */
case class WinnowedGramHashes(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType if k >= 1 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case _: StringType => TypeCheckResult.TypeCheckFailure(
      s"graft_winnowed_gram_hashes requires k >= 1 and w >= 1, got k=$k w=$w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_winnowed_gram_hashes requires a string input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowedGramHashes.compute(input.asInstanceOf[UTF8String], k, w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.WinnowedGramHashes.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnowed_gram_hashes"
}

object WinnowedGramHashes {
  private final val B = 0x100000001b3L

  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  /** gram-at-i < gram-at-j in code-point order (grams are cps[i..i+k) vs
    * cps[j..j+k) — equal length, so plain elementwise compare).
    */
  private def gramLt(cps: Array[Int], i: Int, j: Int, k: Int): Boolean = {
    var t = 0
    while (t < k) {
      val a = cps(i + t); val b = cps(j + t)
      if (a != b) return a < b
      t += 1
    }
    false
  }

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(s: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp; ci += 1
      off += Character.charCount(cp)
    }
    val m = n - k + 1 // gram count
    // rolling hashes for every gram position (the d11 key space)
    val hs = new Array[Long](m)
    var bk = 1L
    var e = 0
    while (e < k - 1) { bk *= B; e += 1 }
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + cps(i); i += 1 }
    var pos = 0
    while (pos < m) {
      var v = fmix64(h)
      if (v == 0L) v = 1L
      hs(pos) = v
      if (pos + 1 < m) { h = (h - cps(pos) * bk) * B + cps(pos + k) }
      pos += 1
    }
    val win = math.min(w, m) // short docs: one whole-list window
    val nWin = m - win + 1
    // per-window lexicographic min position, slid with memoized min
    var capBits = 64 - java.lang.Long.numberOfLeadingZeros(math.max(4L, nWin.toLong * 2 - 1))
    val cap = 1 << capBits
    val mask = cap - 1
    val table = new Array[Long](cap)
    val out = new Array[Long](nWin)
    var outN = 0
    var minPos = -1
    var start = 0
    while (start < nWin) {
      if (minPos < start) {
        // min left the window: rescan
        minPos = start
        var j = start + 1
        while (j < start + win) {
          if (gramLt(cps, j, minPos, k)) minPos = j
          j += 1
        }
      } else {
        // only the entrant can beat the memoized min (select the VALUE:
        // an equal entrant changes nothing, so strict less-than suffices)
        val entrant = start + win - 1
        if (gramLt(cps, entrant, minPos, k)) minPos = entrant
      }
      val v = hs(minPos)
      var slot = (v.toInt ^ (v >>> 32).toInt) & mask
      var seen = false
      while (!seen && table(slot) != 0L) {
        if (table(slot) == v) seen = true else slot = (slot + 1) & mask
      }
      if (!seen) {
        table(slot) = v
        out(outN) = v; outN += 1
      }
      start += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, outN))
  }
}
