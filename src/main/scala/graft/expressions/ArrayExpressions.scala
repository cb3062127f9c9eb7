package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multiset membership count: how many elements of a `array<string>`
  * column (repeats included) belong to a fixed word set.
  *
  * This is the language-ID / stopword-ratio kernel (`TextFunctions.
  * stopwordRatio`). The HOF form `size(filter(toks, t => t.isin(words)))`
  * evaluates its lambda INTERPRETED — one closure dispatch plus an O(|words|)
  * linear `isin` scan per token, and language-ID runs it once per language
  * profile. This node compiles to a hash-set probe per token inside
  * whole-stage codegen: O(tokens) per row with no allocation, ~an order of
  * magnitude less work on corpus-wide passes.
  *
  * Null array → null (nullIntolerant); null ELEMENTS don't count as hits.
  */
case class CountInSet(child: Expression, words: Seq[String]) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_count_in_set requires array<string> input, got $other")
  }

  // Shared by interpreted eval and generated code; UTF8String keys so the
  // probe never materializes java.lang.String per token.
  @transient private lazy val set: java.util.HashSet[UTF8String] = CountInSet.build(words)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // The set is built once per operator instance and referenced from the
    // generated class — not rebuilt per row.
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_count_in_set"
}

object CountInSet {
  def build(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(8, words.size * 2))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
}

/** MinHash signature straight from the TOKEN array in one compiled pass:
  * each n-token shingle is assembled (space-joined, identical to
  * `concat_ws(" ", slice(toks, i, n))`), md5'd, reduced to the 60-bit
  * content hash (first 15 hex chars mod `mod` — bit-identical to
  * `Dedup.contentHash`'s `conv(substring(md5(s),1,15),16,10) % mod`), and
  * folded into the (a·h+b) mod `mod` minimum for every permutation while
  * the digest is hot.
  *
  * This is the stream-side minhash kernel. The row-local HOF pipeline
  * (`shingles` transform + per-permutation `array_min(transform(…))`)
  * evaluates interpreted — per-shingle slice/concat allocation plus a
  * re-derived digest array per permutation after projection collapse —
  * measured 6–8 s per 5k-doc micro-batch vs ~0.5 s for this node. One
  * MessageDigest per thread, one reused byte buffer per row.
  *
  * Null token array → null; null TOKENS are treated as empty strings (a
  * case `TextFunctions.tokens` — a filtered split — can never produce).
  * Fewer than `shingleSize` tokens → all minimums stay at `mod` (callers
  * filter shingle-less docs first).
  */
case class MinhashSig(child: Expression, shingleSize: Int, permA: Array[Long],
    permB: Array[Long], mod: Long) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig requires array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    MinhashSig.compute(input.asInstanceOf[ArrayData], shingleSize, permA, permB, mod)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("permA", permA, "long[]")
    val bRef = ctx.addReferenceObj("permB", permB, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.MinhashSig.compute($a, $shingleSize, $aRef, $bRef, ${mod}L);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinhashSig {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(toks: ArrayData, shingleSize: Int, permA: Array[Long],
      permB: Array[Long], mod: Long): ArrayData = {
    val p = permA.length
    val mins = new Array[Long](p)
    java.util.Arrays.fill(mins, mod)
    val md = tlMd.get()
    val n = toks.numElements()
    // token bytes decoded once; shingle buffer reused across positions
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) Array.emptyByteArray
              else toks.getUTF8String(i).getBytes
      i += 1
    }
    i = 0
    while (i <= n - shingleSize) {
      md.reset()
      var t = 0
      while (t < shingleSize) {
        if (t > 0) md.update(' '.toByte)
        md.update(tb(i + t))
        t += 1
      }
      val d = md.digest()
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var v = 0L
      var k = 0
      while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = (v << 4) | ((d(7) & 0xffL) >>> 4)
      val h = v % mod
      var j = 0
      while (j < p) {
        val cand = (permA(j) * h + permB(j)) % mod
        if (cand < mins(j)) mins(j) = cand
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }
}

/** All ordered index pairs (i < j) of an array's elements, as
  * `array<struct<doc_a,doc_b>>` — the bucket-expansion kernel of
  * `Dedup.exactSubstringSpans` (d11). The composed HOF form
  * `flatten(transform(ds, (x,i) => transform(slice(ds,i+2,n), y =>
  * struct(x,y))))` evaluates its lambdas interpreted and allocates a
  * slice COPY per outer position plus boxed elements throughout — at
  * 10⁸ expanded pairs that is the dominant cost of the whole operator.
  * This node emits the identical pair sequence from one compiled loop:
  * a two-long row per pair and nothing else.
  *
  * Pair order matches the HOF form exactly: (a(0),a(1)), (a(0),a(2)),
  * …, (a(n−2),a(n−1)). Null array → null; n < 2 → empty.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_a", LongType, nullable = false),
      org.apache.spark.sql.types.StructField("doc_b", LongType, nullable = false))),
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_pair_combinations requires array<bigint> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    PairCombinations.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.PairCombinations.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pair_combinations"
}

object PairCombinations {
  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n * (n - 1) / 2
    val out = new Array[Any](m)
    var w = 0
    var i = 0
    while (i < n - 1) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(w) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](x, a.getLong(j)))
        w += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Content-defined chunk fingerprints ([[graft.operators.Dedup.cdcChunkDedup]]'s
  * kernel): tokenized text in, md5 hex fingerprint per chunk out, where a
  * chunk boundary falls after any token whose trailing `w`-token window's
  * md5 starts with hex nibble 0 (the LBFS/FastCDC cut rule, P = 1/16).
  *
  * The exploded form (posexplode → three same-spec window passes →
  * collect_list per chunk) shuffles every token twice and re-materializes
  * the chunk text through an aggregate; this node does the whole pass
  * row-locally — token bytes decoded once, one rolling MessageDigest for
  * the gram windows and one for the running chunk — so the only shuffle
  * left in d21 is the corpus-level fingerprint groupBy. Fingerprints are
  * bit-identical to the window form and to the DuckDB oracle (md5 of the
  * chunk's tokens joined by single spaces).
  *
  * Null input → null; empty token array → empty fingerprint array.
  */
case class CdcChunkFps(child: Expression, w: Int) extends UnaryExpression {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) if w >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunk_fps requires w >= 1, got $w")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunk_fps requires array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    CdcChunkFps.compute(input.asInstanceOf[ArrayData], w)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CdcChunkFps.compute($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunk_fps"
}

object CdcChunkFps {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val HexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = HexDigits(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(toks: ArrayData, w: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val md = tlMd.get()
    // token bytes decoded once (null elements can't come from tokens(),
    // but degrade to empty rather than NPE)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      tb(i) = if (toks.isNullAt(i)) Array.emptyByteArray
              else toks.getUTF8String(i).getBytes
      i += 1
    }
    // boundary after index e ⟺ the w-window starting at e−w+1 cuts
    val bnd = new Array[Boolean](n)
    var p = 0
    while (p <= n - w) {
      md.reset()
      var t = 0
      while (t < w) {
        if (t > 0) md.update(' '.toByte)
        md.update(tb(p + t))
        t += 1
      }
      // first hex nibble '0' ⟺ high 4 bits of byte 0 are zero
      if ((md.digest()(0) & 0xf0) == 0) bnd(p + w - 1) = true
      p += 1
    }
    // assemble chunk fingerprints: md5 of tokens joined by single spaces
    val out = new scala.collection.mutable.ArrayBuffer[Any](8)
    md.reset()
    var inChunk = false
    i = 0
    while (i < n) {
      if (inChunk) md.update(' '.toByte)
      md.update(tb(i))
      inChunk = true
      if (bnd(i) || i == n - 1) {
        out += hex(md.digest())
        md.reset()
        inChunk = false
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Word n-gram shingles straight from the TOKEN array in one compiled
  * pass: each output element is `n` consecutive tokens space-joined —
  * byte-identical to both prior shingling forms (the row-local
  * `transform(sequence…, i => concat_ws(" ", slice(toks, i, n)))` HOF and
  * the posexplode + window-`lead` assembly), whose costs this node
  * removes: the HOF evaluates its lambda INTERPRETED with a slice copy
  * per position, and the window form pays a full doc-keyed exchange of
  * every token row just to see neighboring tokens — on a corpus pass
  * that exchange is the whole corpus shuffled once per shingling.
  *
  * Fewer than `n` tokens → empty array (the [[graft.functions.
  * TextFunctions.shingles]] contract; explode callers get no rows, the
  * window form's behavior). Null array → null (nullIntolerant) — a
  * DIFFERENCE from the old HOF `shingles`, whose size(null) = −1 routed
  * a null token array to the otherwise-branch and returned an EMPTY
  * array; `TextFunctions.tokens` never produces null, and every current
  * call site feeds this node from it, so the divergence is unreachable
  * today — callers feeding nullable arrays directly must coalesce.
  * Null TOKENS are treated as empty strings (also unreachable via
  * `tokens`).
  */
case class TokenShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_token_shingles requires array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    TokenShingles.compute(input.asInstanceOf[ArrayData], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TokenShingles.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_token_shingles"
}

/** SimHash signature straight from the TOKEN array in one compiled pass —
  * the signature head of the whole simhash family (d3/d3v/d6/d12/d13/
  * d13v and every `nearDupMethod = simhash` pipeline). Bit-identical to
  * the exploded aggregate form it replaces (`Dedup.simhashOf`'s
  * posexplode → 16 hex-digit projections → `bits` conditional-sum votes →
  * Σ 2^b reassembly): per token, bit `b` of md5(token) (hex nibble b/4,
  * bit b%4 within the nibble, nibbles in hex-string order) votes ±1;
  * signature bit `b` is 1 iff the vote sum is strictly positive. At
  * bits = 64 the top bit is the long's sign bit — the same exact
  * two's-complement value the aggregate form built by adding 1L << 63.
  *
  * What the swap removes is not the vote aggregate's exchange (partial
  * aggregation made that small) but the per-token row machinery: the
  * explode materializing one row per token, 16 substring/ascii digit
  * projections, and a 32/64-column hash-aggregate update per token row —
  * here it is one digest and one tight vote loop per token inside the
  * row. The corpus never leaves its scan partitioning.
  *
  * The aggregate form merged duplicate ids into ONE signature over the
  * union of their tokens (a groupBy property no caller used — every
  * consumer feeds unique-id frames); this node is one signature per ROW.
  * Zero tokens → all votes 0 → signature 0; `Dedup.simhashOf` keeps its
  * docs-with-≥1-token output contract with an explicit filter. Null
  * array → null (unreachable via `tokens`).
  */
case class SimhashSig(child: Expression, bits: Int) extends UnaryExpression {
  require(bits % 4 == 0 && bits >= 4 && bits <= 64, s"bits=$bits")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash_sig requires array<string> input, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[ArrayData], bits)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.SimhashSig.compute($a, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash_sig"
}

object SimhashSig {
  private val tlMd = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(toks: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val md = tlMd.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      md.reset()
      if (!toks.isNullAt(i)) md.update(toks.getUTF8String(i).getBytes)
      val d = md.digest()
      var b = 0
      while (b < bits) {
        // hex nibble b/4 of the digest string: even nibbles are a byte's
        // high 4 bits (hex prints high nibble first), odd its low 4
        val nib = b >> 2
        val byteV = d(nib >> 1) & 0xff
        val v = if ((nib & 1) == 0) byteV >>> 4 else byteV & 0xf
        if (((v >> (b & 3)) & 1) == 1) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sh = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }
}

object TokenShingles {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code (one call per row). */
  def compute(toks: ArrayData, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < n)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val t = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      t(i) = if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](len - n + 1)
    val parts = new Array[UTF8String](n)
    i = 0
    while (i <= len - n) {
      var j = 0
      while (j < n) { parts(j) = t(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts: _*)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
