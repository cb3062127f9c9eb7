package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** SQL-surface registration for the engine's domain functions. Most are
  * native Catalyst expression trees (compositions of codegen'd builtins —
  * no UDF closure, no codegen opt-out); `graft_dot` is the one genuinely
  * custom Expression ([[graft.expressions.DotProduct]], with doGenCode) —
  * added because higher-order-function lambdas evaluate interpreted,
  * which dominates all-pairs similarity queries.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.extensions.GraftExtensions` at session
  *    build time (the SparkSessionExtensions injection point);
  *  - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // optimizer rules: geo-radius predicates gain pushable range bounds
    ext.injectOptimizerRule(_ => GeoRadiusPrefilter)
  }
}

object GraftFunctions {

  /** graft_logbin(x): floor(ln(x+1)) as long — H7's heavy-tail binning. */
  private def logbinBuilder(args: Seq[Expression]): Expression =
    Cast(Floor(Log(Add(Cast(args.head, DoubleType), Literal(1.0)))), LongType)

  /** graft_hamming(a, b): popcount of xor — simhash distance. */
  private def hammingBuilder(args: Seq[Expression]): Expression =
    Cast(BitwiseCount(BitwiseXor(Cast(args(0), LongType), Cast(args(1), LongType))), LongType)

  /** graft_net24(ip): /24 significant network (F4). */
  private def net24Builder(args: Seq[Expression]): Expression =
    SubstringIndex(args.head, Literal("."), Literal(3))

  /** Arity gate so a wrong-arity SQL call (`graft_dot(x)`) fails with a
    * clear message at analysis time instead of an IndexOutOfBounds from
    * the builder.
    */
  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.size == n) b(args)
      else throw new IllegalArgumentException(
        s"$name expects $n argument(s), got ${args.size}")

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_logbin",
      new ExpressionInfo("graft", "graft_logbin"),
      arity("graft_logbin", 1)(logbinBuilder)),
    ("graft_hamming",
      new ExpressionInfo("graft", "graft_hamming"),
      arity("graft_hamming", 2)(hammingBuilder)),
    ("graft_net24",
      new ExpressionInfo("graft", "graft_net24"),
      arity("graft_net24", 1)(net24Builder)),
    ("graft_dot",
      new ExpressionInfo("graft", "graft_dot"),
      arity("graft_dot", 2)(args => graft.expressions.DotProduct(args(0), args(1)))),
    ("graft_strip_accents",
      new ExpressionInfo("graft", "graft_strip_accents"),
      arity("graft_strip_accents", 1)(args => graft.expressions.StripAccents(args.head))),
    // graft_haversine(lat1, lon1, lat2, lon2): km on the reference's
    // 6372.8 km sphere — built as native Catalyst nodes (a Column-bridge
    // round-trip yields unresolved ColumnNode wrappers the registry path
    // can't resolve), grouped exactly like NetFunctions.haversine so SQL
    // and Column forms are bit-identical.
    ("graft_haversine",
      new ExpressionInfo("graft", "graft_haversine"),
      arity("graft_haversine", 4)(args => {
        val Seq(lat1, lon1, lat2, lon2) = args.map(Cast(_, DoubleType)).toSeq
        def sin2half(d: Expression) =
          Pow(Sin(Divide(ToRadians(d), Literal(2.0))), Literal(2.0))
        val a = Add(
          sin2half(Subtract(lat2, lat1)),
          Multiply(Multiply(sin2half(Subtract(lon2, lon1)),
            Cos(ToRadians(lat1))), Cos(ToRadians(lat2))))
        Multiply(Literal(2 * 6372.8), Asin(Sqrt(a)))
      })),
    // graft_human_bytes(n): the reference's pretty-printer (humanBytes).
    ("graft_human_bytes",
      new ExpressionInfo("graft", "graft_human_bytes"),
      arity("graft_human_bytes", 1)(args => {
        val b = Cast(args.head, DoubleType)
        val kb = 1024.0; val mb = kb * 1024; val gb = mb * 1024
        def fmt(suffix: String, div: Double) =
          FormatString(Literal(s"%.1f$suffix"), Divide(b, Literal(div)))
        CaseWhen(Seq(
          (LessThan(b, Literal(kb)),
            Concat(Seq(Cast(Cast(b, LongType), StringType), Literal("B")))),
          (LessThan(b, Literal(mb)), fmt("KB", kb)),
          (LessThan(b, Literal(gb)), fmt("MB", mb))),
          Some(fmt("GB", gb)))
      })),
    // graft_count_in_set(toks, array('the','a',...)): the word-set arg must
    // be a foldable array literal — it becomes the expression's static set.
    ("graft_count_in_set",
      new ExpressionInfo("graft", "graft_count_in_set"),
      arity("graft_count_in_set", 2)(args => {
        val wordsArg = args(1)
        if (!wordsArg.foldable) throw new IllegalArgumentException(
          "graft_count_in_set expects a foldable array<string> literal as its second argument")
        val words = wordsArg.eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            (0 until a.numElements()).filterNot(a.isNullAt)
              .map(i => a.getUTF8String(i).toString)
          case _ => throw new IllegalArgumentException(
            "graft_count_in_set expects an array<string> literal as its second argument")
        }
        graft.expressions.CountInSet(args.head, words)
      })),
    // graft_zvalue(x, y, bits): 2-dim Morton interleave of the low `bits`
    // bits of two bucket ids — the same bit layout as Layout.zvalue, so a
    // SQL user clusters/prunes identically to the Scala layout jobs. Pure
    // shift/mask/or nodes, fully codegen'd; `bits` must be a foldable
    // literal (it fixes the expression tree's size).
    ("graft_zvalue",
      new ExpressionInfo("graft", "graft_zvalue"),
      arity("graft_zvalue", 3)(args => {
        val bitsArg = args(2)
        if (!bitsArg.foldable) throw new IllegalArgumentException(
          "graft_zvalue expects a foldable integer literal as its third argument")
        val bits = bitsArg.eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"graft_zvalue bits must be an integer literal, got $other")
        }
        if (bits < 1 || bits > 31) throw new IllegalArgumentException(
          s"graft_zvalue bits must be in [1, 31], got $bits")
        Seq(Cast(args(0), LongType), Cast(args(1), LongType)).zipWithIndex
          .flatMap { case (c, d) =>
            (0 until bits).map(i => ShiftLeft(
              BitwiseAnd(ShiftRight(c, Literal(i)), Literal(1L)),
              Literal(i * 2 + d)): Expression)
          }.reduce(BitwiseOr)
      })),
    // graft_minhash_sig(toks): the corpus-standard 12-permutation MinHash
    // signature (array<long>) from a token array — same constants as
    // Dedup.lshBands, so SQL users band/bucket identically to the Scala
    // pipelines.
    ("graft_minhash_sig",
      new ExpressionInfo("graft", "graft_minhash_sig"),
      arity("graft_minhash_sig", 1)(args =>
        graft.expressions.MinhashSig(args.head,
          graft.operators.Dedup.ShingleSize,
          graft.operators.Dedup.Perms.map(_._1).toArray,
          graft.operators.Dedup.Perms.map(_._2).toArray,
          graft.operators.Dedup.HashMod))),
  )

  /** Register into a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit = {
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    // the runtime hook for optimizer rules on an already-built session
    if (!spark.experimental.extraOptimizations.contains(GeoRadiusPrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ GeoRadiusPrefilter
  }
}
