package graft.extensions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, LongType}

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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
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

  val all: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_logbin",
      new ExpressionInfo("graft", "graft_logbin"),
      logbinBuilder _),
    ("graft_hamming",
      new ExpressionInfo("graft", "graft_hamming"),
      hammingBuilder _),
    ("graft_net24",
      new ExpressionInfo("graft", "graft_net24"),
      net24Builder _),
    ("graft_dot",
      new ExpressionInfo("graft", "graft_dot"),
      (args: Seq[Expression]) => graft.expressions.DotProduct(args(0), args(1))),
  )

  /** Register into a live session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
