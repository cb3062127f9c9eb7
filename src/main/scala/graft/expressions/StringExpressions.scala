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
