package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for corpus cleaning: the same logical
  * document arrives from different sources in different byte forms
  * (NFC "é" vs NFD "e"+U+0301), which silently defeats exact dedup,
  * fingerprinting, and token-equality joins. Two codegen'd scalar
  * expressions fix that at scan time:
  *
  *   - [[NfcNormalizeExpr]]: canonical composition (NFC) — the byte-stable
  *     form every hash/dedup stage should key on;
  *   - [[StripAccentsExpr]]: NFD decompose then drop nonspacing marks
  *     (category Mn) — the accent-insensitive fold used for matching and
  *     language-agnostic shingling. (Mn-only, the common fold; enclosing
  *     and spacing marks are kept — they are letters' own width.)
  *
  * Both run as static helper calls inside whole-stage codegen (the
  * [[CharBag]] pattern) and short-circuit on `isFullAscii` — ASCII is
  * closed under NFC and mark-free, so the dominant corpus case never
  * decodes the UTF8String at all. Cost appears only on rows that actually
  * contain non-ASCII bytes.
  */
object UnicodeNorm {

  def nfc(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }

  def stripAccents(s: UTF8String): UTF8String =
    if (s.isFullAscii) s
    else {
      val d = java.text.Normalizer.normalize(s.toString,
        java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val c = d.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
}

/** nfc_normalize(str): see [[UnicodeNorm.nfc]]. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "nfc_normalize"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.UnicodeNorm.nfc($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** strip_accents(str): see [[UnicodeNorm.stripAccents]]. */
case class StripAccentsExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "strip_accents"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    UnicodeNorm.stripAccents(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.UnicodeNorm.stripAccents($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeExpressions {
  def nfcNormalize(s: Column): Column =
    ColumnBridge.column(NfcNormalizeExpr(ColumnBridge.expression(s)))
  def stripAccents(s: Column): Column =
    ColumnBridge.column(StripAccentsExpr(ColumnBridge.expression(s)))
}
