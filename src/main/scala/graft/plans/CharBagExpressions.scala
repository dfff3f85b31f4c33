package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character-multiset ("bag") prefilter for edit-distance candidate pairs.
  *
  * One edit operation changes a string's character multiset by at most 2
  * units of L1 distance, so `L1(bag(a), bag(b)) > 2k` proves
  * `levenshtein(a, b) > k` — an admissible reject that costs a 27-element
  * byte compare instead of a banded DP sweep. Two expressions implement the
  * bound as a codegen-friendly pair:
  *
  *   - [[CharBagExpr]]: string → 27-byte histogram (a-z + space, lowercased,
  *     everything else ignored) in ONE pass over the string. The projection
  *     to 27 bins and the 255 cap can only SHRINK L1, so the bound stays
  *     admissible (no qualifying pair is ever rejected). Emitting `binary`
  *     keeps the per-row payload at 27 bytes through the candidate join's
  *     shuffle — the declarative `array<int>` form costs ~5x that in
  *     UnsafeRow format and 27 `replace`+`length` scans per row to build.
  *   - [[BagL1WithinExpr]]: (bag, bag) → boolean, with the running sum
  *     exiting as soon as it crosses the bound — on far-apart pairs (the
  *     common case in a near-dup verify) the loop touches a handful of bins.
  *
  * Both stay inside whole-stage codegen via static helper calls, exactly the
  * [[EditDistance]] pattern.
  */
object CharBag {
  val Bins = 27 // a-z + space

  /** Single-pass 27-bin byte histogram. Counts saturate at 255 (admissible:
    * saturation only lowers the measured L1). ASCII input — the common case
    * for cleansed corpus text — is read from the UTF8String's bytes in
    * place, no String decode; the non-ASCII path pays one toString. */
  def bag(s: UTF8String): Array[Byte] = {
    val out = new Array[Byte](Bins)
    if (s.isFullAscii) {
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val n = s.numBytes
      var i = 0
      while (i < n) {
        val c = (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x7f).toChar
        addChar(out, c)
        i += 1
      }
    } else {
      val str = s.toString
      var i = 0
      val n = str.length
      while (i < n) {
        addChar(out, str.charAt(i))
        i += 1
      }
    }
    out
  }

  private def addChar(out: Array[Byte], c: Char): Unit = {
    val bin =
      if (c >= 'a' && c <= 'z') c - 'a'
      else if (c >= 'A' && c <= 'Z') c - 'A'
      else if (c == ' ') 26
      else -1
    if (bin >= 0 && (out(bin) & 0xff) < 0xff) out(bin) = (out(bin) + 1).toByte
  }

  /** ADMISSIBLE upper bound on DuckDB-semantics Jaro-Winkler (see
    * [[graft.operators.EntityResolution.jaroWinkler]]) from lengths + the
    * 27-bin bags — the cheap reject that gates the O(l1*l2) window scan:
    *
    *   m <= sum_k min(c1_k, c2_k) over TRUE per-char histograms. Split
    *   into bag bins vs uncounted chars (digits/punct + saturation loss):
    *   m <= (sa + sb - L1(bag1,bag2))/2 + (l1 - sa) + (l2 - sb), each
    *   uncounted char granted a match (lowercased bins also over-grant
    *   case-insensitive matches — all slack is one-sided). Clamp to
    *   min(l1, l2), take t = 0, and apply the full p=4 Winkler bonus
    *   whenever the bounded jaro clears 0.7 (if the bound doesn't clear
    *   0.7 the true jaro can't either, so the no-bonus branch is safe).
    *
    * Every relaxation only RAISES the bound, so `jwUpperBound < s` proves
    * `jaroWinkler < s`: a filter on it drops no true match. */
  def jwUpperBound(s1: UTF8String, s2: UTF8String): Double = {
    val l1 = if (s1.isFullAscii) s1.numBytes else s1.toString.length
    val l2 = if (s2.isFullAscii) s2.numBytes else s2.toString.length
    if (l1 == 0 || l2 == 0) return 0.0
    val a = bag(s1); val b = bag(s2)
    var sa = 0; var sb = 0; var l1d = 0
    var i = 0
    while (i < Bins) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      sa += x; sb += y
      l1d += (if (x > y) x - y else y - x)
      i += 1
    }
    var m = (sa + sb - l1d) / 2 + (l1 - sa) + (l2 - sb)
    val mn = if (l1 < l2) l1 else l2
    if (m > mn) m = mn
    if (m <= 0) return 0.0
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + 1.0) / 3.0
    if (jaro <= 0.7) jaro else jaro + 0.4 * (1.0 - jaro)
  }

  /** True iff the L1 distance between two equal-length byte histograms is
    * <= bound, exiting early once the running sum crosses it. */
  def l1Within(a: Array[Byte], b: Array[Byte], bound: Int): Boolean = {
    val n = math.min(a.length, b.length)
    var s = 0
    var i = 0
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      s += (if (d < 0) -d else d)
      if (s > bound) return false
      i += 1
    }
    // length-mismatched bags only arise from caller error; surplus bins on
    // the longer side still count toward the distance
    var j = n
    val longer = if (a.length >= b.length) a else b
    while (j < longer.length) {
      s += (longer(j) & 0xff)
      if (s > bound) return false
      j += 1
    }
    true
  }
}

/** char_bag(str): see [[CharBag.bag]]. */
case class CharBagExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "char_bag"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string, got ${child.dataType}")

  override def nullSafeEval(s: Any): Any =
    CharBag.bag(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.CharBag.bag($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** bag_l1_within(a, b): see [[CharBag.l1Within]]. `bound` is a plan-time
  * constant, like [[BandedLevenshteinExpr]]'s k. */
case class BagL1WithinExpr(left: Expression, right: Expression, bound: Int)
    extends BinaryExpression {
  override def prettyName: String = "bag_l1_within"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (binary, binary), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    CharBag.l1Within(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]], bound)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.CharBag.l1Within($l, $r, $bound)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** jw_upper_bound(s1, s2): see [[CharBag.jwUpperBound]]. */
case class JwUpperBoundExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "jw_upper_bound"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    CharBag.jwUpperBound(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.CharBag.jwUpperBound($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharBagExpressions {
  def charBag(s: Column): Column =
    ColumnBridge.column(CharBagExpr(ColumnBridge.expression(s)))
  def bagL1Within(a: Column, b: Column, bound: Int): Column =
    ColumnBridge.column(BagL1WithinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), bound))
  def jwUpperBound(a: Column, b: Column): Column =
    ColumnBridge.column(JwUpperBoundExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
