package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Banded edit distance with in-band early termination.
  *
  * `functions.levenshtein(l, r, threshold)` already bounds the DP to a
  * 2·threshold+1 band, but it always sweeps all rows; for a candidate
  * verify where ~all pairs are far apart (the near-dup regime), the band
  * minimum crosses the threshold after O(threshold) rows and the remaining
  * ~90% of the sweep is provably wasted — the band minimum is monotonically
  * non-decreasing row over row, so once it exceeds k no later cell can come
  * back under it. This expression adds that exit, which measured ~10x on
  * the dedup_levenshtein verify stage (46 -> 4 µs/pair on 128-char
  * prefixes at maxDist 24).
  *
  * Contract is identical to the built-in: the distance when <= k, else -1
  * (pinned against `levenshtein(l, r, k)` in StringEditSpec). Distance is
  * counted in UTF-16 code units (identical to the built-in for all BMP
  * text; the engine's cleansed fixture text is ASCII).
  */
object EditDistance {
  /** Static hot-path entry — called from both interpreted eval and the
    * generated code (a static call stays inside whole-stage codegen; the
    * DP loop itself gains nothing from being inlined into the generated
    * method and would bloat it toward the JIT's method limits). */
  def banded(ls: UTF8String, rs: UTF8String, k: Int): Int = {
    if (k < 0) return -1
    var a = ls.toString
    var b = rs.toString
    if (a.length > b.length) { val t = a; a = b; b = t }
    val n = a.length
    val m = b.length
    if (m - n > k) return -1
    if (n == 0) return m // m - n <= k already checked
    val inf = Int.MaxValue / 2
    var prev = new Array[Int](m + 2)
    var curr = new Array[Int](m + 2)
    java.util.Arrays.fill(prev, inf)
    java.util.Arrays.fill(curr, inf)
    var j = 0
    val hi0 = math.min(m, k)
    while (j <= hi0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      curr(lo - 1) = if (lo == 1) i else inf
      var rowMin = curr(lo - 1)
      val ai = a.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ai == b.charAt(j - 1)) 0 else 1
        var v = prev(j - 1) + cost
        val del = prev(j) + 1
        if (del < v) v = del
        val ins = curr(j - 1) + 1
        if (ins < v) v = ins
        curr(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > k) return -1
      // next row reads prev over [lo'-1, hi'] ⊆ [lo-1, hi+1]: everything in
      // [lo-1, hi] was just written; guard the one possibly-stale cell above
      if (hi + 1 <= m) curr(hi + 1) = inf
      val t = prev; prev = curr; curr = t
      i += 1
    }
    val d = prev(m)
    if (d > k) -1 else d
  }
}

/** edit_dist_banded(l, r): see [[EditDistance.banded]]. `k` is a plan-time
  * constant (it sizes the band), mirroring the built-in's foldable-threshold
  * requirement. */
case class BandedLevenshteinExpr(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def prettyName: String = "edit_dist_banded"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    EditDistance.banded(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.EditDistance.banded($l, $r, $k)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StringEditExpressions {
  def bandedLevenshtein(a: Column, b: Column, k: Int): Column =
    ColumnBridge.column(BandedLevenshteinExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), k))
}
