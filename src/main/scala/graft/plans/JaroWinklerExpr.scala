package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen Jaro-Winkler similarity — the whole-stage-codegen twin of
  * [[graft.operators.EntityResolution.jaroWinkler]].
  *
  * The ER verify ladder (candidate pairs → admissible
  * [[CharBagExpressions.jwUpperBound]] cut → full JW on survivors) used a
  * Scala UDF for the final scan; the gate only PRUNES, so at production
  * candidate volumes every survivor still paid the UDF tax: catalyst→String
  * conversion with per-row String allocation, boxed Double return, and a
  * codegen fence splitting the verify stage. This expression keeps the
  * scan inside WholeStageCodegen via a static call (the
  * [[BandedLevenshteinExpr]] discipline) and decodes both sides into
  * thread-local char buffers ([[EditDistance.decodeInto]] — zero per-row
  * allocation for the match/flag state too).
  *
  * Semantics are EXACTLY the pinned DuckDB-observable ones the String
  * version implements (match window `max/2 − 1` floored and clamped ≥0,
  * transpositions as floored half mismatches, prefix bonus ≤4 chars at 0.1
  * only when jaro > 0.7, empty → 0.0): the char-level loop below mirrors
  * that algorithm statement for statement, same arithmetic order, so the
  * returned doubles are bit-identical (pinned in EntityResolutionSpec
  * against the String version on random pairs and in the oracle-gated
  * `er_*` queries against DuckDB's native jaro_winkler_similarity).
  */
object JaroWinklerSim {
  private final class Scratch {
    var ca: Array[Char] = new Array[Char](256)
    var cb: Array[Char] = new Array[Char](256)
    var m1: Array[Boolean] = new Array[Boolean](256)
    var m2: Array[Boolean] = new Array[Boolean](256)
    def ensure(maxLen: Int): Unit = {
      if (ca.length < maxLen) {
        val cap = java.lang.Integer.highestOneBit(maxLen - 1) << 1
        ca = new Array[Char](cap)
        cb = new Array[Char](cap)
        m1 = new Array[Boolean](cap)
        m2 = new Array[Boolean](cap)
      }
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Static hot-path entry, called from interpreted eval and generated
    * code alike. Clears only the first l1/l2 flag slots (everything else
    * is never read), so per-call work is O(l1 + l2 + matchwork). */
  def similarity(ls: UTF8String, rs: UTF8String): Double = {
    val sc = scratch.get()
    sc.ensure(math.max(ls.numBytes, rs.numBytes).max(1))
    val s1 = sc.ca
    val s2 = sc.cb
    val l1 = EditDistance.decodeInto(ls, s1)
    val l2 = EditDistance.decodeInto(rs, s2)
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = sc.m1
    val m2 = sc.m2
    java.util.Arrays.fill(m1, 0, l1, false)
    java.util.Arrays.fill(m2, 0, l2, false)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var mism = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }
}

/** jaro_winkler(l, r): see [[JaroWinklerSim.similarity]]. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "jaro_winkler"
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected (string, string), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerSim.similarity(l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"graft.plans.JaroWinklerSim.similarity($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(JaroWinklerExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
