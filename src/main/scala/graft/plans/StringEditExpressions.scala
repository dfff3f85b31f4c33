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
  /** Reusable per-thread buffers: in the verify stage this function runs
    * millions of times per task on ~window-length strings, and per-call
    * allocation (two decoded strings + two DP rows) measurably rivals the
    * early-exited DP sweep itself. All four buffers grow geometrically and
    * are written before read on every call, so no clearing between calls
    * is needed beyond the DP-row infinity fill the algorithm does anyway. */
  private final class Scratch {
    var ca: Array[Char] = new Array[Char](256)
    var cb: Array[Char] = new Array[Char](256)
    var prev: Array[Int] = new Array[Int](258)
    var curr: Array[Int] = new Array[Int](258)
    // Myers bit-parallel state: peq is a Latin-1 table of w-word bitmasks
    // (per-char pattern-position sets) with one extra always-zero slot at
    // index 256 for text chars outside the current pattern; stamp/gen mark
    // which slots belong to THIS call, so stale bits from a previous
    // pattern are never read without having to clear 256 slots per call.
    // vp/vn are the vertical delta vectors.
    var w: Int = 4
    var peq: Array[Long] = new Array[Long](257 * 4)
    var stamp: Array[Int] = new Array[Int](256)
    var gen: Int = 0
    var vp: Array[Long] = new Array[Long](4)
    var vn: Array[Long] = new Array[Long](4)
    def ensure(maxLen: Int): Unit = {
      if (ca.length < maxLen) {
        val cap = java.lang.Integer.highestOneBit(maxLen - 1) << 1
        ca = new Array[Char](cap)
        cb = new Array[Char](cap)
        prev = new Array[Int](cap + 2)
        curr = new Array[Int](cap + 2)
        val nw = (cap + 63) >>> 6
        if (nw > w) {
          w = nw
          peq = new Array[Long](257 * nw)
          java.util.Arrays.fill(stamp, 0)
          gen = 0
          vp = new Array[Long](nw)
          vn = new Array[Long](nw)
        }
      }
    }
  }
  private val scratch = ThreadLocal.withInitial[Scratch](() => new Scratch)

  /** Decode a UTF8String into a caller-provided char buffer without
    * allocating: ASCII bytes map 1:1; anything else takes the toString
    * path (still copied into the buffer so the DP never sees a String). */
  private[plans] def decodeInto(s: UTF8String, out: Array[Char]): Int = {
    val nb = s.numBytes
    if (s.isFullAscii) {
      // read in place (getBytes would copy when the string sits inside an
      // UnsafeRow page, which in a post-join projection it always does)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i < nb) {
        out(i) = (org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0x7f).toChar
        i += 1
      }
      nb
    } else {
      val str = s.toString
      str.getChars(0, str.length, out, 0)
      str.length
    }
  }

  /** Static hot-path entry — called from both interpreted eval and the
    * generated code (a static call stays inside whole-stage codegen; the
    * DP loop itself gains nothing from being inlined into the generated
    * method and would bloat it toward the JIT's method limits).
    *
    * Dispatch: Latin-1 inputs (the overwhelmingly common case for cleansed
    * corpus text) go through the bit-parallel Myers/Hyyrö distance — a
    * column costs ~15 word ops per 64 pattern chars instead of a 2k+1-cell
    * band sweep. Anything with a char >= U+0100 falls back to the banded
    * DP, which is alphabet-agnostic. Both count UTF-16 code units and both
    * return the distance when <= k, else -1. */
  def banded(ls: UTF8String, rs: UTF8String, k: Int): Int = {
    if (k < 0) return -1
    val sc = scratch.get()
    // numChars <= numBytes always, so numBytes bounds the decoded length
    sc.ensure(math.max(ls.numBytes, rs.numBytes).max(1))
    var a = sc.ca
    var b = sc.cb
    var n = decodeInto(ls, a)
    var m = decodeInto(rs, b)
    if (n > m) { val t = a; a = b; b = t; val tl = n; n = m; m = tl }
    if (m - n > k) return -1
    if (n == 0) return m // m - n <= k already checked
    if (latin1(a, n) && latin1(b, m)) myersLatin1(a, n, b, m, k, sc)
    else bandedDp(a, n, b, m, k, sc)
  }

  private def latin1(s: Array[Char], len: Int): Boolean = {
    var i = 0
    while (i < len) { if (s(i) >= 256) return false; i += 1 }
    true
  }

  /** Bit-parallel Levenshtein distance (Myers 1999 as extended to the
    * distance problem and to multi-word patterns by Hyyrö): the pattern `a`
    * (the shorter string) becomes per-character position bitmasks; each
    * text character updates w = ceil(n/64) words of vertical-delta state
    * carrying a ±1 horizontal delta between blocks; the running score is
    * the edit distance of `a` vs the text prefix. Aborts once
    * `score - columnsLeft > k` (each remaining column lowers the score by
    * at most 1), the bit-parallel analogue of the DP band exit. */
  private def myersLatin1(a: Array[Char], n: Int, b: Array[Char], m: Int,
                          k: Int, sc: Scratch): Int = {
    val w = (n + 63) >>> 6
    val peq = sc.peq
    val vp = sc.vp
    val vn = sc.vn
    // stamp-clear only the slots the current pattern touches, then set its
    // bits; unstamped slots resolve to the always-zero slot at index 256
    if (sc.gen == Int.MaxValue) { java.util.Arrays.fill(sc.stamp, 0); sc.gen = 0 }
    sc.gen += 1
    val gen = sc.gen
    val stamp = sc.stamp
    val zeroBase = 256 * sc.w
    var i = 0
    while (i < n) {
      val c = a(i)
      if (stamp(c) != gen) {
        java.util.Arrays.fill(peq, c * sc.w, c * sc.w + w, 0L)
        stamp(c) = gen
      }
      peq(c * sc.w + (i >>> 6)) |= 1L << (i & 63)
      i += 1
    }
    java.util.Arrays.fill(vp, 0, w, -1L)
    java.util.Arrays.fill(vn, 0, w, 0L)
    var score = n
    val last = w - 1
    val lastBit = 1L << ((n - 1) & 63)
    var j = 0
    while (j < m) {
      val c = b(j)
      val cBase = if (stamp(c) == gen) c * sc.w else zeroBase
      var hin = 1 // D[0][j] - D[0][j-1] = +1 (first row counts deletions)
      var blk = 0
      while (blk <= last) {
        val outBit = if (blk == last) lastBit else java.lang.Long.MIN_VALUE
        var eq = peq(cBase + blk)
        val pvb = vp(blk)
        val xv = eq | vn(blk)
        if (hin < 0) eq |= 1L
        val xh = (((eq & pvb) + pvb) ^ pvb) | eq
        var ph = vn(blk) | ~(xh | pvb)
        var mh = pvb & xh
        val hout = (if ((ph & outBit) != 0L) 1 else 0) -
          (if ((mh & outBit) != 0L) 1 else 0)
        ph <<= 1
        mh <<= 1
        if (hin < 0) mh |= 1L else if (hin > 0) ph |= 1L
        vp(blk) = mh | ~(xv | ph)
        vn(blk) = ph & xv
        hin = hout
        blk += 1
      }
      score += hin
      if (score - (m - 1 - j) > k) return -1
      j += 1
    }
    if (score > k) -1 else score
  }

  /** Banded DP with in-band early termination — the alphabet-agnostic
    * fallback path (and the independently-tested reference the Myers path
    * is pinned against in StringEditSpec). */
  private def bandedDp(a: Array[Char], n: Int, b: Array[Char], m: Int,
                       k: Int, sc: Scratch): Int = {
    val inf = Int.MaxValue / 2
    var prev = sc.prev
    var curr = sc.curr
    java.util.Arrays.fill(prev, 0, m + 2, inf)
    java.util.Arrays.fill(curr, 0, m + 2, inf)
    var j = 0
    val hi0 = math.min(m, k)
    while (j <= hi0) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      curr(lo - 1) = if (lo == 1) i else inf
      var rowMin = curr(lo - 1)
      val ai = a(i - 1)
      j = lo
      while (j <= hi) {
        val cost = if (ai == b(j - 1)) 0 else 1
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
