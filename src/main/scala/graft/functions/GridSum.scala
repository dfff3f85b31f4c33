package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exactly order-independent rounded aggregation — the PLANS.md round-6
  * discipline ("fixed-point terms, integer sums") as a reusable in-plan
  * aggregate expression.
  *
  * Rounding a float sum AFTER an order-arbitrary reduction is a coin flip
  * whenever the sum lands within an ulp of a rounding boundary (observed
  * twice now: embedding_power_iteration round 5, a quality-classifier
  * margin at sf0.1 in round 6). The cure: round each TERM onto a fixed
  * decimal grid (10^-scaleExp), sum as integers — associative in any
  * partition order and identical in any engine — then derive the
  * `outDigits`-rounded value by exact integer half-away-from-zero
  * division. Every float op here acts on integer-valued doubles < 2^53,
  * so both the sum and the final value are bit-identical across engines
  * and partitionings.
  *
  * LONG sums bound the group: per-group scaled terms must stay < 2^63
  * (true for per-row-bounded groups like a dim-sized margin; for
  * corpus-sized cross-row sums use DECIMAL(38,0) — see Pca.componentSums
  * and QualityClassifier's gradient).
  *
  * The DuckDB replay of `gridRoundedSum(t, 10, 6)`:
  * {{{
  *   CAST(CASE WHEN s >= 0 THEN (s + 5000) // 10000
  *             ELSE -((-s + 5000) // 10000) END AS DOUBLE) / 1e6
  *   -- with s = sum(CAST(round(t * 1e10) AS BIGINT))
  * }}}
  */
object GridSum {

  /** Aggregate: round-`outDigits` of Σ term, with per-term quantization on
    * the 10^-scaleExp grid making the reduction exactly associative. */
  def gridRoundedSum(term: Column, scaleExp: Int, outDigits: Int): Column = {
    require(scaleExp > outDigits && scaleExp <= 15,
      s"need outDigits < scaleExp <= 15, got scaleExp=$scaleExp outDigits=$outDigits")
    val divisor = math.pow(10, (scaleExp - outDigits).toDouble).toLong
    val half = divisor / 2
    val s = sum(round(term * lit(math.pow(10, scaleExp.toDouble)), 0).cast("long"))
    val a = abs(s) + lit(half)
    // exact long division as doubles: a - a%d is divisible by d, and the
    // quotient stays far below 2^53
    val mag = (a - pmod(a, lit(divisor))).cast("double") / lit(divisor.toDouble)
    when(s < 0, -mag).otherwise(mag) / lit(math.pow(10, outDigits.toDouble))
  }
}
