package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Power-iteration PCA over the embedding corpus — the dimensionality
  * step of embedding triage (outlier axes, quick 1-D visual ordering,
  * variance auditing after a model swap), with the same engine-portable
  * arithmetic discipline as [[KMeans]] so the ENTIRE training loop —
  * start vector, every matrix-vector product, every normalization —
  * replays in an ANSI oracle:
  *
  *  - start: the uniform unit vector 1/√dim — for dim 64 that is exactly
  *    0.125, a binary-exact literal both engines share;
  *  - iterate: v ← normalize(Xᵀ(Xv)). Per-row dots fold left-to-right in
  *    index order (compiled loop here, `list_reduce` there — identical
  *    partial-sum sequence, bit-identical doubles). Per-component sums
  *    across rows are made EXACTLY order-independent: each per-row term
  *    v[i]·d is rounded onto a 1e-9 fixed-point grid and summed as a
  *    scaled integer (integer addition is associative and commutative in
  *    any engine and any partition order), then descaled and rounded to 6.
  *    Rounding a float sum AFTER an order-arbitrary reduction is a coin
  *    flip whenever the sum lands within an ulp of a 0.5e-6 boundary —
  *    with 64 components × 3 iterations those boundaries do get hit
  *    (observed as a nondeterministic hash flip in round 5); rounding each
  *    term BEFORE the sum removes the order dependence entirely;
  *  - norm: folds the ROUNDED components in index order (exact both
  *    sides); the normalized components round to 6 again;
  *  - project: per-row dot with the final vector, rounded to 4.
  *
  * Un-centered power iteration (dominant right singular vector of X, not
  * of the centered covariance): centering is a broadcast of the rounded
  * column-mean vector away if wanted, and leaving X as stored keeps the
  * oracle one CTE shorter per iteration.
  *
  * Scale shape: each iteration is one narrow map (dot), one
  * (component)-keyed partial-agg shuffle carrying partitions × dim rows,
  * and a dim-sized driver collect (the Lloyd cadence — the MODEL moves,
  * the corpus never does). The final projection is a broadcast-literal
  * map. No corpus-sized collect, join, or window anywhere.
  */
object Pca {

  private val dotU = udf((a: Seq[Double], b: Seq[Double]) => {
    val n = math.min(a.length, b.length)
    var s = 0.0
    var i = 0
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  })

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** One matrix-vector product Xᵀ(Xv) with exactly order-independent
    * cross-row sums: per-row terms v[i]·d round onto the 1e-9 grid, sum as
    * scaled DECIMAL(38,0) integers (associative — any partition order
    * yields the identical integer), then descale and round to 6. Exposed
    * package-private so the boundary behavior is directly testable. */
  private[graft] def componentSums(base: DataFrame, v: Array[Double]): Array[Double] =
    base
      .withColumn("__d", dotU(col("__pv"), typedLit(v.toSeq)))
      .select(col("__d"), posexplode(col("__pv")))
      .groupBy(col("pos"))
      .agg(sum(round(col("col") * col("__d") * lit(1e9), 0).cast("decimal(38,0)"))
        .as("ssum"))
      .orderBy(col("pos"))
      .collect().map { r =>
        // exact integer half-away-from-zero round of ssum/1000, then /1e6:
        // the round-6 value of the EXACT decimal ssum/1e9, with zero float
        // ops before the (exact, < 2^53) final integer→double conversion
        val s = BigInt(r.getDecimal(1).toBigInteger)
        val mag = (s.abs + 500) / 1000
        (if (s.signum < 0) -mag else mag).toDouble / 1e6
      }

  /** Per-row projection onto the top principal direction after `iters`
    * power iterations: (idCol, pc1_proj). */
  def powerIterationProjection(df: DataFrame, vecCol: String, idCol: String,
                               dim: Int, iters: Int): DataFrame = {
    require(dim >= 1 && iters >= 1)
    val base = df.select(col(idCol).as("__pid"),
      col(vecCol).cast("array<double>").as("__pv"))
    var v = Array.fill(dim)(round6(1.0 / math.sqrt(dim)))
    for (_ <- 1 to iters) {
      val sums = componentSums(base, v)
      require(sums.length == dim, s"expected $dim components, got ${sums.length}")
      val norm = math.sqrt(sums.foldLeft(0.0)((acc, x) => acc + x * x))
      require(norm > 0.0, "degenerate input: zero matrix-vector product")
      v = sums.map(x => round6(x / norm))
    }
    base.select(col("__pid").as(idCol),
      round(dotU(col("__pv"), typedLit(v.toSeq)), 4).as("pc1_proj"))
  }
}
