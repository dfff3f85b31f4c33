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
  *    across rows are engine-arbitrary in order, so they round to 6
  *    (the noise is ~1e-14, eight orders below the grid); the norm folds
  *    the ROUNDED components in index order (exact both sides) and the
  *    normalized components round to 6 again;
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

  /** Per-row projection onto the top principal direction after `iters`
    * power iterations: (idCol, pc1_proj). */
  def powerIterationProjection(df: DataFrame, vecCol: String, idCol: String,
                               dim: Int, iters: Int): DataFrame = {
    require(dim >= 1 && iters >= 1)
    val base = df.select(col(idCol).as("__pid"),
      col(vecCol).cast("array<double>").as("__pv"))
    var v = Array.fill(dim)(round6(1.0 / math.sqrt(dim)))
    for (_ <- 1 to iters) {
      val sums = base
        .withColumn("__d", dotU(col("__pv"), typedLit(v.toSeq)))
        .select(col("__d"), posexplode(col("__pv")))
        .groupBy(col("pos"))
        .agg(round(sum(col("col") * col("__d")), 6).as("s"))
        .orderBy(col("pos"))
        .collect().map(_.getDouble(1))
      require(sums.length == dim, s"expected $dim components, got ${sums.length}")
      val norm = math.sqrt(sums.foldLeft(0.0)((acc, x) => acc + x * x))
      require(norm > 0.0, "degenerate input: zero matrix-vector product")
      v = sums.map(x => round6(x / norm))
    }
    base.select(col("__pid").as(idCol),
      round(dotU(col("__pv"), typedLit(v.toSeq)), 4).as("pc1_proj"))
  }
}
