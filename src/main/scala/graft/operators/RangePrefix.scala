package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level distributed prefix scan over a numeric sort key — the scheme
  * that replaces a corpus-wide `Window.orderBy(key)` (one reducer holding
  * every row) with:
  *
  *   1. a range grid over the key: each row lands in one of `cells`
  *      buckets, monotone in the total order, so bucket b's rows all
  *      precede bucket b+1's rows;
  *   2. per-bucket windows (`partitionBy(__bk)`) that run in PARALLEL —
  *      each partition holds only its slice of the key range;
  *   3. a `cells`-row bucket-totals table whose own tiny ordered prefix
  *      comes back as a BROADCAST of per-bucket offsets.
  *
  * global prefix = bucket offset + local prefix. The result is
  * bit-identical to the single-partition window whenever the summed value
  * is exact under reordering (LONG / DECIMAL — integer addition is
  * associative; never use this with raw DOUBLE sums).
  *
  * At 100 TB this is the difference between a one-reducer sort bottleneck
  * and a plan whose widest exchange is `hashpartitioning(__bk)`; the only
  * SinglePartition exchange carries `cells` rows. Production would
  * typically pick `cells` ≈ the shuffle parallelism; correctness does not
  * depend on the cell count or boundaries, only on grid monotonicity.
  *
  * First proven in-gate by `assign_dense_ids` and `dq_value_drift_ks`
  * (round 5/6); factored out here so every global rank / running-total
  * query ships the same audited scheme.
  */
object RangePrefix {

  /** Attach the range-grid bucket column `__bk` (LONG in [0, cells)),
    * monotone non-decreasing in `key` ascending order (or descending when
    * `descending = true`). Adds a broadcast of the 1-row (min, max) agg.
    * `key` is cast to double for bucketing only — bucket boundaries never
    * affect results, only the monotone ordering of buckets matters.
    *
    * CONTRACT: `key` must be NON-NULL on every row. A corpus-wide
    * `Window.orderBy` would rank NULL keys first; the grid has no cell
    * for them, and silently dropping them at [[runningSum]]'s `__bk` join
    * would diverge from the window semantics this class is bit-identical
    * to. A NULL key therefore fails loudly here (codegen'd branch, no
    * extra pass) instead of dropping rows downstream. */
  def withBucket(df: DataFrame, key: Column, cells: Int = 64,
                 descending: Boolean = false): DataFrame = {
    require(cells >= 1, s"cells must be >= 1, got $cells")
    val kd = key.cast("double")
    val b = df.agg(min(kd).as("__kmin"), max(kd).as("__kmax"))
    val pos = if (descending) col("__kmax") - kd else kd - col("__kmin")
    // MinPositiveValue only matters when kmax == kmin (everything in cell
    // 0); otherwise it is absorbed. least(..) guards the kmax row itself.
    df.crossJoin(broadcast(b))
      .withColumn("__bk", when(kd.isNull, raise_error(lit(
          "RangePrefix.withBucket: NULL sort key — the two-level scheme " +
          "requires non-null keys (a global window would rank NULLs first; " +
          "filter or coalesce the key before bucketing)")))
        .otherwise(least(floor(pos * cells /
          (col("__kmax") - col("__kmin") + lit(Double.MinPositiveValue))),
          lit((cells - 1).toLong))))
      .drop("__kmin", "__kmax")
  }

  /** Exact global running sum of `value` over the total order `sortCols`
    * — `rows between unbounded preceding and current row` — without a
    * corpus-wide window. `df` must already carry `__bk` ([[withBucket]])
    * and `sortCols` must lead with the bucketing key (so the grid is
    * monotone in the total order). `value` must be LONG or DECIMAL. */
  def runningSum(df: DataFrame, value: Column, sortCols: Seq[Column],
                 out: String): DataFrame = {
    val wLocal = Window.partitionBy(col("__bk")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Bucket offsets via a triangular broadcast self-join over the
    // `cells`-row totals table (≤ cells² pair rows): offset(b) = Σ totals
    // of strictly-preceding buckets. No ordered single-partition window
    // exists anywhere in the scheme — not even a cells-sized one.
    val totals = df.groupBy(col("__bk")).agg(sum(value).as("__t"))
    val offs = totals.select(col("__bk"))
      .join(broadcast(totals.select(col("__bk").as("__pb"), col("__t"))),
        col("__pb") < col("__bk"), "left")
      .groupBy(col("__bk"))
      .agg(coalesce(sum(col("__t")), lit(0L)).as("__off"))
    df.withColumn("__loc", sum(value).over(wLocal))
      .join(broadcast(offs), "__bk")
      .withColumn(out, col("__off") + col("__loc"))
      .drop("__loc", "__off")
  }

  /** Exact global 1-based rank (`row_number` over the total order) —
    * [[runningSum]] of the constant 1. `sortCols` must be a total order
    * (unique tie-break) for the rank to be well-defined. */
  def runningRank(df: DataFrame, sortCols: Seq[Column], out: String): DataFrame =
    runningSum(df, lit(1L), sortCols, out)
}
