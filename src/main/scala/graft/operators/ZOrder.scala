package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the lakehouse OPTIMIZE ZORDER maintenance
  * op: co-locate rows that are close in SEVERAL dimensions so file-level
  * min/max statistics prune on any of them. A single-column sort gives
  * perfect pruning on that column and none on the others; interleaving the
  * columns' bits makes every file a small hyper-rectangle, so a predicate
  * on ANY clustered column skips most files.
  *
  * At 100 TB this is a rewrite job with one range-partitioning shuffle
  * (`repartitionByRange` on the z-value — Spark samples quantiles, so files
  * come out evenly sized regardless of the value distribution) and no
  * driver-side state.
  */
object ZOrder {

  /** Morton code of two non-negative integral columns: the low `bits` bits
    * of x and y, interleaved (x in even positions, y in odd). `2*bits` must
    * stay < 63 so the code fits a long. Plain shift/mask arithmetic —
    * codegen'd end to end, and replicable in any engine for the oracle. */
  def zValue2(x: Column, y: Column, bits: Int = 21): Column = {
    require(bits >= 1 && 2 * bits < 63, s"bits=$bits out of range")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(x.cast("long"), i).bitwiseAND(lit(1L)), 2 * i)
      val yb = shiftleft(shiftright(y.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_.bitwiseOR(_)).as("zval")
  }

  /** `df` plus a `zval` column: both dimensions min/max-normalized onto
    * `bits` bits, then Morton-interleaved.
    *
    * Normalization is NOT optional: raw interleave of columns with unequal
    * magnitudes puts all occupied high z-bits on the wider column, so range
    * splits cut only that column and the narrow one stays unclustered
    * (ZOrderSpec caught exactly this). Production z-ordering does the same
    * equalization (rank/range-bucket per column); min/max scaling keeps it
    * one cheap agg + broadcast and stays exactly replicable in ANSI SQL
    * (integer scaling, double division, floor — bit-identical across
    * engines). */
  def scaledZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 10): DataFrame = {
    val m = (1L << bits) - 1
    val st = df.agg(
      min(col(xCol)).cast("long").as("__xmin"), max(col(xCol)).cast("long").as("__xmax"),
      min(col(yCol)).cast("long").as("__ymin"), max(col(yCol)).cast("long").as("__ymax"))
    df.crossJoin(broadcast(st))
      .withColumn("__zx", floor((col(xCol).cast("long") - col("__xmin")) * m /
        greatest(col("__xmax") - col("__xmin"), lit(1L))).cast("long"))
      .withColumn("__zy", floor((col(yCol).cast("long") - col("__ymin")) * m /
        greatest(col("__ymax") - col("__ymin"), lit(1L))).cast("long"))
      .withColumn("zval", zValue2(col("__zx"), col("__zy"), bits))
      .drop("__xmin", "__xmax", "__ymin", "__ymax", "__zx", "__zy")
  }

  /** Rewrite `df` into `numFiles` files clustered by the normalized
    * z-value of the two columns. Range partitioning + in-partition sort =
    * globally z-ordered layout; per-file min/max of BOTH columns are narrow
    * (ZOrderSpec quantifies the pruning win vs a single-column sort). */
  def clusterWrite(df: DataFrame, path: String, xCol: String, yCol: String,
                   numFiles: Int = 16, bits: Int = 10): Unit = {
    scaledZ(df, xCol, yCol, bits)
      .repartitionByRange(numFiles, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)
  }
}
