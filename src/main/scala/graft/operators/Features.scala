package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature-engineering operators for training-data pipelines: encodings
  * that turn categorical columns into model-ready numerics without a
  * fit/transform round trip — the statistics ARE an aggregation, so the
  * "model" is a keyed table computed in the same plan.
  */
object Features {

  /** Leave-one-out target encoding with m-estimate smoothing:
    *
    *   enc(row) = ((S_key − x_row) + m · prior) / ((n_key − 1) + m)
    *
    * where S/n are the per-key target sum/count and prior is the global
    * target mean. Excluding the row's own target from its encoding is the
    * standard leakage guard (an in-key mean that includes the row leaks the
    * label); the m-estimate term shrinks rare keys toward the prior.
    *
    * Determinism across engines: per-key and global sums run in
    * DECIMAL(18,2) (exact, order-independent — double sums are neither),
    * and only the final ratio drops to double, where every operation is a
    * correctly-rounded IEEE op in a fixed textual order. The oracle
    * mirrors that order exactly.
    *
    * Scale shape: one keyed aggregate (map-side combinable) + one join on
    * the key (AQE broadcasts it when the key cardinality is small; a
    * high-cardinality key stays a co-partitioned shuffle join) + one 1-row
    * global aggregate re-entering via broadcast cross join. The input is
    * never windowed or sorted.
    */
  def looTargetEncode(df: DataFrame, keyCol: String, targetCol: String,
                      m: Double, outCol: String = "loo_enc"): DataFrame = {
    require(m > 0, s"smoothing m must be > 0 (m=0 breaks singleton keys), got $m")
    val dec = df.withColumn("__t", col(targetCol).cast("decimal(18,2)"))
    val stats = dec.groupBy(col(keyCol))
      .agg(sum(col("__t")).as("__s"), count(lit(1)).as("__n"))
    val g = dec.agg(sum(col("__t")).as("__gs"), count(lit(1)).as("__gn"))
    dec.join(stats, Seq(keyCol))
      .crossJoin(broadcast(g))
      .withColumn(outCol, round(
        ((col("__s") - col("__t")).cast("double") +
          lit(m) * (col("__gs").cast("double") / col("__gn"))) /
          (col("__n") - 1 + lit(m)), 4))
      .drop("__t", "__s", "__n", "__gs", "__gn")
  }
}
