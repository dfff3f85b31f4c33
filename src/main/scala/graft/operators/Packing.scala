package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GPT-style sequence packing: conceptually concatenate all documents in id
  * order into one token stream and cut it into training sequences of
  * `capacity` tokens. Each document's placement is fully described by its
  * stream offset: `start_off`, and the first/last sequence ids it touches
  * (a document may straddle a boundary — that is the standard packing
  * semantics, not a defect).
  *
  * The whole problem is a prefix sum over token counts. The naive Spark
  * form — `sum(...).over(Window.orderBy(id))` with no partition — collapses
  * the entire table into ONE task and is exactly the anti-pattern to avoid
  * at 100 TB. Instead, the classic two-level distributed prefix sum:
  *
  *   1. bucket rows by `id / bucketWidth` (deterministic, no shuffle skew
  *      for dense ids) and prefix-sum WITHIN each bucket in parallel;
  *   2. aggregate one total per bucket (tiny: n/bucketWidth rows), prefix-sum
  *      that table (its single-partition window is config-sized, not
  *      data-sized), and broadcast-join the bucket base offsets back.
  *
  * Cost: one hash shuffle on the bucket id + one broadcast join. No stage
  * ever holds more than `bucketWidth` rows in one window frame.
  */
object Packing {

  /** @param df       input with an id column and a positive token count column
    * @param idCol    dense non-negative id defining stream order
    * @param tokenCol tokens per document (rows with <= 0 are dropped, as an
    *                 empty document occupies no stream positions)
    * @param capacity tokens per packed training sequence
    * @param bucketWidth ids per prefix-sum bucket (tune so one bucket's rows
    *                    fit a window frame comfortably; 100k+ in production) */
  def packOffsets(df: DataFrame, idCol: String, tokenCol: String,
                  capacity: Int, bucketWidth: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val toks = df.where(col(tokenCol) > 0)
      .withColumn("__b", floor(col(idCol) / bucketWidth).cast("long"))
    val wLocal = Window.partitionBy(col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = toks.withColumn("__lstart",
      sum(col(tokenCol)).over(wLocal) - col(tokenCol))
    val bucketTotals = toks.groupBy(col("__b"))
      .agg(sum(col(tokenCol)).as("__tot"))
    // single-partition window over n/bucketWidth rows — config-sized by design
    val wBuckets = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bucketOffsets = bucketTotals
      .withColumn("__off", sum(col("__tot")).over(wBuckets) - col("__tot"))
      .select(col("__b"), col("__off"))
    local.join(broadcast(bucketOffsets), "__b")
      .withColumn("start_off", col("__off") + col("__lstart"))
      .withColumn("seq_first", floor(col("start_off") / capacity).cast("long"))
      .withColumn("seq_last",
        floor((col("start_off") + col(tokenCol) - 1) / capacity).cast("long"))
      .drop("__b", "__lstart", "__off")
  }
}
