package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic

/** Re-binds a DataFrame's logical plan to another SparkSession (same
  * SparkContext). Iterative operators (connected components, graph-ANN
  * walks) materialize loop-sized intermediate frames whose shuffles want
  * FAR fewer partitions than the session's corpus-tuned setting; mutating
  * `spark.sql.shuffle.partitions` on the shared session scoped those
  * shuffles but RACED against concurrent queries on the same session (the
  * second query's corpus-sized shuffle could plan at the loop's 1-2
  * partitions). Executing the loop frames on a `spark.newSession()` CLONE
  * — own SQLConf, shared context, cache, and checkpoint storage — gives
  * the same scoping with no shared-state write. `Dataset.ofRows` is
  * `private[sql]`, hence this bridge (the [[ColumnBridge]] convention).
  */
object SessionBridge {
  def withSession(df: DataFrame, s: SparkSession): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession],
      df.queryExecution.logical)

  /** A re-binder onto a conf-inheriting clone with its own
    * `spark.sql.shuffle.partitions` — the loop-scoped shuffle-width dial
    * shared by connectedComponents, the GraphAnn walks, and SemDedup.
    *
    * The clone comes from `cloneSession()` (private[sql]), NOT
    * `newSession()`: newSession builds a fresh SessionState from the
    * static SparkConf and silently DROPS runtime-set SQL confs (the
    * `nanosAsLong` parquet legacy flag set at session init, streaming
    * state-store overrides) — frames re-bound to such a clone re-plan
    * under default confs, a latent divergence for any conf-sensitive
    * read. cloneSession inherits the parent's live runtime conf; we then
    * override only the shuffle width. */
  def scopedShuffle(spark: SparkSession, partitions: Int): DataFrame => DataFrame = {
    val s = spark.asInstanceOf[classic.SparkSession].cloneSession()
    s.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    df => withSession(df, s)
  }
}
