package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, attach the payload of the most
  * recent right row with the same key and `right.ts <= left.ts` (inclusive),
  * or nulls when none exists (LEFT ASOF semantics).
  *
  * The reference has no such operator; it is the canonical "operator Spark
  * lacks" and the natural companion to the `events` fixture (latest state
  * as-of an event time). Composed from built-ins per the preference order
  * (SURVEY.md §7.4): tag both sides, union by name, one window pass with
  * `last(payload, ignoreNulls)` over (key ORDER BY ts, side). That plans as
  * ONE shuffle on the key + a per-partition sort — the same shape a native
  * as-of SparkPlan would produce, with no custom physical node to maintain.
  * At 100 TB: shuffle is by key only; no broadcast, no n x m expansion,
  * skew governed by AQE like any other sort-window.
  *
  * Determinism contract: callers must pre-dedup right rows that share
  * (key, ts) — otherwise "the" match is undefined (DuckDB's ASOF has the
  * same caveat).
  */
object AsOfJoin {

  def asOfBackward(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val r = right.select(
      col(rightKey).as("__key"), col(rightTs).as("__ts"),
      lit(0).as("__side"),
      struct(rightPayload.map(col): _*).as("__payload"))
    val l = left
      .withColumn("__key", col(leftKey))
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(r.schema("__payload").dataType))
    // right rows sort before left rows at equal ts (__side 0 < 1) => the
    // match condition is inclusive (right.ts <= left.ts).
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(p => col("__match").getField(p).as(p)): _*)
  }
}
