package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-table operators (the north-star `events` fixture): time-window
  * aggregation, JSON property extraction, sessionization, and the
  * history/top-answer window pattern from the reference's session state
  * (reference `app/app.py:291-334`).
  */
object EventsOps {

  /** Normalize the events fixture's `ts` column to TIMESTAMP (LTZ, micros).
    * The driver has shipped the column as TIMESTAMP(NANOS) (readable only as
    * long nanos via `spark.sql.legacy.parquet.nanosAsLong`) and as plain
    * `timestamp[us]` (which Spark reads as TIMESTAMP_NTZ) in different
    * fixture generations. Both are wall-clock UTC; with the session timezone
    * pinned to UTC the cast/truncate below yield bit-identical micros, so
    * every downstream query and DuckDB oracle sees the same values
    * regardless of fixture vintage. */
  def withEventTs(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    events.schema("ts").dataType match {
      case LongType => events.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => events.withColumn("ts", col("ts").cast("timestamp"))
      case _ => events
    }
  }

  /** Tumbling-window aggregate (batch form; streaming twin in
    * [[graft.streaming.StreamingOps]]). One shuffle on (window, event_type)
    * with map-side partial aggregation. */
  def tumblingAgg(events: DataFrame, every: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), every).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Extract a typed property from the JSON-ish `props` column. */
  def jsonProp(events: DataFrame, key: String): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), s"$$.$key").cast("int").as(key))

  /** Sessionize: per user, a new session starts when the gap since the
    * previous event exceeds `gapSeconds`. Window-function formulation — one
    * shuffle on user_id, then narrow. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val withGap = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withGap.groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        round(sum(col("value")), 4).as("session_value"))
  }

  /** H2: the reference's "newest question first, top answer only" history
    * render (`app/app.py:309-334`, reverse at `:309`, `j==0` at `:324`) as a
    * window op: latest row per group. */
  def latestPerGroup(df: DataFrame, groupCol: String, orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(orderCols.map(c => col(c).desc): _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }
}
