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

  /** Truncated discounted return per session — the RL-style data-prep
    * reduction (the reward-to-go G = Σ_k γᵏ·v_k an offline-RL / RLHF
    * pipeline attaches to each trajectory before training). Sessions are
    * [[sessionize]]'s gap-split trajectories; the horizon truncates at 16
    * steps (the standard fixed-horizon form) which ALSO makes the
    * arithmetic exact: γ = 9/10 as exact integers, each term
    * v6·9ᵏ·10^(H−1−k) in DECIMAL(38,0) (≤ ~1e24 at a 1e6 value grid), so
    * the discounted sum is an exact integer fold on both engines, divided
    * once at the end.
    *
    * Scale shape: one shuffle on user_id for the session windows (bounded
    * per-user rows), then a keyed hash aggregation — no corpus window, no
    * collect; the horizon cap bounds the per-row decimal arithmetic.
    *
    * Output: (user_id, session_seq, n_events, g_return), n_events counting
    * the ≤ horizon events the return includes. */
  def discountedSessionReturns(events: DataFrame, gapSeconds: Long = 1800L,
                               horizon: Int = 16): DataFrame = {
    require(horizon >= 1 && horizon <= 16,
      s"horizon in [1,16] keeps 9^k*10^(H-1-k) terms exact, got $horizon")
    val dec0 = org.apache.spark.sql.types.DecimalType(38, 0)
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val bySession = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts"), col("event_id"))
    val withK = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSeconds, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("k", row_number().over(bySession) - 1)
      .where(col("k") < horizon)
    withK
      .withColumn("v6", round(col("value") * 1e6).cast("long"))
      .withColumn("term",
        col("v6").cast(dec0) *
          pow(lit(9.0), col("k")).cast("long").cast(dec0) *
          pow(lit(10.0), lit(horizon - 1) - col("k")).cast("long").cast(dec0))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), sum(col("term")).as("t"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        round(col("t").cast("double") /
          lit(1e6 * math.pow(10.0, horizon - 1)), 6).as("g_return"))
      .orderBy(col("user_id"), col("session_seq"))
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
