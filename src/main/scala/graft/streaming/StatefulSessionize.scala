package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization via `KeyValueGroupedDataset.flatMapGroupsWithState` — the
  * Structured Streaming custom-state API. [[graft.operators.EventsOps
  * .sessionize]] is the declarative window-function formulation; this is the
  * stateful-operator formulation that generalizes to a live stream (state =
  * open session per user, sessions emitted as they close; with
  * EventTimeTimeout + watermark the open tail flushes on timeout).
  *
  * Run over a bounded Dataset (batch mode processes each key's full group
  * with trivially-empty state) it emits exactly the sessions the batch
  * window formulation produces — which is how the DuckDB oracle checks it.
  */
object StatefulSessionize {

  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  final case class Session(
      user_id: Long, session_seq: Long, n_events: Long,
      session_start: Timestamp, session_end: Timestamp, session_value: Double)

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Same gap rule as the window formulation: second-truncated timestamps
    * (unix_timestamp semantics), new session when gap > gapSeconds. */
  def sessionsOf(uid: Long, events: Iterator[Ev], gapSeconds: Long): Iterator[Session] = {
    val sorted = events.toIndexedSeq.sortBy(e => (e.ts.getTime, e.event_id))
    if (sorted.isEmpty) Iterator.empty
    else {
      val out = Vector.newBuilder[Session]
      var seq = 0L
      var start = sorted.head.ts; var end = sorted.head.ts
      var n = 0L; var sum = 0.0; var prevSec = Long.MinValue
      def flush(): Unit =
        out += Session(uid, seq, n, start, end, round4(sum))
      sorted.foreach { e =>
        val sec = math.floorDiv(e.ts.getTime, 1000L)
        if (prevSec == Long.MinValue || sec - prevSec > gapSeconds) {
          if (n > 0) flush()
          seq += 1; start = e.ts; n = 0; sum = 0.0
        }
        n += 1; sum += e.value; end = e.ts; prevSec = sec
      }
      flush()
      out.result().iterator
    }
  }

  def sessionize(spark: SparkSession, events: DataFrame,
                 gapSeconds: Long = 1800L): Dataset[Session] = {
    import spark.implicits._
    // state type Long (unused in batch mode) — primitives have encoders;
    // a live-stream variant would hold the open session here.
    events.selectExpr("user_id", "ts", "event_id", "value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, it: Iterator[Ev], _: GroupState[Long]) =>
          sessionsOf(uid, it, gapSeconds)
      }
  }
}
