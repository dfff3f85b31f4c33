package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user running stats with REAL event-time timeout semantics over a live
  * stream — `mapGroupsWithState(EventTimeTimeout)`. State (count + sum per
  * user) persists across micro-batches; when the watermark passes a user's
  * last event time + `gapMs`, the timeout callback fires, the user's final
  * stats row is emitted with `closed = true` and the state is freed.
  *
  * This is the general continuous-aggregation shape at 100 TB stream scale:
  * state is bounded by (active users x one small struct), the watermark
  * drives both lateness and state GC, and the operator shuffles only on the
  * group key. [[StatefulSessionize]] covers the bounded-batch use of the same
  * API; this one exists to pin the cross-batch + timeout behavior with a
  * MemoryStream-driven spec.
  */
object StatefulUserStats {

  final case class In(user_id: Long, ts: Timestamp, value: Double)
  final case class Stat(user_id: Long, n: Long, total: Double, closed: Boolean)
  final case class St(n: Long, total: Double, lastMs: Long)

  def runningStats(events: Dataset[In], gapMs: Long): Dataset[Stat] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .mapGroupsWithState[St, Stat](GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[In], state: GroupState[St]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Stat(uid, s.n, s.total, closed = true)
          } else {
            val prev = state.getOption.getOrElse(St(0L, 0.0, Long.MinValue))
            val merged = it.foldLeft(prev) { (acc, e) =>
              St(acc.n + 1, acc.total + e.value, math.max(acc.lastMs, e.ts.getTime))
            }
            state.update(merged)
            // close this user once the watermark passes last-event + gap;
            // clamp to watermark + 1: an allowed-late event with a small gap
            // can put lastMs + gapMs BEHIND the current watermark, and Spark
            // throws (killing the query) on a timeout in the past.
            state.setTimeoutTimestamp(
              math.max(merged.lastMs + gapMs, state.getCurrentWatermarkMs() + 1))
            Stat(uid, merged.n, merged.total, closed = false)
          }
      }
  }
}
