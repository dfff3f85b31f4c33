package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StatefulUserStats
import graft.streaming.StatefulUserStats.{In, Stat}

/** Pins the live-stream behavior of mapGroupsWithState(EventTimeTimeout):
  * state carried ACROSS micro-batches, and the timeout callback firing once
  * the watermark passes an idle key's last event + gap — the two semantics a
  * bounded-batch run (StatefulSessionize's mode) never exercises.
  */
class StatefulTimeoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // fixed epoch base so the 10-minute watermark arithmetic is explicit
  private def ts(min: Int) = new Timestamp(86400000L + min * 60000L)

  test("state persists across micro-batches; event-time timeout closes idle keys") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[In]
    val out = StatefulUserStats.runningStats(input.toDS(), gapMs = 30 * 60000L)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("t_stateful_timeout").start()
    try {
      // batch 1: users 1 and 2 arrive at t=0
      input.addData(In(1, ts(0), 1.0), In(2, ts(0), 2.0))
      q.processAllAvailable()
      // batch 2: user 1 again at t=60min -> user 1 stays alive; watermark
      // advances to 50min, past user 2's timeout (0 + 30min)
      input.addData(In(1, ts(60), 3.0))
      q.processAllAvailable()
      // batch 3: unrelated user 3 at t=120min; processing this batch fires
      // user 2's pending timeout (watermark 50min > 30min)
      input.addData(In(3, ts(120), 4.0))
      q.processAllAvailable()

      val rows = spark.table("t_stateful_timeout").as[Stat].collect().toSeq

      // cross-batch state: user 1's count accumulated 1 -> 2 over two batches
      assert(rows.exists(r => r.user_id == 1 && r.n == 1 && !r.closed))
      assert(rows.exists(r =>
        r.user_id == 1 && r.n == 2 && !r.closed && math.abs(r.total - 4.0) < 1e-9))

      // timeout: user 2 (idle since batch 1) emitted exactly one closed row
      // with its final stats, from the hasTimedOut branch
      val closed2 = rows.filter(r => r.user_id == 2 && r.closed)
      assert(closed2.length === 1)
      assert(closed2.head.n === 1 && math.abs(closed2.head.total - 2.0) < 1e-9)

      // user 3 arrived last: open row present, no closed row (watermark
      // never passed its timeout)
      assert(rows.exists(r => r.user_id == 3 && r.n == 1 && !r.closed))
      assert(!rows.exists(r => r.user_id == 3 && r.closed))
    } finally {
      q.stop()
    }
  }
}
