package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps
import graft.streaming.StatefulSessionize

class EventsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val evs = Seq(
    // user 1: gap of exactly 1800s -> SAME session; 1801s -> new session
    (1L, ts("2024-01-01 00:00:00"), 1L, 1.0),
    (1L, ts("2024-01-01 00:30:00"), 2L, 2.0),  // +1800s, same session
    (1L, ts("2024-01-01 01:00:01"), 3L, 4.0),  // +1801s, new session
    // user 2: single event
    (2L, ts("2024-01-01 12:00:00"), 4L, 8.0)
  ).toDF("user_id", "ts", "event_id", "value")

  test("sessionize gap boundary: exactly gap stays, gap+1 splits") {
    val got = EventsOps.sessionize(evs, gapSeconds = 1800L)
      .select($"user_id", $"session_seq", $"n_events", $"session_value")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === Set((1L, 1L, 2L, 3.0), (1L, 2L, 1L, 4.0), (2L, 1L, 1L, 8.0)))
  }

  test("stateful sessionize matches window sessionize on the edge cases") {
    val a = EventsOps.sessionize(evs, 1800L)
      .orderBy($"user_id", $"session_seq").collect().toSeq
    val b = StatefulSessionize.sessionize(spark, evs, 1800L).toDF()
      .orderBy($"user_id", $"session_seq").collect().toSeq
    assert(a === b)
  }

  test("tumbling agg windows are epoch-aligned to the hour (date_trunc parity)") {
    val typed = evs.withColumn("event_type", lit("click"))
    val got = EventsOps.tumblingAgg(typed, "1 hour")
      .select($"window_start", $"n").as[(Timestamp, Long)].collect().toMap
    assert(got === Map(
      ts("2024-01-01 00:00:00") -> 2L,  // 00:00:00 and 00:30:00
      ts("2024-01-01 01:00:00") -> 1L,  // 01:00:01
      ts("2024-01-01 12:00:00") -> 1L))
  }

  test("latestPerGroup keeps exactly one newest row per key") {
    val got = EventsOps.latestPerGroup(evs, "user_id", Seq("ts", "event_id"))
      .select($"user_id", $"event_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 3L), (2L, 4L)))
  }

  test("approx_percentile tracks the exact quantiles closely") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val rows = ev.groupBy($"event_type")
      .agg(percentile_approx($"value", lit(0.5), lit(10000)).as("approx"),
        expr("percentile(value, 0.5)").as("exact"))
      .as[(String, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      val relErr = math.abs(approx - exact) / math.max(math.abs(exact), 1e-9)
      assert(relErr <= 0.02, s"$et: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("HLL++ approx distinct is within the declared rsd of the exact count") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
    val rows = ev.groupBy($"event_type")
      .agg(approx_count_distinct($"user_id", rsd = 0.02).as("approx"),
        countDistinct($"user_id").as("exact"))
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, approx, exact) =>
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr <= 0.05, s"$et: approx=$approx exact=$exact relErr=$relErr")
    }
  }

  test("discountedSessionReturns: gamma-weighted sums per session, gap " +
      "split, and the 16-event horizon cap") {
    import java.sql.Timestamp
    def ts(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    // user 1: session of (1, 2, 4) then, after a >30min gap, a lone 5;
    // user 2: 20 identical 1.0 events 1s apart (horizon must cap at 16)
    val rows =
      Seq((1L, 1L, ts(0), 1.0), (1L, 2L, ts(10), 2.0), (1L, 3L, ts(20), 4.0),
        (1L, 4L, ts(10000), 5.0)) ++
        (0 until 20).map(i => (2L, 10L + i, ts(i.toLong), 1.0))
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = operators.EventsOps.discountedSessionReturns(df)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byKey = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // 1 + 0.9*2 + 0.81*4 = 6.04, exactly (9/10 powers are exact decimals)
    assert(byKey((1L, 1L)) === ((3L, 6.04)))
    assert(byKey((1L, 2L)) === ((1L, 5.0)))
    // sum_{k<16} 0.9^k = (1 - 0.9^16)/0.1 = 8.146980 on the round-6 grid
    val (n2, g2) = byKey((2L, 1L))
    assert(n2 === 16L, "horizon caps the counted events")
    assert(g2 === 8.14698)
  }
}
