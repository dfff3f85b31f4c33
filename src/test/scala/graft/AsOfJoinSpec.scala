package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right row at or before left ts, per key") {
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("key", "qts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00"), "t1"), // after 10:00 quote
      (1L, ts("2024-01-01 11:00:00"), "t2"), // equal ts -> inclusive match
      (1L, ts("2024-01-01 09:00:00"), "t3"), // before any quote -> null
      (2L, ts("2024-01-01 23:00:00"), "t4"),
      (3L, ts("2024-01-01 10:00:00"), "t5")  // key with no right rows -> null
    ).toDF("key", "tts", "trade")

    val got = AsOfJoin.asOfBackward(trades, quotes,
      leftKey = "key", rightKey = "key", leftTs = "tts", rightTs = "qts",
      rightPayload = Seq("price"))
      .select($"trade", $"price").as[(String, Option[Double])]
      .collect().toMap

    assert(got === Map(
      "t1" -> Some(100.0), "t2" -> Some(110.0), "t3" -> None,
      "t4" -> Some(200.0), "t5" -> None))
  }

  test("left columns and row count are preserved (left-join semantics)") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"), "x")).toDF("key", "tts", "payload")
    val right = spark.emptyDataset[(Long, Timestamp, Double)].toDF("key", "qts", "v")
    val out = AsOfJoin.asOfBackward(left, right, "key", "key", "tts", "qts", Seq("v"))
    assert(out.columns.toSeq === Seq("key", "tts", "payload", "v"))
    assert(out.count() === 1)
  }
}
