package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val points = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    .select($"o_orderkey", $"o_totalprice").limit(2000).cache()

  // price bands of uneven widths
  private lazy val bands = Seq(
    (0.0, 50000.0, "low"), (50000.0, 150000.0, "mid"),
    (150000.0, 300000.0, "high"), (300000.0, 1e9, "huge")
  ).toDF("lo", "hi", "band")

  test("bucketed range join equals the naive inequality join at several widths") {
    val naive = points.join(bands,
        $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .select($"o_orderkey", $"band").as[(Long, String)].collect().toSet
    for (width <- Seq(10000.0, 77000.0, 250000.0)) {
      val bucketed = RangeJoin.pointInInterval(
        points, "o_totalprice", bands, "lo", "hi", width)
        .select($"o_orderkey", $"band").as[(Long, String)].collect().toSet
      assert(bucketed === naive, s"width=$width")
    }
  }

  test("bucketed formulation plans as a hash join, not nested-loop") {
    val plan = RangeJoin.pointInInterval(
      points, "o_totalprice", bands, "lo", "hi", 50000.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }

  test("end fractionally above a bucket boundary still matches points in the last bucket") {
    // regression: an epsilon-subtraction in bucket expansion dropped the
    // final bucket for intervals like [0, 2.0000000005) at width 1.0,
    // silently losing the point 2.0
    val p = Seq((1L, 2.0)).toDF("id", "v")
    val iv = Seq((0.0, 2.0000000005, "band")).toDF("lo", "hi", "band")
    val got = RangeJoin.pointInInterval(p, "v", iv, "lo", "hi", 1.0)
      .select($"id", $"band").as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "band")))
  }

  test("boundary semantics: start inclusive, end exclusive") {
    val p = Seq((1L, 50000.0), (2L, 49999.99)).toDF("id", "v")
    val got = RangeJoin.pointInInterval(p, "v", bands, "lo", "hi", 1000.0)
      .select($"id", $"band").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "mid", 2L -> "low"))
  }
}
