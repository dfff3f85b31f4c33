package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GridSum

class GridSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sums landing EXACTLY on the rounding boundary are half-away stable " +
       "under any partitioning (the round-5/6 flake class)") {
    // five terms of 1e-7: scaled-1e10 integers of 1000 each → sum 5000 →
    // exactly the 0.5e-6 boundary; a float-sum-then-round is a coin flip
    // here, the fixed-point contract must give 1e-6, half away from zero
    for (sign <- Seq(1.0, -1.0); parts <- Seq(1, 7, 32)) {
      val df = (1 to 5).map(i => (i.toLong, sign * 1e-7)).toDF("g", "t")
        .repartition(parts)
      val got = df.agg(GridSum.gridRoundedSum(col("t"), 10, 6).as("v"))
        .head().getDouble(0)
      assert(got === sign * 1e-6, s"sign=$sign parts=$parts: got $got")
    }
  }

  test("agrees with plain round-after-sum away from boundaries") {
    val vals = Seq(0.123456789, -0.987654321, 0.5, 1e-9, -3.25)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("g", "t")
    val got = df.agg(GridSum.gridRoundedSum(col("t"), 10, 6)).head().getDouble(0)
    val want = BigDecimal(vals.map(v =>
        BigDecimal(v * 1e10).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      .sum.toDouble / 1e10)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === want)
  }
}
