package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Features

class FeaturesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("looTargetEncode matches hand-computed leave-one-out means") {
    val df = Seq(("A", 1.0, 1L), ("A", 3.0, 2L), ("B", 10.0, 3L))
      .toDF("k", "t", "id")
    val out = Features.looTargetEncode(df, "k", "t", m = 1.0)
      .select("id", "loo_enc").as[(Long, Double)].collect().toMap
    val prior = 14.0 / 3
    def enc(sMinusX: Double, n: Long): Double =
      math.rint(((sMinusX + 1.0 * prior) / (n - 1 + 1.0)) * 1e4) / 1e4
    assert(out(1L) === enc(3.0, 2)) // A's sum 4 minus own 1
    assert(out(2L) === enc(1.0, 2))
    assert(out(3L) === enc(0.0, 1)) // singleton: pure prior via smoothing
  }

  test("looTargetEncode: singleton key with smoothing lands on the prior") {
    val df = Seq(("A", 2.0, 1L), ("B", 4.0, 2L)).toDF("k", "t", "id")
    val out = Features.looTargetEncode(df, "k", "t", m = 10.0)
      .select("id", "loo_enc").as[(Long, Double)].collect().toMap
    // (0 + 10*3) / (0 + 10) = prior = 3.0 for both singletons
    assert(out(1L) === 3.0 && out(2L) === 3.0)
  }

  test("looTargetEncode rejects m = 0 (singleton keys would divide by zero)") {
    val df = Seq(("A", 1.0)).toDF("k", "t")
    intercept[IllegalArgumentException] {
      Features.looTargetEncode(df, "k", "t", m = 0.0)
    }
  }

  test("the encoding never leaks the row's own target for extreme rows") {
    // one huge outlier in key A: its OWN encoding must exclude the outlier,
    // every other A row's encoding must include it — the leakage guard
    val df = Seq(("A", 1000.0, 1L), ("A", 1.0, 2L), ("A", 1.0, 3L))
      .toDF("k", "t", "id")
    val out = Features.looTargetEncode(df, "k", "t", m = 0.001)
      .select("id", "loo_enc").as[(Long, Double)].collect().toMap
    assert(out(1L) < 2.0)   // outlier sees only the small rows
    assert(out(2L) > 400.0) // small rows see the outlier
  }
}
