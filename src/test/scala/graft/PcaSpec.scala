package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pca

class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf}/embeddings.parquet").cache()

  private def rnd(x: Double, s: Int): Double =
    BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent single-node mirror of the operator's portable arithmetic. */
  private def ref(vecs: Seq[(Long, Array[Double])], dim: Int, iters: Int): Map[Long, Double] = {
    var v = Array.fill(dim)(rnd(1.0 / math.sqrt(dim), 6))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    for (_ <- 1 to iters) {
      val ds = vecs.map { case (_, x) => dot(x, v) }
      val sums = Array.tabulate(dim) { c =>
        // per-term 1e-9 fixed-point grid, exact integer sum, integer
        // half-away-from-zero round-6 — the operator's order-proof contract
        val scaled = vecs.zip(ds).map { case ((_, x), d) =>
          BigInt(rnd(x(c) * d * 1e9, 0).toLong) }.sum
        val mag = (scaled.abs + 500) / 1000
        (if (scaled.signum < 0) -mag else mag).toDouble / 1e6
      }
      val norm = math.sqrt(sums.foldLeft(0.0)((a, x) => a + x * x))
      v = sums.map(x => rnd(x / norm, 6))
    }
    vecs.map { case (id, x) => id -> rnd(dot(x, v), 4) }.toMap
  }

  test("projections match an independent single-node mirror exactly") {
    val vecs = emb.select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, a) => id -> a.map(_.toDouble) }.toSeq
    val want = ref(vecs, dim = 64, iters = 3)
    val got = Pca.powerIterationProjection(emb, "embedding", "vec_id", 64, 3)
      .as[(Long, Double)].collect().toMap
    assert(got === want)
  }

  test("dominant direction beats every coordinate axis on mean-square projection") {
    val got = Pca.powerIterationProjection(emb, "embedding", "vec_id", 64, 3)
      .agg(avg($"pc1_proj" * $"pc1_proj")).as[Double].head()
    // mean-square along each raw coordinate = second moment of that column
    val axisMs = emb.select(posexplode($"embedding"))
      .groupBy($"pos").agg(avg($"col" * $"col").as("ms"))
      .agg(max($"ms")).as[Double].head()
    assert(got >= axisMs,
      s"top-PC mean-square $got must dominate best coordinate axis $axisMs")
  }

  test("component sums landing EXACTLY on the 0.5e-6 round-6 boundary are " +
       "half-up stable under any partitioning (the round-5 flake class)") {
    // five terms of 1e-7 → scaled-integer sum exactly 500 → the adversarial
    // halfway case: a float-sum-then-round contract is a coin flip here
    // (1e-7 is inexact in binary; summation order moves the last ulp);
    // the fixed-point contract must give exactly 1e-6 (half away from zero)
    for (sign <- Seq(1.0, -1.0); parts <- Seq(1, 7, 32)) {
      val base = spark.createDataFrame(
        (1 to 5).map(i => (i.toLong, Seq(sign * 1e-7, 1.0)))
      ).toDF("__pid", "__pv").repartition(parts)
      val sums = Pca.componentSums(base, Array(0.0, 1.0))
      assert(sums(0) === sign * 1.0e-6,
        s"sign=$sign parts=$parts: got ${sums(0)}")
      assert(sums(1) === 5.0, s"sign=$sign parts=$parts: got ${sums(1)}")
    }
  }

  test("deterministic under repartitioning (the rounding grid absorbs order noise)") {
    val a = Pca.powerIterationProjection(emb, "embedding", "vec_id", 64, 3)
      .as[(Long, Double)].collect().toMap
    val b = Pca.powerIterationProjection(emb.repartition(13), "embedding", "vec_id", 64, 3)
      .as[(Long, Double)].collect().toMap
    assert(a === b)
  }
}
