package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cosOf(a: Seq[Float], b: Seq[Float]): Double =
    Seq((a, b)).toDF("a", "b")
      .select(cosineSimilarity($"a", $"b").as("c")).as[Double].head()

  test("cosine of identical non-zero vectors is 1") {
    assert(math.abs(cosOf(Seq(1f, 2f, 3f), Seq(1f, 2f, 3f)) - 1.0) < 1e-12)
  }

  test("cosine of orthogonal vectors is 0; opposite is -1") {
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(0f, 1f))) < 1e-12)
    assert(math.abs(cosOf(Seq(1f, 0f), Seq(-1f, 0f)) + 1.0) < 1e-12)
  }

  test("zero vector yields similarity 0 (total extension)") {
    assert(cosOf(Seq(0f, 0f), Seq(1f, 2f)) === 0.0)
  }

  test("properties over random vectors: symmetry, range, self-similarity") {
    val gen = Gen.listOfN(16, Gen.chooseNum(-5f, 5f))
    (0 until 100).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong)).toSeq
      val b = gen.pureApply(Gen.Parameters.default, Seed(i + 1000L)).toSeq
      val ab = cosOf(a, b); val ba = cosOf(b, a)
      assert(math.abs(ab - ba) < 1e-12)
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9)
      if (a.exists(_ != 0f)) assert(math.abs(cosOf(a, a) - 1.0) < 1e-9)
    }
  }

  test("sq8: per-element error bounded by 0.5/scale; zero vector round-trips to zero") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(200)
    val rows = emb.select($"embedding",
        sq8Scale($"embedding").as("s"),
        sq8Dequantize(sq8Quantize($"embedding", sq8Scale($"embedding")),
          sq8Scale($"embedding")).as("deq"))
      .as[(Seq[Float], Double, Seq[Float])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (x, s, deq) =>
      assert(s > 0.0)
      x.zip(deq).foreach { case (a, b) =>
        assert(math.abs(a - b) <= 0.5 / s + 1e-6, s"err beyond SQ8 bound at scale $s")
      }
    }
    val z = Seq(Seq(0f, 0f, 0f)).toDF("embedding")
      .select(sq8Dequantize(sq8Quantize($"embedding", sq8Scale($"embedding")),
        sq8Scale($"embedding")).as("deq")).as[Seq[Float]].head()
    assert(z === Seq(0f, 0f, 0f))
  }

  test("sq8: cosine on dequantized vectors tracks exact cosine (top-k recall holds)") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(300)
      .select($"vec_id", $"embedding",
        sq8Dequantize(sq8Quantize($"embedding", sq8Scale($"embedding")),
          sq8Scale($"embedding")).as("deq"))
    val q = emb.where($"vec_id" === 0)
      .select($"embedding".as("qv"), $"deq".as("qdeq")).cache()
    val scored = emb.crossJoin(q)
      .select($"vec_id",
        cosineSimilarity($"embedding", $"qv").as("exact"),
        cosineSimilarity($"deq", $"qdeq").as("quant"))
      .as[(Long, Double, Double)].collect()
    // pointwise: int8 codes keep cosine within ~1% on these 64-dim vectors
    scored.foreach { case (_, e, qc) => assert(math.abs(e - qc) < 0.02, s"$e vs $qc") }
    // rank-level: top-10 by quantized cosine recovers >= 8 of the exact top-10
    val exactTop = scored.sortBy(-_._2).take(10).map(_._1).toSet
    val quantTop = scored.sortBy(-_._3).take(10).map(_._1).toSet
    assert(exactTop.intersect(quantTop).size >= 8, s"$exactTop vs $quantTop")
  }

  test("l2Normalize produces unit vectors; euclidean distance of equal vectors is 0") {
    val n = Seq(Seq(3f, 4f)).toDF("a")
      .select(l2Norm(l2Normalize($"a")).as("n")).as[Double].head()
    assert(math.abs(n - 1.0) < 1e-6)
    val d = Seq((Seq(1f, 2f), Seq(1f, 2f))).toDF("a", "b")
      .select(euclideanDistance($"a", $"b").as("d")).as[Double].head()
    assert(d === 0.0)
  }
}
