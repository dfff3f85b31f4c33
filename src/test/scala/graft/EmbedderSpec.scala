package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Embedder

class EmbedderSpec extends AnyFunSuite {

  test("deterministic across calls, dim from registry") {
    val a = Embedder.embed("the quick brown fox", 64, 42)
    val b = Embedder.embed("the quick brown fox", 64, 42)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 64)
  }

  test("L2-normalized for non-empty text") {
    val v = Embedder.embed("hello world foo bar", 64, 42)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("empty / non-word text embeds to zero vector") {
    assert(Embedder.embed("", 16, 42).forall(_ == 0f))
    assert(Embedder.embed("!!! ...", 16, 42).forall(_ == 0f))
  }

  test("bag-of-words: word order does not change the embedding") {
    val a = Embedder.embed("alpha beta gamma", 64, 42)
    val b = Embedder.embed("gamma alpha beta", 64, 42)
    assert(a.toSeq === b.toSeq)
  }

  test("different seeds give different embeddings") {
    val a = Embedder.embed("alpha beta gamma", 64, 42)
    val b = Embedder.embed("alpha beta gamma", 64, 43)
    assert(a.toSeq !== b.toSeq)
  }

  test("identical token multisets embed identically; similar texts are cosine-closer") {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      val nx = math.sqrt(x.map(a => a.toDouble * a).sum)
      val ny = math.sqrt(y.map(a => a.toDouble * a).sum)
      d / (nx * ny)
    }
    val base = Embedder.embed("spark scans the table fast", 64, 42)
    val near = Embedder.embed("spark scans the table slowly", 64, 42)
    val far = Embedder.embed("entirely unrelated words appear here", 64, 42)
    assert(cos(base, near) > cos(base, far))
  }

  test("property: embedding norm is 0 or ~1 over random strings") {
    val gen = Gen.asciiPrintableStr
    (0 until 200).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val v = Embedder.embed(s, 32, 42)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n < 1e-9 || math.abs(n - 1.0) < 1e-5, s"input=$s")
    }
  }
}
