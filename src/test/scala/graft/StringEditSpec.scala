package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{EditDistance, StringEditExpressions}
import org.apache.spark.unsafe.types.UTF8String

/** Pins [[graft.plans.EditDistance.banded]] (the early-exit banded edit
  * distance behind dedup_levenshtein's verify stage) to the built-in
  * `levenshtein(l, r, threshold)` contract: the exact distance when <= k,
  * -1 otherwise.
  */
class StringEditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def banded(a: String, b: String, k: Int): Int =
    EditDistance.banded(UTF8String.fromString(a), UTF8String.fromString(b), k)

  /** Reference: classic full-matrix Levenshtein, thresholded afterwards. */
  private def ref(a: String, b: String, k: Int): Int = {
    val n = a.length; val m = b.length
    val dp = Array.tabulate(n + 1, m + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to n; j <- 1 to m) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + cost)
    }
    if (dp(n)(m) > k) -1 else dp(n)(m)
  }

  test("edge cases") {
    assert(banded("", "", 0) === 0)
    assert(banded("", "abc", 3) === 3)
    assert(banded("", "abc", 2) === -1)
    assert(banded("abc", "abc", 0) === 0)
    assert(banded("abc", "abd", 0) === -1)
    assert(banded("abc", "abd", 1) === 1)
    assert(banded("kitten", "sitting", 3) === 3)
    assert(banded("kitten", "sitting", 2) === -1)
    // length difference alone exceeds the band
    assert(banded("a" * 40, "a" * 10, 24) === -1)
    assert(banded("a", "b", -1) === -1)
  }

  test("matches full-matrix reference on random strings across thresholds") {
    val alphabet = Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.oneOf(' ', '.', 'é', 'ß', '中')))
    (0 until 300).foreach { i =>
      val seed = Seed(i.toLong)
      val la = Gen.chooseNum(0, 60).pureApply(Gen.Parameters.default, seed)
      val lb = Gen.chooseNum(0, 60).pureApply(Gen.Parameters.default, seed.next)
      val a = Gen.listOfN(la, alphabet).pureApply(Gen.Parameters.default, seed).mkString
      val b = Gen.listOfN(lb, alphabet).pureApply(Gen.Parameters.default, seed.next).mkString
      for (k <- Seq(0, 1, 3, 8, 24, 100)) {
        assert(banded(a, b, k) === ref(a, b, k), s"a='$a' b='$b' k=$k")
      }
    }
  }

  test("multi-word Myers path: long Latin-1 strings match the full-matrix reference") {
    // lengths up to ~200 chars exercise 1-, 2-, and 4-word bit-vectors;
    // é (U+00E9) stays on the Latin-1/Myers path, 中 forces the DP fallback
    val latin1 = Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.oneOf(' ', '.', 'é')))
    val anyBmp = Gen.frequency(
      (8, Gen.alphaLowerChar), (2, Gen.oneOf(' ', '中', 'é')))
    for ((alpha, tag) <- Seq((latin1, "latin1"), (anyBmp, "bmp"))) {
      (0 until 120).foreach { i =>
        val seed = Seed(9000L + i)
        val la = Gen.chooseNum(0, 200).pureApply(Gen.Parameters.default, seed)
        val lb = Gen.chooseNum(0, 200).pureApply(Gen.Parameters.default, seed.next)
        val a = Gen.listOfN(la, alpha).pureApply(Gen.Parameters.default, seed).mkString
        val b = Gen.listOfN(lb, alpha).pureApply(Gen.Parameters.default, seed.next).mkString
        for (k <- Seq(0, 3, 24, 64, 150, 500)) {
          assert(banded(a, b, k) === ref(a, b, k), s"[$tag] a='$a' b='$b' k=$k")
        }
      }
    }
    // word-boundary lengths: 63/64/65/127/128/129 with 0-2 edits
    for (n <- Seq(63, 64, 65, 127, 128, 129)) {
      val s = (0 until n).map(i => ('a' + i % 26).toChar).mkString
      val variants = Seq(s, s.dropRight(1), s.updated(n / 2, 'Z'), "q" + s, s.reverse)
      for (x <- variants; k <- Seq(1, 2, 24)) {
        assert(banded(s, x, k) === ref(s, x, k), s"n=$n x='${x.take(8)}…' k=$k")
      }
    }
  }

  test("near-identical strings (the regime the early exit must not break)") {
    val base = "The quick brown fox jumps over the lazy dog, twice daily."
    val edits = Seq(
      base,
      base.replace("quick", "quack"),
      base.drop(3),
      "xy" + base,
      base.take(20) + base.drop(25),
      base.reverse)
    for (x <- edits; y <- edits; k <- Seq(2, 5, 24)) {
      assert(banded(x, y, k) === ref(x, y, k), s"x='$x' y='$y' k=$k")
    }
  }

  test("char bag matches the declarative 27-bin histogram and the L1 bound is admissible") {
    import graft.plans.CharBag
    val gen = Gen.frequency(
      (8, Gen.alphaChar), (3, Gen.const(' ')), (1, Gen.oneOf('.', ',', '7', 'é')))
    val strs = (0 until 200).map { i =>
      val seed = Seed(1000L + i)
      val n = Gen.chooseNum(0, 140).pureApply(Gen.Parameters.default, seed)
      Gen.listOfN(n, gen).pureApply(Gen.Parameters.default, seed).mkString
    }
    // bag equals the 27-scan declarative definition
    val bins = ('a' to 'z') :+ ' '
    for (s <- strs) {
      val want = bins.map(ch => s.toLowerCase.count(_ == ch).min(255))
      val got = CharBag.bag(UTF8String.fromString(s)).map(_ & 0xff).toSeq
      assert(got === want, s"bag mismatch for '$s'")
    }
    // admissibility: edit distance <= k implies the bag bound passes
    // (pairs with banded(a,b,k) >= 0 must never be rejected by l1Within)
    for (a <- strs.take(40); b <- strs.take(40); k <- Seq(3, 24)) {
      if (banded(a, b, k) >= 0) {
        assert(CharBag.l1Within(
          CharBag.bag(UTF8String.fromString(a)),
          CharBag.bag(UTF8String.fromString(b)), 2 * k),
          s"bag bound rejected a qualifying pair: '$a' vs '$b' k=$k")
      }
    }
    // early exit returns the same verdict as the plain sum
    for (a <- strs.take(60); b <- strs.take(60)) {
      val ba = CharBag.bag(UTF8String.fromString(a))
      val bb = CharBag.bag(UTF8String.fromString(b))
      val l1 = ba.zip(bb).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.sum
      for (bound <- Seq(0, 10, 48, 300)) {
        assert(CharBag.l1Within(ba, bb, bound) === (l1 <= bound))
      }
    }
  }

  test("column expression agrees with the built-in levenshtein(l, r, k)") {
    val pairs = Seq(
      ("hello world", "hello word"), ("abc", "zzz"), ("", "abc"),
      ("same", "same"), ("a" * 50, "a" * 49 + "b"), ("a" * 50, "b" * 50))
    val df = pairs.toDF("a", "b")
    val got = df.select(
      StringEditExpressions.bandedLevenshtein(col("a"), col("b"), 5).as("custom"),
      levenshtein(col("a"), col("b"), 5).as("builtin"))
    assert(got.where(col("custom") =!= col("builtin")).count() === 0)
  }
}
