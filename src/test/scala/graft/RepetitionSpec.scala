package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Repetition

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sig(text: String): (Double, Double, Double) = {
    val row = Repetition.signals(Seq((1L, text)).toDF("doc_id", "text"), "text", "doc_id")
      .select("top_bigram_frac", "top_trigram_frac", "dup_8gram_frac")
      .as[(Double, Double, Double)].head()
    row
  }

  test("pure repetition saturates every signal") {
    // "a a a ... a" (16 tokens): every bigram/trigram identical, every
    // 8-gram identical and repeated
    val (b, t, d) = sig(Seq.fill(16)("a").mkString(" "))
    assert(b === 1.0 && t === 1.0 && d === 1.0)
  }

  test("all-distinct tokens floor the top-gram shares and zero the dup signal") {
    val (b, t, d) = sig((1 to 16).map(i => s"w$i").mkString(" "))
    assert(b === math.rint(1.0 / 15 * 10000) / 10000) // 15 bigrams, all unique
    assert(t === math.rint(1.0 / 14 * 10000) / 10000)
    assert(d === 0.0) // every 8-gram unique
  }

  test("short docs degrade to 0 (total extension)") {
    assert(sig("only one") === ((1.0, 0.0, 0.0))) // 1 bigram, no trigram/8-gram
    assert(sig("solo") === ((0.0, 0.0, 0.0)))
    assert(sig("") === ((0.0, 0.0, 0.0)))
  }

  test("a verbatim self-copy is caught by the dup-8gram signal") {
    val span = (1 to 10).map(i => s"tok$i").mkString(" ")
    // 20 tokens, 13 8-grams; windows i=1..3 recur at i=11..13 -> 6/13
    val (b, t, d) = sig(span + " " + span)
    assert(d === math.rint(6.0 / 13 * 10000) / 10000, s"dup_8gram_frac=$d")
    assert(b < 0.2) // but no single bigram dominates
  }
}
