package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DictionaryTag

class DictionaryTagSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(pats: Seq[String], text: String): Map[String, Long] = {
    val ac = new DictionaryTag.AhoCorasick(pats)
    val c = ac.countMatches(text)
    (0 until ac.nPatterns).map(i => ac.pattern(i) -> c(i)).toMap
  }

  test("overlapping occurrences all count ('aaa' contains 'aa' twice)") {
    assert(counts(Seq("aa"), "aaa") === Map("aa" -> 2L))
    assert(counts(Seq("aba"), "ababa") === Map("aba" -> 2L))
  }

  test("suffix outputs fire: 'she' reports both 'she' and 'he'") {
    assert(counts(Seq("she", "he", "hers"), "ushers") ===
      Map("she" -> 1L, "he" -> 1L, "hers" -> 1L))
  }

  test("fail links walk mid-pattern ('tab' then 'able' over 'table')") {
    assert(counts(Seq("tab", "able", "ble"), "table") ===
      Map("tab" -> 1L, "able" -> 1L, "ble" -> 1L))
    // classic: patterns sharing prefixes, text forcing fallback
    assert(counts(Seq("ab", "bc", "abc"), "abcabc") ===
      Map("ab" -> 2L, "bc" -> 2L, "abc" -> 2L))
  }

  test("multi-word phrases and absent patterns") {
    val m = counts(Seq("batch batch", "zap"), "batch batch batch")
    assert(m === Map("batch batch" -> 2L, "zap" -> 0L))
  }

  test("null and empty text, distributed pass matches local automaton") {
    assert(counts(Seq("x"), null).values.sum === 0L)
    assert(counts(Seq("x"), "").values.sum === 0L)
    val docs = Seq((1L, "the spark table scan"), (2L, "join join"), (3L, ""))
      .toDF("doc_id", "text")
    val pats = Seq("spark", "join", "ta", "table")
    val ac = new DictionaryTag.AhoCorasick(pats)
    val want = Map(
      1L -> ac.countMatches("the spark table scan").sum,
      2L -> ac.countMatches("join join").sum,
      3L -> 0L)
    val gotTotals = DictionaryTag.tagCounts(docs, "text", "doc_id", pats)
      .select(col("doc_id"), col("n_matches")).as[(Long, Long)].collect().toMap
    assert(gotTotals === want)
  }
}
