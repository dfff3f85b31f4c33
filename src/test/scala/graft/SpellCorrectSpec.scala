package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SpellCorrect

class SpellCorrectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val vocab = Seq(
    ("hello", 10L), ("hell", 7L), ("help", 5L), ("world", 3L), ("hold", 2L))
    .toDF("term", "freq")

  test("delete-key join finds every distance-1 candidate; frequency ranks") {
    val qs = Seq("helo").toDF("query_term")
    val got = SpellCorrect.correct(vocab, "term", "freq", qs, "query_term")
      .orderBy($"rank")
      .select($"suggestion", $"distance", $"rank")
      .as[(String, Int, Int)].collect().toSeq
    // hello (ins), hell (sub), help (sub) are all distance 1 -> freq order
    assert(got === Seq(("hello", 1, 1), ("hell", 1, 2), ("help", 1, 3)))
  }

  test("an exact vocabulary hit ranks itself first at distance 0") {
    val got = SpellCorrect.correct(vocab, "term", "freq",
        Seq("help").toDF("query_term"), "query_term")
      .orderBy($"rank").select($"suggestion", $"distance")
      .as[(String, Int)].collect().toSeq
    assert(got.head === (("help", 0)))
  }

  test("distance-2 strings never surface (symmetric-delete is distance-1 exact)") {
    val got = SpellCorrect.correct(vocab, "term", "freq",
      Seq("hxlo", "zzz").toDF("query_term"), "query_term")
    assert(got.count() === 0L)
  }

  test("deleteKeys: self plus each single-char delete, duplicates collapsed") {
    val keys = Seq("aab").toDF("t")
      .select(SpellCorrect.deleteKeys($"t").as("k"))
      .as[Seq[String]].head()
    assert(keys.toSet === Set("aab", "ab", "aa")) // 'ab' from two positions, once
  }
}
