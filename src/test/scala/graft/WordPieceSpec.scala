package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BpeTrainer, WordPiece}

class WordPieceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("greedyCount: longest-match-first with single-char fallback") {
    val vm = Set("ab", "abc", "cd", "xy")
    // "abcd": longest at 0 is "abc" (len 3), then "d" falls back -> 2
    assert(WordPiece.greedyCount("abcd", vm, 4) === 2)
    // greedy is NOT optimal: "abcd" with vocab {abc, cd} -> abc|d = 2,
    // though ab|cd would also be 2; with vocab {a, bcd} absent, fallback
    // chains: "zzzz" -> 4 single chars
    assert(WordPiece.greedyCount("zzzz", vm, 4) === 4)
    // match at interior positions
    assert(WordPiece.greedyCount("zxyz", vm, 4) === 3) // z|xy|z
    // maxPieceLen caps the probe even when a longer piece exists
    assert(WordPiece.greedyCount("abcd", Set("abcd"), 2) === 4)
    assert(WordPiece.greedyCount("", vm, 4) === 0)
  }

  test("vocab: weighted per-position counts, (cnt desc, piece) ranking") {
    val words = Seq(("aaab", 2L), ("ab", 3L)).toDF("word", "freq")
    val v = WordPiece.vocab(spark, words, "word", "freq", maxPieceLen = 3, topK = 10)
      .as[(Int, String, Long)].collect().toList
    // "aaab" (f=2): aa(x2 positions), aaa, aab, ab, aaab->len>3 skipped
    // "ab" (f=3): ab
    // counts: aa=4, ab=2+3=5, aaa=2, aab=2
    val m = v.map(r => r._2 -> r._3).toMap
    assert(m("ab") === 5L && m("aa") === 4L && m("aaa") === 2L && m("aab") === 2L)
    // ranks: ab(5)=1, aa(4)=2, then ties at 2 break lexicographically
    assert(v.take(2).map(_._2) === List("ab", "aa"))
    assert(v.drop(2).map(_._2) === List("aaa", "aab"))
    assert(v.map(_._1) === (1 to v.length).toList)
  }

  test("encodeCounts: distributed counts match a local replay on the fixture") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val vm = WordPiece.vocab(spark, BpeTrainer.wordFreq(docs, "text"),
        "word", "freq", 4, 50)
      .select(col("piece")).as[String].collect().toSet
    val gotMap = WordPiece.encodeCounts(docs, "text", "doc_id", vm)
      .select(col("doc_id"), col("n_tokens_wp")).as[(Long, Long)].collect().toMap
    val want = docs.select(col("doc_id"), lower(col("text"))).as[(Long, String)]
      .collect().map { case (id, t) =>
        val ws = if (t == null) Array.empty[String]
                 else t.split("\\s+").filter(_.nonEmpty)
        id -> ws.map(w => WordPiece.greedyCount(w, vm, 4).toLong).sum
      }.toMap
    assert(gotMap === want)
  }
}
