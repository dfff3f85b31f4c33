package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Rake

class RakeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("phrase segmentation: maximal stopword-free runs, edges and doubles handled") {
    val f = Rake.phrasesUdf(Set("the", "a"))
    val got = Seq("the fast scan beats a slow sort the end")
      .toDF("t").select(f($"t").as("p")).as[Seq[String]].head()
    assert(got === Seq("fast scan beats", "slow sort", "end"))
    // leading/trailing stopwords, consecutive stopwords, empty text
    val g2 = Seq("a the x the the y the").toDF("t").select(f($"t").as("p")).as[Seq[String]].head()
    assert(g2 === Seq("x", "y"))
    assert(Seq("the a the").toDF("t").select(f($"t").as("p")).as[Seq[String]].head() === Nil)
  }

  test("topPhrases: hand-checked degree/frequency scoring on the RAKE paper shape") {
    // two docs; phrases: "deep learning" x2, "learning" x1
    //   freq: deep=2, learning=3;  deg: deep=2+2=4, learning=2+2+1=5
    //   wscore: deep=2.0, learning=5/3
    //   score("deep learning") = 2 + 5/3 = 3.6667; score("learning") = 1.6667
    val docs = Seq(
      "deep learning the deep learning",
      "the learning").toDF("text")
    val out = Rake.topPhrases(docs, "text", Seq("the"), k = 10)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("deep learning") === (2L, 3.6667))
    assert(out("learning") === (1L, 1.6667))
  }

  test("topPhrases: ranking is (score desc, phrase asc) and k-bounded") {
    val docs = Seq("x y the x y the z z z").toDF("text")
    val out = Rake.topPhrases(docs, "text", Seq("the"), k = 1).collect()
    assert(out.length === 1)
    // "x y" scores 2+2=4; "z z z" scores 3×(deg 9 / freq 3) = 9 — RAKE's
    // known long-run bias, which is why the stoplist must be corpus-tuned
    assert(out.head.getString(0) === "z z z")
    assert(out.head.getDouble(2) === 9.0)
  }
}
