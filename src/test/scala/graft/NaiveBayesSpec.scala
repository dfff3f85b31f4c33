package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NaiveBayes

class NaiveBayesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("separable vocabularies classify held-out docs perfectly") {
    val train = Seq((1L, "X", "apple"), (1L, "X", "apple"), (1L, "X", "pie"),
      (2L, "Y", "banana"), (2L, "Y", "banana"), (2L, "Y", "split"))
      .toDF("id", "label", "tok")
    val test = Seq((10L, "X", "apple"), (10L, "X", "pie"),
      (11L, "Y", "banana")).toDF("id", "label", "tok")
    val out = NaiveBayes.trainPredict(train, test, "id", "label", "tok")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out === Map(10L -> "X", 11L -> "Y"))
  }

  test("tokens unseen in training fall back to smoothing, never null scores") {
    val train = Seq((1L, "X", "a"), (2L, "Y", "b"), (2L, "Y", "b"))
      .toDF("id", "label", "tok")
    // 'zzz' appears nowhere: both classes score it via Laplace alone, and
    // the class with the smaller token total (X: T=1) smooths HIGHER
    val test = Seq((10L, "X", "zzz")).toDF("id", "label", "tok")
    val out = NaiveBayes.trainPredict(train, test, "id", "label", "tok").collect()
    assert(out.length === 1 && out.head.getString(2) === "X")
  }

  test("exact score ties break to the lexicographically smallest class") {
    // perfectly symmetric classes: equal priors, totals, and counts
    val train = Seq((1L, "B", "t"), (2L, "A", "t")).toDF("id", "label", "tok")
    val test = Seq((10L, "A", "t")).toDF("id", "label", "tok")
    val out = NaiveBayes.trainPredict(train, test, "id", "label", "tok").collect()
    assert(out.head.getString(2) === "A")
  }

  test("confusion matrix counts every test doc exactly once") {
    val train = Seq((1L, "X", "a"), (2L, "Y", "b")).toDF("id", "label", "tok")
    val test = Seq((10L, "X", "a"), (11L, "X", "b"), (12L, "Y", "b"))
      .toDF("id", "label", "tok")
    val cm = NaiveBayes.confusion(train, test, "id", "label", "tok")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(cm.values.sum === 3)
    assert(cm(("X", "X")) === 1L && cm(("X", "Y")) === 1L && cm(("Y", "Y")) === 1L)
  }
}
