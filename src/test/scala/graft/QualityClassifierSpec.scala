package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.QualityClassifier

class QualityClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("plattScale: recovers a compressed sigmoid's slope and improves " +
      "log-loss over the uncalibrated scores") {
    // scores are UNDER-confident by construction: the true label rate at
    // score s follows sigma(4s), but the raw scorer reports sigma(s) —
    // per score level, positives in proportion to sigma(4s)
    val posOf = Map(-1.0 -> 0, -0.5 -> 1, 0.0 -> 4, 0.5 -> 7, 1.0 -> 8)
    val rows = for {
      (s, pos) <- posOf.toSeq
      i <- 0 until 8
    } yield (s, if (i < pos) 1.0 else 0.0)
    val df = rows.toDF("s", "y")
    val r = QualityClassifier.plattScale(df, "s", "y", steps = 3).head()
    val a = r.getAs[Double]("a")
    val b = r.getAs[Double]("b")
    assert(r.getAs[Long]("n") === 40L)
    // 3 Newton steps from (0,0) move decisively toward the true slope ~4
    assert(a > 1.5, s"a=$a")
    assert(math.abs(b) < 1.0, s"b=$b")
    assert(r.getAs[Double]("logloss_platt") < r.getAs[Double]("logloss_raw"),
      s"platt=${r.getAs[Double]("logloss_platt")} raw=${r.getAs[Double]("logloss_raw")}")

    // already-calibrated scores: the fit stays near identity (a ~ 1, b ~ 0)
    // and cannot make things worse on the round-4 grid
    val calPos = Map(-2.0 -> 1, -1.0 -> 2, 0.0 -> 4, 1.0 -> 6, 2.0 -> 7)
    val calRows = for {
      (s, pos) <- calPos.toSeq
      i <- 0 until 8
    } yield (s, if (i < pos) 1.0 else 0.0)
    val rc = QualityClassifier.plattScale(calRows.toDF("s", "y"), "s", "y",
      steps = 3).head()
    val ac = rc.getAs[Double]("a")
    assert(ac > 0.5 && ac < 2.0, s"a=$ac")
    assert(rc.getAs[Double]("logloss_platt") <=
      rc.getAs[Double]("logloss_raw") + 1e-9)
  }
}
