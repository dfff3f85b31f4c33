package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

class Scd2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def table(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, String, Long, Option[Long])].collect().toSet

  test("applyBatch closes changed, inserts new, ignores no-ops, keeps history") {
    val dim0 = Scd2.init(
      Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "v"), "k", Seq("v"))
    // t=1: key 1 changes, key 2 no-op, key 4 inserted, key 3 untouched
    val dim1 = Scd2.applyBatch(dim0,
      Seq((1L, "x2"), (2L, "y"), (4L, "w")).toDF("k", "v"), "k", Seq("v"), 1L)
    assert(table(dim1) === Set(
      (1L, "x", 0L, Some(1L)), (1L, "x2", 1L, None),
      (2L, "y", 0L, None), (3L, "z", 0L, None), (4L, "w", 1L, None)))
    // t=2: key 1 changes AGAIN (third version), key 4 no-op
    val dim2 = Scd2.applyBatch(dim1,
      Seq((1L, "x3"), (4L, "w")).toDF("k", "v"), "k", Seq("v"), 2L)
    assert(table(dim2) === Set(
      (1L, "x", 0L, Some(1L)), (1L, "x2", 1L, Some(2L)), (1L, "x3", 2L, None),
      (2L, "y", 0L, None), (3L, "z", 0L, None), (4L, "w", 1L, None)))
    // invariants: exactly one open version per key; closed chain is contiguous
    val open = dim2.where($"valid_to".isNull).groupBy($"k").count()
      .as[(Long, Long)].collect().toMap
    assert(open.values.forall(_ == 1L))
  }

  test("NULL attribute values compare null-safely (no phantom versions)") {
    val dim0 = Scd2.init(Seq((1L, null.asInstanceOf[String])).toDF("k", "v"),
      "k", Seq("v"))
    val same = Scd2.applyBatch(dim0,
      Seq((1L, null.asInstanceOf[String])).toDF("k", "v"), "k", Seq("v"), 1L)
    assert(table(same) === Set((1L, null, 0L, None)))
    val changed = Scd2.applyBatch(dim0,
      Seq((1L, "now-set")).toDF("k", "v"), "k", Seq("v"), 1L)
    assert(table(changed) ===
      Set((1L, null, 0L, Some(1L)), (1L, "now-set", 1L, None)))
  }
}
