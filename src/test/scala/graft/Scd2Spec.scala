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

  test("pitJoin: probes see the version valid AT their ts, never the leaked current row") {
    val dim0 = Scd2.init(Seq((1L, "v0")).toDF("k", "v"), "k", Seq("v"))
    val dim = Scd2.applyBatch(
      Scd2.applyBatch(dim0, Seq((1L, "v1")).toDF("k", "v"), "k", Seq("v"), 5L),
      Seq((1L, "v2")).toDF("k", "v"), "k", Seq("v"), 9L)
    val probes = Seq((1L, 0L), (1L, 4L), (1L, 5L), (1L, 8L), (1L, 9L), (1L, 100L))
      .toDF("k", "ts")
    val got = Scd2.pitJoin(dim, probes, "k", "ts")
      .select($"ts", $"v").as[(Long, String)].collect().toMap
    assert(got === Map(0L -> "v0", 4L -> "v0", 5L -> "v1", 8L -> "v1",
      9L -> "v2", 100L -> "v2"))
    // exactly one match per probe (SCD2 disjointness)
    assert(Scd2.pitJoin(dim, probes, "k", "ts").count() === probes.count())
  }
}
