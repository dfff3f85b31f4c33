package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], capacity: Int, width: Long) =
    Packing.packOffsets(rows.toDF("id", "tok"), "id", "tok", capacity, width)
      .select($"id", $"start_off", $"seq_first", $"seq_last")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)

  test("offsets are the exclusive prefix sum in id order") {
    val rows = Seq((0L, 10L), (1L, 20L), (2L, 5L), (3L, 65L))
    val got = pack(rows, capacity = 50, width = 2)
    assert(got.map(_._2).toSeq === Seq(0L, 10L, 30L, 35L))
  }

  test("sequence ids: fits, exact boundary fill, and straddle") {
    // capacity 10: doc0 fills [0,10); doc1 straddles 10..24 -> seqs 1..2
    val got = pack(Seq((0L, 10L), (1L, 15L), (2L, 1L)), capacity = 10, width = 10)
    assert(got(0) === ((0L, 0L, 0L, 0L)))   // [0,10) -> seq 0 only
    assert(got(1) === ((1L, 10L, 1L, 2L)))  // [10,25) -> seqs 1,2
    assert(got(2) === ((2L, 25L, 2L, 2L)))  // [25,26) -> seq 2
  }

  test("bucket width does not change the result (pure parallelization knob)") {
    val rows = (0L until 100L).map(i => (i, (i % 7) + 1))
    val w1 = pack(rows, capacity = 32, width = 1)
    val w13 = pack(rows, capacity = 32, width = 13)
    val wBig = pack(rows, capacity = 32, width = 1000)
    assert(w1.toSeq === w13.toSeq)
    assert(w13.toSeq === wBig.toSeq)
  }

  test("zero-token rows are dropped and occupy no stream positions") {
    val got = pack(Seq((0L, 5L), (1L, 0L), (2L, 5L)), capacity = 100, width = 10)
    assert(got.map(_._1).toSeq === Seq(0L, 2L))
    assert(got(1)._2 === 5L) // doc2 starts right after doc0
  }

  test("nonpositive capacity or width is rejected") {
    intercept[IllegalArgumentException] { pack(Seq((0L, 1L)), 0, 10) }
    intercept[IllegalArgumentException] { pack(Seq((0L, 1L)), 10, 0) }
  }
}
