package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zValue2 interleaves bits (x even positions, y odd)") {
    val got = Seq((1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L), (5L, 0L))
      .toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y"), bits = 8))
      .as[Long].collect().toSeq
    // x=1 -> bit0 at pos0; y=1 -> bit0 at pos1; (3,3) -> 0b1111;
    // (2,1) -> x bit1 at pos2 | y bit0 at pos1 = 6; (5,0) -> 0b10001 = 17
    assert(got === Seq(1L, 2L, 15L, 6L, 17L))
  }

  test("z-order layout narrows per-file ranges on the SECOND dim vs single-col sort") {
    val df = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val zDir = Files.createTempDirectory("graft_zorder").toString
    val sDir = Files.createTempDirectory("graft_sorder").toString
    ZOrder.clusterWrite(df, zDir, "l_orderkey", "l_partkey", numFiles = 8)
    // baseline: same file count, clustered by the FIRST column only
    df.repartitionByRange(8, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(sDir)

    def avgSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("span"))
        .agg(avg(col("span"))).as[Double].head()

    val zPart = avgSpan(zDir, "l_partkey")
    val sPart = avgSpan(sDir, "l_partkey")
    val zOrd = avgSpan(zDir, "l_orderkey")
    val sOrd = avgSpan(sDir, "l_orderkey")
    // single-col sort leaves the second dim unclustered (~full range per
    // file); z-order must cut its per-file span substantially while keeping
    // REAL locality on the first dim too (far below the full range).
    assert(zPart < sPart * 0.7, s"partkey span: z=$zPart vs sorted=$sPart")
    val ordRange = df.agg(max("l_orderkey") - min("l_orderkey")).as[Long].head().toDouble
    assert(zOrd < ordRange * 0.7, s"orderkey span: z=$zOrd vs range=$ordRange")
    assert(sPart > zPart, "baseline should be the unclustered one on dim 2")
  }
}
