package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorAvg

class VectorAvgSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("vector_avg equals element-wise explode-average") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .withColumn("g", pmod($"vec_id", lit(7)))
    val viaUdaf = emb.groupBy($"g")
      .agg(udaf(VectorAvg).apply($"embedding").as("c"))
      .select($"g", posexplode($"c").as(Seq("dim", "x")))
      .as[(Long, Int, Float)].collect()
      .map { case (g, d, x) => (g, d) -> x }.toMap
    val viaExplode = emb
      .select($"g", posexplode($"embedding").as(Seq("dim", "x")))
      .groupBy($"g", $"dim").agg(avg($"x").as("m"))
      .as[(Long, Int, Double)].collect()
      .map { case (g, d, m) => (g, d) -> m }.toMap
    assert(viaUdaf.keySet === viaExplode.keySet)
    viaUdaf.foreach { case (k, v) =>
      assert(math.abs(v - viaExplode(k)) < 1e-5, s"at $k")
    }
  }

  test("empty group / null inputs produce null, single vector is identity") {
    val df = Seq(
      (1L, Some(Seq(1f, 2f, 3f))),
      (2L, None: Option[Seq[Float]])
    ).toDF("g", "v").withColumn("v", $"v".cast("array<float>"))
    val got = df.groupBy($"g").agg(udaf(VectorAvg).apply($"v").as("c"))
      .as[(Long, Option[Seq[Float]])].collect().toMap
    assert(got(1L) === Some(Seq(1f, 2f, 3f)))
    assert(got(2L) === None)
  }
}
