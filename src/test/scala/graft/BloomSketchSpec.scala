package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomSketch

class BloomSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("no false negatives ever: every inserted key probes true") {
    val keys = (1 to 500).map(i => s"key_$i").toDF("k")
    val bits = BloomSketch.build(keys, col("k"), k = 4, m = 1024)
    val probed = BloomSketch.probe(keys, col("k"), bits, k = 4, m = 1024)
    assert(probed.where(!col("bloom_hit")).count() === 0L,
      "a Bloom filter must never reject an inserted key")
  }

  test("false-positive rate on non-members stays near the analytic bound") {
    val ins = (1 to 150).map(i => s"member_$i").toDF("k")
    val out = (1 to 2000).map(i => s"absent_$i").toDF("k")
    val m = 2048; val k = 4
    val bits = BloomSketch.build(ins, col("k"), k, m)
    val fp = BloomSketch.probe(out, col("k"), bits, k, m)
      .where(col("bloom_hit")).count().toDouble / 2000
    // analytic: (1 - e^{-kn/m})^k with n=150 -> ~0.0044; allow 4x slack
    val bound = math.pow(1 - math.exp(-k.toDouble * 150 / m), k)
    assert(fp <= 4 * bound + 0.005, s"fp rate $fp vs bound $bound")
  }

  test("mergeable: union of shard filters equals the filter of the union") {
    val a = (1 to 100).map(i => s"doc_$i").toDF("k")
    val b = (80 to 200).map(i => s"doc_$i").toDF("k")
    val merged = BloomSketch.build(a.union(b), col("k"), 4, 512)
      .select($"bits").as[Seq[Long]].head()
    val shardA = BloomSketch.build(a, col("k"), 4, 512)
      .select($"bits").as[Seq[Long]].head()
    val shardB = BloomSketch.build(b, col("k"), 4, 512)
      .select($"bits").as[Seq[Long]].head()
    assert((shardA.toSet ++ shardB.toSet) === merged.toSet)
  }
}
