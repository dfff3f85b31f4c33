package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sharding

class ShardingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("HRW minimal movement: adding a shard moves ~1/(n+1) of keys, all TO the new shard") {
    val keys = spark.range(10000).toDF("id")
    val n = 8
    val shards = (0 until n).map(i => s"node$i")
    val grown = shards :+ s"node$n"
    val both = keys.select($"id",
      Sharding.rendezvousShard($"id", shards).as("a"),
      Sharding.rendezvousShard($"id", grown).as("b"))
      .cache()
    val moved = both.where($"a" =!= $"b")
    // every moved key landed on the NEW shard — nothing cascades
    assert(moved.where($"b" =!= s"node$n").count() === 0L)
    // moved fraction ~ 1/(n+1) (binomial tolerance)
    val frac = moved.count().toDouble / 10000
    assert(math.abs(frac - 1.0 / (n + 1)) < 0.02, s"moved fraction $frac")
    both.unpersist()
  }

  test("assignment is balanced and deterministic") {
    val keys = spark.range(10000).toDF("id")
    val shards = (0 until 5).map(i => s"s$i")
    val counts = Sharding.assign(keys, "id", shards)
      .groupBy($"shard").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === shards.toSet)
    counts.values.foreach(c => assert(math.abs(c - 2000L) < 300, counts.toString))
    val again = Sharding.assign(keys.repartition(7), "id", shards)
      .as[(Long, String)].collect().toMap
    val first = Sharding.assign(keys, "id", shards)
      .as[(Long, String)].collect().toMap
    assert(again === first)
  }

  test("single shard takes everything; duplicate shard names rejected") {
    val keys = spark.range(10).toDF("id")
    val one = Sharding.assign(keys, "id", Seq("only"))
      .select($"shard").distinct().as[String].collect()
    assert(one.toSeq === Seq("only"))
    intercept[IllegalArgumentException] {
      Sharding.rendezvousShard($"id", Seq("a", "a"))
    }
  }
}
