package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // one pathologically hot key (90% of rows) plus a uniform tail
  private lazy val left = spark.range(0, 5000)
    .select(when($"id" % 10 < 9, lit(7L)).otherwise($"id").as("k"),
      ($"id" * 3).as("v"))
    .cache()
  private lazy val right = spark.range(0, 200)
    .select($"id".as("k"), concat(lit("p"), $"id").as("tag"))

  test("saltedJoin equals the plain inner join for several salt factors") {
    val plain = left.join(right, Seq("k"))
      .select($"k", $"v", $"tag").as[(Long, Long, String)]
      .collect().sorted.toSeq
    for (salt <- Seq(1, 4, 13)) {
      val salted = Skew.saltedJoin(left, right, "k", salt)
        .select($"k", $"v", $"tag").as[(Long, Long, String)]
        .collect().sorted.toSeq
      assert(salted === plain, s"salt=$salt")
    }
  }

  test("salting actually spreads the hot key over multiple shuffle partitions") {
    // pin a shuffle join: broadcast would skip the shuffle entirely, and AQE
    // would coalesce these tiny partitions back together
    val conf = spark.conf
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val salt = 4
      val salted = Skew.saltedJoin(left, right, "k", salt)
      // count distinct physical partitions holding the hot key's output rows
      val parts = salted.filter($"k" === 7L)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(parts > 1, s"hot key landed in $parts partition(s); expected fan-out")
      // unsalted baseline: the hot key collapses into exactly one partition
      val base = left.join(right, Seq("k")).filter($"k" === 7L)
        .select(spark_partition_id().as("p")).distinct().count()
      assert(base === 1L)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("salt must be positive") {
    intercept[IllegalArgumentException] { Skew.saltedJoin(left, right, "k", 0) }
  }
}
