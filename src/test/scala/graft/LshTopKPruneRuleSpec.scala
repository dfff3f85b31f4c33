package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions
import graft.operators.SimilaritySearch
import graft.plans.LshTopKPruneRule

class LshTopKPruneRuleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val bits = 4; private val dim = 64; private val seed = 42L

  private lazy val bucketed = {
    val planes = SimilaritySearch.hyperplanes(bits, dim, seed)
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .withColumn(LshTopKPruneRule.BucketCol,
        SimilaritySearch.lshBucket($"embedding", planes))
      .cache()
  }

  private def topkPlan(qvec: Array[Float]) =
    bucketed
      .withColumn("similarity",
        VectorFunctions.cosineSimilarity($"embedding", typedlit(qvec)))
      .orderBy(desc("similarity"))
      .limit(10)

  private def qvec: Array[Float] =
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .where($"vec_id" === 0).select($"embedding").as[Seq[Float]].head().toArray

  test("rule rewrites cosine top-k into a bucket-pruned scan when enabled") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.graft.lsh.autoPrune", "false")
    val exactPlan = topkPlan(qvec).queryExecution.optimizedPlan.toString
    assert(!exactPlan.contains("__lsh_bucket IN"), "rule must be off by default")

    spark.conf.set("spark.graft.lsh.autoPrune", "true")
    spark.conf.set("spark.graft.lsh.bits", bits.toString)
    spark.conf.set("spark.graft.lsh.dim", dim.toString)
    spark.conf.set("spark.graft.lsh.seed", seed.toString)
    try {
      val pruned = topkPlan(qvec)
      val plan = pruned.queryExecution.optimizedPlan.toString
      assert(plan.contains("__lsh_bucket"), s"expected bucket filter in:\n$plan")
      assert(plan.contains(" IN "), s"expected IN probe list in:\n$plan")

      // pruned result: 10 rows, a high-recall subset of the exact top-k
      val prunedIds = pruned.select($"vec_id").as[Long].collect().toSet
      spark.conf.set("spark.graft.lsh.autoPrune", "false")
      val exactIds = topkPlan(qvec).select($"vec_id").as[Long].collect().toSet
      assert(prunedIds.size === 10)
      assert(prunedIds.intersect(exactIds).size >= 3,
        s"pruned=$prunedIds exact=$exactIds")
    } finally {
      spark.conf.set("spark.graft.lsh.autoPrune", "false")
    }
  }

  test("probe set is the base bucket plus all hamming-1 neighbors") {
    val probes = LshTopKPruneRule.probeBuckets(qvec, bits, dim, seed)
    assert(probes.length === bits + 1)
    assert(probes.distinct.length === bits + 1)
    val base = probes.head
    probes.tail.foreach { p =>
      assert(p.zip(base).count { case (a, b) => a != b } === 1)
    }
  }

  test("probe depth widens the set to all hamming<=d buckets") {
    val d2 = LshTopKPruneRule.probeBuckets(qvec, bits, dim, seed, depth = 2)
    assert(d2.length === 1 + bits + bits * (bits - 1) / 2)
    assert(d2.distinct.length === d2.length)
    val base = d2.head
    assert(d2.forall(p => p.zip(base).count { case (a, b) => a != b } <= 2))
    // depth 0 is just the base bucket; depth >= bits is the whole space
    assert(LshTopKPruneRule.probeBuckets(qvec, bits, dim, seed, 0).toSeq === Seq(base))
    assert(LshTopKPruneRule.probeBuckets(qvec, bits, dim, seed, bits).length === (1 << bits))
  }

  test("the rule honors spark.graft.lsh.probeDepth") {
    GraftExtensions.register(spark)
    spark.conf.set("spark.graft.lsh.autoPrune", "true")
    spark.conf.set("spark.graft.lsh.bits", bits.toString)
    spark.conf.set("spark.graft.lsh.dim", dim.toString)
    spark.conf.set("spark.graft.lsh.seed", seed.toString)
    spark.conf.set("spark.graft.lsh.probeDepth", "2")
    try {
      val plan = topkPlan(qvec).queryExecution.optimizedPlan.toString
      // at depth 2 the IN-list holds 1 + 4 + 6 = 11 of the 16 buckets
      val inList = "__lsh_bucket[^)]*IN \\(([^)]*)\\)".r
        .findFirstMatchIn(plan).map(_.group(1)).getOrElse(fail(plan))
      assert(inList.split(",").length === 11, inList)
    } finally {
      spark.conf.set("spark.graft.lsh.autoPrune", "false")
      spark.conf.unset("spark.graft.lsh.probeDepth")
    }
  }
}
