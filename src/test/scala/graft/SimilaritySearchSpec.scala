package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SimilaritySearch

class SimilaritySearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").cache()
  private lazy val queries = emb.where($"vec_id" < 10)
    .select($"vec_id".as("q_id"), $"embedding".as("q_vec")).cache()

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet

  test("brute force: k results per query, self excluded, rank contiguous") {
    val bf = SimilaritySearch.bruteForceTopK(emb, queries, k = 10)
    val perQ = bf.groupBy($"q_id").agg(count(lit(1)).as("n"), max($"rank").as("mx"))
      .as[(Long, Long, Int)].collect()
    assert(perQ.length === 10)
    assert(perQ.forall(r => r._2 === 10L && r._3 === 10))
    assert(!hits(bf).exists(p => p._1 == p._2))
  }

  test("LSH recall vs brute force is substantial at 4 bits") {
    val bf = hits(SimilaritySearch.bruteForceTopK(emb, queries, k = 10))
    val lsh = hits(SimilaritySearch.lshTopK(emb, queries, k = 10, nBits = 4, dim = 64))
    val recall = bf.intersect(lsh).size.toDouble / bf.size
    // 4 bits -> ~1/16 of corpus probed; nearest neighbors co-bucket far more
    // often than random because hyperplane agreement ~ angle closeness.
    assert(recall > 0.25, s"recall=$recall")
  }

  test("LSH bucketing is deterministic across invocations") {
    val a = SimilaritySearch.lshTopK(emb, queries, k = 5, nBits = 4, dim = 64)
      .collect().toSeq
    val b = SimilaritySearch.lshTopK(emb, queries, k = 5, nBits = 4, dim = 64)
      .collect().toSeq
    assert(a === b)
  }

  test("IVF probe returns ranked results with good recall at nprobe=4/8 centroids") {
    val bf = hits(SimilaritySearch.bruteForceTopK(emb, queries, k = 5))
    val ivf = hits(SimilaritySearch.ivfTopK(emb, queries, k = 5, nCentroids = 8, nprobe = 4))
    val recall = bf.intersect(ivf).size.toDouble / bf.size
    assert(recall > 0.4, s"recall=$recall")
  }
}
