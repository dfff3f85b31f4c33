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

  test("maxSim: hand-checked on 2 tokens of 2 dims; token max is per query token") {
    import spark.implicits._
    // doc tokens: (1,0),(0,1); query tokens: (1,0),(1,1)
    //   qt0 best = cos((1,0),(1,0)) = 1
    //   qt1 best = cos((1,1),(1,0)) = cos((1,1),(0,1)) = 1/sqrt(2) = 0.7071
    //   score = 1.7071
    val corpus = Seq((10L, Seq(1f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val qs = Seq((0L, Seq(1f, 0f, 1f, 1f))).toDF("q_id", "q_vec")
    val out = SimilaritySearch.maxSimTopK(corpus, qs, nTokens = 2, k = 1).head()
    assert(out.getAs[Double]("similarity") === 1.7071)
    // pooling the same vectors into ONE token scores differently —
    // late interaction is not a relabeled single-vector cosine
    val pooled = SimilaritySearch.maxSimTopK(corpus, qs, nTokens = 1, k = 1).head()
    assert(pooled.getAs[Double]("similarity") !== 1.7071)
  }

  test("mutualPairs keeps only reciprocal edges, canonical a<b") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L, 0.9), (2L, 1L, 0.9), // mutual
      (1L, 3L, 0.8),                // one-way only
      (4L, 2L, 0.7), (2L, 4L, 0.7)  // mutual, given in reverse order
    ).toDF("src", "dst", "sim")
    val out = SimilaritySearch.mutualPairs(edges, "src", "dst", "sim")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 2L), (2L, 4L)))
  }
}
