package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Embedder, VectorFunctions}

/** The core query operator — exact vector top-k, replacing the reference's
  * RediSearch `KNN` query over an HNSW index (reference
  * `modules/utilities.py:368-401`, query string built at `:380-387`).
  *
  * The reference's HNSW search is *approximate* (recall < 1); exact
  * brute-force is a correctness superset, and on Spark it plans as a single
  * narrow scan + `TakeOrderedAndProject`: each partition computes a partial
  * top-k, only k rows per partition reach the driver — no shuffle, no full
  * sort. With `index_alias` partition pruning (the reference's key-prefix
  * routing, `modules/utilities.py:284-287`) the scan is bounded to one
  * tenant. For the 100 TB path, [[SimilaritySearch.lshTopK]] provides the
  * bucket-pruned approximate variant (the HNSW analogue).
  */
object KnnSearch {

  /** Q2/Q3: similarity-scored top-k. `similarity = 1 - cosine_distance`
    * (reference `modules/utilities.py:394`); ties broken by id for
    * determinism. */
  def topK(index: DataFrame, queryVec: Array[Float], k: Int,
           vecCol: String = "page_content_vector",
           tieBreak: String = "id"): DataFrame =
    index
      .withColumn("similarity",
        VectorFunctions.cosineSimilarity(col(vecCol), typedlit(queryVec)))
      .orderBy(desc("similarity"), asc(tieBreak))
      .limit(k)

  /** The hit-result schema every search surface returns (P6 result
    * projection) — ONE definition so `search`, the facade's `search`, and
    * `searchAsOf` cannot drift apart. */
  def hitProjection(hits: DataFrame): DataFrame =
    hits.select(col("id"), col("index_alias"), col("document_path"),
      col("page_number"), col("page_content"), col("similarity"))

  /** MMR diversified re-rank (Carbonell & Goldstein, SIGIR '98): greedily
    * select k of the candidates maximizing
    * lambda * relevance - (1 - lambda) * max-similarity-to-selected.
    * The candidate GENERATION is the distributed top-k (exact or any
    * approximate tier); this greedy O(k^2) selection then runs on the
    * k-BOUNDED candidate set driver-side — the same bounded-model cadence
    * as the IVF/PQ codebook steps, never a corpus operation.
    *
    * Reproducibility contract: relevance arrives rounded to 4 and every
    * pairwise similarity is rounded to 4, then BOTH are lifted to exact
    * e4 fixed-point integers and the score is computed as
    * 10*lambda*rel_e4 - 10*(1-lambda)*maxsim_e4 (an e5 integer) — the
    * greedy compare and the output are pure integer arithmetic, so an
    * ANSI replay makes bit-identical choices (a rounded DOUBLE score sat
    * on a half-ulp boundary and flipped between engines; integers cannot).
    * `lambda` must be a multiple of 0.1 so the weights are exact ints.
    * Pairwise cosine mirrors [[graft.plans.VectorExpressions]]: index-order
    * accumulation, dp / (sqrt(na) * sqrt(nb)), 0 on zero norm.
    * Output: (rank, vec_id, relevance, mmr_score_e5).
    */
  def mmrRerank(candidates: Seq[(Long, Array[Float], Double)], k: Int,
                lambda: Double = 0.7): Seq[(Int, Long, Double, Long)] = {
    require(k >= 1 && lambda > 0.0 && lambda <= 1.0)
    val wRel = math.round(lambda * 10).toInt
    val wDiv = 10 - wRel
    require(math.abs(lambda * 10 - wRel) < 1e-9, s"lambda must be a multiple of 0.1, got $lambda")
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dp += x * y; na += x * x; nb += y * y; i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) 0.0 else dp / den
    }
    def e4(x: Double): Long = math.round(
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble * 10000)
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Long)]
    val selVecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    var remaining = candidates
    for (rank <- 1 to math.min(k, candidates.size)) {
      val scored = remaining.map { case (id, v, rel) =>
        val maxSimE4 = if (selVecs.isEmpty) 0L else selVecs.map(s => e4(cos(v, s))).max
        (id, v, rel, wRel * e4(rel) - wDiv * maxSimE4)
      }
      val best = scored.minBy { case (id, _, _, sc) => (-sc, id) }
      selected += ((rank, best._1, best._3, best._4))
      selVecs += best._2
      remaining = remaining.filterNot(_._1 == best._1)
    }
    selected.toSeq
  }

  /** E2 search entry (reference `queryRedis`, `modules/utilities.py:368-401`):
    * embed the prompt (Q1, `:376-377`), partition-pruned scan, exact top-k,
    * result projection (P6, `:385,393-395`). */
  def search(spark: SparkSession, indexPath: String, alias: String,
             prompt: String, k: Int,
             model: String = graft.core.ModelRegistry.default,
             seed: Int = Embedder.DefaultSeed): DataFrame = {
    val qvec = Embedder.embedQuery(prompt, model, seed)
    // readLatest: re-ingested documents must not surface stale versions
    // (HSET last-write-wins, modules/utilities.py:304-309)
    hitProjection(topK(IndexTable.readLatest(spark, indexPath, alias), qvec, k))
  }
}
