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
