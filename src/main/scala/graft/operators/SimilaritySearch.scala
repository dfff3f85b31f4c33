package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column — the scale
  * path for the reference's HNSW index (reference
  * `modules/utilities.py:272-278`). Three tiers:
  *
  *  1. [[bruteForceTopK]] — exact; broadcast the (small) query set against
  *     the (huge) corpus; per-query top-k via window rank. The corpus scan is
  *     embarrassingly parallel; the only shuffle is the rank on (query_id),
  *     bounded to candidates.
  *  2. [[lshTopK]] — random-hyperplane LSH: sign-bit bucket per vector;
  *     queries probe their own bucket (+ optional 1-bit-flip neighbors).
  *     Bucket assignment is a narrow map; the join is bucket-pruned, so the
  *     probe cost is corpus/2^bits per query instead of the full scan — the
  *     HNSW-recall-tradeoff analogue, but shardable over 1000 executors.
  *  3. [[ivfTopK]] — IVF: k-means-lite centroids (deterministic init + fixed
  *     Lloyd iterations), vectors partitioned by nearest centroid; queries
  *     probe the `nprobe` nearest centroids. Centroids are tiny => broadcast;
  *     corpus is bucketed by centroid id => co-located probe joins.
  */
object SimilaritySearch {

  /** Per-query top-k via the bounded-buffer aggregate
    * ([[graft.functions.TopKBy]]): partial aggregation keeps <= k candidates
    * per partition per query, so the exchange carries (partitions x k) rows
    * per query — never the full scored expansion that a
    * `row_number().over(partitionBy(queryId))` window would shuffle before
    * discarding all but k. Ids must be numeric (the tie-break is (similarity
    * desc, id asc), matching the SQL oracles). */
  private[operators] def topKPerQuery(scored: DataFrame, k: Int,
                                      queryId: String, corpusId: String): DataFrame = {
    val topk = udaf(graft.functions.TopKBy(k))
    scored.groupBy(col(queryId))
      .agg(topk(col("similarity"), col(corpusId).cast("long")).as("__topk"))
      .select(col(queryId), posexplode(col("__topk")))
      .select(col(queryId), col("col._2").as(corpusId),
        col("col._1").as("similarity"), (col("pos") + 1).cast("int").as("rank"))
  }

  /** Per-GROUP top-k over a frame carrying (`groupCol`, `idCol`,
    * `similarity`) — the group plays the query role in the same
    * bounded-buffer aggregate (diversified retrieval's per-source cap,
    * per-domain fair selection). Same scale contract as the per-query cut:
    * map-side partials, shuffle <= partitions x k rows per group. */
  def topKPerGroup(scored: DataFrame, k: Int,
                   groupCol: String, idCol: String): DataFrame =
    topKPerQuery(scored, k, groupCol, idCol)

  /** Exact top-k for each query vector. `queries` must be small enough to
    * broadcast (true for interactive search; for batch query loads partition
    * both sides by an LSH prefix instead). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     corpusVec: String = "embedding", corpusId: String = "vec_id",
                     queryVec: String = "q_vec", queryId: String = "q_id",
                     excludeSelf: Boolean = true): DataFrame = {
    val joined = Dedup.spread(corpus).join(
      broadcast(queries.select(col(queryId), col(queryVec))),
      if (excludeSelf) col(corpusId) =!= col(queryId) else lit(true))
    val scored = joined.withColumn("similarity",
      round(VectorFunctions.cosineSimilarity(col(corpusVec), col(queryVec)), 4))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** Deterministic random hyperplanes: `nBits` planes in `dim` dims, seeded.
    * Pure-Scala PRNG => stable across JVMs. */
  def hyperplanes(nBits: Int, dim: Int, seed: Long): Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  /** Sign-bit LSH bucket key for a vector column. */
  def lshBucket(vec: org.apache.spark.sql.Column, planes: Array[Array[Float]]): org.apache.spark.sql.Column = {
    val bits = planes.map { p =>
      when(VectorFunctions.dotProduct(vec, typedlit(p.toSeq)) >= 0, "1").otherwise("0")
    }
    concat(bits.toSeq: _*)
  }

  /** Approximate top-k: bucket corpus and queries with the same hyperplanes,
    * join on bucket, exact-rerank within bucket. Multi-probe (the standard
    * recall lever, cf. multi-probe LSH): with `multiProbe >= 1` each query
    * also probes every bucket at hamming distance EXACTLY 1 from its own
    * (higher distances are not currently expanded), trading
    * (1 + nBits) / 2^nBits of the corpus scanned for much higher recall —
    * still a bucket-pruned, shardable join at 100 TB, unlike a graph index. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nBits: Int,
              dim: Int, seed: Long = 42L, multiProbe: Int = 1,
              corpusVec: String = "embedding", corpusId: String = "vec_id",
              queryVec: String = "q_vec", queryId: String = "q_id"): DataFrame = {
    val planes = hyperplanes(nBits, dim, seed)
    val bucketed = Dedup.spread(corpus)
      .withColumn("bucket", lshBucket(col(corpusVec), planes))
    val base = lshBucket(col(queryVec), planes)
    val probes: Seq[org.apache.spark.sql.Column] =
      if (multiProbe < 1) Seq(base)
      else base +: (1 to nBits).map { i =>
        val bit = substring(base, i, 1)
        concat(substring(base, 1, i - 1),
          when(bit === "1", "0").otherwise("1"),
          substring(base, i + 1, nBits - i))
      }
    val qb = queries.withColumn("bucket", explode(array(probes: _*)))
    val joined = bucketed.join(broadcast(qb), Seq("bucket"))
      .where(col(corpusId) =!= col(queryId))
    // no pair dedup needed: each corpus vector has exactly ONE bucket, so a
    // (corpus, query) pair meets at most one of the query's probe buckets
    val scored = joined.withColumn("similarity",
      round(VectorFunctions.cosineSimilarity(col(corpusVec), col(queryVec)), 4))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** IVF index build: deterministic centroid init (every (n/c)-th vector by
    * id order) + `iters` Lloyd iterations as DataFrame aggregations.
    * Returns (centroids dataframe: centroid_id, centroid). */
  def ivfCentroids(corpus: DataFrame, nCentroids: Int, iters: Int = 2,
                   vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    // Round 6: delegate to the engine-PORTABLE Lloyd build
    // ([[KMeans.centroidsDF]] — md5-ordered seeds, round-8 assignment
    // grid, round-6 means) so every IVF structure, including the stored
    // codebook, is replayable by an ANSI oracle. Seed ids are the
    // (md5(id), id) rank — deterministic and partitioning-independent,
    // like the old murmur TakeOrdered but portable.
    KMeans.centroidsDF(corpus, vecCol, idCol, nCentroids, iters)
      .select(col("__cid").cast("long").as("centroid_id"),
        col("__cent").as("centroid"))

  /** Assign each corpus vector to its nearest centroid. Broadcast join +
    * min(struct(dist, centroid_id)) aggregation: the expanded
    * (corpus x centroids) rows are reduced MAP-SIDE by partial aggregation,
    * so the shuffle carries ~one row per vector — unlike a window
    * formulation, which would shuffle the full expansion. Tie-break is the
    * lexicographic (dist, centroid_id) struct order, deterministic. */
  def assignToCentroid(corpus: DataFrame, centroids: DataFrame,
                       vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val otherCols = corpus.columns.filterNot(c => c == idCol || c == vecCol)
    Dedup.spread(corpus).join(broadcast(centroids))
      .withColumn("dist", graft.plans.VectorExpressions.squaredL2(col(vecCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(
        min(struct(col("dist"), col("centroid_id"))).getField("centroid_id").as("centroid_id"),
        (first(col(vecCol)).as(vecCol) +:
          otherCols.toIndexedSeq.map(c => first(col(c)).as(c))): _*)
  }

  /** IVF index build returning (centroids, assigned corpus). The inverted
    * lists ARE the final iteration's assignment (cached), and each list's
    * routing centroid is that list's mean — exactly how a real IVF index
    * stores (list, list-centroid) pairs. This folds a whole corpus pass out
    * of the query path: build = seed TakeOrdered + `iters` assignment
    * passes, and the probe join consumes the CACHED final assignment
    * instead of re-assigning against the updated codebook. Each iteration
    * is materialized before the previous one is released, so peak cache is
    * one corpus copy. */
  def ivfIndex(corpus: DataFrame, nCentroids: Int, iters: Int = 1,
               vecCol: String = "embedding", idCol: String = "vec_id",
               materializeChain: Boolean = false)
      : (DataFrame, DataFrame) = {
    require(iters >= 1)
    // Round 6: the build runs on the engine-PORTABLE Lloyd arithmetic
    // (md5 seeds, round-8 assignment grid, round-6 means) — the change
    // that let ann_ivf graduate from rows-only to oracle-gated. Contract
    // preserved: `assigned` is the assignment against the
    // (iters-1)-updated codebook and each list's ROUTING centroid is that
    // list's mean (the iters-updated codebook). Round 8: the chain is
    // LAZY — round 7 materialized every Lloyd round via localCheckpoint
    // ("half the build passes" in theory) and Probe `ivfbuild` measured
    // it ~1 s/query SLOWER on the gate shape (eager per-round jobs cost
    // more than the replayed seed TakeOrdered they save); identical
    // values either way.
    val chain = KMeans.centroidsSeq(corpus, vecCol, idCol, nCentroids, iters,
      materialize = materializeChain)
    val prev = chain(iters - 1)
      .select(col("__cid").cast("long").as("centroid_id"),
        col("__cent").as("centroid"))
    val otherCols = corpus.columns.filterNot(c => c == idCol || c == vecCol)
      .toIndexedSeq
    val assigned = Dedup.spread(corpus)
      .withColumn("__v", col(vecCol).cast("array<double>"))
      .crossJoin(broadcast(prev))
      .withColumn("__d", round(
        graft.plans.VectorExpressions.squaredL2(col("__v"), col("centroid")), 8))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d"), col("centroid_id")))
        .getField("centroid_id").as("centroid_id"),
        (first(col(vecCol)).as(vecCol) +:
          otherCols.map(c => first(col(c)).as(c))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    val centroids = chain(iters)
      .select(col("__cid").cast("long").as("centroid_id"),
        col("__cent").as("centroid"))
    (centroids, assigned)
  }

  /** [[ivfIndex]] under the build-once persistence contract of
    * [[GraphAnn.knnGraphPersisted]] / the store's `_graft_centroids`: the
    * first call writes the routing codebook and the assigned inverted
    * lists under `path`; later calls read them back. A production IVF
    * index is built once and amortized over every query against it — and
    * at the gate, every ann_ivf*-family query sharing a path now shares
    * ONE Lloyd chain instead of re-deriving it per query. */
  def ivfIndexPersisted(corpus: DataFrame, path: String, nCentroids: Int,
                        iters: Int = 1, vecCol: String = "embedding",
                        idCol: String = "vec_id"): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    // Readiness is keyed on a marker written AFTER both tables land, not on
    // the parent path: a writer that dies between the centroids and the
    // assigned write leaves no marker, so the next caller sweeps the partial
    // build and rebuilds instead of permanently failing the assigned read
    // (graft.core.PersistedBuild — the contract every persisted index uses).
    graft.core.PersistedBuild.ensure(spark, path) { stage =>
      val (c, a) = ivfIndex(corpus, nCentroids, iters, vecCol, idCol)
      c.write.mode("overwrite").parquet(s"$stage/centroids")
      a.write.mode("overwrite").parquet(s"$stage/assigned")
      a.unpersist()
    }
    (spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/assigned"))
  }

  /** IVF probe: route each query to its `nprobe` nearest centroids, scan only
    * those inverted lists, exact-rerank. At scale the corpus is written
    * bucketed by centroid_id so the probe join is co-located. With
    * `indexPath` the index comes from [[ivfIndexPersisted]] (build once,
    * amortize over queries — the graph tier's contract). */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCentroids: Int = 16, nprobe: Int = 2,
              corpusVec: String = "embedding", corpusId: String = "vec_id",
              queryVec: String = "q_vec", queryId: String = "q_id",
              materializeChain: Boolean = false,
              indexPath: Option[String] = None): DataFrame = {
    val (centroids0, assigned) = indexPath match {
      case Some(pth) =>
        ivfIndexPersisted(corpus, pth, nCentroids, iters = 1, corpusVec, corpusId)
      case None => ivfIndex(corpus, nCentroids, iters = 1, corpusVec, corpusId,
        materializeChain = materializeChain)
    }
    val centroids = centroids0.cache()
    val qw = Window.partitionBy(col(queryId)).orderBy(asc("qdist"), asc("centroid_id"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("qdist", VectorFunctions.euclideanDistance(col(queryVec), col("centroid")))
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nprobe)
      .select(col(queryId), col(queryVec), col("centroid_id"))
    val joined = assigned.join(probes, Seq("centroid_id"))
      .where(col(corpusId) =!= col(queryId))
    val scored = joined.withColumn("similarity",
      round(VectorFunctions.cosineSimilarity(col(corpusVec), col(queryVec)), 4))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** Late-interaction (ColBERT-style MaxSim) scoring: both sides carry
    * `nTokens` token vectors packed into one flat array; the score is
    * Σ over query tokens of the max cosine against any document token —
    * the multi-vector retrieval model that beats single-vector pooling on
    * phrase queries. Scored with ONE compiled UDF pass per (doc, query)
    * pair (token loops in index order, double accumulators — the oracle
    * replays the identical fold sequence with ordered list_reduce), then
    * the usual TopKBy bounded cut. Queries broadcast; at index scale the
    * pair set comes from any candidate tier first (IVF cells, LSH
    * buckets) — MaxSim is the re-rank stage, not the sweep.
    */
  def maxSimTopK(corpus: DataFrame, queries: DataFrame, nTokens: Int, k: Int,
                 corpusVec: String = "embedding", corpusId: String = "vec_id",
                 queryVec: String = "q_vec", queryId: String = "q_id"): DataFrame = {
    require(nTokens >= 1, s"nTokens must be >= 1, got $nTokens")
    val score = udf { (d: Seq[Float], q: Seq[Float]) =>
      val dim = d.length / nTokens
      // ragged inputs (a query shorter than the corpus vectors, or a
      // length not divisible by nTokens) must not throw in an executor:
      // guard every index against BOTH array lengths, matching KMeans'
      // assignUdf — out-of-range components simply contribute nothing
      val dLen = d.length; val qLen = q.length
      var s = 0.0
      var qt = 0
      while (qt < nTokens) {
        var best = -1.0 // cosines live in [-1, 1]; empty-norm tokens score 0
        var dt = 0
        while (dt < nTokens) {
          var dot = 0.0; var nq = 0.0; var nd = 0.0
          var j = 0
          val lim = math.min(dim, math.min(dLen - dt * dim, qLen - qt * dim))
          while (j < lim) {
            val qv = q(qt * dim + j).toDouble
            val dv = d(dt * dim + j).toDouble
            dot += qv * dv; nq += qv * qv; nd += dv * dv
            j += 1
          }
          val c = if (nq == 0.0 || nd == 0.0) 0.0 else dot / math.sqrt(nq * nd)
          if (c > best) best = c
          dt += 1
        }
        s += best
        qt += 1
      }
      s
    }
    val scored = Dedup.spread(corpus)
      .join(broadcast(queries.select(col(queryId), col(queryVec))),
        col(corpusId) =!= col(queryId))
      .withColumn("similarity",
        round(score(col(corpusVec), col(queryVec)), 4))
    topKPerQuery(scored, k, queryId, corpusId)
  }

  /** Mutual-kNN filter over a directed neighbor edge list (from ANY tier —
    * exact brute force at gate scale, [[graft.operators.GraphAnn.knnGraph]]
    * in production): keep the canonical a<b pairs where BOTH directions
    * chose each other. Reciprocity is the classic precision filter for
    * near-dup candidates and contrastive positives — one self-join on the
    * reversed pair key, nothing corpus-quadratic. */
  def mutualPairs(edges: DataFrame, srcCol: String, dstCol: String,
                  simCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(simCol).as("sim"))
    e.where(col("src") < col("dst"))
      .join(e.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .select(col("src").as("vec_id_a"), col("dst").as("vec_id_b"), col("sim"))
  }
}
