package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-bound 100 TB ANN compression
  * standard (Jégou et al., "Product Quantization for Nearest Neighbor
  * Search", TPAMI 2011): split each D-dim vector into `m` subvectors of
  * D/m dims, k-means each subspace independently into `k` sub-centroids,
  * and store each vector as its m nearest-sub-centroid ids — m*log2(k)
  * bits instead of 4*D bytes (64-dim float32 at m=8, k=16 is 256 bytes ->
  * 4 bytes, 64x). Complements the existing compression ladder: SQ8
  * (`embedding_sq8`, 4x, per-element) compresses losslessly enough for
  * rerank; PQ compresses enough that a trillion-vector index FITS in
  * cluster memory, with asymmetric-distance (ADC) scoring against the raw
  * query.
  *
  * Scale shape:
  *  - training touches the corpus `iters` times, each pass a narrow
  *    assign-UDF over a broadcast codebook followed by a mergeable
  *    [[graft.functions.VectorAvg]] aggregation on (subspace, centroid)
  *    keys — the shuffle carries (partitions x m x k) sub-centroids, never
  *    vectors; the model collected per iteration is m*k*subDim floats
  *    (KB-sized), the same model-to-driver pattern as the IVF codebook;
  *  - encoding is one narrow map (broadcast codebook, no shuffle);
  *  - ADC scoring precomputes, per query, the m x k table of
  *    query-subvector x sub-centroid dot products, so scoring a code costs
  *    m table lookups instead of D multiplies; reconstructed norms come
  *    from a global m x k sq-norm table. Queries are broadcast-sized by
  *    contract (same as [[SimilaritySearch.bruteForceTopK]]); per-query
  *    top-k is the bounded-buffer [[graft.functions.TopKBy]] aggregate.
  */
object ProductQuantization {

  /** Trained codebooks: `cents(s)(c)` is sub-centroid c of subspace s. */
  final case class Codebooks(m: Int, subDim: Int, k: Int,
                             cents: Array[Array[Array[Float]]]) {
    def dim: Int = m * subDim

    /** Reconstruct the vector a code sequence represents. */
    def decode(codes: Seq[Int]): Array[Float] = {
      val out = new Array[Float](dim)
      var s = 0
      while (s < m) {
        System.arraycopy(cents(s)(codes(s)), 0, out, s * subDim, subDim)
        s += 1
      }
      out
    }
  }

  /** Nearest sub-centroid of `v(off until off+subDim)` under squared L2;
    * ties break to the lowest centroid id (strict <), deterministic. */
  private def nearestSub(cb: Array[Array[Float]], v: Array[Float],
                         off: Int, subDim: Int): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < cb.length) {
      val cent = cb(c)
      var d = 0.0
      var i = 0
      while (i < subDim) { val t = v(off + i) - cent(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Train PQ codebooks: deterministic seeds (the k lowest (hash(id), id)
    * corpus vectors, sliced per subspace — one TakeOrdered, the
    * [[SimilaritySearch.ivfCentroids]] seed rule) + `iters` Lloyd rounds.
    * A subspace cell that loses all members keeps its previous centroid. */
  def train(corpus: DataFrame, vecCol: String, idCol: String,
            m: Int, k: Int, iters: Int = 3): Codebooks = {
    require(m > 0 && k > 1 && iters >= 0, s"bad PQ params m=$m k=$k iters=$iters")
    val sess = corpus.sparkSession
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val subDim = dim / m

    val seeds = corpus.orderBy(hash(col(idCol)), col(idCol)).limit(k)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).toArray)
    require(seeds.length == k, s"corpus has ${seeds.length} < $k vectors")
    var cb: Array[Array[Array[Float]]] = Array.tabulate(m) { s =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, s * subDim, (s + 1) * subDim))
    }

    val vectorAvg = udaf(graft.functions.VectorAvg)
    val mLocal = m
    val subDimLocal = subDim
    for (_ <- 1 to iters) {
      val bc = sess.sparkContext.broadcast(cb)
      val pieces = udf { (v: Array[Float]) =>
        val cbs = bc.value
        (0 until mLocal).map { s =>
          val off = s * subDimLocal
          (s, nearestSub(cbs(s), v, off, subDimLocal),
            java.util.Arrays.copyOfRange(v, off, off + subDimLocal))
        }
      }
      val means = corpus.select(explode(pieces(col(vecCol))).as("p"))
        .select(col("p._1").as("sub"), col("p._2").as("cid"), col("p._3").as("subvec"))
        .groupBy(col("sub"), col("cid"))
        .agg(vectorAvg(col("subvec")).as("c"))
        .collect()
      val next = cb.map(_.clone())
      means.foreach { r =>
        val c = r.getSeq[Float](2)
        if (c != null) next(r.getInt(0))(r.getInt(1)) = c.toArray
      }
      cb = next
      bc.unpersist(false)
    }
    Codebooks(m, subDim, k, cb)
  }

  /** Append a `pq_codes` array<int> column: each vector's m sub-centroid
    * ids. Narrow map over a broadcast codebook — zero shuffle. */
  def encode(corpus: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cb)
    val enc = udf { (v: Array[Float]) =>
      val c = bc.value
      Array.tabulate(c.m)(s => nearestSub(c.cents(s), v, s * c.subDim, c.subDim))
    }
    corpus.withColumn("pq_codes", enc(col(vecCol)))
  }

  /** Asymmetric-distance (ADC) approximate cosine top-k: raw queries
    * against PQ codes. Per-query m x k dot tables and the global m x k
    * centroid sq-norm table are precomputed once (model-sized, broadcast),
    * so each (code, query) score is m lookups + one divide. Output schema
    * matches [[SimilaritySearch.bruteForceTopK]]. */
  def adcTopK(corpus: DataFrame, queries: DataFrame, cb: Codebooks, k: Int,
              corpusVec: String = "embedding", corpusId: String = "vec_id",
              queryVec: String = "q_vec", queryId: String = "q_id",
              excludeSelf: Boolean = true): DataFrame = {
    val sess = corpus.sparkSession
    // centroid squared norms: ||x_hat||^2 = sum_s ||cent(s)(code_s)||^2
    val centSq: Array[Array[Double]] = cb.cents.map(_.map { cent =>
      var d = 0.0; var i = 0
      while (i < cent.length) { d += cent(i).toDouble * cent(i); i += 1 }
      d
    })
    // per-query tables: queries are broadcast-sized by contract (same as
    // bruteForceTopK), so the table map is model-sized.
    val qRows = queries.select(col(queryId).cast("long"), col(queryVec)).collect()
    val tables: Map[Long, (Array[Array[Double]], Double)] = qRows.map { r =>
      val q = r.getSeq[Float](1).toArray
      var qn = 0.0
      q.foreach(x => qn += x.toDouble * x)
      val tab = Array.tabulate(cb.m) { s =>
        val off = s * cb.subDim
        cb.cents(s).map { cent =>
          var d = 0.0; var i = 0
          while (i < cb.subDim) { d += q(off + i).toDouble * cent(i); i += 1 }
          d
        }
      }
      r.getLong(0) -> (tab, math.sqrt(qn))
    }.toMap
    val bcTab = sess.sparkContext.broadcast(tables)
    val bcSq = sess.sparkContext.broadcast(centSq)

    val adc = udf { (codes: Seq[Int], qid: Long) =>
      val (tab, qNorm) = bcTab.value(qid)
      val sq = bcSq.value
      var dot = 0.0
      var nsq = 0.0
      var s = 0
      while (s < codes.length) {
        val c = codes(s)
        dot += tab(s)(c)
        nsq += sq(s)(c)
        s += 1
      }
      val denom = qNorm * math.sqrt(nsq)
      if (denom == 0.0) 0.0 else dot / denom
    }
    val codes = encode(Dedup.spread(corpus), corpusVec, cb)
      .select(col(corpusId), col("pq_codes"))
    val joined = codes.join(
      broadcast(queries.select(col(queryId))),
      if (excludeSelf) col(corpusId) =!= col(queryId) else lit(true))
    val scored = joined.withColumn("similarity",
      round(adc(col("pq_codes"), col(queryId).cast("long")), 4))
    SimilaritySearch.topKPerQuery(scored, k, queryId, corpusId)
  }
}
