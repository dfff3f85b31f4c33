package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions, VectorFunctions}

/** Corpus observability — the profiling/reporting queries a curation
  * pipeline runs between stages (after ingest, after dedup, after filtering)
  * to know what it is about to train on. All of them are single-shuffle
  * aggregations whose keys are metadata-sized (sources, labels, cluster
  * sizes), so they cost one corpus scan regardless of corpus size.
  */
object CorpusStats {

  /** Per-source one-pass profile: doc counts, token volume, quality and
    * language mix, short-doc share. One projection computes every per-doc
    * metric in a single text pass, then ONE hash aggregation on the
    * source key (map-side partials; key space = number of sources) — the
    * shape that still costs exactly one scan at 100 TB.
    */
  def profile(df: DataFrame, textCol: String, sourceCol: String): DataFrame = {
    val perDoc = df.select(
      col(sourceCol).as("source"),
      TextFunctions.tokenCountWs(col(textCol)).as("n_tok"),
      TextFunctions.qualityScore(col(textCol)).as("quality"),
      TextFunctions.langId(col(textCol)).as("lang"))
    perDoc.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tok").cast("long")).as("n_tokens"),
      round(avg(col("n_tok").cast("double")), 2).as("avg_tokens"),
      round(avg(col("quality")), 2).as("avg_quality"),
      sum(when(col("n_tok") < 20, 1L).otherwise(0L)).as("n_short"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
  }

  /** Cross-source contamination matrix: for every source pair, how many
    * distinct content fingerprints they share. `fingerprint` chooses the
    * granularity — full-document for exact mirrors, a prefix n-gram
    * fingerprint for shared-boilerplate detection (the decontamination
    * fingerprint, [[Decontaminate]]).
    *
    * Shape: distinct (source, fp) pairs (map-side partial), then a
    * fingerprint-keyed self-join — the join key is the 32-char digest, so
    * matches are content-identity, and the join fan-out is bounded by how
    * duplicated a fingerprint is across sources (<= n_sources per side).
    */
  def sourceOverlapMatrix(df: DataFrame, fingerprint: Column,
                          sourceCol: String): DataFrame = {
    val fps = df.select(col(sourceCol).as("source"), fingerprint.as("fp")).distinct()
    fps.as("a").join(fps.as("b"),
        col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Cluster-size histogram over a dedup cluster assignment
    * ([[Dedup.connectedComponents]] output): how many near-dup clusters of
    * each size the corpus contains — the number that tells you whether
    * duplication is a long tail of pairs or a few megaclusters (and thus
    * whether keep-best resolution is safe to run). Two metadata-keyed
    * aggregations, both with partials. */
  def clusterSizeHistogram(clusters: DataFrame, idCol: String = "doc_id",
                           clusterCol: String = "cluster_id"): DataFrame =
    clusters.groupBy(col(clusterCol)).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))

  /** Per-group embedding outliers: the k members FARTHEST from their
    * group's centroid under cosine — mislabeled/garbage detection over an
    * embedded corpus ("this doc is nothing like the rest of its class").
    *
    * Scale shape: centroids via [[graft.functions.VectorAvg]] (map-side
    * partial sums — the shuffle carries partitions x groups x dim doubles,
    * never vectors); centroid table is group-count sized, so it BROADCASTS
    * back; the bottom-k per group is the bounded-buffer
    * [[graft.functions.TopKBy]] aggregate fed the negated similarity — no
    * corpus-wide window sort anywhere.
    *
    * Similarity is rounded to 4 BEFORE ranking (ties then break on id
    * ascending) so the ranking is reproducible across engines — the same
    * convention as [[SimilaritySearch]].
    */
  def centroidOutliers(df: DataFrame, vecCol: String, idCol: String,
                       groupCol: String, k: Int): DataFrame = {
    val vectorAvg = udaf(graft.functions.VectorAvg)
    val topk = udaf(graft.functions.TopKBy(k))
    val centroids = df.groupBy(col(groupCol))
      .agg(vectorAvg(col(vecCol)).as("__centroid"))
    val scored = df.join(broadcast(centroids), groupCol)
      .withColumn("__sim",
        round(VectorFunctions.cosineSimilarity(col(vecCol), col("__centroid")), 4))
    scored.groupBy(col(groupCol))
      .agg(topk(-col("__sim"), col(idCol).cast("long")).as("__bottomk"))
      .select(col(groupCol), posexplode(col("__bottomk")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("col._2").as(idCol), (-col("col._1")).as("centroid_sim"))
  }
}
