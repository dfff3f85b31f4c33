package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster the embedding space, then prune
  * near-duplicate documents by comparing pairs only WITHIN a cluster.
  * The cluster step is what makes semantic dedup tractable at corpus
  * scale — pairwise cosine is O(n²) globally but O(Σ|c|²) under a
  * k-way partition, and k is chosen ∝ n so the expected cluster size
  * (and with it the per-key join fan-out) stays constant as the corpus
  * grows.
  *
  * Differences from the paper, chosen for engine-portable determinism
  * (the whole run — clustering included — replays in an ANSI oracle):
  *
  *  - clustering is [[KMeans.assign]]'s portable Lloyd (md5-seeded,
  *    rounded distances/means — see its scaladoc for the bit-parity
  *    argument), not faiss k-means;
  *  - the keep rule is deterministic keep-lowest-id: a document is
  *    dropped iff some LOWER-id document in the same cluster is
  *    ≥ `threshold` cosine-similar. The paper keeps the member with the
  *    lowest centroid similarity; any within-group election works, but
  *    lowest-id is total-order stable across engines and matches the
  *    keep-first convention of [[Dedup.exact]]. (On a chain a~b~c with
  *    a≁c this drops both b and c — the strictly-dedup-more direction;
  *    use [[Dedup.connectedComponents]] + [[Dedup.resolveKeepBest]] on
  *    the pair output when group-election semantics are wanted.)
  *
  * Scale shape: the pair join is a single equi-join keyed on `cluster`
  * (fan-out bounded by max cluster size — size k for the corpus, or
  * pre-split oversized clusters with a salt; the paper's k=50k for
  * 100M docs keeps |c| ≈ 2k). The dropped-id set is at most one row per
  * document and joins back by id; cosine runs inside whole-stage codegen
  * ([[graft.plans.VectorExpressions]]). No driver-side collect anywhere.
  */
object SemDedup {

  /** Per-document verdict: (idCol, cluster, kept). `kept` is false iff a
    * lower-id same-cluster document is ≥ threshold cosine-similar.
    * Cosine is rounded to 4 before the threshold so the verdict is
    * engine-stable (same recipe as [[Dedup.embeddingNearDupPairs]]). */
  def prune(df: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int, threshold: Double,
            assignPath: Option[String] = None): DataFrame = {
    require(k >= 1 && threshold > 0 && threshold <= 1)
    val assigned = assignPath
      .map(KMeans.assignPersisted(df, _, vecCol, idCol, k, iters))
      .getOrElse(KMeans.assign(df, vecCol, idCol, k, iters))
    val av = assigned
      .join(df.select(col(idCol), col(vecCol)), idCol)
      .select(col(idCol).as("id"), col("cluster"), col(vecCol).as("v"))

    val pairs = pairSims(av, threshold)
    val dropped = pairs.select(col("id2").as("__drop")).distinct()

    av.join(dropped, col("id") === col("__drop"), "left")
      .select(col("id").as(idCol), col("cluster"),
        col("__drop").isNull.as("kept"))
  }

  /** The within-cluster near-duplicate pair list itself (id1 < id2,
    * cluster, cosine) — the input a group-election resolver would take. */
  def pairs(df: DataFrame, vecCol: String, idCol: String,
            k: Int, iters: Int, threshold: Double): DataFrame = {
    val assigned = KMeans.assign(df, vecCol, idCol, k, iters)
    val av = assigned
      .join(df.select(col(idCol), col(vecCol)), idCol)
      .select(col(idCol).as("id"), col("cluster"), col(vecCol).as("v"))
    pairSims(av, threshold)
      .select(col("id1"), col("id2"), col("cluster"), col("cos"))
  }

  /** The paper's own election (Abbas et al. §3): connect the within-cluster
    * pair graph, then from each dup GROUP keep the member with the LOWEST
    * cosine similarity to its cluster centroid (the most "representative
    * edge" of the group; ties break on lowest id). Returns one row per dup
    * group: (cluster_id = min member id, keep_id, keep_csim, n_members).
    *
    * Scale shape: [[graft.operators.Dedup.connectedComponents]] pointer
    * jumping over the pair graph (pairs are already cluster-bounded);
    * centroids are a (cluster, component)-keyed partial agg that BROADCASTS
    * back (k rows); the election is a map-side min-struct per group — no
    * window. Arithmetic contract: centroid components round 6 (the
    * [[KMeans]] convention), centroid cosine via the double HOF fold
    * (NOT the float32 codegen expression — the centroid is a rounded
    * double vector and must not be re-quantized), rounded 4 before the
    * min so the elected member is engine-stable. */
  def resolveGroups(df: DataFrame, vecCol: String, idCol: String,
                    k: Int, iters: Int, threshold: Double,
                    assignPath: Option[String] = None): DataFrame = {
    // the pair graph and its component labels are dup-set-sized (orders of
    // magnitude below the corpus) — scope the shuffle width down for the
    // iterative section, as GraphAnn.beamVisited does for its walk. The
    // scoped width lives on a session clone (SessionBridge.scopedShuffle):
    // no shared-conf mutation to race with concurrent queries.
    val spark = df.sparkSession
    val scoped = org.apache.spark.sql.graftbridge.SessionBridge
      .scopedShuffle(spark, 8)
    org.apache.spark.sql.graftbridge.SessionBridge.withSession(
      resolveGroupsImpl(scoped(df), vecCol, idCol, k, iters, threshold,
        assignPath),
      spark)
  }

  private def resolveGroupsImpl(df: DataFrame, vecCol: String, idCol: String,
                                k: Int, iters: Int, threshold: Double,
                                assignPath: Option[String]): DataFrame = {
    val assigned = assignPath
      .map(KMeans.assignPersisted(df, _, vecCol, idCol, k, iters))
      .getOrElse(KMeans.assign(df, vecCol, idCol, k, iters))
    // three consumers fan out from the assignment (pair graph, centroids,
    // similarity scoring) and connectedComponents adds iterative actions on
    // top — materialize the Lloyd run ONCE (the same lineage-truncation
    // discipline connectedComponents itself applies per round) instead of
    // re-running it per consumer.
    val av = assigned
      .join(df.select(col(idCol), col(vecCol)), idCol)
      .select(col(idCol).as("id"), col("cluster"),
        col(vecCol).cast("array<double>").as("v"))
      .localCheckpoint()
    val comps = Dedup.connectedComponents(
      pairSims(av, threshold).select(col("id1"), col("id2")))
    val cent = av.select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(round(avg(col("col")), 6).as("m"))
      .groupBy(col("cluster"))
      .agg(collect_list(struct(col("pos"), col("m"))).as("pm"))
      .select(col("cluster"),
        transform(array_sort(col("pm")), p => p.getField("m")).as("cent"))
    val sim = av.join(broadcast(cent), "cluster")
      .withColumn("csim",
        round(graft.functions.VectorFunctions.cosineSimilarityHof(
          col("v"), col("cent")), 4))
    comps.join(sim, comps("id") === sim("id"))
      .groupBy(col("comp"))
      .agg(min(struct(col("csim"), sim("id"))).as("kept"),
        count(lit(1)).as("n_members"))
      .select(col("comp").as("cluster_id"),
        col("kept.id").as("keep_id"),
        col("kept.csim").as("keep_csim"),
        col("n_members"))
  }

  private def pairSims(av: DataFrame, threshold: Double): DataFrame = {
    val a = av.select(col("id").as("id1"), col("cluster"), col("v").as("v1"))
    val b = av.select(col("id").as("id2"), col("cluster").as("__c2"), col("v").as("v2"))
    a.join(b, col("cluster") === col("__c2") && col("id1") < col("id2"))
      .withColumn("cos",
        round(VectorFunctions.cosineSimilarity(col("v1"), col("v2")), 4))
      .where(col("cos") >= threshold)
  }
}
