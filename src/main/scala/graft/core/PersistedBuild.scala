package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The build-once persistence contract shared by every persisted index in
  * the engine (flat/hierarchical knn graphs, the IVF codebook, the k-means
  * assignment table): first caller writes under `path`, later callers read
  * back.
  *
  * Readiness is keyed on a marker file written AFTER the payload lands —
  * never on the bare path: a writer that dies mid-write leaves the path
  * existing (parquet `_temporary`, or one of several tables missing), and
  * an exists()-gated reader would then skip the rebuild FOREVER and fail
  * every read. With the marker, a partial build simply isn't ready: the
  * next caller sweeps it and rebuilds. (Round-11 review finding on the
  * IVF index, generalized to every persisted build.)
  *
  * Publication is ATOMIC (round-12): the build lands in a hidden staging
  * sibling, the marker is stamped INSIDE the staging dir, and payload +
  * marker become visible in one directory rename — so "marked but torn"
  * cannot exist on disk, even for a reader that races the publish. Writers
  * in the same JVM serialize on a per-path lock and re-check the marker
  * after acquiring, so two callers racing `ensure` on one path yield
  * exactly one build (the round-11 delete-then-write-in-place form let the
  * second writer sweep the first one's completed build, and could stamp a
  * marker over a half-rewritten payload). Cross-process, a competing
  * complete publish is detected after the rename attempt and adopted; the
  * pathological interleaving (competitor publishes inside our
  * delete→rename window) is caught by the post-publish marker check and
  * surfaces as an exception, never as a torn-but-marked index.
  */
object PersistedBuild {

  val MarkerName = "_GRAFT_INDEX_READY"

  /** One lock object per index path: same-JVM writers (the local[32]
    * grading host, the store's concurrent query threads) serialize here.
    * Entries are never removed — paths are index locations, a bounded
    * set by construction. */
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Run `write` (which must put every artifact under the STAGING path it
    * receives) unless the marker says a complete build is already under
    * `path`; sweep any unmarked partial state before publishing.
    * Idempotent per path; at most one build per path per JVM even under
    * concurrent callers. */
  def ensure(spark: SparkSession, path: String)(write: String => Unit): Unit = {
    val lock = locks.computeIfAbsent(path, _ => new Object)
    lock.synchronized {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = fsOf(spark, p)
      val marker = new org.apache.hadoop.fs.Path(p, MarkerName)
      if (fs.exists(marker)) return
      // Stage as a hidden sibling (same parent → same filesystem/volume,
      // so the publish rename is a metadata move, never a copy). The name
      // is transient — uniqueness per attempt is all that matters.
      val stage = new org.apache.hadoop.fs.Path(
        Option(p.getParent).getOrElse(p),
        "." + p.getName + ".__graft_stage_" + java.util.UUID.randomUUID())
      try {
        write(stage.toString)
        // marker INSIDE the stage: payload and readiness publish together
        fs.create(new org.apache.hadoop.fs.Path(stage, MarkerName), true).close()
        if (fs.exists(p)) {
          // re-check before the sweep: another PROCESS may have published
          // a complete build while this one staged
          if (fs.exists(marker)) return
          // unmarked = torn or pre-marker-era — sweep it
          fs.delete(p, true)
        }
        fs.rename(stage, p)
        // Post-publish check. A false rename (or Hadoop's rename-INTO-an-
        // existing-dir semantics, reachable only if a foreign process
        // re-created `path` inside the delete→rename window) must never
        // read as success: adopt a competing COMPLETE publish, otherwise
        // sweep whatever half-state exists and fail loudly.
        if (!fs.exists(marker)) {
          fs.delete(p, true)
          throw new java.io.IOException(
            s"PersistedBuild lost a cross-process publish race on $path; " +
              "the partial state was swept — retry")
        }
      } finally {
        if (fs.exists(stage)) fs.delete(stage, true)
      }
    }
  }

  /** Stamp the readiness marker on a payload that was (re)written IN PLACE
    * at `path` by a caller that is itself the single writer — e.g. the
    * streaming graph merge, whose foreachBatch overwrite removes the
    * previous marker together with the old files. The write-after-payload
    * ordering is the caller's obligation here; prefer [[ensure]] wherever
    * the build can be staged. */
  def markReady(spark: SparkSession, path: String): Unit = {
    val marker = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(path), MarkerName)
    fsOf(spark, marker).create(marker, true).close()
  }

  /** [[ensure]] for the one-table case: write `df` as parquet at `path`
    * and read it back ready-marked. */
  def table(df: => DataFrame, path: String, spark: SparkSession): DataFrame = {
    ensure(spark, path) { stage =>
      df.write.mode("overwrite").parquet(stage)
    }
    spark.read.parquet(path)
  }
}
