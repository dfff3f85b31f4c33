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
  */
object PersistedBuild {

  val MarkerName = "_GRAFT_INDEX_READY"

  /** Run `write` (which must put every artifact under `path`) unless the
    * marker says a complete build is already there; sweep any unmarked
    * partial state first. Idempotent per path. */
  def ensure(spark: SparkSession, path: String)(write: => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(p, MarkerName)
    if (!fs.exists(marker)) {
      if (fs.exists(p)) fs.delete(p, true)
      write
      fs.create(marker, true).close()
    }
  }

  /** [[ensure]] for the one-table case: write `df` as parquet at `path`
    * and read it back ready-marked. */
  def table(df: => DataFrame, path: String, spark: SparkSession): DataFrame = {
    ensure(spark, path) {
      df.write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
