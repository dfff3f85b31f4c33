package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Embedder, TextFunctions}

/** The index table — Spark-native replacement for the reference's Redis
  * vector index (schema declared at reference `modules/utilities.py:269-278`,
  * records written at `:297-329`): a Parquet table partitioned by
  * `index_alias` (the reference's key-prefix namespace,
  * `modules/utilities.py:284-287`), so per-tenant queries get partition
  * pruning instead of key-prefix routing.
  *
  * Scale design: at 100 TB the table is append-only parquet; `index_alias`
  * partitioning bounds every query to one tenant's files; within a tenant the
  * scan is embarrassingly parallel and the KNN top-k (see [[KnnSearch]]) is
  * a narrow map + per-partition partial top-k, no shuffle.
  */
object IndexTable {

  /** Declared schema — mirrors the Redis index DDL fields
    * (`modules/utilities.py:269-278`) + id + namespace. */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("index_alias", StringType),
    StructField("document_path", StringType),
    StructField("page_number", IntegerType),
    StructField("page_content", StringType),
    StructField("page_content_vector", ArrayType(FloatType)),
    // ingest generation stamp (monotonic per append) — powers the
    // HSET-last-write-wins upsert semantics of readLatest.
    StructField("ingest_seq", LongType)))

  /** D2: existence probe (reference `checkRedisIndexExists`,
    * `modules/utilities.py:232-240`). */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** D1: idempotent create (reference `createRedisIndex`,
    * `modules/utilities.py:259-295` incl. the exists-guard at `:266,288`). */
  def create(spark: SparkSession, path: String): Unit =
    if (!exists(spark, path)) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .write.partitionBy("index_alias").parquet(path)
    }

  /** D3: drop (reference `dropRedisIndex`, `modules/utilities.py:242-251` —
    * there it keeps the documents; here the parquet IS the index, so drop
    * removes the path). */
  def drop(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) { fs.delete(p, true); () }
  }

  /** D4: optional tenant-name encryption — sha1 hex of the alias (reference
    * `encode`, `modules/utilities.py:98-99`, applied at `:263-264` etc). */
  def encodeAlias(alias: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
    d.digest(alias.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** E1 ingestion chain (reference `app/app.py:130-190` upload flow):
    * documents(document_path, text) -> 300-word chunk -> cleanse -> non-empty
    * filter -> embed the CLEANSED text but store the ORIGINAL page content
    * (reference keeps raw formatting, `modules/utilities.py:204` vs embed
    * input `:200`) -> sha1 row key (`modules/utilities.py:344`).
    *
    * One lazy narrow pipeline; the reference's two per-page network loops
    * (OpenAI call per page, HSET per page) become executor-local columnar
    * work. */
  def ingestRecords(docs: DataFrame, alias: String,
                    model: String = graft.core.ModelRegistry.default,
                    seed: Int = Embedder.DefaultSeed,
                    pageSize: Int = Chunker.DefaultPageSize): DataFrame = {
    val chunked = Chunker.chunk(docs.select("document_path", "text"), "text", pageSize)
    chunked
      .withColumn("page_content_cleansed", TextFunctions.cleanseText(col("page_content")))
      .where(TextFunctions.nonEmpty(col("page_content_cleansed")))
      .withColumn("page_content_vector", Embedder.embedCol(col("page_content_cleansed"), model, seed))
      .withColumn("id", sha1(concat_ws("_", col("document_path"), col("page_number"))))
      .withColumn("index_alias", lit(alias))
      .select("id", "index_alias", "document_path", "page_number", "page_content",
        "page_content_vector")
  }

  /** K1/K2: append records, stamped with a monotonically increasing ingest
    * generation so Redis-HSET upsert semantics (last write wins by key) can
    * be realized on read via [[readLatest]]. */
  private val ingestCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  private def stampIngest(records: DataFrame): DataFrame = {
    // millis << 10 + per-process counter: strictly increasing even for
    // appends within the same millisecond.
    val gen = (System.currentTimeMillis() << 10) | (ingestCounter.incrementAndGet() & 0x3ff)
    if (records.columns.contains("ingest_seq")) records
    else records.withColumn("ingest_seq", lit(gen))
  }

  def append(records: DataFrame, path: String): Unit =
    stampIngest(records)
      .write.mode(SaveMode.Append).partitionBy("index_alias").parquet(path)

  /** Conventional LSH bucket partition column (shared with
    * [[graft.plans.LshTopKPruneRule]]). */
  val BucketCol: String = graft.plans.LshTopKPruneRule.BucketCol

  /** Default hyperplane seed for the bucketed layout — distinct from the
    * embedder seed; must match between write and probe time. */
  val DefaultLshSeed: Long = 42L

  /** K1 at the 100 TB scale point: append with the vector's sign-LSH bucket
    * as a SECOND partition column. A probe-time filter on [[BucketCol]] then
    * prunes at the FILE level (Catalyst `PruneFileSourcePartitions` turns the
    * `IN` probe list into PartitionFilters), so an approximate search touches
    * (1 + bits)/2^bits of the tenant's files instead of scanning and
    * discarding rows — the on-disk analogue of the reference's HNSW candidate
    * narrowing (reference `modules/utilities.py:272-278`). */
  /** Disk encoding of a bucket bit-string. The "b" prefix is load-bearing:
    * a bare bit-string directory name (`__lsh_bucket=0110`) is type-inferred
    * as an INTEGER partition column on read, silently dropping leading zeros
    * — probe strings then never match leading-zero buckets. */
  private def diskBucket(bitString: String): String = "b" + bitString

  def appendBucketed(records: DataFrame, path: String, bits: Int, dim: Int,
                     lshSeed: Long = DefaultLshSeed): Unit = {
    val planes = SimilaritySearch.hyperplanes(bits, dim, lshSeed)
    stampIngest(records)
      .withColumn(BucketCol,
        concat(lit("b"), SimilaritySearch.lshBucket(col("page_content_vector"), planes)))
      .write.mode(SaveMode.Append).partitionBy("index_alias", BucketCol).parquet(path)
  }

  // ---------------- IVF-partitioned layout ----------------

  /** IVF cell partition column (centroid-partitioned store — the second
    * approximate layout next to the LSH-bucketed one). */
  val CellCol: String = "__ivf_cell"

  /** Centroids live under an underscore-prefixed sibling dir INSIDE the
    * index path: parquet scans ignore `_`-prefixed directories, so the main
    * table read never sees them, yet drop(path) removes everything. */
  private def centroidsPath(path: String): String = s"$path/_graft_centroids"

  private def diskCell(centroidId: Long): String = "c" + centroidId

  /** K1 at the IVF scale point: assign every record's vector to its nearest
    * centroid and write with the cell as a SECOND partition column — the
    * inverted-file layout on disk. Centroids are built from this batch
    * (deterministic seeding + Lloyd, [[SimilaritySearch.ivfCentroids]])
    * unless the store already has them (appends after the first reuse the
    * existing codebook so cells stay stable across generations). */
  def appendIvf(records: DataFrame, path: String, nCentroids: Int,
                iters: Int = 2): Unit = {
    val spark = records.sparkSession
    val centroids = readCentroids(spark, path).getOrElse {
      val c = SimilaritySearch.ivfCentroids(records, nCentroids, iters,
        vecCol = "page_content_vector", idCol = "id")
      c.coalesce(1).write.mode(SaveMode.Overwrite).parquet(centroidsPath(path))
      // Assign from the PERSISTED codebook, not the lazy plan: the plan
      // contains monotonically_increasing_id, so a second execution (AQE
      // re-planning, different partitioning) could stamp centroid_ids that
      // disagree with what was just written, silently mis-routing
      // readLatestPrunedIvf for the first batch.
      spark.read.parquet(centroidsPath(path))
    }
    val celled = SimilaritySearch
      .assignToCentroid(stampIngest(records), centroids,
        vecCol = "page_content_vector", idCol = "id")
      .withColumn(CellCol, concat(lit("c"), col("centroid_id")))
      .drop("centroid_id")
    celled.write.mode(SaveMode.Append)
      .partitionBy("index_alias", CellCol).parquet(path)
  }

  /** The store's codebook, if this is an IVF-partitioned index. */
  def readCentroids(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(centroidsPath(path))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(centroidsPath(path))) else None
  }

  /** Cell-pruned tenant read: rank the codebook by distance to the query
    * vector (centroids are config-sized — a driver-side collect, the same
    * way a real IVF index keeps its codebook in memory) and scan only the
    * `nprobe` nearest cells' FILES. Latest-per-id within the pruned slice,
    * same staleness caveat as [[readLatestPruned]]. */
  def readLatestPrunedIvf(spark: SparkSession, path: String, alias: String,
                          queryVec: Array[Float], nprobe: Int): DataFrame = {
    val cells = readCentroids(spark, path) match {
      case None => Seq.empty[String]
      case Some(cdf) =>
        cdf.collect().map { r =>
          val id = r.getLong(r.fieldIndex("centroid_id"))
          val c = r.getSeq[Float](r.fieldIndex("centroid"))
          var s = 0.0
          var i = 0
          val n = math.min(c.length, queryVec.length)
          while (i < n) { val d = c(i) - queryVec(i); s += d * d; i += 1 }
          (s, id)
        }.sortBy(identity).take(nprobe).map(t => diskCell(t._2)).toSeq
    }
    val df = read(spark, path, alias)
    val pruned =
      if (cells.nonEmpty && df.columns.contains(CellCol))
        df.where(col(CellCol).isin(cells: _*))
      else df.where(lit(false))
    latestPerId(pruned).drop(CellCol)
  }

  /** True when the index path holds at least one ingested partition.
    * A freshly created index is _SUCCESS-only (dynamic partitioning emits no
    * part files for an empty frame), which the parquet reader cannot infer
    * a schema from. */
  private def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("index_alias="))
  }

  /** Compact one tenant's partition: apply the HSET-upsert semantics
    * PHYSICALLY (latest record per id survives, stale generations are
    * dropped) and rewrite the slice as fresh files — the OPTIMIZE/VACUUM
    * analogue every append-only store needs once streaming ingest starts
    * producing a small file per micro-batch. Layout-preserving: the LSH
    * bucket / IVF cell partition column is kept if present, so pruned reads
    * behave identically after compaction.
    *
    * The rewrite lands in an underscore-prefixed staging dir INSIDE the
    * index (invisible to concurrent reads); the swap is rename-aside:
    * live -> `_compact_old`, fresh -> live, then delete `_compact_old`.
    * Both moves are filesystem renames (metadata ops), so the window in
    * which a racing reader can observe a missing tenant partition is two
    * renames wide — not a recursive delete — and a crash mid-swap never
    * loses the only copy: the previous generation survives intact under
    * `_compact_old` (underscore-prefixed, invisible to scans) until the
    * fresh partition is in place. This is still not a transaction log: a
    * reader hitting exactly the inter-rename window sees zero rows for the
    * tenant, and writers must not append to the tenant mid-compaction.
    *
    * Returns the number of rows surviving compaction. */
  def compact(spark: SparkSession, path: String, alias: String): Long = {
    val slice = read(spark, path, alias)
    val resolved = latestPerId(slice)
    val layoutCols = Seq(BucketCol, CellCol).filter(resolved.columns.contains)
    val staging = s"$path/_compact_staging"
    stampIngest(resolved)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(("index_alias" +: layoutCols): _*)
      .parquet(staging)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(path, s"index_alias=$alias")
    val fresh = new org.apache.hadoop.fs.Path(staging, s"index_alias=$alias")
    val old = new org.apache.hadoop.fs.Path(path, "_compact_old")
    if (fs.exists(old)) fs.delete(old, true) // leftover from a crashed swap
    if (fs.exists(fresh)) {
      if (fs.exists(live)) fs.rename(live, old)
      fs.rename(fresh, live)
      fs.delete(old, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
    spark.read.parquet(path).where(col("index_alias") === alias).count()
  }

  /** Read one tenant's slice — partition-pruned scan. An existing-but-empty
    * index reads as zero rows (the reference's empty Redis index returns no
    * hits, not an error). */
  def read(spark: SparkSession, path: String, alias: String): DataFrame =
    if (!hasData(spark, path))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .where(col("index_alias") === alias)
    else spark.read.parquet(path).where(col("index_alias") === alias)

  /** Read with HSET-overwrite semantics: newest record per id wins (by the
    * ingest generation stamp; one shuffle on the key). */
  def readLatest(spark: SparkSession, path: String, alias: String): DataFrame =
    latestPerId(read(spark, path, alias))

  /** Bucket-pruned tenant read for a bucketed index ([[appendBucketed]]):
    * only the probe buckets' files are listed and scanned. Latest-per-id is
    * resolved WITHIN the pruned slice — correct because a record's bucket is
    * a pure function of its vector, so re-ingests of identical content land
    * in the same bucket; a document whose content (hence vector) changed may
    * briefly surface its previous version from a non-probed bucket, the same
    * staleness window an HNSW rebuild has. */
  def readLatestPruned(spark: SparkSession, path: String, alias: String,
                       probes: Seq[String]): DataFrame = {
    val df = read(spark, path, alias)
    val diskProbes = probes.map(diskBucket)
    val pruned =
      if (df.columns.contains(BucketCol)) df.where(col(BucketCol).isin(diskProbes: _*))
      else df.where(lit(false)) // empty/unbucketed index: no approximate hits
    latestPerId(pruned).drop(BucketCol)
  }

  private def latestPerId(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    if (!df.columns.contains("ingest_seq")) df.dropDuplicates("id")
    else {
      val w = Window.partitionBy(col("id")).orderBy(col("ingest_seq").desc)
      df.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .drop("rn", "ingest_seq")
    }
  }
}
