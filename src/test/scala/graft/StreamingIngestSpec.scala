package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IndexTable, Skew}
import graft.streaming.StreamingIngest

class StreamingIngestSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming ingest produces exactly the batch ingest rows") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_ingest").toString
    val n = StreamingIngest.ingestOnce(spark,
      landingDir = TestSpark.sf, globFilter = "documents.parquet",
      indexPath = s"$tmp/index", checkpointDir = s"$tmp/ckpt",
      alias = "stream", pageSize = 32)

    val batch = IndexTable.ingestRecords(
      spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
        .select($"source".as("document_path"), $"text"),
      alias = "stream", pageSize = 32)
    assert(n === batch.count())

    // identical rows, not just identical counts: same ids and vectors
    val streamed = spark.read.parquet(s"$tmp/index")
      .select($"id", $"page_content").orderBy($"id")
    val expected = batch.select($"id", $"page_content").orderBy($"id")
    assert(streamed.collect().toSeq === expected.collect().toSeq)
  }

  test("streaming ingest into the bucketed layout matches batch appendBucketed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_bucketed").toString
    val bits = 2
    val dim = graft.core.ModelRegistry.dim(graft.core.ModelRegistry.default)
    // non-default seed on BOTH paths: pins that the streaming path threads
    // lshSeed through to appendBucketed (a hardcoded default seed would land
    // streamed docs in different buckets than probe time computes)
    val seed = 7L
    val n = StreamingIngest.ingestOnceBucketed(spark,
      landingDir = TestSpark.sf, globFilter = "documents.parquet",
      indexPath = s"$tmp/index", checkpointDir = s"$tmp/ckpt",
      alias = "stream", bits = bits, dim = dim, pageSize = 32, lshSeed = seed)

    // layout: bucket partition dirs exist under the alias
    val aliasDir = new java.io.File(s"$tmp/index/index_alias=stream")
    val bucketDirs = aliasDir.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("__lsh_bucket=")).map(_.getName)
    assert(bucketDirs.length > 1, s"expected bucket partitions, got ${bucketDirs.toSeq}")

    // content: identical (id, bucket) pairs to the batch bucketed write
    val batchPath = s"$tmp/batch_index"
    IndexTable.appendBucketed(IndexTable.ingestRecords(
      spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
        .select($"source".as("document_path"), $"text"),
      alias = "stream", pageSize = 32), batchPath, bits, dim, seed)
    def idBuckets(p: String) = spark.read.parquet(p)
      .select($"id", col(IndexTable.BucketCol)).distinct()
      .as[(String, String)].collect().toSet
    assert(n === spark.read.parquet(batchPath).count())
    assert(idBuckets(s"$tmp/index") === idBuckets(batchPath))
  }

  test("ingest-triggered compaction folds the delta zone into a committed generation") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream_compact").toString
    val bits = 2
    val dim = graft.core.ModelRegistry.dim(graft.core.ModelRegistry.default)
    // threshold 0: every batch trips the trigger, so after the drain the
    // tenant's rows live in a committed generation, not loose delta files
    val n = StreamingIngest.ingestOnceBucketed(spark,
      landingDir = TestSpark.sf, globFilter = "documents.parquet",
      indexPath = s"$tmp/index", checkpointDir = s"$tmp/ckpt",
      alias = "stream", bits = bits, dim = dim, pageSize = 32,
      maxDeltaFiles = 0)
    assert(n > 0)
    assert(IndexTable.deltaFileCount(spark, s"$tmp/index", "stream") === 0,
      "all delta files must be folded")
    val gens = new java.io.File(s"$tmp/index/_graft_base")
    assert(gens.isDirectory && gens.listFiles().exists(_.getName.startsWith("gen_")))
    // and the resolved content equals the batch ingest, bucketed layout kept
    val batch = IndexTable.ingestRecords(
      spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
        .select($"source".as("document_path"), $"text"),
      alias = "stream", pageSize = 32)
    assert(IndexTable.readLatest(spark, s"$tmp/index", "stream").count() ===
      batch.select($"id").distinct().count())
  }

  test("salted join equals plain inner join") {
    val left = spark.read.parquet(s"${TestSpark.sf}/lineitem.parquet")
      .select($"l_orderkey", $"l_quantity").limit(5000)
    val right = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
      .select($"o_orderkey".as("l_orderkey"), $"o_orderpriority")
    val plain = left.join(right, "l_orderkey")
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .orderBy($"o_orderpriority").collect().toSeq
    val salted = Skew.saltedJoin(left, right, "l_orderkey", salt = 8)
      .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"), sum($"l_quantity").as("q"))
      .orderBy($"o_orderpriority").collect().toSeq
    assert(salted === plain)
  }
}
