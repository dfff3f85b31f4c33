package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IndexTable

class CompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def parquetFiles(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
  }

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet")
    .select(concat_ws("/", $"source", $"doc_id").as("document_path"), $"text")

  test("compact drops stale upsert generations and shrinks the file count") {
    val path = java.nio.file.Files.createTempDirectory("compact_plain").toString + "/idx"
    // two full generations of the same documents -> every id has a stale copy
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    IndexTable.append(IndexTable.ingestRecords(docs, "t", pageSize = 32), path)
    val before = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    val rawBefore = spark.read.parquet(path).count()
    val filesBefore = parquetFiles(s"$path/index_alias=t")

    val survivors = IndexTable.compact(spark, path, "t")

    val after = IndexTable.readLatest(spark, path, "t")
      .select($"id", $"page_content").as[(String, String)].collect().toSet
    assert(after === before, "latest-per-id content must be unchanged")
    assert(survivors === before.size.toLong)
    assert(survivors < rawBefore, "stale generations must be physically dropped")
    assert(parquetFiles(s"$path/index_alias=t") < filesBefore)
  }

  test("compact preserves the bucketed layout and its pruned reads") {
    val path = java.nio.file.Files.createTempDirectory("compact_bucketed").toString + "/idx"
    val bits = 2
    val dim = graft.core.ModelRegistry.dim(graft.core.ModelRegistry.default)
    val records = IndexTable.ingestRecords(docs, "t", pageSize = 32)
    IndexTable.appendBucketed(records, path, bits, dim)
    IndexTable.appendBucketed(IndexTable.ingestRecords(docs, "t", pageSize = 32),
      path, bits, dim)

    val qvec = graft.functions.Embedder.embedQuery("fast spark table scan")
    val probes = graft.plans.LshTopKPruneRule
      .probeBuckets(qvec, bits, dim, IndexTable.DefaultLshSeed)
    val before = IndexTable.readLatestPruned(spark, path, "t", probes.toSeq)
      .select($"id").as[String].collect().toSet

    IndexTable.compact(spark, path, "t")

    val bucketDirs = new java.io.File(s"$path/index_alias=t").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("__lsh_bucket=")).map(_.getName)
    assert(bucketDirs.length > 1, s"bucket layout lost: ${bucketDirs.toSeq}")
    val after = IndexTable.readLatestPruned(spark, path, "t", probes.toSeq)
      .select($"id").as[String].collect().toSet
    assert(after === before, "pruned reads must be unchanged by compaction")
  }
}
