package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Embedder
import graft.operators.{IndexTable, KnnSearch}

class IvfStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshPath(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ivf_store_$tag").toString + "/idx"

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet")
    .select(concat(lit("doc_"), $"doc_id").as("document_path"), $"text")
    .cache()

  test("ivf layout: cell-pruned read scans a strict file subset with PartitionFilters") {
    val path = freshPath("prune")
    val records = IndexTable.ingestRecords(docs, "tenant")
    IndexTable.appendIvf(records, path, nCentroids = 8)

    val qvec = Embedder.embedQuery(
      docs.select($"text").as[String].head().split("\\s+").take(12).mkString(" "))
    val full = IndexTable.readLatest(spark, path, "tenant")
    val pruned = IndexTable.readLatestPrunedIvf(spark, path, "tenant", qvec, nprobe = 2)

    val fullIds = full.select($"id").as[String].collect().toSet
    val prunedIds = pruned.select($"id").as[String].collect().toSet
    assert(prunedIds.nonEmpty)
    assert(prunedIds.subsetOf(fullIds))
    assert(prunedIds.size < fullIds.size, "nprobe=2 of 8 cells must not scan everything")

    // the cell IN-list must reach the scan as a partition filter (file-level
    // pruning), not a post-scan row filter
    val plan = pruned.queryExecution.executedPlan.toString
    val pf = "PartitionFilters: \\[[^\\]]*".r.findAllIn(plan).toSeq
    assert(pf.exists(_.contains(IndexTable.CellCol)), plan)

    // and the pruned slice still serves a sensible top-k
    val hits = KnnSearch.topK(pruned, qvec, 5)
    assert(hits.count() === 5)
  }

  test("second append reuses the codebook; cells stay stable across generations") {
    val path = freshPath("gen")
    val firstHalf = docs.where(substring($"document_path", 5, 10).cast("long") % 2 === 0)
    val secondHalf = docs.where(substring($"document_path", 5, 10).cast("long") % 2 === 1)
    IndexTable.appendIvf(IndexTable.ingestRecords(firstHalf, "tenant"), path, nCentroids = 4)
    val codebook1 = IndexTable.readCentroids(spark, path).get.collect()
      .map(r => r.getLong(0)).sorted.toSeq
    IndexTable.appendIvf(IndexTable.ingestRecords(secondHalf, "tenant"), path, nCentroids = 4)
    val codebook2 = IndexTable.readCentroids(spark, path).get.collect()
      .map(r => r.getLong(0)).sorted.toSeq
    assert(codebook1 === codebook2, "appends after the first must not rebuild centroids")

    val all = IndexTable.readLatest(spark, path, "tenant")
    val expected = IndexTable.ingestRecords(docs, "tenant").count()
    assert(all.count() === expected)
  }
}
