package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Embedder
import graft.operators.{IndexTable, KnnSearch, Rerank}

class SearchPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    .select($"source".as("document_path"), $"text")

  test("ingest produces the declared index schema with unit-norm float32 vectors") {
    val recs = IndexTable.ingestRecords(docs.limit(20), "t1", pageSize = 32)
    assert(recs.columns.toSeq ===
      Seq("id", "index_alias", "document_path", "page_number", "page_content", "page_content_vector"))
    val norms = recs.select(graft.functions.VectorFunctions.l2Norm($"page_content_vector"))
      .as[Double].collect()
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    // sha1 hex ids, 40 chars
    assert(recs.select(length($"id")).as[Int].collect().forall(_ === 40))
  }

  test("topK(k) is a prefix of topK(k+5) and similarities are descending") {
    val recs = IndexTable.ingestRecords(docs, "t1", pageSize = 32).cache()
    val q = Embedder.embedQuery("fast spark table scan query")
    val k5 = KnnSearch.topK(recs, q, 5).select($"id").as[String].collect().toSeq
    val k10 = KnnSearch.topK(recs, q, 10).select($"id").as[String].collect().toSeq
    assert(k10.take(5) === k5)
    val sims = KnnSearch.topK(recs, q, 10).select($"similarity").as[Double].collect().toSeq
    assert(sims === sims.sorted.reverse)
  }

  test("self-retrieval: a page's own cleansed text embeds to similarity ~1 at rank 1") {
    val recs = IndexTable.ingestRecords(docs, "t1", pageSize = 32).cache()
    val probe = recs.select($"id", $"page_content").as[(String, String)].head()
    // same cleanse the ingest applied before embedding (P1 single-pass)
    val q = Embedder.embedQuery(probe._2.replace("\n", " ").replace("  ", " "))
    val top = KnnSearch.topK(recs, q, 1).select($"id", $"similarity")
      .as[(String, Double)].head()
    assert(top._1 === probe._1)
    assert(top._2 > 0.999)
  }

  test("rerank: threshold, desc order, limit, 1-based page projection") {
    val hits = Seq(
      ("a", "al", "doc1", 0, "fast spark table scan query words", 0.9),
      ("b", "al", "doc2", 1, "unrelated content entirely", 0.8),
      ("c", "al", "doc3", 2, "fast table words", 0.7)
    ).toDF("id", "index_alias", "document_path", "page_number", "page_content", "similarity")
    val ans = Rerank.answers(hits, "fast spark table scan query", topN = 10, threshold = 40)
    val rows = ans.select($"score", $"source", $"page").as[(Int, String, Int)].collect()
    assert(rows.map(_._2).toSeq === Seq("doc1", "doc3")) // doc2 filtered (score 0)
    assert(rows.head._1 === 100)
    assert(rows.head._3 === 1) // page_number 0 -> display page 1 (app/app.py:108)
  }

  test("flagship entry returns non-empty answers on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("index DDL: create is idempotent, exists probes, drop removes") {
    val path = java.nio.file.Files.createTempDirectory("graft_idx").toString + "/idx"
    assert(!IndexTable.exists(spark, path))
    IndexTable.create(spark, path)
    IndexTable.create(spark, path) // idempotent (reference :266,288-289)
    assert(IndexTable.exists(spark, path))
    val recs = IndexTable.ingestRecords(docs.limit(5), "tenant1", pageSize = 32)
    IndexTable.append(recs, path)
    val back = IndexTable.read(spark, path, "tenant1")
    assert(back.count() === recs.count())
    IndexTable.drop(spark, path)
    assert(!IndexTable.exists(spark, path))
  }

  test("alias encoding is sha1 hex (reference encode(), utilities.py:98-99)") {
    assert(IndexTable.encodeAlias("abc") === "a9993e364706816aba3e25717850c26c9cd0d89d")
  }
}
