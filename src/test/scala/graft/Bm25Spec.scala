package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BinaryQuant, Bm25}

class Bm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "spark join spark window"),
    (1L, "join stream"),
    (2L, "table scan filter sort"),
    (3L, "spark spark spark spark"),
    (4L, "window stream join spark table")
  ).toDF("doc_id", "text")

  test("bm25: independent arithmetic mirror on a hand-sized corpus") {
    val got = Bm25.topK(docs, "text", "doc_id", Seq("spark", "join"), k = 5)
      .select($"doc_id", $"score", $"rank").as[(Long, Double, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap

    // single-node mirror of the same formula
    val corpus = Map(
      0L -> Seq("spark", "join", "spark", "window"),
      1L -> Seq("join", "stream"),
      2L -> Seq("table", "scan", "filter", "sort"),
      3L -> Seq("spark", "spark", "spark", "spark"),
      4L -> Seq("window", "stream", "join", "spark", "table"))
    val n = corpus.size.toDouble
    val avgdl = corpus.values.map(_.length).sum.toDouble / n
    val dfT = Map("spark" -> 3.0, "join" -> 3.0)
    def score(id: Long): Double = {
      val toks = corpus(id)
      val dl = toks.length.toDouble
      val s = Seq("spark", "join").map { term =>
        val tf = toks.count(_ == term).toDouble
        if (tf == 0) 0.0
        else {
          val idf = math.log(1.0 + (n - dfT(term) + 0.5) / (dfT(term) + 0.5))
          idf * (tf * (1.2 + 1.0)) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        }
      }.sum
      math.rint(s * 1e4) / 1e4
    }
    // docs 0,1,3,4 match at least one term; doc 2 matches none
    assert(!got.contains(2L))
    for (id <- Seq(0L, 1L, 3L, 4L))
      assert(math.abs(got(id)._1 - score(id)) < 1e-9, s"doc $id")
    // ranks follow (score desc, doc_id asc)
    val byRank = got.toSeq.sortBy(_._2._2).map(_._1)
    val expected = Seq(0L, 1L, 3L, 4L).sortBy(id => (-score(id), id))
    assert(byRank === expected)
  }

  test("postings: sharded lists are doc-sorted, aligned, and df-complete") {
    val p = Bm25.postings(docs, "text", "doc_id", nShards = 2)
      .select($"term", $"shard", $"df_shard", $"doc_ids", $"tfs")
      .as[(String, Int, Long, Seq[Long], Seq[Long])].collect()

    // every posting row: sorted ids, aligned lengths, shard-consistent ids
    p.foreach { case (term, shard, dfs, ids, tfs) =>
      assert(ids == ids.sorted, s"$term/$shard not sorted")
      assert(ids.length == tfs.length && ids.length == dfs, s"$term/$shard misaligned")
      assert(ids.forall(_ % 2 == shard), s"$term/$shard wrong shard")
    }
    // spot-check: spark appears in docs 0 (tf 2), 3 (tf 4), 4 (tf 1)
    val spark0 = p.find(r => r._1 == "spark" && r._2 == 0).get
    assert(spark0._4 == Seq(0L, 4L) && spark0._5 == Seq(2L, 1L))
    val spark1 = p.find(r => r._1 == "spark" && r._2 == 1).get
    assert(spark1._4 == Seq(3L) && spark1._5 == Seq(4L))
    // total df over shards = docs containing the term
    val dfTotal = p.filter(_._1 == "join").map(_._3).sum
    assert(dfTotal == 3L)
  }

  test("rrf fusion: union of lists, absent side contributes zero, rank order") {
    val a = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rank")
    val b = Seq((11L, 1), (13L, 2)).toDF("id", "rank")
    val got = Bm25.rrfFuse(a, b, "id", k = 4)
      .select($"id", $"rrf_score", $"rank").as[(Long, Double, Int)]
      .collect().sortBy(_._3)

    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val exp = Map(
      10L -> r6(1.0 / 61), 11L -> r6(1.0 / 62 + 1.0 / 61),
      12L -> r6(1.0 / 63), 13L -> r6(1.0 / 62))
    assert(got.map(_._1).toSet === exp.keySet)
    got.foreach { case (id, s, _) => assert(math.abs(s - exp(id)) < 1e-12) }
    // 11 first (in both lists), then 13 (rank-2 in b beats rank-3 in a)
    assert(got.head._1 == 11L)
    assert(got.map(_._1).indexOf(13L) < got.map(_._1).indexOf(12L))
  }

  test("binary quant: pack matches manual sign bits; hamming is xor popcount") {
    val v = Array.tabulate(64)(i => if (i % 3 == 0) 1.0f else -1.0f)
    val df = Seq(Tuple1(v.toSeq)).toDF("vec")
    val (h0, h1) = BinaryQuant.pack64($"vec")
    val Array(row) = df.select(h0.as("h0"), h1.as("h1")).collect()
    def expectedWord(lo: Int): Long =
      (0 until 32).foldLeft(0L)((acc, j) =>
        acc | (if (v(lo + j) >= 0) 1L << j else 0L))
    assert(row.getLong(0) == expectedWord(0))
    assert(row.getLong(1) == expectedWord(32))

    val w = Seq((3L, 5L, 6L, 5L)).toDF("a0", "a1", "b0", "b1")
    val Array(h) = w.select(
      BinaryQuant.hamming($"a0", $"a1", $"b0", $"b1").as("h")).collect()
    // 3^6 = 5 (two bits), 5^5 = 0
    assert(h.getInt(0) == 2)
  }

  test("ivf x binary: pruned probe keeps a recall floor; full probe equals pure binary") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").cache()
    val qs = emb.where($"vec_id" < 10)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec")).cache()
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet

    val pureBinary = hits(BinaryQuant.hammingTopK(emb, qs, k = 10, candidates = 32))
    val fullProbe = hits(BinaryQuant.ivfBinaryTopK(emb, qs, k = 10,
      candidates = 32, nCentroids = 8, nprobe = 8))
    assert(fullProbe === pureBinary,
      "full-probe composition must reproduce the pure binary path")

    val exact = hits(graft.operators.SimilaritySearch.bruteForceTopK(emb, qs, 10))
    val pruned = hits(BinaryQuant.ivfBinaryTopK(emb, qs, k = 10,
      candidates = 64, nCentroids = 8, nprobe = 2))
    val recall = exact.intersect(pruned).size.toDouble / exact.size
    assert(recall >= 0.2, f"pruned ivf-binary recall collapsed: $recall%.2f")
    emb.unpersist(false); qs.unpersist(false)
  }

  test("truncated-dim (matryoshka) retrieval keeps a recall floor at 1/4 the bytes") {
    val full = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").cache()
    val trunc = full.select($"vec_id", slice($"embedding", 1, 16).as("embedding"))
    def hits(emb: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val qs = emb.where($"vec_id" < 20)
        .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
      graft.operators.SimilaritySearch.bruteForceTopK(emb, qs, 10)
        .select($"q_id", $"vec_id").as[(Long, Long)].collect().toSet
    }
    val exact = hits(full)
    val approx = hits(trunc)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.15, f"16-of-64-dim recall collapsed: $recall%.3f")
    full.unpersist(false)
  }

  test("binary quant search: self-similar vectors found despite 32x compression") {
    // corpus of near-duplicates of two centroids: hamming stage must route
    // each query to its own family before the cosine re-rank
    val base = Array.tabulate(64)(i => if (i < 32) 1.0f else -1.0f)
    val anti = base.map(-_)
    def jitter(v: Array[Float], fl: Int): Array[Float] = {
      val c = v.clone(); c(fl) = -c(fl); c
    }
    val rows = (0 until 10).map { i =>
      val fam = if (i % 2 == 0) base else anti
      (i.toLong, jitter(fam, i % 32 + 16).toSeq)
    }
    val corpus = rows.toDF("vec_id", "embedding")
    val qs = corpus.where($"vec_id" < 2)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val got = BinaryQuant.hammingTopK(corpus, qs, k = 3, candidates = 5)
      .select($"q_id", $"vec_id", $"rank").as[(Long, Long, Int)].collect()
    // every top hit shares the query's family parity
    got.foreach { case (q, v, _) =>
      assert(v % 2 == q % 2, s"query $q matched cross-family vector $v")
    }
    assert(got.count(_._1 == 0L) == 3 && got.count(_._1 == 1L) == 3)
  }

  test("phraseMatch finds exact adjacencies only, counts overlaps, handles 3-term phrases") {
    val docs = Seq(
      (1L, "fast scan wins"),        // hit at 0
      (2L, "scan fast scan fast scan"), // "fast scan" at 1 and 3
      (3L, "fast x scan"),           // terms present, NOT adjacent
      (4L, "slow sort")              // terms absent
    ).toDF("doc_id", "text")
    val two = graft.operators.Bm25.phraseMatch(docs, "text", "doc_id", Seq("fast", "scan"))
      .as[(Long, Int)].collect().toSet
    assert(two === Set((1L, 0), (2L, 1), (2L, 3)))
    val three = graft.operators.Bm25.phraseMatch(docs, "text", "doc_id",
      Seq("fast", "scan", "fast"))
      .as[(Long, Int)].collect().toSet
    assert(three === Set((2L, 1))) // only doc 2 has the 3-term run
  }
}
