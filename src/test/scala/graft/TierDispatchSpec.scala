package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.TierStats
import graft.operators.{Dedup, Graph, GraphAnn}

/** Tier-taken observability (round-12): every budget dispatch RECORDS which
  * tier served a call, so a silently-failing size Observation (which fails
  * SAFE to the distributed loop) is distinguishable from host noise in the
  * bench record. These tests pin the counter's truthfulness on both sides
  * of each dispatch: gate-sized fixtures take the driver tier, a forced
  * zero budget takes the distributed one, and the null-id hnsw corpus —
  * where the two tiers would pick different entries — dispatches
  * distributed. */
class TierDispatchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf}/embeddings.parquet").cache()
  private lazy val qs = emb.where(col("vec_id") < 3)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  private def delta(key: String)(body: => Unit): Long = {
    val before = TierStats.snapshot()
    body
    TierStats.diff(before, TierStats.snapshot()).getOrElse(key, 0L)
  }

  private lazy val edges = Seq(
    (1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0), (3L, 4L, 2.0), (4L, 1L, 1.0)
  ).toDF("src", "dst", "w")

  test("pageRank records driver under budget, distributed at budget 0") {
    assert(delta("pageRank:driver") {
      Graph.pageRank(edges, "src", "dst", "w", iters = 2).count()
    } === 1L)
    assert(delta("pageRank:distributed") {
      Graph.pageRank(edges, "src", "dst", "w", iters = 2,
        driverEdgeBudget = 0L).count()
    } === 1L)
  }

  test("ppr / hits / bfs / kCore / lpa / connectedComponents all record " +
      "both tiers truthfully") {
    val seeds = Seq(1L).toDF("node")
    assert(delta("personalizedPageRank:driver") {
      Graph.personalizedPageRank(edges, "src", "dst", "w", seeds, iters = 2).count()
    } === 1L)
    assert(delta("personalizedPageRank:distributed") {
      Graph.personalizedPageRank(edges, "src", "dst", "w", seeds, iters = 2,
        driverEdgeBudget = 0L).count()
    } === 1L)
    assert(delta("hits:driver") {
      Graph.hits(edges, "src", "dst", iters = 2).count()
    } === 1L)
    assert(delta("hits:distributed") {
      Graph.hits(edges, "src", "dst", iters = 2, driverEdgeBudget = 0L).count()
    } === 1L)
    assert(delta("multiSourceBfs:driver") {
      Graph.multiSourceBfs(edges, "src", "dst", seeds, rounds = 2).count()
    } === 1L)
    assert(delta("multiSourceBfs:distributed") {
      Graph.multiSourceBfs(edges, "src", "dst", seeds, rounds = 2,
        driverEdgeBudget = 0L).count()
    } === 1L)
    assert(delta("kCore:driver") {
      Graph.kCore(edges, "src", "dst", k = 2, rounds = 2).count()
    } === 1L)
    assert(delta("kCore:distributed") {
      Graph.kCore(edges, "src", "dst", k = 2, rounds = 2,
        driverEdgeBudget = 0L).count()
    } === 1L)
    assert(delta("labelPropagation:driver") {
      Graph.labelPropagation(edges, "src", "dst", iters = 2).count()
    } === 1L)
    assert(delta("labelPropagation:distributed") {
      Graph.labelPropagation(edges, "src", "dst", iters = 2,
        driverEdgeBudget = 0L).count()
    } === 1L)
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 8L)).toDF("id1", "id2")
    assert(delta("connectedComponents:driver") {
      Dedup.connectedComponents(pairs).count()
    } >= 1L)
    assert(delta("connectedComponents:distributed") {
      Dedup.connectedComponents(pairs, driverEdgeBudget = 0L).count()
    } >= 1L)
  }

  test("the gated walks record driver at fixture scale and distributed " +
      "under a zero budget") {
    val e = GraphAnn.knnGraph(emb, m = 4, nBits = 4, nTables = 4, dim = 64)
      .localCheckpoint()
    assert(delta("beamSearch:driver") {
      GraphAnn.beamSearch(emb, e, qs, k = 5, beam = 4, rounds = 2).count()
    } === 1L)
    assert(delta("beamSearch:distributed") {
      GraphAnn.beamSearch(emb, e, qs, k = 5, beam = 4, rounds = 2,
        driverCorpusBudget = 0L).count()
    } === 1L)
    val le = GraphAnn.hnswGraph(emb, m = 4, nBits = 4, nTables = 4,
      dim = 64, maxLayer = 2).localCheckpoint()
    assert(delta("hnswSearchBeams:driver") {
      GraphAnn.hnswSearchBeams(emb, le, qs, k = 5, beams = Seq(4),
        rounds = 2).count()
    } === 1L)
    assert(delta("hnswSearchBeams:distributed") {
      GraphAnn.hnswSearchBeams(emb, le, qs, k = 5, beams = Seq(4), rounds = 2,
        driverCorpusBudget = 0L).count()
    } === 1L)
  }

  test("a corpus with null ids dispatches the hierarchy walk DISTRIBUTED " +
      "(driver entry ranking iterates the null-dropped map, the distributed " +
      "TakeOrdered ranks every row — the tiers would pick different entries)") {
    val withNull = emb.select(
      when(col("vec_id") === 0, lit(null)).otherwise(col("vec_id")).as("vec_id"),
      col("embedding"))
    val le = GraphAnn.hnswGraph(emb, m = 4, nBits = 4, nTables = 4,
      dim = 64, maxLayer = 2).localCheckpoint()
    val before = TierStats.snapshot()
    GraphAnn.hnswSearchBeams(withNull, le, qs, k = 5, beams = Seq(4),
      rounds = 2).count()
    val d = TierStats.diff(before, TierStats.snapshot())
    assert(d.getOrElse("hnswSearchBeams:distributed", 0L) === 1L)
    assert(d.getOrElse("hnswSearchBeams:driver", 0L) === 0L)
  }
}
