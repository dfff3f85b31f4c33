package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SemDedup

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vec(xs: Double*): Array[Double] = xs.toArray

  test("keep-lowest-id: the higher id of an identical pair is dropped") {
    val df = Seq(
      (0L, vec(1.0, 0.0, 0.0)),
      (1L, vec(1.0, 0.0, 0.0)),   // exact duplicate of 0
      (2L, vec(0.0, 1.0, 0.0))    // orthogonal — never a dup
    ).toDF("id", "v")
    val out = SemDedup.prune(df, "v", "id", k = 1, iters = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> true))
  }

  test("chain a~b~c with a!~c drops BOTH b and c (strictly-dedup-more rule)") {
    def ang(deg: Double) = {
      val r = math.toRadians(deg); vec(math.cos(r), math.sin(r))
    }
    // cos(25°)=0.9063 ≥ 0.9 links a~b and b~c; cos(50°)=0.643 < 0.9 so a!~c.
    val df = Seq((0L, ang(0)), (1L, ang(25)), (2L, ang(50))).toDF("id", "v")
    val out = SemDedup.prune(df, "v", "id", k = 1, iters = 1, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out === Map(0L -> true, 1L -> false, 2L -> false))
  }

  test("pairs are within-cluster only, and prune agrees with the pair list") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val pruned = SemDedup.prune(emb, "embedding", "vec_id",
      k = 8, iters = 2, threshold = 0.4).cache()
    val pairs = SemDedup.pairs(emb, "embedding", "vec_id",
      k = 8, iters = 2, threshold = 0.4).cache()

    // every pair's endpoints share the pair's cluster in the prune output
    val byId = pruned.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val ps = pairs.collect()
    assert(ps.nonEmpty, "threshold 0.4 must yield pairs on the fixture")
    ps.foreach { r =>
      val (id1, id2, c) = (r.getLong(0), r.getLong(1), r.getInt(2))
      assert(id1 < id2)
      assert(byId(id1)._1 == c && byId(id2)._1 == c)
    }
    // dropped set == distinct id2 of the pair list
    val droppedFromPairs = ps.map(_.getLong(1)).toSet
    val droppedFromPrune = byId.filter(!_._2._2).keySet
    assert(droppedFromPrune === droppedFromPairs)
    pruned.unpersist(); pairs.unpersist()
  }

  test("resolveGroups elects the lowest-centroid-similarity member per dup group") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val groups = SemDedup.resolveGroups(emb, "embedding", "vec_id",
      k = 8, iters = 2, threshold = 0.4).collect()
    assert(groups.nonEmpty)
    // groups must partition exactly the docs that appear in some pair
    val pairs = SemDedup.pairs(emb, "embedding", "vec_id", 8, 2, 0.4)
      .select("id1", "id2").as[(Long, Long)].collect()
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(groups.map(_.getLong(3)).sum === inPairs.size.toLong,
      "group sizes must sum to the number of pair-touched docs")
    groups.foreach { g =>
      assert(inPairs.contains(g.getLong(1)), "keeper must be a pair-touched doc")
      assert(g.getLong(3) >= 2, "a dup group has at least two members")
    }
    // the election is NOT keep-lowest-id (it actually uses centroid sim):
    // at least one group must keep a non-minimal id on this fixture
    assert(groups.exists(g => g.getLong(1) != g.getLong(0)),
      "fixture must exercise the centroid-similarity election")
  }

  test("cluster assignment matches KMeans.assign (pruning never re-clusters)") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val fromPrune = SemDedup.prune(emb, "embedding", "vec_id",
      k = 8, iters = 2, threshold = 0.4)
      .select(col("vec_id"), col("cluster"))
    val fromKmeans = graft.operators.KMeans.assign(emb, "embedding", "vec_id",
      k = 8, iters = 2)
    assert(fromPrune.exceptAll(fromKmeans).isEmpty &&
      fromKmeans.exceptAll(fromPrune).isEmpty)
  }
}
