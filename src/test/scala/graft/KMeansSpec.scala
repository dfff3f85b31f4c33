package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KMeans

class KMeansSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet(s"${TestSpark.sf}/embeddings.parquet").cache()

  /** Independent single-node mirror of the operator's portable arithmetic
    * (md5 seed order, fold-ordered rounded distances, rounded means). */
  private def ref(vecs: Seq[(Long, Array[Double])], k: Int, iters: Int): Map[Long, Int] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dist(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      rnd(s, 8)
    }
    val byId = vecs.toMap
    val order = vecs.map(_._1).sortBy(id => (md5hex(id.toString), id))
    var cents: Map[Int, Array[Double]] =
      order.take(k).zipWithIndex.map { case (id, i) => i -> byId(id).map(rnd(_, 6)) }.toMap
    def assign(c: Map[Int, Array[Double]]): Map[Long, Int] =
      vecs.map { case (id, v) =>
        id -> c.toSeq.map { case (cid, ct) => (dist(v, ct), cid) }.min._2
      }.toMap
    for (_ <- 1 to iters) {
      val a = assign(cents)
      cents = vecs.groupBy(t => a(t._1)).map { case (c, members) =>
        val dim = members.head._2.length
        c -> Array.tabulate(dim)(i =>
          rnd(members.map(_._2(i)).sum / members.size, 6))
      }
    }
    assign(cents)
  }

  test("portable Lloyd matches the single-node reference and survives repartitioning") {
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq
    val want = ref(vecs, k = 8, iters = 2)
    val got = KMeans.assign(emb, "embedding", "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got.size === vecs.size)
    assert(got === want)
    val rep = KMeans.assign(emb.repartition(7), "embedding", "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(rep === want, "assignment must be partitioning-invariant")
  }

  test("assignPersisted: round-trips assign exactly, reused not rebuilt") {
    val path = java.nio.file.Files.createTempDirectory("graft_kmp").toString + "/idx"
    val fresh = KMeans.assign(emb, "embedding", "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    val p = KMeans.assignPersisted(emb, path, "embedding", "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(p === fresh)
    // reuse contract: a poisoned corpus must not trigger a rebuild
    val again = KMeans.assignPersisted(emb.limit(5), path, "embedding",
        "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(again === fresh, "existing assignment must be reused, never rebuilt")
  }

  test("iters=0 assigns each seed vector to its own cluster") {
    val got = KMeans.assign(emb, "embedding", "vec_id", k = 4, iters = 0)
      .as[(Long, Int)].collect().toMap
    assert(got.values.toSet.size === 4)
    // clusters are populated and every vector is assigned exactly once
    assert(got.size === emb.count())
  }

  test("row-local assignUdf (the serving path) matches the distributed assign exactly") {
    val emb = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
    val cents = KMeans.centroidsDF(emb, "embedding", "vec_id", k = 8, iters = 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    val served = emb.select(col("vec_id"),
        KMeans.assignUdf(cents)(transform(col("embedding"), _.cast("double"))))
      .as[(Long, Int)].collect().toMap
    val distributed = KMeans.assign(emb, "embedding", "vec_id", k = 8, iters = 2)
      .as[(Long, Int)].collect().toMap
    // identical arithmetic + (distance, cid) tie-break: cluster-for-cluster
    assert(served === distributed)
  }
}
