package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-fixture pins for SparkEntry-level gated queries whose
  * semantics deserve a hand-computed check beyond the oracle hash (the
  * oracle proves cross-engine agreement; these prove the STATISTIC is
  * the one the scaladoc claims). Fixtures are written as parquet into a
  * temp dir shaped like the driver's testdata so the registered query
  * runs verbatim. */
class GatedQueryFixtureSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def eventsDir(rows: Seq[(Long, java.sql.Timestamp, Long, String, Double, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_fix").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }
  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("events_capture_recapture: Chapman estimate matches the hand " +
      "computation on a planted two-window overlap") {
    val day = 86400L
    val base = 1700000000L
    // 20 users only in the first window, 20 only in the second, 10 in both
    val rows =
      (1L to 20L).map(u => (u, ts(base + u), u, "view", 1.0, "{}")) ++
      (21L to 40L).map(u => (u + 100, ts(base + 9 * day + u), u, "view", 1.0, "{}")) ++
      (41L to 50L).flatMap(u => Seq(
        (u + 200, ts(base + u), u, "view", 1.0, "{}"),
        (u + 300, ts(base + 9 * day + u), u, "view", 1.0, "{}")))
    val r = SparkEntry.queries("events_capture_recapture")(spark, eventsDir(rows)).head()
    assert(r.getAs[Long]("n_first") === 30L)
    assert(r.getAs[Long]("n_second") === 30L)
    assert(r.getAs[Long]("n_both") === 10L)
    assert(r.getAs[Long]("n_true") === 50L)
    // Chapman: 31*31/11 - 1 = 86.3636; se = sqrt(31*31*20*20/(11*11*12))
    assert(math.abs(r.getAs[Double]("n_hat") - 86.3636) < 1e-4)
    assert(math.abs(r.getAs[Double]("se") - 16.2707) < 1e-3)
  }

  test("events_forecast_pinball: interpolated train quantiles and the " +
      "pinball means match the hand computation") {
    val day = 86400L
    val base = 1699920000L // MIDNIGHT-aligned anchor (date_trunc must tile
    // the +d*day offsets exactly, or the epoch-midpoint split misassigns
    // the boundary day); max event at day-10 00:00+49
    // train days 1..5 with counts 10,20,30,40,50; test day 6 count 30 and
    // day 10 count 50; the epoch midpoint (day 5.5) splits exactly there
    val trainCounts = Seq(10, 20, 30, 40, 50)
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, String, Double, String)]()
    trainCounts.zipWithIndex.foreach { case (n, d) =>
      (0 until n).foreach { k =>
        id += 1
        // keep day-1's first event exactly at the anchor
        val off = if (d == 0 && k == 0) 0L else k.toLong + 1L
        rows += ((id, ts(base + d * day + off), id, "view", 1.0, "{}"))
      }
    }
    (0 until 30).foreach { k => id += 1
      rows += ((id, ts(base + 5 * day + k + 1), id, "view", 1.0, "{}")) }
    (0 until 50).foreach { k => id += 1
      // day-10 00:00 exactly for the first event keeps max = base + 9d
      rows += ((id, ts(base + 9 * day + k), id, "view", 1.0, "{}")) }
    val out = SparkEntry.queries("events_forecast_pinball")(spark, eventsDir(rows.toSeq))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_test_days") === 2L)
    // p50 of (10,20,30,40,50) = 30; p90 = 40 + 0.6*(50-40) = 46
    assert(r.getAs[Double]("forecast_p50") === 30.0)
    assert(r.getAs[Double]("forecast_p90") === 46.0)
    // pinball50: (0 + 0.5*20)/2 = 5; pinball90: (max(.9*(30-46), -.1*(30-46)) + .9*4)/2 = (1.6+3.6)/2
    assert(r.getAs[Double]("pinball_p50") === 5.0)
    assert(math.abs(r.getAs[Double]("pinball_p90") - 2.6) < 1e-9)
  }

  test("shard_ring_stability: keys only ever move TO the new shard's " +
      "arcs, and every shard owns some keys") {
    val out = SparkEntry.queries("shard_ring_stability")(spark, TestSpark.sf)
      .select($"shard8", $"shard9", $"moved").as[(Int, Int, Boolean)].collect()
    assert(out.nonEmpty)
    // THE consistent-hashing property: growing 8 -> 9 shards relocates
    // keys exclusively to shard 8 (the new one) — nothing reshuffles
    // between surviving shards
    out.filter(_._3).foreach { case (_, s9, _) => assert(s9 === 8) }
    assert(out.map(_._1).distinct.sorted.toSeq === (0 until 8))
    assert(out.map(_._2).distinct.size === 9)
    val movedFrac = out.count(_._3).toDouble / out.length
    assert(movedFrac > 0.02 && movedFrac < 0.35, s"moved $movedFrac")
  }

  test("sample_horvitz_thompson: the PPS estimate lands near the true " +
      "token total with a meaningful sample") {
    val r = SparkEntry.queries("sample_horvitz_thompson")(spark, TestSpark.sf).head()
    val nPop = r.getAs[Long]("n_pop")
    val nSampled = r.getAs[Long]("n_sampled")
    assert(nSampled > 0L && nSampled < nPop)
    assert(r.getAs[Double]("rel_err") < 0.25,
      s"rel_err ${r.getAs[Double]("rel_err")} (n=$nSampled of $nPop)")
  }

  test("events_qini_uplift: a planted single-segment lift puts that " +
      "segment first and yields positive incremental conversions") {
    val base = 1700000000L
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, java.sql.Timestamp, Long, String, Double, String)]()
    // 40 low-activity users (10 events): treatment (odd) converts, control
    // never; 40 high-activity users (80 events): nobody converts
    (1L to 40L).foreach { u =>
      (0 until 9).foreach { k => id += 1
        rows += ((id, ts(base + u * 100 + k), u, "view", 1.0, "{}")) }
      id += 1
      val v = if (u % 2 == 1) 400.0 else 10.0
      rows += ((id, ts(base + u * 100 + 50), u, "purchase", v, "{}"))
    }
    (101L to 140L).foreach { u =>
      (0 until 80).foreach { k => id += 1
        rows += ((id, ts(base + u * 100 + k), u, "view", 1.0, "{}")) }
    }
    val out = SparkEntry.queries("events_qini_uplift")(spark, eventsDir(rows.toSeq))
      .collect()
    assert(out.nonEmpty)
    val first = out.head // ordered by train_uplift desc
    assert(first.getAs[String]("cut_segment") === "low")
    assert(first.getAs[Double]("train_uplift") > 0.9)
    assert(first.getAs[Double]("qini") > 0.0,
      s"qini ${first.getAs[Double]("qini")}")
  }

  test("ann_hnsw_recall_planted: truth is exactly the planted copies and " +
      "the gated curve is informative (high floor, monotone in beam)") {
    val out = SparkEntry.queries("ann_hnsw_recall_planted")(spark, TestSpark.sf)
      .collect().sortBy(_.getAs[Int]("beam"))
    assert(out.map(_.getAs[Int]("beam")).toSeq === Seq(2, 4, 8))
    // 5 queries x 10 planted exact copies, independent of corpus size —
    // the ground truth the gate ranks against is the planted neighborhood,
    // never the random tail
    assert(out.forall(_.getAs[Long]("n_truth") === 50L))
    val recalls = out.map(_.getAs[Double]("recall")).toSeq
    // informativeness contract (r10 verdict item 5): a working walk finds
    // most of the planted neighborhood at beam 8; a walk/link regression
    // collapses this instead of nudging near-zero noise
    assert(recalls.last >= 0.5, s"recall@beam8 ${recalls.last}")
    assert(recalls.sorted === recalls, s"beam curve must be monotone: $recalls")
  }

  test("ann_ivf_recall_planted: truth is the planted copies (one Lloyd cell) " +
      "and the routing contract holds at every nprobe") {
    val out = SparkEntry.queries("ann_ivf_recall_planted")(spark, TestSpark.sf)
      .collect().sortBy(_.getAs[Int]("nprobe"))
    assert(out.map(_.getAs[Int]("nprobe")).toSeq === Seq(1, 2, 4))
    assert(out.forall(_.getAs[Long]("n_truth") === 50L))
    val recalls = out.map(_.getAs[Double]("recall")).toSeq
    // identical copies assign to ONE cell and the query's rank-1 probe IS
    // that cell (assignment and routing share the distance arithmetic) —
    // a seeding/assignment/routing regression collapses this to ~0
    assert(recalls.head >= 0.5, s"recall@nprobe1 ${recalls.head}")
    assert(recalls.sorted === recalls, s"nprobe curve must be monotone: $recalls")
  }

  test("ann_lsh_recall_planted: exact copies share the query's bucket, so " +
      "the bucket/probe/rank contract reads full recall at both radii") {
    val out = SparkEntry.queries("ann_lsh_recall_planted")(spark, TestSpark.sf)
      .collect().sortBy(_.getAs[Int]("probe_radius"))
    assert(out.map(_.getAs[Int]("probe_radius")).toSeq === Seq(0, 1))
    assert(out.forall(_.getAs[Long]("n_truth") === 50L))
    val recalls = out.map(_.getAs[Double]("recall")).toSeq
    assert(recalls.head >= 0.5, s"recall@radius0 ${recalls.head}")
    assert(recalls.sorted === recalls, s"radius curve must be monotone: $recalls")
  }
}
