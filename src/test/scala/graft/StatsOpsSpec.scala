package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, StatsOps}

class StatsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("welchTTest: hand-computed statistic on a tiny fixture; group order deterministic") {
    // a: 1,2,3 (m=2, v=1); b: 5,7,9 (m=7, v=4)
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 7.0), ("b", 9.0))
      .toDF("grp", "x")
    val r = StatsOps.welchTTest(df, "x", "grp").head()
    assert(r.getAs[String]("group_a") === "a")
    assert(r.getAs[String]("group_b") === "b")
    assert(r.getAs[Long]("n_a") === 3L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Double]("mean_a") === 2.0 && r.getAs[Double]("mean_b") === 7.0)
    // t = (2-7)/sqrt(1/3+4/3) = -5/sqrt(5/3) = -3.873
    assert(math.abs(r.getAs[Double]("t_stat") - -3.873) < 1e-3)
    // dof = (5/3)^2 / ((1/9)/2 + (16/9)/2) = 2.9411...
    assert(math.abs(r.getAs[Double]("dof") - 2.94) < 1e-2)
    assert(r.getAs[Boolean]("significant"))
  }

  test("ewmaDaily: no trend on day 1; flat series on trend; 3x spike flags against prior-day trend") {
    val rows = (1 to 10).flatMap { d =>
      val n = if (d == 9) 30 else 10 // spike on day 9
      (1 to n).map(_ => ("k", java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:01")))
    }
    val df = rows.toDF("k", "ts")
    val out = StatsOps.ewmaDaily(df, "k", "ts").orderBy("day").collect()
    assert(out.head.isNullAt(out.head.fieldIndex("ewma"))) // day 1: no prior trend
    assert(!out.head.getAs[Boolean]("off_trend"))
    // flat days 2-8: trend is exactly 10, ratio exactly 1
    assert(out.slice(1, 8).forall(r =>
      r.getAs[Double]("ewma") === 10.0 && !r.getAs[Boolean]("off_trend")))
    // the spike flags at ratio 3.0 — the reason the trend EXCLUDES the
    // current day (an inclusive trend self-absorbs to ratio ~1.497, unflagged)
    val spike = out(8)
    assert(spike.getAs[Long]("n") === 30L)
    assert(spike.getAs[Double]("ratio") === 3.0)
    assert(spike.getAs[Boolean]("off_trend"))
    // day after: the contaminated trend (~20.04) makes normal volume flag LOW
    // — the documented return-to-normal echo of a 1-day spike
    assert(out(9).getAs[Boolean]("off_trend") && out(9).getAs[Double]("ratio") < 1.0)
  }

  test("transitionMatrix: probabilities sum to 1 per row; known chain reproduced") {
    val df = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L),
      (2L, "a", 5L), (2L, "a", 6L)
    ).map { case (u, t, i) => (u, t, new java.sql.Timestamp(i * 1000), i) }
      .toDF("user_id", "et", "ts", "event_id")
    val m = StatsOps.transitionMatrix(df, "user_id", "et", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // user1: a->b, b->a, a->b; user2: a->a  =>  a: {b:2, a:1}, b: {a:1}
    assert(m(("a", "b")) === (2L, 0.666667))
    assert(m(("a", "a")) === (1L, 0.333333))
    assert(m(("b", "a")) === (1L, 1.0))
  }

  test("marketBasket: lift >1 for correlated items, <1 for anti-correlated") {
    // baskets: {x,y} x3, {x,z}, {y}, {z} x3  — x,y co-occur; x,z rarely
    val rows = Seq(
      (1, "x"), (1, "y"), (2, "x"), (2, "y"), (3, "x"), (3, "y"),
      (4, "x"), (4, "z"), (5, "y"), (6, "z"), (7, "z"), (8, "z"))
    val df = rows.toDF("b", "item")
    val out = StatsOps.marketBasket(df, Seq("b"), "item")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Double]("lift")).toMap
    assert(out(("x", "y")) > 1.0) // 3/8 vs (4/8)(4/8) -> lift 1.5
    assert(out(("x", "z")) < 1.0) // 1/8 vs (4/8)(4/8) -> lift 0.5
  }

  test("kmvJoinEstimate: EXACT when the union sketch is underfull; within 20% when sampling") {
    val cust = spark.read.parquet(s"${TestSpark.sf}/customer.parquet")
    val ords = spark.read.parquet(s"${TestSpark.sf}/orders.parquet")
    def run(k: Int) = StatsOps.kmvJoinEstimate(cust, $"c_custkey", ords, $"o_custkey",
      k = k, salt = "jsz").head()
    // fixture keys < 256: the sketch holds the whole set -> estimate == exact
    val r = run(256)
    val ux = r.getAs[Long]("union_exact")
    assert(ux < 256, s"fixture grew past k; pick a larger k ($ux)")
    assert(r.getAs[Double]("union_est") === ux.toDouble)
    assert(r.getAs[Double]("inter_est") === r.getAs[Long]("inter_exact").toDouble)
    // k=32 genuinely samples: estimates within 20% (rel err ~ 1/sqrt(31))
    val s = run(32)
    val (ue2, ux2) = (s.getAs[Double]("union_est"), s.getAs[Long]("union_exact"))
    val (ie2, ix2) = (s.getAs[Double]("inter_est"), s.getAs[Long]("inter_exact"))
    assert(math.abs(ue2 - ux2) / ux2 < 0.2, s"union: est $ue2 vs exact $ux2")
    assert(math.abs(ie2 - ix2) / ix2 < 0.2, s"inter: est $ie2 vs exact $ix2")
  }

  test("dq_dp_counts: deterministic Laplace noise is nonzero, bounded, and repeatable") {
    def run() = SparkEntry.queries("dq_dp_counts")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val noisy = run()
    val truth = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    noisy.foreach { case (k, v) =>
      val noise = v - truth(k)
      // Laplace b=10: |noise| > 100 has probability e^-10 — a fixed draw
      // landing there would mean the inverse-CDF arithmetic is wrong
      assert(math.abs(noise) < 100, s"$k noise $noise implausible for b=10")
      assert(noise !== 0.0, s"$k noise exactly zero — noise not applied")
    }
    assert(run() === noisy, "DP release must be deterministic")
  }

  test("events_bootstrap_ci: the CI brackets the point estimate at plausible width") {
    val r = SparkEntry.queries("events_bootstrap_ci")(spark, TestSpark.sf).head()
    val (pt, lo, hi) = (r.getAs[Double]("point_mean"),
      r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < pt && pt < hi, s"CI [$lo, $hi] must bracket $pt")
    assert(r.getAs[Long]("n_replicates") === 32L)
    // value sd ~ O(50), n >= 1000 -> se under ~2; a CI wider than 20
    // means the Poisson multiplicities are broken
    assert(hi - lo < 20, s"CI [$lo, $hi] implausibly wide")
  }

  test("labelPropagation: two cliques joined by one bridge edge resolve to two communities") {
    // clique A: 1-2-3 complete; clique B: 7-8-9 complete; bridge 3-7
    val edges = Seq((1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9), (3, 7))
      .toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", iters = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // min-label rule: clique A converges to 1; clique B's labels are pulled
    // toward the smallest reachable, but the intra-clique majority holds
    assert(out(1) === out(2) && out(2) === out(3))
    assert(out(8) === out(9))
    assert(Set(out(1), out(8)).size === 2) // the cliques do NOT merge
  }

  test("labelPropagation: messy input (self-loops, duplicates, symmetric) canonicalized") {
    // triangle given as a mix of duplicated / reversed / self-loop edges;
    // a single-EDGE graph would oscillate under synchronous LPA (the known
    // 2-cycle), so the canonicalization check uses an odd cycle instead
    val edges = Seq((1, 2), (2, 1), (1, 1), (1, 3), (3, 1), (2, 3)).toDF("a", "b")
    val out = Graph.labelPropagation(edges, "a", "b", iters = 2)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(out.keySet === Set(1, 2, 3)) // self-loop adds no ghost node
    assert(out.values.toSet === Set(1)) // triangle converges to min label
  }

  test("seasonalNaiveBacktest: pure weekly pattern gives zero seasonal MAE, positive naive MAE") {
    // 3 weeks of n = 10 + weekday: the dow-mean forecast is exact on the
    // held-out week, the unconditional mean is not
    val start = java.time.LocalDate.parse("2024-01-01")
    val day = (0 until 21).map { i =>
      val d = start.plusDays(i)
      ("x", java.sql.Date.valueOf(d), 10L + d.getDayOfWeek.getValue - 1)
    }.toDF("k", "day", "n")
    val out = StatsOps.seasonalNaiveBacktest(day, "k", horizonDays = 7).collect().head
    assert(out.getLong(1) === 7)       // n_eval
    assert(out.getDouble(2) === 0.0)   // mae_seasonal
    assert(out.getDouble(3) > 1.0)     // mae_naive sees the weekly swing
  }

  test("seasonalNaiveBacktest: unseen weekday in history falls back to the overall mean") {
    // history = 2 days (Mon, Tue), eval = 1 day (Wed): no Wed history row
    val day = Seq(
      ("x", java.sql.Date.valueOf("2024-01-01"), 10L),
      ("x", java.sql.Date.valueOf("2024-01-02"), 20L),
      ("x", java.sql.Date.valueOf("2024-01-03"), 15L)).toDF("k", "day", "n")
    val out = StatsOps.seasonalNaiveBacktest(day, "k", horizonDays = 1).collect().head
    // fallback forecast = mean(10,20) = 15 -> both MAEs are |15-15| = 0
    assert(out.getLong(1) === 1 && out.getDouble(2) === 0.0 && out.getDouble(3) === 0.0)
  }

  test("changepointFromDayCounts finds a planted mean shift at the exact day") {
    val day = Seq.tabulate(6)(i =>
      ("x", java.sql.Date.valueOf(f"2024-01-${i + 1}%02d"), if (i < 3) 10L else 20L))
      .toDF("k", "day", "n")
    val out = StatsOps.changepointFromDayCounts(day, "k").collect().head
    assert(out.getDate(1).toString === "2024-01-03") // last day BEFORE the shift
    // |10-20| * sqrt(3*3/6) = 10*sqrt(1.5)
    assert(math.abs(out.getDouble(2) - 10 * math.sqrt(1.5)) < 1e-3)
    assert(out.getDouble(3) === 10.0 && out.getDouble(4) === 20.0)
  }

  test("changepointFromDayCounts: flat series scores near zero; ties break earliest") {
    val day = Seq.tabulate(4)(i =>
      ("f", java.sql.Date.valueOf(f"2024-02-${i + 1}%02d"), 5L)).toDF("k", "day", "n")
    val out = StatsOps.changepointFromDayCounts(day, "k").collect().head
    assert(out.getDouble(2) === 0.0)
    assert(out.getDate(1).toString === "2024-02-01") // all-zero stats: earliest day
  }

  test("isotonicBins reproduces PAVA: violators pool to their weighted mean") {
    // bins 2,3 violate monotonicity (0.4 > 0.3) -> pool to 0.35
    val bins = Seq((0, 10L, 1L), (1, 10L, 4L), (2, 10L, 3L), (3, 10L, 8L))
      .toDF("bin", "n", "pos")
    val got = StatsOps.isotonicBins(bins, "bin", "n", "pos")
      .orderBy($"bin").select($"bin", $"iso").as[(Int, Double)].collect().toSeq
    assert(got === Seq((0, 0.1), (1, 0.35), (2, 0.35), (3, 0.8)))
    // cascading pool: a strictly decreasing prefix all pools to one level
    val casc = Seq((0, 10L, 9L), (1, 10L, 5L), (2, 10L, 1L), (3, 10L, 10L))
      .toDF("bin", "n", "pos")
    val got2 = StatsOps.isotonicBins(casc, "bin", "n", "pos")
      .orderBy($"bin").select($"iso").as[Double].collect().toSeq
    assert(got2 === Seq(0.5, 0.5, 0.5, 1.0))
    // unequal weights: pooled level is the WEIGHTED mean
    val wt = Seq((0, 30L, 3L), (1, 10L, 9L), (2, 10L, 1L)).toDF("bin", "n", "pos")
    val got3 = StatsOps.isotonicBins(wt, "bin", "n", "pos")
      .orderBy($"bin").select($"iso").as[Double].collect().toSeq
    assert(got3 === Seq(0.1, 0.5, 0.5)) // (9+1)/(10+10)
    // already monotone: identity
    val mono = Seq((0, 5L, 1L), (1, 5L, 2L), (2, 5L, 5L)).toDF("bin", "n", "pos")
    val got4 = StatsOps.isotonicBins(mono, "bin", "n", "pos")
      .orderBy($"bin").select($"iso").as[Double].collect().toSeq
    assert(got4 === Seq(0.2, 0.4, 1.0))
  }

  test("bhFdr step-up: a hypothesis failing its own critical value is still " +
      "rejected when a later rank passes") {
    // m=3, q=0.1: criticals 1/30, 2/30, 3/30. p1=0.05 fails its own
    // critical, but p3=0.09 <= 0.1 passes -> the step-up rejects ALL three.
    val tests = Seq(("a", 0.05), ("b", 0.06), ("c", 0.09)).toDF("hyp", "p")
    val out = StatsOps.bhFdr(tests, "p", Seq("hyp"), q = 0.1)
      .orderBy($"rank").select($"hyp", $"rank", $"reject")
      .as[(String, Int, Boolean)].collect().toSeq
    assert(out === Seq(("a", 1, true), ("b", 2, true), ("c", 3, true)))
    // and when no rank passes its critical value, nothing is rejected
    val none = Seq(("a", 0.06), ("b", 0.11)).toDF("hyp", "p")
    val out2 = StatsOps.bhFdr(none, "p", Seq("hyp"), q = 0.1)
      .select($"reject").as[Boolean].collect().toSeq
    assert(out2 === Seq(false, false))
    // mixed case: only the prefix up to the last passing rank is rejected
    val mixed = Seq(("a", 0.001), ("b", 0.5), ("c", 0.6), ("d", 0.7))
      .toDF("hyp", "p")
    val out3 = StatsOps.bhFdr(mixed, "p", Seq("hyp"), q = 0.1)
      .orderBy($"rank").select($"hyp", $"reject")
      .as[(String, Boolean)].collect().toSeq
    assert(out3 === Seq(("a", true), ("b", false), ("c", false), ("d", false)))
  }

  test("CUPED: a strong pre-period covariate shrinks variance; theta matches " +
      "the closed form; a planted lift survives adjustment") {
    import java.sql.Timestamp
    // 40 users, pre value = user-level base (high between-user variance),
    // post value = base + noise + planted treatment lift. CUPED should
    // absorb the base and leave lift/noise.
    val rows = (0L until 40L).flatMap { u =>
      val base = 100.0 + (u % 10) * 50.0 // strong user-level signal
      val lift = if (u % 2 == 1) 10.0 else 0.0
      val noise = (u % 7).toDouble
      Seq((u, Timestamp.valueOf("2024-01-01 00:00:00"), base),
          (u, Timestamp.valueOf("2024-03-01 00:00:00"), base + lift + noise))
    }.toDF("user_id", "ts", "value")
    val out = StatsOps.cupedAdjustedTest(rows, "user_id", "value", "ts",
      when($"user_id" % 2 === 0, "control").otherwise("treatment"))
      .collect().head
    val theta = out.getAs[Double]("theta")
    val vr = out.getAs[Double]("var_reduction")
    val tRaw = math.abs(out.getAs[Double]("t_raw"))
    val tAdj = math.abs(out.getAs[Double]("t_adj"))
    // post ≈ pre + small terms -> theta near 1, most variance removed
    assert(theta > 0.9 && theta < 1.1, s"theta $theta")
    assert(vr > 0.9, s"var_reduction $vr")
    // the planted lift is invisible to the raw test (between-user variance
    // dominates) and detected after adjustment
    assert(tAdj > tRaw, s"t_adj $tAdj vs t_raw $tRaw")
    assert(tAdj > 1.96, s"t_adj $tAdj")
  }

  test("mSPRT: always-valid p is non-increasing and a strong planted lift " +
      "eventually rejects; a null effect never does") {
    import java.sql.Timestamp
    def mk(lift: Double) = (0 until 30).flatMap { day =>
      (0 until 40).map { i =>
        val g = if (i % 2 == 0) "c" else "t"
        val v = 100.0 + (i % 5) + (if (g == "t") lift else 0.0)
        (i.toLong % 2, Timestamp.valueOf(f"2024-01-${day + 1}%02d 12:00:00"), v)
      }
    }.toDF("uid", "ts", "value")
    def run(lift: Double) = StatsOps.sequentialMsprtDaily(mk(lift), "value",
        when($"uid" === 0, "control").otherwise("treatment"), "ts", tau = 10.0)
      .orderBy($"day")
      .select($"p_always_valid", $"reject_95").as[(Double, Boolean)].collect()
    val shifted = run(8.0)
    // anytime-valid: the p sequence never increases (it is 1/running-max)
    assert(shifted.map(_._1).sliding(2).forall(w => w(1) <= w(0) + 1e-12))
    assert(shifted.last._2, "a strong lift must eventually reject")
    val nul = run(0.0)
    assert(nul.forall(!_._2), "a null effect must never reject")
  }

  test("nb_conformal_sampled: fixed-size calibration, one global threshold, " +
      "and fixture coverage near the nominal level") {
    val rows = SparkEntry.queries("nb_conformal_sampled")(spark, TestSpark.sf)
      .select($"n_cal", $"n_test", $"n_covered", $"threshold")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows.nonEmpty)
    // the calibration sample is capped at 128 by construction and every
    // class sees the SAME sample (split-conformal is marginal, not
    // class-conditional)
    assert(rows.map(_._1).distinct.size === 1)
    assert(rows.head._1 <= 128L)
    assert(rows.map(_._4).distinct.size === 1)
    // the 1-a = 0.9 coverage guarantee is in EXPECTATION over exchangeable
    // draws; the fixture's single realization lands at 0.824 (103/125) —
    // pin a floor under it, not the expectation itself (pretending the
    // per-realization bound is 0.9 would be a flaky lie)
    val cov = rows.map(_._3).sum.toDouble / rows.map(_._2).sum
    assert(cov >= 0.8, s"aggregate coverage $cov")
  }

  test("events_attribution_shapley: a causally-loaded channel dominates " +
      "the exact Shapley split on a planted-journey fixture") {
    import java.sql.Timestamp
    // 4 journey shapes x 10 users, all on one day: {click} converts 8/10,
    // {view} 1/10, {click,view} 8/10, {error} 1/10 — click carries the
    // conversion signal, view adds nothing on top of click
    val rows = (0L until 40L).flatMap { u =>
      val i = u / 4
      val touches = (u % 4) match {
        case 0 => Seq("click")
        case 1 => Seq("view")
        case 2 => Seq("click", "view")
        case _ => Seq("error")
      }
      val conv = (u % 4) match {
        case 0 | 2 => i < 8
        case _ => i < 1
      }
      val base = 1704067200L + u * 60 // 2024-01-01, one day for everyone
      val touchEvents = touches.zipWithIndex.map { case (c, k) =>
        (u * 100 + k, new Timestamp((base + k) * 1000L), u, c, 1.0, "{}")
      }
      val purchase = (u * 100 + 50, new Timestamp((base + 50) * 1000L), u,
        "purchase", if (conv) 400.0 else 10.0, "{}")
      touchEvents :+ purchase
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val dir = java.nio.file.Files.createTempDirectory("graft_shap").toString
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("events_attribution_shapley")(spark, dir)
      .as[(String, Double)].collect().toMap
    // exact hand-computed values: click (4.8+1.4-0.2)/24 = 0.25; view
    // (0.6-0.2)/24; error and the never-seen signup go negative under the
    // unobserved-coalition-is-0 convention
    assert(math.abs(out("click") - 0.25) < 1e-6, s"click=${out("click")}")
    assert(out("click") > out("view") && out("view") > out("error"),
      s"ordering: $out")
    assert(out("view") < 0.05 && out("signup") < 0.0)
  }

  test("cusumFromDayCounts: a sustained small shift accumulates past the " +
      "threshold while the pre-shift period and a flat series stay quiet") {
    def mk(counts: Seq[Long]) = counts.zipWithIndex.map { case (n, i) =>
      ("k", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 00:00:00"), n)
    }.toDF("key", "day", "n")
    // 20 days at 100, then 10 days at 103: the +1.4-sigma-ish step is too
    // small for a per-day z-score but CUSUM integrates it
    val shifted = StatsOps.cusumFromDayCounts(
      mk(Seq.fill(20)(100L) ++ Seq.fill(10)(103L)), "key")
      .orderBy($"day").select($"cusum", $"drifted")
      .as[(Double, Boolean)].collect()
    assert(shifted.take(20).forall(!_._2), "pre-shift days must not flag")
    assert(shifted.last._2, "the sustained shift must flag by day 30")
    // cusum is non-decreasing across the shifted tail (it integrates)
    val tail10 = shifted.drop(20).map(_._1)
    assert(tail10.sliding(2).forall(w => w(1) >= w(0)))
    val flat = StatsOps.cusumFromDayCounts(mk(Seq.fill(30)(100L)), "key")
      .select($"drifted").as[Boolean].collect()
    assert(flat.forall(!_), "a flat series never flags (sigma = 0)")
  }

  test("ratioDeltaTest: hand-computed group ratios; planted per-event lift " +
      "detected; symmetric AA fixture has zero diff") {
    // 20 users x 2 events; control value exactly 2.0, treatment
    // 3.0 + small per-user heterogeneity (so var(R) > 0)
    val rows = (0L until 20L).flatMap { u =>
      val v = if (u % 2 == 0) 2.0 else 3.0 + (u % 5) * 0.1
      Seq((u, v), (u, v))
    }.toDF("user_id", "value")
    val r = StatsOps.ratioDeltaTest(rows, "user_id", "value",
      when($"user_id" % 2 === 0, "control").otherwise("treatment")).head()
    assert(r.getAs[String]("group_a") === "control")
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 10L)
    assert(r.getAs[Double]("ratio_a") === 2.0)
    // treatment per-event mean: avg over u in {1,3,..,19} of 3.0+(u%5)*0.1
    // = 3.0 + 0.1*(1+3+0+2+4+1+3+0+2+4)/10 = 3.2
    assert(r.getAs[Double]("ratio_b") === 3.2)
    assert(r.getAs[Double]("diff") === 1.2)
    assert(r.getAs[Double]("se") > 0.0)
    assert(r.getAs[Boolean]("significant"), s"z=${r.getAs[Double]("z_stat")}")

    // AA: identical value pattern in both groups -> diff exactly 0
    val aa = (0L until 20L).flatMap { u =>
      val v = 2.0 + (u / 2 % 5) * 0.1 // same sequence for even/odd pairs
      Seq((u, v), (u, v))
    }.toDF("user_id", "value")
    val r2 = StatsOps.ratioDeltaTest(aa, "user_id", "value",
      when($"user_id" % 2 === 0, "control").otherwise("treatment")).head()
    assert(r2.getAs[Double]("diff") === 0.0)
    assert(!r2.getAs[Boolean]("significant"))
  }

  test("jackknifeRatio: constant metric has zero jackknife se; heterogeneous " +
      "metric has positive se around the exact full-sample ratio") {
    val const = (0L until 48L).map(u => (u, 5.0)).toDF("user_id", "value")
    val rc = StatsOps.jackknifeRatio(const, "user_id", "value").head()
    assert(rc.getAs[Double]("ratio") === 5.0)
    assert(rc.getAs[Double]("jk_se") === 0.0)
    assert(rc.getAs[Double]("ci_low") === 5.0 && rc.getAs[Double]("ci_high") === 5.0)
    assert(rc.getAs[Long]("n_users") === 48L)
    assert(rc.getAs[Long]("n_buckets") <= 16L)

    // 48 users, value u%7, 1-3 events each: ratio = sum(x)/sum(y) exactly
    val het = (0L until 48L).flatMap { u =>
      (0L to u % 3).map(_ => (u, (u % 7).toDouble))
    }.toDF("user_id", "value")
    val sx = (0L until 48L).map(u => (u % 7).toDouble * (u % 3 + 1)).sum
    val sy = (0L until 48L).map(u => u % 3 + 1).sum
    val rh = StatsOps.jackknifeRatio(het, "user_id", "value").head()
    assert(math.abs(rh.getAs[Double]("ratio") - sx / sy) < 1e-6)
    assert(rh.getAs[Double]("jk_se") > 0.0)
    assert(rh.getAs[Double]("ci_low") < rh.getAs[Double]("ci_high"))
  }

  test("permutationTest: an extreme planted lift attains the minimum " +
      "attainable p = 1/(B+1); an all-identical AA fixture attains p = 1") {
    val lift = (0L until 40L).map { u =>
      (u, if (u % 2 == 0) 1.0 else 100.0)
    }.toDF("user_id", "value")
    val g = when($"user_id" % 2 === 0, "control").otherwise("treatment")
    val r = StatsOps.permutationTest(lift, "user_id", "value", g).head()
    assert(r.getAs[String]("group_a") === "control")
    assert(r.getAs[Double]("diff_obs") === 99.0)
    assert(r.getAs[Long]("n_perms") === 64L)
    // no md5 relabeling reproduces the pure split, so nothing is as extreme
    assert(r.getAs[Long]("n_extreme") === 0L)
    assert(math.abs(r.getAs[Double]("p_value") - 1.0 / 65) < 1e-6)

    // all-identical values: every permutation diff is 0 = |observed| -> p = 1
    val aa = (0L until 40L).map(u => (u, 3.0)).toDF("user_id", "value")
    val r2 = StatsOps.permutationTest(aa, "user_id", "value", g).head()
    assert(r2.getAs[Double]("diff_obs") === 0.0)
    assert(r2.getAs[Long]("n_extreme") === 64L)
    assert(r2.getAs[Double]("p_value") === 1.0)
  }
}
