package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experimentation / monitoring statistics over event streams: A/B tests,
  * EWMA trend smoothing, behavioral transition matrices, and co-occurrence
  * (association-rule) mining. These are the analyst-facing queries a
  * training-data platform runs NEXT TO the pipeline (did the new filter
  * change engagement? is today's volume drifting off trend? which event
  * co-occurs with churn?).
  *
  * Scale shapes, uniformly: everything reduces to keyed hash aggregations
  * with map-side partials over sufficient statistics (n, Σx, Σx²) or
  * bounded windows — no per-group sorting of raw rows, no collect. Group
  * summary tables (a handful of rows) re-enter plans via broadcast.
  */
object StatsOps {

  /** Welch's unequal-variance t-test between exactly two groups.
    *
    * Sufficient statistics only: per group n, Σx, Σx² in ONE pass (a
    * 2-row aggregate), then the t statistic
    * `(m̄₁-m̄₀)/√(v₁/n₁+v₀/n₀)` and the Welch–Satterthwaite dof on those
    * two rows. Variance via the sum-of-squares identity is the
    * cross-engine-replayable form (var_samp's internal update order is
    * engine-specific; Σx² is not). Output: one row, stats rounded to 4.
    *
    * `groupCol` must take exactly two values; they are ordered
    * lexicographically (group_a < group_b) so the sign of `t_stat` is
    * deterministic. The arity is VALIDATED with an eager
    * group-cardinality probe — with one group the two endpoint picks
    * would silently compare the group against itself (t_stat 0), and
    * with 3+ the lexicographically-middle groups would be silently
    * dropped; both produce plausible-looking wrong rows, so fail fast
    * instead. The probe is one extra pass over the same map-side-combined
    * aggregation the test itself needs (grouped rows, not data rows).
    */
  def welchTTest(df: DataFrame, valueCol: String, groupCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = df.groupBy(col(groupCol).as("grp"))
      .agg(count(v).cast("double").as("n"), sum(v).as("s1"), sum(v * v).as("s2"))
    val ng = g.select(lit(1)).limit(3).count()
    require(ng == 2,
      s"welchTTest requires exactly 2 groups in '$groupCol', found " +
        (if (ng >= 3) "3 or more" else ng.toString))
    val stats = g.select(col("grp"), col("n"),
      (col("s1") / col("n")).as("m"),
      ((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)).as("v"))
    val a = stats.orderBy(col("grp")).limit(1).select(
      col("grp").as("group_a"), col("n").as("na"), col("m").as("ma"), col("v").as("va"))
    val b = stats.orderBy(col("grp").desc).limit(1).select(
      col("grp").as("group_b"), col("n").as("nb"), col("m").as("mb"), col("v").as("vb"))
    val se2 = col("va") / col("na") + col("vb") / col("nb")
    a.crossJoin(b).select(
      col("group_a"), col("group_b"),
      col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
      round(col("ma"), 4).as("mean_a"), round(col("mb"), 4).as("mean_b"),
      round((col("ma") - col("mb")) / sqrt(se2), 4).as("t_stat"),
      round(se2 * se2 / (
        (col("va") / col("na")) * (col("va") / col("na")) / (col("na") - 1) +
        (col("vb") / col("nb")) * (col("vb") / col("nb")) / (col("nb") - 1)), 2).as("dof"),
      (abs((col("ma") - col("mb")) / sqrt(se2)) > 1.96).as("significant"))
  }

  /** CUPED variance reduction (Deng et al. 2013, "Improving the
    * Sensitivity of Online Controlled Experiments by Utilizing Pre-
    * Experiment Data"): adjust each unit's experiment-period metric by its
    * PRE-period covariate, Y' = Y − θ·(X − mean(X)) with
    * θ = cov(X, Y)/var(X) pooled over all units, then run the Welch test
    * on Y'. Same decision, (often far) smaller variance — the standard
    * trick every experimentation platform ships.
    *
    * Period split: the exact integer midpoint of the observed epoch range
    * (the dq_value_drift_ks convention). Units absent from a period
    * contribute 0 (a unit is every `userCol` with ANY event).
    *
    * Determinism contract: per-unit period sums are DECIMAL(18,2)-exact;
    * the pooled moments Σx, Σy, Σxy, Σxx aggregate as DECIMAL(38,4)
    * (exact under reorder) and convert to double ONCE for θ; per-unit
    * adjusted contributions re-enter the variant moments on 1e6/1e4 LONG
    * grids, so every cross-engine sum is integer-exact.
    *
    * Scale shape: two corpus-pass aggregations (per-unit sums, then the
    * unit-keyed moments with map-side partials); everything after the
    * per-unit table is unit-sized; the 1-row moment tables broadcast.
    *
    * Output (one row): theta, n/mean per variant, t on raw Y, t on
    * adjusted Y', and the variance-reduction ratio. */
  def cupedAdjustedTest(ev: DataFrame, userCol: String, valueCol: String,
                        tsCol: String, grp: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec4 = org.apache.spark.sql.types.DecimalType(38, 4)
    val e = ev.where(col(valueCol).isNotNull)
      .withColumn("__ep", unix_timestamp(col(tsCol)))
    val cut = e.agg(expr(
      s"(CAST(floor(min(unix_timestamp($tsCol))) AS BIGINT) + " +
      s"CAST(floor(max(unix_timestamp($tsCol))) AS BIGINT)) div 2").as("cut"))
    val perUser = e.crossJoin(broadcast(cut))
      .groupBy(col(userCol).as("u"))
      .agg(first(grp).as("g"),
        coalesce(sum(when(col("__ep") < col("cut"),
          col(valueCol).cast(dec))), lit(0).cast(dec)).as("x"),
        coalesce(sum(when(col("__ep") >= col("cut"),
          col(valueCol).cast(dec))), lit(0).cast(dec)).as("y"))
    val mom = perUser.agg(count(lit(1)).as("n"),
      sum(col("x").cast(dec4)).as("sx"), sum(col("y").cast(dec4)).as("sy"),
      sum((col("x") * col("y")).cast(dec4)).as("sxy"),
      sum((col("x") * col("x")).cast(dec4)).as("sxx"))
    // zero-variance pre-period (all events share one timestamp, so the
    // midpoint split leaves x identical everywhere) => denominator 0 and
    // theta = 0/0 = NaN, which non-ANSI round/cast would silently turn
    // into wrong adjusted stats. theta=0 degrades CUPED to the raw Welch
    // test — the statistically correct fallback.
    val thDen = (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val theta = when(thDen =!= 0.0,
      (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") / thDen)
      .otherwise(lit(0.0))
    val withAdj = perUser.crossJoin(broadcast(
        mom.select(col("n"), round(theta, 9).as("th"),
          (col("sx").cast("double") / col("n")).as("mx"))))
      .withColumn("yd", col("y").cast("double"))
      .withColumn("yadj",
        col("yd") - col("th") * (col("x").cast("double") - col("mx")))
    // variant moments on integer grids: 1e6 for sums, 1e4 for squares
    val byG = withAdj.groupBy(col("g"))
      .agg(count(lit(1)).as("ng"),
        sum(round(col("yd") * 1e6).cast("long")).as("sy6"),
        sum(round(col("yd") * col("yd") * 1e4).cast("long")).as("syy4"),
        sum(round(col("yadj") * 1e6).cast("long")).as("sa6"),
        sum(round(col("yadj") * col("yadj") * 1e4).cast("long")).as("saa4"))
      .withColumn("m_raw", col("sy6") / 1e6 / col("ng"))
      .withColumn("v_raw", (col("syy4") / 1e4 -
        (col("sy6") / 1e6) * (col("sy6") / 1e6) / col("ng")) / (col("ng") - 1))
      .withColumn("m_adj", col("sa6") / 1e6 / col("ng"))
      .withColumn("v_adj", (col("saa4") / 1e4 -
        (col("sa6") / 1e6) * (col("sa6") / 1e6) / col("ng")) / (col("ng") - 1))
    val a = byG.orderBy(col("g")).limit(1).select(col("g").as("group_a"),
      col("ng").as("na"), col("m_raw").as("mra"), col("v_raw").as("vra"),
      col("m_adj").as("maa"), col("v_adj").as("vaa"))
    val b = byG.orderBy(col("g").desc).limit(1).select(col("g").as("group_b"),
      col("ng").as("nb"), col("m_raw").as("mrb"), col("v_raw").as("vrb"),
      col("m_adj").as("mab"), col("v_adj").as("vab"))
    def tStat(ma: Column, mb: Column, va: Column, vb: Column) =
      (ma - mb) / sqrt(va / col("na") + vb / col("nb"))
    a.crossJoin(b).crossJoin(broadcast(mom.select(round(theta, 6).as("theta"))))
      .select(col("theta"), col("group_a"), col("group_b"),
        col("na").as("n_a"), col("nb").as("n_b"),
        round(col("maa"), 4).as("mean_adj_a"),
        round(col("mab"), 4).as("mean_adj_b"),
        round(tStat(col("mra"), col("mrb"), col("vra"), col("vrb")), 4).as("t_raw"),
        round(tStat(col("maa"), col("mab"), col("vaa"), col("vab")), 4).as("t_adj"),
        round(lit(1.0) - (col("vaa") + col("vab")) / (col("vra") + col("vrb")), 4)
          .as("var_reduction"))
  }

  /** Exact Bayesian A/B on per-unit conversion: Beta(1,1) priors, binomial
    * likelihoods, and the CLOSED-FORM probability the treatment's rate
    * beats control's (Cook's identity for integer-parameter Betas):
    *
    *   P(T > C) = Σ_{k=0}^{aT-1} exp( lnB(aC+k, bC+bT) − ln(bT+k)
    *                                  − lnB(1+k, bT) − lnB(aC, bC) )
    *
    * with a = successes+1, b = failures+1. Every ln-Beta reduces to
    * ln-factorials of INTEGERS (lnB(a,b) = LF(a−1)+LF(b−1)−LF(a+b−1),
    * LF(n) = ln n!), and LF builds as a [[RangePrefix]] running sum of
    * 1e9-gridded ln j — so the whole posterior probability is a sum of
    * exp'd exact integers, replayable cross-engine with no lgamma.
    *
    * Scale shape: one corpus pass to per-unit conversions; the LF table
    * and the k-sum are O(units) rows through running-sum/aggregate shapes
    * (linear, partitioned — the LF lookups are plain shuffled equi-joins,
    * never forced broadcasts); the final fold grids each term to 1e12 and
    * sums LONGs. The exact form REQUIRES total units < ~4e8 (the 1e9-grid
    * LF running sum passes Long.MaxValue there) and raises loudly past it
    * — at that scale the normal approximation is the right tool.
    *
    * Output (one row): n/successes/posterior-mean per variant,
    * p_t_beats_c, and the 95%-decision flag. */
  def bayesAbBeta(ev: DataFrame, userCol: String, grp: Column,
                  converted: Column): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val perUser = ev.groupBy(col(userCol))
      .agg(first(grp).as("g"), max(converted.cast("int")).as("c"))
    val cnt = perUser.agg(
      sum(when(col("g") === "control", 1L).otherwise(0L)).as("nc"),
      sum(when(col("g") === "control", col("c").cast("long")).otherwise(0L)).as("sc"),
      sum(when(col("g") =!= "control", 1L).otherwise(0L)).as("nt"),
      sum(when(col("g") =!= "control", col("c").cast("long")).otherwise(0L)).as("st"))
      .as[(Long, Long, Long, Long)].head()
    val (nc, sc, nt, st) = cnt
    val (aC, bC, aT, bT) = (sc + 1, nc - sc + 1, st + 1, nt - st + 1)
    val maxN = aC + bC + bT + aT // covers every LF argument below
    // Exactness bound: LF(n) = Σ round(ln j · 1e9) reaches ~n·ln(n)·1e9,
    // which passes Long.MaxValue near n ≈ 5e8. Past that the closed form
    // is the wrong tool anyway (use the normal approximation — at 5e8
    // units per arm the posterior is a point mass); fail loudly rather
    // than overflow silently.
    require(maxN < 400000000L,
      s"bayesAbBeta exact form holds to ~4e8 total units (got $maxN); " +
      "use the normal-approximation path at this scale")
    // LF(n) = sum_{j<=n} round(ln j * 1e9), LF(0) = 0 — RangePrefix keeps
    // the prefix scan partitioned at any n
    val lnf = RangePrefix.runningSum(
        RangePrefix.withBucket(
          spark.range(1, maxN + 1).toDF("j"), col("j")),
        round(log(col("j").cast("double")) * 1e9).cast("long"),
        Seq(col("j")), "lf")
      .select(col("j"), col("lf"))
      .unionByName(Seq((0L, 0L)).toDF("j", "lf"))
    // no broadcast hint: lnf is O(units) rows — at real unit counts a
    // forced broadcast blows the driver/broadcast limits. These are
    // linear equi-joins; let them shuffle (AQE still broadcasts small
    // instances on its own).
    def lfAt(key: Column, as: String)(ks: DataFrame): DataFrame =
      ks.join(lnf.withColumnRenamed("lf", as),
        key === col("j"), "left").drop("j")
    // the five k-independent LF constants come from the SAME distributed
    // table (one bounded 5-row collect — no driver-side ln loop to keep
    // in sync, and nothing driver-paced scales with the unit count)
    val constKeys = Seq(bC + bT - 1, aC - 1, bC - 1, aC + bC - 1, bT - 1)
    val lfConst: Map[Long, Long] = lnf
      .where(col("j").isin(constKeys: _*))
      .as[(Long, Long)].collect().toMap
    val const9 = lfConst(bC + bT - 1) -
      (lfConst(aC - 1) + lfConst(bC - 1) - lfConst(aC + bC - 1))
    val terms = spark.range(0, aT).toDF("k")
      .transform(lfAt(col("k") + lit(aC - 1), "lf_a"))
      .transform(lfAt(col("k"), "lf_k"))
      .transform(lfAt(col("k") + lit(bT), "lf_kb"))
      .transform(lfAt(col("k") + lit(aC + bC + bT - 1), "lf_ab"))
      .withColumn("t9",
        col("lf_a") + lit(const9) - col("lf_ab") -
        round(log((col("k") + lit(bT)).cast("double")) * 1e9).cast("long") -
        col("lf_k") - lit(lfConst(bT - 1)) + col("lf_kb"))
      .agg(sum(round(exp(col("t9") / 1e9) * 1e12).cast("long")).as("p12"))
    terms.select(lit(nc).as("n_c"), lit(sc).as("s_c"),
      lit(nt).as("n_t"), lit(st).as("s_t"),
      round(lit((sc + 1).toDouble / (nc + 2)), 6).as("post_mean_c"),
      round(lit((st + 1).toDouble / (nt + 2)), 6).as("post_mean_t"),
      round(col("p12") / 1e12, 4).as("p_t_beats_c"),
      (col("p12") / 1e12 > 0.95 || col("p12") / 1e12 < 0.05).as("decisive_95"))
  }

  /** Sequential (always-valid) A/B monitoring via the mixture SPRT
    * (Johari et al. 2017, "Peeking at A/B Tests"): per observation day t,
    * the two-sample mean difference Δ_t over the CUMULATIVE samples, the
    * normal-mixture likelihood ratio
    *
    *   Λ_t = sqrt(s²_t/(s²_t+τ²)) · exp(Δ²_t·τ²/(2·s²_t·(s²_t+τ²))),
    *
    * with s²_t = σ²·(1/n_c + 1/n_t) (σ² pooled over the whole stream —
    * deterministic), and the always-valid p-value p_t = min(1, 1/max_{u<=t}
    * Λ_u). Unlike the fixed-horizon t-test, p_t is valid at EVERY peek —
    * the test an experimentation platform can stop on any day.
    *
    * Determinism: per-day per-variant sums are DECIMAL-exact; cumulative
    * sums and the running max run over the DAY SPINE (observation-span
    * frame — audited small, the kaplan-meier class); σ² from DECIMAL
    * moments with one double conversion.
    *
    * Output per day: (day, n_c, n_t, delta, lambda, p_always_valid,
    * reject_95). */
  def sequentialMsprtDaily(ev: DataFrame, valueCol: String, grp: Column,
                           tsCol: String, tau: Double = 10.0): DataFrame =
    msprtFinishFromDays(msprtDayState(ev, valueCol, grp, tsCol), tau)

  /** The per-day sufficient statistics behind [[sequentialMsprtDaily]]:
    * (day, dnc, dnt, dsc, dst, ds2) with DECIMAL-exact sums. Every column
    * adds cell-wise, so a STREAMING aggregation building this table in
    * complete mode equals the batch groupBy row-for-row — the mergeable-
    * state law the streaming twin gates on. */
  def msprtDayState(ev: DataFrame, valueCol: String, grp: Column,
                    tsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec4 = org.apache.spark.sql.types.DecimalType(38, 4)
    ev.where(col(valueCol).isNotNull)
      .select(date_trunc("day", col(tsCol)).as("day"), grp.as("g"),
        col(valueCol).cast(dec).as("v"))
      .groupBy(col("day"))
      .agg(sum(when(col("g") === "control", lit(1L)).otherwise(0L)).as("dnc"),
        sum(when(col("g") =!= "control", lit(1L)).otherwise(0L)).as("dnt"),
        coalesce(sum(when(col("g") === "control", col("v").cast(dec4))),
          lit(0).cast(dec4)).as("dsc"),
        coalesce(sum(when(col("g") =!= "control", col("v").cast(dec4))),
          lit(0).cast(dec4)).as("dst"),
        sum((col("v") * col("v")).cast(dec4)).as("ds2"))
  }

  /** The day-spine finish of [[sequentialMsprtDaily]], shared with the
    * streaming twin. Pooled sigma^2 folds from the day table's exact
    * decimal sums (identical to a direct corpus aggregate). */
  def msprtFinishFromDays(byDay: DataFrame, tau: Double): DataFrame = {
    val sig = byDay.agg(sum(col("dnc") + col("dnt")).as("n"),
        sum(col("dsc") + col("dst")).as("s1"), sum(col("ds2")).as("s2"))
      .select(((col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double") / col("n")) /
        (col("n") - 1)).as("sig2"))
    // day-spine-sized cumulative frame (bounded by the observation span)
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = byDay
      .withColumn("nc", sum(col("dnc")).over(w))
      .withColumn("nt", sum(col("dnt")).over(w))
      .withColumn("sc", sum(col("dsc")).over(w))
      .withColumn("st", sum(col("dst")).over(w))
      .where(col("nc") > 0 && col("nt") > 0)
      .crossJoin(broadcast(sig))
      .withColumn("delta", col("st").cast("double") / col("nt") -
        col("sc").cast("double") / col("nc"))
      .withColumn("s2", col("sig2") * (lit(1.0) / col("nc") + lit(1.0) / col("nt")))
      .withColumn("lambda",
        sqrt(col("s2") / (col("s2") + lit(tau * tau))) *
        exp(col("delta") * col("delta") * lit(tau * tau) /
          (lit(2.0) * col("s2") * (col("s2") + lit(tau * tau)))))
    cum
      .withColumn("lmax", max(round(col("lambda"), 9)).over(w))
      .select(col("day"), col("nc").as("n_c"), col("nt").as("n_t"),
        round(col("delta"), 4).as("delta"),
        round(col("lambda"), 4).as("lambda"),
        round(least(lit(1.0), lit(1.0) / col("lmax")), 4).as("p_always_valid"),
        (lit(1.0) / col("lmax") < 0.05).as("reject_95"))
  }

  /** EWMA-smoothed daily counts per key with a deviation flag — the volume
    * drift monitor's trend-following cousin (events_volume_anomaly compares
    * against a global mean; this compares against the recent trend).
    *
    * The trend is the 8-term truncated EWMA of the preceding OBSERVED
    * days only (row-based `lag`: days with zero events are absent from
    * the day aggregation, so a calendar gap is treated as adjacent rows —
    * after an outage the ratio compares against the pre-gap trend, and a
    * collapse-to-zero day never appears as a row to flag; densify the day
    * spine upstream if absence itself must alarm), decay 1/2:
    * `Σ_{j=1..8} x_{t-j}·2^(1-j) / Σ_{j present} 2^(1-j)` —
    * excluding the current day is load-bearing: a trend that includes
    * today self-absorbs the spike it is supposed to flag (a 3× spike
    * lands at ratio ≈1.497 against an inclusive trend — under the 1.5
    * flag). Explicit `lag` terms rather than recursive state make it
    * (a) a bounded window (8 preceding rows, day-count-sized partitions),
    * and (b) EXACT: integer counts times negative powers of two are exact
    * doubles, so both engines compute bit-identical trends pre-round.
    * The first day of a key has no trend: ewma/ratio NULL, not flagged.
    */
  def ewmaDaily(events: DataFrame, keyCol: String, tsCol: String,
                ratioHigh: Double = 1.5): DataFrame = {
    val day = events.groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"))
    ewmaFromDayCounts(day, keyCol, ratioHigh)
  }

  /** [[ewmaDaily]]'s finish from an already-aggregated `(key, day, n)`
    * frame — shared with the streaming variant, whose day counts come out
    * of complete-mode aggregation state (the monitor arithmetic must be
    * IDENTICAL batch vs streamed, and sharing the finish is how that's
    * guaranteed rather than asserted). */
  def ewmaFromDayCounts(day: DataFrame, keyCol: String,
                        ratioHigh: Double = 1.5): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val terms = (1 to 8).map { j =>
      (lag(col("n"), j).over(w), lit(math.pow(0.5, j - 1)))
    }
    val num = terms.map { case (x, c) => coalesce(x.cast("double") * c, lit(0.0)) }
      .reduce(_ + _)
    val den = terms.map { case (x, c) => when(x.isNotNull, c).otherwise(lit(0.0)) }
      .reduce(_ + _)
    val ratio = col("n") / col("ewma_exact") // NULL propagates from day 1
    day.select(col(keyCol), col("day"), col("n"),
        when(den > 0, num / den).as("ewma_exact"))
      .select(col(keyCol), col("day"), col("n"),
        round(col("ewma_exact"), 4).as("ewma"),
        round(ratio, 6).as("ratio"),
        coalesce(ratio > ratioHigh || ratio < 1.0 / ratioHigh, lit(false))
          .as("off_trend"))
  }

  /** Seasonal-naive forecast backtest from a `(key, day, n)` frame: hold
    * out the trailing `horizonDays`, forecast each held-out day as the
    * HISTORY mean for its day-of-week (falling back to the overall history
    * mean when that weekday never occurred), and report per-key MAE against
    * the unconditional-mean baseline — the lift check a capacity-planning
    * pipeline runs before trusting the seasonal model.
    *
    * Scale shape: forecasts are (key × 7)- and key-sized aggregate tables
    * (broadcast); the eval window is a literal date predicate off a 1-row
    * max-day aggregate. Integer day counts make every mean exact-input.
    */
  def seasonalNaiveBacktest(day: DataFrame, keyCol: String,
                            horizonDays: Int = 7): DataFrame = {
    require(horizonDays >= 1)
    val maxd = day.agg(max(col("day")).as("__maxd"))
    val dw = day.crossJoin(broadcast(maxd))
      .withColumn("__dow", expr("weekday(day)").cast("int"))
      .withColumn("__is_eval",
        col("day") > col("__maxd") - expr(s"INTERVAL $horizonDays DAYS"))
    val hist = dw.where(!col("__is_eval"))
    val fDow = hist.groupBy(col(keyCol), col("__dow"))
      .agg(avg(col("n")).as("__f_dow"))
    val fAll = hist.groupBy(col(keyCol)).agg(avg(col("n")).as("__f_all"))
    dw.where(col("__is_eval"))
      .join(fDow, Seq(keyCol, "__dow"), "left")
      .join(fAll, Seq(keyCol))
      .withColumn("__f", coalesce(col("__f_dow"), col("__f_all")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_eval"),
        round(avg(abs(col("n") - col("__f"))), 4).as("mae_seasonal"),
        round(avg(abs(col("n") - col("__f_all"))), 4).as("mae_naive"))
  }

  /** Offline changepoint detection (one level of binary segmentation) from
    * an already-aggregated `(key, day, n)` frame: for every candidate split
    * position i the statistic is
    *
    *   |mean(1..i) − mean(i+1..nd)| · sqrt(i·(nd−i)/nd)
    *
    * — the two-sample mean-shift score whose argmax is the CUSUM
    * changepoint estimate. Every input to the score is an exact integer
    * prefix sum (one per-key ordered window over DAY-sized partitions, not
    * raw rows), so the doubles are exact-input divisions and the argmax is
    * cross-engine stable after rounding; ties break to the earliest day
    * via a (stat, −i) struct max.
    */
  def changepointFromDayCounts(day: DataFrame, keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
    val tot = day.groupBy(col(keyCol))
      .agg(sum(col("n")).as("tot"), count(lit(1)).as("nd"))
    val pre = day
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("n")).over(w))
      .join(tot, Seq(keyCol))
      .where(col("i") < col("nd"))
    val meanL = col("cum").cast("double") / col("i")
    val meanR = (col("tot") - col("cum")).cast("double") / (col("nd") - col("i"))
    val scored = pre.select(col(keyCol), col("day"), col("i"),
      round(abs(meanL - meanR) *
        sqrt(col("i") * (col("nd") - col("i")) / col("nd")), 4).as("stat"),
      round(meanL, 4).as("mean_before"),
      round(meanR, 4).as("mean_after"))
    scored.groupBy(col(keyCol))
      .agg(max_by(
        struct(col("day").as("split_day"), col("stat"),
          col("mean_before"), col("mean_after")),
        struct(col("stat"), (-col("i")).as("ni"))).as("__best"))
      .select(col(keyCol), col("__best.split_day").as("split_day"),
        col("__best.stat").as("stat"),
        col("__best.mean_before").as("mean_before"),
        col("__best.mean_after").as("mean_after"))
  }

  /** One-sided (upward) CUSUM drift monitor over per-key day counts (Page
    * 1954): S_t = max(0, S_{t−1} + (x_t − μ − k)) flags a sustained small
    * shift long before a per-day z-score does. The recursion is computed
    * in its PREFIX form S_t = P_t − min_{j≤t} P_j with
    * P_t = Σ(x − μ − k) — two cumulative frames on the per-key day spine
    * (key-partitioned windows, bounded by the observation span), never a
    * corpus window and never a driver loop.
    *
    * Determinism: μ and σ come from exact per-key sums and round to 6;
    * slack k = slackSigma·σ and threshold h = threshSigma·σ round to 6;
    * per-day terms grid to 1e6 LONGs so both cumulative frames and the
    * threshold comparison are integer-exact.
    *
    * Output: (key, day, n, cusum, drifted). */
  def cusumFromDayCounts(day: DataFrame, keyCol: String,
                         slackSigma: Double = 0.5,
                         threshSigma: Double = 4.0): DataFrame = {
    val stats = day.groupBy(col(keyCol))
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      .select(col(keyCol),
        round(col("s1").cast("double") / col("nd"), 6).as("mu"),
        round(sqrt((col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") / col("nd")) /
          (col("nd") - 1)), 6).as("sigma"))
      .select(col(keyCol), col("mu"),
        round(lit(slackSigma) * col("sigma"), 6).as("k"),
        round(lit(threshSigma) * col("sigma"), 6).as("h"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    day.join(broadcast(stats), Seq(keyCol))
      .withColumn("d6", round((col("n") - col("mu") - col("k")) * 1e6)
        .cast("long"))
      .withColumn("p6", sum(col("d6")).over(w))
      .withColumn("m6", least(min(col("p6")).over(w), lit(0L)))
      .select(col(keyCol), col("day"), col("n"),
        round((col("p6") - col("m6")) / 1e6, 6).as("cusum"),
        (col("p6") - col("m6") > round(col("h") * 1e6).cast("long"))
          .as("drifted"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * P(next event type | current), with counts. Sequence order is
    * (`tsCol`, `idCol`) — the unique tiebreak that makes `lead`
    * deterministic across engines. One window pass (user-partitioned, so
    * partitions are user-history-sized) + one keyed agg.
    */
  def transitionMatrix(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    val pairs = events
      .select(col(userCol), col(typeCol).as("cur"),
        lead(col(typeCol), 1).over(w).as("nxt"))
      .where(col("nxt").isNotNull)
    val cnt = pairs.groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy(col("cur")).agg(sum(col("n")).as("tot"))
    cnt.join(broadcast(tot), "cur")
      .select(col("cur"), col("nxt"), col("n"),
        round(col("n").cast("double") / col("tot"), 6).as("p"))
  }

  /** KMV (bottom-k / theta-style) sketch estimate of two key sets' union
    * and intersection cardinality, with the exact values alongside — the
    * join-size estimation primitive a planner consults before choosing a
    * strategy, and the set-overlap profiler for 100 TB key columns.
    *
    * Mechanics: each side's sketch is the k smallest md5 draws over its
    * DISTINCT keys; the union's bottom-k is the bottom-k of the sketch
    * union (closure under union is what makes KMV mergeable state — the
    * same argument as the MinHash/HLL inventory in PLANS.md). With t =
    * the k-th smallest union hash as a fraction of hash space:
    * `|A∪B| ≈ (k-1)/t`, and `|A∩B| ≈ ρ/t` where ρ counts common sketch
    * hashes below t. All estimator arithmetic is integer-over-exact-
    * fraction, so both engines compute identical doubles pre-round.
    *
    * Scale shape: bottom-k = TakeOrdered (map-side partial bottom-k per
    * partition, k-bounded merge — the sketch build IS the shuffle-light
    * path); the exact audit columns are one distinct-count per side plus
    * one semi-join (the `auditExact` pattern — estimates serve at scale,
    * the audit proves them honest at gate SF).
    */
  def kmvJoinEstimate(left: DataFrame, leftKey: Column,
                      right: DataFrame, rightKey: Column,
                      k: Int, salt: String): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    def hashes(df: DataFrame, key: Column) =
      df.select(md5(concat(key.cast("string"), lit(":" + salt))).as("h")).distinct()
    def bottomK(df: DataFrame) = df.orderBy(col("h")).limit(k)
    val sA = bottomK(hashes(left, leftKey)).localCheckpoint()
    val sB = bottomK(hashes(right, rightKey)).localCheckpoint()
    val sU = bottomK(sA.union(sB).distinct())
    // UNDERFULL sketch (fewer than k distinct union hashes): the sketch
    // holds the whole set — the estimate IS the count, and t = 1.0 makes
    // the intersection threshold a no-op (every 8-hex fraction < 1).
    val t = sU.agg(count(lit(1)).as("nu"), max(col("h")).as("tk"))
      .select(col("nu"),
        when(col("nu") < k, lit(1.0))
          .otherwise(conv(substring(col("tk"), 1, 8), 16, 10).cast("double")
            / lit(4294967296.0)).as("t"))
    val rho = sA.join(sB, "h").crossJoin(broadcast(t))
      .where(conv(substring(col("h"), 1, 8), 16, 10).cast("double")
        / lit(4294967296.0) < col("t"))
      .agg(count(lit(1)).as("rho"))
    val exact = {
      val ka = left.select(leftKey.as("key")).distinct()
      val kb = right.select(rightKey.as("key")).distinct()
      ka.agg(count(lit(1)).as("n_a"))
        .crossJoin(kb.agg(count(lit(1)).as("n_b")))
        .crossJoin(ka.join(kb, "key").agg(count(lit(1)).as("n_inter")))
    }
    t.crossJoin(rho).crossJoin(exact)
      .select(lit(k).as("k"),
        round(when(col("nu") < k, col("nu").cast("double"))
          .otherwise(lit(k - 1) / col("t")), 2).as("union_est"),
        (col("n_a") + col("n_b") - col("n_inter")).as("union_exact"),
        round(col("rho") / col("t"), 2).as("inter_est"),
        col("n_inter").as("inter_exact"))
  }

  /** Association rules over implicit baskets: support / confidence / lift
    * for every unordered item pair that co-occurs in at least `minPairs`
    * baskets. `basketCols` defines the basket key (e.g. user × day), items
    * are deduplicated within a basket first (presence, not multiplicity).
    *
    * Scale shape: the pair join is keyed on the BASKET, and each side is
    * the deduplicated item set — fan-out per basket is |items|², bounded
    * by the item vocabulary (event types, not raw events). Item and basket
    * totals are item-vocabulary-sized broadcasts.
    */
  def marketBasket(df: DataFrame, basketCols: Seq[String], itemCol: String,
                   minPairs: Long = 1L): DataFrame = {
    val bk = basketCols.map(col)
    val items = df.select(bk :+ col(itemCol).as("item"): _*).distinct()
    val nBaskets = items.select(bk: _*).distinct().count().toDouble
    val itemN = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val l = items.select(bk :+ col("item").as("item_a"): _*)
    val r = items.select(bk :+ col("item").as("item_b"): _*)
    val pairs = l.join(r, basketCols)
      .where(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b")).agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairs)
    pairs
      .join(broadcast(itemN.select(col("item").as("item_a"), col("n_item").as("n_a"))), "item_a")
      .join(broadcast(itemN.select(col("item").as("item_b"), col("n_item").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"),
        round(col("n_ab") / lit(nBaskets), 6).as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6).as("confidence"),
        round(col("n_ab") * lit(nBaskets) / (col("n_a") * col("n_b")), 6).as("lift"))
  }

  /** Isotonic regression over an ordered bin table — PAVA's result
    * computed EXACTLY via the minimax identity instead of the sequential
    * pool-adjacent-violators loop:
    *
    *   iso_i = max_{j <= i} min_{k >= i} mean(j..k),
    *   mean(j..k) = Σ_{b in [j,k]} pos_b / Σ_{b in [j,k]} n_b
    *
    * — the closed form of the isotonic fit (Robertson/Wright/Dykstra),
    * which makes the whole fit three joins over the bin table: interval
    * sums (bins² rows), the per-(i, j) min over k, the per-i max over j.
    * All interval means are exact integer ratios. The input is a BIN
    * table (the reliability-diagram cadence: bins are model-sized), so
    * every frame here is bins²/bins³-bounded — never the corpus.
    * Output: the input bins + `iso` (round-6 isotonic-calibrated rate),
    * non-decreasing in `binCol` by construction. */
  def isotonicBins(bins: DataFrame, binCol: String, nCol: String,
                   posCol: String): DataFrame = {
    val b = bins.select(col(binCol).as("__b"), col(nCol).as("__n"),
      col(posCol).as("__p"))
    // all three non-equi joins are bins-/bins²-sized: broadcast them so the
    // plan is BroadcastNestedLoopJoin, never a CartesianProduct
    val intervals = b.select(col("__b").as("__j"))
      .crossJoin(broadcast(b.select(col("__b").as("__k"))))
      .where(col("__j") <= col("__k"))
      .join(broadcast(b), col("__b").between(col("__j"), col("__k")))
      .groupBy(col("__j"), col("__k"))
      .agg((sum(col("__p")).cast("double") / sum(col("__n"))).as("__mean"))
    val inner = b.select(col("__b").as("__i"))
      .join(broadcast(intervals), col("__j") <= col("__i") && col("__k") >= col("__i"))
      .groupBy(col("__i"), col("__j"))
      .agg(min(col("__mean")).as("__mn"))
      .groupBy(col("__i"))
      .agg(round(max(col("__mn")), 6).as("iso"))
    bins.join(inner, col(binCol) === col("__i")).drop("__i")
  }

  /** Benjamini–Hochberg step-up FDR correction over a family of m
    * hypotheses (one row each, a precomputed p-value column): rank p
    * ascending, find the LARGEST rank k with p_(k) <= k/m * q, reject
    * hypotheses ranked 1..k. The step-up cutoff is what distinguishes BH
    * from a naive per-row threshold: a hypothesis with p above its own
    * critical value is still rejected when a later rank passes.
    *
    * `tieCols` break p-value ties so ranks are total and deterministic.
    * Scale shape: the input is a HYPOTHESIS table (one row per test —
    * model-sized, never the underlying data), so the rank window over m
    * rows and the one-row cutoff aggregate (re-entering via broadcast
    * cross join) are both bounded by the number of tests, not the corpus.
    * Returns the input columns + (rank, bh_critical, reject). */
  def bhFdr(tests: DataFrame, pCol: String, tieCols: Seq[String],
            q: Double): DataFrame = {
    require(q > 0.0 && q < 1.0, s"q in (0,1), got $q")
    val w = Window.orderBy(col(pCol) +: tieCols.map(col): _*)
    // m rides the hypothesis-table window as count(*) over the unbounded
    // frame — no eager build-time count job (r7 VERDICT nit); an empty
    // table yields an empty result rather than a require.
    val ranked = tests
      .withColumn("rank", row_number().over(w))
      .withColumn("__m", count(lit(1)).over(
        Window.orderBy(col(pCol) +: tieCols.map(col): _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("bh_critical",
        round(col("rank").cast("double") * q / col("__m"), 6))
    val cutoff = ranked
      .agg(coalesce(max(when(col(pCol) <= col("rank") * lit(q) / col("__m"),
        col("rank"))), lit(0)).as("__cut"))
    ranked.crossJoin(broadcast(cutoff))
      .withColumn("reject", col("rank") <= col("__cut"))
      .drop("__cut", "__m")
  }

  /** Delta-method z-test for a RATIO metric when the randomization unit
    * (user) differs from the analysis unit (event) — Deng, Knoblich & Lu
    * 2018, "Applying the Delta Method in Metric Analytics". Events cluster
    * within users, so treating per-event values as iid understates the
    * variance; the correct estimator works from per-USER numerator /
    * denominator sums (Xᵢ, Yᵢ):
    *
    *   R_g = ΣX/ΣY,   var(R_g) ≈ (s²_x − 2R·s_xy + R²·s²_y) / (n·ȳ²)
    *
    * Determinism contract: per-user X sums are DECIMAL(18,2)-exact and Y
    * is a count; the group moments (Σx, Σy, Σxy, Σxx, Σyy) aggregate as
    * DECIMAL(38,4)/LONG (exact under reorder) and convert to double ONCE;
    * each group's ratio is gridded to 1e-9 before it re-enters the
    * variance formula, so both engines fold identical doubles.
    *
    * Scale shape: one corpus pass to the per-user table (map-side
    * partials), one unit-keyed moment aggregation, then everything is a
    * 2-row table. Nothing driver-paced, no window over raw rows.
    *
    * `grp` must take exactly two values; they order lexicographically
    * (group_a < group_b) so the sign of `diff`/`z_stat` is deterministic.
    * Output (one row): groups, unit counts, per-group ratio, diff, the
    * delta-method se, z, and the 95% flag. */
  def ratioDeltaTest(ev: DataFrame, userCol: String, valueCol: String,
                     grp: Column): DataFrame =
    ratioDeltaFromUnits(ratioUnitState(ev, userCol, valueCol, grp))

  /** The per-unit sufficient-statistics table behind [[ratioDeltaTest]]:
    * (u, g, x = Σvalue DECIMAL-exact, y = event count). Cell-wise addable,
    * so it doubles as streaming aggregation state (complete mode) — the
    * streamed table equals the batch groupBy and feeds the SAME finisher,
    * which is exactly how a platform monitors a ratio metric live. */
  def ratioUnitState(ev: DataFrame, userCol: String, valueCol: String,
                     grp: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    ev.where(col(valueCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(first(grp).as("g"),
        coalesce(sum(col(valueCol).cast(dec)), lit(0).cast(dec)).as("x"),
        count(lit(1)).as("y"))
  }

  /** [[ratioDeltaTest]]'s finisher over a (u, g, x, y) unit table —
    * batch and streaming share it verbatim. */
  def ratioDeltaFromUnits(perUser: DataFrame): DataFrame = {
    val dec4 = org.apache.spark.sql.types.DecimalType(38, 4)
    val byG = perUser.groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec4)).as("sx"), sum(col("y")).as("sy"),
        sum((col("x") * col("x")).cast(dec4)).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum((col("x") * col("y")).cast(dec4)).as("sxy"))
    // moments -> doubles once; ratio gridded to 1e-9 before reuse so the
    // variance polynomial folds identical doubles on both engines
    val d = byG.select(col("g"), col("n"), col("sy"),
      round(col("sx").cast("double") / col("sy").cast("double"), 9).as("r9"),
      (col("sy").cast("double") / col("n")).as("ybar"),
      ((col("sxx").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") / col("n")) /
        (col("n") - 1)).as("vx"),
      ((col("syy").cast("double") -
        col("sy").cast("double") * col("sy").cast("double") / col("n")) /
        (col("n") - 1)).as("vy"),
      ((col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double") / col("n")) /
        (col("n") - 1)).as("cxy"))
    val v = d.select(col("g"), col("n"), col("r9"),
      ((col("vx") - lit(2) * col("r9") * col("cxy") +
        col("r9") * col("r9") * col("vy")) /
        (col("n") * col("ybar") * col("ybar"))).as("vr"))
    val a = v.orderBy(col("g")).limit(1).select(col("g").as("group_a"),
      col("n").as("n_a"), col("r9").as("ra"), col("vr").as("va"))
    val b = v.orderBy(col("g").desc).limit(1).select(col("g").as("group_b"),
      col("n").as("n_b"), col("r9").as("rb"), col("vr").as("vb"))
    a.crossJoin(b).select(
      col("group_a"), col("group_b"), col("n_a"), col("n_b"),
      round(col("ra"), 6).as("ratio_a"), round(col("rb"), 6).as("ratio_b"),
      round(col("rb") - col("ra"), 6).as("diff"),
      round(sqrt(col("va") + col("vb")), 6).as("se"),
      round((col("rb") - col("ra")) / sqrt(col("va") + col("vb")), 4)
        .as("z_stat"),
      (abs((col("rb") - col("ra")) / sqrt(col("va") + col("vb"))) > 1.96)
        .as("significant"))
  }

  /** Delete-one-GROUP (bucketed) jackknife for a ratio metric — the
    * variance estimator large platforms actually run at scale (per-unit
    * jackknife is O(n) re-estimates; bucketed jackknife is O(B)). Units
    * hash into B buckets by md5; each leave-one-bucket-out ratio
    * R₍b₎ = (ΣX − Σx_b)/(ΣY − Σy_b), and
    *
    *   var_jk = (B−1)/B · Σ_b (R₍b₎ − R̄)²
    *
    * Determinism contract: per-user and per-bucket sums are DECIMAL/LONG
    * exact; each R₍b₎ lands on a 1e9 integer grid, the squared deviations
    * on a 1e12 grid, so the fold is integer-exact on both engines.
    *
    * Scale shape: corpus pass → per-user table → B-row bucket table; the
    * 1-row totals broadcast back; every later step is B-sized.
    *
    * Output (one row): the full-sample ratio, the jackknife se, the 95%
    * normal CI, bucket and unit counts. */
  def jackknifeRatio(ev: DataFrame, userCol: String, valueCol: String,
                     buckets: Int = 16): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val perUser = ev.where(col(valueCol).isNotNull)
      .groupBy(col(userCol).as("u"))
      .agg(coalesce(sum(col(valueCol).cast(dec)), lit(0).cast(dec)).as("x"),
        count(lit(1)).as("y"))
    jackknifeFromUnits(perUser, buckets)
  }

  /** [[jackknifeRatio]]'s finisher over a (u, x, y) unit table — batch and
    * the streamed-unit-state twin share it verbatim (the unit table is
    * cell-wise-addable streaming aggregation state, like
    * [[ratioUnitState]]'s). */
  def jackknifeFromUnits(perUser: DataFrame, buckets: Int = 16): DataFrame = {
    require(buckets >= 2, s"need >= 2 jackknife buckets, got $buckets")
    val dec4 = org.apache.spark.sql.types.DecimalType(38, 4)
    val bucketed = perUser.withColumn("b",
      pmod(conv(substring(md5(col("u").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(buckets)))
    val byB = bucketed.groupBy(col("b"))
      .agg(sum(col("x").cast(dec4)).as("sxb"), sum(col("y")).as("syb"))
    val tot = byB.agg(sum(col("sxb")).as("tsx"), sum(col("syb")).as("tsy"),
      count(lit(1)).as("nb"))
    val users = perUser.agg(count(lit(1)).as("n_users"))
    val loo = byB.crossJoin(broadcast(tot))
      .select(col("nb"), col("tsx"), col("tsy"),
        round(round((col("tsx") - col("sxb")).cast("double") /
          (col("tsy") - col("syb")).cast("double"), 9) * 1e9)
          .cast("long").as("ri"))
    val m = loo.groupBy(col("nb"), col("tsx"), col("tsy"))
      .agg(sum(col("ri")).as("sri"))
    val ss = loo.crossJoin(broadcast(m.select(col("sri"))))
      .select(col("nb"), col("tsx"), col("tsy"),
        (col("ri") / 1e9 - col("sri") / (col("nb") * lit(1e9))).as("dv"))
      .groupBy(col("nb"), col("tsx"), col("tsy"))
      .agg(sum(round(col("dv") * col("dv") * 1e12).cast("long")).as("sq"))
    ss.crossJoin(broadcast(users)).select(
      round(col("tsx").cast("double") / col("tsy").cast("double"), 6)
        .as("ratio"),
      round(sqrt((col("nb") - 1) * lit(1.0) / col("nb") *
        (col("sq") / 1e12)), 6).as("jk_se"),
      round(round(col("tsx").cast("double") / col("tsy").cast("double"), 9) -
        lit(1.96) * sqrt((col("nb") - 1) * lit(1.0) / col("nb") *
          (col("sq") / 1e12)), 6).as("ci_low"),
      round(round(col("tsx").cast("double") / col("tsy").cast("double"), 9) +
        lit(1.96) * sqrt((col("nb") - 1) * lit(1.0) / col("nb") *
          (col("sq") / 1e12)), 6).as("ci_high"),
      col("nb").as("n_buckets"), col("n_users"))
  }

  /** Fisher-style permutation (randomization) test on a per-unit metric:
    * re-assign every unit to a variant under B deterministic md5-derived
    * relabelings, recompute the mean difference under each, and report
    *
    *   p = (1 + #{|diff_perm| ≥ |diff_obs|}) / (B + 1)
    *
    * — the exact finite-sample test that needs NO normality or variance
    * assumptions, the standard cross-check when a t-test's assumptions
    * are in doubt. Relabelings are md5(unit ':' permId) parity, so both
    * engines draw the identical permutation set.
    *
    * Determinism contract: per-unit sums DECIMAL-exact; each permutation's
    * mean difference grids to 1e9 integers before the ≥ comparison, so
    * the extreme-count is an integer comparison on both engines.
    * Permutations that leave a side empty are dropped from the count
    * (practically impossible beyond toy unit counts).
    *
    * Scale shape: ONE corpus pass to the per-unit table; the B-fold blowup
    * rides the unit table (already corpus-reduced), labels are pure
    * hashes (no extra shuffle to assign), and the per-permutation
    * aggregation is a single hash-agg keyed by permId — embarrassingly
    * parallel, nothing driver-paced grows with B or units.
    *
    * Output (one row): groups, observed diff (b − a), B, extreme count,
    * p-value. */
  def permutationTest(ev: DataFrame, userCol: String, valueCol: String,
                      grp: Column, permutations: Int = 64): DataFrame = {
    require(permutations >= 1, s"need >= 1 permutations, got $permutations")
    val spark = ev.sparkSession
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val dec4 = org.apache.spark.sql.types.DecimalType(38, 4)
    val e = ev.where(col(valueCol).isNotNull)
    val perUser = e.groupBy(col(userCol).as("u"))
      .agg(first(grp).as("g"),
        coalesce(sum(col(valueCol).cast(dec)), lit(0).cast(dec)).as("x"))
    val og = perUser.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x").cast(dec4)).as("sx"))
    val oa = og.orderBy(col("g")).limit(1)
      .select(col("g").as("group_a"), col("n").as("n_a"), col("sx").as("sxa"))
    val ob = og.orderBy(col("g").desc).limit(1)
      .select(col("g").as("group_b"), col("n").as("n_b"), col("sx").as("sxb"))
    val obs = oa.crossJoin(ob).select(col("group_a"), col("group_b"),
      round(round(col("sxb").cast("double") / col("n_b") -
        col("sxa").cast("double") / col("n_a"), 9) * 1e9)
        .cast("long").as("di"))
    val grid = spark.range(0, permutations.toLong).toDF("p")
    val labeled = perUser.crossJoin(broadcast(grid))
      .select(col("p"), col("x"),
        pmod(conv(substring(md5(concat(col("u").cast("string"), lit(":"),
          col("p").cast("string"))), 1, 8), 16, 10).cast("long"), lit(2))
          .as("lbl"))
    val perPerm = labeled.groupBy(col("p"))
      .agg(sum(when(col("lbl") === 1, col("x").cast(dec4))).as("s1"),
        sum(when(col("lbl") === 0, col("x").cast(dec4))).as("s0"),
        sum(when(col("lbl") === 1, 1).otherwise(0)).as("n1"),
        sum(when(col("lbl") === 0, 1).otherwise(0)).as("n0"))
      .where(col("n1") > 0 && col("n0") > 0)
      .select(abs(round(round(col("s1").cast("double") / col("n1") -
        col("s0").cast("double") / col("n0"), 9) * 1e9).cast("long"))
        .as("adi"))
    val ext = perPerm.crossJoin(broadcast(obs.select(col("di"))))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(col("adi") >= abs(col("di")), 1).otherwise(0))
          .cast("long").as("n_extreme"))
    obs.crossJoin(broadcast(ext)).select(
      col("group_a"), col("group_b"),
      round(col("di") / 1e9, 6).as("diff_obs"),
      col("n_perms"), col("n_extreme"),
      round((lit(1) + col("n_extreme")) * lit(1.0) / (col("n_perms") + 1), 6)
        .as("p_value"))
  }
}
