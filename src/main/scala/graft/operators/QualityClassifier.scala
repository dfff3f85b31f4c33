package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Embedder

/** Model-based quality filtering — the "quality classifier" stage of the
  * GPT-3/PaLM/LLaMA data recipes (score every document with a cheap linear
  * model trained offline; keep by threshold or importance-sample by score).
  * The engine-side contract is inference, not training: a LOGISTIC scorer
  * over the hashing-trick features of [[Embedder.hashedComponents]], with
  * the weight vector arriving as a dim-row model table.
  *
  * Scale shape: features are the sparse (id, bucket, component) frame
  * (map-side-combined, ≤ dim rows per doc); the model table BROADCASTS
  * into the feature join; the margin is one id-keyed partial-agg sum.
  * One shuffle total, carrying ≤ docs × dim tiny rows — the fasttext-style
  * classifier pass at corpus scale.
  *
  * Determinism: components are already rounded (4) by the embedder; the
  * margin rounds to 6 (cross-row sum order is engine-arbitrary; ≤ dim
  * terms keep the noise ~1e-16, ten orders under the grid) and the
  * probability to 4. `weightsFor` synthesizes the default model from
  * md5(salt#bucket) — uniform in [-0.5, 0.5), round 6, division by 2^32
  * exact — so a gate oracle rebuilds the identical model; production
  * callers pass their trained weights as `weights`.
  */
object QualityClassifier {

  /** Deterministic synthetic model: (bucket, w) with w uniform in
    * [-0.5, 0.5) from md5(salt#bucket). */
  def weightsFor(df: DataFrame, dim: Int, salt: String): DataFrame = {
    val spark = df.sparkSession
    spark.range(dim).select(col("id").cast("int").as("bucket"),
      round(
        conv(substring(md5(concat(lit(salt + "#"), col("id").cast("string"))), 1, 8), 16, 10)
          .cast("double") / 4294967296.0 - 0.5, 6).as("w"))
  }

  /** FULL-BATCH gradient-descent training of the logistic classifier —
    * the training half [[score]]'s contract deliberately omits, expressed
    * the portable-Lloyd way: per-step state (the `dim` weights) is
    * collected (model-sized — the KMeans/BPE cadence), updated in driver
    * arithmetic with round-6 HALF_UP re-quantization, and re-broadcast;
    * each step is ONE feature join + one doc-keyed margin aggregate + one
    * bucket-keyed gradient aggregate. The round-6 state quantization (and
    * the round-6 margin, mirroring [[score]]) is what makes the whole
    * training run oracle-replayable as unrolled CTE steps.
    *
    * Returns the trained (bucket, w) model table, directly usable as
    * [[score]]'s `weights` argument.
    *
    * `precomputed` lets a train-then-score pipeline build the hashed
    * feature table ONCE (it must be [[Embedder.hashedComponents]] output,
    * already materialized) — the feature build is the corpus-scan half of
    * the cost, and an eval query otherwise pays it twice.
    */
  def trainLogReg(df: DataFrame, textCol: String, idCol: String,
                  label: Column, dim: Int = 64,
                  seed: Int = Embedder.DefaultSeed, steps: Int = 3,
                  eta: Double = 1.0,
                  precomputed: Option[DataFrame] = None): DataFrame = {
    require(steps >= 1 && dim >= 1)
    val spark = df.sparkSession
    val comps = precomputed.getOrElse(
      Embedder.hashedComponents(df, textCol, idCol, dim, seed)
        .localCheckpoint())
    val labels = df.select(col(idCol).as("id"),
      when(label, 1.0).otherwise(0.0).as("y"))
    val n = comps.select(col("id")).distinct().count().toDouble
    var w = Array.fill(dim)(0.0)
    // Grid discipline: margins are GridSum fixed-point sums (per-id,
    // dim-bounded — exactly order-independent, so the round-6 can never
    // be decided by fold order); per-row residuals round to 6 (absorbs
    // cross-engine exp() ulps); the per-bucket GRADIENT is a corpus-sized
    // cross-row sum, so its terms quantize onto the 1e-10 grid and sum as
    // DECIMAL(38,0) scaled integers (long would overflow at corpus
    // scale), with the round-8 step division done on the exact collected
    // integer — the Pca.componentSums contract.
    def rnd(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to steps) {
      import spark.implicits._
      val wDf = w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("bucket", "w")
      val margins = comps.join(broadcast(wDf), "bucket")
        .groupBy(col("id"))
        .agg(graft.functions.GridSum.gridRoundedSum(
          col("component") * col("w"), 10, 6).as("m"))
      val grad = margins.join(labels, "id")
        .withColumn("pmy",
          round(lit(1.0) / (lit(1.0) + exp(-col("m"))) - col("y"), 6))
        .join(comps, "id")
        .groupBy(col("bucket"))
        .agg(sum(round(col("pmy") * col("component") * lit(1e10), 0)
          .cast("decimal(38,0)")).as("g"))
        .collect().map(r => r.getInt(0) ->
          BigInt(r.getDecimal(1).toBigInteger)).toMap
      w = w.zipWithIndex.map { case (v, b) =>
        val g = grad.getOrElse(b, BigInt(0)).toDouble / 1e10
        rnd(v - rnd(eta * g / n, 8), 6)
      }
    }
    import spark.implicits._
    w.zipWithIndex.map { case (v, b) => (b, v) }.toSeq.toDF("bucket", "w")
  }

  /** Platt scaling (Platt 1999): fit p = σ(a·s + b) on (score, label) by
    * `steps` full Newton iterations — the parametric calibration method
    * next to the isotonic bins and the ECE diagnostic; two parameters, so
    * the Hessian inverts in closed form.
    *
    * Grid discipline (the [[trainLogReg]] contract): per-row probabilities
    * round to 6 (absorbs cross-engine exp ulps); the five sufficient
    * sums (∇ and the 2×2 Hessian) quantize onto the 1e-10 grid and sum as
    * DECIMAL(38,0) scaled integers; each Newton delta rounds to 8 and the
    * parameters to 6 — the whole fit is replayable step by step.
    *
    * Scale shape: `steps` corpus passes of 5-column map-side-combined
    * aggregation (1-row collects, Lloyd cadence), one final pass for the
    * before/after log-loss. Probabilities clamp to [1e-4, 1−1e-4] inside
    * the loss so a confidently-wrong row cannot produce ±Inf.
    *
    * Output (one row): a, b, n, logloss_raw (uncalibrated σ(s)),
    * logloss_platt. */
  def plattScale(scored: DataFrame, scoreCol: String, labelCol: String,
                 steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 5, s"steps in [1,5], got $steps")
    val s = col(scoreCol)
    val y = col(labelCol)
    def rnd(x: Double, sc: Int): Double =
      BigDecimal(x).setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    def gsum(c: Column) =
      sum(round(c * lit(1e10), 0).cast("decimal(38,0)"))
    var a = 0.0
    var b = 0.0
    for (_ <- 1 to steps) {
      val p = round(lit(1.0) / (lit(1.0) + exp(-(lit(a) * s + lit(b)))), 6)
      val pmy = p - y
      val wgt = round(p * (lit(1.0) - p), 6)
      val r = scored.agg(
        gsum(pmy * s).as("ga"), gsum(pmy).as("gb"),
        gsum(wgt * s * s).as("haa"), gsum(wgt * s).as("hab"),
        gsum(wgt).as("hbb")).head()
      def d(i: Int): Double =
        BigInt(r.getDecimal(i).toBigInteger).toDouble / 1e10
      val (ga, gb, haa, hab, hbb) = (d(0), d(1), d(2), d(3), d(4))
      val da = (hbb * ga - hab * gb) / (haa * hbb - hab * hab)
      val db = (haa * gb - hab * ga) / (haa * hbb - hab * hab)
      a = rnd(a - rnd(da, 8), 6)
      b = rnd(b - rnd(db, 8), 6)
    }
    def clamp(c: Column): Column =
      greatest(least(c, lit(0.9999)), lit(0.0001))
    val praw = clamp(round(lit(1.0) / (lit(1.0) + exp(-s)), 4))
    val pcal = clamp(round(lit(1.0) / (lit(1.0) + exp(-(lit(a) * s + lit(b)))), 4))
    scored.agg(count(lit(1)).as("n"),
        round(avg(-y * log(praw) - (lit(1.0) - y) * log(lit(1.0) - praw)), 4)
          .as("logloss_raw"),
        round(avg(-y * log(pcal) - (lit(1.0) - y) * log(lit(1.0) - pcal)), 4)
          .as("logloss_platt"))
      .select(lit(a).as("a"), lit(b).as("b"), col("n"),
        col("logloss_raw"), col("logloss_platt"))
  }

  /** Per-document logistic score: (idCol, margin, quality_prob, keep).
    * `keep` thresholds the ROUNDED probability at 0.5 so the verdict is
    * engine-stable. */
  def score(df: DataFrame, textCol: String, idCol: String,
            dim: Int = 64, seed: Int = Embedder.DefaultSeed,
            weights: Option[DataFrame] = None,
            weightSalt: String = "qw",
            precomputed: Option[DataFrame] = None): DataFrame = {
    val comps = precomputed.getOrElse(
      Embedder.hashedComponents(df, textCol, idCol, dim, seed))
    val w = weights.getOrElse(weightsFor(df, dim, weightSalt))
    comps.join(broadcast(w), "bucket")
      .groupBy(col("id"))
      // GridSum: the margin round-6 must not depend on summation order
      .agg(graft.functions.GridSum.gridRoundedSum(
        col("component") * col("w"), 10, 6).as("margin"))
      .select(col("id").as(idCol), col("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 4).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= 0.5)
  }
}
