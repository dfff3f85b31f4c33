package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `rand(seed)` is reproducible only within one Spark version/partitioning;
  * a content-hash Bernoulli draw is reproducible across engines, runs, and
  * repartitions — the property that matters when a held-out split must stay
  * held-out across months of pipeline runs at 100 TB. The draw is the first
  * `digits` hex chars of md5(key || ':' || salt) compared lexicographically
  * against a per-rate threshold (lowercase-hex lexicographic == unsigned
  * numeric, so the compare is exact); changing the salt yields an
  * independent draw. Zero shuffles: pure per-row predicate, fully pushed
  * into the scan.
  *
  * The reference keys rows by content hashes the same way (sha1 row keys,
  * reference modules/utilities.py:344); this extends that determinism to
  * subset selection.
  */
object Sampling {

  /** Uniform hash draw in [0, 1) as `digits` lowercase hex chars. */
  def hashDraw(key: Column, salt: String, digits: Int = 8): Column =
    substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, digits)

  /** Threshold string such that (draw < threshold) keeps ~`rate` of rows.
    * rate >= 1 returns "g", which is > every hex string of any length —
    * keep-everything without a special case. */
  def hexThreshold(rate: Double, digits: Int = 8): String = {
    require(rate >= 0.0, s"rate must be >= 0, got $rate")
    require(digits >= 1 && digits <= 15, s"digits must be in [1,15], got $digits")
    val space = math.pow(16, digits).toLong
    val t = (BigDecimal(rate) * BigDecimal(space)).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    if (t >= space) "g" else s"%0${digits}x".format(t)
  }

  /** Keep ~`rate` of rows, deterministically by `key`. */
  def bernoulli(df: DataFrame, key: Column, rate: Double, salt: String): DataFrame =
    df.where(hashDraw(key, salt) < lit(hexThreshold(rate)))

  /** Disjoint deterministic split (e.g. train/held-out): the same row lands
    * on the same side forever, for any engine that computes md5. */
  def split(df: DataFrame, key: Column, rate: Double, salt: String): (DataFrame, DataFrame) = {
    val thr = lit(hexThreshold(rate))
    (df.where(hashDraw(key, salt) < thr), df.where(!(hashDraw(key, salt) < thr)))
  }

  /** Grouped k-fold cross-validation assignment: fold = md5-hash of the
    * GROUP key mod k, so every row of a group lands in the same fold by
    * construction (the group-leakage guarantee `splitByGroup` gives for
    * one split, generalized to k). Zero shuffle — a narrow hash per row;
    * fold populations are ~uniform by the md5 draw. */
  def cvFold(groupKey: Column, k: Int, salt: String): Column = {
    require(k >= 2, s"k must be >= 2, got $k")
    pmod(conv(hashDraw(groupKey, salt), 16, 10).cast("long"), lit(k))
  }

  /** Deterministic pseudorandom TOTAL ORDER key — the training-order
    * shuffle. Full 128-bit md5 (collisions negligible at any corpus size;
    * callers should still tiebreak on `key` so the order stays total), same
    * cross-engine determinism contract as [[hashDraw]]: the shuffled order
    * of a 100 TB corpus is identical on every engine, run, and input
    * partitioning — re-running the pipeline cannot silently reorder
    * training data. */
  def shuffleKey(key: Column, salt: String): Column =
    md5(concat(key.cast("string"), lit(":" + salt)))

  /** Materialize the shuffled training order: ONE range-partitioning
    * exchange on the shuffle key (Spark samples the key space, so output
    * partitions are even regardless of corpus skew) + in-partition sort.
    * Reading files in partition order then yields the deterministic global
    * permutation — never a global single-partition sort, never a
    * driver-side shuffle. */
  def shuffled(df: DataFrame, key: Column, salt: String,
               numPartitions: Int): DataFrame = {
    val k = shuffleKey(key, salt)
    df.repartitionByRange(numPartitions, k, key)
      .sortWithinPartitions(k, key)
  }

  /** Group-aware split: key the draw on the GROUP (document, conversation,
    * user...), not the row, so every row of a group lands on the same side
    * — the leakage guard for derived rows (pages of a held-out document
    * must never reach the training side). Semantically [[split]] with the
    * group key; named because choosing the row key here is the classic
    * train/test-contamination bug. */
  def splitByGroup(df: DataFrame, groupKey: Column, rate: Double,
                   salt: String): (DataFrame, DataFrame) =
    split(df, groupKey, rate, salt)

  /** Deterministic mixture weighting with UPSAMPLING — the data-mixing
    * primitive of every LLM training run ("3.2 epochs of Wikipedia, 0.6 of
    * CommonCrawl"). Weight w = ⌊w⌋ + frac: each row emits ⌊w⌋ copies plus
    * one more iff its [[hashDraw]] lands under frac, so a stratum's expected
    * multiplicity is exactly w and the realized copy set is a pure function
    * of (key, salt) — stable across engines, runs, and repartitionings, and
    * the fractional-copy subset is itself an unbiased hash-Bernoulli sample.
    * `copy_idx` (1-based) is emitted so downstream shuffle/sort keys can
    * separate the copies (e.g. feed it into [[shuffleKey]]'s salt).
    *
    * Scale shape: broadcast config-sized weight table + per-row
    * `explode(sequence(...))` — zero data-sized shuffles; output size is the
    * weighted corpus, which is the point. Weights < 1 downsample (0 copies
    * for rows whose draw misses), weight 0 drops the stratum. */
  def mixture(df: DataFrame, key: Column, stratum: Column,
              weights: Map[String, Double], salt: String,
              defaultWeight: Double = 1.0): DataFrame = {
    require(weights.values.forall(_ >= 0.0), "mixture weights must be >= 0")
    require(defaultWeight >= 0.0, "defaultWeight must be >= 0")
    val spark = df.sparkSession
    import spark.implicits._
    def parts(w: Double) = (math.floor(w).toLong, hexThreshold(w - math.floor(w)))
    val (dInt, dThr) = parts(defaultWeight)
    val wDf = weights.toSeq.map { case (s, w) =>
      val (i, t) = parts(w); (s, i, t)
    }.toDF("__stratum", "__w_int", "__w_thr")
    val nCopies = coalesce(col("__w_int"), lit(dInt)) +
      when(hashDraw(key, salt) < coalesce(col("__w_thr"), lit(dThr)), 1L).otherwise(0L)
    df.join(broadcast(wDf), stratum === col("__stratum"), "left")
      .withColumn("__n", nCopies)
      // NB sequence(1, 0) is DESCENDING [1, 0], not empty — guard explicitly
      .where(col("__n") >= 1)
      .withColumn("copy_idx", explode(sequence(lit(1L), col("__n"))))
      .drop("__stratum", "__w_int", "__w_thr", "__n")
  }

  /** Temperature-rebalanced mixture weights — the multilingual/multi-source
    * α-sampling recipe (GPT-3 §2.2, XLM-R): target share q_s ∝ p_s^α pulls
    * the mixture toward uniform (α→0) or leaves it natural (α=1); the
    * returned multiplicity weight w_s = q_s / p_s feeds [[mixture]]
    * directly, upsampling rare strata and downsampling dominant ones while
    * keeping the expected corpus size unchanged (Σ p·w = 1).
    *
    * The stratum-count collect is model-sized (one row per stratum — the
    * Lloyd cadence, not a data collect). Determinism: strata are folded in
    * sorted order and weights rounded to 6, so an oracle can replay them;
    * α = 0.5 computes via `sqrt` — correctly rounded in IEEE-754, hence
    * bit-identical across engines, which pow(x, α) does not guarantee.
    * Gate queries should therefore pin α = 0.5. */
  def temperatureWeights(df: DataFrame, stratum: Column,
                         alpha: Double = 0.5): Map[String, Double] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    val raw = df.groupBy(stratum.cast("string").as("__s")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    require(raw.forall(_._1 != null),
      "NULL stratum: coalesce the stratum column before weighting " +
        "(a null group has no mixture-weight key)")
    val rows = raw.sortBy(_._1)
    require(rows.nonEmpty, "empty input")
    val total = rows.map(_._2).sum.toDouble
    def powa(p: Double) = if (alpha == 0.5) math.sqrt(p) else math.pow(p, alpha)
    val z = rows.foldLeft(0.0) { case (acc, (_, c)) => acc + powa(c / total) }
    rows.map { case (s, c) =>
      val p = c / total
      s -> BigDecimal(powa(p) / z / p)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
  }

  /** Deterministic per-group quota — "keep at most `n` documents per
    * domain/source", the C4/RefinedWeb guard against a single crawl host
    * dominating the corpus. The kept subset is the `n` rows with the
    * SMALLEST hash draws (tie-break: key asc), so it is a uniform sample of
    * the group, stable across engines/runs/partitionings, and monotone in
    * `n` (raising the cap only adds rows).
    *
    * Scale shape: the per-group selection is the bounded-buffer aggregate
    * ([[graft.functions.TopKBy]]) — map-side partials keep <= n (draw, key)
    * pairs per partition per group, so the selection shuffle carries <=
    * (partitions x n) rows per group, never the group's full membership the
    * `row_number().over(partitionBy(group))` formulation would sort and
    * shuffle. Kept keys then semi-join back (hash join on the key — the
    * kept set is quota-sized per group but corpus-sized overall, so no
    * broadcast assumption). Keys must be numeric. */
  def capPerGroup(df: DataFrame, key: Column, group: Column, n: Int,
                  salt: String): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val topk = udaf(graft.functions.TopKBy(n))
    // 8 hex chars = 32 bits: exact in double; negate so TopKBy's
    // (score desc) order = draw asc — smallest draws win, like the oracle's
    // ORDER BY draw, key
    val score = -conv(hashDraw(key, salt), 16, 10).cast("double")
    val keptKeys = df
      .select(group.as("__g"), score.as("__s"), key.cast("long").as("__k"))
      .groupBy(col("__g"))
      .agg(topk(col("__s"), col("__k")).as("__t"))
      .select(col("__g"), explode(col("__t._2")).as("__keep"))
    // join on (group, key): keys need not be globally unique across groups
    df.join(keptKeys,
      key.cast("long") === col("__keep") && group <=> col("__g"), "left_semi")
  }

  /** Per-stratum rates (mixture reweighting / stratified downsampling).
    * Strata absent from `rates` fall back to `defaultRate`. The rate table
    * is joined broadcast — it is config-sized, never data-sized. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Double], salt: String,
                 defaultRate: Double = 0.0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rateDf = rates.toSeq.map { case (k, r) => (k, hexThreshold(r)) }
      .toDF("__stratum", "__thr")
    df.join(broadcast(rateDf), stratum === col("__stratum"), "left")
      .where(hashDraw(key, salt) < coalesce(col("__thr"), lit(hexThreshold(defaultRate))))
      .drop("__stratum", "__thr")
  }
}
