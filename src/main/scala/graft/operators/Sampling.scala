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
