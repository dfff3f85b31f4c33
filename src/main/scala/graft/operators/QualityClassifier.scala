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

  /** Per-document logistic score: (idCol, margin, quality_prob, keep).
    * `keep` thresholds the ROUNDED probability at 0.5 so the verdict is
    * engine-stable. */
  def score(df: DataFrame, textCol: String, idCol: String,
            dim: Int = 64, seed: Int = Embedder.DefaultSeed,
            weights: Option[DataFrame] = None,
            weightSalt: String = "qw"): DataFrame = {
    val comps = Embedder.hashedComponents(df, textCol, idCol, dim, seed)
    val w = weights.getOrElse(weightsFor(df, dim, weightSalt))
    comps.join(broadcast(w), "bucket")
      .groupBy(col("id"))
      .agg(round(sum(col("component") * col("w")), 6).as("margin"))
      .select(col("id").as(idCol), col("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-col("margin"))), 4).as("quality_prob"))
      .withColumn("keep", col("quality_prob") >= 0.5)
  }
}
