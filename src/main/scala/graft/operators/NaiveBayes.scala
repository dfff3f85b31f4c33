package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial naive Bayes where the MODEL IS AN AGGREGATION: per-class
  * token counts, class token totals, vocabulary size, and document priors
  * are all one keyed pass over the training token stream — no fit/transform
  * round trip, no driver-side state beyond the plan.
  *
  * Scoring arithmetic (cross-engine stable by construction):
  *
  *   score(doc, k) = ln(prior_k) + Σ_tok n_occ · ln((c_{k,tok} + 1) / (T_k + V))
  *
  * Every ratio has exact-integer operands, so both engines take ln of the
  * identical double; per-class sums are unordered but the fixture argmax
  * margins (measured: ≥ 4.9e-4 at sf0.001, 4e-3 at sf0.01, 1.8e-2 at
  * sf0.1) dwarf the ~1e-14 fold noise, and ties break on the class name.
  *
  * Scale shape: the class-total/prior/vocab tables are CLASS-sized (one
  * row per class, broadcast); the per-class token-count model is
  * (class × vocab)-sized and joins the test token stream on the token key
  * (AQE broadcasts small vocabularies, big ones stay a keyed shuffle
  * join). The only fan-out is test-tokens × K classes — the irreducible
  * cost of scoring every class.
  */
object NaiveBayes {

  /** The full score surface: one row per (test document, class) with the
    * class log-likelihood — the raw material for argmax prediction
    * ([[trainPredict]]) and for conformal nonconformity scores (the
    * nb_conformal gate). Columns: `(idCol, true_label, cls, score)`. */
  def scores(train: DataFrame, test: DataFrame, idCol: String,
             labelCol: String, tokCol: String): DataFrame = {
    val c = train.groupBy(col(labelCol).as("__l"), col(tokCol).as("__tok"))
      .agg(count(lit(1)).as("__c"))
    val tl = train.groupBy(col(labelCol).as("__l")).agg(count(lit(1)).as("__t"))
    val v = train.agg(countDistinct(col(tokCol)).as("__v"))
    val pri = train.groupBy(col(labelCol).as("__l"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    val prin = pri.agg(sum(col("__nd")).as("__n"))
    val tc = test.groupBy(col(idCol).as("__id"),
        col(labelCol).as("true_label"), col(tokCol).as("__tok"))
      .agg(count(lit(1)).as("__occ"))
    val scored = tc
      .crossJoin(broadcast(tl))
      .crossJoin(broadcast(v))
      .join(c, Seq("__l", "__tok"), "left")
      .groupBy(col("__id"), col("true_label"), col("__l"))
      .agg(sum(col("__occ") *
        log((coalesce(col("__c"), lit(0L)) + lit(1.0)) / (col("__t") + col("__v"))))
        .as("__ll"))
      .join(broadcast(pri), Seq("__l"))
      .crossJoin(broadcast(prin))
      .withColumn("__score", col("__ll") + log(col("__nd") * lit(1.0) / col("__n")))
    scored.select(col("__id").as(idCol), col("true_label"),
      col("__l").as("cls"), col("__score").as("score"))
  }

  /** The argmax fold of a [[scores]] frame: one row per test document,
    * `(id, true_label, pred_label)` — split out so callers that persist
    * the scores frame once (it feeds prediction AND conformal views) can
    * fold it without re-running the train/score chain. */
  def predictFromScores(scored: DataFrame, idCol: String): DataFrame =
    scored.groupBy(col(idCol), col("true_label"))
      .agg(min_by(col("cls"), struct((-col("score")).as("ns"), col("cls")))
        .as("pred_label"))

  /** Train on `(idCol, labelCol, tokCol)` token rows, score a held-out
    * token stream of the same shape; returns one row per test document:
    * `(id, true_label, pred_label)`. */
  def trainPredict(train: DataFrame, test: DataFrame, idCol: String,
                   labelCol: String, tokCol: String): DataFrame =
    predictFromScores(scores(train, test, idCol, labelCol, tokCol), idCol)

  /** [[predictFromScores]] folded to the confusion matrix. */
  def confusionFromScores(scored: DataFrame, idCol: String): DataFrame =
    predictFromScores(scored, idCol)
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))

  /** [[trainPredict]] folded to the confusion matrix — the integer-valued
    * gate surface (counts, not rounded log-likelihoods). */
  def confusion(train: DataFrame, test: DataFrame, idCol: String,
                labelCol: String, tokCol: String): DataFrame =
    confusionFromScores(scores(train, test, idCol, labelCol, tokCol), idCol)
}
