package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Train/eval decontamination. The exact form (used by the oracle-checked
  * `decontaminate` query) is a broadcast left-semi join of the train side
  * against the distinct eval fingerprints — right for sample-sized eval
  * sets.
  *
  * [[contaminatedViaBloom]] is the 100 TB path: when the eval fingerprint
  * set outgrows a comfortable broadcast hash relation (hundreds of millions
  * of fingerprints), a Bloom filter compresses it ~10 bytes/key at 1% fpp
  * into something that still ships to every executor. One-sided error:
  * every truly contaminated doc is flagged (no false negatives, so nothing
  * contaminated survives), a bounded fpp of clean docs is over-flagged —
  * the right tradeoff for decontamination, where a dropped clean doc is
  * cheap and a leaked eval doc is not. Flagged rows can be re-checked with
  * the exact join if the over-drop matters. */
object Decontaminate {

  /** Exact: train rows whose fingerprint appears in `evalFps` (one column
    * of fingerprints). */
  def contaminatedExact(train: DataFrame, fpCol: Column,
                        evalFps: DataFrame): DataFrame = {
    val fps = evalFps.toDF("__fp").distinct()
    train.join(broadcast(fps), fpCol === col("__fp"), "left_semi")
  }

  /** Exact complement: train rows whose fingerprint does NOT appear in
    * `evalFps` — the corpus that survives decontamination (broadcast
    * anti-join, same scale envelope as [[contaminatedExact]]). */
  def cleanExact(train: DataFrame, fpCol: Column,
                 evalFps: DataFrame): DataFrame = {
    val fps = evalFps.toDF("__fp").distinct()
    train.join(broadcast(fps), fpCol === col("__fp"), "left_anti")
  }

  /** Approximate with one-sided error: superset of [[contaminatedExact]],
    * expected |clean| * fpp rows of over-flagging.
    *
    * The filter is built distributed (`stat.bloomFilter` runs a
    * treeAggregate over the eval side — mergeable partial sketches, no
    * driver-side row loop) and the per-row membership probe is a closure
    * over the broadcast sketch. */
  def contaminatedViaBloom(train: DataFrame, fpCol: Column,
                           evalFps: DataFrame, expectedItems: Long,
                           fpp: Double = 0.01): DataFrame = {
    val col0 = evalFps.columns.head
    val bf: BloomFilter = evalFps.stat.bloomFilter(col0, expectedItems, fpp)
    val bcast = train.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((fp: String) => fp != null && bcast.value.mightContainString(fp))
    train.where(mightContain(fpCol))
  }

  /** Any-window n-gram decontamination — the GPT-3/PaLM-style check: a
    * train document is contaminated if ANY of its word n-grams appears
    * anywhere in the eval side (not just the document prefix, which is what
    * the fingerprint form above checks). Output: one row per contaminated
    * train doc with `n_hits` = how many DISTINCT eval n-grams it shares —
    * the evidence count a triage pass sorts by.
    *
    * Scale shape: the eval n-gram set is benchmark-sized, so it broadcasts;
    * the exploded train gram stream is cut down by the broadcast semi-join
    * BEFORE the only shuffle (the per-doc count), which therefore carries
    * only matched grams, not the corpus token stream. Per-doc grams are
    * distinct ([[Dedup.shinglesFast]] semantics) and the eval set is
    * distinct, so the join multiplicity is exactly 1 per shared gram. When
    * the eval side outgrows a broadcast, swap the join for
    * [[contaminatedViaBloom]] over the same exploded gram stream — one-sided
    * error, same no-false-negative guarantee.
    */
  def ngramContaminated(train: DataFrame, textCol: String, idCol: String,
                        evalDocs: DataFrame, evalTextCol: String,
                        n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = graft.operators.Dedup.shinglesFast(n)
    val ev = evalDocs
      .select(explode(grams(col(evalTextCol))).as("__gram")).distinct()
    train.select(col(idCol), explode(grams(col(textCol))).as("__gram"))
      .join(broadcast(ev), "__gram")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }
}
