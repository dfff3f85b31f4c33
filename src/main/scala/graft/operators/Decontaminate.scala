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
}
