package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance — the warehouse-standard
  * versioned upsert (MERGE INTO ... WHEN MATCHED/NOT MATCHED with history
  * retention): applying an update batch at time `ts` closes the current
  * version of every key whose tracked attributes ACTUALLY changed
  * (valid_to = ts), opens a new version (valid_from = ts, valid_to = NULL),
  * inserts brand-new keys, and leaves no-op updates untouched — so version
  * count measures real change, not batch traffic. The complement of
  * [[IndexTable]]'s last-write-wins upsert: there the old row disappears,
  * here it becomes history (and the generation store's time travel gets an
  * in-table analogue).
  *
  * Scale shape: ONE key-keyed equi-join of the current slice against the
  * update batch plus unions — history rows pass through untouched (no
  * join), change detection is a null-safe struct compare (narrow), and
  * every output leg is a projection of that single join. No windows, no
  * per-key sorting.
  */
object Scd2 {

  /** Apply `updates` (key + the tracked attribute columns, same names as in
    * `dim`) to an SCD2 table `dim` (key, attrs..., valid_from, valid_to) at
    * time `ts`. Returns the full new SCD2 table. */
  def applyBatch(dim: DataFrame, updates: DataFrame, keyCol: String,
                 attrCols: Seq[String], ts: Long): DataFrame = {
    require(attrCols.nonEmpty, "attrCols must be non-empty")
    val history = dim.where(col("valid_to").isNotNull)
    val current = dim.where(col("valid_to").isNull)
    val upd = updates.select(col(keyCol),
      struct(attrCols.map(col): _*).as("__new"))
    val j = current
      .withColumn("__old", struct(attrCols.map(col): _*))
      .join(upd, Seq(keyCol), "full_outer")
    // legs of the single join; <=> makes NULL attribute values compare sanely
    val unchanged = j.where(col("__new").isNull || col("__old") <=> col("__new"))
      .where(col("__old").isNotNull)
      .select(dim.columns.toIndexedSeq.map(col): _*)
    val closed = j.where(col("__old").isNotNull && col("__new").isNotNull &&
        !(col("__old") <=> col("__new")))
      .select(dim.columns.toIndexedSeq.map(col): _*)
      .withColumn("valid_to", lit(ts))
    val opened = j.where(col("__new").isNotNull &&
        (col("__old").isNull || !(col("__old") <=> col("__new"))))
      .select(Seq(col(keyCol)) ++
        attrCols.map(c => col(s"__new.$c").as(c)) ++
        Seq(lit(ts).as("valid_from"), lit(null).cast("long").as("valid_to")): _*)
      .select(dim.columns.toIndexedSeq.map(col): _*)
    history.unionByName(unchanged).unionByName(closed).unionByName(opened)
  }

  /** Seed an SCD2 table from a plain dimension snapshot (version 1 rows,
    * valid_from = `ts`, open-ended). */
  def init(dim: DataFrame, keyCol: String, attrCols: Seq[String],
           ts: Long = 0L): DataFrame =
    dim.select(Seq(col(keyCol)) ++ attrCols.map(col) ++
      Seq(lit(ts).as("valid_from"), lit(null).cast("long").as("valid_to")): _*)

  /** Point-in-time (PIT) join: each probe row picks up the dimension
    * version valid AT its timestamp — `valid_from <= ts < valid_to`
    * (open-ended current versions match everything from valid_from on).
    * THE feature-store join: training examples must see the attribute
    * values as of the label time, never the leaked current row.
    *
    * Scale shape: one hash equi-join on the key with the interval test as
    * residual filter; SCD2 invariants (versions per key are disjoint)
    * guarantee ≤1 surviving match per probe, so no post-dedup is needed.
    * At warehouse scale both sides bucket on the key.
    */
  def pitJoin(dim: DataFrame, probes: DataFrame, keyCol: String,
              tsCol: String): DataFrame = {
    val d = dim
    probes.join(d,
      probes(keyCol) === d(keyCol) &&
        d("valid_from") <= probes(tsCol) &&
        (d("valid_to").isNull || d("valid_to") > probes(tsCol)))
      .drop(d(keyCol))
  }
}
