package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed byte-pair-encoding (BPE) merge training (Sennrich et al.
  * 1508.07909 — the tokenizer-induction step of every LLM data pipeline).
  *
  * The working set is the WORD-TYPE table (distinct word, corpus
  * frequency), not the corpus: pair statistics over types weighted by
  * frequency are exactly the corpus pair statistics, and the type table is
  * vocabulary-sized — this is the classic trick that makes BPE training
  * cheap no matter how big the corpus is. Per merge round:
  *   1. adjacent symbol pairs per type via zip_with over the current
  *      segmentation (narrow), exploded and hash-aggregated by (l, r) with
  *      map-side partials — the shuffle carries distinct pairs, not tokens;
  *   2. the argmax pair (count desc, then lexicographic l, r — the
  *      deterministic tie-break) comes to the driver: ONE tiny row per
  *      round, the same model-to-driver cadence as the IVF/PQ Lloyd loops;
  *   3. the merge applies to every type's segmentation as a narrow map
  *      (leftmost-greedy, non-overlapping — both the reference semantics
  *      and what SQL replace() does, which is what makes the DuckDB oracle
  *      able to replay training exactly).
  * Lineage is localCheckpoint-truncated every few rounds.
  */
object BpeTrainer {

  final case class Merge(rank: Int, left: String, right: String, pairCount: Long)

  /** Leftmost-greedy non-overlapping single-pair merge — the reference
    * update rule (and replace()'s semantics under the oracle's
    * separator-string encoding). */
  def applyMerge(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** (word, freq) types of a corpus text column: one explode + one
    * hash-aggregation (map-side partials; key space = vocabulary). */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.wsTokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `numMerges` merges over a (word, freq) type table. Stops early
    * if the pair space is exhausted. Returns merges in learned order. */
  def train(words: DataFrame, wordCol: String, freqCol: String,
            numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val mergeUdf = udf((syms: Seq[String], l: String, r: String) =>
      applyMerge(syms, l, r))
    var state = words.select(col(wordCol).as("word"),
        col(freqCol).cast("long").as("freq"))
      // NB: Spark's split(x, '') appends a trailing "" (Java split limit
      // -1); filter it so symbols are exactly the characters.
      .withColumn("syms", filter(split(col("word"), ""), s => length(s) > 0))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (k <- 1 to numMerges if !exhausted) {
      val pairs = state.select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
      val top = pairs.orderBy(desc("c"), col("l"), col("r")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val c = top(0).getLong(2)
        learned += Merge(k, l, r, c)
        state = state.withColumn("syms", mergeUdf(col("syms"), lit(l), lit(r)))
        if (k % 4 == 0 && k < numMerges) state = state.localCheckpoint()
      }
    }
    learned.toSeq
  }

  /** The learned merge table as a DataFrame (rank, lhs, rhs, pair_count —
    * lhs/rhs because left/right are SQL keywords on the oracle side). */
  def mergesDF(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      .toDF("rank", "lhs", "rhs", "pair_count")
  }

  /** Segment every word of a text column with an already-learned merge
    * list (applied in learned order — the standard BPE encode), returning
    * idCol + whitespace and BPE token counts per row. The merge list
    * rides into the closure (tokenizer-sized); the corpus never shuffles. */
  def encodeCounts(df: DataFrame, textCol: String, idCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val countUdf = udf((ws: Seq[String]) => {
      var total = 0L
      ws.foreach { w =>
        var syms: Seq[String] = w.split("").toSeq
        ms.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        total += syms.length
      }
      total
    })
    df.select(col(idCol),
        TextFunctions.wsTokens(lower(col(textCol))).as("ws"))
      .select(col(idCol), size(col("ws")).cast("long").as("n_tokens_ws"),
        countUdf(col("ws")).as("n_tokens_bpe"))
  }
}
