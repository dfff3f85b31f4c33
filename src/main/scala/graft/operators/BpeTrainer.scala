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
  * cheap no matter how big the corpus is. The DISTRIBUTED part is the one
  * place the corpus size shows up: [[wordFreq]]'s explode +
  * map-side-combined hash aggregation. The merge loop itself then runs on
  * the collected type table in memory — the architecture every production
  * tokenizer trainer uses (corpus → distributed word counts → local merge
  * loop), because per-round Spark jobs over a vocabulary-sized frame cost
  * 16 job launches to do microseconds of arithmetic (measured: the loop
  * dominated bpe_token_count's wall time before this change, ~1.6 s of
  * fixed per-round latency at sf0.1). The collect is vocabulary-sized —
  * the same model-to-driver cadence as the Lloyd loops; tie-breaks use
  * UTF-8 byte order, identical to Spark's binary string ordering and the
  * DuckDB oracle's, so the learned merges are bit-identical to the old
  * round-per-job implementation.
  */
object BpeTrainer {

  /** Driver-side word-type cap for [[train]]: ~4M types × ~50 B/type keeps
    * the collected table comfortably under typical driver heaps. */
  val DefaultMaxTypes: Int = 4000000

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

  /** UTF-8 byte-order string comparison — Spark's default (binary
    * collation) ORDER BY and DuckDB's, which Java's UTF-16 compareTo is
    * NOT for supplementary-plane text. Tie-breaks must use this order to
    * stay bit-compatible with the previous Spark-side argmax. */
  private[operators] def u8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Learn `numMerges` merges over a (word, freq) type table. Stops early
    * if the pair space is exhausted. Returns merges in learned order.
    *
    * The type table is collected once (vocabulary-sized — the
    * tokenizer-training cadence, see object doc) and the round loop runs
    * in memory with EXACTLY the former distributed semantics: adjacent
    * pairs per type counted per occurrence and weighted by frequency,
    * argmax by (count desc, l, r) in UTF-8 byte order, leftmost-greedy
    * non-overlapping merge application. */
  def train(words: DataFrame, wordCol: String, freqCol: String,
            numMerges: Int, maxTypes: Int = BpeTrainer.DefaultMaxTypes): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // The collect is vocabulary-sized by design, but web-scale corpora can
    // reach 1e8+ word TYPES (typos, URLs). Cap the pull: fetch at most
    // maxTypes + 1 rows (limit is a no-op when the table is under the cap,
    // so in-gate hashes are unchanged) and fail loudly instead of OOMing
    // the driver — callers over the cap should prefilter (e.g. drop
    // freq == 1 hapax types, which BPE merges are insensitive to at scale).
    val types = words.select(col(wordCol).cast("string").as("word"),
        col(freqCol).cast("long").as("freq"))
      .limit(maxTypes + 1)
      .collect()
    require(types.length <= maxTypes,
      s"word-type table exceeds maxTypes=$maxTypes; prefilter low-frequency " +
        "types (e.g. freq >= 2) before BPE training or raise maxTypes")
    val syms: Array[Seq[String]] =
      types.map(r => r.getString(0).split("").filter(_.nonEmpty).toSeq)
    val freqs: Array[Long] = types.map(_.getLong(1))
    val learned = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    for (k <- 1 to numMerges if !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < syms.length) {
        val s = syms(i)
        var j = 0
        while (j + 1 < s.length) {
          val key = (s(j), s(j + 1))
          counts.update(key, counts.getOrElse(key, 0L) + freqs(i))
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), c) = counts.reduceLeft { (a, b) =>
          // (count desc, l asc, r asc) — a wins ties iff it sorts first
          if (a._2 != b._2) { if (a._2 > b._2) a else b }
          else if (a._1._1 != b._1._1) { if (u8Less(a._1._1, b._1._1)) a else b }
          else if (u8Less(a._1._2, b._1._2)) a else b
        }
        learned += Merge(k, l, r, c)
        i = 0
        while (i < syms.length) { syms(i) = applyMerge(syms(i), l, r); i += 1 }
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

  /** Per-executor word-type → BPE-length memo for [[encodeCounts]]: the
    * segmentation is a pure function of the word TYPE, but the UDF sees
    * every token occurrence — Zipf makes the hit rate extreme, so the
    * narrow map stays narrow (no (doc, word) re-aggregation shuffle) while
    * paying the merge loop once per type per executor. Transient: each
    * executor JVM builds its own; bounded so a pathological vocabulary
    * can't hold executor memory. */
  private final class SegLenMemo(ms: Seq[(String, String)]) extends Serializable {
    @transient private lazy val cache =
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    private def segLen(w: String): Long = {
      var syms: Seq[String] = w.split("").toSeq
      ms.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
      syms.length.toLong
    }
    def count(ws: Seq[String]): Long = {
      var total = 0L
      ws.foreach { w =>
        val hit = cache.get(w)
        total +=
          (if (hit != null) hit.longValue
           else {
             val v = segLen(w)
             if (cache.size < 1000000) cache.put(w, v)
             v
           })
      }
      total
    }
  }

  /** Segment every word of a text column with an already-learned merge
    * list (applied in learned order — the standard BPE encode), returning
    * idCol + whitespace and BPE token counts per row. The merge list
    * rides into the closure (tokenizer-sized); the corpus never shuffles,
    * and per-type work is memoized per executor ([[SegLenMemo]]). */
  def encodeCounts(df: DataFrame, textCol: String, idCol: String,
                   merges: Seq[Merge]): DataFrame = {
    val ms = merges.sortBy(_.rank).map(m => (m.left, m.right))
    val memo = new SegLenMemo(ms)
    val countUdf = udf((ws: Seq[String]) => memo.count(ws))
    df.select(col(idCol),
        TextFunctions.wsTokens(lower(col(textCol))).as("ws"))
      .select(col(idCol), size(col("ws")).cast("long").as("n_tokens_ws"),
        countUdf(col("ws")).as("n_tokens_bpe"))
  }
}
