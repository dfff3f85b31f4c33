package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** WordPiece-style tokenization: a frequency-built subword vocabulary plus
  * greedy longest-match-first encoding (the WordPiece/BERT inference rule
  * — Schuster & Nakajima 2012; the greedy MaxMatch segmenter). The second
  * tokenizer family next to [[BpeTrainer]]: BPE learns MERGES bottom-up,
  * WordPiece here scores SUBSTRINGS top-down — and unlike BPE's
  * learned-order replay, the greedy encode is pure string/integer logic,
  * so the whole family gates on exact integer counts with zero float
  * arithmetic anywhere.
  *
  * Vocabulary: every substring of length 2..`maxPieceLen` of every word
  * type, weighted by corpus word frequency per occurrence position, top-K
  * by (weighted count desc, piece asc); single characters are implicitly
  * always in vocabulary (the encoder's fallback — no unreachable words,
  * the `[UNK]`-free convention).
  *
  * Scale shape: substring generation is a compiled flatMap over the
  * word-TYPE table (vocabulary-sized, the BPE trick — the corpus only
  * ever feeds the one word-frequency aggregation); the piece table
  * aggregates with map-side partials; top-K collects model-sized rows
  * (the Lloyd cadence) and rides into the encoder's closure. Encoding is
  * a narrow map with per-type memoization, like BPE's.
  */
object WordPiece {

  /** (piece, cnt) weighted substring counts, lengths 2..maxPieceLen. */
  def pieceCounts(words: DataFrame, wordCol: String, freqCol: String,
                  maxPieceLen: Int = 4): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.select(col(wordCol).cast("string").as("w"),
        col(freqCol).cast("long").as("f"))
      .as[(String, Long)]
      .flatMap { case (w, f) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        var i = 0
        while (i < w.length) {
          var l = 2
          while (l <= maxPieceLen && i + l <= w.length) {
            out += ((w.substring(i, i + l), f))
            l += 1
          }
          i += 1
        }
        out
      }
      .toDF("piece", "f")
      .groupBy(col("piece")).agg(sum(col("f")).as("cnt"))
  }

  /** The ranked top-K multi-char vocabulary: (rank, piece, cnt), rank by
    * (cnt desc, piece asc) — collected model-sized, ranked driver-side. */
  def vocab(spark: SparkSession, words: DataFrame, wordCol: String,
            freqCol: String, maxPieceLen: Int = 4, topK: Int = 50): DataFrame = {
    import spark.implicits._
    val top = pieceCounts(words, wordCol, freqCol, maxPieceLen)
      .orderBy(desc("cnt"), col("piece")).limit(topK)
      .as[(String, Long)].collect()
    top.zipWithIndex
      .map { case ((p, c), i) => (i + 1, p, c) }.toSeq
      .toDF("rank", "piece", "cnt")
  }

  /** Greedy longest-match token count for one word under a multi-char
    * vocabulary (single chars always match): the WordPiece inference rule.
    * Pure integer/string logic — deterministic by construction. */
  def greedyCount(w: String, vocabMulti: Set[String], maxPieceLen: Int): Int = {
    var p = 0
    var n = 0
    while (p < w.length) {
      var l = math.min(maxPieceLen, w.length - p)
      while (l > 1 && !vocabMulti.contains(w.substring(p, p + l))) l -= 1
      p += l
      n += 1
    }
    n
  }

  /** Per-row whitespace and WordPiece token counts under `vocabMulti`
    * (the [[BpeTrainer.encodeCounts]] surface for this family). */
  def encodeCounts(df: DataFrame, textCol: String, idCol: String,
                   vocabMulti: Set[String], maxPieceLen: Int = 4): DataFrame = {
    val memo = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val countUdf = udf { (ws: Seq[String]) =>
      var total = 0L
      ws.foreach { w =>
        val hit = memo.get(w)
        total +=
          (if (hit != null) hit.longValue
           else {
             val v = greedyCount(w, vocabMulti, maxPieceLen).toLong
             if (memo.size < 1000000) memo.put(w, v)
             v
           })
      }
      total
    }
    df.select(col(idCol),
        TextFunctions.wsTokens(lower(col(textCol))).as("ws"))
      .select(col(idCol), size(col("ws")).cast("long").as("n_tokens_ws"),
        countUdf(col("ws")).as("n_tokens_wp"))
  }
}
