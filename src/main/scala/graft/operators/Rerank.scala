package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic rerank + answer pipeline — the engine's stand-in for the
  * reference's `map_rerank` LLM QA chain (reference `app/app.py:79-110`):
  * one 0-100 relevance score per retrieved chunk, threshold at 50, sort
  * desc, keep top-n, project answer records.
  *
  * The LLM scorer is replaced by a deterministic lexical-overlap score with
  * the same shape (per-row map producing (answer, score) — `app/app.py:88-90`):
  * score = floor(100 * |distinct prompt keywords present in chunk| /
  * |distinct prompt keywords|). The answer string is the first `answerLen`
  * chars of the chunk (the reference extracts an LLM answer span; we take a
  * deterministic prefix span).
  *
  * Reference quirks handled: threshold `score >= 50` (`app/app.py:36,100`);
  * the unbounded `results[i]` top-n loop bug (`app/app.py:97`, IndexError
  * swallowed at `:261-262`) is naturally safe under `limit`; display page is
  * 1-based (`app/app.py:108`).
  */
object Rerank {

  val ScoreThreshold = 50
  val AnswerLen = 160

  /** 0-100 keyword-overlap score of `content` against the prompt's keyword
    * list (keywords per reference `app/app.py:49-56`). */
  def overlapScore(prompt: String)(content: Column): Column = {
    val kws = prompt.toLowerCase
      .replaceAll("[.\\-=?!]", " ").split("\\s+")
      .filter(w => w.nonEmpty && !TextFunctions.Stopwords.contains(w))
      .distinct.toSeq
    if (kws.isEmpty) lit(0)
    else {
      // strip the same [.-=?!] punctuation from the content that the prompt
      // keywords get — otherwise "sandwich." never matches keyword "sandwich"
      val words = array_distinct(TextFunctions.wsTokens(
        lower(regexp_replace(content, "[.\\-=?!]", " "))))
      floor(lit(100.0) * size(array_intersect(words, typedlit(kws))) / kws.size)
        .cast("int")
    }
  }

  /** R1-R4 + P7: score, threshold, rerank-sort (ties broken by similarity
    * then page for determinism), top-n, answer projection. */
  def answers(scoredChunks: DataFrame, prompt: String, topN: Int,
              threshold: Int = ScoreThreshold): DataFrame =
    scoredChunks
      .withColumn("score", overlapScore(prompt)(col("page_content")))
      .where(col("score") >= threshold)
      .orderBy(desc("score"), desc("similarity"), asc("document_path"), asc("page_number"))
      .limit(topN)
      .select(
        substring(col("page_content"), 1, AnswerLen).as("answer"),
        col("score"),
        col("page_content").as("content"),
        col("document_path").as("source"),
        col("similarity"),
        (col("page_number") + 1).as("page"))
}
