package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-generation evaluation metrics (BLEU family) — the model-eval side
  * of the training-data pipeline, next to the retrieval metrics
  * (retrieval_eval_ndcg) and the LM scores (lm_cross_entropy).
  *
  * Everything here is computed with higher-order array functions in ONE
  * row-local projection per document: n-gram extraction, clipped-count
  * matching, and the precision terms never leave the row, so per-document
  * BLEU is a zero-shuffle map over the pair table — the shape that scales
  * to any corpus (no join, no grouping on n-grams). Corpus-level BLEU then
  * aggregates the per-document INTEGER clipped/total counts (exact,
  * order-independent sums) and applies the geometric mean once.
  */
object TextEval {

  /** Word n-grams of a token array as space-joined strings; empty below n
    * tokens. Row-local (`transform` over `sequence`). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Clipped n-gram match count (Papineni et al. 2002): for each DISTINCT
    * candidate n-gram, min(count in candidate, count in reference), summed.
    * Row-local: O(|grams|^2) comparisons inside one codegen'd projection —
    * bounded by the token cap the caller applies, never a shuffle. */
  private def clippedMatches(candGrams: Column, refGrams: Column): Column =
    aggregate(array_distinct(candGrams), lit(0),
      (acc, g) => acc + least(
        size(filter(candGrams, x => x === g)),
        size(filter(refGrams, x => x === g))))

  /** Per-document BLEU-`maxN`: modified n-gram precisions p_1..p_maxN,
    * brevity penalty, and the geometric-mean score. The standard (un-
    * smoothed) definition: any zero precision zeroes the score. Returns
    * (id, ref_len, cand_len, clipped_n/total_n per n, p_n per n, bp, bleu)
    * — the count columns are kept so [[bleuCorpus]] and the oracle can
    * aggregate the exact integers. */
  def bleuPerDoc(pairs: DataFrame, refToks: Column, candToks: Column,
                 idCol: Column, maxN: Int = 4): DataFrame = {
    require(maxN >= 1 && maxN <= 4, s"maxN in [1,4], got $maxN")
    val withCounts = (1 to maxN).foldLeft(
      pairs.select(idCol.as("id"), refToks.as("__r"), candToks.as("__c"))) {
      case (df, n) =>
        df.withColumn(s"clipped_$n", clippedMatches(ngrams(col("__c"), n),
            ngrams(col("__r"), n)))
          .withColumn(s"total_$n", greatest(size(col("__c")) - (n - 1), lit(0)))
    }
    val base = withCounts
      .withColumn("ref_len", size(col("__r")))
      .withColumn("cand_len", size(col("__c")))
    scored(base, maxN).drop("__r", "__c")
  }

  /** Per-document ROUGE-N (Lin 2004, the recall-oriented complement of
    * BLEU): for each n, recall = clipped matches / reference n-gram count,
    * precision = clipped matches / candidate n-gram count, F1 their
    * harmonic mean — the same row-local clipped-count machinery as
    * [[bleuPerDoc]], zero shuffles. Returns (id, ref_len, cand_len) plus
    * (rouge{n}_recall, rouge{n}_precision, rouge{n}_f1) per requested n,
    * all round-4, zero when the relevant gram count is zero. */
  def rougePerDoc(pairs: DataFrame, refToks: Column, candToks: Column,
                  idCol: Column, ns: Seq[Int] = Seq(1, 2)): DataFrame = {
    require(ns.nonEmpty && ns.forall(n => n >= 1 && n <= 4))
    val base = ns.foldLeft(
      pairs.select(idCol.as("id"), refToks.as("__r"), candToks.as("__c"))) {
      case (df, n) =>
        df.withColumn(s"__m$n", clippedMatches(ngrams(col("__c"), n),
            ngrams(col("__r"), n)))
          .withColumn(s"__rt$n", greatest(size(col("__r")) - (n - 1), lit(0)))
          .withColumn(s"__ct$n", greatest(size(col("__c")) - (n - 1), lit(0)))
    }
    val scored = ns.foldLeft(base) { case (df, n) =>
      val r = col(s"__m$n").cast("double") / col(s"__rt$n")
      val p = col(s"__m$n").cast("double") / col(s"__ct$n")
      df.withColumn(s"rouge${n}_recall",
          when(col(s"__rt$n") > 0, round(r, 4)).otherwise(lit(0.0)))
        .withColumn(s"rouge${n}_precision",
          when(col(s"__ct$n") > 0, round(p, 4)).otherwise(lit(0.0)))
        .withColumn(s"rouge${n}_f1",
          when(col(s"__rt$n") > 0 && col(s"__ct$n") > 0 && col(s"__m$n") > 0,
            round(lit(2.0) * r * p / (r + p), 4)).otherwise(lit(0.0)))
    }
    scored
      .withColumn("ref_len", size(col("__r")))
      .withColumn("cand_len", size(col("__c")))
      .drop("__r", "__c")
      .drop(ns.flatMap(n => Seq(s"__m$n", s"__rt$n", s"__ct$n")): _*)
  }

  /** Per-document chrF (Popović 2015, "chrF: character n-gram F-score for
    * automatic MT evaluation"): character n-gram precision/recall averaged
    * over n = 1..`maxN` (default 6), combined as F_β with β = 2 (recall
    * weighted 4×) — the tokenization-free eval metric that correlates
    * better than BLEU on morphology-rich text. Inputs are STRINGS (the
    * caller strips whitespace and caps length — chrF's standard
    * space-removed form); n-grams are row-local substrings, the clipped
    * matching is the same O(G²) in-projection machinery as BLEU — zero
    * shuffles, cost bounded by the caller's length cap.
    *
    * Orders with an empty denominator contribute precision/recall 0 (a
    * fixed-order average — deterministic, no effective-order dance).
    * Output: (id, ref_nchars, cand_nchars, chr_p, chr_r, chrf2), floats
    * round-4. */
  def chrfPerDoc(pairs: DataFrame, refStr: Column, candStr: Column,
                 idCol: Column, maxN: Int = 6): DataFrame = {
    require(maxN >= 1 && maxN <= 6, s"maxN in [1,6], got $maxN")
    def grams(s: Column, n: Int): Column =
      when(length(s) >= n,
        transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    val base = pairs.select(idCol.as("id"), refStr.as("__r"), candStr.as("__c"))
    val withN = (1 to maxN).foldLeft(base) { case (df, n) =>
      df.withColumn(s"__m$n", clippedMatches(grams(col("__c"), n),
          grams(col("__r"), n)))
        .withColumn(s"__ct$n", greatest(length(col("__c")) - (n - 1), lit(0)))
        .withColumn(s"__rt$n", greatest(length(col("__r")) - (n - 1), lit(0)))
    }
    val pSum = (1 to maxN).map(n =>
      when(col(s"__ct$n") > 0, col(s"__m$n").cast("double") / col(s"__ct$n"))
        .otherwise(lit(0.0))).reduceLeft(_ + _)
    val rSum = (1 to maxN).map(n =>
      when(col(s"__rt$n") > 0, col(s"__m$n").cast("double") / col(s"__rt$n"))
        .otherwise(lit(0.0))).reduceLeft(_ + _)
    withN
      .withColumn("__p", pSum / lit(maxN))
      .withColumn("__q", rSum / lit(maxN))
      .select(col("id"), length(col("__r")).as("ref_nchars"),
        length(col("__c")).as("cand_nchars"),
        round(col("__p"), 4).as("chr_p"), round(col("__q"), 4).as("chr_r"),
        when(lit(4.0) * col("__p") + col("__q") > 0,
          round(lit(5.0) * col("__p") * col("__q") /
            (lit(4.0) * col("__p") + col("__q")), 4))
          .otherwise(lit(0.0)).as("chrf2"))
  }

  /** Corpus BLEU: sum the per-document integer counts (exact,
    * order-independent), then one brevity penalty + geometric mean over the
    * corpus totals — the standard corpus-level definition (NOT the mean of
    * per-document scores). One map-side-partial aggregation. */
  def bleuCorpus(pairs: DataFrame, refToks: Column, candToks: Column,
                 idCol: Column, maxN: Int = 4): DataFrame = {
    val per = bleuPerDoc(pairs, refToks, candToks, idCol, maxN)
    val sums = (1 to maxN).flatMap(n => Seq(
      sum(col(s"clipped_$n")).as(s"clipped_$n"),
      sum(col(s"total_$n")).as(s"total_$n"))) ++ Seq(
      sum(col("ref_len")).as("ref_len"),
      sum(col("cand_len")).as("cand_len"),
      count(lit(1)).as("n_docs"))
    scored(per.agg(sums.head, sums.tail: _*), maxN)
  }

  /** Per-document word error rate + character error rate. WER needs a
    * TOKEN-level edit distance, which neither engine ships — so each
    * pair's union vocabulary (row-local `array_distinct`) maps every token
    * to one printable ASCII character (chr(33 + position), 94 symbols
    * available) and the built-in character `levenshtein` on the encoded
    * strings IS the token-level distance. Callers must cap tokens so
    * |union vocabulary| <= 94 per pair; `maxTokensPerSide` (loud-capped
    * at build like BpeTrainer's maxTypes: 2x the per-side cap must fit
    * the 94 symbols) is that contract made checkable, and a pair whose
    * sides EXCEED the cap fails the job with raise_error instead of
    * silently alias-encoding overflow tokens. CER is plain levenshtein
    * over the raw strings. Everything is one row-local projection.
    * Output: (id, ref_len, cand_len, wer, cer), round-4; wer/cer 0 when
    * the reference side is empty. */
  def werCer(pairs: DataFrame, refToks: Column, candToks: Column,
             idCol: Column, maxTokensPerSide: Int = 40): DataFrame = {
    require(maxTokensPerSide >= 1 && 2 * maxTokensPerSide <= 94,
      s"maxTokensPerSide must be in [1, 47] so the per-pair union " +
      s"vocabulary fits the 94 printable-ASCII symbols; got $maxTokensPerSide")
    def enc(toks: Column, vocab: Column): Column =
      array_join(transform(toks,
        t => chr(lit(33) + array_position(vocab, t) - 1)), "")
    def capped(c: Column, side: String): Column =
      when(size(c) > maxTokensPerSide, raise_error(concat(
        lit(s"TextEval.werCer: $side side exceeds maxTokensPerSide=" +
          s"$maxTokensPerSide tokens ("), size(c).cast("string"),
        lit(") — slice the inputs or raise the cap (<= 47)"))))
      .otherwise(c)
    val base = pairs.select(idCol.as("id"),
        capped(refToks, "ref").as("__r"), capped(candToks, "cand").as("__c"))
      .withColumn("__v", array_distinct(concat(col("__r"), col("__c"))))
    val refStr = array_join(col("__r"), " ")
    val candStr = array_join(col("__c"), " ")
    base
      .withColumn("ref_len", size(col("__r")))
      .withColumn("cand_len", size(col("__c")))
      .withColumn("wer",
        when(col("ref_len") > 0,
          round(levenshtein(enc(col("__r"), col("__v")),
            enc(col("__c"), col("__v"))).cast("double") / col("ref_len"), 4))
          .otherwise(lit(0.0)))
      .withColumn("cer",
        when(length(refStr) > 0,
          round(levenshtein(refStr, candStr).cast("double") / length(refStr), 4))
          .otherwise(lit(0.0)))
      .drop("__r", "__c", "__v")
  }

  /** Shared precision/BP/score projection over clipped/total/len columns. */
  private def scored(df: DataFrame, maxN: Int): DataFrame = {
    val withP = (1 to maxN).foldLeft(df) { case (d, n) =>
      d.withColumn(s"p$n",
        when(col(s"total_$n") > 0,
          round(col(s"clipped_$n").cast("double") / col(s"total_$n"), 4))
          .otherwise(lit(0.0)))
    }
    val anyZero = (1 to maxN).map(n =>
      col(s"total_$n") === 0 || col(s"clipped_$n") === 0)
      .reduce(_ || _)
    val logSum = (1 to maxN).map(n =>
      log(col(s"clipped_$n").cast("double") / col(s"total_$n")))
      .reduce(_ + _)
    val bp = when(col("cand_len") >= col("ref_len"), lit(1.0))
      .otherwise(exp(lit(1.0) -
        col("ref_len").cast("double") / col("cand_len")))
    withP
      .withColumn("bp", when(col("cand_len") > 0, round(bp, 4)).otherwise(lit(0.0)))
      .withColumn("bleu",
        when(col("cand_len") === 0 || anyZero, lit(0.0))
          .otherwise(round(bp * exp(logSum / maxN), 4)))
  }
}
