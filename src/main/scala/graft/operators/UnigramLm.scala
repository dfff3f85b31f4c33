package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram language-model tokenizer (Kudo,
  * arXiv:1804.10959) — the third member of the subword-tokenizer family
  * next to [[BpeTrainer]] (merge-based) and [[WordPiece]] (likelihood-
  * greedy): pieces carry unigram probabilities, training is EM over all
  * segmentations (forward–backward per word), and encoding is the Viterbi
  * best segmentation.
  *
  * Same scale architecture as BPE/WordPiece training: the corpus appears
  * ONLY through the distributed (word, freq) type aggregation; the EM loop
  * runs driver-side over the vocabulary-sized type table (capped collect,
  * [[BpeTrainer.DefaultMaxTypes]] discipline). Encoding is distributed —
  * Viterbi runs once per distinct word type on the cluster, then
  * broadcast-joins back to token occurrences, so per-document work never
  * reshuffles the corpus.
  *
  * Oracle portability (the reason for the fixed shapes): piece length is
  * capped at [[MaxPieceLen]] so the forward/backward recursions carry a
  * 4-slot state replayable as a recursive CTE; term order inside every
  * float sum is pinned (l = 1..4, left-associated); expected counts are
  * gridded to 1e9 fixed-point per occurrence and summed as exact integers
  * (the GridSum convention — corpus-order-independent on both engines);
  * probabilities are re-derived from the integer counts with one division.
  * Fixed iteration count, fixed seed-vocabulary rule (all single chars +
  * top-`topMultis` multi-char substrings by weighted count, UTF-8-ordered
  * ties) — no pruning schedule, which real SentencePiece adds on top.
  */
object UnigramLm {

  /** Max piece length — fixes the recursion arity (4-slot carried state)
    * on both the driver loop and the oracle's recursive CTE. */
  val MaxPieceLen = 4

  final case class Model(counts: Seq[(String, BigInt)], probs: Map[String, Double]) {
    /** Pieces ranked by (final expected grid count desc, piece in UTF-8
      * order) — the training output table's order. */
    def ranked: Seq[(String, BigInt)] =
      counts.sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2 else BpeTrainer.u8Less(a._1, b._1)
      }
  }

  /** (word, freq) over a raw single-space-joined text column: the one
    * distributed, corpus-sized step (map-side-combined hash agg). */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.where(col(textCol).isNotNull && col(textCol) =!= "")
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train over a (word, freq) type table: seed vocabulary, then
    * `iterations` EM rounds. Driver-side over the capped type collect. */
  def train(words: DataFrame, wordCol: String, freqCol: String,
            topMultis: Int = 24, iterations: Int = 2,
            maxTypes: Int = BpeTrainer.DefaultMaxTypes): Model = {
    require(topMultis >= 0 && iterations >= 1)
    val rows = words.select(col(wordCol).cast("string").as("w"),
        col(freqCol).cast("long").as("f"))
      .limit(maxTypes + 1).collect()
    require(rows.length <= maxTypes,
      s"word-type table exceeds maxTypes=$maxTypes; prefilter low-frequency " +
        "types before unigram training or raise maxTypes")
    val types: Array[(String, Long)] =
      rows.map(r => (r.getString(0), r.getLong(1)))

    // seed: weighted substring counts, exact integers
    val subCnt = scala.collection.mutable.HashMap.empty[String, BigInt]
    types.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= MaxPieceLen && i + l <= w.length) {
          val pc = w.substring(i, i + l)
          subCnt.update(pc, subCnt.getOrElse(pc, BigInt(0)) + f)
          l += 1
        }
        i += 1
      }
    }
    val singles = subCnt.iterator.filter(_._1.length == 1).toSeq
    val multis = subCnt.iterator.filter(_._1.length >= 2).toSeq
      .sortWith { (a, b) =>
        if (a._2 != b._2) a._2 > b._2 else BpeTrainer.u8Less(a._1, b._1)
      }.take(topMultis)
    var counts: Seq[(String, BigInt)] = singles ++ multis
    def probsOf(cs: Seq[(String, BigInt)]): Map[String, Double] = {
      val tot = cs.iterator.map(_._2).sum.doubleValue
      cs.iterator.map { case (pc, c) => pc -> c.doubleValue / tot }.toMap
    }
    var probs = probsOf(counts)

    for (_ <- 1 to iterations) {
      val next = scala.collection.mutable.HashMap.empty[String, BigInt]
      types.foreach { case (w, f) =>
        val n = w.length
        // forward: alpha(i) over boundary positions 0..n, pinned term order
        val al = new Array[Double](n + 1)
        al(0) = 1.0
        var i = 1
        while (i <= n) {
          var s = 0.0
          var l = 1
          while (l <= MaxPieceLen) {
            if (l <= i) s = s + al(i - l) * probs.getOrElse(w.substring(i - l, i), 0.0)
            l += 1
          }
          al(i) = s
          i += 1
        }
        // backward
        val be = new Array[Double](n + 1)
        be(n) = 1.0
        i = n - 1
        while (i >= 0) {
          var s = 0.0
          var l = 1
          while (l <= MaxPieceLen) {
            if (i + l <= n) s = s + probs.getOrElse(w.substring(i, i + l), 0.0) * be(i + l)
            l += 1
          }
          be(i) = s
          i -= 1
        }
        val z = al(n)
        // occurrence posteriors, gridded per occurrence then exact-summed
        var j = 0
        while (j < n) {
          var l = 1
          while (l <= MaxPieceLen && j + l <= n) {
            val pc = w.substring(j, j + l)
            probs.get(pc).foreach { pr =>
              val e = al(j) * pr * be(j + l) / z
              val g = math.round(f.toDouble * e * 1e9)
              next.update(pc, next.getOrElse(pc, BigInt(0)) + g)
            }
            l += 1
          }
          j += 1
        }
      }
      counts = next.toSeq
      probs = probsOf(counts)
    }
    Model(counts, probs)
  }

  /** The ranked training output as a DataFrame: (rank, piece, grid_count).
    * grid_count is the final EM round's 1e9-fixed-point expected count —
    * exact integers, so the gate compares no floats at all. */
  def trainTable(spark: SparkSession, model: Model, topK: Int = 50): DataFrame = {
    import spark.implicits._
    model.ranked.take(topK).zipWithIndex
      .map { case ((pc, c), i) => (i + 1, pc, c.longValue) }
      .toDF("rank", "piece", "grid_count")
  }

  /** Viterbi best-segmentation piece count for one word: candidates in
    * l = 1..4 order, strictly-greater comparison — the smallest l wins
    * exact ties (equal-probability segmentations exist whenever two pieces
    * commute), mirrored by the oracle's first-match CASE. */
  def viterbiPieces(w: String, probs: Map[String, Double]): Int = {
    val n = w.length
    val best = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    best(0) = 1.0
    var i = 1
    while (i <= n) {
      var b = -1.0
      var bc = 0
      var l = 1
      while (l <= MaxPieceLen) {
        if (l <= i) {
          val s = best(i - l) * probs.getOrElse(w.substring(i - l, i), 0.0)
          if (s > b) { b = s; bc = cnt(i - l) + 1 }
        }
        l += 1
      }
      best(i) = b; cnt(i) = bc
      i += 1
    }
    cnt(n)
  }

  /** Gridded −ln ceiling for a word whose best segmentation probability is
    * exactly zero (possible only if EM zeroes every piece of the word's
    * sole segmentation — ~e⁻⁸⁰, far below any reachable probability).
    * A fixed constant keeps the score finite and engine-portable. */
  val ZeroProbGrid = 80000000L

  /** Viterbi best segmentation for one word, returning BOTH the piece
    * count ([[viterbiPieces]]'s value, same tie rule) and the segmentation
    * score as the 1e6-gridded negative log probability — an exact LONG, so
    * per-document sums reorder freely (the GridSum convention). The ln is
    * taken once per word TYPE on a probability derived through a fixed
    * IEEE expression both engines replay, then gridded — the same
    * round-before-ranking discipline the sampling oracles use. */
  def viterbiScore(w: String, probs: Map[String, Double]): (Int, Long) = {
    val n = w.length
    val best = new Array[Double](n + 1)
    val cnt = new Array[Int](n + 1)
    best(0) = 1.0
    var i = 1
    while (i <= n) {
      var b = -1.0
      var bc = 0
      var l = 1
      while (l <= MaxPieceLen) {
        if (l <= i) {
          val s = best(i - l) * probs.getOrElse(w.substring(i - l, i), 0.0)
          if (s > b) { b = s; bc = cnt(i - l) + 1 }
        }
        l += 1
      }
      best(i) = b; cnt(i) = bc
      i += 1
    }
    val g = if (best(n) > 0) math.round(-math.log(best(n)) * 1e6) else ZeroProbGrid
    (cnt(n), g)
  }

  /** CCNet-style perplexity quality filter (Wenzek et al., arXiv:1911.00359
    * — language-model perplexity as the data-quality signal, corpus
    * bucketed into head/middle/tail thirds). Score = per-piece cross
    * entropy of the Viterbi best segmentation under the trained unigram
    * LM: Σ_w −ln p(best seg of w) / Σ_w pieces(w), both sums exact LONGs
    * (the −ln gridded to 1e6 per word TYPE, summed per document).
    * Buckets are exact global tertiles of (xent asc, id) — ranked through
    * [[RangePrefix]], so no corpus-wide window exists (the CCNet cut
    * itself is a global order statistic; the two-level prefix is its
    * scalable form).
    *
    * Scale shape: the corpus appears through one word explode + one
    * broadcast join of the type-sized score table + one per-doc agg; the
    * rank is the audited two-level scheme. Output:
    * (id, n_pieces, xent, bucket). */
  def pplStats(df: DataFrame, textCol: String, idCol: String,
               probs: Map[String, Double]): DataFrame = {
    val ew = df.where(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
    val vUdf = udf((w: String) => viterbiScore(w, probs))
    val wp = ew.select(col("__w")).distinct()
      .withColumn("__s", vUdf(col("__w")))
      .select(col("__w"), col("__s._1").as("__pieces"), col("__s._2").as("__g"))
    val perDoc = ew.join(broadcast(wp), "__w")
      .groupBy(col(idCol))
      .agg(sum(col("__pieces").cast("long")).as("__np"), sum(col("__g")).as("__gs"))
      .withColumn("xent",
        round(col("__gs").cast("double") / 1e6 / col("__np"), 4))
    val n = perDoc.agg(count(lit(1)).as("__n"))
    RangePrefix.runningRank(
        RangePrefix.withBucket(perDoc, col("xent")),
        Seq(col("xent"), col(idCol)), "__rk")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("__np").cast("int").as("n_pieces"), col("xent"),
        when(col("__rk") * 3 <= col("__n"), "head")
          .when(col("__rk") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Per-document encode statistics: (id, n_words, n_pieces, fertility).
    * Viterbi runs distributed once per distinct word type; the piece-count
    * table (type-table-sized) broadcast-joins back to the exploded corpus,
    * which then aggregates per document with exact integers only. */
  def encodeStats(df: DataFrame, textCol: String, idCol: String,
                  probs: Map[String, Double]): DataFrame = {
    val ew = df.where(col(textCol).isNotNull && col(textCol) =!= "")
      .select(col(idCol), explode(split(col(textCol), " ")).as("__w"))
      .where(col("__w") =!= "")
    val vUdf = udf((w: String) => viterbiPieces(w, probs))
    val wp = ew.select(col("__w")).distinct()
      .withColumn("__pieces", vUdf(col("__w")))
    ew.join(broadcast(wp), "__w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__nw"), sum(col("__pieces")).as("__np"))
      .select(col(idCol), col("__nw").cast("int").as("n_words"),
        col("__np").cast("int").as("n_pieces"),
        round(col("__np").cast("double") / col("__nw"), 4).as("fertility"))
  }
}
