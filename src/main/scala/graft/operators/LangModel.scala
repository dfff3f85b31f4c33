package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-trained n-gram language-model scoring — the CCNet/Gopher-style
  * "perplexity filter" of LLM data pipelines: score every document by its
  * cross-entropy under a bigram model with add-alpha smoothing, so a
  * downstream filter can drop the gibberish tail (high cross-entropy) and
  * the boilerplate head (abnormally low).
  *
  * Model: P(w2 | w1) = (c(w1 w2) + alpha) / (c(w1 *) + alpha * V), where
  * c(w1 w2) is the corpus bigram count, c(w1 *) the count of w1 as a bigram
  * context (= sum of its bigram counts), and V the corpus vocabulary size.
  * Document score = mean over its bigram positions of -ln P — exactly
  * reproducible in ANSI SQL, which is what makes the whole train+score path
  * hash-checkable (real pipelines swap in a KenLM; the distributed shape is
  * identical).
  *
  * Scale shape (the point — training touches every token of a 100 TB
  * corpus):
  *  - bigrams are formed per row with `zip_with` over the token array
  *    (narrow, no explode until counting);
  *  - both count tables are hash aggregations with MAP-SIDE partials — the
  *    shuffle carries distinct-ngrams-per-partition, not the token stream;
  *  - context counts derive from the (already aggregated) bigram table, not
  *    from a second corpus pass;
  *  - scoring re-joins the exploded bigram stream against the count tables
  *    on the ngram key: two shuffle joins whose build side is the MODEL
  *    (vocabulary-sized, far smaller than the corpus at scale) — never a
  *    driver-side model collect, never a broadcast of an unbounded vocab;
  *  - V and the smoothing constants travel as a broadcast 1-row relation.
  */
object LangModel {

  /** (doc_id-keyed) bigram cross-entropy per document.
    *
    * Output: idCol, n_bigrams (long, 0 for docs with < 2 tokens),
    * cross_entropy (double rounded to 4, NULL when n_bigrams = 0).
    */
  def bigramCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                         alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val id = col(idCol)
    val ws = TextFunctions.wsTokens(lower(col(textCol)))

    val toks = df.select(id, ws.as("ws"))

    // bigram strings per doc: tokens are whitespace-split, so ' ' is a safe
    // joiner and substring_index/split_part recovers the context word.
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (a, b) => concat(a, lit(" "), b))

    val bgl = toks.where(size(col("ws")) >= 2)
      .select(id, explode(bigrams).as("bg"))

    // --- train ---
    val bgCounts = bgl.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val ctxCounts = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    // --- score ---
    val p = (col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))
    val perDoc = bgl
      .join(bgCounts, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctxCounts, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(p)), 4).as("cross_entropy"))

    df.select(id).join(perDoc, Seq(idCol), "left")
      .select(id,
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("cross_entropy"))
  }

  /** Interpolated Kneser–Ney bigram cross-entropy per document (Kneser &
    * Ney 1995; Chen & Goodman 1999's interpolated form) — the smoothing
    * real LM toolchains (KenLM, SRILM) default to, next to the add-alpha
    * baseline above:
    *
    *   P(w2|w1) = max(c(w1 w2) - D, 0)/c(w1 ·)
    *            + D · N1+(w1 ·)/c(w1 ·) · N1+(· w2)/N1+(· ·)
    *
    * where D = `discount`, N1+(w1 ·) = distinct continuations of w1,
    * N1+(· w2) = distinct contexts w2 follows (the continuation count that
    * makes "Francisco" cheap despite its unigram frequency), N1+(· ·) =
    * total bigram types. Scoring the training corpus itself means every
    * scored bigram has c >= 1 and every context exists, so the max(·,0)
    * and unseen-context branches never truncate — all four statistics are
    * exact integers and the probability is a deterministic double.
    *
    * Same scale shape as [[bigramCrossEntropy]]: all three model tables
    * derive from the ONE aggregated bigram-count table (no second corpus
    * pass), scoring joins the bigram stream against vocabulary-sized model
    * tables on the ngram key, and the type total travels as a broadcast
    * one-row relation.
    *
    * Output: idCol, n_bigrams (0 for <2-token docs), kn_entropy
    * (round-4 mean -ln P, NULL when n_bigrams = 0). */
  def knCrossEntropy(df: DataFrame, textCol: String, idCol: String,
                     discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount in (0,1), got $discount")
    val id = col(idCol)
    val ws = TextFunctions.wsTokens(lower(col(textCol)))
    val toks = df.select(id, ws.as("ws"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (a, b) => concat(a, lit(" "), b))
    val bgl = toks.where(size(col("ws")) >= 2)
      .select(id, explode(bigrams).as("bg"))
    val bgCounts = bgl.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val ctx = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1f"))
    val cont = bgCounts
      .groupBy(substring_index(col("bg"), " ", -1).as("w2"))
      .agg(count(lit(1)).as("nctx"))
    val types = bgCounts.agg(count(lit(1)).cast("double").as("b"))
    val p = (col("c12") - lit(discount)) / col("c1") +
      lit(discount) * col("n1f") / col("c1") * (col("nctx") / col("b"))
    val perDoc = bgl
      .join(bgCounts, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .join(ctx, "w1")
      .join(cont, "w2")
      .crossJoin(broadcast(types))
      .groupBy(id)
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(-log(p)), 4).as("kn_entropy"))
    df.select(id).join(perDoc, Seq(idCol), "left")
      .select(id, coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("kn_entropy"))
  }

  /** DSIR-style importance weights (Xie et al. 2302.03169: Data Selection
    * via Importance Resampling): score every raw document by how much more
    * likely its HASHED bigram features are under the target distribution
    * than under the raw pool, w(doc) = mean over bigram occurrences of
    * ln p_target(bucket) - ln p_raw(bucket), with add-alpha smoothing over
    * `buckets` hash buckets. High weight = looks like the target corpus;
    * resampling by w is the selection step.
    *
    * The hashing trick is the point at scale: the MODEL is two
    * `buckets`-sized count tables (never a vocabulary), so training is one
    * corpus pass into a tiny hash aggregation and scoring re-joins each
    * bigram occurrence against a BROADCAST model — the corpus itself never
    * shuffles; the only doc-keyed exchange is the final per-doc mean.
    *
    * The bucket hash is the engine-portable md5-hex idiom (two hex chars =
    * 0..255, mod `buckets`) shared with [[graft.functions.Embedder
    * .hashedComponents]], so an ANSI oracle can replay the whole pipeline.
    *
    * Output: idCol, n_feats (bigram occurrences, 0 for <2-token docs),
    * imp_weight (rounded 4, NULL when n_feats = 0).
    */
  def importanceWeights(df: DataFrame, textCol: String, idCol: String,
                        isTarget: Column, buckets: Int = 256,
                        alpha: Double = 0.5, seed: Int = 42): DataFrame = {
    require(buckets >= 1 && buckets <= 256, s"buckets must be in [1,256], got $buckets")
    require(alpha > 0.0, s"alpha must be > 0, got $alpha")
    val id = col(idCol)
    val ws = TextFunctions.wsTokens(lower(col(textCol)))
    val toks = df.select(id, isTarget.as("is_t"), ws.as("ws"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (a, b) => concat(a, lit(" "), b))
    val hexVal: Column => Column = c => instr(lit("0123456789abcdef"), c) - 1
    // ONE corpus tokenize pass: per-(doc, bucket) occurrence counts. Both
    // the model and the scores derive from this doc×bucket table (bounded
    // by docs × `buckets`, far smaller than the occurrence stream), so the
    // text is never re-scanned for scoring.
    val db = toks.where(size(col("ws")) >= 2)
      .select(id, col("is_t"), explode(bigrams).as("bg"))
      .withColumn("h", md5(concat(col("bg"), lit("#" + seed))))
      .select(id, col("is_t"),
        pmod(hexVal(substring(col("h"), 1, 1)) * 16 +
          hexVal(substring(col("h"), 2, 1)), lit(buckets)).cast("int").as("b"))
      .groupBy(id, col("is_t"), col("b")).agg(count(lit(1)).as("n"))
      .localCheckpoint()
    // model: per-bucket raw + target counts (key space = `buckets`) and the
    // two corpus totals; both tiny, so the scoring join broadcasts.
    val counts = db.groupBy(col("b")).agg(
      sum(col("n")).as("cr"),
      sum(when(col("is_t"), col("n")).otherwise(0L)).as("ct"))
    val totals = counts.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val model = counts.crossJoin(broadcast(totals))
      .withColumn("lr",
        log((col("ct") + lit(alpha)) / (col("nt") + lit(alpha * buckets))) -
          log((col("cr") + lit(alpha)) / (col("nr") + lit(alpha * buckets))))
      .select(col("b"), col("lr"))
    // occurrence-weighted mean log-ratio == avg over the occurrence stream
    val perDoc = db.join(broadcast(model), "b")
      .groupBy(id)
      .agg(sum(col("n")).as("n_feats"),
        round(sum(col("n") * col("lr")) / sum(col("n")), 4).as("imp_weight"))
    df.select(id).join(perDoc, Seq(idCol), "left")
      .select(id, coalesce(col("n_feats"), lit(0L)).as("n_feats"), col("imp_weight"))
  }

  /** One DoReMi-style domain-reweighting round (Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — the exponentiated-gradient update over domain
    * weights, with the trained-model losses stood in by the in-engine
    * add-alpha bigram LM):
    *
    *   excess(s) = max(0, L(s) - L(corpus)),
    *   w'(s) ∝ w0(s) · exp(eta · excess(s)),
    *
    * where L(s) is domain s's mean bigram NLL under the ONE corpus-trained
    * model and w0 is the domain's bigram share (the observed mixture). A
    * domain whose loss exceeds the corpus average is upweighted — the
    * worst-case-domain pressure that makes DoReMi mixtures robust.
    *
    * Determinism contract: each bigram's -ln p is gridded to 1e9 and
    * summed as LONG (exact under reorder — the kruskal convention), so
    * L(s) is an exact integer ratio; the exp argument is rounded to 9
    * before exp so both engines exponentiate the identical double.
    *
    * Scale shape: one corpus pass for the bigram stream; model tables are
    * vocabulary-sized equi-joins (the [[bigramCrossEntropy]] plan); the
    * weight update runs on the DOMAIN table (a handful of rows). Output:
    * (srcCol, n_bigrams, w0, nll, excess, w1), ordered by caller. */
  def doremiRound(df: DataFrame, textCol: String, srcCol: String,
                  alpha: Double = 0.5, eta: Double = 1.0): DataFrame = {
    require(alpha > 0.0 && eta > 0.0)
    val src = col(srcCol)
    val ws = TextFunctions.wsTokens(lower(col(textCol)))
    val toks = df.select(src, ws.as("ws"))
    val bigrams = zip_with(
      slice(col("ws"), lit(1), size(col("ws")) - 1),
      slice(col("ws"), lit(2), size(col("ws")) - 1),
      (a, b) => concat(a, lit(" "), b))
    val bgl = toks.where(size(col("ws")) >= 2)
      .select(src, explode(bigrams).as("bg"))
    val bgCounts = bgl.groupBy(col("bg")).agg(count(lit(1)).as("c12"))
    val ctxCounts = bgCounts
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val vocab = toks.select(explode(col("ws")).as("w"))
      .agg(countDistinct(col("w")).as("v"))
    val p = (col("c12") + lit(alpha)) / (col("c1") + lit(alpha) * col("v"))
    val perSrc = bgl
      .join(bgCounts, "bg")
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .join(ctxCounts, "w1")
      .crossJoin(broadcast(vocab))
      .groupBy(src)
      .agg(count(lit(1)).as("n_bigrams"),
        sum(round(-log(p) * 1e9).cast("long")).as("nll9"))
    val tot = perSrc.agg(sum(col("n_bigrams")).as("nt"),
      sum(col("nll9")).as("nllt9"))
    val upd = perSrc.crossJoin(broadcast(tot))
      .withColumn("w0", col("n_bigrams").cast("double") / col("nt"))
      .withColumn("nll", col("nll9") / 1e9 / col("n_bigrams"))
      .withColumn("excess", greatest(lit(0.0),
        round(col("nll") - col("nllt9") / 1e9 / col("nt"), 9)))
      // wraw gridded to 1e9 LONG so the normalizer is an exact integer sum
      // (domain-count rows, but exactness costs nothing and kills the
      // engine-order last-ulp class outright)
      .withColumn("wraw9",
        round(col("w0") * exp(lit(eta) * col("excess")) * 1e9).cast("long"))
    val z = upd.agg(sum(col("wraw9")).as("z9"))
    upd.crossJoin(broadcast(z))
      .select(src, col("n_bigrams"),
        round(col("w0"), 6).as("w0"),
        round(col("nll"), 6).as("nll"),
        round(col("excess"), 6).as("excess"),
        round(col("wraw9").cast("double") / col("z9"), 4).as("w1"))
  }
}
