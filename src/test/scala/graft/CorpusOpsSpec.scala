package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Chunker, CorpusStats, LangModel}

/** Specs for the corpus-pipeline additions: sliding-window chunking,
  * bigram-LM cross-entropy, and the corpus observability operators. Each is
  * pinned against an independent in-memory brute-force reference (the
  * DuckDB oracles cover the fixture path; these cover the semantics on
  * adversarial small inputs).
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------- sliding chunks ----------------

  private def slide(text: String, window: Int, stride: Int): Seq[(Int, Int, String)] =
    Seq((1L, text)).toDF("doc_id", "text")
      .transform(df => Chunker.slideChunk(df, "text", window, stride))
      .select($"chunk_id", $"start_word", $"chunk_text")
      .as[(Int, Int, String)].collect().toSeq.sortBy(_._1)

  /** Brute-force reference: Python-style split(' '), starts at every
    * multiple of stride below max(len, 1). */
  private def slideRef(text: String, window: Int, stride: Int): Seq[(Int, Int, String)] = {
    val words = text.split(" ", -1).toSeq
    val lastStart = math.max(words.length - 1, 0) / stride
    (0 to lastStart).map(g =>
      (g, g * stride, words.slice(g * stride, g * stride + window).mkString(" ")))
  }

  test("sliding chunks match the brute-force reference across shapes") {
    for {
      n <- Seq(1, 5, 31, 32, 33, 64, 97)
      (w, s) <- Seq((8, 8), (8, 4), (5, 2), (48, 32), (3, 1))
    } {
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      assert(slide(text, w, s) === slideRef(text, w, s), s"n=$n window=$w stride=$s")
    }
  }

  test("consecutive sliding chunks overlap by window - stride words") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val got = slide(text, 48, 32)
    got.sliding(2).foreach {
      case Seq((_, s1, c1), (_, s2, c2)) =>
        val w1 = c1.split(" ", -1).toSeq
        val w2 = c2.split(" ", -1).toSeq
        assert(s2 - s1 === 32)
        // trailing 16 words of chunk g == leading 16 of chunk g+1
        assert(w1.drop(32) === w2.take(math.min(16, w1.length - 32)))
      case _ => ()
    }
  }

  test("stride == window reproduces non-overlapping partitioning without empty tail") {
    val text = (1 to 6).map(i => s"w$i").mkString(" ")
    assert(slide(text, 3, 3).map(_._3) === Seq("w1 w2 w3", "w4 w5 w6"))
  }

  test("sliding chunk parameter guards") {
    assertThrows[IllegalArgumentException](Chunker.slidingChunks(lit("a"), 0, 1))
    assertThrows[IllegalArgumentException](Chunker.slidingChunks(lit("a"), 4, 5))
    assertThrows[IllegalArgumentException](Chunker.slidingChunks(lit("a"), 4, 0))
  }

  // ---------------- bigram LM cross-entropy ----------------

  test("bigram cross-entropy matches a brute-force add-alpha model") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "dogs bark"),
      (4L, "single"),
      (5L, "the cat sat on the mat")) // exact dup of doc 1
    val alpha = 0.5

    // reference model built imperatively
    val tokens = docs.map { case (id, t) => id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val allBigrams = tokens.flatMap { case (_, ws) => ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")) }
    val bgCount = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctxCount = bgCount.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val v = tokens.flatMap(_._2).distinct.size
    def xent(ws: Seq[String]): Option[Double] = {
      val bgs = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      if (bgs.isEmpty) None
      else {
        val nll = bgs.map { bg =>
          val w1 = bg.split(" ")(0)
          -math.log((bgCount(bg) + alpha) / (ctxCount(w1) + alpha * v))
        }
        Some(BigDecimal(nll.sum / nll.size).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }

    val got = LangModel.bigramCrossEntropy(docs.toDF("doc_id", "text"), "text", "doc_id", alpha)
      .select($"doc_id", $"n_bigrams", $"cross_entropy")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq

    for ((id, ws) <- tokens) {
      val (_, nBg, ce) = got(id.toInt - 1)
      assert(nBg === math.max(ws.length - 1, 0), s"doc $id n_bigrams")
      assert(ce === xent(ws), s"doc $id cross_entropy")
    }
    // identical docs score identically; the dup scores lower (more probable)
    // than the singleton-bigram doc
    assert(got(0)._3 === got(4)._3)
    assert(got(0)._3.get < got(2)._3.get)
  }

  test("Kneser-Ney cross-entropy matches a brute-force interpolated-KN model") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ran"),
      (3L, "san francisco san francisco"), // 'francisco' follows ONE context
      (4L, "single"),
      (5L, "the cat sat on the mat"))
    val d = 0.75
    val tokens = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq }
    val allBigrams = tokens.flatMap { case (_, ws) =>
      ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")) }
    val bgCount = allBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ctxC = bgCount.groupBy(_._1.split(" ")(0)).view.mapValues(_.values.sum).toMap
    val ctxN = bgCount.groupBy(_._1.split(" ")(0)).view.mapValues(_.size).toMap
    val contN = bgCount.groupBy(_._1.split(" ")(1)).view.mapValues(_.size).toMap
    val types = bgCount.size.toDouble
    def xent(ws: Seq[String]): Option[Double] = {
      val bgs = ws.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
      if (bgs.isEmpty) None
      else {
        val nll = bgs.map { bg =>
          val Array(w1, w2) = bg.split(" ")
          val p = (bgCount(bg) - d) / ctxC(w1) +
            d * ctxN(w1) / ctxC(w1) * (contN(w2) / types)
          -math.log(p)
        }
        Some(BigDecimal(nll.sum / nll.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = LangModel.knCrossEntropy(docs.toDF("doc_id", "text"), "text", "doc_id", d)
      .select($"doc_id", $"n_bigrams", $"kn_entropy")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    for ((id, ws) <- tokens) {
      val (_, nBg, ce) = got(id.toInt - 1)
      assert(nBg === math.max(ws.length - 1, 0), s"doc $id n_bigrams")
      assert(ce === xent(ws), s"doc $id kn_entropy")
    }
    assert(got(0)._3 === got(4)._3) // identical docs score identically
    assert(got(3)._3.isEmpty && got(3)._2 === 0L) // 1-token doc: no bigrams
  }

  test("cross-entropy is invariant under repartitioning (deterministic aggregation)") {
    val docs = (1L to 40L).map(i => (i, s"alpha b$i gamma alpha b${i % 7} delta")).toDF("doc_id", "text")
    val a = LangModel.bigramCrossEntropy(docs, "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    val b = LangModel.bigramCrossEntropy(docs.repartition(7), "text", "doc_id")
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  // ---------------- corpus stats ----------------

  test("profile aggregates per-source doc/token/lang/short counts") {
    val docs = Seq(
      ("web", "the cat is on the mat and it is happy today"), // en, 11 words
      ("web", "tiny"),                                        // short, und
      ("books", "el gato es un animal y es muy bonito aqui")) // es
      .toDF("source", "text").select($"source", $"text")
    val got = CorpusStats.profile(docs, "text", "source")
      .select($"source", $"n_docs", $"n_tokens", $"n_short", $"n_en")
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("books", 1L, 10L, 1L, 0L), ("web", 2L, 12L, 2L, 1L)))
  }

  test("JS divergence: 0 for identical term distributions, ln2 for disjoint, between otherwise") {
    val docs = Seq(
      ("a", "x y z x"), ("b", "x y z x"),      // identical distributions
      ("c", "p q r s"),                         // disjoint from a/b
      ("d", "x y p q"))                         // half-overlapping
      .toDF("source", "text")
    val got = CorpusStats.jsDivergenceMatrix(docs, "text", "source")
      .select($"source_a", $"source_b", $"js", $"js_norm")
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("a", "b")) === ((0.0, 0.0)))
    assert(got(("a", "c"))._2 === 1.0, "disjoint support must normalize to 1")
    assert(math.abs(got(("a", "c"))._1 - math.log(2.0)) < 1e-4)
    val half = got(("a", "d"))._2
    assert(half > 0.0 && half < 1.0, s"partial overlap should land inside (0,1): $half")
    // symmetric measure: flipping which source sorts first cannot change js
    val flipped = CorpusStats.jsDivergenceMatrix(
      docs.withColumn("source", when($"source" === "a", "zz").otherwise($"source")),
      "text", "source")
      .where($"source_a" === "d" && $"source_b" === "zz")
      .select($"js_norm").as[Double].head()
    assert(flipped === half)
  }

  test("source overlap counts distinct shared fingerprints once per source pair") {
    val docs = Seq(
      ("a", "x"), ("a", "x"), // duplicate fp within source a: counted once
      ("b", "x"), ("c", "x"), // fp x shared by a,b,c -> 3 pairs
      ("a", "y"), ("b", "y"), // fp y shared by a,b
      ("c", "z"))             // unshared
      .toDF("source", "text")
    val got = CorpusStats.sourceOverlapMatrix(docs, md5($"text"), "source")
      .as[(String, String, Long)].collect().sortBy(p => (p._1, p._2)).toSeq
    assert(got === Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L)))
  }

  test("cluster size histogram") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 6L))
      .toDF("doc_id", "cluster_id")
    val got = CorpusStats.clusterSizeHistogram(clusters)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("centroid outliers pick the k farthest members per group, rank ascending by similarity") {
    // group g1: 9 vectors near (1,0), one antipodal outlier; g2: all aligned
    val rows =
      (1L to 9L).map(i => (i, "g1", Array(1f, 0.01f * i))) ++
        Seq((10L, "g1", Array(-1f, 0f))) ++
        (11L to 14L).map(i => (i, "g2", Array(0f, 1f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = CorpusStats.centroidOutliers(df, "embedding", "vec_id", "label", k = 3)
      .select($"label", $"rank", $"vec_id", $"centroid_sim")
      .as[(String, Int, Long, Double)].collect().toSeq

    val g1 = got.filter(_._1 == "g1").sortBy(_._2)
    assert(g1.head._3 === 10L)                   // antipodal vector is rank 1
    assert(g1.map(_._4) === g1.map(_._4).sorted) // ascending similarity
    assert(g1.size === 3)

    val g2 = got.filter(_._1 == "g2").sortBy(_._2)
    assert(g2.size === 3)                        // k caps the group
    assert(g2.map(_._3) === Seq(11L, 12L, 13L))  // ties break by id ascending
  }

  // ---------------- Gopher quality rules ----------------

  private val stop10 = Seq("the", "a", "of", "and", "to", "in", "is", "was", "for", "with")

  private def gopher(docs: Seq[(Long, String)]) =
    CorpusStats.gopherQuality(docs.toDF("doc_id", "text"), "text", "doc_id", stop10)
      .select($"doc_id", $"n_words", $"mean_word_len", $"frac_unique",
        $"token_entropy", $"has_stopwords", $"gopher_pass")
      .as[(Long, Long, Option[Double], Option[Double], Option[Double], Boolean, Option[Boolean])]
      .collect().sortBy(_._1).toSeq

  test("gopher quality: repeated-word doc has zero entropy, unique doc has ln(n)") {
    val uniq = (1 to 64).map(i => s"word$i").mkString(" ")
    val got = gopher(Seq((1L, "spam spam spam spam"), (2L, uniq)))
    val rep = got(0); val unq = got(1)
    assert(rep._3 === Some(4.0))                     // mean word len
    assert(rep._4 === Some(0.25))                    // 1 unique / 4
    assert(rep._5 === Some(0.0))                     // H = 0 for a constant
    assert(!rep._6 && rep._7 === Some(false))
    assert(unq._4 === Some(1.0))
    assert(unq._5 === Some(BigDecimal(math.log(64))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    assert(unq._7 === Some(false))                   // no stopwords
  }

  test("gopher quality: empty doc keeps a row with NULL metrics and false verdict") {
    val got = gopher(Seq((1L, "")))
    assert(got === Seq((1L, 0L, None, None, None, false, Some(false))))
  }

  test("gopher quality: stopword threshold needs two DISTINCT stopwords; verdict composes") {
    val body = (1 to 60).map(i => s"tok$i").mkString(" ")
    val got = gopher(Seq(
      (1L, s"the the the $body"),   // one distinct stopword -> fail
      (2L, s"the of $body")))       // two -> pass (62 words, mwl ~4, unique)
    assert(!got(0)._6 && got(0)._7 === Some(false))
    assert(got(1)._6 && got(1)._7 === Some(true))
  }

  // ---------------- DSIR importance weights ----------------

  test("DSIR weights rank target-like docs above raw-like docs") {
    // target vocabulary {alpha..}, raw-pool vocabulary {zulu..}; the scored
    // docs are drawn purely from one side each.
    val tgt = (1 to 6).map(i => (i.toLong, true,
      (1 to 30).map(j => s"alpha${(i + j) % 7}").mkString(" ")))
    val raw = (7 to 12).map(i => (i.toLong, false,
      (1 to 30).map(j => s"zulu${(i + j) % 7}").mkString(" ")))
    val df = (tgt ++ raw).toDF("doc_id", "is_tgt", "text")
    val got = LangModel.importanceWeights(df, "text", "doc_id", col("is_tgt"))
      .select($"doc_id", $"n_feats", $"imp_weight")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1)
    val (t, r) = got.partition(_._1 <= 6)
    assert(t.forall(_._3.get > 0.0), s"target docs should score positive: ${t.toSeq}")
    assert(r.forall(_._3.get < 0.0), s"raw-only docs should score negative: ${r.toSeq}")
    assert(got.forall(_._2 === 29L)) // 30 tokens -> 29 bigram occurrences
  }

  test("DSIR weights: sub-2-token docs keep a row with n_feats 0 and NULL weight") {
    val df = Seq((1L, true, "hello world again"), (2L, false, "solo"))
      .toDF("doc_id", "is_tgt", "text")
    val got = LangModel.importanceWeights(df, "text", "doc_id", col("is_tgt"))
      .select($"doc_id", $"n_feats", $"imp_weight")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(got.map(x => (x._1, x._2)) === Seq((1L, 2L), (2L, 0L)))
    assert(got(1)._3 === None)
  }

  // ---------------- MinHash source sketches ----------------

  test("minhash source sketch: identical sources read 1.0, disjoint read 0.0, partial matches brute force") {
    val a = (1 to 40).map(i => s"a$i").mkString(" ")
    val b = (1 to 40).map(i => s"b$i").mkString(" ")
    val half = ((1 to 20).map(i => s"a$i") ++ (1 to 20).map(i => s"c$i")).mkString(" ")
    val df = Seq(
      ("s1", 1L, a), ("s2", 2L, a),        // identical
      ("s3", 3L, b),                        // disjoint from s1
      ("s4", 4L, half))                     // overlaps s1's first half
      .toDF("source", "doc_id", "text")
    val got = CorpusStats.minhashSourceSimilarity(df, "text", "source", numHashes = 32)
      .select($"source_a", $"source_b", $"jaccard_est", $"jaccard_exact")
      .as[(String, String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got(("s1", "s2")) === ((1.0, 1.0)))
    assert(got(("s1", "s3"))._2 === 0.0)
    assert(got(("s1", "s3"))._1 <= 0.1)      // sketch agrees nowhere (w.h.p.)
    // brute-force exact Jaccard for the partial pair
    def shingleSet(words: Seq[String]) =
      words.sliding(3).map(_.mkString(" ")).toSet
    val sa = shingleSet((1 to 40).map(i => s"a$i"))
    val s4 = shingleSet((1 to 20).map(i => s"a$i") ++ (1 to 20).map(i => s"c$i"))
    val expect = BigDecimal(sa.intersect(s4).size.toDouble / sa.union(s4).size)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("s1", "s4"))._2 === expect)
    // the 32-hash estimate tracks the exact value within sketch tolerance
    assert(math.abs(got(("s1", "s4"))._1 - expect) <= 0.25)
  }

  // ---------------- count-min sketch ----------------

  test("CMS heavy hitters: never undercounts, exact when width >> vocab, overcounts when squeezed") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val wide = CorpusStats.cmsHeavyHitters(docs, "text", topN = 20, depth = 4, width = 4096)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(wide.nonEmpty)
    // monotone: a CMS estimate can only collide upward
    wide.foreach { case (tok, ex, est) => assert(est >= ex, s"undercounted $tok") }
    // 4096 buckets for a ~31-word vocab: every estimate exact w.h.p.
    assert(wide.forall { case (_, ex, est) => est == ex })
    // squeezed to 4 buckets, collisions must show up
    val tight = CorpusStats.cmsHeavyHitters(docs, "text", topN = 20, depth = 4, width = 4)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    tight.foreach { case (tok, ex, est) => assert(est >= ex, s"undercounted $tok") }
    assert(tight.exists { case (_, ex, est) => est > ex })
  }

  test("PSI: ~0 on the same sample, grows with shift, counts out-of-range mass in edge buckets") {
    val xs = (1 to 2000).map(i => i.toDouble % 100)
    val ref = xs.toDF("v")
    def psiOf(cur: Seq[Double]): Double =
      CorpusStats.psi(ref, cur.toDF("v"), "v").as[Double].head()
    assert(psiOf(xs) === 0.0, "identical sample must read zero drift")
    val p15 = psiOf(xs.map(_ * 1.15))
    val p50 = psiOf(xs.map(_ * 1.5))
    assert(p15 > 0.0 && p50 > p15, s"PSI must grow with shift: $p15 -> $p50")
    // a sample entirely above the reference range clamps into the top
    // bucket -> near-maximal drift, not an empty histogram
    val far = psiOf(xs.map(_ + 1e6))
    assert(far > 1.0, s"out-of-range sample must register extreme drift, got $far")
  }

  test("CMS counter state is the fixed-size mergeable summary: union of halves == whole") {
    // build counters on two disjoint halves and on the union; the counter
    // tables must add cell-wise (the merge law a distributed partial-agg
    // relies on). We observe it through the public estimate surface:
    // estimates from the summed-halves table equal the whole-corpus run.
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").cache()
    val whole = CorpusStats.cmsHeavyHitters(docs, "text", topN = 10, depth = 4, width = 8)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    // the same arithmetic over doc halves, summed outside the operator
    import org.apache.spark.sql.functions.{col => c}
    val h1 = docs.where(c("doc_id") % 2 === 0)
    val h2 = docs.where(c("doc_id") % 2 =!= 0)
    def counterMap(df: org.apache.spark.sql.DataFrame): Map[(Int, Long), Long] = {
      val toks = df.select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFunctions.wsTokens(
          org.apache.spark.sql.functions.lower(c("text")))).as("token"))
      toks.groupBy("token").count()
        .withColumn("h1b", org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5(c("token")), 1, 8), 16, 10).cast("long"))
        .withColumn("h2b", org.apache.spark.sql.functions.conv(
          org.apache.spark.sql.functions.substring(
            org.apache.spark.sql.functions.md5(c("token")), 9, 8), 16, 10).cast("long"))
        .collect().flatMap { r =>
          val (n, a, b) = (r.getLong(1), r.getLong(2), r.getLong(3))
          (0 until 4).map(j => (j, (a + j * b) % 8) -> n)
        }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    }
    val merged = (counterMap(h1).toSeq ++ counterMap(h2).toSeq)
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    // estimate each whole-corpus heavy hitter from the merged-halves table
    val est = whole.keys.map { tok =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val a = java.lang.Long.parseLong(md.substring(0, 8), 16)
      val b = java.lang.Long.parseLong(md.substring(8, 16), 16)
      tok -> (0 until 4).map(j => merged((j, (a + j * b) % 8))).min
    }.toMap
    assert(est === whole)
    docs.unpersist()
  }

  test("histogram quantile estimates land within one bucket width of exact") {
    val rows = SparkEntry.queries("events_hist_quantile")(spark, TestSpark.sf)
      .select($"event_type", $"p50_est", $"p50_exact", $"p95_est", $"p95_exact")
      .as[(String, Double, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // bucket width from the fixture's per-type value range
    val ev = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .where($"value".isNotNull)
      .groupBy($"event_type")
      .agg(((org.apache.spark.sql.functions.max($"value") -
        org.apache.spark.sql.functions.min($"value")) / 64).as("w"))
      .as[(String, Double)].collect().toMap
    rows.foreach { case (t, p50e, p50x, p95e, p95x) =>
      val w = ev(t)
      assert(math.abs(p50e - p50x) <= w + 1e-9, s"$t p50: $p50e vs $p50x (w=$w)")
      assert(math.abs(p95e - p95x) <= w + 1e-9, s"$t p95: $p95e vs $p95x (w=$w)")
    }
  }

  test("PMI collocations: glued pair scores high, independent pair low, minCount cuts") {
    // "alpha beta" always adjacent (a true collocation); "gamma" and "delta"
    // co-occur adjacently only once in the noise doc; "rare pair" appears
    // < minCount times and must be cut entirely.
    val glued = (1 to 10).map(i => (i.toLong, "alpha beta gamma x" + i))
    val noise = Seq((100L, "gamma delta rare pair"), (101L, "delta gamma"),
      (102L, "rare pair alpha beta"))
    val df = (glued ++ noise).toDF("doc_id", "text")
    val got = CorpusStats.pmiCollocations(df, "text", minCount = 5, topN = 10)
      .select($"w1", $"w2", $"c_xy", $"pmi").as[(String, String, Long, Double)]
      .collect()
    val pairs = got.map(r => (r._1, r._2)).toSet
    assert(pairs.contains(("alpha", "beta")), s"collocation missing in $pairs")
    assert(!pairs.contains(("rare", "pair")), "sub-minCount pair must be cut")
    val ab = got.find(r => (r._1, r._2) == ("alpha", "beta")).get
    assert(ab._3 == 11L)
    // alpha beta is a perfect collocation: pmi must exceed every beta-gamma
    // style chain pair that merely shares the glued context
    got.filter(r => (r._1, r._2) != ("alpha", "beta")).foreach { r =>
      assert(ab._4 >= r._4, s"${r._1} ${r._2} outranked the glued pair")
    }
  }
}
