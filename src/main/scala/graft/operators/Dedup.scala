package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deduplication operator family for the large-scale training-data pipeline.
  * The reference dedups implicitly — its sha1 row key makes Redis HSET
  * overwrite identical (path, page) records (reference
  * `modules/utilities.py:344,304-309`); here dedup is a first-class set of
  * operators, each designed around its shuffle profile at 100 TB.
  *
  * All hash primitives are engine-portable (md5 hex strings + string min),
  * so every variant except the murmur-based ones is expressible in ANSI SQL
  * for the DuckDB oracle.
  */
object Dedup {

  /** Spread a (possibly single-file, single-partition) input across the
    * cluster before compute-heavy fan-out. A small-file parquet scan yields
    * ONE input partition, serializing the whole explode/join map stage onto
    * one task; this one cheap shuffle of the narrow input buys full
    * parallelism for the expensive stage after it. At real 100 TB scale
    * inputs arrive already partitioned and this is a no-op cost-wise. */
  private[graft] def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Exact dedup: canonical-text fingerprint -> keep the lowest-id row per
    * fingerprint. One hash-partition shuffle on the fingerprint; map-side
    * partial aggregation via min_by. At 100 TB this is the cheapest possible
    * exact dedup (no sort, no window). */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val fp = TextFunctions.fingerprintMd5(col(textCol))
    df.withColumn("fingerprint", fp)
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))
  }

  /** Exact dedup that keeps the surviving ROWS (lowest id per content
    * fingerprint), not just their ids: one shuffle via map-side-partial
    * `min_by` over the full row struct — no join-back against the corpus,
    * which at 100 TB would be a second corpus-wide shuffle. */
  def exactKeepRows(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val row = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(TextFunctions.fingerprintMd5(col(textCol)).as("__fp"))
      .agg(min_by(row, col(idCol)).as("__r"))
      .select(col("__r.*"))
  }

  /** INCREMENTAL exact dedup — how production dedup actually runs: each
    * day's batch is deduped (a) within itself (keep lowest id per content
    * fingerprint) and (b) against the accumulated fingerprint store of
    * everything already ingested. Returns the surviving rows plus their
    * `fingerprint` column so the caller can append it to the seen store —
    * the loop that keeps the store current.
    *
    * Scale shape: within-batch dedup is [[exactKeepRows]]'s one min_by
    * shuffle; the history check is a hash anti-join on the 32-char
    * fingerprint. The seen store at 100 TB is corpus-sized — no broadcast
    * assumption; when the batch is small relative to history, pre-filter
    * with a Bloom filter built over `seenFps`
    * ([[Decontaminate.contaminatedViaBloom]] pattern: no false negatives,
    * so the anti-join stays exact) to skip the full history shuffle. */
  def incrementalExact(newDf: DataFrame, textCol: String, idCol: String,
                       seenFps: DataFrame): DataFrame = {
    val batch = exactKeepRows(newDf, textCol, idCol)
      .withColumn("fingerprint", TextFunctions.fingerprintMd5(col(textCol)))
    batch.join(seenFps.toDF("__seen"),
      col("fingerprint") === col("__seen"), "left_anti")
  }

  /** Exact duplicated-SPAN removal — sub-document dedup in the style of
    * Lee et al., "Deduplicating Training Data Makes Language Models Better"
    * (exact-substring dedup): any word span covered by an `n`-gram that
    * occurs in >= `minDocs` DISTINCT documents is cut from every document
    * containing it; the surviving words are reassembled in order. This is
    * the operator that removes boilerplate (licenses, navigation chrome,
    * quoted headers) that document-level dedup cannot touch because the
    * surrounding text differs.
    *
    * Semantics pinned for the oracle: tokens are whitespace-split (no case
    * folding — spans are removed from the text, so the unit must be the
    * text's own words); a position p is covered iff some duplicated n-gram
    * starts in [p-n+1, p]; ALL copies are cut (including the "first") —
    * keep-one-copy policies compose via [[exactKeepRows]] upstream. Output:
    * one row per input row with `n_removed` and the cleaned text.
    *
    * Scale shape (the suffix-array original is a single-machine design;
    * this is the shuffle-native equivalent): per-doc gram fingerprints are a
    * narrow map (md5 of each n-gram, position-indexed array — no token
    * explosion); the corpus-wide duplicate set is ONE hash shuffle on the
    * 16-byte gram key (count distinct docs) + a semi-join back on the same
    * key (co-partitioned, AQE-friendly); covered positions are collected
    * per doc (shuffle carries only duplicated START offsets, a sliver of
    * the corpus) and the final cut is a declarative index-filter lambda on
    * the token array — the full text is never exploded to (doc, pos, word)
    * rows. */
  def removeDuplicatedSpans(df: DataFrame, textCol: String, idCol: String,
                            n: Int = 8, minDocs: Int = 2): DataFrame = {
    val toks = TextFunctions.wsTokens(col(textCol))
    val k = size(toks) - (n - 1)
    val grams = when(k < 1, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), k),
        i => md5(array_join(slice(toks, i, lit(n)), " "))))
    val withGrams = spread(df).withColumn("__toks", toks)
      .withColumn("__grams", grams)
    val starts = withGrams
      .select(col(idCol), posexplode(col("__grams")).as(Seq("__p0", "__gram")))
      .select(col(idCol), (col("__p0") + 1).as("__start"), col("__gram"))
    val dupGrams = starts.groupBy(col("__gram"))
      .agg(count_distinct(col(idCol)).as("__nd"))
      .where(col("__nd") >= minDocs)
      .select(col("__gram"))
    val dupStarts = starts.join(dupGrams, Seq("__gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(collect_set(col("__start")).as("__starts"))
    val covered = array_distinct(flatten(transform(col("__starts"),
      s => sequence(s, s + (n - 1)))))
    withGrams.join(dupStarts, Seq(idCol), "left")
      .withColumn("__cov", coalesce(covered, array().cast("array<int>")))
      .withColumn("__kept", filter(col("__toks"),
        (_, i) => !array_contains(col("__cov"), i + 1)))
      .withColumn("n_removed",
        (size(col("__toks")) - size(col("__kept"))).cast("int"))
      .withColumn("text_clean", array_join(col("__kept"), " "))
      .drop("__toks", "__grams", "__starts", "__cov", "__kept")
  }

  /** Word n-gram shingles as a compact UDF — the dedup hot path. The
    * declarative twin [[shingles]] computes the identical set through
    * `transform`/`slice`/`array_join`, but those lambdas are interpreted
    * per-element: measured 9.4s vs ~0.5s at 5000 docs. One scalar UDF over
    * the raw text is the pragmatic choice here (same tradeoff call as the
    * embedder, SURVEY.md §7.4); both forms are cross-checked in tests. */
  def shinglesFast(n: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) Array.empty[String]
      else {
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        if (ws.length < n) Array.empty[String]
        else ws.sliding(n).map(_.mkString(" ")).toArray.distinct
      }
    }

  /** Word n-gram shingles (distinct, order preserved by first occurrence
    * irrelevant — set semantics). */
  def shingles(text: Column, n: Int = 2): Column = {
    val words = TextFunctions.wsTokens(lower(text))
    val k = size(words) - (n - 1)
    // NB: Spark's sequence(1, 0) yields a DESCENDING [1, 0], not empty —
    // guard the short-text case explicitly.
    when(k < 1, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), k),
          i => array_join(slice(words, i, lit(n)), " "))))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken 2003,
    * §3 — the MOSS algorithm): hash every positional word `gram`-gram, then
    * slide a `window` over the hash sequence and keep each window's minimum
    * (rightmost on ties). Guarantees: any shared substring of length >=
    * gram + window - 1 words yields at least one shared fingerprint
    * (detection floor), while selecting only ~2/(window+1) of all grams —
    * the density/guarantee dial for substring-level near-dup detection
    * that per-doc MinHash (whole-doc set semantics) can't give.
    *
    * Hash = first 8 md5 hex digits as an unsigned 32-bit value — the same
    * digest-prefix family as the sketch ops, so an ANSI oracle replays every
    * selection. One compiled pass per document (the [[shinglesFast]]
    * lesson: per-element declarative md5 is interpreted and ~10x slower);
    * entirely narrow — selected (pos, fp) pairs explode to rows and any
    * downstream join buckets on fp. Docs with fewer than
    * gram + window - 1 words emit nothing (no full window exists). */
  def winnowFingerprints(df: DataFrame, textCol: String, idCol: String,
                         gram: Int = 3, window: Int = 4): DataFrame = {
    require(gram >= 1 && window >= 1)
    val f = udf { (text: String) =>
      if (text == null) Array.empty[(Int, Long)]
      else {
        val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        val n = ws.length - gram + 1
        if (n < window) Array.empty[(Int, Long)]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val hs = Array.tabulate(n) { i =>
            val d = md.digest(ws.slice(i, i + gram).mkString(" ").getBytes("UTF-8"))
            ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
              ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          }
          val out = scala.collection.mutable.LinkedHashSet.empty[(Int, Long)]
          var j = 0
          while (j <= n - window) {
            var best = j
            var k = j + 1
            while (k < j + window) {
              if (hs(k) <= hs(best)) best = k // <=: rightmost minimum on ties
              k += 1
            }
            out += ((best, hs(best)))
            j += 1
          }
          out.toArray.sorted
        }
      }
    }
    df.select(col(idCol), explode(f(col(textCol))).as("sel"))
      .select(col(idCol), col("sel._1").as("pos"), col("sel._2").as("fp"))
  }

  /** Candidate near-dup pairs from shared winnowing fingerprints — the
    * join [[winnowFingerprints]] exists to feed: docs sharing >=
    * `minShared` selected fingerprints are candidates (any shared run of
    * gram+window-1 words guarantees a shared fp, so recall for long
    * overlaps is structural, not probabilistic). The join keys on `fp` —
    * selected-fingerprint buckets, ~2/(window+1) the density of a full
    * gram join — and the pair agg counts distinct shared fps. Hot
    * fingerprints (boilerplate) are the skew risk at corpus scale:
    * `maxFpFreq` drops fps shared by more than that many docs before the
    * pair join (the standard stop-gram cut; dropped fps can only LOWER
    * the shared count, never invent a pair). */
  def winnowCandidatePairs(df: DataFrame, textCol: String, idCol: String,
                           gram: Int = 3, window: Int = 4,
                           minShared: Int = 2,
                           maxFpFreq: Int = 1000): DataFrame = {
    val fps = winnowFingerprints(df, textCol, idCol, gram, window)
      .select(col(idCol).as("id"), col("fp")).distinct()
    val freqOk = fps.groupBy(col("fp")).agg(count(lit(1)).as("__n"))
      .where(col("__n") <= maxFpFreq).select(col("fp"))
    val kept = fps.join(freqOk, "fp")
    val a = kept.select(col("fp"), col("id").as("id1"))
    val b = kept.select(col("fp"), col("id").as("id2"))
    a.join(b, Seq("fp")).where(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** MinHash signature: sig_i = min over shingles of md5(shingle || '#' || i).
    * A string-min hash family — portable across engines (md5 + lexicographic
    * min are identical everywhere), order-independent, deterministic. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shingleCol, s => md5(concat(s, lit("#"), i.cast("string"))))))

  /** LSH band keys: hash each band (contiguous rows of the signature) to one
    * bucket key. Docs sharing ANY band key are candidate near-dups. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",", slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))))

  /** Signature + band keys in ONE narrow per-document pass (the hot path).
    * Bit-identical to [[minhashSignature]] + [[lshBandKeys]]: per hash i the
    * minimum of md5(shingle || '#' || i) under lexicographic hex order — which
    * equals unsigned-byte order on the raw 16-byte digests, so the mins are
    * tracked on raw digests and hex-encoded once at the end. Replaces an
    * explode(shingles) + numHashes-way min-aggregate shuffle with zero
    * shuffles: at 100 TB the signature stage becomes embarrassingly parallel
    * map work and the only remaining shuffle in MinHash-LSH is the bucket
    * self-join itself. */
  def minhashBandKeysFast(numHashes: Int, bands: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (shingles: Seq[String]) =>
      val rpb = numHashes / bands
      val md = java.security.MessageDigest.getInstance("MD5")
      val mins = Array.fill[Array[Byte]](numHashes)(null)
      val suffixes = Array.tabulate(numHashes)(i => ("#" + i).getBytes("UTF-8"))
      shingles.foreach { s =>
        val sb = s.getBytes("UTF-8")
        var i = 0
        while (i < numHashes) {
          md.reset(); md.update(sb); md.update(suffixes(i))
          val d = md.digest()
          if (mins(i) == null || unsignedLt(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      val hex = mins.map(m => if (m == null) "" else m.map("%02x".format(_)).mkString)
      Array.tabulate(bands) { b =>
        val bandStr = (0 until rpb).map(r => hex(b * rpb + r)).mkString(",")
        md.reset()
        md.digest(bandStr.getBytes("UTF-8")).map("%02x".format(_)).mkString
      }
    }

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** [[minhashNearDupPairs]] through the build-once persisted contract
    * ([[graft.core.PersistedBuild]]): the deterministic pair graph is an
    * index-like derived artifact consumed by several downstream views
    * (the pair gate itself, the survivorship report, the recall audit) —
    * production pipelines persist it next to the corpus rather than
    * re-hashing per consumer. First caller on `path` builds + publishes
    * atomically; everyone else reads the parquet. */
  def minhashNearDupPairsPersisted(df: DataFrame, path: String,
                                   textCol: String, idCol: String,
                                   numHashes: Int, bands: Int,
                                   threshold: Double): DataFrame =
    graft.core.PersistedBuild.table(
      minhashNearDupPairs(df, textCol, idCol, numHashes, bands, threshold),
      path, df.sparkSession)

  /** [[ngramJaccardPairs]] through the build-once persisted contract —
    * same rationale as [[minhashNearDupPairsPersisted]]: the exact-Jaccard
    * pair graph feeds the pair gate and the whole cluster family. */
  def ngramJaccardPairsPersisted(df: DataFrame, path: String,
                                 textCol: String, idCol: String,
                                 n: Int, threshold: Double): DataFrame =
    graft.core.PersistedBuild.table(
      ngramJaccardPairs(df, textCol, idCol, n, threshold), path,
      df.sparkSession)

  /** MinHash-LSH near-dup pairs: shingle -> minhash -> band -> bucket
    * self-join -> exact Jaccard verify on the candidates only.
    *
    * Scale shape: the only shuffle is the groupBy on (band_idx, band_key);
    * candidate verification touches candidate pairs, not the n^2 cross
    * product. Skewed buckets (boilerplate docs) are bounded by dropping
    * buckets above `maxBucket`. */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          numHashes: Int = 12, bands: Int = 4,
                          threshold: Double = 0.5, ngram: Int = 2,
                          maxBucket: Int = 1000): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")
    // Shape note: signatures come from [[minhashBandKeysFast]], one narrow
    // per-document pass with NO shuffle (the round-1 shape — explode +
    // numHashes min-aggregates — shuffled (docs x numHashes) strings and was
    // the single slowest stage of the whole bench; the declarative array form
    // is ~50s at 500 docs because HOF lambdas are interpreted).
    // sh is read 3x (band-key build + two verify join-backs) and banded 2x
    // (self-join sides); persist both — they are tiny relative to the work
    // that derives them (docs x shingle-array, docs x bands rows).
    val sh = spread(df)
      .select(col(idCol).as("doc_id"), shinglesFast(ngram)(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh
      .select(col("doc_id"),
        posexplode(minhashBandKeysFast(numHashes, bands)(col("sh")))
          .as(Seq("band_idx", "band_key")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Skew bound: a bucket of size B yields B^2/2 candidate pairs; drop
    // buckets above maxBucket (boilerplate shared by thousands of docs
    // carries no dedup signal and would OOM the self-join at scale).
    val bucketSizes = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("__bn"))
    val bounded = banded.join(bucketSizes, Seq("band_idx", "band_key"))
      .where(col("__bn") <= maxBucket)
      .drop("__bn")
    val a = bounded.alias("a")
    val b = bounded.alias("b")
    val candidates = a.join(b,
        col("a.band_idx") === col("b.band_idx") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    val pairs = candidates
      .join(sh.select(col("doc_id").as("id1"), col("sh").as("sh1")), "id1")
      .join(sh.select(col("doc_id").as("id2"), col("sh").as("sh2")), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
    // Materialize the (small) pair set eagerly, then RELEASE the persisted
    // intermediates: repeated invocations in a long-lived session must not
    // accumulate cached blocks until executor storage evicts them.
    val out = pairs.localCheckpoint()
    banded.unpersist(false)
    sh.unpersist(false)
    out
  }

  /** Incremental MinHash near-dup: NEW batch vs an already-indexed SEEN
    * corpus — the daily-ingest shape ([[exactIncremental]]'s near-dup
    * sibling; the streaming bucket table is the in-flight analogue). The
    * seen side arrives as persisted band keys (built once at index time by
    * the same [[minhashBandKeysFast]] family), so a day's ingest computes
    * signatures for the NEW docs only and probes the seen band table with
    * one equi-join — no new-vs-new or seen-vs-seen pairs, no re-hash of
    * history. Candidates verify by exact shingle Jaccard against the seen
    * side's stored shingle sets.
    *
    * Output: (new_id, seen_id, jaccard >= threshold). */
  def minhashIncrementalPairs(newDocs: DataFrame, seenDocs: DataFrame,
                              textCol: String, idCol: String,
                              numHashes: Int = 12, bands: Int = 4,
                              threshold: Double = 0.5, ngram: Int = 2): DataFrame = {
    def prep(df: DataFrame) = spread(df)
      .select(col(idCol).as("doc_id"), shinglesFast(ngram)(col(textCol)).as("sh"))
      .where(size(col("sh")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def band(sh: DataFrame) = sh.select(col("doc_id"),
      posexplode(minhashBandKeysFast(numHashes, bands)(col("sh")))
        .as(Seq("band_idx", "band_key")))
    val shNew = prep(newDocs)
    val shSeen = prep(seenDocs)
    val candidates = band(shNew)
      .select(col("doc_id").as("new_id"), col("band_idx"), col("band_key"))
      .join(band(shSeen)
        .select(col("doc_id").as("seen_id"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"))
      .select(col("new_id"), col("seen_id"))
      .dropDuplicates("new_id", "seen_id")
    val pairs = candidates
      .join(shNew.select(col("doc_id").as("new_id"), col("sh").as("sh1")), "new_id")
      .join(shSeen.select(col("doc_id").as("seen_id"), col("sh").as("sh2")), "seen_id")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("jaccard", round(
        col("inter") / (size(col("sh1")) + size(col("sh2")) - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("new_id", "seen_id", "jaccard")
    val out = pairs.localCheckpoint()
    shNew.unpersist(false)
    shSeen.unpersist(false)
    out
  }

  /** 32-bit SimHash as a bit string, from the high bit of each md5 hex char:
    * bit_j = sign of sum over tokens of (+1 if hex digit j of md5(token) >= 8
    * else -1). Portable to ANSI SQL (same md5, same substring, same sums).
    *
    * Shape note: md5 is computed ONCE per token (outer `transform`), then a
    * single `aggregate` folds a 32-wide count array — the naive
    * "aggregate-per-bit" formulation recomputes md5 32x per token and was
    * measured ~20x slower. */
  def simhash32(text: Column): Column = {
    val hexHigh = Seq("8", "9", "a", "b", "c", "d", "e", "f")
    val hashes = transform(TextFunctions.wsTokens(lower(text)), w => md5(w))
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 32),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(1), lit(32)),
          j => when(h.substr(j, lit(1)).isInCollection(hexHigh), 1).otherwise(-1)),
        _ + _))
    array_join(transform(counts, c => when(c >= 0, lit("1")).otherwise(lit("0"))), "")
  }

  /** Fast UDF twin of [[simhash32]] — bit-identical output (cross-checked in
    * DedupSpec), one MessageDigest pass per token instead of an interpreted
    * HOF lambda per (token x bit). The hex-digit-high-bit test becomes a
    * nibble test on the raw 16-byte digest. Same tradeoff call as
    * [[shinglesFast]]: per-element-heavy work belongs in compiled scalar
    * code, the declarative form stays as the oracle-shaped reference. */
  def simhash32Fast: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (text: String) =>
      if (text == null) null
      else {
        val md = java.security.MessageDigest.getInstance("MD5")
        val counts = new Array[Int](32)
        text.toLowerCase.split("\\s+").foreach { tok =>
          if (tok.nonEmpty) {
            md.reset()
            val d = md.digest(tok.getBytes("UTF-8"))
            var j = 0
            while (j < 32) {
              // hex digit j of the md5 hex string = nibble j of the digest
              val nib = if (j % 2 == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
              if (nib >= 8) counts(j) += 1 else counts(j) -= 1
              j += 1
            }
          }
        }
        val sb = new java.lang.StringBuilder(32)
        var j = 0
        while (j < 32) { sb.append(if (counts(j) >= 0) '1' else '0'); j += 1 }
        sb.toString
      }
    }

  /** Exact n-gram Jaccard self-join (the quadratic baseline that LSH
    * replaces at scale; useful as ground truth and for small candidate sets).
    * Computed via shingle explode + equi-join on shingle + group-by pair —
    * shuffles on shingle then on (id1, id2), never materializing n^2. */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 2, threshold: Double = 0.5): DataFrame = {
    // Join key is xxhash64(shingle), not the shingle string: the self-join
    // shuffle moves 8-byte longs instead of ~n-word strings (the dominant
    // shuffle of this operator — at 100 TB the shingle table is ~10x the
    // corpus). Per-doc shingles are distinct, so counts and intersection
    // sizes are preserved exactly unless two distinct shingles collide in
    // 64 bits (p ~ k^2/2^65; ~1e-8 at 10^6 shingles, and each collision
    // perturbs one pair's count by 1 — harmless for near-dup semantics).
    // Per-doc shingle counts come from size() on the un-exploded array (a
    // narrow map over the doc-sized frame) — NOT a groupBy over the exploded
    // shingle table, which would be a second full shuffle of the largest
    // intermediate in the operator.
    val shArr = spread(df)
      .select(col(idCol).as("doc_id"), shinglesFast(n)(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = shArr.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val sh = shArr
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = sh.alias("a")
      .join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val result = pairs
      .join(counts.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(counts.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("n1") + col("n2") - col("inter")), 4))
      .where(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
    // eager materialize + release, as in [[minhashNearDupPairs]]: no cached
    // blocks survive the call.
    val out = result.localCheckpoint()
    sh.unpersist(false)
    shArr.unpersist(false)
    out
  }

  /** Asymmetric n-gram CONTAINMENT pairs: c(A⊆B) = |A∩B| / |A| — the
    * subset detector symmetric Jaccard misses (a page extracted from a
    * larger doc, a doc quoting another: a 10-gram excerpt inside a
    * 1000-gram doc has Jaccard ~0.01 but containment ~1.0 on the excerpt
    * side). Broder's containment measure; the standard screen for
    * "smaller doc swallowed by bigger doc" dedup.
    *
    * Identical shuffle shape to [[ngramJaccardPairs]] (hashed-shingle
    * equi-join, pair count agg, per-doc sizes from the un-exploded array);
    * keeps BOTH directions and gates on the max. */
  def ngramContainmentPairs(df: DataFrame, textCol: String, idCol: String,
                            n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val shArr = spread(df)
      .select(col(idCol).as("doc_id"), shinglesFast(n)(col(textCol)).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = shArr.select(col("doc_id"), size(col("sh")).cast("long").as("n_sh"))
    val sh = shArr
      .select(col("doc_id"), explode(col("sh")).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = sh.alias("a")
      .join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("inter"))
    val result = pairs
      .join(counts.withColumnRenamed("doc_id", "id1").withColumnRenamed("n_sh", "n1"), "id1")
      .join(counts.withColumnRenamed("doc_id", "id2").withColumnRenamed("n_sh", "n2"), "id2")
      .withColumn("c_1in2", round(col("inter").cast("double") / col("n1"), 4))
      .withColumn("c_2in1", round(col("inter").cast("double") / col("n2"), 4))
      .where(greatest(col("c_1in2"), col("c_2in1")) >= threshold)
      .select("id1", "id2", "c_1in2", "c_2in1")
    val out = result.localCheckpoint()
    sh.unpersist(false)
    shArr.unpersist(false)
    out
  }

  /** Edit-distance (Levenshtein) near-dup pairs over a bounded prefix
    * window, with length-bucket blocking instead of an all-pairs join.
    *
    * Distance is computed on the first `window` chars of the cleansed text
    * (a fixed O(window·maxDist) per-candidate cost via the banded threshold
    * algorithm — unbounded-length Levenshtein is quadratic in document size
    * and has no place in a 100 TB plan).
    *
    * Blocking exploits the metric itself: edit distance <= maxDist implies
    * the prefix lengths differ by <= maxDist, so with bucketWidth > maxDist
    * a qualifying pair's length buckets differ by at most 1. The left side
    * keeps its own bucket and the right side fans out to {own-1, own,
    * own+1}, so every qualifying pair meets on EXACTLY one join key (the
    * left row's own bucket) — no post-join de-dup shuffle — and the blocked
    * join is EXACTLY equivalent to the all-pairs filter (the DuckDB oracle
    * runs the all-pairs form, proving the rewrite preserves semantics, same
    * pattern as the salted-join oracle).
    *
    * Candidates are pruned before the banded verify by a lossless
    * char-histogram bound: one edit op changes a character multiset by at
    * most 2 units of L1, so L1(bag(a), bag(b)) > 2·maxDist rules a pair out.
    * The 27-bin bag (a-z + space, lowercased — a char-level projection can
    * only shrink L1, so the bound survives it) is computed once per ROW as
    * a 27-byte `binary` ([[graft.plans.CharBagExpr]], one string pass); the
    * per-pair check is a codegen early-exit byte compare
    * ([[graft.plans.BagL1WithinExpr]]), orders cheaper than the banded
    * distance it guards. A free `|len(a)-len(b)| <= maxDist` reject runs
    * before it (the length blocking alone allows ~2x bucketWidth of
    * spread).
    *
    * Shuffle profile: one bucket-keyed self-join, then a fused narrow
    * filter chain — bag bound, then banded `levenshtein(p1, p2, maxDist)`
    * (-1 past the threshold) — with nothing wider than the surviving pairs
    * ever shuffled. Unlike the LSH operators there is deliberately NO
    * maxBucket skip here: in this blocking scheme the dominant length
    * bucket (every doc ≥ window chars) IS the workload, so skipping
    * oversized buckets would silently zero the operator's recall the
    * moment the corpus grows past the bound — candidate volume is
    * inherently quadratic in the largest bucket's population, and the
    * caller's dial for that is `window`/`maxDist`, not a silent drop.
    *
    * The length-bucket key space is TINY (≈ window/bucketWidth values), so
    * an unsalted join would put each bucket's whole pair loop on one task —
    * a corpus whose lengths concentrate in one bucket (any corpus with most
    * docs ≥ window chars!) would run ~serially no matter the cluster size.
    * The join is therefore slice-salted like [[graft.operators.Skew]]: the
    * right side hashes into `saltSlices` slices, the (narrow, pre-verify)
    * left side replicates across all of them, and every pair still meets on
    * exactly one key, now (bucket, slice). Size `saltSlices` ≈ the target
    * parallelism for the largest bucket's pair loop. */
  def levenshteinNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                              maxDist: Int = 24, window: Int = 128,
                              bucketWidth: Int = 32,
                              saltSlices: Int = 32): DataFrame = {
    require(bucketWidth > maxDist,
      s"bucketWidth ($bucketWidth) must exceed maxDist ($maxDist) for lossless blocking")
    // bag: single-pass 27-byte histogram (codegen CharBagExpr) — 27 bytes
    // through the candidate shuffle instead of an int array, one string
    // scan per row instead of 27
    val pre = spread(df).select(col(idCol).as("doc_id"),
        substring(TextFunctions.cleanseText(col(textCol)), 1, window).as("pre"))
      .withColumn("bag", graft.plans.CharBagExpressions.charBag(col("pre")))
      .withColumn("own", floor(length(col("pre")) / bucketWidth).cast("int"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = pre
      .withColumn("s", explode(array((0 until saltSlices).map(lit): _*)))
    val right = pre
      .select(col("doc_id"), col("pre"), col("bag"),
        explode(array(col("own") - 1, col("own"), col("own") + 1)).as("b"))
      .withColumn("s", pmod(xxhash64(col("doc_id")), lit(saltSlices)).cast("int"))
    // filter ladder, cheapest first: |len diff| > k is a free reject the
    // length blocking doesn't fully cover (buckets allow up to 2·bucketWidth
    // of spread); then the early-exit bag bound; then the banded DP verify
    val pairs = left.alias("a").join(right.alias("c"),
        col("a.own") === col("c.b") && col("a.s") === col("c.s") &&
          col("a.doc_id") < col("c.doc_id"))
      .where(abs(length(col("a.pre")) - length(col("c.pre"))) <= lit(maxDist))
      .where(graft.plans.CharBagExpressions.bagL1Within(
        col("a.bag"), col("c.bag"), 2 * maxDist))
      .withColumn("edit_dist", graft.plans.StringEditExpressions
        .bandedLevenshtein(col("a.pre"), col("c.pre"), maxDist))
      .where(col("edit_dist") >= 0)
      .select(col("a.doc_id").as("id1"), col("c.doc_id").as("id2"), col("edit_dist"))
    // eager materialize + release, as in [[minhashNearDupPairs]]
    val out = pairs.localCheckpoint()
    pre.unpersist(false)
    out
  }

  /** Candidate near-dup pairs from `nTables` independent sign-LSH tables of
    * `nBits` hyperplanes each (seeded `seed + t`, so the family is
    * deterministic): a pair is a candidate iff it lands in the same bucket
    * in ANY table. The only shuffles are the bucket self-join (keyed on
    * table:bucket — never all-pairs) and the candidate dedup; buckets above
    * `maxBucket` are dropped, bounding the join's worst case exactly like
    * [[minhashNearDupPairs]]'s band join.
    *
    * Selectivity is threshold-bound: a pair at cosine t collides per
    * hyperplane with p = 1 - acos(t)/pi, per table with p^nBits, and is
    * missed by all tables with (1 - p^nBits)^nTables. At production
    * near-dup thresholds (t >= 0.85, p >= 0.82) a few 8-bit tables prune
    * the candidate set to a sliver of n^2; at loose thresholds (t ~ 0.45,
    * p ~ 0.65) recall-1 forces small codes and the candidate set approaches
    * all-pairs — the pruning power is a property of the threshold, not the
    * operator. Defaults (4, 24) give recall 1 at the gate thresholds. */
  def embeddingCandidatePairs(df: DataFrame, vecCol: String, idCol: String,
                              dim: Int, nBits: Int = 4, nTables: Int = 24,
                              seed: Long = 42L, maxBucket: Int = 10000): DataFrame = {
    val tableBuckets = array((0 until nTables).map { t =>
      concat(lit(s"$t:"), SimilaritySearch.lshBucket(col("__v"),
        SimilaritySearch.hyperplanes(nBits, dim, seed + t)))
    }: _*)
    val banded = spread(df)
      .select(col(idCol).as("doc_id"), col(vecCol).as("__v"))
      .select(col("doc_id"), explode(tableBuckets).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = banded.groupBy(col("bucket")).agg(count(lit(1)).as("__bn"))
    val bounded = banded.join(sizes, Seq("bucket"))
      .where(col("__bn") <= maxBucket)
      .drop("__bn")
    val cand = bounded.alias("a").join(bounded.alias("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .dropDuplicates("id1", "id2")
    // eager materialize + release, as in [[minhashNearDupPairs]]
    val out = cand.localCheckpoint()
    banded.unpersist(false)
    out
  }

  /** Embedding-cosine near-dup pairs over a vector table: sign-LSH bucketed
    * candidate generation ([[embeddingCandidatePairs]]) + exact cosine
    * verify on the candidates only. Neither side is broadcast and nothing
    * is O(n^2) in the plan: the candidate join is bucket-keyed and the
    * verify joins vectors back by id — at 100 TB every stage shards over
    * executors by hash. The all-pairs form survives as
    * [[embeddingNearDupPairsExact]] (ground truth / small candidate sets). */
  def embeddingNearDupPairs(df: DataFrame, vecCol: String, idCol: String,
                            threshold: Double, dim: Int,
                            nBits: Int = 4, nTables: Int = 24,
                            seed: Long = 42L, maxBucket: Int = 10000): DataFrame = {
    import graft.functions.VectorFunctions
    val v = df.select(col(idCol).as("doc_id"), col(vecCol).as("__v"))
    embeddingCandidatePairs(df, vecCol, idCol, dim, nBits, nTables, seed, maxBucket)
      .join(v.select(col("doc_id").as("id1"), col("__v").as("v1")), "id1")
      .join(v.select(col("doc_id").as("id2"), col("__v").as("v2")), "id2")
      .withColumn("cosine", round(VectorFunctions.cosineSimilarity(col("v1"), col("v2")), 4))
      .where(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
  }

  /** Exact all-pairs embedding near-dup (broadcast nested-loop). O(n^2)
    * compares and a whole-corpus broadcast: ONLY for ground truth at test
    * scale or as the verify stage over an already-bucketed candidate slice
    * — the registered operator is the bucketed [[embeddingNearDupPairs]]. */
  def embeddingNearDupPairsExact(df: DataFrame, vecCol: String, idCol: String,
                                 threshold: Double): DataFrame = {
    import graft.functions.VectorFunctions
    val a = spread(df).select(col(idCol).as("id1"), col(vecCol).as("v1"))
    val b = df.select(col(idCol).as("id2"), col(vecCol).as("v2"))
    a.join(broadcast(b), col("id1") < col("id2"))
      .withColumn("cosine", round(VectorFunctions.cosineSimilarity(col("v1"), col("v2")), 4))
      .where(col("cosine") >= threshold)
      .select("id1", "id2", "cosine")
  }

  /** Keep-best resolution — the final stage of the dedup pipeline: given
    * cluster labels (from [[connectedComponents]]) and a per-document score
    * (e.g. [[graft.functions.TextFunctions.qualityScore]]), elect one keeper
    * per cluster: highest score, ties broken by lowest id (the score is on a
    * fixed decimal grid on both engines, so the arg-max is deterministic
    * cross-engine). One hash shuffle on the id join + one on the cluster
    * groupBy, with map-side partial max_by — no window, no sort. */
  def resolveKeepBest(clusters: DataFrame, scored: DataFrame,
                      idCol: String = "doc_id", clusterCol: String = "cluster_id",
                      scoreCol: String = "quality"): DataFrame =
    clusters.join(scored, idCol)
      .groupBy(col(clusterCol))
      .agg(
        max_by(struct(col(idCol), col(scoreCol)),
          struct(col(scoreCol), -col(idCol))).as("__keep"),
        count(lit(1)).as("n_members"))
      .select(col(clusterCol), col("__keep")(idCol).as("keep_id"),
        col("__keep")(scoreCol).as("keep_quality"), col("n_members"))

  /** Connected components over a near-dup pair graph: label every node with
    * the minimum id reachable from it (= its cluster id, which is also the
    * canonical "keep" doc under keep-lowest-id policy). This is the stage a
    * real dedup pipeline runs AFTER pair generation — near-dup is transitive
    * in intent (a~b, b~c => one cluster) even when the pairwise threshold
    * isn't, so keep-one-per-pair alone under-dedups.
    *
    * Algorithm: min-label propagation with one pointer-jumping hop per round
    * (label(v) <- min over neighbors of their labels, then label(v) <-
    * label(label(v))). The jump makes convergence O(log diameter) rounds
    * instead of O(diameter) — on a pathological 1M-long chain that is ~20
    * shuffle rounds, not 1M. Near-dup components are overwhelmingly small
    * cliques, so in practice 1-2 rounds converge. Two round-cost trims:
    * round 0 is fused into initialization (labels start at least(v,
    * min-neighbor) from one groupBy over the symmetrized edges — no join
    * against an identity label table), and convergence is detected by an
    * exact decimal checksum of the label column instead of a change-join:
    * labels only ever decrease, so sum(comp) is strictly decreasing until
    * the fixpoint, and the checksum is a narrow aggregate over the
    * just-materialized labels (no shuffle) where the join was two. Each
    * round is two hash-partition shuffles sized by |edges| and |nodes|,
    * never by n^2; lineage is truncated per round (localCheckpoint) so
    * plans stay flat — on a multi-executor cluster use
    * `spark.sparkContext.setCheckpointDir` + reliable checkpoints for
    * fault tolerance instead.
    *
    * Input: a pair DataFrame with two id columns (any near-dup pair source:
    * [[minhashNearDupPairs]], [[ngramJaccardPairs]], [[embeddingNearDupPairs]]).
    * Output: (id, comp) for every node that appears in a pair.
    *
    * Size dispatch (the graph-serving tier discipline applied to CC):
    * blocked/thresholded MATCH graphs are routinely tiny relative to the
    * corpus that produced them, and the distributed loop's cost there is
    * pure fixed-job overhead (rounds × scheduling, measured 2.2–4.3 s on
    * er_golden_record's 454k-edge graph). When the symmetrized edge count
    * (observed during the seed pass — no extra job) fits
    * `driverEdgeBudget` AND ids are LONGs, the edges collect to the
    * driver and a union-find with union-by-MIN-root runs locally — by
    * induction each set's root is its minimum member, so the labels are
    * IDENTICAL to min-label propagation (spec-pinned equality). Budget is
    * in edge rows (≈16 bytes each: the default 2M ≈ 32 MB on the driver);
    * over budget — the only possibility at true 100 TB pair volumes — the
    * distributed loop runs unchanged. */
  def connectedComponents(pairs: DataFrame, idCol1: String = "id1",
                          idCol2: String = "id2", maxIter: Int = 50,
                          driverEdgeBudget: Long = 2000000L): DataFrame = {
    // Symmetrize in ONE scan of `pairs` (explode, not union: a union's two
    // branches each re-run the whole upstream pair-generation plan when the
    // caller hands us an unpersisted pipeline — for jaccard pairs that is
    // the expensive shingle self-join, twice). No distinct(): duplicate
    // edges cannot change a min-aggregation, so deduplicating them is a
    // pure extra shuffle of the edge table.
    val edges = pairs
      .select(explode(array(
        struct(col(idCol1).as("src"), col(idCol2).as("dst")),
        struct(col(idCol2).as("src"), col(idCol1).as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // comp only decreases, so sum(comp) strictly decreases until fixpoint;
    // exact decimal keeps the check overflow-safe for arbitrary long ids.
    // The checksum rides along the checkpoint materialization via observe()
    // — zero extra jobs per round (an agg-and-head was a second pass over
    // the labels, doubling the per-round fixed job cost on small graphs).
    def checkpointWithChecksum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val cp = df
        .observe(obs, sum(col("comp").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("cs"))
        .localCheckpoint()
      // sum over ZERO rows observes null — a corpus with no near-dup pairs
      // must converge to an empty label frame, not NPE in compareTo.
      val cs = obs.get("cs")
      (cp, if (cs == null) java.math.BigDecimal.ZERO
           else cs.asInstanceOf[java.math.BigDecimal])
    }
    // Fused round 0: every node appears as src (edges are symmetrized), so
    // one groupBy seeds comp(v) = least(v, min neighbor). The same observe
    // also counts the nodes so the iteration can size its shuffles.
    val spark = pairs.sparkSession
    val seedObs = org.apache.spark.sql.Observation()
    val edgeObs = org.apache.spark.sql.Observation()
    val seed = edges.observe(edgeObs, count(lit(1)).as("ne"))
      .groupBy("src")
      .agg(min(col("dst")).as("nbr"))
      .select(col("src").as("id"), least(col("src"), col("nbr")).as("comp"))
      .observe(seedObs,
        sum(col("comp").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("cs"),
        count(lit(1)).as("n"))
      .localCheckpoint()
    var labels = seed
    var prev = seedObs.get("cs") match {
      case null => java.math.BigDecimal.ZERO
      case cs => cs.asInstanceOf[java.math.BigDecimal]
    }
    val nNodes = seedObs.get("n").asInstanceOf[Long]
    // an all-empty pair source can optimize the CollectMetrics node away
    // entirely (PropagateEmptyRelation) — no metric means no edges
    val nEdges = try edgeObs.get("ne").asInstanceOf[Long] catch {
      case _: NoSuchElementException => 0L
    }
    // Driver-resident tier: union-find with union-by-MIN-root (labels are
    // provably identical to the loop's min-label fixpoint). LONG ids only
    // (every in-repo pair source); other id types take the loop.
    if (nEdges <= driverEdgeBudget &&
        edges.schema("src").dataType == org.apache.spark.sql.types.LongType) {
      graft.core.TierStats.record("connectedComponents", "driver")
      val parent = new java.util.HashMap[java.lang.Long, java.lang.Long](
        math.min(nNodes * 2 + 16, Int.MaxValue.toLong).toInt)
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
        r
      }
      edges.select(col("src"), col("dst")).collect().foreach { row =>
        val a = row.getLong(0); val b = row.getLong(1)
        if (!parent.containsKey(a)) parent.put(a, a)
        if (!parent.containsKey(b)) parent.put(b, b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      edges.unpersist()
      import scala.jdk.CollectionConverters._
      import spark.implicits._
      val out = parent.keySet().asScala.toSeq
        .map(k => (k.longValue(), find(k.longValue())))
      return spark.createDataset(out).toDF("id", "comp")
    }
    // Every round is 2 joins + an agg over NODE-sized frames; at the
    // session's corpus-tuned shuffle-partition count a small graph pays
    // rounds x partitions of empty-task scheduling (measured 2.44 -> 1.78 s
    // on the er_golden_record match graph). Scope the loop's partitions to
    // the observed node count (~1M labels per reducer), never above the
    // session setting — at corpus scale the clamp is a no-op, exactly the
    // GraphAnn.WalkShufflePartitions discipline. The scoped setting lives
    // on a SESSION CLONE (own SQLConf, shared context/cache) and only the
    // loop's eager checkpoints execute under it — round 8's fix for the
    // conf-mutation race two concurrent queries on one session would hit.
    graft.core.TierStats.record("connectedComponents", "distributed")
    val loopParts = math.max(1L, math.min(
      spark.conf.get("spark.sql.shuffle.partitions").toLong,
      nNodes / 1000000L + 1L))
    // conf-inheriting clone (NOT newSession — that would re-plan the loop
    // frames under default confs, dropping e.g. the nanosAsLong parquet
    // flag; the SessionBridge.scopedShuffle contract)
    val rebind = org.apache.spark.sql.graftbridge.SessionBridge
      .scopedShuffle(spark, loopParts.toInt)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      // Round part 1: neighbor min — comp(v) <- min(comp(v), min_{u~v} comp(u)).
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("comp").as("src_comp")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("src_comp")).as("nbr_comp"))
      val afterNbr = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // Round part 2: pointer jump — comp(v) <- comp(comp(v)). Labels always
      // point at smaller ids, so chains halve every round.
      val (next, cur) = checkpointWithChecksum(
        rebind(afterNbr
          .join(afterNbr.select(col("id").as("comp"), col("comp").as("parent_comp")),
            Seq("comp"), "left")
          .select(col("id"), coalesce(col("parent_comp"), col("comp")).as("comp"))))
      done = cur.compareTo(prev) == 0
      prev = cur
      labels.unpersist()
      labels = next
      it += 1
    }
    edges.unpersist()
    // re-bind the final checkpointed labels to the CALLER's session so
    // downstream (corpus-sized) shuffles plan at the caller's partitions
    org.apache.spark.sql.graftbridge.SessionBridge.withSession(labels, spark)
  }
}
