package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

/** Fuzzy entity resolution: multi-pass blocking + Jaro-Winkler scoring +
  * deterministic best-match election — the record-linkage workhorse
  * (matching a dirty feed against a clean registry without an all-pairs
  * join).
  *
  * The Jaro-Winkler here is implemented to DuckDB's exact observable
  * semantics (probed empirically, see JaroWinklerSpec): match window
  * `max(l1,l2)/2 - 1` (floor, clamped ≥0), transpositions = mismatched
  * matched-positions / 2 (INTEGER floor — 'abcdef'/'bcadef' scores 0.9444,
  * not 0.9167), Winkler prefix bonus (≤4 chars, scale 0.1) applied only
  * when jaro > 0.7, and 0.0 whenever either side is empty (including
  * both-empty). That pin is what lets the oracle call DuckDB's NATIVE
  * `jaro_winkler_similarity` — the strongest cross-engine check available:
  * two independent implementations of the full algorithm must agree on
  * every candidate pair (scores compared at round 4; rank ties broken on
  * the rounded score).
  *
  * Scale shape: candidate generation is a union of equi-joins on cheap
  * blocking keys (never a cartesian — PlanSweepSpec enforces that
  * repo-wide), deduplicated on the pair key; scoring is a narrow compiled
  * UDF over candidates only; the best-match election is one
  * `max_by(match, (score, -id))` aggregation, map-side combinable. Block
  * sizes bound the quadratic term: pairs ≤ Σ_b |dirty_b|·|clean_b|, and
  * the `maxBlockFreq` hot-block cut in [[resolve]] ENFORCES that bound —
  * degenerate keys are dropped before the pair join, exactly like the
  * winnowing `maxFpFreq` cut and the LSH band-table caps.
  */
object EntityResolution {

  /** DuckDB-compatible Jaro-Winkler (see object scaladoc for the pinned
    * semantics). Pure JVM, no allocation beyond two flag arrays. */
  def jaroWinkler(s1: String, s2: String): Double = {
    if (s1 == null || s2 == null) return 0.0
    val l1 = s1.length; val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1); val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var matched = false
      while (j <= hi && !matched) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0; var mism = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) mism += 1
        k += 1
      }
      i += 1
    }
    val t = mism / 2
    val jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro <= 0.7) jaro
    else {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    }
  }

  val jaroWinklerUdf: UserDefinedFunction = udf(jaroWinkler _)

  /** Match `dirty(idCol, nameCol)` against `clean(idCol, nameCol)`:
    * candidates from the union of one equi-join per blocking expression,
    * Jaro-Winkler scored (round 4), best clean match per dirty id elected
    * by (score desc, clean id asc). Rows whose best score < `minScore`
    * are dropped (no candidate ≥ threshold = no match row).
    *
    * `maxBlockFreq` is the hot-block cut that makes the quadratic term
    * ACTUALLY bounded, not just bounded-in-expectation: one degenerate
    * block (every "smith", an empty soundex, a null-ish token) contributes
    * |dirty_b|·|clean_b| candidate pairs, so a single ubiquitous key can
    * dominate the whole join at corpus scale. Blocks whose per-side
    * frequency exceeds the cap are dropped BEFORE the pair join (the
    * [[Dedup.winnowCandidatePairs]] `maxFpFreq` contract: a dropped block
    * can only lower recall — a record usually survives via its other,
    * more selective blocking passes — it can never invent a match).
    * Pair count is thereby ≤ passes · maxBlockFreq² · #blocks-touched.
    *
    * `subBlockKey`: instead of DROPPING a hot block, re-key its rows by
    * `bk + '#' + subBlockKey(name)` and join within the sub-blocks — the
    * standard recall-preserving refinement (every "smith" splits by, say,
    * the second token). Pairs inside a hot block survive iff they share
    * the secondary key; sub-blocks that are STILL hot fall back to the
    * drop (the cap is a hard bound either way).
    */
  def resolve(dirty: DataFrame, clean: DataFrame, idCol: String,
              nameCol: String, blockKeys: Seq[Column => Column],
              minScore: Double, maxBlockFreq: Int = 10000,
              subBlockKey: Option[Column => Column] = None): DataFrame = {
    val cand = candidatePairs(dirty, clean, idCol, nameCol, blockKeys,
      maxBlockFreq, subBlockKey)
    cand
      // verify ladder (the Dedup.levenshtein discipline): the codegen
      // length+char-bag upper bound rejects pairs that provably cannot
      // round to >= minScore before the O(l1*l2) JW window scan runs —
      // admissible (CharBag.jwUpperBound), so the survivors' scores and
      // the election are bit-identical. The 1e-4 margin covers round(.,4).
      .where(graft.plans.CharBagExpressions.jwUpperBound(
        col("dirty_name"), col("clean_name")) >= minScore - 1e-4)
      // codegen JW (bit-identical to jaroWinkler, pinned in the spec):
      // survivors of the admissible cut stay inside WholeStageCodegen
      // instead of paying the UDF's String-conversion + boxing fence
      .withColumn("jw", round(graft.plans.JaroWinklerExpressions.jaroWinkler(
        col("dirty_name"), col("clean_name")), 4))
      .where(col("jw") >= minScore)
      .groupBy(col("dirty_id"))
      .agg(
        max_by(struct(col("clean_id"), col("jw")),
          struct(col("jw"), (-col("clean_id")).as("nid"))).as("best"))
      .select(col("dirty_id"), col("best.clean_id").as("match_id"),
        col("best.jw").as("score"))
  }

  /** The capped, blocked candidate generator behind [[resolve]], exposed
    * for flows that need the raw pair set rather than a best-match
    * election (e.g. match-graph construction feeding connected
    * components). Returns distinct (dirty_id, dirty_name, clean_id,
    * clean_name) rows; the `maxBlockFreq` hot-block cut and the optional
    * `subBlockKey` refinement apply exactly as documented on [[resolve]] —
    * EVERY consumer of blocked candidates gets the bounded quadratic term,
    * not just the election path. */
  def candidatePairs(dirty: DataFrame, clean: DataFrame, idCol: String,
                     nameCol: String, blockKeys: Seq[Column => Column],
                     maxBlockFreq: Int = 10000,
                     subBlockKey: Option[Column => Column] = None): DataFrame = {
    require(blockKeys.nonEmpty, "at least one blocking key required")
    val d = dirty.select(col(idCol).as("dirty_id"), col(nameCol).as("dirty_name"))
    val c = clean.select(col(idCol).as("clean_id"), col(nameCol).as("clean_name"))
    val proj = Seq(col("dirty_id"), col("dirty_name"), col("clean_id"),
      col("clean_name"))
    val cand = blockKeys.map { bk =>
      val dk = d.withColumn("bk", bk(col("dirty_name")))
      val ck = c.withColumn("bk", bk(col("clean_name")))
      // per-side frequency gate for THIS pass (passes stay independent:
      // a key hot as a first word may be selective as a last word)
      val freqD = dk.groupBy(col("bk")).agg(count(lit(1)).as("__nd"))
      val freqC = ck.groupBy(col("bk")).agg(count(lit(1)).as("__nc"))
      val ok = freqD.where(col("__nd") <= maxBlockFreq).select(col("bk"))
        .join(freqC.where(col("__nc") <= maxBlockFreq).select(col("bk")), "bk")
      val cold = dk.join(ok, Seq("bk"), "left_semi")
        .join(ck.join(ok, Seq("bk"), "left_semi"), "bk")
        .select(proj: _*)
      subBlockKey match {
        case None => cold
        case Some(sub) =>
          val hot = freqD.where(col("__nd") > maxBlockFreq).select(col("bk"))
            .unionByName(freqC.where(col("__nc") > maxBlockFreq).select(col("bk")))
            .distinct()
          val dh = dk.join(hot, Seq("bk"), "left_semi")
            .withColumn("bk2", concat(col("bk"), lit("#"), sub(col("dirty_name"))))
          val ch = ck.join(hot, Seq("bk"), "left_semi")
            .withColumn("bk2", concat(col("bk"), lit("#"), sub(col("clean_name"))))
          val ok2 = dh.groupBy(col("bk2")).agg(count(lit(1)).as("__nd"))
            .where(col("__nd") <= maxBlockFreq).select(col("bk2"))
            .join(ch.groupBy(col("bk2")).agg(count(lit(1)).as("__nc"))
              .where(col("__nc") <= maxBlockFreq).select(col("bk2")), "bk2")
          cold.unionByName(
            dh.join(ok2, Seq("bk2"), "left_semi")
              .join(ch.join(ok2, Seq("bk2"), "left_semi"), "bk2")
              .select(proj: _*))
      }
    }.reduce(_ unionByName _).distinct()
    cand
  }
}
