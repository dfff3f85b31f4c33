package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution.jaroWinkler

class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r4(x: Double) = math.rint(x * 1e4) / 1e4

  test("jaroWinkler pins DuckDB's probed semantics (textbook + edge values)") {
    assert(r4(jaroWinkler("martha", "marhta")) === 0.9611) // prefix-3 bonus
    assert(r4(jaroWinkler("dwayne", "duane")) === 0.84)
    assert(r4(jaroWinkler("crate", "trace")) === 0.7333) // no common prefix
    assert(jaroWinkler("abc", "abc") === 1.0)
    assert(jaroWinkler("abc", "xyz") === 0.0)
    // boost threshold: jaro 0.4667 < 0.7 -> NO prefix bonus despite prefix 1
    assert(r4(jaroWinkler("aXXXX", "aYYYY")) === 0.4667)
    // transpositions are mismatches/2 with INTEGER floor: 3 mismatches -> t=1
    assert(r4(jaroWinkler("abcdef", "bcadef")) === 0.9444)
    // window max(l1,l2)/2-1 = 0: adjacent swap in 2-char strings matches nothing
    assert(jaroWinkler("ab", "ba") === 0.0)
    // empty / null conventions
    assert(jaroWinkler("", "abc") === 0.0)
    assert(jaroWinkler("", "") === 0.0)
    assert(jaroWinkler(null, "abc") === 0.0)
  }

  test("codegen JaroWinklerSim is bit-identical to the String jaroWinkler") {
    import org.apache.spark.unsafe.types.UTF8String
    def sim(a: String, b: String): Double =
      graft.plans.JaroWinklerSim.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
    val hand = Seq("martha" -> "marhta", "dwayne" -> "duane",
      "crate" -> "trace", "abc" -> "abc", "abc" -> "xyz",
      "aXXXX" -> "aYYYY", "abcdef" -> "bcadef", "ab" -> "ba",
      "" -> "abc", "" -> "", "a1b2" -> "ab12", "Smith Jon" -> "jon smith",
      "héllo wörld" -> "hello world") // non-ASCII takes the toString decode
    for ((a, b) <- hand ++ hand.map(_.swap))
      assert(sim(a, b) === jaroWinkler(a, b), s"($a, $b)")
    val rnd = new scala.util.Random(11)
    val alpha = "abcAB 19-.é"
    def rs(): String = Seq.fill(rnd.nextInt(14))(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 5000) {
      val a = rs(); val b = rs()
      assert(sim(a, b) === jaroWinkler(a, b), s"counterexample: ('$a', '$b')")
    }
    // and through the EXPRESSION with codegen on: the generated static
    // call must agree with the interpreted eval and the UDF twin
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("", "x"),
        ("abcdef", "bcadef"), ("héllo", "hello"))
      .toDF("a", "b")
      .withColumn("jw", graft.plans.JaroWinklerExpressions.jaroWinkler(
        org.apache.spark.sql.functions.col("a"),
        org.apache.spark.sql.functions.col("b")))
    val rows = df.collect()
    for (r <- rows)
      assert(r.getDouble(2) === jaroWinkler(r.getString(0), r.getString(1)))
  }

  test("jwUpperBound is admissible: never below the true Jaro-Winkler") {
    import org.apache.spark.unsafe.types.UTF8String
    def ub(a: String, b: String): Double =
      graft.plans.CharBag.jwUpperBound(
        UTF8String.fromString(a), UTF8String.fromString(b))
    // the hand cases above, both orders
    val hand = Seq("martha" -> "marhta", "dwayne" -> "duane",
      "crate" -> "trace", "abc" -> "abc", "abc" -> "xyz",
      "aXXXX" -> "aYYYY", "abcdef" -> "bcadef", "ab" -> "ba",
      "" -> "abc", "a1b2" -> "ab12", "Smith Jon" -> "jon smith")
    for ((a, b) <- hand ++ hand.map(_.swap))
      assert(ub(a, b) >= jaroWinkler(a, b) - 1e-12, s"($a, $b)")
    // randomized sweep over a small alphabet (maximizes near-misses) plus
    // digits/punct (exercises the uncounted-char term)
    val rnd = new scala.util.Random(7)
    val alpha = "abcAB 19-."
    def rs(): String = Seq.fill(rnd.nextInt(12))(alpha(rnd.nextInt(alpha.length))).mkString
    for (_ <- 1 to 5000) {
      val a = rs(); val b = rs()
      assert(ub(a, b) >= jaroWinkler(a, b) - 1e-12, s"counterexample: ('$a', '$b')")
    }
  }

  test("resolve: planted mutations recover their own entity; election deterministic") {
    val clean = Seq((1L, "hash key value"), (2L, "merge sort scan"), (3L, "big fast join"))
      .toDF("id", "name")
    val dirty = Seq(
      (1L, "key hash value"),  // word swap — survives last-word blocking
      (2L, "merge sort sca"),  // truncation — survives first-word blocking
      (3L, "big fast join"),   // exact
      (9L, "zzz qqq www")      // no candidate at all
    ).toDF("id", "name")
    import org.apache.spark.sql.functions.{element_at, split}
    val out = graft.operators.EntityResolution.resolve(dirty, clean, "id", "name",
        blockKeys = Seq(
          n => element_at(split(n, " "), 1),
          n => element_at(split(n, " "), -1)),
        minScore = 0.85)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(1L)._1 === 1L)
    assert(out(2L)._1 === 2L)
    assert(out(3L) === (3L, 1.0))
    assert(!out.contains(9L)) // below-threshold feeds produce no match row
  }

  test("resolve: the hot-block cap is active — the degenerate block is cut " +
       "before the pair join, selective passes still recover every match") {
    import org.apache.spark.sql.functions.{element_at, split}
    // Entities 1-40: all 41 names share the hot first word "smith" (that
    // block alone would contribute 41×41 candidate pairs), but each entity
    // has a unique last word, so the selective last-word pass recovers it.
    // Entity 41's pair is reachable ONLY through the smith block (its last
    // words differ) — the one row whose recall the documented cut contract
    // is allowed to cost.
    val clean = (1L to 40L).map(i => (i, s"smith c$i u$i")) :+
      (41L, "smith aaa ccc")
    val dirty = (1L to 40L).map(i => (i, s"smith d$i u$i")) :+
      (41L, "smith aaa bbb")
    val cleanDf = clean.toDF("id", "name"); val dirtyDf = dirty.toDF("id", "name")
    val keys: Seq[org.apache.spark.sql.Column => org.apache.spark.sql.Column] =
      Seq(n => element_at(split(n, " "), 1), n => element_at(split(n, " "), -1))
    val capped = graft.operators.EntityResolution.resolve(
        dirtyDf, cleanDf, "id", "name", keys, minScore = 0.85, maxBlockFreq = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val uncapped = graft.operators.EntityResolution.resolve(
        dirtyDf, cleanDf, "id", "name", keys, minScore = 0.85)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // capped: identity matches 1-40 via the unique last words; 41 is gone
    // because its only candidate path was the cut smith block
    assert(capped === (1L to 40L).map(i => i -> i).toMap)
    // uncapped: the smith block supplies 41's candidate (proving the
    // capped run really dropped a live block, not a no-op)
    assert(uncapped(41L) === 41L)
    assert((1L to 40L).forall(i => uncapped(i) === i))
    // sub-blocking recovers the hot block's recall without the quadratic
    // blow-up: re-keyed by the second token, "smith aaa *" is its own
    // selective sub-block, so pair 41 comes back while the 40 smith
    // siblings (distinct second tokens) still never meet
    val subbed = graft.operators.EntityResolution.resolve(
        dirtyDf, cleanDf, "id", "name", keys, minScore = 0.85,
        maxBlockFreq = 10,
        subBlockKey = Some(n => element_at(split(n, " "), 2)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(subbed === (1L to 41L).map(i => i -> i).toMap)
  }
}
