package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.operators.{Decontaminate, Sampling}

class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // prefix fingerprint (first 8 words) — same key as the decontaminate query
  private lazy val fp = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet")
    .select(col("doc_id"),
      md5(array_join(slice(TextFunctions.wsTokens(lower(col("text"))), 1, 8), " ")).as("fp"),
      (Sampling.hashDraw(col("doc_id"), "eval") <
        lit(Sampling.hexThreshold(0.3))).as("is_eval"))
    .cache()
  private lazy val train = fp.where(!$"is_eval")
  private lazy val evalFps = fp.where($"is_eval").select($"fp")

  test("bloom path is a superset of exact with no false negatives") {
    val exact = Decontaminate.contaminatedExact(train, $"fp", evalFps)
      .select($"doc_id").as[Long].collect().toSet
    val bloom = Decontaminate.contaminatedViaBloom(train, $"fp", evalFps,
      expectedItems = 1000, fpp = 0.01)
      .select($"doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(bloom), "bloom must never miss a contaminated doc")
    // over-flagging bounded: fpp 1% of the clean train side, with slack
    val clean = train.count() - exact.size
    assert(bloom.size - exact.size <= math.max(3, clean * 0.05),
      s"bloom over-flagged ${bloom.size - exact.size} of $clean clean docs")
  }

  test("exact matches the query-level semi-join semantics") {
    val exact = Decontaminate.contaminatedExact(train, $"fp", evalFps)
      .select($"doc_id").as[Long].collect().toSet
    val reference = train.as("t")
      .join(evalFps.distinct().as("e"), $"t.fp" === $"e.fp")
      .select($"t.doc_id").as[Long].collect().toSet
    assert(exact === reference)
  }

  test("ngram contamination matches brute-force window overlap") {
    val docs = Seq(
      // 1 shares the eval doc's middle 4-gram; 2 shares nothing; 3 is a
      // verbatim copy (many hits); 4 is shorter than the window.
      (1L, "x y the quick brown fox jumps z w", false),
      (2L, "entirely different words in this document here now", false),
      (3L, "the quick brown fox jumps over the lazy dog", false),
      (4L, "too short", false),
      (10L, "the quick brown fox jumps over the lazy dog", true))
      .toDF("doc_id", "text", "is_eval")
    val hits = Decontaminate.ngramContaminated(
        docs.where(!$"is_eval"), "text", "doc_id",
        docs.where($"is_eval"), "text", n = 4)
      .as[(Long, Long)].collect().toMap

    def grams(t: String) =
      t.split("\\s+").filter(_.nonEmpty).sliding(4).map(_.mkString(" ")).toSet
    val ev = grams("the quick brown fox jumps over the lazy dog")
    val expected = Map(
      1L -> grams("x y the quick brown fox jumps z w").count(ev),
      3L -> grams("the quick brown fox jumps over the lazy dog").count(ev))
    assert(hits === expected.map { case (k, v) => k -> v.toLong })
    assert(!hits.contains(2L) && !hits.contains(4L))
  }
}
