package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TextEval

class TextEvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pairs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "ref_text", "cand_text")
      .select(col("doc_id"),
        split(col("ref_text"), " ").as("ref"),
        split(col("cand_text"), " ").as("cand"))

  test("bleuPerDoc: clipping caps repeated grams; zero precision zeroes the score") {
    // the Papineni clipping example: 'the' appears 3x in cand, 2x in ref
    val df = TextEval.bleuPerDoc(
      pairs((1L, "the cat is on the mat", "the the the cat mat")),
      col("ref"), col("cand"), col("doc_id"))
    val r = df.select($"p1", $"p2", $"p3", $"p4", $"bleu")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(r._1 === 0.8)   // clipped: the->2, cat->1, mat->1 over 5
    assert(r._2 === 0.25)  // only 'the cat' of 4 bigrams survives
    assert(r._3 === 0.0 && r._4 === 0.0)
    assert(r._5 === 0.0, "any zero precision must zero BLEU")
  }

  test("bleuPerDoc: identical pair scores 1; pure-prefix pair pays only brevity") {
    val df = TextEval.bleuPerDoc(
      pairs((1L, "the cat is on the mat", "the cat is on the mat"),
            (2L, "the cat is on the mat", "the cat is on")),
      col("ref"), col("cand"), col("doc_id")).orderBy($"id")
    val rows = df.select($"id", $"p1", $"p4", $"bp", $"bleu")
      .as[(Long, Double, Double, Double, Double)].collect()
    assert(rows(0) === ((1L, 1.0, 1.0, 1.0, 1.0)))
    // prefix: all precisions 1, bp = exp(1 - 6/4)
    val bp = math.round(math.exp(1.0 - 6.0 / 4.0) * 1e4) / 1e4
    assert(rows(1)._2 === 1.0 && rows(1)._3 === 1.0)
    assert(rows(1)._4 === bp && rows(1)._5 === bp)
  }

  test("rougePerDoc: recall counts against the reference, precision against the candidate") {
    // ref 6 tokens, cand keeps 4 of them (subsequence with a gap)
    val df = TextEval.rougePerDoc(
      pairs((1L, "a b c d e f", "a b d e")),
      col("ref"), col("cand"), col("doc_id"))
    val r = df.select($"rouge1_recall", $"rouge1_precision", $"rouge1_f1",
        $"rouge2_recall", $"rouge2_precision")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(r._1 === 0.6667) // 4 of 6 unigrams recalled
    assert(r._2 === 1.0)    // every cand unigram is in ref
    assert(r._3 === 0.8)    // 2PR/(P+R) = 2*.6667*1/1.6667
    // cand bigrams: ab, bd, de -> bd straddles the gap, only ab/de match
    assert(r._4 === 0.4)    // 2 of 5 ref bigrams
    assert(r._5 === 0.6667) // 2 of 3 cand bigrams
    // identical pair: all ones
    val perfect = TextEval.rougePerDoc(pairs((2L, "x y z", "x y z")),
      col("ref"), col("cand"), col("doc_id"))
      .select($"rouge2_f1").as[Double].head()
    assert(perfect === 1.0)
  }

  test("werCer: substitutions/deletions/insertions count at the token level") {
    val df = TextEval.werCer(pairs(
      (1L, "the cat sat on the mat", "the cat sat on the mat"), // perfect
      (2L, "the cat sat on the mat", "the dog sat on mat"),     // 1 sub + 1 del... and 1 del
      (3L, "a b c", "a b c d e")),                              // 2 insertions
      col("ref"), col("cand"), col("doc_id")).orderBy($"id")
    val rows = df.select($"id", $"wer", $"cer").as[(Long, Double, Double)].collect()
    assert(rows(0) === ((1L, 0.0, 0.0)))
    // ref has 6 tokens; cand: cat->dog sub, 'the'(5th) deleted -> 2 edits / 6
    assert(rows(1)._2 === 0.3333)
    // token-level, not char-level: 2 token inserts over 3 ref tokens
    assert(rows(2)._2 === 0.6667)
    // repeated tokens must encode to the SAME symbol (WER of a swap is 2)
    val swap = TextEval.werCer(pairs((9L, "x y x y", "y x y x")),
      col("ref"), col("cand"), col("doc_id"))
      .select($"wer").as[Double].head()
    assert(swap === 0.5) // one del + one insert realigns the alternation
  }

  test("werCer token cap: loud at build past 47, loud at runtime past the " +
      "cap, exact at the boundary") {
    // build-time: 2*cap must fit the 94 printable symbols
    assertThrows[IllegalArgumentException] {
      TextEval.werCer(pairs((1L, "a", "a")),
        col("ref"), col("cand"), col("doc_id"), maxTokensPerSide = 48)
    }
    // boundary: exactly cap tokens per side, all distinct across sides
    // (union vocab = 2*cap = 94 symbols) still encodes exactly
    val refs = (1 to 47).map(i => s"r$i").mkString(" ")
    val cands = (1 to 47).map(i => s"c$i").mkString(" ")
    val edge = TextEval.werCer(pairs((1L, refs, cands)),
      col("ref"), col("cand"), col("doc_id"), maxTokensPerSide = 47)
      .select($"wer").as[Double].head()
    assert(edge === 1.0) // fully disjoint: every ref token substituted
    // over-cap input: the job FAILS (raise_error), never alias-encodes
    val over = (1 to 48).map(i => s"t$i").mkString(" ")
    val ex = intercept[Exception] {
      TextEval.werCer(pairs((1L, over, "a")),
        col("ref"), col("cand"), col("doc_id"), maxTokensPerSide = 47)
        .collect()
    }
    assert(ex.getMessage != null)
  }

  test("bleuCorpus: aggregates counts, not doc scores; empty candidate handled") {
    val p = pairs(
      (1L, "a b c d e", "a b c d e"),     // perfect
      (2L, "a b c d e", "x y z w v"))     // zero overlap
    val corpus = TextEval.bleuCorpus(p, col("ref"), col("cand"), col("doc_id"))
      .select($"n_docs", $"ref_len", $"cand_len", $"p1", $"bleu")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(corpus._1 === 2L && corpus._2 === 10L && corpus._3 === 10L)
    assert(corpus._4 === 0.5) // 5 clipped of 10 — counts pooled before dividing
    // corpus p4 = 2/4 > 0 so corpus BLEU is positive even though doc 2 is 0
    assert(corpus._5 > 0.0)
    // mean of per-doc scores would be 0.5; corpus-BLEU must differ (geometric
    // pooling): here exp(mean ln p_n) with p = (.5,.5,.667... no—counts pool)
    val perDoc = TextEval.bleuPerDoc(p, col("ref"), col("cand"), col("doc_id"))
      .select($"bleu").as[Double].collect()
    assert(perDoc.sorted.toSeq === Seq(0.0, 1.0))
    // empty candidate: zero everything, no division error
    val e = TextEval.bleuPerDoc(
      pairs((9L, "a b", "")).withColumn("cand", array().cast("array<string>")),
      col("ref"), col("cand"), col("doc_id"))
      .select($"bp", $"bleu").as[(Double, Double)].head()
    assert(e === ((0.0, 0.0)))
  }

  test("chrfPerDoc: hand-computed F_2 on a tiny pair; identical strings " +
      "score 1; empty candidate scores 0 without division errors") {
    val df = Seq((1L, "abab", "ab"), (2L, "abcdefgh", "abcdefgh"),
      (3L, "abc", "")).toDF("doc_id", "ref", "cand")
    val out = TextEval.chrfPerDoc(df, col("ref"), col("cand"), col("doc_id"))
      .orderBy(col("id")).collect()
    // ref=abab cand=ab: p1=1, p2=1, p3..6=0 -> chrP=1/3
    // r1=2/4, r2=1/3, r3..6=0 -> chrR=5/36
    // F2 = 5PR/(4P+R) = (25/108)/(53/36) = 900/5724 = 0.1572...
    val r1 = out(0)
    assert(r1.getAs[Int]("ref_nchars") === 4 && r1.getAs[Int]("cand_nchars") === 2)
    assert(r1.getAs[Double]("chr_p") === 0.3333)
    assert(r1.getAs[Double]("chr_r") === 0.1389)
    assert(r1.getAs[Double]("chrf2") === 0.1572)
    // identical 8-char strings: every order 1..6 has p=r=1 -> F2 = 1
    val r2 = out(1)
    assert(r2.getAs[Double]("chr_p") === 1.0 && r2.getAs[Double]("chr_r") === 1.0)
    assert(r2.getAs[Double]("chrf2") === 1.0)
    // empty candidate: all precisions/recalls 0, F2 = 0 (guarded denominator)
    val r3 = out(2)
    assert(r3.getAs[Double]("chr_p") === 0.0 && r3.getAs[Double]("chrf2") === 0.0)
  }
}
