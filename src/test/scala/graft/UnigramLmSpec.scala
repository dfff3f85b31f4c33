package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.UnigramLm

class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet").cache()
  private lazy val model = UnigramLm.train(
    UnigramLm.wordFreq(docs, "text"), "word", "freq",
    topMultis = 24, iterations = 2)

  test("train: probs are a distribution, every single char is in vocab, " +
       "grid counts are positive") {
    assert(math.abs(model.probs.values.sum - 1.0) < 1e-9)
    assert(model.counts.forall(_._2 > 0), "EM must keep every piece alive")
    val chars = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
      .flatMap(_.toCharArray.map(_.toString)).toSet
    chars.foreach(c => assert(model.probs.contains(c), s"single '$c' missing"))
    // multi-char pieces must have survived seeding AND EM
    assert(model.counts.count(_._1.length >= 2) > 0)
  }

  test("train is deterministic across repartitioning (grid-count exactness)") {
    def cnts(df: org.apache.spark.sql.DataFrame): Map[String, BigInt] =
      UnigramLm.train(UnigramLm.wordFreq(df, "text"), "word", "freq",
        topMultis = 24, iterations = 2).counts.toMap
    assert(cnts(docs) === cnts(docs.repartition(7)))
  }

  test("viterbi: piece count bounded by [ceil(n/4), n]; an in-vocab word " +
       "segments as one piece when its own prob beats any split") {
    model.probs.keys.filter(_.length >= 2).foreach { pc =>
      val n = UnigramLm.viterbiPieces(pc, model.probs)
      assert(n >= 1 && n <= pc.length)
    }
    val ws = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
    ws.foreach { w =>
      val n = UnigramLm.viterbiPieces(w, model.probs)
      assert(n >= (w.length + 3) / 4 && n <= w.length, s"$w -> $n pieces")
    }
    // a degenerate model where one whole word dominates must pick 1 piece
    val p = Map("ab" -> 0.9, "a" -> 0.05, "b" -> 0.05)
    assert(UnigramLm.viterbiPieces("ab", p) === 1)
    // smallest-l tie rule: identical products pick the single-char path
    val tied = Map("a" -> 0.5, "b" -> 0.5, "ab" -> 0.25)
    assert(UnigramLm.viterbiPieces("ab", tied) === 2)
  }

  test("viterbiScore: piece count matches viterbiPieces; grid is -ln(best)" +
       " at 1e6; zero-prob words hit the documented ceiling") {
    val ws = docs.select(explode(split(col("text"), " ")).as("w"))
      .where(col("w") =!= "").distinct().as[String].collect()
    ws.take(100).foreach { w =>
      val (p, g) = UnigramLm.viterbiScore(w, model.probs)
      assert(p === UnigramLm.viterbiPieces(w, model.probs))
      assert(g >= 0, s"$w: neg-logprob grid must be non-negative, got $g")
    }
    // a one-piece word with prob 0.9: grid = round(-ln(0.9) * 1e6)
    val p = Map("ab" -> 0.9, "a" -> 0.05, "b" -> 0.05)
    assert(UnigramLm.viterbiScore("ab", p)._2 ===
      math.round(-math.log(0.9) * 1e6))
    // unsegmentable (a char with prob 0 and no alternative) -> ceiling
    val z = Map("a" -> 1.0, "b" -> 0.0)
    assert(UnigramLm.viterbiScore("b", z)._2 === UnigramLm.ZeroProbGrid)
  }

  test("pplStats: tertile buckets are balanced and ordered by xent") {
    val ppl = UnigramLm.pplStats(docs, "text", "doc_id", model.probs)
      .select(col("doc_id"), col("xent"), col("bucket"))
      .as[(Long, Double, String)].collect()
    val n = ppl.length
    val byB = ppl.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byB.keySet === Set("head", "middle", "tail"))
    // exact tertiles: sizes within 1 of n/3
    byB.values.foreach(v => assert(math.abs(v.length - n / 3.0) <= 1.0))
    // every head xent <= every middle xent <= every tail xent
    assert(byB("head").max <= byB("middle").min)
    assert(byB("middle").max <= byB("tail").min)
  }

  test("encodeStats: per-doc totals equal the sum of per-word viterbi counts") {
    val enc = UnigramLm.encodeStats(docs, "text", "doc_id", model.probs)
      .orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_words"), col("n_pieces"))
      .as[(Long, Int, Int)].collect()
    val byDoc = docs.where(col("text").isNotNull && col("text") =!= "")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    enc.take(25).foreach { case (d, nw, np) =>
      val ws = byDoc(d).filter(_.nonEmpty)
      assert(nw === ws.length)
      assert(np === ws.map(UnigramLm.viterbiPieces(_, model.probs)).sum)
    }
  }
}
