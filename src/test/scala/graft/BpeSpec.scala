package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer

class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Independent single-node BPE reference: dense maps, same tie-break
    * (count desc, then lexicographic pair). */
  private def bpeRef(wordFreq: Map[String, Long],
                     numMerges: Int): Seq[(String, String, Long)] = {
    var segs: Map[String, Vector[String]] =
      wordFreq.keys.map(w => w -> w.split("").toVector).toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var k = 0
    var done = false
    while (k < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((w, syms) <- segs; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) =
          counts.getOrElse((syms(i), syms(i + 1)), 0L) + wordFreq(w)
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((l, r, c))
        segs = segs.view.mapValues(s =>
          BpeTrainer.applyMerge(s, l, r).toVector).toMap
        k += 1
      }
    }
    out.toSeq
  }

  test("applyMerge is leftmost-greedy and non-overlapping") {
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a"), "a", "a") === Seq("aa", "a"))
    assert(BpeTrainer.applyMerge(Seq("a", "a", "a", "a"), "a", "a") === Seq("aa", "aa"))
    assert(BpeTrainer.applyMerge(Seq("a", "b", "c"), "b", "c") === Seq("a", "bc"))
    assert(BpeTrainer.applyMerge(Seq("x"), "a", "b") === Seq("x"))
    assert(BpeTrainer.applyMerge(Seq(), "a", "b") === Seq())
  }

  test("train matches the reference on a deterministic word soup") {
    // skewed frequencies force a specific merge order; shared prefixes
    // ("spark"/"spare"/"spam") exercise the tie-break and re-segmentation
    val wf = Map("spark" -> 10L, "spare" -> 7L, "spam" -> 5L, "park" -> 9L,
      "lark" -> 3L, "a" -> 50L, "ab" -> 2L)
    val got = BpeTrainer.train(wf.toSeq.toDF("word", "freq"), "word", "freq", 8)
      .map(m => (m.left, m.right, m.pairCount))
    assert(got === bpeRef(wf, 8))
  }

  test("train stops early when the pair space is exhausted") {
    val wf = Map("ab" -> 3L, "a" -> 1L)
    val got = BpeTrainer.train(wf.toSeq.toDF("word", "freq"), "word", "freq", 10)
    // only one mergeable pair exists; after ("a","b") -> "ab" nothing remains
    assert(got.map(m => (m.left, m.right)) === Seq(("a", "b")))
  }

  test("encodeCounts reproduces the training segmentation lengths") {
    val docs = Seq((1L, "spark spark park"), (2L, "spam a a"), (3L, ""))
      .toDF("doc_id", "text")
    val wf = BpeTrainer.wordFreq(docs, "text")
    val merges = BpeTrainer.train(wf, "word", "freq", 5)
    val got = BpeTrainer.encodeCounts(docs, "text", "doc_id", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // reference: encode each word by replaying merges in order
    def enc(w: String): Int = {
      var s: Seq[String] = w.split("").toSeq
      merges.foreach(m => s = BpeTrainer.applyMerge(s, m.left, m.right))
      s.length
    }
    val expect = Seq(
      (1L, 3L, ("spark spark park".split(" ").map(enc).sum).toLong),
      (2L, 3L, ("spam a a".split(" ").map(enc).sum).toLong),
      (3L, 0L, 0L))
    assert(got === expect)
    // BPE can only shrink or keep the whitespace token count per word
    got.foreach { case (_, ws, bpe) => assert(bpe >= ws) }
  }
}
