package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dictionary tagging at corpus scale: match a phrase dictionary (banned
  * phrases, entity gazetteer, policy list) against every document in ONE
  * pass per document with an Aho-Corasick automaton (Aho & Corasick 1975)
  * — the multi-pattern matcher whose cost is O(text + matches) regardless
  * of dictionary size, where the naive per-phrase scan is
  * O(text × phrases). The workhorse behind FlashText-style keyword
  * tagging, banned-phrase filters, and gazetteer NER in training-data
  * pipelines.
  *
  * Match semantics (pinned for the oracle): every occurrence of every
  * pattern as a SUBSTRING of the lowercased text, overlaps included —
  * "aaa" contains "aa" twice; "she" contains both "she" and "he" (the
  * suffix-output links make AC report both). The oracle replays this as
  * the all-start-positions substring count, so a broken fail/output link
  * hash-fails.
  *
  * Scale shape: the automaton builds once driver-side (dictionary-sized)
  * and rides into the closure; the scan is a narrow map — no shuffle, no
  * join against the dictionary, nothing corpus-quadratic.
  */
object DictionaryTag {

  /** Aho-Corasick automaton over lowercase patterns. Immutable after
    * construction; serializable into task closures. */
  final class AhoCorasick(patterns: Seq[String]) extends Serializable {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "patterns must be non-empty strings")
    private val pats: Array[String] = patterns.distinct.sorted.toArray

    // trie with goto maps, fail links, and per-node output pattern ids
    private val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.HashMap.empty[Char, Int])
    private val out = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { ch =>
        node = children(node).getOrElseUpdate(ch, {
          children += scala.collection.mutable.HashMap.empty[Char, Int]
          out += Nil
          children.length - 1
        })
      }
      out(node) = pid :: out(node)
    }
    private val fail = new Array[Int](children.length)
    locally { // BFS fail links; outputs accumulate along suffix chains
      val queue = scala.collection.mutable.Queue.empty[Int]
      children(0).values.foreach { c => fail(c) = 0; queue += c }
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        children(u).foreach { case (ch, v) =>
          var f = fail(u)
          while (f != 0 && !children(f).contains(ch)) f = fail(f)
          fail(v) = if (children(f).contains(ch) && children(f)(ch) != v)
            children(f)(ch) else 0
          out(v) = out(v) ++ out(fail(v))
          queue += v
        }
      }
    }
    private val childArr: Array[Map[Char, Int]] = children.map(_.toMap).toArray
    private val outArr: Array[Array[Int]] = out.map(_.toArray).toArray

    def nPatterns: Int = pats.length
    def pattern(i: Int): String = pats(i)

    /** Per-pattern occurrence counts over `text` (overlaps included). */
    def countMatches(text: String): Array[Long] = {
      val counts = new Array[Long](pats.length)
      if (text == null) return counts
      var node = 0
      var i = 0
      while (i < text.length) {
        val ch = text.charAt(i)
        while (node != 0 && !childArr(node).contains(ch)) node = fail(node)
        node = childArr(node).getOrElse(ch, 0)
        val os = outArr(node)
        var j = 0
        while (j < os.length) { counts(os(j)) += 1; j += 1 }
        i += 1
      }
      counts
    }
  }

  /** Per-document dictionary tags: total matches, distinct patterns hit,
    * and an md5 over the sorted "pattern:count" list (the hash-checkable
    * full match profile). Text is lowercased with Locale.ROOT so the
    * mapping matches Spark's `lower()`/the DuckDB oracle on every JVM
    * default locale (tr_TR would otherwise map 'I' to dotless 'ı'). */
  def tagCounts(df: DataFrame, textCol: String, idCol: String,
                phrases: Seq[String]): DataFrame = {
    val ac = new AhoCorasick(phrases.map(_.toLowerCase(java.util.Locale.ROOT)))
    val tagUdf = udf { (t: String) =>
      val c = ac.countMatches(
        if (t == null) null else t.toLowerCase(java.util.Locale.ROOT))
      val hit = (0 until ac.nPatterns).filter(c(_) > 0)
      val profile = hit.map(i => s"${ac.pattern(i)}:${c(i)}").mkString(",")
      (c.sum, hit.length, profile)
    }
    df.select(col(idCol), tagUdf(col(textCol)).as("tag"))
      .select(col(idCol), col("tag._1").as("n_matches"),
        col("tag._2").as("n_patterns"),
        md5(col("tag._3")).as("matches_md5"))
  }
}
