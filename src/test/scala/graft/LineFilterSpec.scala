package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.LineFilter

class LineFilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val page =
    Seq("This line has plenty of words and ends well.",
      "too short.",                                  // < 4 words
      "this line has enough words but no terminal",  // no punctuation
      "Sneaky Lorem Ipsum filler inside this line.", // policy (case-folded)
      "Does a question mark count as terminal?",
      "So does an exclamation mark!").mkString("\n")

  test("verdict cascade: policy beats short beats no_terminal; terminal set is . ! ? \"") {
    val df = Seq((1L, page)).toDF("doc_id", "text")
    val out = LineFilter.lineVerdicts(df, "text", "doc_id")
      .orderBy("line_idx")
      .select("reason", "kept").as[(String, Boolean)].collect()
    assert(out.toSeq === Seq(
      ("ok", true), ("short", false), ("no_terminal", false),
      ("policy", false), ("ok", true), ("ok", true)))
    // a line that is BOTH short and policy reports policy (precedence)
    val both = LineFilter.lineVerdicts(
      Seq((1L, "lorem ipsum")).toDF("doc_id", "text"), "text", "doc_id")
      .select("reason").as[String].head()
    assert(both === "policy")
  }

  test("page rule: >= minKeptLines survivors reassemble in order, others drop") {
    val df = Seq((1L, page), (2L, "one good line is not enough.")).toDF("doc_id", "text")
    val pages = LineFilter.reassemblePages(
        LineFilter.lineVerdicts(df, "text", "doc_id"), "doc_id", minKeptLines = 3)
      .orderBy("doc_id").collect()
    assert(pages.length === 1 && pages(0).getLong(0) === 1L)
    assert(pages(0).getLong(1) === 3L)
    val cleaned = pages(0).getString(2)
    assert(cleaned ===
      Seq("This line has plenty of words and ends well.",
        "Does a question mark count as terminal?",
        "So does an exclamation mark!").mkString("\n"))
  }
}
