package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunker

class ChunkerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pages(text: String, pageSize: Int): Seq[(Int, String)] =
    Seq(text).toDF("text").withColumn("doc_id", lit(1))
      .transform(df => Chunker.chunk(df, "text", pageSize))
      .select($"page_number", $"page_content").as[(Int, String)].collect().toSeq

  test("splits into fixed-size word pages with 0-based page numbers") {
    val words = (1 to 7).map(i => s"w$i").mkString(" ")
    val got = pages(words, 3)
    assert(got === Seq((0, "w1 w2 w3"), (1, "w4 w5 w6"), (2, "w7")))
  }

  test("exact multiple of page size yields trailing empty page (reference //n+1 quirk)") {
    val words = (1 to 6).map(i => s"w$i").mkString(" ")
    val got = pages(words, 3)
    // reference modules/utilities.py:62: range(len//n + 1) -> 3 pages for 6 words
    assert(got === Seq((0, "w1 w2 w3"), (1, "w4 w5 w6"), (2, "")))
  }

  test("short text is one page") {
    assert(pages("hello world", 300) === Seq((0, "hello world")))
  }

  test("single-space split keeps consecutive-space empties (Python str.split(' '))") {
    val got = pages("a  b", 300)
    assert(got === Seq((0, "a  b"))) // 3 words: "a", "", "b" -> rejoined
  }

  test("null text yields an empty non-null page array (robust with or without ANSI)") {
    // assert on pageChunks directly: through chunk()/posexplode a NULL array
    // and an empty array are indistinguishable (both explode to no rows)
    val arrs = Seq(Option.empty[String], Some("a b")).toDF("text")
      .select(Chunker.pageChunks($"text", 300).as("p"))
      .as[Seq[String]].collect().toSeq
    assert(arrs === Seq(Seq.empty, Seq("a b")))
    assertThrows[IllegalArgumentException] {
      Chunker.pageChunks(lit("a"), 0)
    }
  }

  test("chunk pages concatenate back to the original word sequence") {
    val text = (1 to 100).map(i => s"t$i").mkString(" ")
    val got = pages(text, 7).map(_._2).filter(_.nonEmpty).mkString(" ")
    assert(got === text)
  }
}
