package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-size word chunker — the reference's DOCX "synthetic page" splitter
  * (reference `modules/utilities.py:49-78`): split the whole text on single
  * spaces, regroup into pages of `pageSize` words (default 300,
  * `modules/utilities.py:51`), assign 0-based synthetic page numbers.
  *
  * Bit-faithful quirk kept on purpose: the reference loops
  * `range(len(words)//300 + 1)` (`modules/utilities.py:62`), so a text whose
  * word count is an exact multiple of the page size yields one trailing
  * EMPTY page. We reproduce that (documented) so the DuckDB oracle can
  * express the identical computation; callers who want the intended
  * semantics filter with `TextFunctions.nonEmpty`.
  *
  * Spark shape: `split` -> `sequence`/`slice`/`array_join` (all codegen'd
  * built-ins) -> `posexplode`. The per-document loop of the reference becomes
  * rows; no shuffle — this is a narrow map + generate.
  */
object Chunker {

  val DefaultPageSize = 300

  /** Array of page texts for one document text column. NULL text yields an
    * empty (non-null) page list. */
  def pageChunks(text: Column, pageSize: Int = DefaultPageSize): Column = {
    require(pageSize > 0, s"pageSize must be positive, got $pageSize")
    val words = split(text, " ") // literal single-space split, keeps empties — Python str.split(' ')
    val nPages = (floor(size(words) / pageSize) + 1).cast("int") // //pageSize + 1 semantics
    // Under ANSI (this engine's default) size(NULL) is NULL and the whole
    // expression nulls out; with ANSI off it is -1 and Spark's
    // sequence(0, -1) DESCENDS. Guard every nonpositive-nPages cause to an
    // empty page list either way.
    when(text.isNull || nPages < 1, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), nPages - 1),
        i => array_join(slice(words, i * pageSize + 1, lit(pageSize)), " ")))
  }

  /** Sliding-window chunks with overlap — the RAG-standard splitter (window
    * `window` words every `stride` words, overlap = window - stride), where
    * [[pageChunks]] is the reference's non-overlapping special case.
    *
    * Chunk g covers words [g*stride, g*stride + window); starts run while
    * g*stride < len, and an empty text yields one empty chunk (the same
    * degenerate-tail convention as the reference splitter). The last-start
    * bound is written `greatest(len-1, 0) div stride` — both operands
    * nonnegative, because integer division of negatives TRUNCATES in Spark
    * but FLOORS in DuckDB/ANSI, and the oracle must replicate this
    * bit-exactly.
    *
    * Same narrow shape as [[pageChunks]]: split -> sequence/slice/array_join
    * -> posexplode, zero shuffles.
    */
  def slidingChunks(text: Column, window: Int, stride: Int): Column = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    val words = split(text, " ")
    val gMax = floor(greatest(size(words) - 1, lit(0)) / stride).cast("int")
    when(text.isNull, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), gMax),
        g => array_join(slice(words, g * stride + 1, lit(window)), " ")))
  }

  /** Explode a document table into sliding chunks:
    * (original cols..., chunk_id, start_word, chunk_text). */
  def slideChunk(df: DataFrame, textCol: String, window: Int, stride: Int,
                 keepCols: Seq[String] = Nil): DataFrame = {
    val keep = if (keepCols.nonEmpty) keepCols else df.columns.filterNot(_ == textCol).toSeq
    df.select(keep.map(col) :+
        posexplode(slidingChunks(col(textCol), window, stride)): _*)
      .withColumnRenamed("pos", "chunk_id")
      .withColumn("start_word", col("chunk_id") * stride)
      .withColumnRenamed("col", "chunk_text")
      .select(keep.map(col) ++ Seq(col("chunk_id"), col("start_word"), col("chunk_text")): _*)
  }

  /** Explode a document table into (original cols..., page_number, page_content). */
  def chunk(df: DataFrame, textCol: String, pageSize: Int = DefaultPageSize,
            keepCols: Seq[String] = Nil): DataFrame = {
    val keep = if (keepCols.nonEmpty) keepCols else df.columns.filterNot(_ == textCol).toSeq
    df.select(keep.map(col) :+ posexplode(pageChunks(col(textCol), pageSize)): _*)
      .withColumnRenamed("pos", "page_number")
      .withColumnRenamed("col", "page_content")
  }
}
