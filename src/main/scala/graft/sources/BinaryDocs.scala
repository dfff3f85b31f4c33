package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Chunker

/** S1 byte-level document ingest — the reference cracks raw PDF/DOCX bytes
  * into per-page records (readPDF / readMSWord, reference
  * `modules/utilities.py:31-78`); this is that capability on Spark's
  * distributed `binaryFile` source. Each landing file becomes one row
  * (path, modificationTime, length, content); the byte decode and the
  * page split run in EXECUTORS (decode + the codegen'd [[Chunker]]), so a
  * million-file landing zone ingests embarrassingly parallel — no driver
  * loop over files, unlike the reference's per-upload loop.
  *
  * The container ships no PDF/DOCX codecs, so the decode step here is the
  * honest UTF-8 text case; a real deployment drops a pdfbox-style
  * `mapPartitions` decoder in place of `decode(content, "UTF-8")` and
  * keeps every other stage (the same swap-point design as
  * [[graft.multimodal.Multimodal]]). */
object BinaryDocs {

  /** Raw landing-zone read: one row per file. `pathGlobFilter` prunes at
    * file-listing time (never reads filtered files). */
  def readRaw(spark: SparkSession, dir: String, glob: String = "*.txt"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path").as("document_path"),
        col("length").as("n_bytes"),
        col("content"))

  /** Bytes -> text -> per-page records, the reference's synthetic-page
    * semantics included (pageSize words per page, `//n + 1` empty tail). */
  def readPages(spark: SparkSession, dir: String, pageSize: Int = Chunker.DefaultPageSize,
                glob: String = "*.txt"): DataFrame = {
    val decoded = readRaw(spark, dir, glob)
      .select(col("document_path"), decode(col("content"), "UTF-8").as("text"))
    Chunker.chunk(decoded, "text", pageSize)
  }

  private val decodeAutoUdf = udf((b: Array[Byte]) => DocCodecs.decodeAuto(b))

  /** Format-dispatched variant: PDF and DOCX payloads decode through the
    * pure-JVM codecs ([[DocCodecs]] — Flate content streams, OOXML zip),
    * anything else as UTF-8, chosen per FILE by magic bytes so one landing
    * zone can mix formats. The decode is a black-box byte parser, the one
    * place a scalar UDF (not an Expression) is the honest tool; it still
    * runs fully distributed inside the scan's project. */
  def readPagesAuto(spark: SparkSession, dir: String,
                    pageSize: Int = Chunker.DefaultPageSize,
                    glob: String = "*"): DataFrame = {
    val decoded = readRaw(spark, dir, glob)
      .select(col("document_path"), decodeAutoUdf(col("content")).as("text"))
    Chunker.chunk(decoded, "text", pageSize)
  }

  private val detectFormatUdf = udf((b: Array[Byte]) => DocCodecs.detectFormatDeep(b))

  /** Quarantine-aware landing-zone read: one row per FILE with its detected
    * format and decode status. Simple non-complex legacy `.doc` binaries
    * decode through [[DocCodecs.MiniDoc]] and report format `doc`; OLE2
    * compound files the parser rejects (piece-table, encrypted, non-Word —
    * the reference dispatches `'doc'` too, `modules/utilities.py:164`) are
    * flagged `quarantined` with NULL text: undecodable compound-file
    * binary must never flow downstream as mojibake "text". Everything else
    * decodes through the same [[DocCodecs.decodeAuto]] dispatch as
    * [[readPagesAuto]], so the two paths can never disagree on the
    * decodable formats. */
  def readAutoStatus(spark: SparkSession, dir: String,
                     glob: String = "*"): DataFrame =
    readRaw(spark, dir, glob)
      .withColumn("format", detectFormatUdf(col("content")))
      .withColumn("quarantined", col("format") === "ole2")
      .withColumn("text", when(col("quarantined"), lit(null).cast("string"))
        .otherwise(decodeAutoUdf(col("content"))))
      .select(col("document_path"), col("n_bytes"), col("format"),
        col("quarantined"), col("text"))
}
