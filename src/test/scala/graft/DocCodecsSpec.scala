package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BinaryDocs, DocCodecs, MiniDoc, MiniDocx, MiniPdf}

class DocCodecsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val nasty = Seq(
    "plain words only",
    "",
    "parens (nested (deep)) and \\ backslashes \\( tricky",
    "xml & entities < > &amp; fake",
    "multi\nline\n\ntext with empty line",
    "control\ttab and high-bit: café ß ÿ",
    ")( unbalanced-looking ) (",
    "a" * 5000)

  test("MiniPdf round-trips every nasty string") {
    nasty.foreach { t =>
      val bytes = MiniPdf.encode(t)
      assert(new String(bytes.take(5), "ISO-8859-1") === "%PDF-")
      assert(MiniPdf.extractText(bytes) === t, s"pdf round-trip of '$t'")
    }
  }

  test("MiniPdf rejects non-Latin-1 text (simple-font scope)") {
    intercept[IllegalArgumentException](MiniPdf.encode("中文"))
  }

  test("MiniDocx round-trips every nasty string") {
    nasty.foreach { t =>
      val bytes = MiniDocx.encode(t)
      assert(bytes(0) === 'P'.toByte && bytes(1) === 'K'.toByte)
      assert(MiniDocx.extractText(bytes) === t, s"docx round-trip of '$t'")
    }
    // docx has no Latin-1 restriction — full unicode through the zip/xml
    assert(MiniDocx.extractText(MiniDocx.encode("中文 ok")) === "中文 ok")
  }

  test("decodeAuto dispatches on magic bytes") {
    assert(DocCodecs.decodeAuto(MiniPdf.encode("via pdf")) === "via pdf")
    assert(DocCodecs.decodeAuto(MiniDocx.encode("via docx")) === "via docx")
    assert(DocCodecs.decodeAuto("plain utf-8 é".getBytes("UTF-8")) === "plain utf-8 é")
  }

  test("decodeAuto survives lying magic bytes (poison files fall back, never throw)") {
    // a zip that is NOT a docx: must not throw (one poison file must not
    // fail a whole ingest job) — falls back to the UTF-8 reading
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    zip.putNextEntry(new java.util.zip.ZipEntry("data.bin"))
    zip.write("not a docx".getBytes("UTF-8"))
    zip.closeEntry(); zip.close()
    assert(DocCodecs.decodeAuto(bos.toByteArray) != null)
    // a truncated PDF: header promises PDF, body lies
    val broken = "%PDF-1.4\n<< /Filter /FlateDecode /Length 50 >>\nstream\nxx"
      .getBytes("ISO-8859-1")
    assert(DocCodecs.decodeAuto(broken) != null)
  }

  test("OLE2 compound files quarantine — flagged, never decoded as mojibake") {
    val ole2 = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte) ++ "binary guts".getBytes("ISO-8859-1")
    assert(DocCodecs.isOle2(ole2))
    assert(DocCodecs.detectFormat(ole2) === "ole2")
    // decodeAuto must yield empty text (non-empty filters drop it), never
    // the compound-file bytes reinterpreted as UTF-8
    assert(DocCodecs.decodeAuto(ole2) === "")
    assert(DocCodecs.detectFormat("plain".getBytes("UTF-8")) === "text")
    assert(DocCodecs.detectFormat(MiniPdf.encode("x")) === "pdf")
    assert(DocCodecs.detectFormat(MiniDocx.encode("x")) === "docx")

    val dir = Files.createTempDirectory("graft_ole2").toString
    Files.write(new java.io.File(dir, "legacy.doc").toPath, ole2)
    Files.write(new java.io.File(dir, "fine.txt").toPath,
      "clean text".getBytes("UTF-8"))
    val st = BinaryDocs.readAutoStatus(spark, dir)
      .select(regexp_extract(col("document_path"), "([a-z]+)\\.[a-z]+$", 1),
        col("format"), col("quarantined"), col("text"))
      .as[(String, String, Boolean, Option[String])].collect().toSet
    assert(st === Set(
      ("legacy", "ole2", true, None),
      ("fine", "text", false, Some("clean text"))))
  }

  test("MiniDoc round-trips every windows-1252 string, both stream layouts") {
    // cp1252 covers all the nasty strings except none — they're Latin-1-ish
    nasty.filter(_.length < 3000).foreach { s =>
      assert(MiniDoc.extractText(MiniDoc.encode(s)) === s, s"regular: $s")
      assert(MiniDoc.extractText(MiniDoc.encode(s, forceMini = true)) === s,
        s"mini-stream: $s")
    }
    // > 4096 bytes exercises the multi-sector regular chain
    val big = "word " * 2000
    assert(MiniDoc.extractText(MiniDoc.encode(big)) === big)
  }

  test("MiniDoc rejects complex/encrypted/garbage compound files (quarantine class)") {
    // flip fComplex (bit 0x0004 of the FIB flags): piece-table files must throw
    val complexDoc = MiniDoc.encode("some text")
    // WordDocument stream starts at sector 2 = byte 512*3; flags at +0x0A
    complexDoc(512 * 3 + 0x0A) = (complexDoc(512 * 3 + 0x0A) | 0x04).toByte
    intercept[IllegalArgumentException] { MiniDoc.extractText(complexDoc) }
    val encrypted = MiniDoc.encode("secret")
    encrypted(512 * 3 + 0x0B) = (encrypted(512 * 3 + 0x0B) | 0x01).toByte // 0x0100
    intercept[IllegalArgumentException] { MiniDoc.extractText(encrypted) }
    val garbage = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte) ++ Array.fill(600)(0x41.toByte)
    intercept[Exception] { MiniDoc.extractText(garbage) }
    // and the ingest path translates all three to quarantine, decodable to rows
    assert(DocCodecs.decodeAuto(complexDoc) === "")
    assert(DocCodecs.decodeAuto(MiniDoc.encode("fine")) === "fine")
    assert(DocCodecs.detectFormatDeep(MiniDoc.encode("fine")) === "doc")
    assert(DocCodecs.detectFormatDeep(complexDoc) === "ole2")
  }

  test("decodable .doc files flow through readAutoStatus; broken ones quarantine") {
    val dir = Files.createTempDirectory("graft_minidoc").toString
    Files.write(new java.io.File(dir, "good.doc").toPath,
      MiniDoc.encode("legacy word text"))
    Files.write(new java.io.File(dir, "mini.doc").toPath,
      MiniDoc.encode("small stream layout", forceMini = true))
    val broken = MiniDoc.encode("x")
    broken(512 * 3 + 0x0A) = (broken(512 * 3 + 0x0A) | 0x04).toByte
    Files.write(new java.io.File(dir, "bad.doc").toPath, broken)
    val st = BinaryDocs.readAutoStatus(spark, dir)
      .select(regexp_extract(col("document_path"), "([a-z]+)\\.[a-z]+$", 1),
        col("format"), col("quarantined"), col("text"))
      .as[(String, String, Boolean, Option[String])].collect().toSet
    assert(st === Set(
      ("good", "doc", false, Some("legacy word text")),
      ("mini", "doc", false, Some("small stream layout")),
      ("bad", "ole2", true, None)))
  }

  test("a mixed-format landing zone ingests through the distributed auto path") {
    val dir = Files.createTempDirectory("graft_codecs").toString
    Files.write(new java.io.File(dir, "a.pdf").toPath,
      MiniPdf.encode("alpha words from pdf"))
    Files.write(new java.io.File(dir, "b.docx").toPath,
      MiniDocx.encode("beta words from docx"))
    Files.write(new java.io.File(dir, "c.txt").toPath,
      "gamma words from text".getBytes("UTF-8"))
    val pages = BinaryDocs.readPagesAuto(spark, dir, pageSize = 2)
      .select(regexp_extract(col("document_path"), "([a-z])\\.[a-z]+$", 1).as("doc"),
        col("page_number"), col("page_content"))
      .as[(String, Int, String)].collect().toSet
    assert(pages === Set(
      ("a", 0, "alpha words"), ("a", 1, "from pdf"), ("a", 2, ""),
      ("b", 0, "beta words"), ("b", 1, "from docx"), ("b", 2, ""),
      ("c", 0, "gamma words"), ("c", 1, "from text"), ("c", 2, "")))
  }
}
