package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** Pure-JVM document-format codecs for the byte-level ingest path
  * ([[BinaryDocs]]) — the capability the reference exercises with
  * PyPDFLoader / python-docx (reference `modules/utilities.py:31-78`),
  * re-expressed with nothing but JDK primitives so the decode step runs in
  * EXECUTORS with zero dependencies:
  *
  *   - [[MiniPdf]]: real PDF files — Flate-compressed content streams,
  *     `Tj`/`TJ`/`'` text-showing operators, literal strings with the full
  *     escape set (including octal), balanced-paren nesting, a correct
  *     xref table. The reader scope is content-stream text extraction
  *     (fonts/ToUnicode CMaps are out of scope — the writer half emits
  *     Latin-1 Helvetica, the common case for machine-generated text).
  *   - [[MiniDocx]]: real DOCX files — a ZIP container holding OOXML
  *     `word/document.xml`; paragraphs become `<w:p>`/`<w:t>` runs, the
  *     reader concatenates runs per paragraph and joins paragraphs with
  *     newlines (python-docx's `"\n".join(p.text)` shape).
  *
  * Both are total inverses on their writers' output (`extractText(encode(t))
  * == t`, property-tested in DocCodecsSpec), which is what lets the
  * DuckDB oracle hash-check an ingest that went through REAL format bytes.
  */
object DocCodecs {

  /** OLE2 compound-file magic (`D0 CF 11 E0` — legacy pre-2007 `.doc` /
    * `.xls` / `.ppt`). The reference's extension dispatch accepts `'doc'`
    * alongside `'docx'` (reference `modules/utilities.py:164`); this engine
    * has no CFB parser, so these files must be QUARANTINED, never decoded
    * as UTF-8 mojibake. */
  def isOle2(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 0xD0.toByte && bytes(1) == 0xCF.toByte &&
      bytes(2) == 0x11.toByte && bytes(3) == 0xE0.toByte

  private def isPdf(bytes: Array[Byte]): Boolean =
    bytes.length >= 5 && bytes(0) == '%' && bytes(1) == 'P' &&
      bytes(2) == 'D' && bytes(3) == 'F' && bytes(4) == '-'

  private def isZip(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && bytes(0) == 'P' && bytes(1) == 'K' &&
      bytes(2) == 3 && bytes(3) == 4

  /** Magic-byte format classification: `pdf` | `docx` (zip container) |
    * `ole2` (quarantine class) | `text`. */
  def detectFormat(bytes: Array[Byte]): String =
    if (isPdf(bytes)) "pdf"
    else if (isZip(bytes)) "docx"
    else if (isOle2(bytes)) "ole2"
    else "text"

  /** Magic-byte dispatch: `%PDF-` → PDF, `PK\x03\x04` (zip) → DOCX,
    * anything else → UTF-8 plain text. Mirrors the reference's extension
    * dispatch but on content, so mislabeled files still decode — and a
    * payload whose magic LIES (a non-DOCX zip, a truncated PDF) falls back
    * to the UTF-8 reading instead of throwing: one poison file must not
    * fail a million-file ingest job. The one exception is an OLE2 compound
    * file ([[isOle2]]): CFB binary has no meaningful UTF-8 reading, so it
    * decodes to the empty string (downstream non-empty filters drop it; the
    * quarantine-aware path is [[BinaryDocs.readAutoStatus]]). */
  def decodeAuto(bytes: Array[Byte]): String = {
    val parsed: Option[String] =
      if (isPdf(bytes)) scala.util.Try(MiniPdf.extractText(bytes)).toOption
      else if (isZip(bytes)) scala.util.Try(MiniDocx.extractText(bytes)).toOption
      else if (isOle2(bytes)) Some("")
      else None
    parsed.getOrElse(new String(bytes, UTF_8))
  }
}

object MiniPdf {

  private def escape(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '(' => "\\("
    case ')' => "\\)"
    case c if c < 0x20 || c > 0x7e => f"\\${c.toInt}%03o"
    case c => c.toString
  }

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated flate stream")
      out.write(buf, 0, n)
    }
    inf.end(); out.toByteArray
  }

  /** One-page PDF (1.4) whose Flate-compressed content stream shows `text`
    * line by line (`T*` between lines). Latin-1 text only — the Helvetica
    * simple-font case; supplementary text would need a CID font, out of
    * scope for the codec pair. */
  def encode(text: String): Array[Byte] = {
    require(text.forall(_ <= 0xff), "MiniPdf encodes Latin-1 text only")
    val lines = text.split("\n", -1)
    val content = {
      val sb = new StringBuilder("BT /F1 12 Tf 14 TL 72 720 Td\n")
      lines.zipWithIndex.foreach { case (l, i) =>
        if (i > 0) sb.append("T*\n")
        sb.append('(').append(escape(l)).append(") Tj\n")
      }
      sb.append("ET").toString
    }
    val stream = deflate(content.getBytes(ISO_8859_1))
    val bos = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = new Array[Int](5)
    def obj(i: Int)(body: => Unit): Unit = {
      offsets(i - 1) = bos.size()
      w(s"$i 0 obj\n"); body; w("\nendobj\n")
    }
    obj(1)(w("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2)(w("<< /Type /Pages /Kids [3 0 R] /Count 1 >>"))
    obj(3)(w("<< /Type /Page /Parent 2 0 R /Resources << /Font << /F1 5 0 R >> >> " +
      "/MediaBox [0 0 612 792] /Contents 4 0 R >>"))
    obj(4) {
      w(s"<< /Length ${stream.length} /Filter /FlateDecode >>\nstream\n")
      bos.write(stream)
      w("\nendstream")
    }
    obj(5)(w("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"))
    val xref = bos.size()
    w("xref\n0 6\n0000000000 65535 f \n")
    offsets.foreach(o => w(f"$o%010d 00000 n \n"))
    w(s"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n$xref\n%%EOF")
    bos.toByteArray
  }

  /** Text of every content stream (Flate or raw), `Tj`/`TJ`/`'` shows
    * appended in order, `T*`/`'` emitting newlines; streams joined with
    * newlines. Inverse of [[encode]] on its output. */
  def extractText(bytes: Array[Byte]): String = {
    val raw = new String(bytes, ISO_8859_1)
    val pages = Seq.newBuilder[String]
    var idx = 0
    var s = raw.indexOf("stream", idx)
    while (s >= 0) {
      var cs = s + 6
      if (cs < raw.length && raw(cs) == '\r') cs += 1
      if (cs < raw.length && raw(cs) == '\n') cs += 1
      val dictStart = raw.lastIndexOf("<<", s)
      val dict = if (dictStart >= 0) raw.substring(dictStart, s) else ""
      // The stream extent comes from the dict's /Length: an endstream
      // scan corrupts streams whose compressed bytes happen to contain
      // the keyword, and an EOL-trim heuristic corrupts the ~1-in-128
      // whose data ENDS in an 0x0A/0x0D byte. Scan + trim survives only
      // as the fallback for a non-literal /Length (indirect reference —
      // out of codec scope but parsed best-effort).
      val ce = "/Length\\s+(\\d+)".r.findFirstMatchIn(dict)
        .map(m => cs + m.group(1).toInt)
        .filter(_ <= bytes.length)
        .getOrElse {
          val e = raw.indexOf("endstream", cs)
          var t = if (e < 0) bytes.length else e
          if (t > cs && raw(t - 1) == '\n') t -= 1
          if (t > cs && raw(t - 1) == '\r') t -= 1
          t
        }
      val body = java.util.Arrays.copyOfRange(bytes, cs, ce)
      val data = if (dict.contains("/FlateDecode")) inflate(body) else body
      pages += parseContent(new String(data, ISO_8859_1))
      val e2 = raw.indexOf("endstream", ce)
      idx = if (e2 < 0) bytes.length else e2 + 9
      s = raw.indexOf("stream", idx)
    }
    pages.result().mkString("\n")
  }

  /** Parse one content stream: literal strings (escapes, octal, nested
    * parens) buffered until a text-showing operator consumes them. */
  private def parseContent(c: String): String = {
    val out = new StringBuilder
    var pending = List.empty[String]
    var i = 0
    while (i < c.length) {
      c(i) match {
        case '(' =>
          val b = new StringBuilder
          var depth = 1
          var j = i + 1
          while (j < c.length && depth > 0) {
            c(j) match {
              case '\\' if j + 1 < c.length =>
                c(j + 1) match {
                  case 'n' => b.append('\n'); j += 2
                  case 'r' => b.append('\r'); j += 2
                  case 't' => b.append('\t'); j += 2
                  case 'b' => b.append('\b'); j += 2
                  case 'f' => b.append('\f'); j += 2
                  case d if d >= '0' && d <= '7' =>
                    var k = j + 1; var v = 0
                    while (k < c.length && k < j + 4 && c(k) >= '0' && c(k) <= '7') {
                      v = v * 8 + (c(k) - '0'); k += 1
                    }
                    b.append(v.toChar); j = k
                  case other => b.append(other); j += 2
                }
              case '(' => depth += 1; b.append('('); j += 1
              case ')' => depth -= 1; if (depth > 0) b.append(')'); j += 1
              case ch => b.append(ch); j += 1
            }
          }
          pending ::= b.toString
          i = j
        case 'T' if i + 1 < c.length && (c(i + 1) == 'j' || c(i + 1) == 'J') =>
          out.append(pending.reverse.mkString); pending = Nil; i += 2
        case 'T' if i + 1 < c.length && c(i + 1) == '*' =>
          out.append('\n'); i += 2
        case '\'' =>
          out.append('\n').append(pending.reverse.mkString); pending = Nil; i += 1
        case _ => i += 1
      }
    }
    out.toString
  }
}

object MiniDocx {

  private def xmlEscape(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case c => c.toString
  }

  private def xmlUnescape(s: String): String = s
    .replace("&lt;", "<").replace("&gt;", ">")
    .replace("&quot;", "\"").replace("&apos;", "'")
    .replace("&amp;", "&")

  /** DOCX container: zip with `[Content_Types].xml` + `word/document.xml`;
    * each input line becomes one `<w:p>` paragraph with a space-preserving
    * `<w:t>` run. Entry timestamps pinned for byte determinism. */
  def encode(text: String): Array[Byte] = {
    val paras = text.split("\n", -1).map(p =>
      s"""<w:p><w:r><w:t xml:space="preserve">${xmlEscape(p)}</w:t></w:r></w:p>""").mkString
    val doc =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">""" +
        s"<w:body>$paras</w:body></w:document>"
    val ct =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/word/document.xml" ContentType=""" +
        """"application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>"""
    val bos = new java.io.ByteArrayOutputStream()
    val zip = new java.util.zip.ZipOutputStream(bos)
    Seq("[Content_Types].xml" -> ct, "word/document.xml" -> doc).foreach {
      case (name, body) =>
        val entry = new java.util.zip.ZipEntry(name)
        entry.setTime(0L)
        zip.putNextEntry(entry)
        zip.write(body.getBytes(UTF_8))
        zip.closeEntry()
    }
    zip.close()
    bos.toByteArray
  }

  /** Paragraph texts of `word/document.xml` (all `<w:t>` runs per `<w:p>`
    * concatenated), joined with newlines — python-docx's reading shape.
    * Inverse of [[encode]] on its output. */
  def extractText(bytes: Array[Byte]): String = {
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(bytes))
    var xml: String = null
    var entry = zin.getNextEntry
    while (entry != null && xml == null) {
      if (entry.getName == "word/document.xml")
        xml = new String(zin.readAllBytes(), UTF_8)
      zin.closeEntry()
      entry = zin.getNextEntry
    }
    zin.close()
    if (xml == null)
      throw new IllegalArgumentException("zip holds no word/document.xml — not a DOCX")
    val para = "(?s)<w:p[ >].*?</w:p>|<w:p/>".r
    val run = "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>".r
    para.findAllIn(xml).map { p =>
      run.findAllMatchIn(p).map(m => xmlUnescape(m.group(1))).mkString
    }.mkString("\n")
  }
}
