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
    * alongside `'docx'` (reference `modules/utilities.py:164`); these route
    * through [[MiniDoc.extractText]] (simple non-complex Word binaries
    * decode; piece-table/encrypted/non-Word compound files QUARANTINE —
    * never UTF-8 mojibake). */
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
    * `D0 CF 11 E0` → legacy `.doc` ([[MiniDoc]]), anything else → UTF-8
    * plain text. Mirrors the reference's extension dispatch but on
    * content, so mislabeled files still decode — and a payload whose magic
    * LIES (a non-DOCX zip, a truncated PDF) falls back to the UTF-8
    * reading instead of throwing: one poison file must not fail a
    * million-file ingest job. The one exception is an OLE2 compound file
    * that [[MiniDoc.extractText]] rejects (piece-table, encrypted,
    * non-Word): CFB binary has no meaningful UTF-8 reading, so it decodes
    * to the empty string (downstream non-empty filters drop it; the
    * quarantine-aware path is [[BinaryDocs.readAutoStatus]]). */
  def decodeAuto(bytes: Array[Byte]): String = {
    val parsed: Option[String] =
      if (isPdf(bytes)) scala.util.Try(MiniPdf.extractText(bytes)).toOption
      else if (isZip(bytes)) scala.util.Try(MiniDocx.extractText(bytes)).toOption
      else if (isOle2(bytes))
        Some(scala.util.Try(MiniDoc.extractText(bytes)).getOrElse(""))
      else None
    parsed.getOrElse(new String(bytes, UTF_8))
  }

  /** Like [[detectFormat]] but resolves the OLE2 class by actually parsing:
    * a decodable Word binary reports `doc`, an undecodable compound file
    * stays `ole2` (the quarantine class). */
  def detectFormatDeep(bytes: Array[Byte]): String = {
    val f = detectFormat(bytes)
    if (f == "ole2" && scala.util.Try(MiniDoc.extractText(bytes)).isSuccess) "doc"
    else f
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

/** Legacy binary `.doc` (OLE2/CFB compound file — reference dispatch accepts
  * `'doc'`, `modules/utilities.py:164`). Pure-JVM, like [[MiniPdf]] and
  * [[MiniDocx]]:
  *
  *  - the WRITER emits a minimal valid v3 compound file (512-byte sectors,
  *    one FAT sector, one directory sector) holding a `WordDocument` stream
  *    with a Word-97 FIB whose `fcMin`/`fcMac` bracket an in-order cp1252
  *    text region (the non-complex layout). `forceMini = true` routes the
  *    stream through the root mini stream + miniFAT instead, so both reader
  *    paths are exercisable.
  *  - the READER is a real (scoped) CFB parser: header → DIFAT → FAT →
  *    directory tree → stream chains, with miniFAT handling for streams
  *    under the mini cutoff; then the FIB fast path — non-complex,
  *    unencrypted files carry their text as `WordDocument[fcMin, fcMac)`
  *    (cp1252, or UTF-16LE under `fExtChar`). Piece-table (`fComplex`) and
  *    encrypted files THROW, which the ingest path translates to
  *    quarantine — never mojibake. Every chain walk is cycle-guarded, so a
  *    malicious file cannot hang an executor.
  */
object MiniDoc {

  private val SectorSize = 512
  private val MiniSectorSize = 64
  private val MiniCutoff = 4096
  private val FreeSect = 0xFFFFFFFFL
  private val EndOfChain = 0xFFFFFFFEL
  private val FatSect = 0xFFFFFFFDL

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
  }

  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
  }

  private def dirEntry(name: String, typ: Int, start: Long, size: Long,
                       child: Long = FreeSect): Array[Byte] = {
    val e = new Array[Byte](128)
    val nameBytes = name.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
    System.arraycopy(nameBytes, 0, e, 0, nameBytes.length)
    putU16(e, 0x40, if (name.isEmpty) 0 else nameBytes.length + 2)
    e(0x42) = typ.toByte
    e(0x43) = 1 // black
    putU32(e, 0x44, FreeSect) // left sibling
    putU32(e, 0x48, FreeSect) // right sibling
    putU32(e, 0x4C, child)
    putU32(e, 0x74, start)
    putU32(e, 0x78, size)
    e
  }

  private def fib(textLen: Int): Array[Byte] = {
    val f = new Array[Byte](1024)
    putU16(f, 0x00, 0xA5EC) // wIdent: Word binary
    putU16(f, 0x02, 0x00C1) // nFib: Word 97
    putU16(f, 0x0A, 0x0000) // flags: non-complex, unencrypted, cp1252
    putU32(f, 0x18, 1024L) // fcMin
    putU32(f, 0x1C, 1024L + textLen) // fcMac
    f
  }

  /** Encode `text` as a minimal valid `.doc`. `forceMini = true` stores the
    * WordDocument stream in the mini stream (requires the stream to fit
    * under the 4096-byte cutoff) — the layout real Word uses for small
    * files; the default regular-stream layout pads to the cutoff. */
  def encode(text: String, forceMini: Boolean = false): Array[Byte] = {
    val textBytes = text.getBytes("windows-1252")
    val wdLen = 1024 + textBytes.length
    val wd = fib(textBytes.length) ++ textBytes

    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      b ++ new Array[Byte]((unit - b.length % unit) % unit)

    val header = new Array[Byte](SectorSize)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, header, 0, 8)
    putU16(header, 0x18, 0x003E) // minor version
    putU16(header, 0x1A, 0x0003) // major version 3
    putU16(header, 0x1C, 0xFFFE) // little-endian
    putU16(header, 0x1E, 9) // sector shift (512)
    putU16(header, 0x20, 6) // mini sector shift (64)
    putU32(header, 0x2C, 1L) // one FAT sector
    putU32(header, 0x30, 1L) // first directory sector
    putU32(header, 0x38, MiniCutoff.toLong)
    putU32(header, 0x44, EndOfChain) // no DIFAT chain
    putU32(header, 0x4C, 0L) // DIFAT[0]: FAT lives in sector 0
    (1 until 109).foreach(i => putU32(header, 0x4C + 4 * i, FreeSect))

    val fat = new Array[Byte](SectorSize)
    (0 until SectorSize / 4).foreach(i => putU32(fat, 4 * i, FreeSect))
    putU32(fat, 0, FatSect)
    putU32(fat, 4, EndOfChain) // directory: one sector

    if (forceMini) {
      require(wdLen < MiniCutoff, s"forceMini needs stream < $MiniCutoff bytes, got $wdLen")
      val mini = pad(wd, MiniSectorSize)
      val nMiniSects = mini.length / MiniSectorSize
      val miniStream = pad(mini, SectorSize)
      val nStreamSects = miniStream.length / SectorSize
      putU32(header, 0x3C, 2L) // first miniFAT sector
      putU32(header, 0x40, 1L) // one miniFAT sector
      putU32(fat, 8, EndOfChain) // miniFAT: one sector (sector 2)
      (0 until nStreamSects).foreach { i => // mini stream: sectors 3..
        putU32(fat, 4 * (3 + i), if (i == nStreamSects - 1) EndOfChain else 4L + i)
      }
      val miniFat = new Array[Byte](SectorSize)
      (0 until SectorSize / 4).foreach(i => putU32(miniFat, 4 * i, FreeSect))
      (0 until nMiniSects).foreach { i =>
        putU32(miniFat, 4 * i, if (i == nMiniSects - 1) EndOfChain else i + 1L)
      }
      val dir = dirEntry("Root Entry", 5, 3L, miniStream.length.toLong, child = 1L) ++
        dirEntry("WordDocument", 2, 0L, wdLen.toLong) ++
        dirEntry("", 0, FreeSect, 0L) ++ dirEntry("", 0, FreeSect, 0L)
      header ++ fat ++ dir ++ miniFat ++ miniStream
    } else {
      // CFB puts sub-cutoff streams in the mini stream; the regular layout
      // therefore pads to the cutoff and DECLARES the padded size (fcMac
      // still brackets the true text, so padding is invisible to the FIB)
      val stream = pad(pad(wd, MiniCutoff), SectorSize)
      val nStreamSects = stream.length / SectorSize
      require(nStreamSects <= 126, s"MiniDoc writer supports <= 63 KB, got $wdLen bytes")
      (0 until nStreamSects).foreach { i => // stream: sectors 2..
        putU32(fat, 4 * (2 + i), if (i == nStreamSects - 1) EndOfChain else 3L + i)
      }
      val dir = dirEntry("Root Entry", 5, EndOfChain, 0L, child = 1L) ++
        dirEntry("WordDocument", 2, 2L, stream.length.toLong) ++
        dirEntry("", 0, FreeSect, 0L) ++ dirEntry("", 0, FreeSect, 0L)
      header ++ fat ++ dir ++ stream
    }
  }

  /** Extract the text of a non-complex, unencrypted Word binary. Throws on
    * anything else (truncated container, piece-table files, encryption) —
    * callers quarantine. */
  def extractText(bytes: Array[Byte]): String = {
    require(DocCodecs.isOle2(bytes), "not an OLE2 compound file")
    require(bytes.length >= SectorSize, "truncated OLE2 header")
    val ssz = 1 << u16(bytes, 0x1E)
    val mssz = 1 << u16(bytes, 0x20)
    val miniCutoff = u32(bytes, 0x38)
    require(ssz >= 128 && ssz <= 4096 && mssz >= 16 && mssz <= ssz, "implausible sector sizes")

    def sector(id: Long): Array[Byte] = {
      val off = (id + 1) * ssz
      require(off >= 0 && off + ssz <= bytes.length, s"sector $id out of range")
      java.util.Arrays.copyOfRange(bytes, off.toInt, (off + ssz).toInt)
    }

    val maxSectors = bytes.length / ssz + 1
    // DIFAT: 109 header entries, then the (cycle-guarded) DIFAT chain
    val difat = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 109).foreach(i => difat += u32(bytes, 0x4C + 4 * i))
    var dSect = u32(bytes, 0x44)
    var dGuard = 0
    while (dSect < 0xFFFFFFFCL && dGuard < maxSectors) {
      val s = sector(dSect)
      (0 until ssz / 4 - 1).foreach(i => difat += u32(s, 4 * i))
      dSect = u32(s, ssz - 4)
      dGuard += 1
    }
    val fat: Array[Long] = difat.filter(_ < 0xFFFFFFFCL).toArray
      .flatMap(id => { val s = sector(id); (0 until ssz / 4).map(i => u32(s, 4 * i)) })

    def chain(start: Long): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = start
      while (cur < 0xFFFFFFFCL && out.length <= maxSectors) {
        out += cur
        require(cur < fat.length, s"chain runs off the FAT at sector $cur")
        cur = fat(cur.toInt)
      }
      require(out.length <= maxSectors, "cyclic FAT chain")
      out.toSeq
    }

    def readStream(start: Long, size: Long): Array[Byte] =
      chain(start).flatMap(sector).take(size.toInt).toArray

    // directory: 128-byte entries; root (type 5) carries the mini stream
    val dirBytes = chain(u32(bytes, 0x30)).flatMap(sector).toArray
    case class Entry(name: String, typ: Int, start: Long, size: Long)
    val entries = (0 until dirBytes.length / 128).map { i =>
      val off = i * 128
      val nameLen = u16(dirBytes, off + 0x40)
      val name =
        if (nameLen < 2) ""
        else new String(dirBytes, off, math.min(nameLen - 2, 64),
          java.nio.charset.StandardCharsets.UTF_16LE)
      Entry(name, dirBytes(off + 0x42) & 0xFF,
        u32(dirBytes, off + 0x74), u32(dirBytes, off + 0x78))
    }
    val root = entries.find(_.typ == 5)
      .getOrElse(throw new IllegalArgumentException("no root directory entry"))
    val wdEntry = entries
      .find(e => e.typ == 2 && e.name.equalsIgnoreCase("WordDocument"))
      .getOrElse(throw new IllegalArgumentException("no WordDocument stream — not a .doc"))

    val wd: Array[Byte] =
      if (wdEntry.size >= miniCutoff) readStream(wdEntry.start, wdEntry.size)
      else {
        val miniStream = readStream(root.start, root.size)
        val miniFat: Array[Long] = chain(u32(bytes, 0x3C))
          .flatMap(id => { val s = sector(id); (0 until ssz / 4).map(i => u32(s, 4 * i)) })
          .toArray
        val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
        var cur = wdEntry.start
        var guard = 0
        val maxMini = miniStream.length / mssz + 1
        while (cur < 0xFFFFFFFCL && guard < maxMini) {
          val off = (cur * mssz).toInt
          require(off + mssz <= miniStream.length, s"mini sector $cur out of range")
          out ++= java.util.Arrays.copyOfRange(miniStream, off, off + mssz)
          require(cur < miniFat.length, s"mini chain runs off the miniFAT at $cur")
          cur = miniFat(cur.toInt)
          guard += 1
        }
        require(guard < maxMini || cur >= 0xFFFFFFFCL, "cyclic miniFAT chain")
        out.take(wdEntry.size.toInt).toArray
      }

    require(wd.length >= 0x20 && u16(wd, 0) == 0xA5EC, "WordDocument lacks a Word FIB")
    val flags = u16(wd, 0x0A)
    require((flags & 0x0004) == 0, "complex (piece-table) .doc — quarantine")
    require((flags & 0x0100) == 0, "encrypted .doc — quarantine")
    val fcMin = u32(wd, 0x18)
    val fcMac = u32(wd, 0x1C)
    require(fcMin >= 0 && fcMin <= fcMac && fcMac <= wd.length,
      s"implausible text range [$fcMin, $fcMac)")
    val txt = java.util.Arrays.copyOfRange(wd, fcMin.toInt, fcMac.toInt)
    if ((flags & 0x1000) != 0)
      new String(txt, java.nio.charset.StandardCharsets.UTF_16LE)
    else new String(txt, "windows-1252")
  }
}
