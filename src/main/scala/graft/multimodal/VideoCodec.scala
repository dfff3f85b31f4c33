package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** From-scratch pure-JVM video codec for the YUV4MPEG2 (`.y4m`) container —
  * the real-decode twin that closes the video branch of the multimodal
  * family (reference capability: the video side of its media handling; the
  * compressed-codec formats stay behind [[Multimodal.fakeDecodeFeatures]]
  * because this container ships no codec libraries, exactly like mp3/ogg on
  * the audio side). Y4M is the uncompressed interchange format the video
  * toolchain (ffmpeg, mjpegtools, codec test suites) uses for raw frames:
  * an ASCII stream header, then per frame an ASCII `FRAME` marker followed
  * by raw planar YUV — all parseable with nothing beyond byte arithmetic,
  * the same from-scratch-codec pattern as [[graft.sources.DocCodecs]].
  *
  * Supported colorspaces: C420 (+jpeg/mpeg2/paldv tags — chroma siting
  * differs, plane sizes do not), C444, and Cmono. Anything else — or any
  * malformed header, truncated frame, or non-Y4M payload — returns None and
  * the caller quarantines or falls back, keeping the pipeline total.
  *
  * Feature contract (shared with [[Multimodal.decodeImageFeatures]]):
  * per sampled frame, `featureDim` mean-luminance bands top-to-bottom over
  * the Y plane. Band sums accumulate as exact integers and divide once by
  * `count*255.0`, so the features are engine-replayable: an oracle that
  * knows the fixture's luma formula reproduces them bit-for-bit.
  *
  * Scale shape: decode is a narrow per-row pass inside `flatMap` (one
  * output row per sampled frame — the [[Multimodal.sampleFrames]]
  * row-explosion contract with a REAL decoder in the loop); nothing
  * shuffles until the caller aggregates.
  */
object VideoCodec {

  private val Magic = "YUV4MPEG2".getBytes("US-ASCII")

  /** Encode raw Y planes as a Y4M byte stream (C420: chroma planes are
    * constant mid-gray 128). Each element of `yPlanes` must be w*h bytes. */
  def y4mBytes(w: Int, h: Int, yPlanes: Seq[Array[Byte]]): Array[Byte] = {
    require(w >= 2 && h >= 2 && w % 2 == 0 && h % 2 == 0,
      s"C420 needs even dims >= 2, got ${w}x$h")
    require(yPlanes.forall(_.length == w * h), "each Y plane must be w*h bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$w H$h F25:1 Ip A1:1 C420\n".getBytes("US-ASCII"))
    val chroma = Array.fill[Byte]((w / 2) * (h / 2))(128.toByte)
    yPlanes.foreach { y =>
      out.write("FRAME\n".getBytes("US-ASCII"))
      out.write(y)
      out.write(chroma) // Cb
      out.write(chroma) // Cr
    }
    out.toByteArray
  }

  /** The gate fixture: an 8x8 C420 clip whose luma is a pure function of
    * (docId, frame, row) — `Y(f, y) = (docId*31 + f*7 + y) mod 256`,
    * constant along x — so an ANSI oracle can re-derive every decoded
    * band mean from first principles. A decoder that mis-parses the
    * header, the FRAME markers, or the plane offsets lands on different
    * bytes and hash-fails. */
  def syntheticY4M(docId: Long, nFrames: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    require(nFrames >= 1)
    val planes = (0 until nFrames).map { f =>
      Array.tabulate(w * h) { i =>
        val y = i / w
        (((docId * 31 + f * 7 + y) % 256).toInt & 0xff).toByte
      }
    }
    y4mBytes(w, h, planes)
  }

  /** Parse a Y4M payload into per-frame luminance band means. Returns None
    * for anything that is not a well-formed, supported Y4M stream —
    * non-Y4M magic, missing/invalid W or H, unsupported colorspace, a
    * frame marker that isn't `FRAME`, or a truncated final frame. */
  def decodeY4MFrameBands(payload: Array[Byte],
                          featureDim: Int): Option[Seq[Array[Double]]] = {
    if (payload == null || payload.length < Magic.length + 1) return None
    var i = 0
    while (i < Magic.length) {
      if (payload(i) != Magic(i)) return None
      i += 1
    }
    // stream header: ASCII params to the first '\n'
    val hdrEnd = payload.indexOf('\n'.toByte, i)
    if (hdrEnd < 0) return None
    val params = new String(payload, i, hdrEnd - i, "US-ASCII")
      .split(' ').filter(_.nonEmpty)
    var w = -1; var h = -1; var cs = "420" // C absent defaults to 4:2:0
    params.foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.drop(1).toIntOption.getOrElse(-1)
        case 'H' => h = p.drop(1).toIntOption.getOrElse(-1)
        case 'C' => cs = p.drop(1)
        case _ => () // F/I/A/X params don't change plane geometry
      }
    }
    if (w <= 0 || h <= 0) return None
    val chromaBytes = cs match {
      case s if s.startsWith("420") => 2 * ((w + 1) / 2) * ((h + 1) / 2)
      case "444" => 2 * w * h
      case "mono" => 0
      case _ => return None // 422/410/411 etc: unsupported here
    }
    val frameBytes = w * h + chromaBytes
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var pos = hdrEnd + 1
    while (pos < payload.length) {
      // frame header: "FRAME" + optional params, to '\n'
      val fEnd = payload.indexOf('\n'.toByte, pos)
      if (fEnd < 0) return None
      val marker = new String(payload, pos, math.min(5, fEnd - pos), "US-ASCII")
      if (marker != "FRAME") return None
      val dataStart = fEnd + 1
      if (dataStart + frameBytes > payload.length) return None // truncated
      val sums = new Array[Long](featureDim)
      val counts = new Array[Long](featureDim)
      var y = 0
      while (y < h) {
        val band = (y.toLong * featureDim / h).toInt
        var x = 0
        while (x < w) {
          sums(band) += (payload(dataStart + y * w + x) & 0xff)
          counts(band) += 1
          x += 1
        }
        y += 1
      }
      frames += Array.tabulate(featureDim)(b =>
        if (counts(b) == 0) 0.0 else sums(b) / (counts(b) * 255.0))
      pos = dataStart + frameBytes
    }
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  // ------------------------- AVI (RIFF / BI_RGB) -------------------------

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def rdLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def fourCC(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode grayscale frames (w*h top-down bytes each) as a minimal but
    * fully well-formed uncompressed AVI: RIFF('AVI ') → LIST(hdrl){avih,
    * LIST(strl){strh 'vids'/'DIB ', strf BITMAPINFOHEADER 24bpp BI_RGB}} →
    * LIST(movi){'00db' bottom-up BGR rows, 4-byte padded}. The SECOND real
    * container next to Y4M — RIFF chunk walking, stream-format parsing,
    * and DIB row order/padding are the parts a decoder can get wrong. */
  def aviBytes(w: Int, h: Int, grayFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(w >= 1 && h >= 1)
    require(grayFrames.forall(_.length == w * h), "each frame must be w*h bytes")
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val dibSize = rowBytes * h
    def dib(g: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](dibSize)
      var yy = 0
      while (yy < h) {
        val srcRow = h - 1 - yy // bottom-up storage
        var x = 0
        while (x < w) {
          val v = g(srcRow * w + x)
          val o = yy * rowBytes + x * 3
          out(o) = v; out(o + 1) = v; out(o + 2) = v // B G R
          x += 1
        }
        yy += 1
      }
      out
    }
    aviContainer(w, h, handler = "DIB ", biCompression = 0, bpp = 24,
      frameId = "00db", frameSizeHint = dibSize, frames = grayFrames.map(dib))
  }

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(id.getBytes("US-ASCII")); o.write(le32(body.length)); o.write(body)
    if (body.length % 2 == 1) o.write(0) // RIFF word alignment
    o.toByteArray
  }

  private def riffList(kind: String, body: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream()
    o.write("LIST".getBytes("US-ASCII")); o.write(le32(body.length + 4))
    o.write(kind.getBytes("US-ASCII")); o.write(body)
    o.toByteArray
  }

  /** Shared RIFF/AVI assembly for both the uncompressed-DIB and the MJPEG
    * writers: RIFF('AVI ') → LIST(hdrl){avih, LIST(strl){strh, strf}} →
    * LIST(movi){frame chunks}. `frames` are the already-encoded per-frame
    * chunk bodies. */
  private def aviContainer(w: Int, h: Int, handler: String,
                           biCompression: Int, bpp: Int, frameId: String,
                           frameSizeHint: Int,
                           frames: Seq[Array[Byte]]): Array[Byte] = {
    val avih = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(40000)); o.write(le32(frameSizeHint * 25)); o.write(le32(0))
      o.write(le32(0)); o.write(le32(frames.length)); o.write(le32(0))
      o.write(le32(1)); o.write(le32(frameSizeHint)); o.write(le32(w)); o.write(le32(h))
      (1 to 4).foreach(_ => o.write(le32(0)))
      o.toByteArray
    }
    val strh = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("vids".getBytes("US-ASCII")); o.write(handler.getBytes("US-ASCII"))
      o.write(le32(0)); o.write(le16(0)); o.write(le16(0)); o.write(le32(0))
      o.write(le32(1)); o.write(le32(25)) // scale, rate
      o.write(le32(0)); o.write(le32(frames.length)); o.write(le32(frameSizeHint))
      o.write(le32(-1)); o.write(le32(0))
      o.write(le16(0)); o.write(le16(0)); o.write(le16(w)); o.write(le16(h))
      o.toByteArray
    }
    val strf = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(le32(40)); o.write(le32(w)); o.write(le32(h)); o.write(le16(1))
      o.write(le16(bpp)); o.write(le32(biCompression))
      o.write(le32(frameSizeHint)); o.write(le32(0)); o.write(le32(0))
      o.write(le32(0)); o.write(le32(0))
      o.toByteArray
    }
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", strf)))
    val movi = riffList("movi",
      frames.map(f => riffChunk(frameId, f)).fold(Array.emptyByteArray)(_ ++ _))
    val body = hdrl ++ movi
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(body.length + 4))
    bos.write("AVI ".getBytes("US-ASCII")); bos.write(body)
    bos.toByteArray
  }

  /** 'MJPG' as the little-endian BITMAPINFOHEADER biCompression value. */
  private val MjpgFourCC: Int =
    'M'.toInt | ('J'.toInt << 8) | ('P'.toInt << 16) | ('G'.toInt << 24)

  /** Encode one grayscale frame (w*h top-down samples) as a baseline
    * single-component JPEG at compression quality 1.0 via the JDK's own
    * ImageIO writer. Raster samples are written and read directly (no
    * colorspace conversion), so a frame whose 8×8 blocks are each uniform
    * round-trips BIT-EXACTLY: a uniform block is a DC-only DCT, the
    * quality-1.0 quantization table is all ones, and the IDCT of a pure
    * DC term reproduces the constant — verified for all 256 gray levels
    * in VideoCodecSpec. That exactness is what lets an MJPEG fixture be
    * oracle-re-derivable despite JPEG being a lossy codec. */
  def jpegGrayBytes(w: Int, h: Int, gray: Array[Byte]): Array[Byte] = {
    require(gray.length == w * h, "frame must be w*h bytes")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.getRaster.setSample(x, y, 0, gray(y * w + x) & 0xff)
        x += 1
      }
      y += 1
    }
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  /** Encode grayscale frames as an MJPEG AVI: the same RIFF container as
    * [[aviBytes]] but with handler/biCompression 'MJPG' and each frame a
    * real baseline JPEG in a '00dc' (compressed-DIB) chunk — the one
    * compressed video codec a pure JVM can both write and read
    * (ImageIO ships the JPEG codec; nothing external needed). */
  def aviMjpegBytes(w: Int, h: Int, grayFrames: Seq[Array[Byte]]): Array[Byte] = {
    require(w >= 1 && h >= 1)
    require(grayFrames.forall(_.length == w * h), "each frame must be w*h bytes")
    val jpegs = grayFrames.map(g => jpegGrayBytes(w, h, g))
    val hint = if (jpegs.isEmpty) 0 else jpegs.map(_.length).max
    aviContainer(w, h, handler = "MJPG", biCompression = MjpgFourCC, bpp = 24,
      frameId = "00dc", frameSizeHint = hint, frames = jpegs)
  }

  /** The AVI gate fixture: gray value `(docId*37 + f*11 + y) mod 256`,
    * constant along x — the [[syntheticY4M]] trick with its own constants,
    * so each container's decoder is gated independently. */
  def syntheticAvi(docId: Long, nFrames: Int, w: Int = 8, h: Int = 8): Array[Byte] = {
    require(nFrames >= 1)
    val frames = (0 until nFrames).map { f =>
      Array.tabulate(w * h) { i =>
        val y = i / w
        (((docId * 37 + f * 11 + y) % 256).toInt & 0xff).toByte
      }
    }
    aviBytes(w, h, frames)
  }

  /** The MJPEG gate fixture: 8×32 frames of four uniform 8×8-block rows,
    * gray value `(docId*37 + f*11 + (y div 8)*13) mod 256`. Uniform blocks
    * make the lossy codec round-trip bit-exact ([[jpegGrayBytes]]), and
    * the four block rows land one per featureDim=4 band, so the oracle
    * re-derives each band mean as `value/255` straight from the formula. */
  def syntheticMjpegAvi(docId: Long, nFrames: Int): Array[Byte] = {
    require(nFrames >= 1)
    val w = 8; val h = 32
    val frames = (0 until nFrames).map { f =>
      Array.tabulate(w * h) { i =>
        val blk = (i / w) / 8
        (((docId * 37 + f * 11 + blk * 13) % 256).toInt & 0xff).toByte
      }
    }
    aviMjpegBytes(w, h, frames)
  }

  /** Parse an uncompressed 24bpp BI_RGB AVI — or an MJPEG AVI, the one
    * compressed codec the bare JVM ships ([[jpegGrayBytes]]) — into
    * per-frame luminance band means (luma = (r+g+b)/3, exact-integer sums
    * — grayscale fixtures make it the gray value). None for anything
    * malformed or unsupported: wrong RIFF magic, missing strf, codecs
    * other than BI_RGB/MJPG, a truncated chunk, or zero video frames. */
  def decodeAviFrameBands(payload: Array[Byte],
                          featureDim: Int): Option[Seq[Array[Double]]] = {
    if (payload == null || payload.length < 12) return None
    if (fourCC(payload, 0) != "RIFF" || fourCC(payload, 8) != "AVI ") return None
    var w = -1; var h = -1; var ok = false; var mjpeg = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    // chunk walk: strf must precede movi (writer emits hdrl first; the AVI
    // spec requires it); '00db'/'01db' are uncompressed DIB frames,
    // '00dc'/'01dc' compressed frames (JPEG bytes when strf says 'MJPG')
    def walk(from: Int, to: Int): Boolean = { // false = malformed
      var pos = from
      while (pos + 8 <= to) {
        val id = fourCC(payload, pos)
        val sz = rdLe32(payload, pos + 4)
        if (sz < 0 || pos + 8 + sz > to) return false
        if (id == "LIST") {
          if (sz < 4) return false
          if (!walk(pos + 12, pos + 8 + sz)) return false
        } else if (id == "strf") {
          if (sz < 40) return false
          val bpp = (payload(pos + 8 + 14) & 0xff) | ((payload(pos + 8 + 15) & 0xff) << 8)
          val comp = rdLe32(payload, pos + 8 + 16)
          w = rdLe32(payload, pos + 8 + 4)
          h = rdLe32(payload, pos + 8 + 8)
          ok = bpp == 24 && comp == 0 && w > 0 && h > 0
          mjpeg = comp == MjpgFourCC && w > 0 && h > 0
        } else if ((id == "00dc" || id == "01dc") && mjpeg) {
          // MJPEG frame: a self-contained baseline JPEG — hand it to the
          // JDK codec, then fold raster luma into the band means. Raster
          // samples (not getRGB) for single-band images: gray→sRGB
          // conversion is nonlinear and would corrupt the luma.
          val img =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(payload, pos + 8, sz))
            catch { case _: Exception => null }
          if (img == null || img.getWidth != w || img.getHeight != h) return false
          val gray = img.getRaster.getNumBands == 1
          val sums = new Array[Long](featureDim)
          val counts = new Array[Long](featureDim)
          var yy = 0
          while (yy < h) {
            val band = (yy.toLong * featureDim / h).toInt
            var x = 0
            while (x < w) {
              if (gray) sums(band) += 3L * img.getRaster.getSample(x, yy, 0)
              else {
                val rgb = img.getRGB(x, yy)
                sums(band) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              }
              counts(band) += 1
              x += 1
            }
            yy += 1
          }
          frames += Array.tabulate(featureDim)(b =>
            if (counts(b) == 0) 0.0 else sums(b) / (counts(b) * 3 * 255.0))
        } else if ((id == "00db" || id == "01db") && ok) {
          val rowBytes = ((w * 3 + 3) / 4) * 4
          if (sz < rowBytes * h) return false
          val sums = new Array[Long](featureDim)
          val counts = new Array[Long](featureDim)
          var yy = 0
          while (yy < h) {
            val band = (yy.toLong * featureDim / h).toInt // top-down band
            val row = h - 1 - yy                          // bottom-up storage
            var x = 0
            while (x < w) {
              val o = pos + 8 + row * rowBytes + x * 3
              sums(band) += (payload(o) & 0xff) + (payload(o + 1) & 0xff) +
                (payload(o + 2) & 0xff)
              counts(band) += 1
              x += 1
            }
            yy += 1
          }
          frames += Array.tabulate(featureDim)(b =>
            if (counts(b) == 0) 0.0 else sums(b) / (counts(b) * 3 * 255.0))
        }
        pos += 8 + sz + (sz & 1) // word alignment
      }
      true
    }
    if (!walk(12, payload.length)) return None
    if (!(ok || mjpeg) || frames.isEmpty) None else Some(frames.toSeq)
  }

  /** Container dispatch: Y4M first (ASCII magic), then RIFF/AVI. */
  def decodeVideoFrameBands(payload: Array[Byte],
                            featureDim: Int): Option[Seq[Array[Double]]] =
    decodeY4MFrameBands(payload, featureDim)
      .orElse(decodeAviFrameBands(payload, featureDim))

  /** Distributed real-decode frame sampling: one output row per kept frame
    * (`frame_no % stride == 0`) with its luminance band means — the
    * [[Multimodal.sampleFrames]] explosion contract, but the decode is the
    * real container parse (Y4M or AVI, [[decodeVideoFrameBands]]).
    * Non-decodable payloads are dropped (count them upstream for a
    * quarantine audit, the DocCodecs discipline). */
  def frameBands(spark: SparkSession, media: DataFrame, stride: Int,
                 featureDim: Int = 4,
                 payloadCol: String = "payload",
                 idCol: String = "media_id"): DataFrame = {
    require(stride >= 1 && featureDim >= 1)
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodeVideoFrameBands(payload, featureDim) match {
          case Some(frames) =>
            frames.zipWithIndex.collect {
              case (bands, f) if f % stride == 0 => (id, f, frames.length, bands)
            }
          case None => Nil
        }
      }
      .toDF(idCol, "frame_no", "n_frames", "bands")
  }
}
