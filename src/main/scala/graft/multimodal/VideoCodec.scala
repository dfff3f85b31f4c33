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

  /** Distributed real-decode frame sampling: one output row per kept frame
    * (`frame_no % stride == 0`) with its luminance band means — the
    * [[Multimodal.sampleFrames]] explosion contract, but the decode is the
    * real Y4M parse. Non-decodable payloads are dropped (count them
    * upstream for a quarantine audit, the DocCodecs discipline). */
  def frameBands(spark: SparkSession, media: DataFrame, stride: Int,
                 featureDim: Int = 4,
                 payloadCol: String = "payload",
                 idCol: String = "media_id"): DataFrame = {
    require(stride >= 1 && featureDim >= 1)
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        decodeY4MFrameBands(payload, featureDim) match {
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
