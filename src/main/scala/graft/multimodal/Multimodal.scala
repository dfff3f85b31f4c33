package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque `binary`
  * columns with typed metadata, plus a partition-batched feature-extraction
  * operator. Image payloads decode for REAL via JDK ImageIO
  * ([[Multimodal.decodeImageFeatures]]: PNG/JPEG/GIF/BMP → pixel-band
  * luminance features) and audio via JDK javax.sound.sampled
  * ([[Multimodal.decodeAudioFeatures]]: WAV/PCM16 → per-band amplitude);
  * video decodes for REAL when the payload is an uncompressed YUV4MPEG2
  * stream ([[VideoCodec.decodeY4MFrameBands]]: from-scratch Y4M parse →
  * per-frame luminance bands); compressed codec formats the JVM can't read
  * fall back to a deterministic stub ([[Multimodal.fakeDecodeFeatures]])
  * so the pipeline stays total — the Spark-side contract (schema, batch
  * shape, partitioning) is identical on every path.
  *
  * Schema: media(media_id BIGINT, kind STRING in {image,audio,video},
  * payload BINARY, meta STRUCT<source STRING, n_bytes BIGINT>).
  */
object Multimodal {

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long, features: Array[Float])

  /** Build a media table from any (id, text-ish payload, source) frame —
    * used by tests to synthesize binary payloads from the documents fixture. */
  def asMediaTable(df: DataFrame, idCol: String, payloadTextCol: String,
                   sourceCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadTextCol).cast("binary").as("payload"),
      struct(col(sourceCol).as("source"),
        length(col(payloadTextCol)).cast("long").as("n_bytes")).as("meta"))

  /** STUB decode: a real implementation would decode the payload (JPEG
    * decode / audio PCM / video frame-sample) inside this per-partition
    * batch loop; here it derives `featureDim` deterministic pseudo-features
    * from payload bytes so the pipeline shape (mapPartitions batching, no
    * per-row setup cost, stable output schema) is real and testable.
    * Arithmetic is EXACT-integer byte sums with one division and one final
    * float cast — both reproducible in ANSI SQL (via to_hex(encode(..))
    * byte access and a REAL cast), which is what lets multimodal_features
    * gate on hashes instead of row counts. */
  def fakeDecodeFeatures(payload: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (payload != null && payload.nonEmpty) {
      val sums = new Array[Long](featureDim)
      var i = 0
      while (i < payload.length) {
        sums(i % featureDim) += (payload(i) & 0xff)
        i += 1
      }
      var j = 0
      while (j < featureDim) {
        out(j) = (sums(j) / (payload.length * 255.0)).toFloat
        j += 1
      }
    }
    out
  }

  /** Video-style frame sampling: treat the payload as fixed-size frames,
    * keep every `stride`-th frame, one output row per sampled frame with
    * per-frame stub features. The row-explosion shape (media -> frames) is
    * the real contract; the decode is the same deterministic stub. */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int,
                   stride: Int, featureDim: Int = 4): DataFrame = {
    import spark.implicits._
    media.where(col("kind") === "video")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val p = if (payload == null) Array.emptyByteArray else payload
        val nFrames = (p.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).map { f =>
          val frame = p.slice(f * frameBytes, math.min((f + 1) * frameBytes, p.length))
          (id, f, frame.length, fakeDecodeFeatures(frame, featureDim))
        }
      }
      .toDF("media_id", "frame_no", "frame_bytes", "features")
  }

  /** Image-style resize: map the payload onto a fixed (w, h) byte grid by
    * nearest-neighbor sampling over the source bytes — the deterministic
    * stand-in for a real pixel resample (same contract: bounded output size
    * per row, meta records both source and target dims). Resize-on-ingest is
    * the standard normalization step before batching images into training
    * shards; the property that matters at 100 TB is that output rows have a
    * KNOWN bounded size, so downstream shuffle partitions can be sized
    * deterministically. */
  def resizeStub(spark: SparkSession, media: DataFrame,
                 targetBytes: Int): DataFrame = {
    require(targetBytes >= 1, s"targetBytes must be >= 1, got $targetBytes")
    import spark.implicits._
    media.where(col("kind") === "image")
      .select(col("media_id"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { rows =>
        // real impl: one codec/interpolator per partition
        rows.map { case (id, payload, nBytes) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          val out = new Array[Byte](targetBytes)
          if (p.nonEmpty) {
            var i = 0
            while (i < targetBytes) {
              out(i) = p((i.toLong * p.length / targetBytes).toInt)
              i += 1
            }
          }
          (id, nBytes, targetBytes.toLong, out)
        }
      }
      .toDF("media_id", "src_bytes", "dst_bytes", "payload")
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP ship with
    * every JVM — no external codec needed): featureDim mean-luminance bands
    * top-to-bottom, a deterministic pixel-derived feature vector. Returns
    * None when the payload is not a decodable image (the caller falls back
    * to the deterministic stub, keeping non-image kinds and synthetic
    * fixtures working unchanged). */
  def decodeImageFeatures(payload: Array[Byte], featureDim: Int): Option[Array[Float]] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null || img.getWidth <= 0 || img.getHeight <= 0) None
    else {
      val sums = new Array[Double](featureDim)
      val counts = new Array[Long](featureDim)
      val h = img.getHeight
      val w = img.getWidth
      var y = 0
      while (y < h) {
        val band = (y.toLong * featureDim / h).toInt
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          sums(band) += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
          counts(band) += 1
          x += 1
        }
        y += 1
      }
      Some(Array.tabulate(featureDim)(i =>
        if (counts(i) == 0) 0f else (sums(i) / counts(i)).toFloat))
    }
  }

  /** Real audio decode — `javax.sound.sampled` is in the JDK, so WAV/PCM
    * payloads (the dominant uncompressed-audio interchange format) decode
    * without any external codec: per-band mean absolute amplitude over
    * `featureDim` equal time slices, mono-folded across channels and
    * normalized to [0, 1]. Returns None for non-WAV/unsupported encodings
    * (mp3/ogg need codecs this container doesn't ship) — the caller falls
    * back to the deterministic stub, keeping the pipeline total. */
  def decodeAudioFeatures(payload: Array[Byte], featureDim: Int): Option[Array[Float]] =
    decodeAudioBands(payload, featureDim).map(_.map(_.toFloat))

  /** The exact double form behind [[decodeAudioFeatures]] — per-band
    * (Σ|sample|) / (count · channels · 32768): the absolute-amplitude sums
    * accumulate EXACT integers, so an oracle that knows the fixture's PCM
    * formula reproduces each band bit-for-bit (no float truncation in
    * this variant; the Float API keeps its legacy surface). */
  def decodeAudioBands(payload: Array[Byte], featureDim: Int): Option[Array[Double]] = {
    if (payload == null || payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            fmt.getSampleSizeInBits != 16) return None
        val bytes = in.readAllBytes()
        val channels = fmt.getChannels
        val frameBytes = 2 * channels
        val nFrames = bytes.length / frameBytes
        if (nFrames == 0) return None
        val order =
          if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
          else java.nio.ByteOrder.LITTLE_ENDIAN
        val buf = java.nio.ByteBuffer.wrap(bytes).order(order).asShortBuffer()
        val sums = new Array[Long](featureDim)
        val counts = new Array[Long](featureDim)
        var f = 0
        while (f < nFrames) {
          val band = (f.toLong * featureDim / nFrames).toInt
          var c = 0
          while (c < channels) {
            sums(band) += math.abs(buf.get(f * channels + c).toInt).toLong
            c += 1
          }
          counts(band) += 1
          f += 1
        }
        Some(Array.tabulate(featureDim)(i =>
          if (counts(i) == 0) 0.0
          else sums(i) / (counts(i) * channels * 32768.0)))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** From-scratch mono PCM16 WAV writer (44-byte RIFF/WAVE/fmt/data
    * header + little-endian samples) — the audio counterpart of
    * [[VideoCodec.y4mBytes]], so gate fixtures are REAL WAV files the
    * JDK's own parser must read back. */
  def wavPcm16Bytes(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2)            // block align
      .putShort(16)           // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  /** The audio gate fixture: PCM samples a pure function of (docId, i) —
    * `s(i) = ((docId*7 + i*13) mod 65536) - 32768` — so an ANSI oracle
    * re-derives every decoded band mean from first principles. */
  def syntheticWav(docId: Long, nSamples: Int): Array[Byte] = {
    require(nSamples >= 1)
    wavPcm16Bytes(Array.tabulate(nSamples)(i =>
      (((docId * 7 + i * 13) % 65536) - 32768).toShort))
  }

  /** Feature extraction over the media table. `mapPartitions` so any real
    * decoder is initialized once per partition (codec contexts are
    * expensive), and rows stream through in batches — the Scala analogue of
    * a pandas-batched UDF. Image payloads go through the REAL ImageIO
    * decoder ([[decodeImageFeatures]]); non-images (and payloads that are
    * not decodable image bytes, e.g. the synthetic text fixtures) fall back
    * to the deterministic stub so the pipeline stays total. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      featureDim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    media
      .select(col("media_id"), col("kind"), col("payload"), col("meta.n_bytes").as("n_bytes"))
      .as[(Long, String, Array[Byte], Long)]
      .mapPartitions { rows =>
        // ImageIO plugin lookup is per-classloader; touching it here keeps
        // the per-row cost to decode alone (the once-per-partition setup
        // point a real codec would also use)
        rows.map { case (id, kind, payload, nBytes) =>
          val features = (kind match {
            case "image" => decodeImageFeatures(payload, featureDim)
            case "audio" => decodeAudioFeatures(payload, featureDim)
            // real Y4M/AVI decode (VideoCodec): clip-level features are the
            // frame-band means averaged across frames; other containers
            // (compressed codecs) fall back to the stub as before
            case "video" => VideoCodec.decodeVideoFrameBands(payload, featureDim)
              .map(fr => Array.tabulate(featureDim)(b =>
                (fr.map(_(b)).sum / fr.length).toFloat))
            case _ => None
          }).getOrElse(fakeDecodeFeatures(payload, featureDim))
          MediaFeatures(id, kind, nBytes, features)
        }
      }
  }
}
