package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, PerceptualHash}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    spark.read.parquet(s"${TestSpark.sf}/documents.parquet"),
    "doc_id", "text", "source").cache()

  test("media table has the declared multimodal schema") {
    assert(media.schema("payload").dataType.typeName === "binary")
    assert(media.schema("kind").dataType.typeName === "string")
    val kinds = media.select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic with stable dim and meta passthrough") {
    val f1 = Multimodal.extractFeatures(spark, media, featureDim = 8).collect().toSeq
    val f2 = Multimodal.extractFeatures(spark, media, featureDim = 8).collect().toSeq
    assert(f1.map(_.media_id) === f2.map(_.media_id))
    assert(f1.zip(f2).forall { case (a, b) => a.features.toSeq == b.features.toSeq })
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(r => r.n_bytes > 0))
  }

  test("resize yields exactly targetBytes per image, order-preserving sample") {
    val out = Multimodal.resizeStub(spark, media, targetBytes = 16)
      .as[(Long, Long, Long, Array[Byte])].collect()
    assert(out.nonEmpty)
    assert(out.forall(_._4.length == 16))
    assert(out.forall(_._3 == 16L))
    // nearest-neighbor keeps byte order: first output byte is the first
    // source byte, and outputs are drawn from the source alphabet
    val byId = media.where($"kind" === "image")
      .select($"media_id", $"payload").as[(Long, Array[Byte])].collect().toMap
    out.foreach { case (id, srcBytes, _, resized) =>
      val src = byId(id)
      assert(srcBytes === src.length.toLong)
      assert(resized.head === src.head)
      assert(resized.toSet.subsetOf(src.toSet))
    }
  }

  test("real PNG bytes decode through ImageIO: band features match the pixels") {
    // 8x8 PNG, top half black, bottom half white — with featureDim=2 the
    // mean-luminance bands must read ~0.0 and ~1.0
    val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0x000000 else 0xffffff)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val png = buf.toByteArray

    val direct = Multimodal.decodeImageFeatures(png, 2)
    assert(direct.isDefined, "a real PNG must decode")
    assert(direct.get(0) < 0.05f && direct.get(1) > 0.95f, direct.get.toSeq)

    // and through the distributed pipeline: the image row takes the REAL
    // decode path (features = pixel bands, not the byte-hash stub)
    val media = Seq((1L, "image", png, ("gen", png.length.toLong)))
      .toDF("media_id", "kind", "payload", "meta")
      .select($"media_id", $"kind", $"payload",
        struct($"meta._1".as("source"), $"meta._2".as("n_bytes")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media, featureDim = 2).collect()
    assert(out.length === 1)
    assert(out.head.features.toSeq === direct.get.toSeq)
    assert(out.head.features.toSeq !== Multimodal.fakeDecodeFeatures(png, 2).toSeq)
  }

  test("real WAV bytes decode through javax.sound: band amplitudes match the signal") {
    // 16-bit PCM mono WAV, 2000 frames: first half silence, second half
    // full-scale square wave — with featureDim=2 the mean-|amplitude|
    // bands must read ~0.0 and ~1.0
    val samples = new Array[Short](2000)
    for (i <- 1000 until 2000) samples(i) = if (i % 2 == 0) 32767 else -32767
    val bytes = new Array[Byte](samples.length * 2)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asShortBuffer().put(samples)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length.toLong)
    val buf = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, buf)
    val wav = buf.toByteArray

    val direct = Multimodal.decodeAudioFeatures(wav, 2)
    assert(direct.isDefined, "a real WAV must decode")
    assert(direct.get(0) < 0.01f && direct.get(1) > 0.95f, direct.get.toSeq)

    // and through the distributed pipeline under kind=audio
    val media = Seq((2L, "audio", wav, ("gen", wav.length.toLong)))
      .toDF("media_id", "kind", "payload", "meta")
      .select($"media_id", $"kind", $"payload",
        struct($"meta._1".as("source"), $"meta._2".as("n_bytes")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media, featureDim = 2).collect()
    assert(out.head.features.toSeq === direct.get.toSeq)
    assert(out.head.features.toSeq !== Multimodal.fakeDecodeFeatures(wav, 2).toSeq)
  }

  test("non-WAV payloads under kind=audio fall back to the deterministic stub") {
    val junk = "definitely not audio".getBytes("UTF-8")
    val media = Seq((8L, "audio", junk, ("gen", junk.length.toLong)))
      .toDF("media_id", "kind", "payload", "meta")
      .select($"media_id", $"kind", $"payload",
        struct($"meta._1".as("source"), $"meta._2".as("n_bytes")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media, featureDim = 4).collect()
    assert(out.head.features.toSeq === Multimodal.fakeDecodeFeatures(junk, 4).toSeq)
  }

  test("non-image payloads under kind=image fall back to the deterministic stub") {
    val junk = "definitely not an image".getBytes("UTF-8")
    val media = Seq((7L, "image", junk, ("gen", junk.length.toLong)))
      .toDF("media_id", "kind", "payload", "meta")
      .select($"media_id", $"kind", $"payload",
        struct($"meta._1".as("source"), $"meta._2".as("n_bytes")).as("meta"))
    val out = Multimodal.extractFeatures(spark, media, featureDim = 4).collect()
    assert(out.head.features.toSeq === Multimodal.fakeDecodeFeatures(junk, 4).toSeq)
  }

  test("stub decode maps payload bytes into bounded [0,1] features") {
    val feats = Multimodal.fakeDecodeFeatures("hello world".getBytes("UTF-8"), 4)
    assert(feats.length === 4)
    assert(feats.forall(f => f >= 0f && f <= 1f))
    assert(Multimodal.fakeDecodeFeatures(Array.emptyByteArray, 4).forall(_ == 0f))
  }

  test("dHash: manual bit check, mutation sensitivity, null safety") {
    // ascending bytes: every difference bit set -> h0 = h1 = 0xFFFFFFFF
    val asc = Array.tabulate(65)(_.toByte)
    assert(PerceptualHash.dHash64(asc) === (0xffffffffL, 0xffffffffL))
    // constant payload: no strict increase anywhere -> all-zero hash
    assert(PerceptualHash.dHash64(Array.fill(65)(7.toByte)) === (0L, 0L))
    assert(PerceptualHash.dHash64(null) === (0L, 0L))
    // flipping one grid cell of a long payload moves few bits
    val text = ("the quick brown fox jumps over the lazy dog " * 8).getBytes("UTF-8")
    val mutated = text.clone(); mutated(0) = 'X'.toByte
    val (a0, a1) = PerceptualHash.dHash64(text)
    val (b0, b1) = PerceptualHash.dHash64(mutated)
    val ham = java.lang.Long.bitCount(a0 ^ b0) + java.lang.Long.bitCount(a1 ^ b1)
    assert(ham <= 2, s"1-byte mutation moved $ham bits")
  }

  test("banded pHash pair join is lossless vs all-pairs at maxHamming 3") {
    val payloads = media.limit(60)
      .select($"media_id", $"payload")
    val banded = PerceptualHash.nearDupPairs(payloads, maxHamming = 3)
      .select($"id1", $"id2", $"hamming").as[(Long, Long, Int)].collect().toSet
    // brute force on the same rows
    val hashed = payloads.as[(Long, Array[Byte])].collect()
      .map { case (id, p) => (id, PerceptualHash.dHash64(p)) }
    val all = (for {
      (i1, (x0, x1)) <- hashed; (i2, (y0, y1)) <- hashed if i1 < i2
      h = java.lang.Long.bitCount(x0 ^ y0) + java.lang.Long.bitCount(x1 ^ y1)
      if h <= 3
    } yield (i1, i2, h)).toSet
    assert(banded === all)
  }
}
