package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{Multimodal, VideoCodec}

class VideoCodecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("encode/decode roundtrip: hand-computed band means from known luma planes") {
    // 4x4, two frames; bands (featureDim 2) cover rows {0,1} and {2,3}
    val f0 = Array.tabulate(16)(i => ((i / 4) * 10).toByte) // rows 0,10,20,30
    val f1 = Array.fill[Byte](16)(255.toByte)
    val bytes = VideoCodec.y4mBytes(4, 4, Seq(f0, f1))
    val got = VideoCodec.decodeY4MFrameBands(bytes, featureDim = 2).get
    assert(got.length === 2)
    // frame 0: band0 = (4*0 + 4*10)/(8*255), band1 = (4*20 + 4*30)/(8*255)
    assert(got(0)(0) === 40.0 / (8 * 255.0))
    assert(got(0)(1) === 200.0 / (8 * 255.0))
    assert(got(1)(0) === 1.0 && got(1)(1) === 1.0)
  }

  test("header variants parse; unsupported colorspaces and garbage are None") {
    // C420jpeg alias and extra X param must parse like C420
    val base = VideoCodec.y4mBytes(4, 4, Seq(Array.fill[Byte](16)(100.toByte)))
    val hdr = "YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\n"
    val swapped = ("YUV4MPEG2 W4 H4 F30000:1001 C420jpeg Xcustom\n".getBytes("US-ASCII") ++
      base.drop(hdr.length))
    val a = VideoCodec.decodeY4MFrameBands(base, 2).get
    val b = VideoCodec.decodeY4MFrameBands(swapped, 2).get
    assert(a.map(_.toSeq) === b.map(_.toSeq))
    // mono: Y plane only, no chroma
    val monoHdr = "YUV4MPEG2 W4 H2 Cmono\n".getBytes("US-ASCII")
    val mono = monoHdr ++ "FRAME\n".getBytes("US-ASCII") ++ Array.fill[Byte](8)(51.toByte)
    assert(VideoCodec.decodeY4MFrameBands(mono, 1).get.head.head === 51 / 255.0)
    // rejects: wrong magic, unsupported 422, truncated frame, bad marker
    assert(VideoCodec.decodeY4MFrameBands("JUNKJUNKJUNK\n".getBytes, 2).isEmpty)
    val c422 = "YUV4MPEG2 W4 H4 C422\n".getBytes("US-ASCII") ++ base.drop(hdr.length)
    assert(VideoCodec.decodeY4MFrameBands(c422, 2).isEmpty)
    assert(VideoCodec.decodeY4MFrameBands(base.dropRight(1), 2).isEmpty)
    val badMarker = base.clone(); badMarker(hdr.length) = 'G'.toByte
    assert(VideoCodec.decodeY4MFrameBands(badMarker, 2).isEmpty)
  }

  test("frameBands: distributed decode ≡ local decode, strided frame numbers") {
    val media = Seq(3L, 7L, 12L)
      .map(id => (id, VideoCodec.syntheticY4M(id, nFrames = (1 + id % 4).toInt)))
      .toDF("media_id", "payload")
    val got = VideoCodec.frameBands(spark, media, stride = 2, featureDim = 4)
      .as[(Long, Int, Int, Array[Double])].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4.toSeq)).toMap
    for (id <- Seq(3L, 7L, 12L)) {
      val nf = (1 + id % 4).toInt
      val local = VideoCodec.decodeY4MFrameBands(
        VideoCodec.syntheticY4M(id, nf), 4).get
      val want = (0 until nf by 2).map(f => (id, f) -> ((nf, local(f).toSeq))).toMap
      assert(got.view.filterKeys(_._1 == id).toMap === want, s"id=$id")
    }
  }

  test("AVI: roundtrip with hand-computed bands, bottom-up row order, rejects") {
    // 4x4 gray frame with DISTINCT row values: proves the decoder flips
    // the bottom-up DIB storage back to top-down bands
    val g = Array.tabulate(16)(i => ((i / 4) * 20).toByte) // rows 0,20,40,60
    val avi = VideoCodec.aviBytes(4, 4, Seq(g))
    val got = VideoCodec.decodeAviFrameBands(avi, 2).get
    assert(got.length === 1)
    // band0 = rows {0,20}: sums = 4*3*0 + 4*3*20 = 240; /(8*3*255)
    assert(got(0)(0) === 240.0 / (8 * 3 * 255.0))
    assert(got(0)(1) === (4 * 3 * 40 + 4 * 3 * 60).toDouble / (8 * 3 * 255.0))
    // odd width exercises 4-byte row padding: w=3 -> rowBytes 12 != 9
    val g3 = Array.tabulate(6)(i => ((i / 3) * 50).toByte)
    val odd = VideoCodec.decodeAviFrameBands(VideoCodec.aviBytes(3, 2, Seq(g3)), 2).get
    assert(odd(0)(0) === (3 * 3 * 0).toDouble / (3 * 3 * 255.0))
    assert(odd(0)(1) === (3 * 3 * 50).toDouble / (3 * 3 * 255.0))
    // rejects: non-RIFF, truncated movi chunk, and a compressed strf
    assert(VideoCodec.decodeAviFrameBands("nope".getBytes, 2).isEmpty)
    assert(VideoCodec.decodeAviFrameBands(avi.dropRight(4), 2).isEmpty)
    val compressed = avi.clone()
    // strf biCompression lives 16 bytes into the strf body; find it
    val strfAt = avi.indices.find(i => i + 4 <= avi.length &&
      new String(avi, i, 4, "US-ASCII") == "strf").get
    compressed(strfAt + 8 + 16) = 1 // BI_RLE8
    assert(VideoCodec.decodeAviFrameBands(compressed, 2).isEmpty)
    // dispatch: the generic entry point decodes both containers
    assert(VideoCodec.decodeVideoFrameBands(avi, 2).nonEmpty)
    assert(VideoCodec.decodeVideoFrameBands(
      VideoCodec.syntheticY4M(1L, 1), 2).nonEmpty)
  }

  test("MJPEG: uniform 8×8 blocks round-trip bit-exactly at quality 1.0 — all 256 levels") {
    // the exactness claim the oracle formula rests on: a uniform block is
    // a DC-only DCT and the quality-1.0 quantization table is all ones
    for (g <- 0 until 256) {
      val gray = Array.tabulate(8 * 32)(i => (((i / 8) / 8) * 13 + g).toByte)
      val jpeg = VideoCodec.jpegGrayBytes(8, 32, gray)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      assert(img.getRaster.getNumBands === 1)
      for (y <- 0 until 32; x <- 0 until 8)
        assert(img.getRaster.getSample(x, y, 0) === (gray(y * 8 + x) & 0xff),
          s"g=$g y=$y x=$x")
    }
  }

  test("MJPEG AVI: decode matches the fixture formula; Y4M/DIB paths unaffected") {
    val avi = VideoCodec.syntheticMjpegAvi(7L, 3)
    val got = VideoCodec.decodeAviFrameBands(avi, 4).get
    assert(got.length === 3)
    for (f <- 0 until 3; b <- 0 until 4)
      assert(got(f)(b) === ((7 * 37 + f * 11 + b * 13) % 256) / 255.0,
        s"f=$f b=$b")
    // generic dispatch reaches the MJPEG branch too
    assert(VideoCodec.decodeVideoFrameBands(avi, 4).nonEmpty)
    // a truncated JPEG chunk is malformed, not silently skipped
    assert(VideoCodec.decodeAviFrameBands(avi.dropRight(6), 4).isEmpty)
  }

  test("extractFeatures routes Y4M video payloads through the real decoder") {
    val y4m = VideoCodec.syntheticY4M(5L, nFrames = 2)
    val media = Seq((5L, "video", y4m), (6L, "video", "not a video".getBytes))
      .toDF("media_id", "kind", "payload")
      .withColumn("meta", struct(lit("t").as("source"),
        length(col("payload")).cast("long").as("n_bytes")))
    val out = Multimodal.extractFeatures(spark, media, featureDim = 4)
      .collect().map(m => m.media_id -> m.features).toMap
    val frames = VideoCodec.decodeY4MFrameBands(y4m, 4).get
    val want = Array.tabulate(4)(b => (frames.map(_(b)).sum / frames.length).toFloat)
    assert(out(5L).toSeq === want.toSeq, "real decode must win for Y4M payloads")
    assert(out(6L).toSeq === Multimodal.fakeDecodeFeatures("not a video".getBytes, 4).toSeq,
      "non-Y4M video payloads keep the deterministic stub")
  }
}
