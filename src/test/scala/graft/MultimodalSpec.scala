package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

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

  test("stub decode maps payload bytes into bounded [0,1] features") {
    val feats = Multimodal.fakeDecodeFeatures("hello world".getBytes("UTF-8"), 4)
    assert(feats.length === 4)
    assert(feats.forall(f => f >= 0f && f <= 1f))
    assert(Multimodal.fakeDecodeFeatures(Array.emptyByteArray, 4).forall(_ == 0f))
  }
}
