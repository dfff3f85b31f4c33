package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.StreamingOps

class StreamingDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streaming dropDuplicates equals batch distinct on the same keys") {
    val streamed = StreamingOps.dedupStreamOnce(spark,
      s"${TestSpark.sf}/events.parquet", Seq("user_id", "event_type"),
      queryName = "t_dedup_stream")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.operators.EventsOps.withEventTs(
      spark.read.parquet(s"${TestSpark.sf}/events.parquet"))
      .dropDuplicates(Seq("user_id", "event_type", "ts"))
    assert(streamed.count() === batch.count())
  }

  test("bucketed streaming dedup key set equals batch DISTINCT per day") {
    val streamed = StreamingOps.dedupByBucketOnce(spark,
      s"${TestSpark.sf}/events.parquet", Seq("user_id", "event_type"),
      bucket = "day", queryName = "t_dedup_bucket_stream")
      .as[(Long, String, java.sql.Timestamp)].collect().toSet
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batch = graft.operators.EventsOps.withEventTs(
      spark.read.parquet(s"${TestSpark.sf}/events.parquet"))
      .select($"user_id", $"event_type", date_trunc("day", $"ts").as("d"))
      .distinct()
      .as[(Long, String, java.sql.Timestamp)].collect().toSet
    assert(streamed === batch)
    assert(streamed.size < spark.read.parquet(s"${TestSpark.sf}/events.parquet").count())
  }

  test("dropDuplicatesWithinWatermark key set equals batch DISTINCT") {
    val streamed = StreamingOps.dedupWithinWatermarkOnce(spark,
      s"${TestSpark.sf}/events.parquet", Seq("user_id", "event_type"),
      queryName = "t_dedup_wm_stream")
      .as[(Long, String)].collect().toSet
    val batch = spark.read.parquet(s"${TestSpark.sf}/events.parquet")
      .select($"user_id", $"event_type").distinct()
      .as[(Long, String)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming LSH bucket state equals the batch band-key build") {
    val streamed = StreamingOps.lshBucketsOnce(spark,
      s"${TestSpark.sf}/documents.parquet", "text", "doc_id",
      numHashes = 12, bands = 4, queryName = "t_lsh_stream")
      .select($"band_idx", $"band_key", $"rep_id", $"n_members")
      .as[(Int, String, Long, Long)].collect().toSet

    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val batch = docs.select($"doc_id",
        graft.operators.Dedup.shinglesFast(2)($"text").as("sh"))
      .where(org.apache.spark.sql.functions.size($"sh") > 0)
      .select($"doc_id", org.apache.spark.sql.functions.posexplode(
        graft.operators.Dedup.minhashBandKeysFast(12, 4)($"sh")))
      .groupBy($"pos".cast("int").as("band_idx"), $"col".as("band_key"))
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("rep_id"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_members"))
      .as[(Int, String, Long, Long)].collect().toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("frame sampling yields every stride-th frame with stub features") {
    val media = Multimodal.asMediaTable(
      spark.read.parquet(s"${TestSpark.sf}/documents.parquet"),
      "doc_id", "text", "source")
    val frames = Multimodal.sampleFrames(spark, media, frameBytes = 32, stride = 2)
    assert(frames.count() > 0)
    val perMedia = frames.groupBy($"media_id")
      .agg(count(lit(1)).as("n"), max($"frame_no").as("mx"))
      .as[(Long, Long, Int)].collect()
    perMedia.foreach { case (_, n, mx) =>
      assert(mx % 2 === 0)            // only even frame numbers at stride 2
      assert(n === mx / 2 + 1)        // contiguous every-2nd sampling
    }
    val dims = frames.select(size($"features")).distinct().as[Int].collect().toSeq
    assert(dims === Seq(4))
  }
}
