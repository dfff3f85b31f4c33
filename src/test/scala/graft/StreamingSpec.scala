package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EventsOps
import graft.streaming.StreamingOps

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def batchEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    EventsOps.withEventTs(spark.read.parquet(s"${TestSpark.sf}/events.parquet"))
  }

  test("left-outer stream join emits watermark-cleared unmatched views as nulls") {
    val got = StreamingOps.attributionJoinLeftOuterOnce(spark,
      s"${TestSpark.sf}/events.parquet", withinSeconds = 1800L,
      queryName = "t_attrib_lo")
    // watermark-cleared region: every batch-left-join row below the cutoff
    // must appear, including the null-purchase (unmatched) ones
    val wm = batchEvents.where($"event_type".isin("view", "purchase"))
      .groupBy($"event_type").agg(max($"ts").as("m"))
      .agg(min($"m")).collect()(0).getTimestamp(0)
    val cutoff = new java.sql.Timestamp(wm.getTime - 5460L * 1000L)
    val safe = got.where($"view_ts" <= lit(cutoff))
    assert(safe.where($"purchase_id".isNull).count() > 0, "no unmatched views emitted")
    val views = batchEvents.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
      .where($"view_ts" <= lit(cutoff))
    val purchases = batchEvents.where($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"), $"ts".as("purchase_ts"))
    val batchLeft = views.join(purchases,
      $"user_id" === $"p_user_id" && $"purchase_ts" >= $"view_ts" &&
        $"purchase_ts" < $"view_ts" + expr("INTERVAL 1800 SECONDS"), "leftOuter")
    assert(safe.count() === batchLeft.count())
  }

  test("streaming complete-mode window agg equals the batch tumbling agg") {
    val streamed = StreamingOps.windowAggOnce(spark,
      s"${TestSpark.sf}/events.parquet", "1 hour", queryName = "t_stream_eq")
      .orderBy($"window_start", $"event_type").collect().toSeq
    val batch = EventsOps.tumblingAgg(batchEvents, "1 hour")
      .orderBy($"window_start", $"event_type").collect().toSeq
    assert(streamed === batch)
  }

  test("RocksDB state store (the 100TB-state backend) yields identical results") {
    // At production state volumes the HDFS-backed in-memory state store
    // OOMs (all state lives on the executor heap); RocksDB spills state to
    // local disk with the same exactly-once semantics. Pin that flipping
    // the provider is purely operational: same query, same answer.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = StreamingOps.windowAggOnce(spark,
        s"${TestSpark.sf}/events.parquet", "1 hour", queryName = "t_rocks_agg")
        .orderBy($"window_start", $"event_type").collect().toSeq
      val batch = EventsOps.tumblingAgg(batchEvents, "1 hour")
        .orderBy($"window_start", $"event_type").collect().toSeq
      assert(rocks === batch)
    } finally {
      before match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = StreamingOps.attributionJoinOnce(spark,
      s"${TestSpark.sf}/events.parquet", queryName = "t_stream_join")
      .orderBy($"user_id", $"view_id", $"purchase_id").collect().toSeq
    val ev = batchEvents
    val v = ev.where($"event_type" === "view")
      .select($"user_id", $"event_id".as("view_id"), $"ts".as("view_ts"))
    val p = ev.where($"event_type" === "purchase")
      .select($"user_id".as("p_user_id"), $"event_id".as("purchase_id"),
        $"ts".as("purchase_ts"), $"value")
    val batch = v.join(p, $"user_id" === $"p_user_id" &&
        $"purchase_ts" >= $"view_ts" &&
        $"purchase_ts" < $"view_ts" + expr("INTERVAL 1800 SECONDS"))
      .select($"user_id", $"view_id", $"purchase_id",
        round($"value", 4).as("purchase_value"))
      .orderBy($"user_id", $"view_id", $"purchase_id").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("watermarked append-mode variant runs and emits only closed windows") {
    val wm = StreamingOps.windowAggWatermarked(spark,
      s"${TestSpark.sf}/events.parquet", "1 hour", "2 hours",
      queryName = "t_stream_wm")
    // append mode withholds windows not yet past the watermark; with a single
    // finite batch the final window(s) stay open -> strictly fewer rows than
    // the complete-mode result, and no duplicates.
    val n = wm.count()
    val total = EventsOps.tumblingAgg(batchEvents, "1 hour").count()
    assert(n < total)
    assert(wm.groupBy($"window_start", $"event_type").count()
      .where($"count" > 1).count() === 0)
  }

  test("streaming CMS counter state equals the batch counter table cell-for-cell") {
    val docsPath = s"${TestSpark.sf}/documents.parquet"
    val st = StreamingOps.cmsCountersOnce(spark, docsPath, "text",
        depth = 4, width = 16, queryName = "t_cms_counters")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val bt = graft.operators.CorpusStats.cmsCounters(
        spark.read.parquet(docsPath), "text", depth = 4, width = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(st === bt)
    // bounded state: never more than depth x width cells
    assert(st.size <= 4 * 16)
  }

  test("streamed SCD2 PIT enrichment equals the batch interval join, version by version") {
    import org.apache.spark.sql.functions._
    val evp = s"${TestSpark.sf}/events.parquet"
    val ev = batchEvents
    // dim: every user flips tier at the midpoint of the event-time span
    val cut = ev.agg(
      expr("(CAST(floor(min(unix_timestamp(ts))) AS BIGINT) + CAST(floor(max(unix_timestamp(ts))) AS BIGINT)) div 2"))
      .collect().head.getLong(0)
    val dim = ev.select(col("user_id").as("uid")).distinct()
      .select(col("uid"), lit("old").as("tier"), lit(0L).as("valid_from"),
        lit(cut).as("valid_to"))
      .unionByName(ev.select(col("user_id").as("uid")).distinct()
        .select(col("uid"), lit("new").as("tier"), lit(cut).as("valid_from"),
          lit(null).cast("long").as("valid_to")))
    val st = StreamingOps.scd2EnrichOnce(spark, evp, dim, queryName = "t_scd2s")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val bt = ev.withColumn("ep", unix_timestamp(col("ts")))
      .join(dim, col("user_id") === col("uid") && col("valid_from") <= col("ep") &&
        (col("valid_to").isNull || col("valid_to") > col("ep")))
      .groupBy(col("tier"), col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(st === bt)
    // the version boundary is live: BOTH versions matched something
    assert(st.keys.exists(_._1 == "old") && st.keys.exists(_._1 == "new"))
    // every event matched exactly one version (disjoint intervals)
    assert(st.values.sum === ev.count())
  }
}
