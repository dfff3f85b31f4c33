package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamingOps, TwsFunnel}

class TwsFunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("late earlier view re-opens a click across batches — recompute beats greedy state") {
    val dir = Files.createTempDirectory("graft_twsfunnel").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    // batch 1: click BEFORE the only view -> no conversion (stage 1)
    Seq((1L, ts(100), "view"), (1L, ts(50), "click"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$dir/b1")
    // batch 2: a LATE view at t=10 — now click@50 follows a view (stage 2)
    Seq((1L, ts(10), "view"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.parquet(s"$dir/b2")
    // stage the two files into one stream dir with ordered mod times
    val streamDir = Files.createTempDirectory("graft_twsfunnel_in").toString
    def stage(src: String, name: String, mtime: Long): Unit = {
      val f = new java.io.File(src).listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(streamDir, name)
      Files.copy(f.toPath, dst.toPath)
      dst.setLastModified(mtime)
      ()
    }
    stage(s"$dir/b1", "a_first.parquet", 1000000L)
    stage(s"$dir/b2", "b_second.parquet", 2000000L)

    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      StreamingOps.withStatePartitions(spark) {
        val sch = Encoders.product[(Long, java.sql.Timestamp, String)].schema
        val updates = spark.readStream
          .schema(new org.apache.spark.sql.types.StructType()
            .add("user_id", "long").add("ts", "timestamp").add("event_type", "string"))
          .option("maxFilesPerTrigger", 1)
          .parquet(streamDir)
          .select(col("user_id"), unix_micros(col("ts")).as("ep"), col("event_type"))
          .as[TwsFunnel.Ev]
          .groupByKey(_.user_id)
          .transformWithState(new TwsFunnel.Processor, TimeMode.None(), OutputMode.Update())
        val q = updates.writeStream.outputMode("update").format("memory")
          .queryName("t_tws_funnel").trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable() finally q.stop()
        assert(sch != null)
      }
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val stages = spark.table("t_tws_funnel")
      .select($"user_id", $"stage").as[(Long, Int)].collect().toSeq
    // two update emissions: stage 1 after batch 1, stage 2 after the late view
    assert(stages.sorted === Seq((1L, 1), (1L, 2)),
      s"expected greedy-impossible upgrade 1 -> 2, got $stages")
  }

  test("funnelOnce output shape matches the batch funnel contract") {
    val out = TwsFunnel.funnelOnce(spark, s"${TestSpark.sf}/events.parquet",
        queryName = "t_tws_funnel_full")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set("1_view", "2_click", "3_purchase"))
    // cascade monotonicity
    assert(out("1_view") >= out("2_click") && out("2_click") >= out("3_purchase"))
    assert(out("1_view") > 0)
  }
}
