package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TwsUserTotals
import graft.streaming.TwsUserTotals.{UserEvent, UserTotal}

/** Pins transformWithState (Spark 4 arbitrary-stateful v2): ValueState
  * carried across micro-batches under the RocksDB provider the API
  * requires. */
class TwsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ValueState accumulates across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val out = input.toDS().groupByKey(_.user_id)
      .transformWithState(new TwsUserTotals.Processor,
        TimeMode.None(), OutputMode.Update())
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("t_tws").start()
    try {
      input.addData(UserEvent(1L, 1.0), UserEvent(1L, 2.0), UserEvent(2L, 5.0))
      q.processAllAvailable()
      input.addData(UserEvent(1L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("t_tws").as[UserTotal].collect().toSeq
      // batch 1 emission: user 1 at (2, 3.0); batch 2: state carried -> (3, 7.0)
      assert(rows.exists(r => r.user_id == 1 && r.n == 2 && math.abs(r.sum_value - 3.0) < 1e-9))
      assert(rows.exists(r => r.user_id == 1 && r.n == 3 && math.abs(r.sum_value - 7.0) < 1e-9))
      assert(rows.exists(r => r.user_id == 2 && r.n == 1 && math.abs(r.sum_value - 5.0) < 1e-9))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
