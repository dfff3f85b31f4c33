package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Per-user running totals on Spark 4's `transformWithState` — the
  * arbitrary-stateful-processing v2 API (StatefulProcessor + typed state
  * variables + optional timers/TTL) that supersedes mapGroupsWithState:
  * state lives in named, individually-evolvable variables inside the
  * RocksDB state store (the API REQUIRES the RocksDB provider), so a
  * 100 TB-scale stateful job gets spillable, incrementally-checkpointed
  * per-key state rather than heap-resident case classes.
  *
  * The processor keeps one ValueState[(n, sum)] per user and emits the
  * updated total on every input batch (Update mode). Over a finite fixture
  * the FINAL emission per user equals the batch aggregate — `n` is
  * strictly increasing, so max_by(n) selects it deterministically.
  */
object TwsUserTotals {

  case class UserEvent(user_id: Long, value: Double)
  case class Totals(n: Long, sum: Double)
  case class UserTotal(user_id: Long, n: Long, sum_value: Double)

  class Processor extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var totals: ValueState[Totals] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[Totals]("totals",
        Encoders.product[Totals], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserTotal] = {
      var t = if (totals.exists()) totals.get() else Totals(0L, 0.0)
      rows.foreach(r => t = Totals(t.n + 1, t.sum + r.value))
      totals.update(t)
      Iterator.single(UserTotal(key, t.n, t.sum))
    }
  }

  /** Run the processor over a finite events fixture and return the FINAL
    * per-user totals (sum rounded to 4). */
  def userTotalsOnce(spark: SparkSession, eventsPath: String,
                     queryName: String = "graft_tws_totals"): DataFrame = {
    import spark.implicits._
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      StreamingOps.withStatePartitions(spark) {
        val updates = StreamingOps.readEvents(spark, eventsPath)
          .where(col("value").isNotNull)
          .select(col("user_id"), col("value")).as[UserEvent]
          .groupByKey(_.user_id)
          .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
        val q = updates.writeStream
          .outputMode("update")
          .format("memory")
          .queryName(queryName)
          .trigger(Trigger.AvailableNow())
          .start()
        try q.processAllAvailable() finally q.stop()
      }
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    spark.table(queryName)
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        round(expr("max_by(sum_value, n)"), 4).as("sum_value"))
  }
}
