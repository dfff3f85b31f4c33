package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** The conversion funnel as arbitrary stateful processing
  * (`transformWithState` v2, RocksDB-backed): per-user event history lives
  * in a ListState and the min-cascade funnel
  * (view → first later click → first later purchase) is RECOMPUTED from it
  * on every batch — so the streamed result equals the batch funnel BY
  * CONSTRUCTION, independent of how the stream is batched or how late rows
  * arrive (a late early view can lower t_view and re-open earlier clicks;
  * a greedy running state machine would miss that, the recompute cannot).
  *
  * State is per-user-history-sized — the honest cost of exact funnel
  * semantics under unbounded lateness; deployments bound it with the v2
  * API's native TTL (`TTLConfig`) at their lateness SLA, which degrades to
  * the same watermark-bounded approximation every streaming funnel makes.
  * Stage is MONOTONE in the history (more events can only lower mins /
  * add matches), so max-per-user over the update stream is the final
  * answer.
  */
object TwsFunnel {

  case class Ev(user_id: Long, ep: Long, event_type: String)
  case class HistEntry(ep: Long, et: String)
  case class UserStage(user_id: Long, stage: Int)

  class Processor extends StatefulProcessor[Long, Ev, UserStage] {
    @transient private var hist: ListState[HistEntry] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hist = getHandle.getListState[HistEntry]("hist",
        Encoders.product[HistEntry], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
                                 timerValues: TimerValues): Iterator[UserStage] = {
      rows.foreach(r => hist.appendValue(HistEntry(r.ep, r.event_type)))
      val h = hist.get().toArray
      def minAfter(et: String, after: Long): Option[Long] = {
        var m = Long.MaxValue
        h.foreach(e => if (e.et == et && e.ep > after && e.ep < m) m = e.ep)
        if (m == Long.MaxValue) None else Some(m)
      }
      val tView = minAfter("view", Long.MinValue)
      val tClick = tView.flatMap(t => minAfter("click", t))
      val tBuy = tClick.flatMap(t => minAfter("purchase", t))
      val stage = Seq(tView, tClick, tBuy).takeWhile(_.isDefined).length
      Iterator.single(UserStage(key, stage))
    }
  }

  /** Drive the processor over the finite fixture; fold the per-user update
    * stream to the batch funnel's (stage, n_users) shape. */
  def funnelOnce(spark: SparkSession, eventsPath: String,
                 queryName: String = "graft_tws_funnel"): DataFrame = {
    import spark.implicits._
    val prevProvider = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      StreamingOps.withStatePartitions(spark) {
        val updates = StreamingOps.readEvents(spark, eventsPath)
          .select(col("user_id"), unix_micros(col("ts")).as("ep"),
            col("event_type")).as[Ev]
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
    val perUser = spark.table(queryName)
      .groupBy(col("user_id")).agg(max(col("stage")).as("stage"))
    perUser.where(col("stage") >= 1).agg(count(lit(1)).as("n_users"))
      .select(lit("1_view").as("stage"), col("n_users"))
      .unionByName(perUser.where(col("stage") >= 2).agg(count(lit(1)).as("n_users"))
        .select(lit("2_click").as("stage"), col("n_users")))
      .unionByName(perUser.where(col("stage") >= 3).agg(count(lit(1)).as("n_users"))
        .select(lit("3_purchase").as("stage"), col("n_users")))
  }
}
