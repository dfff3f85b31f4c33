package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: dumps `explain("formatted")` for selected queries
  * so scan pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be reviewed. Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q1_agg", "q2_filter_sum", "q3_join_broadcast", "q6_topk_orders",
        "knn_topk", "dedup_minhash_lsh", "events_asof_orders")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
