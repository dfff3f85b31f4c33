package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection helper: dumps `explain("formatted")` for selected queries
  * so scan pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be reviewed. Usage:
  *   runMain graft.Explain <sfDir> [queryName ...]
  * With SPARK_GRAFT_EXPLAIN_OUT=<dir>[:<suffix>] set, each query's formatted
  * plan is ALSO written to <dir>/<query><suffix>.txt (the plans/r12 artifact
  * convention: suffix `_before` / `_after`).
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
    val out = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT").map { v =>
      val parts = v.split(":", 2)
      (parts(0), if (parts.length > 1) parts(1) else "")
    }
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      out.foreach { case (dir, suffix) =>
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val p = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(p)
        java.nio.file.Files.write(p.resolve(s"$n$suffix.txt"),
          plan.getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
