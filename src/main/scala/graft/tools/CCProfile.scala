package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the dedup_clusters pipeline: prints wall time of each
  * phase (pair generation, CC rounds) to isolate fixed job overhead. */
object CCProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprofile] $label%-30s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // warmup parquet+codegen
    docs.count()

    val pairs = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.30)
    val p = time("pairs count") { pairs.count() }
    println(s"[ccprofile] pairs = $p")

    val pairs2 = graft.operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, threshold = 0.30)
    time("cc total (incl pair regen)") {
      graft.operators.Dedup.connectedComponents(pairs2).count()
    }
    spark.stop()
  }
}
