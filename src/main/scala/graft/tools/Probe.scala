package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, RangeJoin, SimilaritySearch}

/** Ad-hoc profiling/evidence mains (not part of the driver contract).
  * `runMain graft.tools.Probe minhash <sfDir>`   — stage-by-stage timings
  * `runMain graft.tools.Probe recall <sfDir>`    — ANN recall@10 sweep
  */
object Probe {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("minhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    mode match {
      case "minhash" =>
        val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        time("warmup count")(docs.count())
        val sh = docs.repartition(cpus.toInt)
          .select(col("doc_id"), Dedup.shingles(col("text"), 2).as("sh"))
          .where(size(col("sh")) > 0)
        time("shingles materialize")(sh.write.mode("overwrite").format("noop").save())
        val exploded = sh.select(col("doc_id"), explode(col("sh")).as("s"))
        time("explode")(exploded.write.mode("overwrite").format("noop").save())
        val minAggs = (0 until 12).map(i =>
          min(md5(concat(col("s"), lit("#" + i)))).as(s"m$i"))
        val sig = exploded.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
        time("signatures")(sig.write.mode("overwrite").format("noop").save())
        time("full operator")(
          Dedup.minhashNearDupPairs(docs, "text", "doc_id", 12, 4, 0.30).count())

      case "edges" =>
        // review-fix drive: empty-index search + range-join boundary epsilon
        val store = new graft.GraftVectorStore(spark,
          java.nio.file.Files.createTempDirectory("probe_idx").toString + "/idx")
        store.createIndex()
        println("EMPTY-SEARCH-ROWS=" + store.search("fast spark scan", "t", 5).count())
        val pts = Seq((1L, 2.0)).toDF("id", "v")
        val iv = Seq((0.0, 2.0000000005, "band")).toDF("lo", "hi", "b")
        println("RANGE-EDGE-ROWS=" + RangeJoin.pointInInterval(
          pts, "v", iv, "lo", "hi", 1.0).count())

      case "recall" =>
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
        emb.count()
        val qs = emb.where(col("vec_id") < 50)
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")).cache()
        def hits(df: DataFrame): Set[(Long, Long)] =
          df.select(col("q_id"), col("vec_id")).as[(Long, Long)].collect().toSet
        val exact = hits(SimilaritySearch.bruteForceTopK(emb, qs, 10))
        println("config,recall_at_10,candidates_frac")
        for (bits <- Seq(2, 4, 6, 8); mp <- Seq(0, 1)) {
          val approx = hits(SimilaritySearch.lshTopK(emb, qs, 10, bits, 64, 42L, mp))
          val frac = (1.0 + (if (mp >= 1) bits else 0)) / math.pow(2, bits)
          println(f"lsh bits=$bits mp=$mp,${exact.intersect(approx).size.toDouble / exact.size}%.3f,$frac%.3f")
        }
        for (nc <- Seq(8, 16); np <- Seq(1, 2, 4)) {
          val approx = hits(SimilaritySearch.ivfTopK(emb, qs, 10, nc, np))
          println(f"ivf c=$nc probe=$np,${exact.intersect(approx).size.toDouble / exact.size}%.3f,${np.toDouble / nc}%.3f")
        }
    }
    spark.stop()
  }
}
