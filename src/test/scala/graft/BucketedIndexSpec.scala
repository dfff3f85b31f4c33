package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Evidence for the 100 TB co-location story: writing the index bucketed by
  * its join key lets repeated joins (index <-> scores, index <-> updates)
  * plan WITHOUT a shuffle on either side (no Exchange in the join subtree).
  */
class BucketedIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed-by-key tables join with zero Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
        .select($"doc_id", $"text")
      val scores = docs.select($"doc_id", length($"text").as("score"))
      docs.write.mode("overwrite").bucketBy(8, "doc_id")
        .sortBy("doc_id").saveAsTable("graft_docs_bucketed")
      scores.write.mode("overwrite").bucketBy(8, "doc_id")
        .sortBy("doc_id").saveAsTable("graft_scores_bucketed")

      val joined = spark.table("graft_docs_bucketed")
        .join(spark.table("graft_scores_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
      assert(joined.count() === docs.count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_docs_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_scores_bucketed")
    }
  }
}
