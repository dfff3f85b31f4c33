package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-suite structural sweep: PLAN (without executing) every registered
  * batch query and assert no un-broadcast cartesian product survives
  * anywhere. Individual plan properties are pinned per-operator in
  * PlanPropertiesSpec; this sweep is the backstop that a NEW query can't
  * quietly introduce the one shape that never survives 100x scale.
  *
  * Excluded by name: `streaming_*` (constructing them RUNS a stream),
  * store/pipeline/e2e queries that materialize scratch state as a side
  * effect of planning, and the k-means/PQ/BPE families whose registration
  * executes bounded driver-paced training rounds. Those are all covered by
  * their own executed pins.
  */
class PlanSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val excludePrefixes = Seq("streaming_", "store_", "pipeline_",
    "vector_search", "embed_", "source_pdf", "source_docx", "source_binary",
    "source_doc_quarantine", "source_csv", "source_json", "source_orc",
    "source_schema", "multimodal_", "ann_graph", "ann_ivf", "ann_pq",
    "bpe_", "embedding_kmeans", "embedding_power", "dedup_semantic",
    "q18_salted")

  test("no registered batch query plans a CartesianProduct") {
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => excludePrefixes.exists(n.startsWith))
    assert(names.size > 100, s"sweep unexpectedly small: ${names.size}")
    val offenders = names.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, TestSpark.sf)
        val p = df.queryExecution.executedPlan.toString
        if (p.contains("CartesianProduct")) Some(name) else None
      } catch {
        case e: Throwable => Some(s"$name (planning failed: ${e.getMessage})")
      }
    }
    assert(offenders.isEmpty, s"cartesian or failure in: ${offenders.mkString(", ")}")
  }
}
