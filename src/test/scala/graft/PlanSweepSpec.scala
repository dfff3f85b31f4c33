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
    "q18_salted", "sample_facility") // facility-location registration runs
                                     // its driver-paced greedy rounds

  // Every unpartitioned WindowExec in the battery, audited: each entry
  // names the query and the reason its global window frame is SMALL BY
  // CONSTRUCTION (never corpus-proportional). The sweep asserts exact
  // set equality, so a new query cannot quietly add a single-partition
  // corpus window (the one-reducer sort that never survives 100x), and a
  // de-windowed query must be removed from this list (no stale excuses).
  private val auditedGlobalWindows: Set[String] = Set(
    "knn_source_capped",   // rank over a post-limit(10) 10-row frame
    "dsir_importance",     // rank over a post-limit(100) 100-row frame
    "stats_bh_fdr",        // step-up rank over the hypothesis family
                           // (event_type x weekday cells — config-sized)
    "corpus_gini",         // Lorenz rank over the per-source totals table
    "events_kaplan_meier", // product-limit over distinct day-durations
                           // (bounded by the observation span in days)
    "compact_bin_packing", // first-fit over a file-compaction manifest
                           // (files-per-partition config scale)
    "dq_value_drift_ks",   // cell-offsets prefix over the CONSTANT 64-row
                           // grid-totals table (hand-rolled RangePrefix
                           // predecessor; data-sized side is bk-keyed)
    "pack_sequences",      // bucket-offsets prefix over the length-bucket
                           // totals (max_doc_tokens/50 rows — bounded by
                           // document length, not corpus size)
    "nb_conformal_sampled", // order statistic over the fixed <=128-row
                           // md5-drawn calibration sample (constant by
                           // construction — the split-conformal shape)
    "events_ab_sequential" // mSPRT cumulative/running-max over the DAY
                           // SPINE (bounded by the observation span —
                           // the kaplan-meier class)
  )

  test("unpartitioned WindowExec only where the frame is audited small") {
    import org.apache.spark.sql.execution.window.WindowExec
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => excludePrefixes.exists(n.startsWith))
    val offenders = names.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, TestSpark.sf)
        val globals = df.queryExecution.sparkPlan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }
        if (globals.nonEmpty) Some(name) else None
      } catch { case _: Throwable => None } // planning failures → cartesian sweep
    }.toSet
    assert(offenders == auditedGlobalWindows,
      s"unaudited global windows: ${(offenders -- auditedGlobalWindows).toSeq.sorted.mkString(", ")}; " +
      s"stale audit entries: ${(auditedGlobalWindows -- offenders).toSeq.sorted.mkString(", ")}")
  }

  // The driver's correctness gate hashes a canonical serialization of each
  // result; Spark-parquet decimals and DuckDB decimals canonicalize
  // DIFFERENTLY, so a raw DecimalType output column can pass the local
  // float64-coercing comparator yet fail the driver's hash (r8's one red
  // row, stats_kendall_tau). DECIMAL(38,0) is still the right INTERNAL
  // carrier for exact >LONG integers — but it must leave a query as its
  // canonical digit STRING (the profile_decimal_money pattern). This sweep
  // makes that structural: no registered query's OUTPUT schema may contain
  // a DecimalType anywhere (top level or nested).
  test("no registered query emits a DecimalType output column") {
    import org.apache.spark.sql.types._
    def hasDecimal(dt: DataType): Boolean = dt match {
      case _: DecimalType    => true
      case s: StructType     => s.fields.exists(f => hasDecimal(f.dataType))
      case a: ArrayType      => hasDecimal(a.elementType)
      case m: MapType        => hasDecimal(m.keyType) || hasDecimal(m.valueType)
      case _                 => false
    }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(n => excludePrefixes.exists(n.startsWith))
    val offenders = names.flatMap { name =>
      try {
        val df = SparkEntry.queries(name)(spark, TestSpark.sf)
        if (df.schema.fields.exists(f => hasDecimal(f.dataType))) Some(name)
        else None
      } catch { case _: Throwable => None } // covered by the cartesian sweep
    }
    assert(offenders.isEmpty,
      s"DecimalType escapes to output schema in: ${offenders.mkString(", ")} " +
      "(emit exact integers past LONG as cast('string') on both engines)")
  }

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
