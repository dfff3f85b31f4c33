package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet(s"${TestSpark.sf}/documents.parquet").cache()

  test("hexThreshold maps rates to fixed-width hex; >=1 keeps everything") {
    assert(Sampling.hexThreshold(0.0) === "00000000")
    assert(Sampling.hexThreshold(0.2) === "33333333")
    assert(Sampling.hexThreshold(0.5) === "80000000")
    assert(Sampling.hexThreshold(1.0) === "g")
    assert(Sampling.hexThreshold(1.5) === "g")
  }

  test("bernoulli is deterministic, ~rate sized, and repartition-invariant") {
    val a = Sampling.bernoulli(docs, $"doc_id", 0.3, "t1")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs.repartition(7), $"doc_id", 0.3, "t1")
      .select($"doc_id").as[Long].collect().toSet
    assert(a === b)
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.3) < 0.15, s"kept ${a.size} of $n")
  }

  test("different salts draw (near-)independently") {
    val a = Sampling.bernoulli(docs, $"doc_id", 0.5, "saltA")
      .select($"doc_id").as[Long].collect().toSet
    val b = Sampling.bernoulli(docs, $"doc_id", 0.5, "saltB")
      .select($"doc_id").as[Long].collect().toSet
    assert(a !== b)
    // overlap should look like rate^2, not rate
    val overlap = (a intersect b).size.toDouble / docs.count()
    assert(overlap > 0.05 && overlap < 0.5, s"overlap $overlap")
  }

  test("split is a partition: disjoint, exhaustive, complements align") {
    val (keep, drop) = Sampling.split(docs, $"doc_id", 0.4, "t2")
    val k = keep.select($"doc_id").as[Long].collect().toSet
    val d = drop.select($"doc_id").as[Long].collect().toSet
    assert((k intersect d).isEmpty)
    assert(k.size + d.size === docs.count())
  }

  test("shuffled yields a deterministic total order with even partitions") {
    val n = docs.count()
    def order(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      // partition-ordered read: collect per partition in partition index
      // order — exactly what a file-by-file read of the written output sees
      val parts = Sampling.shuffled(df, $"doc_id", "ord", 8)
        .select($"doc_id").as[Long]
        .rdd.glom().collect()
      parts.flatten.toSeq
    }
    val a = order(docs)
    val b = order(docs.repartition(13))
    assert(a === b, "shuffle order must be input-partitioning-invariant")
    assert(a.size.toLong === n)
    assert(a !== a.sorted, "order must actually be shuffled, not id order")
    // range partitioning on a uniform hash key -> roughly even partitions
    val sizes = Sampling.shuffled(docs, $"doc_id", "ord", 8)
      .rdd.glom().collect().map(_.length)
    assert(sizes.max < 2.5 * (n.toDouble / 8), s"skewed partitions: ${sizes.mkString(",")}")
  }

  test("splitByGroup keeps every row of a group on one side") {
    val pages = graft.operators.Chunker.chunk(
      docs.select($"doc_id", $"text"), "text", 32)
    val (train, held) = Sampling.splitByGroup(pages, $"doc_id", 0.3, "g")
    val trainDocs = train.select($"doc_id").distinct().as[Long].collect().toSet
    val heldDocs = held.select($"doc_id").distinct().as[Long].collect().toSet
    assert((trainDocs intersect heldDocs).isEmpty,
      "a document's pages leaked across the split")
    assert(train.count() + held.count() === pages.count())
  }

  test("stratified applies per-stratum rates; default rate drops unknowns") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.0)
    val out = Sampling.stratified(docs, $"doc_id", $"source", rates, "t3")
      .groupBy($"source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(out("src0") === totals("src0"))      // rate 1.0 keeps all
    assert(!out.contains("src1"))               // rate 0.0 keeps none
    assert(!out.contains("src5"))               // absent stratum -> default 0.0
  }

  test("capPerGroup keeps at most n per group, deterministically, monotone in n") {
    val cap5 = Sampling.capPerGroup(docs, $"doc_id", $"source", 5, "c")
    val sizes = cap5.groupBy($"source").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    totals.foreach { case (src, tot) =>
      assert(sizes.getOrElse(src, 0L) === math.min(5L, tot), s"group $src")
    }
    // kept rows are original rows (subset, not a transformation)
    assert(cap5.columns.toSeq === docs.columns.toSeq)
    val ids5 = cap5.select($"doc_id").as[Long].collect().toSet
    // determinism + partitioning invariance
    val again = Sampling.capPerGroup(docs.repartition(7), $"doc_id", $"source", 5, "c")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids5 === again)
    // monotone: raising the cap only ADDS rows (stable under re-quota)
    val ids9 = Sampling.capPerGroup(docs, $"doc_id", $"source", 9, "c")
      .select($"doc_id").as[Long].collect().toSet
    assert(ids5.subsetOf(ids9))
  }

  test("mixture: floor copies are certain, fractional copy is a hash draw, " +
       "copy_idx is dense from 1, and realized multiplicity is deterministic") {
    val weights = Map("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0)
    val out = Sampling.mixture(docs, $"doc_id", $"source", weights, "mx")
    val perDoc = out.groupBy($"doc_id", $"source")
      .agg(count(lit(1)).as("n"), max($"copy_idx").as("mx"), min($"copy_idx").as("mn"))
      .as[(Long, String, Long, Long, Long)].collect()
    perDoc.foreach { case (_, src, n, mx, mn) =>
      assert(mn === 1L && mx === n, "copy_idx must be dense 1..n")
      src match {
        case "src0" => assert(n === 2L || n === 3L)
        case "src1" => assert(n === 1L)         // the 0-copy rows are absent
        case "src2" => fail("weight 0.0 stratum must emit no rows")
        case _      => assert(n === 1L)         // defaultWeight 1.0 exactly
      }
    }
    // expected multiplicity ~ w per stratum for the fractional weights
    val bySrc = out.groupBy($"source").count().as[(String, Long)].collect().toMap
    val tot = docs.groupBy($"source").count().as[(String, Long)].collect().toMap
    assert(math.abs(bySrc("src0").toDouble / tot("src0") - 2.5) < 0.35)
    assert(math.abs(bySrc("src1").toDouble / tot("src1") - 0.5) < 0.35)
    // determinism + repartition invariance of the realized copy set
    val a = out.select($"doc_id", $"copy_idx").as[(Long, Long)].collect().toSet
    val b = Sampling.mixture(docs.repartition(7), $"doc_id", $"source", weights, "mx")
      .select($"doc_id", $"copy_idx").as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("temperatureWeights: size-preserving, pulls toward uniform, identity at alpha=1") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val counts = docs.groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    val w = Sampling.temperatureWeights(docs, $"lang", alpha = 0.5)
    assert(w.keySet === counts.keySet)
    // expected corpus size unchanged: sum p*w == 1 (up to the round(6) grid)
    val mass = counts.map { case (s, c) => c / total * w(s) }.sum
    assert(math.abs(mass - 1.0) < 1e-4, s"mass $mass")
    // dominant stratum downsampled, every rarer one upsampled
    val (maxLang, _) = counts.maxBy(_._2)
    assert(w(maxLang) < 1.0)
    counts.collect { case (s, c) if s != maxLang => assert(w(s) > 1.0, s) }
    // alpha=1: natural distribution, all weights exactly 1
    val w1 = Sampling.temperatureWeights(docs, $"lang", alpha = 1.0)
    w1.values.foreach(v => assert(math.abs(v - 1.0) < 1e-6))
    // rebalanced mixture moves realized shares toward uniform
    val out = Sampling.mixture(docs, $"doc_id", $"lang", w, "tw")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val natMax = counts(maxLang) / total
    val rebMax = out(maxLang).toDouble / out.values.sum
    assert(rebMax < natMax, s"dominant share must shrink: $natMax -> $rebMax")
  }

  test("weighted A-ES sample overrepresents heavy rows; deterministic across runs") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val corpusMean = docs.agg(avg($"n_chars")).as[Double].head()
    def run() = SparkEntry.queries("sample_weighted_n")(spark, TestSpark.sf)
      .select($"doc_id", $"n_chars").as[(Long, Long)].collect()
    val s1 = run()
    assert(s1.length == 100)
    val sampleMean = s1.map(_._2).sum.toDouble / s1.length
    // weight = n_chars: the weighted sample's mean length must exceed the
    // corpus mean by a clear margin (uniform sampling would match it)
    assert(sampleMean > corpusMean * 1.1,
      s"weighted sample not weight-biased: $sampleMean vs corpus $corpusMean")
    assert(run().toSeq == s1.toSeq, "A-ES draw must be deterministic")
  }

  test("cvFold: group-atomic (one fold per group), all folds populated, deterministic") {
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val withFold = docs.withColumn("fold", Sampling.cvFold($"source", k = 5, salt = "cv"))
    // leakage check: a source never straddles folds
    val perSource = withFold.groupBy($"source")
      .agg(org.apache.spark.sql.functions.countDistinct($"fold").as("nf"))
      .as[(String, Long)].collect()
    assert(perSource.forall(_._2 == 1L))
    val folds = withFold.select($"fold").distinct().as[Long].collect().toSet
    assert(folds.subsetOf((0L until 5L).toSet) && folds.size >= 3,
      s"fold population degenerate: $folds") // 20 sources over 5 folds
    assert(intercept[IllegalArgumentException](Sampling.cvFold($"source", 1, "s"))
      .getMessage.contains("k must be >= 2"))
  }
}
