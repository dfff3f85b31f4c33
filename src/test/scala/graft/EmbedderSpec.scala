package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Embedder

class EmbedderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("deterministic across calls, dim from registry") {
    val a = Embedder.embed("the quick brown fox", 64, 42)
    val b = Embedder.embed("the quick brown fox", 64, 42)
    assert(a.toSeq === b.toSeq)
    assert(a.length === 64)
  }

  test("L2-normalized for non-empty text") {
    val v = Embedder.embed("hello world foo bar", 64, 42)
    val n = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-6)
  }

  test("empty / non-word text embeds to zero vector") {
    assert(Embedder.embed("", 16, 42).forall(_ == 0f))
    assert(Embedder.embed("!!! ...", 16, 42).forall(_ == 0f))
  }

  test("bag-of-words: word order does not change the embedding") {
    val a = Embedder.embed("alpha beta gamma", 64, 42)
    val b = Embedder.embed("gamma alpha beta", 64, 42)
    assert(a.toSeq === b.toSeq)
  }

  test("different seeds give different embeddings") {
    val a = Embedder.embed("alpha beta gamma", 64, 42)
    val b = Embedder.embed("alpha beta gamma", 64, 43)
    assert(a.toSeq !== b.toSeq)
  }

  test("identical token multisets embed identically; similar texts are cosine-closer") {
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val d = x.zip(y).map { case (a, b) => a.toDouble * b }.sum
      val nx = math.sqrt(x.map(a => a.toDouble * a).sum)
      val ny = math.sqrt(y.map(a => a.toDouble * a).sum)
      d / (nx * ny)
    }
    val base = Embedder.embed("spark scans the table fast", 64, 42)
    val near = Embedder.embed("spark scans the table slowly", 64, 42)
    val far = Embedder.embed("entirely unrelated words appear here", 64, 42)
    assert(cos(base, near) > cos(base, far))
  }

  test("codegen expression is bit-identical to the UDF and to the kernel") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq("the quick brown fox", "", "!!! ...", "alpha beta gamma",
      "Ünïcode tëxt with  spaces\nand lines", "x")
    val df = texts.toDF("t")
    val viaExpr = df.select(graft.plans.EmbedExpr.embedText(col("t"), 32, 42))
      .as[Array[Float]].collect()
    val viaUdf = df.select(Embedder.embedUdf(32, 42)(col("t")))
      .as[Array[Float]].collect()
    texts.indices.foreach { i =>
      assert(viaExpr(i).toSeq === viaUdf(i).toSeq, s"text=${texts(i)}")
      assert(viaExpr(i).toSeq === Embedder.embed(texts(i), 32, 42).toSeq)
    }
  }

  test("embed_text is callable from SQL and the plan stays in codegen") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a b c", 1)).toDF("t", "k").createOrReplaceTempView("embed_probe")
    val df = spark.sql("SELECT embed_text(t, 16) AS v, embed_text(t, 16, 7) AS v7 FROM embed_probe")
    val row = df.as[(Array[Float], Array[Float])].collect().head
    assert(row._1.toSeq === Embedder.embed("a b c", 16, Embedder.DefaultSeed).toSeq)
    assert(row._2.toSeq === Embedder.embed("a b c", 16, 7).toSeq)
    // codegen-span assertion needs a real scan (a literal table constant-folds
    // to LocalTableScan — itself proof the expression evaluates natively)
    import org.apache.spark.sql.functions.col
    val onParquet = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
      .select(graft.plans.EmbedExpr.embedText(col("text"), 16, 42).as("v"))
    // whole-stage-codegen'd operators print with the "*(n)" marker
    val physical = onParquet.queryExecution.executedPlan.toString
    assert(physical.contains("*(1) Project [embed_text"), physical)
  }

  test("property: embedding norm is 0 or ~1 over random strings") {
    val gen = Gen.asciiPrintableStr
    (0 until 200).foreach { i =>
      val s = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val v = Embedder.embed(s, 32, 42)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(n < 1e-9 || math.abs(n - 1.0) < 1e-5, s"input=$s")
    }
  }

  test("hashedComponents: sparse rows form unit-norm vectors, deterministic across runs") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet")
    val a = Embedder.hashedComponents(docs, "text", "doc_id", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val b = Embedder.hashedComponents(docs, "text", "doc_id", dim = 64)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(a.toSet === b.toSet, "must be deterministic")
    assert(a.forall { case (_, bkt, _) => bkt >= 0 && bkt < 64 })
    val norms = a.groupBy(_._1).view.mapValues(_.map(t => t._3 * t._3).sum)
    norms.foreach { case (id, ss) =>
      assert(math.abs(ss - 1.0) < 1e-2, s"doc $id norm^2 = $ss") // 4-decimal rounding slack
    }
  }

  test("portable dense twin: embedPortableCol == embedPortable (driver) == " +
      "hashedComponents (sparse), element for element") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"${TestSpark.sf}/documents.parquet").limit(30)
    val dense = docs
      .select(col("doc_id"), Embedder.embedPortableCol(col("text"), 64).as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    // distributed column form == driver scalar form, bit for bit (the
    // store embeds documents with the former and prompts with the latter;
    // any drift would put them in different spaces)
    texts.foreach { case (id, t) =>
      assert(dense(id).toSeq === Embedder.embedPortable(t, 64).toSeq, s"doc $id")
    }
    // dense nonzero slots == the sparse hashedComponents rows
    val sparse = Embedder.hashedComponents(docs, "text", "doc_id", dim = 64)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getDouble(2))).toMap
    dense.foreach { case (id, v) =>
      v.zipWithIndex.foreach { case (x, i) =>
        val want = sparse.getOrElse((id, i), 0.0).toFloat
        assert(x === want, s"doc $id bucket $i: dense $x vs sparse $want")
      }
    }
  }
}
