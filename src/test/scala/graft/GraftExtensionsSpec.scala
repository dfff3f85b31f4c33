package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("custom expressions are callable from SQL after registration") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      .createOrReplaceTempView("emb_ext_test")
    val sims = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM emb_ext_test LIMIT 5")
      .as[Double].collect()
    assert(sims.forall(c => math.abs(c - 1.0) < 1e-9))
    val dots = spark.sql(
      """SELECT dot_product(embedding, embedding) AS d,
        |       squared_l2(embedding, embedding) AS z
        |FROM emb_ext_test LIMIT 5""".stripMargin)
      .as[(Double, Double)].collect()
    assert(dots.forall { case (d, z) => d > 0 && z == 0.0 })
  }

  test("SQL cosine_sim agrees with the Column API form") {
    GraftExtensions.register(spark)
    val df = spark.read.parquet(s"${TestSpark.sf}/embeddings.parquet").limit(50)
    df.createOrReplaceTempView("emb_ext_test2")
    val q0 = df.where($"vec_id" === 0).select($"embedding").as[Seq[Float]].head()
    val viaSql = spark.sql(
      s"SELECT vec_id, cosine_sim(embedding, array(${q0.mkString(",")})) AS c " +
        "FROM emb_ext_test2 ORDER BY vec_id")
      .as[(Long, Double)].collect().toSeq
    val viaCol = df.select($"vec_id",
      graft.functions.VectorFunctions.cosineSimilarity($"embedding",
        org.apache.spark.sql.functions.typedlit(q0)).as("c"))
      .orderBy($"vec_id").as[(Long, Double)].collect().toSeq
    assert(viaSql.map(_._1) === viaCol.map(_._1))
    // SQL array literals are double (parsed from the float's string repr),
    // so allow for float->double literal drift.
    viaSql.zip(viaCol).foreach { case ((_, a), (_, b)) => assert(math.abs(a - b) < 1e-6) }
  }
}
