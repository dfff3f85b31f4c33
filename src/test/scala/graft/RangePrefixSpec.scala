package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RangePrefix ≡ the naive single-partition window, bit for bit — the
  * contract that lets every global rank / running total ship the two-level
  * scheme while its oracle stays on the naive formulation. */
class RangePrefixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = spark.range(0, 1000).toDF("id")
    // a skewed, duplicate-heavy key so cells are uneven and ties are real
    .withColumn("k", (col("id") * col("id") % 97).cast("double"))
    .withColumn("v", col("id") % 7 + 1)

  test("runningSum matches the naive global window (ascending)") {
    val naive = df.withColumn("cs", sum(col("v")).over(
      Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val fast = operators.RangePrefix.runningSum(
      operators.RangePrefix.withBucket(df, col("k")),
      col("v"), Seq(col("k"), col("id")), "cs")
    val a = naive.select("id", "cs").orderBy("id").collect().toSeq
    val b = fast.select("id", "cs").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("runningRank matches the naive global row_number (descending)") {
    val naive = df.withColumn("rk", row_number().over(
      Window.orderBy(col("k").desc, col("id"))).cast("long"))
    val fast = operators.RangePrefix.runningRank(
      operators.RangePrefix.withBucket(df, col("k"), descending = true),
      Seq(col("k").desc, col("id")), "rk")
    val a = naive.select("id", "rk").orderBy("id").collect().toSeq
    val b = fast.select("id", "rk").orderBy("id").collect().toSeq
    assert(a === b)
  }

  test("constant key degenerates to one cell and still matches") {
    val one = df.withColumn("k", lit(5.0))
    val naive = one.withColumn("cs", sum(col("v")).over(
      Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val fast = operators.RangePrefix.runningSum(
      operators.RangePrefix.withBucket(one, col("k")),
      col("v"), Seq(col("k"), col("id")), "cs")
    assert(naive.select("id", "cs").orderBy("id").collect().toSeq ===
      fast.select("id", "cs").orderBy("id").collect().toSeq)
  }

  test("no unpartitioned data-sized window in the physical plan") {
    val fast = operators.RangePrefix.runningSum(
      operators.RangePrefix.withBucket(df, col("k")),
      col("v"), Seq(col("k"), col("id")), "cs")
    fast.collect()
    val p = fast.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val specs = "windowspecdefinition\\(\\w+#\\d+".r.findAllIn(p).toList
    assert(specs.nonEmpty, p)
    assert(specs.forall(_.contains("bk#")), s"$specs\n$p")
  }
}
