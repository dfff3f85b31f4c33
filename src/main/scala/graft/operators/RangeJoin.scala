package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join: left rows matched to right rows whose
  * `[startCol, endCol)` interval contains the left point. Spark plans the
  * naive formulation (`l.join(r, point >= start && point < end)`) as a
  * BroadcastNestedLoopJoin — O(n*m) and broadcast-bound. This operator uses
  * the bucketed-expansion trick: pick a bucket width, explode each right
  * interval into every bucket it overlaps, bucket the left points, equi-join
  * on the bucket (hash join, shuffles scale linearly), then re-apply the
  * exact predicate. Equivalent result for any width; cost is minimized when
  * width ~ typical interval length (each interval lands in O(1) buckets).
  */
object RangeJoin {

  /** `point` and the interval bounds must be numeric (cast timestamps to
    * epoch seconds first). */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Double,
                      extraJoinKeys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val l = left.withColumn("__bucket", floor(col(pointCol) / w).cast("long"))
    val r = right
      .withColumn("__b0", floor(col(startCol) / w).cast("long"))
      // floor(end/w) may include one bucket past an exclusive end that sits
      // exactly on a boundary — harmless, the exact predicate below filters
      // it. (An epsilon-subtraction "optimization" here silently DROPS the
      // last bucket when end is fractionally above a boundary.)
      .withColumn("__b1", floor(col(endCol) / w).cast("long"))
      .withColumn("__bucket", explode(sequence(col("__b0"), greatest(col("__b0"), col("__b1")))))
      .drop("__b0", "__b1")
    l.join(r, Seq("__bucket") ++ extraJoinKeys)
      .where(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
