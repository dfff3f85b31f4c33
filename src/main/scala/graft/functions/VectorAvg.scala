package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: element-wise mean of float vectors (the centroid aggregate).
  *
  * Single-pass, mergeable buffer ((sum per dim, count)) — Spark runs the
  * reduce map-side before the shuffle, so aggregating a billion vectors
  * moves only (partitions x dim) doubles, unlike any collect-then-average
  * formulation. Used by IVF centroid maintenance and exposed as a general
  * `vector_avg` aggregate via `udaf(...)`.
  */
object VectorAvg extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
      var i = 0
      val n = math.min(sums.length, v.length)
      while (i < n) { sums(i) += v(i); i += 1 }
      (sums, b._2 + 1)
    }
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      val n = math.min(a._1.length, b._1.length)
      while (i < n) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Float] =
    if (r._2 == 0L) null
    else r._1.map(s => (s / r._2).toFloat)

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Array[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]()
}
