package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded-buffer top-k aggregate over (score, id) pairs: keeps the k best
  * under (score desc, id asc) — the deterministic per-query ANN ranking.
  *
  * The scale point (the reason this exists instead of a
  * `row_number().over(partitionBy(queryId))` window): an Aggregator runs
  * with MAP-SIDE partial aggregation, so each partition reduces its scored
  * rows to at most k per query before any exchange — the shuffle carries
  * <= (partitions x k) rows per query. The window formulation shuffles the
  * ENTIRE scored expansion (corpus x queries rows for brute force) just to
  * discard all but k after the sort. Same output, orders-of-magnitude less
  * shuffle at corpus scale.
  *
  * The buffer is a best-first-sorted Seq of <= k elements (k is
  * interactive-search sized, so O(k log k) per insert is noise); ids are
  * numeric (callers cast) so the tie-break matches the SQL `ORDER BY score
  * DESC, id` oracles exactly.
  */
final case class TopKBy(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Seq[(Double, Long)] = Seq.empty

  override def reduce(buf: Seq[(Double, Long)], v: (Double, Long)): Seq[(Double, Long)] =
    if (buf.length < k) (buf :+ v).sortWith(better)
    else if (better(v, buf.last)) (buf.init :+ v).sortWith(better)
    else buf

  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()

  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}
