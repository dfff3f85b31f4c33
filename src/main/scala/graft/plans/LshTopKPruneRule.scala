package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.operators.SimilaritySearch

/** Optimizer rule: rewrite an exact cosine top-k over an LSH-bucketed index
  * into a bucket-pruned scan — the HNSW-recall-tradeoff analogue promised in
  * SURVEY.md §4/§7.4, expressed as a Catalyst rewrite instead of a server-side
  * graph index.
  *
  * Matches `ORDER BY cosine_sim(vec, <literal query vector>) DESC LIMIT k`
  * (directly or through one Project alias) over a plan whose output carries
  * the conventional `__lsh_bucket` column (written at index-build time with
  * [[SimilaritySearch.lshBucket]]), and inserts
  * `WHERE __lsh_bucket IN (<query bucket + hamming-1 probes>)` beneath the
  * sort. At 1000 executors this turns the full-corpus scan into
  * (1 + nBits)/2^nBits of the files (bucket can be a partition column),
  * trading recall exactly like the reference's HNSW does
  * (reference `modules/utilities.py:272-278`).
  *
  * Opt-in and explicit, because the rewrite is approximate: fires only when
  * `spark.graft.lsh.autoPrune=true`, with the plane geometry read from
  * `spark.graft.lsh.{bits,dim,seed}` — the same parameters the bucket column
  * was built with.
  */
object LshTopKPruneRule extends Rule[LogicalPlan] {

  val BucketCol = "__lsh_bucket"

  private def confB(key: String, default: String): String =
    conf.getConfString(key, default)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (confB("spark.graft.lsh.autoPrune", "false") != "true") return plan
    val bits = confB("spark.graft.lsh.bits", "8").toInt
    val dim = confB("spark.graft.lsh.dim", "64").toInt
    val seed = confB("spark.graft.lsh.seed", "42").toLong
    // recall/cost dial (hamming radius of the probe set), same semantics as
    // GraftVectorStore.search(probeDepth = ...)
    val depth = confB("spark.graft.lsh.probeDepth", "1").toInt

    plan.transform {
      case gl @ GlobalLimit(_, ll @ LocalLimit(_,
          sort @ Sort(Seq(SortOrder(key, Descending, _, _), _*), true, child, _)))
          if child.output.exists(_.name == BucketCol) =>
        queryVectorOf(key, child) match {
          case Some(qvec) if qvec.length == dim =>
            val bucketAttr = child.output.find(_.name == BucketCol).get
            val probes = probeBuckets(qvec, bits, dim, seed, depth)
            val filtered = Filter(
              In(bucketAttr, probes.map(Literal(_)).toSeq), child)
            gl.copy(child = ll.copy(child = sort.copy(child = filtered)))
          case _ => gl
        }
    }
  }

  /** Extract the literal query vector from the sort key: either the cosine
    * expression itself, or an attribute aliased to one in the child Project. */
  private def queryVectorOf(key: Expression, child: LogicalPlan): Option[Array[Float]] =
    key match {
      case c: CosineSimilarityExpr => literalVector(c)
      case a: AttributeReference =>
        child.collectFirst {
          case p: Project => p.projectList.collectFirst {
            case al @ Alias(c: CosineSimilarityExpr, _) if al.exprId == a.exprId =>
              literalVector(c)
          }.flatten
        }.flatten
      case _ => None
    }

  private def literalVector(c: CosineSimilarityExpr): Option[Array[Float]] =
    Seq(c.right, c.left).collectFirst {
      case l: Literal => floatsOf(l)
      case Cast(l: Literal, _, _, _) => floatsOf(l)
    }.flatten

  private def floatsOf(l: Literal): Option[Array[Float]] = (l.value, l.dataType) match {
    case (a: ArrayData, ArrayType(FloatType, _)) => Some(a.toFloatArray())
    case (a: ArrayData, ArrayType(DoubleType, _)) => Some(a.toDoubleArray().map(_.toFloat))
    case _ => None
  }

  /** Query bucket + all buckets within hamming distance `depth` (multi-probe).
    * depth is THE recall/cost dial of the bucketed store: probe count is
    * sum_{d<=depth} C(bits, d), so depth 1 reads (1+bits)/2^bits of the
    * tenant's files, depth 2 adds bits*(bits-1)/2 more buckets. The sort
    * order is base bucket first, then increasing flip combinations — stable
    * for tests and partition-filter literals. */
  def probeBuckets(q: Array[Float], bits: Int, dim: Int, seed: Long,
                   depth: Int = 1): Array[String] = {
    require(depth >= 0, s"depth must be >= 0, got $depth")
    val planes = SimilaritySearch.hyperplanes(bits, dim, seed)
    val base = planes.map { p =>
      var dp = 0.0
      var i = 0
      val n = math.min(p.length, q.length)
      while (i < n) { dp += p(i).toDouble * q(i); i += 1 }
      if (dp >= 0) '1' else '0'
    }
    (0 to math.min(depth, bits)).iterator.flatMap { d =>
      (0 until bits).combinations(d).map { flips =>
        val c = base.clone()
        flips.foreach(i => c(i) = if (c(i) == '1') '0' else '1')
        new String(c)
      }
    }.toArray
  }
}
