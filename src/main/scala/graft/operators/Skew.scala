package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. AQE's skew-join split covers
  * most cases at runtime; explicit salting remains the deterministic tool
  * when one build-side key dominates so heavily that even split partitions
  * spill (the classic hot-tenant / hot-document key at 100 TB).
  *
  * `saltedJoin(left, right, key, salt)` is equivalent to
  * `left.join(right, key)` (inner) for any salt >= 1:
  * the left (large, skewed) side gets a uniform random-free salt derived
  * from a stable hash of its row position — here a deterministic
  * `pmod(hash(all left columns), salt)` — and the right side is replicated
  * `salt` times, so each hot key's rows fan out over `salt` reducers.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    // salt by row POSITION (monotonic id), not row content: identical hot-key
    // rows must spread over reducers, and content-hashing would send them
    // all to the same one.
    val l = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
