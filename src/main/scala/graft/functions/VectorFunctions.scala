package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` columns, composed from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`) so
  * the whole expression stays inside whole-stage codegen — no UDF, no
  * serialization boundary.
  *
  * All arithmetic is promoted to Double before accumulation: the stored
  * vectors are float32 (reference `modules/utilities.py:274,301,377`) but
  * accumulating in float drifts vs any oracle computing in double.
  */
object VectorFunctions {

  private def toDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-order dot product. Delegates to the codegen'd Catalyst
    * expression ([[graft.plans.DotProductExpr]]); [[dotProductHof]] is the
    * equivalent built-in composition (identical double math, interpreted
    * lambdas — kept for cross-checking). */
  def dotProduct(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.dotProduct(a, b)

  def dotProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(toDouble(a), toDouble(b), _ * _), lit(0.0), _ + _)

  def l2Norm(a: Column): Column =
    sqrt(aggregate(toDouble(a), lit(0.0), (acc, x) => acc + x * x))

  /** Cosine similarity; 0.0 when either vector has zero norm (the reference's
    * HNSW/COSINE metric never indexes zero vectors, so this is a safe total
    * extension). Reference metric: `modules/utilities.py:276`.
    * Codegen'd ([[graft.plans.CosineSimilarityExpr]]); same accumulation
    * order as [[cosineSimilarityHof]], so results are bit-identical. */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.plans.VectorExpressions.cosineSim(a, b)

  def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProductHof(a, b) / denom)
  }

  /** Cosine distance = 1 - similarity; the reference converts the other way
    * at `modules/utilities.py:394`. */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosineSimilarity(a, b)

  /** L2-normalize to unit length, output float32 (index storage dtype). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, a)
      .otherwise(transform(a, x => (x.cast("double") / n).cast("float")))
  }

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(graft.plans.VectorExpressions.squaredL2(a, b))

  // ---------------- SQ8 scalar quantization ----------------
  // The 4x storage shrink for a large vector store: per-vector symmetric
  // int8 codes, q_i = floor(x_i * scale + 0.5) clamped to [-127, 127] with
  // scale = 127 / max|x|. floor(.. + 0.5) instead of round(): half-up on
  // the raw double is identical in Spark and ANSI SQL, while round()'s
  // half-even/half-up behavior is engine-specific. A zero vector gets
  // scale 0 and all-zero codes (dequantizes to the zero vector).

  /** Per-vector quantization scale (double; 0.0 for the zero vector). */
  def sq8Scale(a: Column): Column = {
    val maxAbs = aggregate(toDouble(a), lit(0.0), (acc, x) => greatest(acc, abs(x)))
    when(maxAbs === 0.0, lit(0.0)).otherwise(lit(127.0) / maxAbs)
  }

  /** int8 codes (as array<int> for portability; values fit in a byte). */
  def sq8Quantize(a: Column, scale: Column): Column =
    when(scale === 0.0, transform(a, _ => lit(0)))
      .otherwise(transform(toDouble(a), x =>
        greatest(lit(-127), least(lit(127), floor(x * scale + lit(0.5)))).cast("int")))

  /** Reconstruct float32 vectors from codes; error is bounded by
    * 0.5 / scale per element. */
  def sq8Dequantize(q: Column, scale: Column): Column =
    when(scale === 0.0, transform(q, _ => lit(0.0f)))
      .otherwise(transform(q, c => (c.cast("double") / scale).cast("float")))
}
