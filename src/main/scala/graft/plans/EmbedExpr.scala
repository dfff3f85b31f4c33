package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Embedder

/** The embedder as a native Catalyst expression. Same kernel as
  * [[graft.functions.Embedder.embedUdf]] (bit-identical output — the spec
  * cross-checks), but it participates in whole-stage codegen instead of
  * breaking the span: the UDF wrapper costs a plan-wide codegen fence plus
  * per-row encoder traffic, which is pure overhead for a deterministic
  * scalar kernel. The generated code calls the shared static kernel — the
  * point of codegen here is staying inside the fused loop, not inlining
  * the hash math.
  *
  * Capability mirror of the reference's per-page embedding call (reference
  * modules/utilities.py:107-115,200); dim comes from the model registry
  * (modules/utilities.py:420-475).
  */
case class EmbedTextExpr(child: Expression, dim: Int, seed: Int)
    extends UnaryExpression {

  require(dim >= 1, s"dim must be >= 1, got $dim")

  override def prettyName: String = "embed_text"

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"expected string, got $t")
  }

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      Embedder.embed(input.asInstanceOf[UTF8String].toString, dim, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.functions.Embedder.embed($c.toString(), $dim, $seed));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EmbedExpr {
  def embedText(c: Column, dim: Int, seed: Int): Column =
    ColumnBridge.column(EmbedTextExpr(ColumnBridge.expression(c), dim, seed))
}
