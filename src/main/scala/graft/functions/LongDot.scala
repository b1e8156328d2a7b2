package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer dot-product kernels for quantized embedding math.
  *
  * Vectors are 2^20-quantized BIGINT arrays (see
  * `graft.queries.Similarity`): exact long arithmetic that any engine
  * reproduces bit-identically. A higher-order
  * `aggregate(zip_with(...))` fold computes the same thing but runs
  * interpreted (no whole-stage codegen) — ~10× slower in the pairwise
  * hot path of kNN / ANN / near-dup joins. This static kernel is
  * inlined into the generated code instead.
  */
object VectorMath {
  /** Σ a(i)·b(i) over min length; exact for |a(i)| ≤ 2^20-ish scales
    * (64 · 2^40 « 2^63, no overflow).
    */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = Math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
}

/** `graft_dotl(array<bigint>, array<bigint>) → bigint` — codegen'd
  * (static call inlined into the whole-stage loop), null-safe.
  */
case class LongDot(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_dotl"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dotLong($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDot =
    copy(left = newLeft, right = newRight)
}
