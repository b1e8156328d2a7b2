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

  /** |a ∩ b| for SORTED distinct long arrays — two-pointer merge, zero
    * allocation. `array_intersect` on collect_list output falls off
    * Spark's specialized hash-set path and boxes every element (measured
    * 60–155 s of CPU + tens of seconds of GC for 409k confirms on the
    * sf0.1 corpus); this kernel does the same confirms in well under a
    * second.
    */
  def sortedInterCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** `graft_sinter(array<bigint>, array<bigint>) → bigint` — intersection
  * size of two SORTED distinct long arrays; codegen'd, null-safe.
  */
case class SortedInterCount(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_sinter"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sortedInterCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.sortedInterCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
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
