package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Gauss error function — the one unary math function the reference
  * exposes (`/root/reference/baloo/functions/unary.py:4-83`, Weld `erf`)
  * that `org.apache.spark.sql.functions` lacks.
  *
  * A native Catalyst `UnaryExpression` WITH codegen (not a Scala udf):
  * the generated code is a static call inlined into the whole-stage
  * loop — no boxing, no serialization, no codegen fence.
  */
object GraftMath {
  /** Abramowitz & Stegun 7.1.26 rational approximation (|ε| ≤ 1.5e−7).
    * The exact operation order here is mirrored in oracle SQL — keep in
    * sync with [[graft.queries.UnaryMath]].
    */
  def erf(x: Double): Double = {
    val sign = if (x < 0.0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
      - 0.284496736) * t + 0.254829592) * t
    sign * (1.0 - poly * math.exp(-ax * ax))
  }
}

case class Erf(child: Expression) extends UnaryExpression {
  override def prettyName: String = "graft_erf"
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any =
    GraftMath.erf(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftMath.erf($c)")

  override protected def withNewChildInternal(newChild: Expression): Erf =
    copy(child = newChild)
}
