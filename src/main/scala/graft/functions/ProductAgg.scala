package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** `prod` aggregate — the one reduction the reference supports that Spark
  * has no builtin for (reference: Weld `merger[T, *]`,
  * `/root/reference/baloo/weld/weld_aggs.py:32-78`, exposed at
  * `baloo/core/series.py:350-354` and in groupby at
  * `baloo/core/groupby.py:13`).
  *
  * Implemented as a Catalyst `DeclarativeAggregate` rather than a udaf:
  * update/merge are plain expressions, so it participates in whole-stage
  * codegen and map-side partial aggregation — at cluster scale the partial
  * products combine associatively exactly like `sum`, no extra shuffle or
  * object-hash fallback.
  *
  * SQL NULL semantics match the other aggregates: NULL inputs are skipped,
  * empty/all-NULL group yields NULL (same as DuckDB's `product()`).
  */
case class ProductAgg(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def prettyName: String = "graft_prod"
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  private lazy val product = AttributeReference("product", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = product :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), product,
      Multiply(Coalesce(Seq(product, Literal(1.0d))), child)))

  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(product.right), product.left,
      Multiply(Coalesce(Seq(product.left, Literal(1.0d))), product.right)))

  override lazy val evaluateExpression: Expression = product

  override protected def withNewChildInternal(newChild: Expression): ProductAgg =
    copy(child = newChild)
}
