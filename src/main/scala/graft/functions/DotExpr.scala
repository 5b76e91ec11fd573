package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native dot product over two float-array columns — the hot-path
  * replacement for `aggregate(zip_with(...))`, which materializes an
  * intermediate product array per row pair. Identical numerics by
  * construction: each product is computed in double and accumulated
  * left-to-right, exactly the fold order of the HOF form and of DuckDB's
  * `LIST_REDUCE` oracle — so swapping this in cannot change any
  * oracle-checked result.
  *
  * Codegen emits a tight primitive loop (no per-element boxing, no
  * intermediate ArrayData); eval mirrors it for the interpreted path.
  * Arrays of unequal length use the common prefix (our vectors are
  * fixed-dim; zip_with would null-poison instead — don't feed ragged
  * pairs either way). */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    DotExpr.dot(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotExpr.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}

object DotExpr {
  /** Shared by interpreted and generated paths. */
  def dot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftShims.column(DotExpr(
      org.apache.spark.sql.GraftShims.expression(a),
      org.apache.spark.sql.GraftShims.expression(b)))
}
