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

/** Dot product of a float-vector column against a constant double plane
  * (LSH hyperplanes, IVF centroids) — the plane rides along as a codegen
  * reference object instead of an ArrayType literal, so the sketching
  * loop is pure primitive arithmetic. Same left-to-right double
  * accumulation as the HOF form. */
case class PlaneDotExpr(child: Expression, plane: Array[Double])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_plane_dot"

  override protected def nullSafeEval(input: Any): Any =
    PlaneDotExpr.dot(input.asInstanceOf[ArrayData], plane)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planeRef = ctx.addReferenceObj("plane", plane, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PlaneDotExpr.dot($c, $planeRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDotExpr =
    copy(child = newChild)
}

object PlaneDotExpr {
  def dot(x: ArrayData, plane: Array[Double]): Double = {
    val n = math.min(x.numElements(), plane.length)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * plane(i)
      i += 1
    }
    acc
  }

  def apply(vec: Column, plane: Array[Double]): Column =
    org.apache.spark.sql.GraftShims.column(PlaneDotExpr(
      org.apache.spark.sql.GraftShims.expression(vec), plane))
}
