package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SCALAR QUANTIZATION (SQ8) for embedding vectors — the storage half
  * of the quantized IVF index ([[graft.operators.IvfIndex]]'s
  * `buildQuantized`; FAISS's IVF-SQ8 shape re-expressed for columnar
  * scans): each float32 vector stores as one int8 code per dimension
  * plus a per-vector (min, scale) pair, 4× smaller than the raw
  * vector. The coarse search pass reads ONLY the codes (column pruning
  * keeps the raw embeddings out of the scan entirely when the lists
  * store none), dequantizing on the fly inside a codegen'd primitive
  * loop; the exact re-rank happens against the raw corpus afterwards.
  *
  * Determinism contract: quantize and dequantize use the STORED
  * (vmin, vscale) floats, so `dequant(quant(x)) ` is a pure function
  * of the persisted bytes — identical vectors quantize to identical
  * codes, which is what keeps planted-copy oracles exact. */
object QuantizedVec {

  /** code_i = round((x_i − vmin) / vscale), clamped to [0, 255];
    * vscale ≤ 0 (constant vector) → all zeros. */
  def quantize(vec: ArrayData, vmin: Float, vscale: Float): Array[Byte] = {
    val n = vec.numElements()
    val out = new Array[Byte](n)
    if (vscale > 0.0f) {
      var i = 0
      while (i < n) {
        val c = Math.round((vec.getFloat(i) - vmin) / vscale)
        out(i) = Math.max(0, Math.min(255, c)).toByte
        i += 1
      }
    }
    out
  }

  /** Cosine of a RAW float query against a QUANTIZED stored vector,
    * dequantizing inline: x̃_i = vmin + vscale * code_i. Same
    * left-to-right double accumulation as [[DotExpr]]. */
  def cosine(codes: Array[Byte], vmin: Float, vscale: Float,
      q: ArrayData): Double = {
    val n = math.min(codes.length, q.numElements())
    var dot = 0.0
    var nx = 0.0
    var nq = 0.0
    var i = 0
    while (i < n) {
      val x = vmin.toDouble + vscale.toDouble * (codes(i) & 0xFF)
      val y = q.getFloat(i).toDouble
      dot += x * y
      nx += x * x
      nq += y * y
      i += 1
    }
    val nn = math.sqrt(nx) * math.sqrt(nq)
    if (nn == 0.0) 0.0 else dot / nn
  }
}

/** `quantize(vec, vmin, vscale)` → BINARY int8 codes. Used on the
  * build/refresh projection (delta-sized); codegen keeps it in the
  * whole-stage pipeline anyway. */
case class QuantizeVecExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_quantize_vec"

  override protected def nullSafeEval(vec: Any, mn: Any, sc: Any): Any =
    QuantizedVec.quantize(vec.asInstanceOf[ArrayData],
      mn.asInstanceOf[Float], sc.asInstanceOf[Float])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, mn, sc) =>
      s"graft.functions.QuantizedVec.quantize($v, $mn, $sc)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): QuantizeVecExpr = copy(first = f, second = s, third = t)
}

object QuantizeVecExpr {
  def apply(vec: Column, vmin: Column, vscale: Column): Column =
    org.apache.spark.sql.GraftShims.column(QuantizeVecExpr(
      org.apache.spark.sql.GraftShims.expression(vec),
      org.apache.spark.sql.GraftShims.expression(vmin),
      org.apache.spark.sql.GraftShims.expression(vscale)))
}

/** `quantized_cosine(codes, vmin, vscale, qe)` → DOUBLE — the coarse
  * ranking pass's hot expression: one primitive dequantize-and-dot
  * loop per (query, candidate) pair, whole-stage codegen'd. */
case class QuantizedCosineExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_quantized_cosine"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def nullSafeEval(codes: Any, mn: Any, sc: Any, q: Any): Any =
    QuantizedVec.cosine(codes.asInstanceOf[Array[Byte]],
      mn.asInstanceOf[Float], sc.asInstanceOf[Float], q.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, mn, sc, q) =>
      s"graft.functions.QuantizedVec.cosine($c, $mn, $sc, $q)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): QuantizedCosineExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object QuantizedCosineExpr {
  def apply(codes: Column, vmin: Column, vscale: Column, qe: Column): Column =
    org.apache.spark.sql.GraftShims.column(QuantizedCosineExpr(
      org.apache.spark.sql.GraftShims.expression(codes),
      org.apache.spark.sql.GraftShims.expression(vmin),
      org.apache.spark.sql.GraftShims.expression(vscale),
      org.apache.spark.sql.GraftShims.expression(qe)))
}
