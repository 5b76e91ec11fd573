package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** PRODUCT QUANTIZATION (IVF-PQ) for embedding vectors — the next
  * compression step past SQ8 ([[QuantizedVec]]): the vector splits into
  * `m` contiguous subspaces, each encoded as the index of its nearest
  * entry in a per-subspace codebook (≤ 256 entries → ONE BYTE per
  * subspace). A dim-64 float32 vector stores as 8 code bytes + one
  * float32 norm — ~21× under raw, ~6× under SQ8 — which is what keeps a
  * 100 TB corpus's serving index in cluster memory.
  *
  * This is the PUBLIC FAISS IVF-PQ shape with `by_residual = false`
  * (codes encode the raw vector, not the residual against its coarse
  * centroid): the variant whose asymmetric distance needs NO per-(query,
  * cell) term, so the scoring expression stays a pure function of
  * (codes, query) and whole-stage codegen keeps the coarse pass in one
  * primitive loop. The accuracy gap vs residual encoding is absorbed by
  * the EXACT refine pass every quantized search already runs
  * ([[graft.operators.IvfIndex.searchPq]]) — identical vectors take
  * identical codes, so planted-copy oracles stay exact end to end.
  *
  * ASYMMETRIC DISTANCE (ADC): the query stays raw float; a candidate is
  * scored as cos(q, x̃) where x̃ is the concatenation of its codebook
  * entries. Because subspaces are disjoint coordinates,
  * dot(q, x̃) = Σ_j dot(q_j, cb_j[code_j]) — `dim` multiply-adds per
  * pair, the same arithmetic as the SQ8 coarse pass, while the scan
  * reads only m + 4 bytes per candidate instead of dim + 8 — and
  * ‖x̃‖² = Σ_j ‖cb_j[code_j]‖², precomputed once at ENCODE time and
  * stored as the `pqnorm` column so the hot loop never recomputes it.
  *
  * Codebooks ride the expressions as codegen reference objects (the
  * [[PlaneDotExpr]] pattern) — index metadata scale (m × ksub × dsub
  * doubles, ≤ 128 KiB at m=8, ksub=256, dim=64), never corpus scale. */
object PqVec {

  /** Subspace j covers dims [floor(j·dim/m), floor((j+1)·dim/m)) — the
    * balanced split that never produces an empty subspace for m ≤ dim.
    * The codebooks themselves carry the geometry (entry lengths), so
    * encode/decode/score derive offsets by scanning, no side channel. */
  def subspaceBounds(dim: Int, m: Int): Array[(Int, Int)] =
    Array.tabulate(m)(j => (j * dim / m, (j + 1) * dim / m))

  /** m code bytes: per subspace, the index of the nearest codebook
    * entry by squared euclidean distance (first entry wins ties — the
    * same deterministic rule as [[VectorFns.kmeans]] assignment). */
  def encode(vec: ArrayData, cb: Array[Array[Array[Double]]]): Array[Byte] = {
    val m = cb.length
    val out = new Array[Byte](m)
    var off = 0
    var j = 0
    while (j < m) {
      val book = cb(j)
      val dsub = book(0).length
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = vec.getFloat(off + i).toDouble - cent(i)
          d += t * t
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(j) = best.toByte
      off += dsub
      j += 1
    }
    out
  }

  /** ‖x̃‖² of the decoded vector — disjoint subspaces make it the sum
    * of per-entry squared norms. Stored per vector at encode time. */
  def normSq(codes: Array[Byte], cb: Array[Array[Array[Double]]]): Float = {
    var acc = 0.0
    var j = 0
    while (j < codes.length) {
      val cent = cb(j)(codes(j) & 0xFF)
      var i = 0
      while (i < cent.length) { acc += cent(i) * cent(i); i += 1 }
      j += 1
    }
    acc.toFloat
  }

  /** The reconstructed vector (codebook-entry concatenation) — used by
    * the drift gauge's bounded sample, never in the scoring hot path. */
  def decode(codes: Array[Byte], cb: Array[Array[Array[Double]]]): Array[Double] = {
    val out = Array.newBuilder[Double]
    var j = 0
    while (j < codes.length) {
      val cent = cb(j)(codes(j) & 0xFF)
      var i = 0
      while (i < cent.length) { out += cent(i); i += 1 }
      j += 1
    }
    out.result()
  }

  /** ADC cosine of a raw float query against PQ codes: one pass of dim
    * multiply-adds against the addressed codebook entries, divided by
    * the STORED candidate norm and the query-side-computed query norm
    * (`qn` rides the probe side — one sqrt per query row, not per
    * pair). 0-safe like [[VectorFns.cosine]]. */
  def adcCosine(codes: Array[Byte], q: ArrayData,
      cb: Array[Array[Array[Double]]], normSq: Float, qn: Double): Double = {
    var dot = 0.0
    var off = 0
    var j = 0
    while (j < codes.length) {
      val cent = cb(j)(codes(j) & 0xFF)
      var i = 0
      while (i < cent.length) {
        dot += q.getFloat(off + i).toDouble * cent(i)
        i += 1
      }
      off += cent.length
      j += 1
    }
    val denom = math.sqrt(normSq.toDouble) * qn
    if (denom == 0.0) 0.0 else dot / denom
  }
}

/** `pq_encode(vec)` → BINARY m-byte codes against the embedded
  * codebooks. Runs on the build/refresh projection (delta-sized). */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_pq_encode"

  override protected def nullSafeEval(vec: Any): Any =
    PqVec.encode(vec.asInstanceOf[ArrayData], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, v => s"graft.functions.PqVec.encode($v, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

object PqEncodeExpr {
  def apply(vec: Column, cb: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftShims.column(PqEncodeExpr(
      org.apache.spark.sql.GraftShims.expression(vec), cb))
}

/** `pq_norm_sq(codes)` → FLOAT ‖decoded‖² — the stored denominator
  * half of the ADC cosine, computed once at encode time. */
case class PqNormSqExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  override def dataType: DataType = FloatType
  override def prettyName: String = "graft_pq_norm_sq"

  override protected def nullSafeEval(codes: Any): Any =
    PqVec.normSq(codes.asInstanceOf[Array[Byte]], codebooks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.PqVec.normSq($c, $cbRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqNormSqExpr =
    copy(child = newChild)
}

object PqNormSqExpr {
  def apply(codes: Column, cb: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftShims.column(PqNormSqExpr(
      org.apache.spark.sql.GraftShims.expression(codes), cb))
}

/** `pq_adc_cosine(codes, qe, pqnorm, qn)` → DOUBLE — the IVF-PQ coarse
  * pass's hot expression: one primitive lookup-and-dot loop per (query,
  * candidate) pair, whole-stage codegen'd, reading m + 4 candidate
  * bytes where the SQ8 pass reads dim + 8. */
case class PqAdcCosineExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression,
    codebooks: Array[Array[Array[Double]]]) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_pq_adc_cosine"
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable || fourth.nullable

  override def nullSafeEval(codes: Any, q: Any, nsq: Any, qn: Any): Any =
    PqVec.adcCosine(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData],
      codebooks, nsq.asInstanceOf[Float], qn.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", codebooks, "double[][][]")
    defineCodeGen(ctx, ev, (c, q, nsq, qn) =>
      s"graft.functions.PqVec.adcCosine($c, $q, $cbRef, $nsq, $qn)")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): PqAdcCosineExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object PqAdcCosineExpr {
  def apply(codes: Column, qe: Column, pqnorm: Column, qn: Column,
      cb: Array[Array[Array[Double]]]): Column =
    org.apache.spark.sql.GraftShims.column(PqAdcCosineExpr(
      org.apache.spark.sql.GraftShims.expression(codes),
      org.apache.spark.sql.GraftShims.expression(qe),
      org.apache.spark.sql.GraftShims.expression(pqnorm),
      org.apache.spark.sql.GraftShims.expression(qn), cb))
}
