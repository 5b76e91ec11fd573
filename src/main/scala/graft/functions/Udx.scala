package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The user-extension surface: a typed Aggregator (UDAF), a scalar UDF,
  * and a codegen'd native Catalyst Expression — the three custom-code
  * tiers, in the preference order custom-Expression > typed-Aggregator >
  * plain udf (SURVEY.md §7 "Built-in vs custom").
  */
object Udx {

  /** Exact weighted mean as a typed Aggregator: buffers are scaled-long
    * fixed-point sums (inputs are 2-decimal corpus values), so partial
    * merges are associative and the result is bit-reproducible in any
    * merge order — the same decimal-parity discipline as
    * [[graft.operators.Exact]], as a UDAF. */
  final case class WSums(sumVW: Long, sumW: Long)
  object WeightedMean extends Aggregator[(Double, Double), WSums, Double] {
    private def cents(d: Double): Long = math.round(d * 100)
    override def zero: WSums = WSums(0L, 0L)
    override def reduce(b: WSums, in: (Double, Double)): WSums =
      WSums(b.sumVW + cents(in._1) * cents(in._2), b.sumW + cents(in._2))
    override def merge(a: WSums, b: WSums): WSums =
      WSums(a.sumVW + b.sumVW, a.sumW + b.sumW)
    override def finish(r: WSums): Double =
      // exact fixed-point → one correctly-rounded double each, then one
      // double division: identical to the oracle's
      // CAST(SUM(dec*dec) AS DOUBLE) / CAST(SUM(dec) AS DOUBLE)
      if (r.sumW == 0) 0.0
      else java.math.BigDecimal.valueOf(r.sumVW, 4).doubleValue() /
        java.math.BigDecimal.valueOf(r.sumW, 2).doubleValue()
    override def bufferEncoder: Encoder[WSums] = Encoders.product[WSums]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV (k-minimum-values) sketch as a typed Aggregator — the
    * bounded-state mergeable-sketch tier (the shape of HLL/theta
    * sketches) with a twist that makes it ORACLE-CHECKABLE: the sketch
    * state is the set of the k smallest hash values, which is a pure
    * deterministic function of the input SET — independent of row
    * order, partitioning and merge order (unlike HLL register layouts).
    * KMV estimates distinct counts as (k-1)/R_k (R_k = k-th smallest
    * normalized hash); here the FINISHED value is the sorted k-minimum
    * hash list itself, so DuckDB can reproduce it bit-for-bit with a
    * per-group ORDER BY hash LIMIT k — a hash-checked custom aggregate.
    * State is O(k) per group; reduce is an insert-if-smaller into a
    * bounded max-heap — the same partial/final two-phase shape as any
    * Spark aggregate. */
  final class KmvSketch(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {
    // buffer: descending-sorted list of ≤ k smallest values (head = worst)
    override def zero: List[Long] = Nil
    override def reduce(b: List[Long], h: Long): List[Long] =
      if (b.length < k) insertDesc(b, h)
      else if (h < b.head && !b.contains(h)) insertDesc(b.tail, h)
      else b
    private def insertDesc(b: List[Long], h: Long): List[Long] =
      if (b.contains(h)) b
      else {
        val (bigger, smaller) = b.span(_ > h)
        bigger ::: (h :: smaller)
      }
    override def merge(a: List[Long], b: List[Long]): List[Long] =
      b.foldLeft(a)(reduce)
    override def finish(r: List[Long]): Seq[Long] = r.reverse // ascending
    override def bufferEncoder: Encoder[List[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** FNV-1a 64-bit over UTF-8 bytes — reference implementation used by
    * both the interpreted and generated paths of [[Fnv64Expr]]. */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Native Catalyst expression with whole-stage codegen (`doGenCode`
    * emits a tight byte loop — no boxing, no UDF serialization): the
    * (b)-tier extension point for hot-path scalar functions. */
  case class Fnv64Expr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fnv64"
    override protected def nullSafeEval(input: Any): Any =
      fnv64(input.asInstanceOf[UTF8String].getBytes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.Udx.fnv64($c.getBytes())")
    override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
      copy(child = newChild)
  }

  /** Column wrapper for [[Fnv64Expr]]. */
  def graft_fnv64(c: Column): Column =
    org.apache.spark.sql.GraftShims.column(
      Fnv64Expr(org.apache.spark.sql.GraftShims.expression(c)))

  /** Plain Scala udf — the (c)-tier: simplest to write, opaque to
    * Catalyst (no pushdown through it, breaks codegen span). Kept for
    * surface completeness; prefer the tiers above in hot paths. */
  val tokenCountUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((s: String) =>
      if (s == null) 0 else s.trim.split("\\s+").length)
}
