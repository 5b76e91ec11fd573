package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native codegen sketch expressions for the dedup hot paths.
  *
  * The HOF formulations in [[HashFns]] are correct but pay a structural
  * tax at scale: `minhashFromBases` is 64 independent
  * `array_min(transform(...))` branches — 64 passes and 64 transient
  * arrays per row — and `simhashFromHashes` is 64 `aggregate` folds whose
  * combined expression tree blows past the JIT-friendly method size.
  * Each expression here is ONE pass over the input array in primitive
  * `long` arithmetic, with eval mirroring codegen (same reference
  * implementation runs in both paths, so interpreted == generated).
  *
  * Numerics are bit-identical to the HOF forms by construction (same
  * hash family, same fold order), so swapping them in cannot change any
  * dedup verdict. UdxSpec asserts native == HOF on real corpus rows.
  */
object SketchExprs {
  import org.apache.spark.sql.GraftShims.{column, expression}

  /** MinHash signature: sig[i] = min over h of ((a_i·h + b_i) mod P).
    * Empty input (or all-null elements) → array of n nulls — mirrors
    * array_min, which skips nulls and yields null on nothing left,
    * keeping band hashes of degenerate docs identical to the HOF path. */
  def minhashSig(bases: Column, n: Int, seed: Long = 42L): Column = {
    val fam = HashFns.hashFamily(n, seed)
    column(MinHashSigExpr(expression(bases),
      fam.map(_._1).toIndexedSeq, fam.map(_._2).toIndexedSeq))
  }

  /** SimHash: sign-of-vote per bit over the element hashes, packed into
    * one long. Empty input → votes all 0 → 0L (same as the HOF fold). */
  def simhash(hashes: Column): Column =
    column(SimHashExpr(expression(hashes)))

  /** Sorted distinct of an array<long> — O(m log m) per row, one pass.
    * Lets a pipeline dedup (doc, gram) pairs BEFORE the explode, so the
    * downstream shuffle/aggregation never sees multiset duplicates. */
  def distinctLongs(arr: Column): Column =
    column(LongsDistinctExpr(expression(arr)))
}

/** Hash family held as IndexedSeq (value equality), so two structurally
  * identical expressions compare equal and Catalyst's subexpression
  * elimination / expression dedup can fire — Array fields would compare
  * by reference and defeat both. Converted to Array once for the hot
  * loop and the codegen reference object. */
case class MinHashSigExpr(child: Expression, as: IndexedSeq[Long], bs: IndexedSeq[Long])
    extends UnaryExpression {
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.sig(input.asInstanceOf[ArrayData], aArr, bArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("as", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bs", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigExpr.sig($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {
  def sig(x: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val m = x.numElements()
    val n = as.length
    val mins = Array.fill(n)(Long.MaxValue)
    var seen = false
    var i = 0
    while (i < m) {
      // null elements are skipped, mirroring array_min in the HOF form
      if (!x.isNullAt(i)) {
        seen = true
        val h = x.getLong(i)
        var j = 0
        while (j < n) {
          val v = (as(j) * h + bs(j)) % HashFns.P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) return new GenericArrayData(new Array[Any](n)) // n nulls
    new GenericArrayData(mins)
  }
}

case class SimHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  def simhash(x: ArrayData): Long = {
    val m = x.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < m) {
      // a null element votes -1 on every bit — exactly what the HOF
      // fold does (when(null-cond, 1).otherwise(-1)); getLong on a null
      // slot would read garbage from UnsafeArrayData
      val h = if (x.isNullAt(i)) 0L else x.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class LongsDistinctExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_distinct_longs"

  override protected def nullSafeEval(input: Any): Any =
    LongsDistinctExpr.distinct(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LongsDistinctExpr.distinct($c)")

  override protected def withNewChildInternal(newChild: Expression): LongsDistinctExpr =
    copy(child = newChild)
}

object LongsDistinctExpr {
  def distinct(x: ArrayData): ArrayData = {
    val m = x.numElements()
    if (m == 0) return new GenericArrayData(Array.emptyLongArray)
    val a = x.toLongArray()
    java.util.Arrays.sort(a)
    var w = 1
    var i = 1
    while (i < m) {
      if (a(i) != a(w - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(a, w))
  }
}
