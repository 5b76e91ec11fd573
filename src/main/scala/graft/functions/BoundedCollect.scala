package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Size-capped collect_list — the one-pass, bounded-memory form of the
  * dedup family's "bucket build" (candidate generation for MinHash-LSH /
  * SimHash bands / n-gram postings).
  *
  * Semantics: collects at most `cap + 1` elements per group and then
  * stops appending. A group whose true cardinality is ≤ cap is collected
  * COMPLETELY (no partial buffer can truncate it: partial counts sum to
  * the global count, so no buffer ever exceeds the cap either); a group
  * over the cap surfaces with exactly `cap + 1` elements — the overflow
  * marker callers drop with `size(es) <= cap`. Results after that filter
  * are bit-identical to `collect_list` + the same filter.
  *
  * Why it exists (the 100 TB argument): the previous shape was two
  * passes over the postings — a count-only groupBy to pick surviving
  * keys, then a semi-join and the real collect_list. That never
  * materializes a degenerate bucket, but it scans and shuffles the
  * postings relation twice. This aggregate does it in ONE hash
  * aggregation: map-side partial buffers are capped at `cap + 1`
  * elements per key (a corpus-wide stop-gram costs each task at most
  * `cap + 1` entries, not its full document frequency), merge caps the
  * combined buffer the same way, and the shuffle carries at most
  * `(cap + 1) · partitions` elements for even the hottest key. Memory
  * and network are both bounded with zero pre-passes.
  *
  * Reference behavior anchor: the bucketed candidate generation this
  * feeds is our Spark-first re-expression of near-dedup over the
  * documents corpus (SURVEY §2.2); the cap plays the same role as the
  * reference's fixed batch cap (`hashes.go:68`) — an absolute bound on
  * any in-memory accumulation unit.
  */
case class BoundedCollectList(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.ArrayBuffer[Any]]
  with UnaryLike[Expression] {

  require(cap >= 1, "cap must be >= 1")

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bounded_collect_list"

  override def createAggregationBuffer(): mutable.ArrayBuffer[Any] =
    mutable.ArrayBuffer.empty[Any]

  // keep at most cap+1: element cap+1 is the overflow marker that makes
  // `size(es) > cap` detectable downstream without ever growing further
  override def update(buf: mutable.ArrayBuffer[Any], input: InternalRow): mutable.ArrayBuffer[Any] = {
    if (buf.length <= cap) {
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v) // nulls skipped like collect_list
    }
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Any], other: mutable.ArrayBuffer[Any]): mutable.ArrayBuffer[Any] = {
    var i = 0
    while (i < other.length && buf.length <= cap) {
      buf += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.toArray)

  // buffer travels between partial and final as one unsafe array row —
  // the same wire format Spark's own Collect uses
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.ArrayBuffer[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buf.toArray))).getBytes

  // Copy discipline (shared with UniqUpTo/SpaceSavingTopK.deserialize):
  // values stay BACKED BY `bytes` — each deserialize call exclusively owns
  // its freshly allocated array, so no defensive copy.
  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Any] = {
    val buf = mutable.ArrayBuffer.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf += v)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedCollectList =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedCollectList =
    copy(child = newChild)
}

object BoundedCollect {
  import org.apache.spark.sql.GraftShims.{column, expression}

  /** `collect_list(e)` that stops growing past `cap + 1` elements —
    * filter the result with `size(es) <= cap` to drop overflowed groups;
    * kept groups are complete. */
  def boundedCollectList(e: Column, cap: Int): Column =
    column(BoundedCollectList(expression(e), cap).toAggregateExpression())
}
