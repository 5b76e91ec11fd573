package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-cardinality aggregates — the ClickHouse `uniqUpTo(N)` and
  * `topK(k)` (SpaceSaving) surface as native partial-aggregatable
  * Catalyst aggregates.
  *
  * Shared 100 TB stance: both keep O(cap) state per group per task —
  * never O(distinct values) — so a corpus-wide hot group costs each
  * map-side buffer a fixed few KB, and the shuffle carries at most
  * `cap · partitions` entries per group. This is the same
  * bounded-accumulation-unit discipline as [[BoundedCollectList]] and
  * the reference's fixed batch cap (`hashes.go:68`).
  *
  * Exactness contract (what makes these DuckDB-oracle-checkable): while
  * a group's TRUE distinct-value count stays ≤ cap, no update ever
  * evicts and no merge ever trims, so counts are exact and the output
  * is deterministic regardless of partitioning. `uniqUpTo` saturates to
  * the sentinel `n + 1` the moment the cap is crossed (exactly
  * ClickHouse's documented contract); `topK`'s counts degrade to
  * over-estimates with a tracked error bound (classic SpaceSaving).
  * Queries that want hash-match pin cap ≥ the column's true
  * cardinality; the specs exercise the saturating regime.
  */
object FreqAggs {
  import org.apache.spark.sql.GraftShims.{column, expression}

  /** Exact distinct count up to `n`; `n + 1` means "more than n".
    * State: a hash set capped at n + 1 elements. */
  def uniqUpTo(e: Column, n: Int): Column =
    column(UniqUpTo(expression(e), n).toAggregateExpression())

  /** SpaceSaving heavy hitters: top `k` values by frequency with
    * `capacity` tracked counters (exact while true cardinality ≤
    * capacity). Returns `array<struct<v, cnt>>` sorted by
    * (cnt desc, v asc). */
  def approxTopK(e: Column, k: Int, capacity: Int): Column =
    column(SpaceSavingTopK(expression(e), k, capacity).toAggregateExpression())

  /** Weighted SpaceSaving (ClickHouse `topKWeighted`): top `k` values
    * by SUM OF WEIGHT (revenue by key, bytes by host, …) instead of
    * row count — each arrival contributes `w`, eviction inherits the
    * minimum accumulated weight. Same exactness contract: while true
    * cardinality ≤ capacity the sums are exact. */
  def approxTopKWeighted(e: Column, w: Column, k: Int, capacity: Int): Column =
    column(SpaceSavingTopK(expression(e), k, capacity,
      weight = Some(expression(w))).toAggregateExpression())
}

/** ClickHouse `uniqUpTo(N)`: exact COUNT(DISTINCT child) while ≤ n,
  * else the saturation sentinel n + 1. The buffer stops growing at
  * n + 1 elements — once a partial buffer saturates it already proves
  * the global count exceeds n, so dropping further values loses
  * nothing (set-union monotonicity; merge of any saturated buffer
  * saturates). Oracle form: `LEAST(COUNT(DISTINCT x), n + 1)`. */
case class UniqUpTo(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]]
  with UnaryLike[Expression] {

  require(n >= 1, "n must be >= 1")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_uniq_up_to"

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty[Any]

  override def update(buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    if (buf.size <= n) { // cap + 1 = saturation witness, like collect's cap
      val v = child.eval(input)
      if (v != null) buf += InternalRow.copyValue(v) // NULL never counts, like COUNT(DISTINCT)
    }
    buf
  }

  override def merge(buf: mutable.HashSet[Any], other: mutable.HashSet[Any]): mutable.HashSet[Any] = {
    val it = other.iterator
    while (it.hasNext && buf.size <= n) buf += it.next()
    buf
  }

  override def eval(buf: mutable.HashSet[Any]): Any =
    math.min(buf.size, n + 1).toLong

  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](ArrayType(child.dataType, containsNull = false)))

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] =
    projection.apply(InternalRow.apply(new GenericArrayData(buf.toArray))).getBytes

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val buf = mutable.HashSet.empty[Any]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    row.getArray(0).foreach(child.dataType, (_, v: Any) => buf += v)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpTo =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): UniqUpTo =
    copy(child = newChild)
}

/** ClickHouse `topK(k)` — SpaceSaving (Metwally et al., "Efficient
  * Computation of Frequent and Top-k Elements in Data Streams", ICDT
  * 2005): `capacity` monitored counters; an unmonitored arrival evicts
  * the current minimum and inherits its count as the new counter's
  * error bound. Merge sums counts/errors for shared keys, keeps
  * singletons as-is, then trims back to the `capacity` largest — the
  * standard distributed-merge that preserves the exact regime (true
  * cardinality ≤ capacity ⇒ no eviction, no trim, exact counts) and
  * keeps count over-estimates bounded otherwise.
  *
  * Output: the k most frequent values as `array<struct<v, cnt>>`,
  * ordered by (cnt desc, v asc) — deterministic in the exact regime. */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    weight: Option[Expression] = None)
  extends TypedImperativeAggregate[mutable.HashMap[Any, (Long, Long)]] {

  require(k >= 1 && capacity >= k, "need 1 <= k <= capacity")

  override def children: Seq[Expression] = child +: weight.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head, weight = newChildren.drop(1).headOption)

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", child.dataType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_freq"

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def createAggregationBuffer(): mutable.HashMap[Any, (Long, Long)] =
    mutable.HashMap.empty[Any, (Long, Long)]

  override def update(buf: mutable.HashMap[Any, (Long, Long)], input: InternalRow): mutable.HashMap[Any, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) {
      // unweighted arrivals contribute 1; weighted ones their weight
      // (null/zero weight = no-op, mirroring SUM's null skipping)
      val inc = weight.fold(1L) { w =>
        val wv = w.eval(input)
        if (wv == null) 0L else wv.asInstanceOf[Long]
      }
      if (inc > 0) buf.get(v) match {
        case Some((c, e)) => buf.update(v, (c + inc, e))
        case None if buf.size < capacity =>
          buf.update(InternalRow.copyValue(v), (inc, 0L))
        case None =>
          // evict the minimum counter; the newcomer inherits its count
          // (the SpaceSaving over-estimate; err records the inheritance)
          val (mk, (mc, _)) = buf.minBy(_._2._1)
          buf.remove(mk)
          buf.update(InternalRow.copyValue(v), (mc + inc, mc))
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, (Long, Long)], other: mutable.HashMap[Any, (Long, Long)]): mutable.HashMap[Any, (Long, Long)] = {
    other.foreach { case (v, (c, e)) =>
      buf.get(v) match {
        case Some((c0, e0)) => buf.update(v, (c0 + c, e0 + e))
        case None => buf.update(v, (c, e))
      }
    }
    if (buf.size > capacity) {
      // keep the `capacity` largest counts (ties by value for
      // determinism); rebuilding the map bounds the merged buffer
      val keep = buf.toSeq
        .sortWith { case ((v1, (c1, _)), (v2, (c2, _))) =>
          if (c1 != c2) c1 > c2 else ord.lt(v1, v2)
        }
        .take(capacity)
      buf.clear()
      keep.foreach { case (v, ce) => buf.update(v, ce) }
    }
    buf
  }

  override def eval(buf: mutable.HashMap[Any, (Long, Long)]): Any = {
    val top = buf.toSeq
      .sortWith { case ((v1, (c1, _)), (v2, (c2, _))) =>
        if (c1 != c2) c1 > c2 else ord.lt(v1, v2)
      }
      .take(k)
      .map { case (v, (c, _)) => InternalRow(v, c) }
    new GenericArrayData(top.toArray)
  }

  // wire format: array<struct<v, cnt, err>> in one unsafe row
  @transient private lazy val bufType = ArrayType(
    StructType(Seq(
      StructField("v", child.dataType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  @transient private lazy val projection =
    UnsafeProjection.create(Array[DataType](bufType))

  override def serialize(buf: mutable.HashMap[Any, (Long, Long)]): Array[Byte] = {
    val rows = buf.toArray.map { case (v, (c, e)) => InternalRow(v, c, e) }
    projection.apply(InternalRow.apply(new GenericArrayData(rows))).getBytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, (Long, Long)] = {
    val buf = mutable.HashMap.empty[Any, (Long, Long)]
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getStruct(i, 3)
      val v = s.get(0, child.dataType) match {
        case u: org.apache.spark.unsafe.types.UTF8String => u.copy()
        case other => InternalRow.copyValue(other)
      }
      buf.update(v, (s.getLong(1), s.getLong(2)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
}
