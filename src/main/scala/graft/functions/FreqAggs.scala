package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
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
    * cardinality ≤ capacity the sums are exact.
    *
    * The weight is coerced to BIGINT here (so int/decimal weights work;
    * fractional weights truncate like ClickHouse's UInt64 cast) — the
    * aggregate itself demands LongType at analysis time. Negative
    * weights are rejected at runtime: SpaceSaving's eviction bound
    * requires monotonically non-decreasing counters. */
  def approxTopKWeighted(e: Column, w: Column, k: Int, capacity: Int): Column =
    column(SpaceSavingTopK(expression(e), k, capacity,
      weight = Some(expression(w.cast(LongType)))).toAggregateExpression())
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

  // Copy discipline (shared with BoundedCollectList/SpaceSavingTopK
  // .deserialize): values stay BACKED BY `bytes` — each deserialize call
  // exclusively owns its freshly allocated array, so no defensive copy.
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

/** One monitored SpaceSaving counter. Mutable on purpose: increments
  * update in place so heap snapshots (see [[TopKState]]) can detect
  * staleness by comparing their recorded count against `cnt`. `key` is
  * the canonical (owned) key object shared by the map and every heap
  * entry. `live` flips false on eviction so orphaned heap entries are
  * skipped. */
private[functions] final class SsCounter(val key: Any, var cnt: Long, var err: Long) {
  var live: Boolean = true
}

/** SpaceSaving buffer: the counter map plus a LAZY min-heap over
  * (count-snapshot, counter). The heap exists only once a task hits the
  * saturating regime (first eviction); before that, inserts/increments
  * are pure hash-map work. Entries go stale when a counter's count
  * moves past the snapshot — pops skip them — so eviction is
  * O(log heap) amortized instead of the O(capacity) scan of `minBy`,
  * which is the complexity the SpaceSaving paper's Stream-Summary
  * structure guarantees. Compaction rebuilds the heap from live
  * counters when stale entries pile past 4× capacity, keeping pops
  * O(log capacity). */
private[functions] final class TopKState {
  val counts: mutable.HashMap[Any, SsCounter] = mutable.HashMap.empty
  var heap: mutable.PriorityQueue[(Long, SsCounter)] = _
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
  * Eviction ties break by the child type's ordering (smallest value
  * evicts first) — deterministic under a fixed input partitioning,
  * unlike a hash-map scan's iteration order.
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
  extends TypedImperativeAggregate[TopKState] {

  require(k >= 1 && capacity >= k, "need 1 <= k <= capacity")

  override def children: Seq[Expression] = child +: weight.toSeq
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head, weight = newChildren.drop(1).headOption)

  // weight must already be BIGINT (FreqAggs.approxTopKWeighted inserts
  // the coercing cast) — anything else fails at ANALYSIS, not as a
  // ClassCastException halfway through a stage
  override def checkInputDataTypes(): TypeCheckResult = weight match {
    case Some(w) if w.dataType != LongType =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_topk_freq weight must be BIGINT, got ${w.dataType.catalogString}")
    case _ => TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("v", child.dataType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk_freq"

  @transient private lazy val ord =
    TypeUtils.getInterpretedOrdering(child.dataType)

  // PriorityQueue dequeues its MAX — reverse to (cnt asc, key asc)
  @transient private lazy val heapOrd: Ordering[(Long, SsCounter)] =
    new Ordering[(Long, SsCounter)] {
      override def compare(a: (Long, SsCounter), b: (Long, SsCounter)): Int = {
        val c = java.lang.Long.compare(b._1, a._1)
        if (c != 0) c else ord.compare(b._2.key, a._2.key)
      }
    }

  private def rebuildHeap(buf: TopKState): Unit =
    buf.heap = mutable.PriorityQueue(
      buf.counts.valuesIterator.map(c => (c.cnt, c)).toSeq: _*)(heapOrd)

  /** Pop the live minimum-count counter. Every live counter has a heap
    * entry carrying its CURRENT count (one is pushed on every change),
    * and stale/dead entries sort no later than their live successors —
    * so the first entry whose snapshot matches is the true minimum. */
  private def popMin(buf: TopKState): SsCounter = {
    if (buf.heap == null) rebuildHeap(buf)
    while (true) {
      val (c, ctr) = buf.heap.dequeue()
      if (ctr.live && ctr.cnt == c) return ctr
    }
    throw new IllegalStateException("unreachable: live counters outnumber heap entries")
  }

  private def maybeCompact(buf: TopKState): Unit =
    if (buf.heap != null && buf.heap.size > 4 * capacity + 8) rebuildHeap(buf)

  override def createAggregationBuffer(): TopKState = new TopKState

  override def update(buf: TopKState, input: InternalRow): TopKState = {
    val v = child.eval(input)
    if (v != null) {
      // unweighted arrivals contribute 1; weighted ones their weight
      // (null weight = no-op, mirroring SUM's null skipping)
      val inc = weight.fold(1L) { w =>
        val wv = w.eval(input)
        if (wv == null) 0L else wv.asInstanceOf[Long]
      }
      if (inc < 0) throw new IllegalArgumentException(
        "graft_topk_freq: negative weights are not supported — SpaceSaving's " +
          "error bound requires monotonically non-decreasing counters")
      val m = buf.counts
      if (inc > 0) m.get(v) match {
        case Some(ctr) =>
          ctr.cnt += inc
          if (buf.heap != null) { buf.heap.enqueue((ctr.cnt, ctr)); maybeCompact(buf) }
        case None if m.size < capacity =>
          val ctr = new SsCounter(InternalRow.copyValue(v), inc, 0L)
          m.update(ctr.key, ctr)
          if (buf.heap != null) buf.heap.enqueue((ctr.cnt, ctr))
        case None =>
          // evict the minimum counter; the newcomer inherits its count
          // (the SpaceSaving over-estimate; err records the inheritance)
          val min = popMin(buf)
          min.live = false
          m.remove(min.key)
          val ctr = new SsCounter(InternalRow.copyValue(v), min.cnt + inc, min.cnt)
          m.update(ctr.key, ctr)
          buf.heap.enqueue((ctr.cnt, ctr))
          maybeCompact(buf)
      }
    }
    buf
  }

  override def merge(buf: TopKState, other: TopKState): TopKState = {
    other.counts.foreach { case (key, o) =>
      buf.counts.get(key) match {
        case Some(ctr) => ctr.cnt += o.cnt; ctr.err += o.err
        case None => o.live = true; buf.counts.update(key, o) // adopt: `other` is discarded after merge
      }
    }
    if (buf.counts.size > capacity) {
      // keep the `capacity` largest counts (ties by value for
      // determinism); rebuilding the map bounds the merged buffer
      val keep = buf.counts.valuesIterator.toSeq
        .sortWith((a, b) => if (a.cnt != b.cnt) a.cnt > b.cnt else ord.lt(a.key, b.key))
        .take(capacity)
      buf.counts.clear()
      keep.foreach(c => buf.counts.update(c.key, c))
    }
    buf.heap = null // merged counts invalidate every snapshot; rebuilt on demand
    buf
  }

  override def eval(buf: TopKState): Any = {
    val top = buf.counts.valuesIterator.toSeq
      .sortWith((a, b) => if (a.cnt != b.cnt) a.cnt > b.cnt else ord.lt(a.key, b.key))
      .take(k)
      .map(c => InternalRow(c.key, c.cnt))
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

  override def serialize(buf: TopKState): Array[Byte] = {
    val rows = buf.counts.valuesIterator
      .map(c => InternalRow(c.key, c.cnt, c.err)).toArray[Any]
    projection.apply(InternalRow.apply(new GenericArrayData(rows))).getBytes
  }

  // Copy discipline (shared with BoundedCollectList/UniqUpTo.deserialize):
  // values stay BACKED BY `bytes` — TypedImperativeAggregate hands each
  // deserialize call a freshly allocated array it exclusively owns, so no
  // per-value defensive copy is taken. If the wire format ever moves to a
  // reused buffer, all three must start copying together.
  override def deserialize(bytes: Array[Byte]): TopKState = {
    val buf = new TopKState
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val arr = row.getArray(0)
    var i = 0
    val m = arr.numElements()
    while (i < m) {
      val s = arr.getStruct(i, 3)
      val ctr = new SsCounter(s.get(0, child.dataType), s.getLong(1), s.getLong(2))
      buf.counts.update(ctr.key, ctr)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
}
