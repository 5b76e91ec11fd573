package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.GraftShims

/** Native whole-operator extension — the (c)-tier of the engine's
  * Catalyst integration: a custom logical node, a planner strategy and
  * a physical operator, registered through
  * `spark.experimental.extraStrategies` (and injectable via
  * `graft.GraftExtensions` for `--conf spark.sql.extensions` users).
  *
  * Semantics: for each group (by `groupExprs`), emit the first `k` rows
  * under `order` — SQL's `ROW_NUMBER() OVER (PARTITION BY g ORDER BY o)
  * <= k` without materializing or sorting whole groups.
  *
  * Why a custom operator instead of the window form: the window plan
  * shuffles EVERY row, then sorts every (group, order) run before the
  * rank filter discards all but k per group. Spark's own
  * `WindowGroupLimit` optimization (3.5+) inserts a pre-shuffle
  * group-limit but still sorts within partitions and still runs the
  * full Window operator after the shuffle. This operator keeps a
  * bounded k-element heap per group on both sides of the exchange:
  *
  *   partial TopKPerGroupExec   — per input partition, heap per group,
  *                                emits ≤ k rows/group/partition
  *   Exchange(hash(groupExprs)) — inserted automatically by
  *                                EnsureRequirements from the final
  *                                node's requiredChildDistribution
  *   final TopKPerGroupExec     — same algorithm on the merged stream,
  *                                emits exactly the global top-k/group
  *
  * At 100 TB the shuffle carries at most k × groups × partitions rows
  * (vs ALL rows for the window form), no sort ever runs, and memory is
  * O(groups-per-partition × k) — the partial phase is the same trick
  * map-side combine plays for aggregates, applied to a rank filter.
  *
  * Reference trigger: the reference delegates all ranking to ClickHouse
  * (`ORDER BY ... LIMIT k BY g`, absent from its Go code — SURVEY §2.2
  * "Sorts/limits/top-k"); this is the Spark-native equivalent of
  * ClickHouse's `LIMIT k BY` operator.
  */
object TopKPerGroup {

  /** Logical node: declares the semantics, carries no execution detail.
    * `output = child.output` — the operator only filters rows. `mode`
    * picks the retention rule (row_number / rank-with-ties /
    * dense_rank — see [[RankMode]]). */
  case class TopKPerGroupPlan(
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      child: LogicalPlan,
      mode: RankMode = RankMode.RowNumber) extends UnaryNode {
    require(k > 0, "topKPerGroup: k must be positive")
    require(groupExprs.nonEmpty, "topKPerGroup: need at least one group expression")
    override def output: Seq[Attribute] = child.output
    override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
      copy(child = newChild)
  }

  /** Planner strategy: logical → partial/final physical pair. The
    * exchange between them is NOT built here — the final node's
    * required distribution lets EnsureRequirements insert (or elide,
    * if the child is already hash-partitioned on the group keys —
    * e.g. downstream of a groupBy on the same keys) the shuffle. */
  private def modeOf(fn: Expression): Option[RankMode] = {
    import org.apache.spark.sql.catalyst.expressions.{DenseRank, Rank, RowNumber}
    fn match {
      case _: RowNumber => Some(RankMode.RowNumber)
      case _: Rank => Some(RankMode.WithTies)
      case _: DenseRank => Some(RankMode.Dense)
      case _ => None
    }
  }

  object Strategy extends SparkStrategy {
    import org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case TopKPerGroupPlan(group, order, k, child, mode) =>
        TopKPerGroupExec(group, order, k, mode, partial = false,
          TopKPerGroupExec(group, order, k, mode, partial = true, planLater(child))) :: Nil
      // Also claim Spark's own WindowGroupLimit (row_number/rank/
      // dense_rank) at PLANNING time: [[NativeWindowGroupLimitRule]]
      // swaps it in the logical plan when registered via
      // extraOptimizations (which run after InferWindowGroupLimit), but
      // extension-INJECTED optimizer rules run in the
      // operator-optimization batch — before the node exists — so the
      // `--conf spark.sql.extensions` path intercepts here instead.
      // Injected strategies precede the built-ins, so this wins over
      // the sort-based WindowGroupLimitExec.
      case WindowGroupLimit(part, order, rankFn, limit, child)
          if part.nonEmpty && limit > 0 && modeOf(rankFn).isDefined =>
        val mode = modeOf(rankFn).get
        TopKPerGroupExec(part, order, limit, mode, partial = false,
          TopKPerGroupExec(part, order, limit, mode, partial = true, planLater(child))) :: Nil
      case _ => Nil
    }
  }

  /** Rank-like mode of a [[TopKPerGroupPlan]] / [[TopKPerGroupExec]]:
    * which retention rule the per-group structure implements. */
  sealed trait RankMode
  object RankMode {
    /** row_number() <= k: exactly k rows. */
    case object RowNumber extends RankMode
    /** rank() <= k: the k-minimal rows plus everything tied with the
      * k-th (SQL FETCH FIRST k WITH TIES). */
    case object WithTies extends RankMode
    /** dense_rank() <= k: every row of the k smallest DISTINCT order
      * values. */
    case object Dense extends RankMode
  }

  /** Per-group bounded retainer. row_number mode: one k-element
    * max-heap — a row is admitted if the heap is under k or it precedes
    * the heap's worst element (which is then evicted). rank mode
    * (withTies): the retained set is "every row whose sort key ≤ the
    * k-th row's key", so rows TYING the boundary go to a side buffer:
    *
    *   - row strictly precedes heap.head → evict/insert as usual; if
    *     the boundary VALUE unchanged (other rows at that value remain),
    *     the evicted row still ties the k-th row — move it to the
    *     buffer; if the boundary value improved, the former ties now
    *     rank > k — drop the buffer.
    *   - row ties heap.head → buffer it.
    *
    * Heap stays ≤ k; the tie buffer is bounded by the multiplicity of
    * the boundary value (exactly the rows rank-k semantics obliges the
    * operator to emit — SQL WITH TIES has the same worst case). */
  private sealed trait GroupRetainer {
    def add(row: InternalRow): Unit
    def result: Iterator[InternalRow]
  }

  private final class GroupTopK(k: Int, withTies: Boolean, cmp: Ordering[InternalRow])
      extends GroupRetainer {
    private val heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](cmp)
    private var ties = List.empty[InternalRow]

    def add(row: InternalRow): Unit = {
      if (heap.size < k) { heap.enqueue(row.copy()); return }
      val c = cmp.compare(row, heap.head)
      if (c < 0) {
        val evicted = heap.dequeue()
        heap.enqueue(row.copy())
        if (withTies) {
          if (cmp.compare(evicted, heap.head) == 0) {
            // boundary value unchanged: the evicted row still ties the
            // k-th row — it stays retained, just outside the heap
            ties ::= evicted
          } else {
            // boundary value improved: the evicted row and every
            // buffered tie (all at the old boundary value) now rank > k
            ties = Nil
          }
        }
      } else if (withTies && c == 0) {
        ties ::= row.copy()
      }
    }

    def result: Iterator[InternalRow] = heap.iterator ++ ties.iterator
  }

  /** dense_rank() <= k retention: all rows of the k smallest DISTINCT
    * order values. k value-buckets, each holding its rows; a new value
    * evicts the largest bucket once k buckets exist. Buckets are a
    * linear array — k is a LIMIT-clause constant (single digits to a
    * few hundred), so a scan beats any tree's constant factor, and the
    * worst bucket is tracked by index to make eviction O(k) not
    * O(k log k). Memory is k × (rows at each retained value) — exactly
    * what dense_rank semantics obliges the operator to emit. */
  private final class GroupDenseTopK(k: Int, cmp: Ordering[InternalRow])
      extends GroupRetainer {
    // parallel arrays: representative row + that value's retained rows
    private val reps = new scala.collection.mutable.ArrayBuffer[InternalRow](k)
    private val rows = new scala.collection.mutable.ArrayBuffer[scala.collection.mutable.ArrayBuffer[InternalRow]](k)
    private var worst = -1 // index of the largest retained value

    private def recomputeWorst(): Unit = {
      worst = 0
      var i = 1
      while (i < reps.length) {
        if (cmp.compare(reps(i), reps(worst)) > 0) worst = i
        i += 1
      }
    }

    def add(row: InternalRow): Unit = {
      var i = 0
      while (i < reps.length) {
        if (cmp.compare(row, reps(i)) == 0) { rows(i) += row.copy(); return }
        i += 1
      }
      if (reps.length < k) {
        val r = row.copy()
        reps += r
        rows += scala.collection.mutable.ArrayBuffer(r)
        if (worst < 0 || cmp.compare(r, reps(worst)) > 0) worst = reps.length - 1
      } else if (cmp.compare(row, reps(worst)) < 0) {
        val r = row.copy()
        reps(worst) = r
        rows(worst) = scala.collection.mutable.ArrayBuffer(r)
        recomputeWorst()
      }
    }

    def result: Iterator[InternalRow] = rows.iterator.flatMap(_.iterator)
  }

  /** Physical operator: one [[GroupRetainer]] per group key. Used for
    * both phases — "partial" differs only in not requiring a
    * distribution (it runs on raw scan partitions); in every mode a row
    * that survives globally has at most as many partition-local
    * (distinct-value) predecessors as global ones, so the partial
    * retained set is always a superset of the final answer and the
    * final phase computes it exactly.
    */
  case class TopKPerGroupExec(
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      mode: RankMode,
      partial: Boolean,
      child: SparkPlan) extends UnaryExecNode {

    override def output: Seq[Attribute] = child.output
    override def outputPartitioning = child.outputPartitioning
    override def nodeName: String = {
      val tag = mode match {
        case RankMode.RowNumber => ""
        case RankMode.WithTies => "Rank"
        case RankMode.Dense => "DenseRank"
      }
      if (partial) s"TopK${tag}PerGroupPartial" else s"TopK${tag}PerGroupFinal"
    }

    override def requiredChildDistribution: Seq[Distribution] =
      if (partial) UnspecifiedDistribution :: Nil
      else ClusteredDistribution(groupExprs) :: Nil

    override protected def doExecute(): RDD[InternalRow] = {
      val groupExprsLocal = groupExprs
      val orderLocal = order
      val childOutput = child.output
      val kLocal = k
      val modeLocal = mode
      child.execute().mapPartitions({ iter =>
        val keyProj = UnsafeProjection.create(groupExprsLocal, childOutput)
        // BaseOrdering compares "row a sorts before row b" — the heap
        // is a max-heap under it, so `head` is the worst retained row.
        val cmp: Ordering[InternalRow] = RowOrdering.create(orderLocal, childOutput)
        def mk(): GroupRetainer = modeLocal match {
          case RankMode.Dense => new GroupDenseTopK(kLocal, cmp)
          case m => new GroupTopK(kLocal, m == RankMode.WithTies, cmp)
        }
        val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, GroupRetainer]
        iter.foreach { row =>
          val key = keyProj(row)
          heaps.get(key) match {
            case None =>
              val h = mk()
              h.add(row)
              heaps.put(key.copy(), h)
            case Some(h) => h.add(row)
          }
        }
        heaps.valuesIterator.flatMap(_.result)
      }, preservesPartitioning = true)
    }

    override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
      copy(child = newChild)
  }

  /** Optimizer rule: swap Spark's sort-based window-group-limit for
    * the native heap operator. Spark's own `InferWindowGroupLimit`
    * (3.5+) already does the hard safety analysis — it inserts a
    * `WindowGroupLimit` node below a Window exactly when a
    * `rank-like <= k` filter makes a per-group prefix sufficient. This
    * rule piggybacks on that analysis and replaces the node (for the
    * row_number case with real grouping) with [[TopKPerGroupPlan]]:
    * same retained set (the k-minimal prefix per group under the window
    * order — identical whenever the order is total, which every
    * deterministic query has), but computed with bounded heaps on both
    * sides of the exchange instead of per-partition sorts. The Window
    * above then ranks only k rows per group. Users keep writing the
    * standard `row_number().over(w) <= k` pattern; the engine swaps the
    * execution underneath.
    *
    * RowNumber plans in row_number mode (exactly k); Rank plans in
    * withTies mode ([[GroupTopK]] keeps boundary ties in a side
    * buffer); DenseRank plans on [[GroupDenseTopK]] (k value-buckets —
    * all rows of the k smallest distinct order values). */
  object NativeWindowGroupLimitRule
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case WindowGroupLimit(part, order, fn, limit, child)
          if part.nonEmpty && limit > 0 && modeOf(fn).isDefined =>
        TopKPerGroupPlan(part, order, limit, child, mode = modeOf(fn).get)
    }
  }

  /** Column pruning through the custom node: Spark's `ColumnPruning`
    * only understands built-in operators, so a Project above
    * `TopKPerGroupPlan` would otherwise leave the child (and the scan
    * below it) producing every column. The operator only FILTERS rows —
    * any output column not consumed above and not referenced by the
    * group/order expressions can be cut below it, which at 100 TB is
    * the difference between scanning 2 columns and scanning 50. */
  object PruneTopKColumnsRule
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case p @ Project(_, topk @ TopKPerGroupPlan(group, order, k, child, mode))
          if (child.outputSet -- p.references --
            org.apache.spark.sql.catalyst.expressions.AttributeSet(
              group.flatMap(_.references) ++ order.flatMap(_.references))).nonEmpty =>
        val needed = child.output.filter(a =>
          p.references.contains(a) ||
            group.exists(_.references.contains(a)) ||
            order.exists(_.references.contains(a)))
        p.copy(child = TopKPerGroupPlan(group, order, k, Project(needed, child), mode))
    }
  }

  /** Idempotently register the strategy AND the optimizer rules on a
    * session (the imperative path for sessions not built with
    * `spark.sql.extensions`). Strategy and rules must be co-registered:
    * the rules introduce the logical node only the strategy can plan. */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    if (!spark.experimental.extraOptimizations.contains(NativeWindowGroupLimitRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++
          Seq(NativeWindowGroupLimitRule, PruneTopKColumnsRule)
  }

  /** DataFrame API: top `k` rows per `groupCols` group under `orderCols`
    * (pass `col.desc`/`col.asc` — bare columns default to ascending).
    * Include a unique tie-break column in `orderCols` for deterministic
    * results. */
  def topKPerGroup(df: DataFrame, groupCols: Seq[Column], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val analyzed = df.queryExecution.analyzed
    val group = groupCols.map(GraftShims.catalystExpression)
    val order = orderCols.map(GraftShims.catalystExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    // Re-resolve the (unresolved) column expressions against the
    // analyzed child so the logical node enters the planner resolved.
    val resolved = GraftShims.ofRows(spark,
      TopKPerGroupPlan(group, order, k, analyzed))
    resolved
  }
}
