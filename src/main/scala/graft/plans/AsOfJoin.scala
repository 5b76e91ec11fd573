package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.GraftShims

/** Native LEFT as-of join — the second whole-operator Catalyst
  * extension, this time a BINARY node (two-child distribution and
  * ordering requirements, a zipped per-partition merge). Semantics:
  * for every left row, attach the most recent right row of the same
  * key with rightTime <= leftTime (inclusive — DuckDB ASOF JOIN
  * semantics, which is the oracle), or nulls if none.
  *
  * vs the composition form ([[graft.operators.AsOf.leftAsOf]]: tag +
  * union + carry-forward window): the union materializes a combined
  * (left+right)-wide row stream and the window machinery buffers each
  * key's run; this operator asks EnsureRequirements for co-partitioned
  * hash distributions and per-partition (key, time) sort — the same
  * physical contract as a sort-merge join — then streams BOTH sides
  * through a two-pointer merge holding exactly ONE candidate right row
  * at a time. Cost shape at 100 TB: one exchange per side, one sort
  * per side, O(1) merge memory, no combined-row materialization.
  */
object AsOfJoin {

  /** Logical node: left as-of join; right columns become nullable. */
  case class AsOfJoinPlan(
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "asOfJoin: need matching, non-empty key lists")
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinPlan(lk, rk, lt, rt, left, right) =>
        AsOfJoinExec(lk, rk, lt, rt, planLater(left), planLater(right)) :: Nil
      case _ => Nil
    }
  }

  case class AsOfJoinExec(
      leftKeys: Seq[Expression], rightKeys: Seq[Expression],
      leftTime: Expression, rightTime: Expression,
      left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // SMJ's contract: both sides clustered on their keys —
    // EnsureRequirements co-partitions them (same partitioning, same
    // partition count), so zipPartitions below is key-aligned.
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // per-partition (keys, time) ascending on both sides
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
      (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

    override def outputPartitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] =
      (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeysL = leftKeys; val rKeysL = rightKeys
      val lTimeL = leftTime; val rTimeL = rightTime
      val lOut = left.output; val rOut = right.output
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        // (keys :+ time) projections; lexicographic natural ordering
        // gives: (rk, rt) <= (lk, lt) iff rk < lk, or rk == lk && rt <= lt
        val lProj = UnsafeProjection.create(lKeysL :+ lTimeL, lOut)
        val rProj = UnsafeProjection.create(rKeysL :+ rTimeL, rOut)
        val lKeyProj = UnsafeProjection.create(lKeysL, lOut)
        val rKeyProj = UnsafeProjection.create(rKeysL, rOut)
        val fullCmp = RowOrdering.createNaturalAscendingOrdering(
          (lKeysL :+ lTimeL).map(_.dataType))
        val keyCmp = RowOrdering.createNaturalAscendingOrdering(
          lKeysL.map(_.dataType))
        val nullRight = new GenericInternalRow(rOut.size)
        val joined = new JoinedRow
        val resultProj = UnsafeProjection.create(outAttrs.map(a => a: Expression), outAttrs)
        val rBuf = rIter.buffered
        var lastMatch: InternalRow = null
        var lastMatchKey: InternalRow = null
        lIter.map { lRow =>
          val lSort = lProj(lRow)
          // advance the right cursor through every row at or before
          // (lk, lt); remember the newest same-key row seen
          while (rBuf.hasNext && fullCmp.compare(rProj(rBuf.head), lSort) <= 0) {
            val r = rBuf.next()
            lastMatch = r.copy()
            lastMatchKey = rKeyProj(r).copy()
          }
          val lKey = lKeyProj(lRow)
          if (lastMatch != null && keyCmp.compare(lastMatchKey, lKey) == 0)
            resultProj(joined(lRow, lastMatch))
          else
            resultProj(joined(lRow, nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Idempotent registration (Sessions.base / explicit callers). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy

  /** Bind a column against ONE child's output — names like the key or
    * time column typically exist on both sides, so leaving resolution
    * to the analyzer would be ambiguous. */
  private def bind(child: LogicalPlan, c: Column): Expression =
    GraftShims.catalystExpression(c).transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        child.output.find(_.name == u.nameParts.last).getOrElse(
          throw new IllegalArgumentException(
            s"asOfJoin: column '${u.name}' not found in " +
              child.output.map(_.name).mkString("[", ", ", "]")))
    }

  /** DataFrame API. Rename clashing right-side column NAMES before
    * calling if you want to select them unambiguously afterwards — the
    * output carries both sides' columns. */
  def asOfJoin(left: DataFrame, right: DataFrame,
      leftKeys: Seq[Column], rightKeys: Seq[Column],
      leftTime: Column, rightTime: Column): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = left.queryExecution.analyzed
    // re-alias the right side: both inputs often derive from the same
    // scan, whose attributes would then carry IDENTICAL expression ids
    // on both sides — the join output could not tell them apart. The
    // alias projection mints fresh ids (a no-op otherwise).
    val rPlan = right.select(right.columns.map(n => right(n).as(n)): _*)
      .queryExecution.analyzed
    GraftShims.ofRows(spark, AsOfJoinPlan(
      leftKeys.map(bind(lPlan, _)), rightKeys.map(bind(rPlan, _)),
      bind(lPlan, leftTime), bind(rPlan, rightTime),
      lPlan, rPlan))
  }
}
