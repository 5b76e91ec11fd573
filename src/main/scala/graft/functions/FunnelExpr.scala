package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** ClickHouse `windowFunnel(window)(ts, cond1, …, condN)` re-expressed as
  * a native codegen expression over a time-sorted per-group event array.
  *
  * Semantics (non-strict mode, mirroring the ClickHouse aggregate): the
  * result is the largest L such that the group contains a chain
  * e1 ≤ e2 ≤ … ≤ eL (by timestamp) where e_i matches condition i and
  * every chain event lies within `window` of the CHAIN'S FIRST event
  * (t_i − t_1 ≤ window). Implemented as the standard greedy single pass
  * over events sorted by (ts, step): `starts(k)` holds the latest
  * feasible chain-start timestamp among all valid (k+1)-chains seen so
  * far; a step-1 event overwrites `starts(0)` (a later start never hurts
  * — it can only leave more window room), and a step-s event extends when
  * `t − starts(s−2) ≤ window`. Greedy ≡ exists-a-chain: keeping the
  * maximal feasible start dominates every other choice, which is what
  * lets the DuckDB oracle state the exists-form directly as joins.
  *
  * Scale shape: the expression runs AFTER a per-group
  * `sort_array(collect_list(struct(ts, step)))` — per-group state is the
  * group's own funnel events only (exactly the ClickHouse aggregate's
  * buffer), one shuffle, no window function, no self-join. Input steps
  * are 1-based and ≤ `steps`; rows not matching any condition must be
  * filtered out before aggregation.
  */
case class FunnelExpr(child: Expression, window: Long, steps: Int)
    extends UnaryExpression {
  require(steps >= 1 && steps <= 32, "funnel steps must be in [1, 32]")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_window_funnel"

  override protected def nullSafeEval(input: Any): Any =
    FunnelExpr.level(input.asInstanceOf[ArrayData], window, steps)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FunnelExpr.level($c, ${window}L, $steps)")

  override protected def withNewChildInternal(newChild: Expression): FunnelExpr =
    copy(child = newChild)
}

object FunnelExpr {
  import org.apache.spark.sql.GraftShims.{column, expression}

  /** `evs`: array<struct<t: long, step: int>> sorted ascending (struct
    * sort = (t, step) lexicographic, so same-timestamp events process in
    * step order — the deterministic tie-break both engines share). */
  def level(evs: ArrayData, window: Long, steps: Int): Int = {
    val starts = new Array[Long](steps)
    val set = new Array[Boolean](steps)
    var lvl = 0
    val m = evs.numElements()
    var i = 0
    while (i < m && lvl < steps) {
      if (!evs.isNullAt(i)) {
        val e = evs.getStruct(i, 2)
        val t = e.getLong(0)
        val s = e.getInt(1)
        if (s == 1) {
          starts(0) = t // latest step-1 start dominates
          set(0) = true
          if (lvl < 1) lvl = 1
        } else if (set(s - 2) && t - starts(s - 2) <= window) {
          starts(s - 1) = starts(s - 2) // chain keeps its FIRST event's time
          set(s - 1) = true
          if (s > lvl) lvl = s
        }
      }
      i += 1
    }
    lvl
  }

  /** Column wrapper: `evs` must be the sorted struct array described on
    * [[FunnelExpr]]; `windowMicros` in the same unit as the `t` field. */
  def windowFunnel(evs: Column, windowMicros: Long, steps: Int): Column =
    column(FunnelExpr(expression(evs), windowMicros, steps))

  /** Same greedy pass over a plain sorted (t, step) sequence — the form
    * the streaming funnel's per-user state uses (its state lives in a
    * typed `GroupState`, not a Catalyst row). BehavioralSpec pins this
    * and the expression path to each other on random inputs. */
  def levelOf(evs: Seq[(Long, Int)], window: Long, steps: Int): Int = {
    val starts = new Array[Long](steps)
    val set = new Array[Boolean](steps)
    var lvl = 0
    val it = evs.iterator
    while (it.hasNext && lvl < steps) {
      val (t, s) = it.next()
      if (s == 1) {
        starts(0) = t
        set(0) = true
        if (lvl < 1) lvl = 1
      } else if (s >= 2 && s <= steps && set(s - 2) && t - starts(s - 2) <= window) {
        starts(s - 1) = starts(s - 2)
        set(s - 1) = true
        if (s > lvl) lvl = s
      }
    }
    lvl
  }
}
