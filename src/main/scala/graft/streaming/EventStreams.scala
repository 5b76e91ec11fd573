package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._
import graft.Event

/** Event-time streaming extensions beyond the reference (which is
  * processing-time only — SURVEY.md §2.2 "Streaming" row): watermarked
  * tumbling windows and stateful sessionization.
  *
  * 100 TB posture: state is bounded — the window aggregation keeps one
  * row per (window, type) and the watermark evicts closed windows; the
  * sessionizer keeps one open session per user. Both are keyed by
  * user/type, so state shards across executors.
  */
object EventStreams {

  /** Watermarked tumbling-window aggregation over a streaming Dataset.
    * The transform is source-agnostic: tests drive it with a
    * MemoryStream, production with any event-time source. */
  def windowedCounts(events: Dataset[Event]): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(9, 2))).cast(DoubleType).as("value_sum"))

  /** One closed user session: maximal event run with < 30 min gaps. */
  final case class Session(user_id: Long, session_id: Int, n_events: Long,
      start_ts: Timestamp, end_ts: Timestamp)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start: Timestamp, end: Timestamp,
      n: Long, nextId: Int)

  private val GapMicros = 30L * 60 * 1000000

  private def micros(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** Gap-based sessionizer for `flatMapGroupsWithState`: events of one
    * user (sorted by event time) extend the open session or close it and
    * start a new one; closed sessions are emitted, the open one stays in
    * state for the next micro-batch. */
  def sessionize(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (micros(e.ts), e.event_id))
    var cur = state.getOption
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    sorted.foreach { e =>
      cur match {
        case Some(s) if micros(e.ts) - micros(s.end) <= GapMicros =>
          cur = Some(s.copy(end = e.ts, n = s.n + 1))
        case Some(s) =>
          closed += Session(userId, s.nextId, s.n, s.start, s.end)
          cur = Some(SessionState(e.ts, e.ts, 1, s.nextId + 1))
        case None =>
          cur = Some(SessionState(e.ts, e.ts, 1, 1))
      }
    }
    cur.foreach(state.update)
    closed.iterator
  }

  /** Apply the sessionizer to a streaming Dataset. */
  def sessions(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout)(sessionize)
  }

  /** Per-user streaming funnel state: the user's own funnel-step events
    * (t, step) — exactly the buffer ClickHouse's `windowFunnel` aggregate
    * keeps, bounded by that user's activity, never by stream length. */
  final case class FunnelState(evs: Seq[(Long, Int)])

  final case class FunnelLevel(user_id: Long, funnel_level: Int)

  /** Streaming `windowFunnel` (the incremental form of Behavioral.q56):
    * each micro-batch merges the user's new funnel events into state and
    * re-runs the greedy one-pass fold over the sorted accumulated set —
    * so cross-batch ordering doesn't matter (a late-arriving early event
    * lands in its sorted place on the next recompute). The emitted level
    * is monotone non-decreasing in the event set (more events can only
    * extend chains), so `max(level)` over the update stream equals the
    * batch answer on the same events. */
  def funnelLevels(events: Dataset[Event], windowMicros: Long,
      steps: Map[String, Int]): Dataset[FunnelLevel] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelLevel](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelState]) =>
          val fresh = it.flatMap(e =>
            steps.get(e.event_type).map(s => (micros(e.ts), s))).toVector
          val all = (state.getOption.map(_.evs).getOrElse(Vector.empty) ++ fresh)
            .sorted
          state.update(FunnelState(all))
          Iterator.single(FunnelLevel(uid,
            graft.functions.FunnelExpr.levelOf(all, windowMicros, steps.values.max)))
      }
  }
}
