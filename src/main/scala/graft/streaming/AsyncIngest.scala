package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, SQLContext}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Producer-side facade mirroring the reference's `SaveAsync`
  * (`hashes.go:11-18`): asynchronous, non-durable enqueue with an
  * `enabled` kill switch that silently drops rows (`hashes.go:12-15`).
  *
  * Backed by a [[MemoryStream]] — the Structured Streaming analogue of
  * the reference's in-memory channel (`connect.go:16`). The channel's
  * blocking backpressure at 10 000 rows (`connect.go:11`, `hashes.go:17`)
  * has no analogue for an in-memory test source; on a production source
  * (files/Kafka-shaped) the same bound is source admission control —
  * see [[MicroBatcher]] Scaladoc.
  *
  * In-memory sources are a driver-side test harness by design; the
  * production ingest path is a real streaming source feeding the same
  * [[MicroBatcher]].
  */
final class AsyncIngest[T: Encoder](sqlContext: SQLContext, enabled: Boolean = true) {
  private val stream = MemoryStream[T](implicitly[Encoder[T]], sqlContext)

  /** Enqueue one row; no-op when disabled (rows are dropped, matching
    * the reference's gate — callers get no error). */
  def saveAsync(row: T): Unit = if (enabled) stream.addData(row)

  /** Bulk enqueue (producer loops call this per chunk). */
  def saveAllAsync(rows: Seq[T]): Unit = if (enabled) stream.addData(rows)

  /** The unbounded Dataset to hand to [[MicroBatcher.start]]. */
  def toDS(): Dataset[T] = stream.toDS()
}
