package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{AlwaysTrue, Filter}
import org.apache.spark.sql.types.StructType

/** REPLACE WHERE for catalog PARQUET tables — the idempotent-backfill
  * write (`df.writeTo(t).overwrite(cond)` / `INSERT INTO t REPLACE
  * WHERE cond SELECT ...`) on the parquet tier, composing two existing
  * machines instead of inventing a third:
  *
  *   - the APPEND side is Spark's own `ParquetWrite` untouched — the
  *     wrapper delegates the write builder, writer factory and task
  *     commit protocol, so the payload lands exactly as an INSERT
  *     would (vectorized writers, `part-*` names, `_temporary`
  *     staging);
  *   - the RETIRE side is [[ParquetDelete]]'s three-valued
  *     footer-stats classify: files whose bounds can't match are never
  *     read, provably-all-matching files drop without I/O, and only
  *     genuinely straddling files rewrite (distributed).
  *
  * Commit order and visibility: the payload commits first (its files
  * are fenced OUT of the delete inputs by name — a backfill's payload
  * matches the very condition it replaces), then the retirement runs,
  * and on a VERSIONED table ([[ParquetVersions]]) retirement, rewrites
  * and payload publish as ONE ledger version — `VERSION AS OF` readers
  * see the old state or the new, never between. Current-state readers
  * can see (old ∪ new) transiently between the payload landing and the
  * publish — the same contract as the log tier's un-versioned delete,
  * and the price of Spark's v1 file-commit renaming files straight
  * into `data/`. Un-versioned tables retire through the staged
  * `data.next` generation swap (crash-repaired on next load).
  *
  * `truncate()` maps to `overwrite(AlwaysTrue)` — which on a versioned
  * table makes `.writeTo(t).overwrite(lit(true))` a HISTORY-PRESERVING
  * truncate (the v1 `INSERT OVERWRITE` path physically clears `data/`
  * and is documented-destructive on versioned tables; this one keeps
  * every retired file for pinned readers until vacuum). */
class ParquetReplaceWriteBuilder(inner: WriteBuilder, spark: SparkSession,
    tableDir: String, declared: StructType, queryId: String = "")
    extends WriteBuilder with SupportsOverwrite {

  private var owFilters: Option[Array[Filter]] = None

  override def canOverwrite(filters: Array[Filter]): Boolean =
    filters.forall(ParquetDelete.supported(declared))

  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(ParquetDelete.supported(declared)),
      s"unsupported REPLACE WHERE filters: ${filters.mkString(", ")}")
    owFilters = Some(filters)
    this
  }

  override def truncate(): WriteBuilder =
    overwrite(Array[Filter](AlwaysTrue()))

  override def build(): Write = owFilters match {
    case None =>
      // plain append: batch stays Spark's own ParquetWrite; streaming
      // (writeStream.toTable) goes through the epoch-versioned sink
      val b = inner.build()
      new Write {
        override def toBatch: BatchWrite = b.toBatch
        override def toStreaming: streaming.StreamingWrite =
          new ParquetStreamingWrite(tableDir, declared, queryId, truncate = false)
        override def description(): String = b.description()
      }
    case Some(filters) =>
      new ParquetReplaceWrite(inner.build(), spark, tableDir, filters,
        declared, queryId)
  }
}

/** The wrapping Write: delegate everything task-side, intercept the
  * driver commit to run the retirement and the single publish. */
class ParquetReplaceWrite(inner: Write, spark: SparkSession,
    tableDir: String, filters: Array[Filter],
    declared: StructType = null, queryId: String = "") extends Write {

  override def description(): String =
    s"${inner.description()} REPLACE WHERE ${filters.mkString(" AND ")}"

  /** Streaming truncate = complete output mode: each epoch's commit
    * REPLACES the table's membership ([[ParquetStreamingWrite]]).
    * Filtered REPLACE WHERE has no streaming counterpart. */
  override def toStreaming: streaming.StreamingWrite = {
    require(filters.forall(_.isInstanceOf[AlwaysTrue]) && declared != null,
      s"streaming REPLACE WHERE supports only truncate (complete mode); " +
        s"got ${filters.mkString(", ")}")
    new ParquetStreamingWrite(tableDir, declared, queryId, truncate = true)
  }

  override def toBatch: BatchWrite = {
    val innerBatch = inner.toBatch
    new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        innerBatch.createBatchWriterFactory(info)
      override def useCommitCoordinator(): Boolean =
        innerBatch.useCommitCoordinator()
      override def onDataWriterCommit(message: WriterCommitMessage): Unit =
        innerBatch.onDataWriterCommit(message)
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        innerBatch.abort(messages)

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val versioned = ParquetVersions.enabled(tableDir)
        // fold pre-existing un-ledgered appends FIRST, so "rows visible
        // before this replace" and "rows the ledger references" agree —
        // the retirement below reads only referenced files (plus the
        // payload, which it protects), and an append racing past this
        // point serializes after the whole operation
        if (versioned) ParquetVersions.catchUp(tableDir)
        val pre = ParquetVersions.listing(tableDir).toSet
        innerBatch.commit(messages)
        val appended = ParquetVersions.listing(tableDir).toSet -- pre
        ParquetDelete.deleteCore(spark, tableDir, filters,
          protect = appended, alsoPublish = appended.toSeq.sorted,
          preCaughtUp = versioned)
        ()
      }
    }
  }
}
