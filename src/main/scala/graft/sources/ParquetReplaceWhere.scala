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

  /** Self-arranging payload for a bucketed table
    * ([[ParquetBucketing.layoutFor]] — spec canonicalized to the
    * schema's column spelling), or Spark's own write otherwise. */
  private def payloadWrite(): Write =
    ParquetBucketing.layoutFor(tableDir, declared) match {
      case Some((spec, idx)) =>
        new BucketedParquetAppendWrite(tableDir, declared, queryId, spec, idx)
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
    }

  override def build(): Write = owFilters match {
    case None =>
      // Self-arranging bucketed appends (the log tier's
      // RequiresDistributionAndOrdering contract on the parquet tier):
      // a plain INSERT INTO a bucketed table lands n fully-tagged
      // `b<k>-` files instead of untagged `part-*` files that would
      // downgrade every storage-partitioned join until rebuild.
      payloadWrite()
    case Some(filters) =>
      // REPLACE WHERE's payload self-arranges too: on a bucketed table
      // the backfill lands tagged `b<k>-append-` files, so the repeated
      // daily backfill never erodes the join layout
      new ParquetReplaceWrite(payloadWrite(), spark, tableDir, filters,
        declared, queryId)
  }
}

/** SELF-ARRANGING bucketed append for catalog parquet tables: a batch
  * write into a table with a `.bucketspec` asks Spark to cluster the
  * data on the bucket column into EXACTLY n partitions
  * (`RequiresDistributionAndOrdering`). The layout hash IS
  * `HashPartitioning`'s (murmur3 seed 42, pmod), so partition id ==
  * bucket id and each task stages exactly ONE tagged file — n files
  * per insert, no n×m small-file blowup. Correctness never rests on
  * the distribution: [[ParquetStageWriterFactory]] tags every row from
  * its own key bytes, so a mis-clustered row simply opens a second
  * per-bucket writer in that task.
  *
  * Committed files are APPEND-NAMED (`b<k>-append-…`, the bucketed
  * writer namespace): the ledger's live rule treats them exactly like
  * `part-*` appends — visible immediately, folded by the next
  * catch-up, never vacuumed while un-referenced. No version publish
  * here, same contract as every other plain append. */
class BucketedParquetAppendWrite(tableDir: String, declared: StructType,
    queryId: String, spec: LogBucketing.Spec, keyIdx: Int)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  import org.apache.spark.sql.connector.distributions
  import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}

  override def requiredDistribution(): distributions.Distribution =
    distributions.Distributions.clustered(Array(Expressions.column(spec.col)))
  override def requiredNumPartitions(): Int = spec.n
  override def requiredOrdering(): Array[SortOrder] = Array.empty

  override def description(): String =
    s"BucketedParquetAppendWrite dir=$tableDir bucket(${spec.n}, ${spec.col})"

  override def toStreaming: streaming.StreamingWrite =
    new ParquetStreamingWrite(tableDir, declared, queryId, truncate = false)

  override def toBatch: BatchWrite = new BatchWrite {
    private def spark = org.apache.spark.sql.classic.SparkSession.active
    private val stagingDir = new org.apache.hadoop.fs.Path(tableDir, s".bapp-$queryId")

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      val owf = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .prepareWrite(spark, job, Map.empty, declared)
      new ParquetStageWriterFactory(owf,
        new org.apache.spark.util.SerializableConfiguration(job.getConfiguration),
        declared, stagingDir.toString, Some((keyIdx, spec.n)))
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val data = new org.apache.hadoop.fs.Path(tableDir, "data")
      val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(data)
      messages.foreach {
        case ParquetStageCommit(staged, pid) =>
          staged.zipWithIndex.foreach { case ((path, tag), j) =>
            val k = tag.getOrElse(throw new IllegalStateException(
              s"bucketed append staged an untagged file: $path"))
            val name = f"b$k-append-$queryId-$pid%05d-$j.parquet"
            val to = new org.apache.hadoop.fs.Path(data, name)
            if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
            if (!fs.rename(new org.apache.hadoop.fs.Path(path), to)) {
              throw new java.io.IOException(
                s"BucketedParquetAppendWrite: rename $path -> $to failed")
            }
          }
        case _ =>
      }
      fs.delete(stagingDir, true)
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = stagingDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(stagingDir, true)
      ()
    }
  }
}

/** The wrapping Write: delegate everything task-side, intercept the
  * driver commit to run the retirement and the single publish. A
  * bucketed payload's clustering requirement is forwarded, so the
  * backfill also lands pre-arranged. */
class ParquetReplaceWrite(inner: Write, spark: SparkSession,
    tableDir: String, filters: Array[Filter],
    declared: StructType = null, queryId: String = "") extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution = inner match {
    case r: org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering =>
      r.requiredDistribution()
    case _ =>
      org.apache.spark.sql.connector.distributions.Distributions.unspecified()
  }
  override def requiredNumPartitions(): Int = inner match {
    case r: org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering =>
      r.requiredNumPartitions()
    case _ => 0
  }
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] = inner match {
    case r: org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering =>
      r.requiredOrdering()
    case _ => Array.empty
  }

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
