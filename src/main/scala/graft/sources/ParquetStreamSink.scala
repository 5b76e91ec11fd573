package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** STREAMING writes into catalog parquet tables —
  * `df.writeStream.toTable("graft.lake.t")` — with epoch exactly-once
  * through the version ledger, mirroring the log tier's
  * [[LogStreamingWrite]] contract on the parquet machinery:
  *
  *   - task writers stage through Spark's own parquet
  *     `OutputWriterFactory` (same vectorized writers as every other
  *     parquet write in the engine) into a per-epoch dot-directory;
  *   - the driver commit renames them to DETERMINISTIC names —
  *     `stream-<queryId>-<epochId>-<partition>-<j>[-b<k>].parquet` — so
  *     a replayed epoch (failure between sink commit and checkpoint
  *     write-ahead) overwrites its own files instead of duplicating
  *     them, and the ledger `distinct` absorbs the re-publish:
  *     effectively-once, the same argument as the log tier's
  *     epoch-stamped segments;
  *   - every epoch publishes ONE ledger version (un-versioned tables
  *     auto-upgrade on first commit), so concurrent batch readers pin
  *     consistent snapshots while the stream lands, time travel and the
  *     change feed see one commit per epoch, and maintenance
  *     (compaction, zorder) runs concurrently without quiescing the
  *     stream;
  *   - a BUCKETED table keeps its layout: writers tag each staged file
  *     with its murmur3-pmod bucket (same hash as the layout), so
  *     streamed appends stay storage-partitioned and same-spec joins
  *     remain exchange-free — no post-hoc `rebucket_table` needed;
  *   - complete-output-mode (`truncate`) commits publish a version
  *     whose membership is EXACTLY this epoch's files: the table is
  *     replaced, not appended, while prior versions stay pinned-readable
  *     until vacuum.
  *
  * The `queryId` is Structured Streaming's stable query id (from the
  * checkpoint), not the per-run id — restarts keep the same file-name
  * space, which is what makes the replayed-epoch overwrite argument
  * hold across process boundaries.
  *
  * Reference posture: this is the reference's whole job — micro-batched
  * ingest into a warehouse table (`hashes.go:33-66`) — landing on the
  * engine's OTHER storage tier; the log tier's sink covers the
  * line-oriented entity log, this one the columnar fact tables. */
class ParquetStreamingWrite(tableDir: String, declared: StructType,
    queryId: String, truncate: Boolean) extends StreamingWrite {

  private def spark = org.apache.spark.sql.classic.SparkSession.active
  private def stagingBase = new Path(tableDir, s".stream-$queryId").toString

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      spark.sessionState.newHadoopConf())
    val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, declared)
    val bucketBy: Option[(Int, Int)] =
      ParquetBucketing.layoutFor(tableDir, declared)
        .map { case (spec, idx) => (idx, spec.n) }
    new ParquetStreamWriterFactory(owf,
      new SerializableConfiguration(job.getConfiguration), declared,
      stagingBase, bucketBy)
  }

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the ledger IS the visibility mechanism — first streamed epoch
    // upgrades an un-versioned table (v1 = the pre-stream listing)
    if (!ParquetVersions.enabled(tableDir)) ParquetVersions.enable(tableDir)
    val written = Seq.newBuilder[String]
    messages.foreach {
      case ParquetStageCommit(staged, pid) =>
        staged.zipWithIndex.foreach { case ((path, tag), j) =>
          val name = f"stream-$queryId-$epochId-$pid%05d-$j" +
            tag.fold("")(k => s"-b$k") + ".parquet"
          val to = new Path(data, name)
          if (fs.exists(to)) fs.delete(to, false) // epoch replay: replace
          if (!fs.rename(new Path(path), to)) {
            throw new java.io.IOException(
              s"ParquetStreamingWrite: rename $path -> $to failed")
          }
          written += name
        }
      case _ =>
    }
    fs.delete(new Path(s"$stagingBase-$epochId"), true)
    val names = written.result()
    // a REPLAYED epoch retires its predecessor attempt's files for the
    // same (queryId, epochId) in the same publish: deterministic names
    // normally overwrite themselves, but a restart with different
    // parallelism or row routing can land the same rows under DIFFERENT
    // (pid, j) indices — without the retire, both attempts' files stay
    // live and the rows double (ADVICE r11). The trailing '-' keeps
    // epoch 1 from matching epoch 10. Retired files become unreferenced
    // maintenance names vacuum reclaims after the in-flight grace.
    val epochPrefix = s"stream-$queryId-$epochId-"
    ParquetVersions.commit(tableDir) { prev =>
      // truncate (complete mode): membership = this epoch, full stop.
      // append: replayed names collapse via distinct, never duplicate.
      val kept = prev.filterNot(_.startsWith(epochPrefix))
      val merged = if (truncate) names else kept ++ names
      merged.distinct.sorted
    }
    ()
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val staging = new Path(s"$stagingBase-$epochId")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    ()
  }

  override def toString: String =
    s"ParquetStreamingWrite dir=$tableDir truncate=$truncate"
}

/** Per-epoch staging: each epoch's writers stage under
  * `.stream-<queryId>-<epochId>/`, so concurrent epochs (continuous
  * retries) never cross-contaminate and abort can delete exactly one
  * epoch's residue. */
class ParquetStreamWriterFactory(owf: OutputWriterFactory,
    conf: SerializableConfiguration, schema: StructType, stagingBase: String,
    bucketBy: Option[(Int, Int)]) extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new ParquetStageWriterFactory(owf, conf, schema,
      s"$stagingBase-$epochId", bucketBy).createWriter(partitionId, taskId)
}
