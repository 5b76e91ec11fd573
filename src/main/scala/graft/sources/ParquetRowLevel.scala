package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** The `_file` metadata column of catalog parquet tables: which data
  * file a row lives in (Iceberg's `_file`) — provenance when projected,
  * the GROUP identity for copy-on-write UPDATE / MERGE / DELETE. */
object ParquetFileMetaColumn extends MetadataColumn {
  override def name(): String = "_file"
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String = "data file name holding the row"
}

/** Group-based (copy-on-write) row-level operations for catalog PARQUET
  * tables — SQL `UPDATE`, `MERGE INTO`, and arbitrary-predicate
  * `DELETE` through `SupportsRowLevelOperations`, completing the DML
  * triangle on the parquet tier (VERDICT r9 next-round #1; the log tier
  * shape is [[LogRowLevelOperation]], the reference posture is
  * warehouse-side mutations, `hashes_test.go:235-239`).
  *
  * Same three-act structure as the log tier:
  *
  *   1. [[ParquetGroupScan]] reads complete rows of the live files plus
  *      the `_file` metadata column — through Spark's own
  *      `ParquetFileFormat` reader (vectorized parquet decode; `_file`
  *      appended as a per-partition constant), one input partition per
  *      file.
  *   2. **Runtime group filtering** (`SupportsRuntimeV2Filtering` on
  *      `_file`): the optimizer's dynamic-pruning subquery proves which
  *      FILES hold matching rows; only those are read and rewritten —
  *      at 100 TB an UPDATE of one key touches the files footer stats
  *      say can match, not the table.
  *   3. [[ParquetReplaceDataWrite]] writes replacement files through
  *      Spark's own parquet `OutputWriterFactory` into a staging dir,
  *      renames them into `data/` under maintenance names
  *      (`rlo-<query>-<pid>.parquet`), and publishes ONE
  *      [[ParquetVersions]] commit: `previous − replaced ∪ written`.
  *      An un-versioned table is auto-upgraded first, so the swap is
  *      atomic and a reader planned before the publish keeps its
  *      snapshot; a crash before the publish leaves only unreferenced
  *      maintenance-named files the live rule ignores.
  *
  * Zone-provable DELETEs still take the metadata-only
  * [[ParquetDelete]] path (`canDeleteWhere`); predicates the footer
  * proof can't handle (modulo, UDF-ish shapes) fall back to this
  * group-based rewrite instead of failing. */
class ParquetRowLevelOperation(val tableDir: String, val declared: StructType,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** One memoized scan per operation — Spark plans the main read and
    * the group-filter subquery against the SAME scan, so the runtime
    * filter that narrows the read also narrows the replaced set (the
    * Iceberg pattern, same as [[LogRowLevelOperation]]). */
  @volatile private[sources] var configuredScan: ParquetGroupScan = _
  private var builder: ScanBuilder = _

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(ParquetFileMetaColumn.name()))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    synchronized {
      if (builder == null) builder = new ScanBuilder {
        override def build(): Scan = ParquetRowLevelOperation.this.synchronized {
          if (configuredScan == null) {
            configuredScan = new ParquetGroupScan(tableDir, declared)
          }
          configuredScan
        }
      }
      builder
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val got = info.schema().fieldNames.toSeq
    val want = declared.fieldNames.toSeq
    require(got == want,
      s"row-level write schema $got does not match the table schema $want")
    new WriteBuilder {
      override def build(): Write =
        new ParquetReplaceDataWrite(ParquetRowLevelOperation.this, tableDir,
          declared, info.queryId())
    }
  }

  override def description(): String =
    s"ParquetRowLevelOperation[$cmd] dir=$tableDir"
}

/** The operation's scan: every row of every live file, plus `_file`.
  * No column pruning and no data filters by design — a copy-on-write
  * write-back needs complete rows, and dropping a ROW here would
  * silently delete it. Only whole FILES are dropped, on proof: the
  * runtime `_file` filter keeps exactly the groups the dynamic-pruning
  * subquery found matching rows in. */
class ParquetGroupScan(tableDir: String, declared: StructType)
    extends Scan with Batch with SupportsRuntimeV2Filtering {

  private def spark = org.apache.spark.sql.classic.SparkSession.active

  /** Live snapshot pinned at scan creation ([[ParquetVersions.live]]
    * on a versioned table, the raw listing otherwise) — a maintenance
    * commit landing mid-operation cannot change the replaced set. */
  private val pinned: Seq[(String, Long, Long)] = {
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // committed-file walk ([[ParquetVersions.walkData]]): partitioned
    // tables nest files under partition dirs; names data/-relative
    val all = ParquetVersions.walkData(fs, data)
      .map { case (rel, s) => (rel, s.getLen, s.getModificationTime) }
    val live: Set[String] =
      if (ParquetVersions.enabled(tableDir)) ParquetVersions.live(tableDir).toSet
      else all.map(_._1).toSet
    all.filter(s => live(s._1)).sortBy(_._1)
  }

  /** Delete masks in force at scan creation ([[DeleteMasks]]): a
    * masked row is already deleted, so the group rewrite must not copy
    * it into a replacement file — and the rewrite retires the input
    * names, purging their masks in the same commit. The write's commit
    * re-validates this snapshot against the ledger (mask-conflict
    * guard) so a concurrent merge-on-read DELETE/UPDATE cannot be
    * silently undone. */
  private[sources] val masks: Map[String, Seq[String]] =
    if (ParquetVersions.enabled(tableDir))
      ParquetVersions.masksFor(tableDir, None).filter(_._2.nonEmpty)
    else Map.empty

  /** Surviving files after runtime group filtering; starts at the full
    * pinned set (no filter ⇒ full-table rewrite, which is what an
    * unconditioned UPDATE means). */
  @volatile private[sources] var currentFiles: Seq[(String, Long, Long)] = pinned

  private[sources] def currentFileNames: Seq[String] = currentFiles.map(_._1)

  override def readSchema(): StructType = StructType(
    declared.fields :+
      StructField(ParquetFileMetaColumn.name(), StringType, nullable = false))

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(ParquetFileMetaColumn.name()))

  /** Runtime filter: IN / = on `_file`. Conjuncts we can interpret
    * narrow the file set exactly; anything else is ignored — keeping
    * extra files only means rewriting identical bytes, never a wrong
    * result. */
  override def filter(predicates: Array[Predicate]): Unit = {
    val allowed: Seq[Set[String]] = predicates.toSeq.flatMap(fileValues)
    if (allowed.nonEmpty) {
      val keep = allowed.reduce(_ intersect _)
      currentFiles = pinned.filter { case (n, _, _) => keep(n) }
    }
  }

  private def fileValues(p: Predicate): Option[Set[String]] = p.name() match {
    case "IN" | "=" =>
      val ch = p.children()
      ch.headOption match {
        case Some(ref: NamedReference)
            if ref.fieldNames().sameElements(Array(ParquetFileMetaColumn.name())) =>
          val lits = ch.tail.collect {
            case l: Literal[_] if l.value() != null => l.value().toString
          }
          // all values must be literals we understood, or the predicate
          // proves nothing (never drop a file on a partial parse)
          if (lits.length == ch.length - 1) Some(lits.toSet) else None
        case _ => None
      }
    case _ => None
  }

  override def toBatch: Batch = this

  /** One task per file: a rewrite wants per-file parallelism, and the
    * `_file` constant is exact per partition. */
  override def planInputPartitions(): Array[InputPartition] =
    currentFiles.map { case (name, len, mtime) =>
      ParquetGroupPartition(name,
        new Path(new Path(tableDir, "data"), name).toString, len, mtime,
        masks.getOrElse(name, Seq.empty)): InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    // Spark's own parquet reader (vectorized decode, returning rows):
    // built on the driver, serializable, closes over the session conf.
    // The second, position-widened variant serves partitions whose
    // masks carry deletion vectors ([[DeletionVectors]]) — the extra
    // [[DeleteMasks.POS_COL]] long is populated by the reader itself.
    def buildFn(full: StructType, read: StructType)
        : PartitionedFile => Iterator[InternalRow] =
      new ParquetFileFormat().buildReaderWithPartitionValues(
        spark, full, new StructType(), read, Seq.empty,
        Map(FileFormat.OPTION_RETURNING_BATCH -> "false"),
        spark.sessionState.newHadoopConf())
    val widenedSchema = StructType(declared.fields :+
      StructField(DeleteMasks.POS_COL, org.apache.spark.sql.types.LongType))
    val readFunc = buildFn(declared, declared)
    val readFuncPos = buildFn(declared, widenedSchema)
    // renamed tables ([[Renames]]): pre-rename files read under their
    // own name vectors through epoch twins (layout-identical rows);
    // the factory resolves each file's vintage from its footer
    val epochFns = Renames.epochReadSchemas(declared, declared).map {
      case (full, rs) =>
        val rsPos = StructType(rs.fields :+
          StructField(DeleteMasks.POS_COL, org.apache.spark.sql.types.LongType))
        (rs, buildFn(full, rs), buildFn(full, rsPos))
    }
    new ParquetGroupReaderFactory(readFunc, readFuncPos, declared,
      widenedSchema, tableDir, epochFns)
  }

  override def description(): String =
    s"ParquetGroupScan dir=$tableDir files=${currentFiles.size}/${pinned.size}"
}

/** One live data file — the copy-on-write group unit (with its delete
  * masks, applied before the `_file` tag so masked rows never reach a
  * replacement file). */
case class ParquetGroupPartition(name: String, path: String, len: Long,
    mtime: Long, maskPreds: Seq[String] = Seq.empty) extends InputPartition

class ParquetGroupReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow],
    readFuncPos: PartitionedFile => Iterator[InternalRow],
    declared: StructType, widenedSchema: StructType,
    tableDir: String,
    epochFns: Seq[(StructType,
      PartitionedFile => Iterator[InternalRow],
      PartitionedFile => Iterator[InternalRow])] = Seq.empty)
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ParquetGroupPartition]
    val pf = PartitionedFile(InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPathString(p.path), 0L, p.len,
      Array.empty, p.mtime, p.len)
    // DV-bearing masks read through the position-widened variant and
    // project survivors back to declared width before the `_file` tag
    val dv = DeletionVectors.anyDv(p.maskPreds)
    // pre-rename files route to their epoch's read functions
    val (fn, fnPos) =
      if (epochFns.isEmpty) (readFunc, readFuncPos)
      else {
        val conf = org.apache.spark.sql.GraftShims.hadoopConf()
        val cols = Renames.fileColumns(conf,
          new Path(new java.net.URI(p.path)), p.len)
        val i = Renames.resolve(cols, declared, epochFns.map(_._1), declared)
        if (i < 0) (readFunc, readFuncPos)
        else (epochFns(i)._2, epochFns(i)._3)
      }
    val it = if (dv) fnPos(pf) else fn(pf)
    val deleted: InternalRow => Boolean =
      if (p.maskPreds.isEmpty) _ => false
      else DeleteMasks.compiledRowFilter(tableDir,
        if (dv) widenedSchema else declared, p.maskPreds)
    val proj: InternalRow => InternalRow =
      if (dv) {
        val up = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(declared)
        r => up(r)
      } else identity
    new PartitionReader[InternalRow] {
      private val fileRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(p.name)))
      private val joined = new JoinedRow
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (it.hasNext) {
          val r = it.next()
          if (!deleted(r)) { cur = proj(r); return true }
        }
        false
      }
      override def get(): InternalRow = joined(cur, fileRow)
      override def close(): Unit = it match {
        case c: AutoCloseable => c.close()
        case _ =>
      }
    }
  }
}

/** The `ReplaceData` write: Spark's parquet `OutputWriterFactory`
  * writes replacement files into a staging dir; the driver renames
  * them into `data/` under deterministic maintenance names and
  * publishes one version commit. */
class ParquetReplaceDataWrite(op: ParquetRowLevelOperation, tableDir: String,
    declared: StructType, queryId: String) extends Write {

  override def toBatch: BatchWrite = new BatchWrite {
    private def spark = org.apache.spark.sql.classic.SparkSession.active
    private val stagingDir = new Path(tableDir, s".rlo-$queryId")

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, declared)
      // a bucketed table KEEPS its layout through UPDATE/MERGE: each
      // writer computes every replacement row's bucket from its own
      // key bytes (same murmur3-pmod as the layout), so rewritten
      // files come back fully tagged and the scan's key-grouped
      // partitioning claim survives the operation
      val bucketBy: Option[(Int, Int)] =
        ParquetBucketing.layoutFor(tableDir, declared)
          .map { case (spec, idx) => (idx, spec.n) }
      new ParquetStageWriterFactory(owf,
        new SerializableConfiguration(job.getConfiguration), declared,
        stagingDir.toString, bucketBy)
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val scan = op.configuredScan
      require(scan != null,
        "ParquetReplaceDataWrite.commit before any scan was planned — " +
          "the replaced group set is unknown")
      val replaced = scan.currentFileNames.toSet
      val data = new Path(tableDir, "data")
      val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)

      // the version ledger IS the atomicity mechanism — upgrade an
      // un-versioned table first (v1 = the pre-operation listing;
      // staged dot-dir files are invisible to it)
      if (!ParquetVersions.enabled(tableDir)) ParquetVersions.enable(tableDir)

      val written = Seq.newBuilder[String]
      messages.foreach {
        case ParquetStageCommit(staged, pid) =>
          staged.zipWithIndex.foreach { case ((path, tag), j) =>
            val name = f"rlo-$queryId-$pid%05d-$j" +
              tag.fold("")(k => s"-b$k") + ".parquet"
            val to = new Path(data, name)
            if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
            if (!fs.rename(new Path(path), to)) {
              throw new java.io.IOException(
                s"ParquetReplaceDataWrite: rename $path -> $to failed")
            }
            written += name
          }
        case _ =>
      }
      fs.delete(stagingDir, true)

      val writtenNames = written.result()
      if (replaced.nonEmpty || writtenNames.nonEmpty) {
        // visibility event: one commit — replaced inputs out, written
        // replacements in; appends racing the op are folded forward by
        // the catch-up inside ParquetVersions.commit. The publish is
        // GUARDED against masks committed on the replaced inputs since
        // the scan pinned them (a concurrent merge-on-read
        // DELETE/UPDATE): Spark's write path cannot re-execute the
        // rewrite, so the conflict surfaces as a loud
        // concurrent-modification failure — re-run the statement
        // (ADVICE r11, the Delta ConcurrentDeleteException posture).
        try {
          ParquetVersions.commitGuarded(tableDir, None, Map.empty,
            ParquetVersions.guardFor(replaced, scan.masks)) { prev =>
            (prev.toSet -- replaced ++ writtenNames).toSeq
          }
        } catch {
          case e: VersionLedger.MaskConflictException =>
            writtenNames.foreach(n => fs.delete(new Path(data, n), false))
            throw new IllegalStateException(
              "row-level operation aborted: a concurrent merge-on-read " +
                "DELETE/UPDATE committed on the files this statement was " +
                "rewriting; no changes were published — re-run the " +
                "statement against the new table state", e)
        }
        ()
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = stagingDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(stagingDir, true)
      ()
    }
  }

  override def description(): String =
    s"ParquetReplaceDataWrite dir=$tableDir"
}

/** Staged replacement files of one task: (path, bucket tag) pairs —
  * one file per task on an unbucketed table, one per written bucket on
  * a bucketed one. */
case class ParquetStageCommit(staged: Seq[(String, Option[Int])], pid: Int)
    extends WriterCommitMessage

class ParquetStageWriterFactory(owf: OutputWriterFactory,
    conf: SerializableConfiguration, schema: StructType, stagingDir: String,
    bucketBy: Option[(Int, Int)] = None)
    extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-rlo", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val ctx = new TaskAttemptContextImpl(conf.value, attempt)
    // task-unique staged names: speculative attempts never collide, and
    // the driver renames exactly the committed attempt's files
    def pathFor(tag: Option[Int]): String =
      s"$stagingDir/stage-$partitionId-$taskId" +
        tag.fold("")(k => s"-b$k") + ".parquet"

    new DataWriter[InternalRow] {
      private val writers = scala.collection.mutable.Map.empty[Option[Int],
        org.apache.spark.sql.execution.datasources.OutputWriter]

      /** The row's layout bucket: same murmur3(seed 42) pmod n as the
        * bucketed write path and the catalog `bucket` function; a NULL
        * key hashes to the seed, matching `hash(col)` semantics. */
      private def tagOf(row: InternalRow): Option[Int] = bucketBy.map {
        case (idx, n) =>
          val h = if (row.isNullAt(idx)) 42
            else org.apache.spark.sql.GraftShims.murmur3(row.getUTF8String(idx))
          math.floorMod(h, n)
      }

      override def write(row: InternalRow): Unit = {
        val tag = tagOf(row)
        writers.getOrElseUpdate(tag,
          owf.newInstance(pathFor(tag), schema, ctx)).write(row)
      }
      override def commit(): WriterCommitMessage = {
        writers.values.foreach(_.close())
        // an empty writer set stages nothing: a fully-deleted group
        // simply leaves no replacement file
        ParquetStageCommit(writers.keys.toSeq.map(t => (pathFor(t), t)), partitionId)
      }
      override def abort(): Unit = {
        writers.values.foreach(_.close())
        writers.keys.foreach { t =>
          val p = new Path(pathFor(t))
          val fs = p.getFileSystem(conf.value)
          if (fs.exists(p)) fs.delete(p, false)
        }
        ()
      }
      override def close(): Unit = ()
    }
  }
}
