package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.MetadataColumn
import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The `_segment` metadata column: which segment file a row lives in.
  * Non-null by construction (every row is read out of exactly one
  * committed segment). */
object LogSegmentMetaColumn extends MetadataColumn {
  override def name(): String = LimitHashLog.SEGMENT_COL
  override def dataType(): DataType = StringType
  override def isNullable: Boolean = false
  override def comment(): String = "log segment file holding the row"
}

/** The `_lpos` metadata column: the row's 0-based line ordinal within
  * its segment file — the log tier's row-position domain (parquet's
  * `_metadata.row_index` twin). Positions count every physical line,
  * so they are stable under pushdown and masking; the positional-DV
  * machinery ([[DeletionVectors]]) keys on them. */
object LogLposMetaColumn extends MetadataColumn {
  override def name(): String = LimitHashLog.LPOS_COL
  override def dataType(): DataType =
    org.apache.spark.sql.types.LongType
  override def isNullable: Boolean = false
  override def comment(): String = "0-based line ordinal within the segment"
}

/** Group-based (copy-on-write) row-level operations for the entity log —
  * SQL `UPDATE`, `MERGE INTO`, and arbitrary-predicate `DELETE` through
  * Spark's `SupportsRowLevelOperations` API, completing the DML triangle
  * the reference's warehouse offers natively (ClickHouse lightweight
  * DELETE + mutation UPDATE; the probe cycle `hashes_test.go:235-239`
  * mutates between reads). Zone-provable DELETEs still take the
  * metadata-only [[LogDelete]] path; everything else lands here.
  *
  * How Spark drives it (the Iceberg copy-on-write shape):
  *
  *   1. The rewrite rule reads the table through [[LogGroupScan]] with
  *      the `_segment` metadata column attached, computes the full
  *      replacement rows (updated + untouched survivors, plus MERGE
  *      inserts), and plans a `ReplaceData` write.
  *   2. **Runtime group filtering**: the scan implements
  *      `SupportsRuntimeV2Filtering` on `_segment`, so the optimizer
  *      plans a dynamic-pruning subquery — `SELECT DISTINCT _segment
  *      WHERE <condition>` — and hands the matching segment names back
  *      before the main scan plans. Only segments PROVABLY holding
  *      matching rows are read and rewritten; at 100 TB an UPDATE of
  *      one user touches the handful of segments that user's rows
  *      occupy, not the log. (The subquery is planned through this same
  *      memoized group scan — full rows, no planning-time filter
  *      pushdown, by design: pushing filters into a scan SHARED with
  *      the main read could drop rows from the copy-on-write write-back.
  *      The subquery therefore reads the log once; the payoff is that
  *      the REWRITE — the expensive, write-amplifying side — touches
  *      only proven segments.)
  *   3. [[LogReplaceDataWrite]] stages replacement segments through the
  *      standard `_staged-*` / rename protocol, then publishes ONE new
  *      version: `previous − replaced ∪ written`. The version publish
  *      is the visibility event — a crash before it leaves the log
  *      exactly as it was (staged files are invisible; renamed-but-
  *      uncommitted segments are not in any version), and a reader
  *      pinned to an older version is never disturbed. An un-versioned
  *      log is auto-upgraded ([[LogVersions.enable]]) so the swap is
  *      atomic — there is no non-versioned rename-then-delete window.
  *
  * Concurrency: safe under concurrent APPENDS (segments are immutable;
  * a writer landing mid-operation adds names the version transform
  * preserves). Concurrent MAINTENANCE (compaction / DELETE / another
  * row-level op) keeps the single-maintainer contract those ops already
  * document. */
class LogRowLevelOperation(private[sources] val path: String,
    cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** The one scan of this operation. Spark builds scans twice — once
    * for the main read, once inside the group-filter subquery — and the
    * write must commit against exactly the segment set the MAIN read
    * planned; memoizing a single scan (the Iceberg pattern) makes both
    * plans share it, so the runtime filter that narrows the read also
    * narrows the replaced set. */
  @volatile private[sources] var configuredScan: LogGroupScan = _
  private var builder: ScanBuilder = _

  override def command(): RowLevelOperation.Command = cmd

  override def requiredMetadataAttributes(): Array[NamedReference] =
    Array(Expressions.column(LimitHashLog.SEGMENT_COL))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    synchronized {
      if (builder == null) builder = new ScanBuilder {
        override def build(): Scan = LogRowLevelOperation.this.synchronized {
          if (configuredScan == null) configuredScan = new LogGroupScan(path)
          configuredScan
        }
      }
      builder
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val got = info.schema().fieldNames.toSeq
    val want = LimitHashLog.SCHEMA.fieldNames.toSeq
    require(got == want,
      s"row-level write schema $got does not match the log schema $want")
    new WriteBuilder {
      override def build(): Write =
        new LogReplaceDataWrite(LogRowLevelOperation.this, path, info.queryId())
    }
  }

  override def description(): String = s"LogRowLevelOperation[$cmd] path=$path"
}

/** The operation's scan: every row of every surviving segment, plus
  * `_segment`. No column pruning and no data filters by design — a
  * copy-on-write write-back needs complete rows, and dropping a ROW
  * here would silently delete it. Only whole SEGMENTS are dropped, on
  * proof: the runtime `_segment` filter keeps exactly the groups the
  * dynamic-pruning subquery found matching rows in. */
class LogGroupScan(path: String) extends Scan with Batch
    with SupportsRuntimeV2Filtering {

  /** Snapshot pinned at scan creation — same isolation as the batch
    * scan: a maintenance commit landing mid-operation cannot add or
    * drop segments under us (the version CAS at commit time is what
    * reconciles concurrent appends). Membership AND delete masks come
    * from the same payload read: the copy-on-write write-back must
    * never resurrect a merge-on-read-deleted row into a rewritten
    * segment, and the publish re-checks the observed masks
    * ([[VersionLedger.MaskGuard]]). */
  private val pinnedWithMasks: (Seq[(String, Long)], Map[String, Seq[String]]) =
    LimitHashLog.segmentsAndMasksAllowed(path, None, None)
  private val pinned: Seq[(String, Long)] = pinnedWithMasks._1
  private[sources] def pinnedMasks: Map[String, Seq[String]] = pinnedWithMasks._2

  /** Surviving segments after runtime group filtering; starts at the
    * full pinned set (no filter ⇒ full-table rewrite, which is what an
    * unconditioned UPDATE means). */
  @volatile private[sources] var currentSegments: Seq[(String, Long)] = pinned

  private[sources] def currentSegmentNames: Seq[String] =
    currentSegments.map { case (f, _) => new Path(f).getName }

  override def readSchema(): StructType = StructType(
    LimitHashLog.SCHEMA.fields :+
      StructField(LimitHashLog.SEGMENT_COL, StringType, nullable = false))

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column(LimitHashLog.SEGMENT_COL))

  /** Runtime filter: IN / = on `_segment`. Conjuncts we can interpret
    * narrow the segment set exactly; anything else is ignored — keeping
    * extra segments only means rewriting identical bytes, never a wrong
    * result. */
  override def filter(predicates: Array[Predicate]): Unit = {
    val allowed: Seq[Set[String]] = predicates.toSeq.flatMap(segmentValues)
    if (allowed.nonEmpty) {
      val keep = allowed.reduce(_ intersect _)
      currentSegments = pinned.filter { case (f, _) => keep(new Path(f).getName) }
    }
  }

  /** Extract the allowed `_segment` name set from an IN / = predicate;
    * None when the predicate isn't a provable segment restriction. */
  private def segmentValues(p: Predicate): Option[Set[String]] = p.name() match {
    case "IN" | "=" =>
      val ch = p.children()
      ch.headOption match {
        case Some(ref: NamedReference)
            if ref.fieldNames().sameElements(Array(LimitHashLog.SEGMENT_COL)) =>
          val lits = ch.tail.collect {
            case l: Literal[_] if l.value() != null => l.value().toString
          }
          // all values must be literals we understood, or the predicate
          // proves nothing (never drop a segment on a partial parse)
          if (lits.length == ch.length - 1) Some(lits.toSet) else None
        case _ => None
      }
    case _ => None
  }

  override def toBatch: Batch = this

  /** One task per segment — a rewrite wants the same parallelism shape
    * as [[LogDelete]]: each affected segment streams once, independently. */
  override def planInputPartitions(): Array[InputPartition] =
    currentSegments.map { case (f, _) => LogSegmentPartition(f): InputPartition }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new LogSegmentReaderFactory(readSchema(), Array.empty, masks = pinnedMasks)

  override def description(): String =
    s"LogGroupScan path=$path segments=${currentSegments.size}/${pinned.size}"
}

/** The `ReplaceData` write: stage → rename → single version publish.
  * Deterministic committed names `segment-rlo-<queryId>-<pid>` keep
  * retried stages replace-only, like every other writer in this source. */
class LogReplaceDataWrite(op: LogRowLevelOperation, path: String, queryId: String)
    extends Write {

  override def toBatch: BatchWrite = new BatchWrite {
    // a bucketed log KEEPS its layout through UPDATE/MERGE: the bucketed
    // writer computes each replacement row's bucket from its own key
    // bytes, so the rewritten segments come back fully tagged and the
    // scan's key-grouped partitioning claim survives the operation
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new LogWriterFactory(path, s"rlo-$queryId", LogBucketing.readSpec(path))

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val scan = op.configuredScan
      require(scan != null,
        "LogReplaceDataWrite.commit before any scan was planned — " +
          "the replaced group set is unknown")
      val replaced = scan.currentSegmentNames
      val dir = new Path(path)
      val fs = dir.getFileSystem(FsConf.get)

      // the version ledger IS the atomicity mechanism — upgrade an
      // un-versioned log first (v1 = the pre-operation listing; staged
      // `_` files are invisible to it)
      val upgraded = !LogVersions.enabled(path)
      if (upgraded) LogVersions.enable(path)
      // Auto-upgrade append race (ADVICE r9): a concurrent appender
      // that observed enabled=false renames its segment WITHOUT a
      // ledger publish; if that rename lands after enable()'s snapshot
      // listing, the segment is in no version and the publish below
      // would silently drop it. Re-list after the upgrade and union
      // every segment referenced by NO version into the commit — on an
      // already-versioned log every writer publishes itself, so this
      // only runs (and is only sound) in the upgrade window, where no
      // maintenance commit can have left vacuum-pending names yet.
      val lateAppends: Set[String] =
        if (!upgraded) Set.empty
        else {
          val referenced = VersionLedger.referencedByAny(path)
          LimitHashLog.segments(path)
            .map { case (f, _) => new Path(f).getName }
            .filterNot(referenced).toSet
        }

      val committedNames = scala.collection.mutable.ArrayBuffer.empty[String]
      val manifest = Map.newBuilder[String, SegmentStats]
      def rename(staged: String, to: Path, stats: Option[SegmentStats]): Unit = {
        if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
        if (!fs.rename(new Path(staged), to)) {
          throw new java.io.IOException(
            s"LogReplaceDataWrite: rename $staged -> $to failed")
        }
        stats.foreach(st => manifest += (to.getName -> st))
        committedNames += to.getName
      }
      messages.foreach {
        case LogCommit(staged, pid, stats) =>
          if (staged.nonEmpty) {
            rename(staged, new Path(dir, s"segment-rlo-$queryId-$pid"), stats)
          }
        case LogBucketedCommit(parts, pid) =>
          parts.foreach { case (staged, b, st) =>
            rename(staged, new Path(dir, s"segment-rlo-$queryId-$pid-b$b"), Some(st))
          }
      }
      LimitHashLog.writeManifest(fs, dir, s"rlo-$queryId", manifest.result())

      // visibility event: one CAS publish — replaced inputs out, written
      // replacements in; segments appended concurrently survive untouched.
      // GUARDED: the rewrite read its inputs under the masks pinned at
      // scan creation — a concurrent merge-on-read DELETE masking (or a
      // rewrite retiring) one of them aborts loudly instead of being
      // silently undone by this publish (the write path cannot re-read,
      // so it fails rather than retries).
      if (replaced.nonEmpty || committedNames.nonEmpty) {
        val replacedSet = replaced.toSet
        val guard =
          if (replacedSet.isEmpty) None
          else Some(VersionLedger.MaskGuard(replacedSet,
            scan.pinnedMasks.view.filterKeys(replacedSet).toMap))
        LogVersions.commitGuarded(path, Map.empty, guard) { prev =>
          (prev.toSet ++ lateAppends -- replaced ++ committedNames).toSeq
        }
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(FsConf.get)
      messages.foreach {
        case LogCommit(staged, _, _) if staged.nonEmpty =>
          val p = new Path(staged)
          if (fs.exists(p)) fs.delete(p, false)
        case LogBucketedCommit(parts, _) =>
          parts.foreach { case (staged, _, _) =>
            val p = new Path(staged)
            if (fs.exists(p)) fs.delete(p, false)
          }
        case _ =>
      }
    }
  }

  override def description(): String = s"LogReplaceDataWrite path=$path"
}
