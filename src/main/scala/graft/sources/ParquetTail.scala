package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** PLAIN streaming reads of catalog parquet tables —
  * `spark.readStream.table("graft.lake.t")` — completing the
  * table-to-table streaming story on the columnar tier: with
  * [[ParquetStreamingWrite]] landing per-epoch versions, a downstream
  * query tails those versions with exactly-once offsets.
  *
  * Contract (the Delta `readStream` shape):
  *   - first batch = a full SNAPSHOT of the start version (the current
  *     one, or `option("startVersion", n)` to begin from a pinned
  *     snapshot), then each micro-batch reads exactly the files APPENDED
  *     by the ledger commits since the last offset — offsets are ledger
  *     ordinals, so restart/replay re-reads precisely one commit span;
  *   - `latestOffset` folds pending v1-path appends into a catch-up
  *     commit first (the same rule every maintenance op applies), so
  *     plain `INSERT INTO` rows become streamable without waiting for a
  *     maintenance cycle;
  *   - commits that RETIRE files (compaction, zorder, rebucket, DELETE,
  *     UPDATE, MERGE, complete-mode replacement) fail the stream loudly
  *     by default — an appends-only tail cannot represent them.
  *     `option("skipNonAppends", "true")` skips such commits WHOLE,
  *     which is exact for pure layout maintenance (row set unchanged)
  *     and documented-lossy for row-level DML — use the changelog
  *     sources (`changeFeed` / `graft.sources.ParquetChanges`) when
  *     row-level changes must stream.
  *
  * Why not Spark's v1 FileStreamSource fallback: it tails the raw
  * directory listing, which on a versioned table includes retired-but-
  * not-yet-vacuumed files — duplicates by construction. The ledger is
  * the only correct tailing index. */
class ParquetTailMicroBatchStream(tableDir: String, dataSchema: StructType,
    startVersion: Option[Long], skipNonAppends: Boolean,
    maxCommitsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends streaming.MicroBatchStream
    with streaming.SupportsAdmissionControl {

  private def requireVersioned(): Unit =
    require(ParquetVersions.enabled(tableDir),
      s"streaming read needs a versioned table — enable versioning on $tableDir first")

  override def initialOffset(): streaming.Offset = {
    requireVersioned()
    val v = startVersion match {
      case Some(n) =>
        require(ParquetVersions.get(tableDir, n).isDefined,
          s"startVersion $n: no such version in $tableDir (never committed, or vacuumed)")
        n
      case None =>
        ParquetVersions.catchUp(tableDir)
        ParquetVersions.latest(tableDir).get._1
    }
    ParquetTailOffset(v, snapshotDone = false)
  }

  override def latestOffset(): streaming.Offset = {
    requireVersioned()
    // fold pending plain appends so INSERT INTO rows stream without
    // waiting for a maintenance op to reference them
    ParquetVersions.catchUp(tableDir)
    ParquetTailOffset(ParquetVersions.latest(tableDir).get._1, snapshotDone = true)
  }

  /** Admission control — maxCommitsPerTrigger / maxFilesPerTrigger /
    * maxBytesPerTrigger bound every micro-batch, and the initial
    * SNAPSHOT batch splits into bounded chunks (offset carries a
    * file-index into the snapshot's sorted membership), so a 100 TB
    * table's first batch and a post-downtime catch-up both stream in
    * bounded units instead of one giant batch — the read-side twin of
    * the log tier's cap (LimitHashLog.scala; `hashes.go:68`). Commits
    * admit WHOLE (the commit is the offset unit); at least one chunk /
    * commit always admits for progress. */
  override def getDefaultReadLimit: streaming.ReadLimit =
    ChangeFeed.readLimitOf(maxFilesPerTrigger, maxBytesPerTrigger)

  override def latestOffset(start: streaming.Offset,
      limit: streaming.ReadLimit): streaming.Offset = {
    requireVersioned()
    ParquetVersions.catchUp(tableDir)
    val s = start.asInstanceOf[ParquetTailOffset]
    val (maxF, maxB) = ChangeFeed.limitParts(limit)
    val latest = ParquetVersions.latest(tableDir).get._1
    if (maxF.isEmpty && maxB.isEmpty && maxCommitsPerTrigger.isEmpty) {
      // unlimited: snapshot + full catch-up in one batch, as before
      if (s.snapshotDone && latest == s.version) s
      else ParquetTailOffset(latest, snapshotDone = true)
    } else if (!s.snapshotDone) {
      // snapshot chunking: admit a bounded prefix of the remaining
      // sorted membership; versions advance only once the snapshot
      // completes (its final chunk flips snapshotDone)
      val files = snapshotSorted(s.version)
      if (s.snapIdx >= files.length)
        ParquetTailOffset(s.version, snapshotDone = true, files.length)
      else {
        val sized: Seq[(String, Long)] =
          if (maxB.isEmpty) files.drop(s.snapIdx).map((_, 0L))
          else {
            val sizes = dataSizes()
            files.drop(s.snapIdx).map(n => (n, sizes.getOrElse(n, 0L)))
          }
        val take = ChangeFeed.admitPrefix(sized, maxF, maxB)
        val newIdx = s.snapIdx + take
        ParquetTailOffset(s.version, newIdx >= files.length, newIdx)
      }
    } else {
      // version catch-up: admit whole commits up to the budget;
      // diff bytes are consulted lazily so a deep backlog only stats
      // the files it admits this trigger
      val end = ChangeFeed.admitSpan(s.version, latest,
        maxCommitsPerTrigger, maxF, maxB, diffOf(maxB.isDefined))
      if (end == s.version) s
      else ParquetTailOffset(end, snapshotDone = true)
    }
  }

  /** (file count, bytes) of the files commit `v` APPENDS. */
  private def diffOf(needBytes: Boolean)(v: Long): (Int, Long) = {
    val added = (membership(v) -- membership(v - 1)).toSeq
    if (!needBytes || added.isEmpty) (added.size, 0L)
    else {
      val data = new Path(tableDir, "data")
      val fs = data.getFileSystem(org.apache.spark.sql.GraftShims.hadoopConf())
      val bytes = added.map { n =>
        try fs.getFileStatus(new Path(data, n)).getLen
        catch { case _: java.io.FileNotFoundException => 0L }
      }.sum
      (added.size, bytes)
    }
  }

  // snapshot membership is immutable per version — cache the sorted
  // listing (and, for byte budgets, one data/ walk) per stream
  @transient private var snapCache: (Long, Seq[String]) = _
  private def snapshotSorted(v: Long): Seq[String] = {
    if (snapCache == null || snapCache._1 != v)
      snapCache = (v, membership(v).toSeq.sorted)
    snapCache._2
  }

  @transient private var sizeCache: Map[String, Long] = _
  private def dataSizes(): Map[String, Long] = {
    if (sizeCache == null) {
      val data = new Path(tableDir, "data")
      val fs = data.getFileSystem(org.apache.spark.sql.GraftShims.hadoopConf())
      sizeCache = ParquetVersions.walkData(fs, data)
        .map { case (n, st) => n -> st.getLen }.toMap
    }
    sizeCache
  }

  private def membership(v: Long): Set[String] =
    ParquetVersions.get(tableDir, v).getOrElse(throw new IllegalStateException(
      s"version $v of $tableDir was vacuumed under a running stream")).toSet

  override def planInputPartitions(start: streaming.Offset,
      end: streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ParquetTailOffset]
    val e = end.asInstanceOf[ParquetTailOffset]
    // the snapshot batch applies the snapshot version's delete masks
    // ([[DeleteMasks]]) — a lightweight-deleted row must not leak into
    // the stream any more than into a batch read of the same version
    val snapMasks: Map[String, Seq[String]] =
      if (s.snapshotDone) Map.empty
      else VersionLedger.getPayload(tableDir, s.version)
        .map(_.masks).getOrElse(Map.empty)
    val snapshot: Seq[String] =
      if (s.snapshotDone) Nil
      else {
        // a CHUNKED snapshot batch ends inside the same version: emit
        // exactly [start.snapIdx, end.snapIdx) of the sorted
        // membership; an unchunked (or final) batch takes the rest
        val all = snapshotSorted(s.version)
        val until =
          if (e.version == s.version && !e.snapshotDone) e.snapIdx
          else all.length
        all.slice(s.snapIdx, until)
      }
    val appended: Seq[String] = ((s.version + 1) to e.version).flatMap { v =>
      val prevP = VersionLedger.getPayload(tableDir, v - 1)
      val curP = VersionLedger.getPayload(tableDir, v)
      val prev = membership(v - 1)
      val cur = membership(v)
      val removed = prev -- cur
      // a MERGE-ON-READ delete changes no names, only a file's mask set
      // ([[DeleteMasks]]) — an appends-only tail can't represent that
      // any more than a retirement, and silence here would be data loss
      val maskDelta = prevP.zip(curP).exists { case (a, b) => a.masks != b.masks }
      if (removed.nonEmpty || maskDelta) {
        if (!skipNonAppends) throw new IllegalStateException(
          s"version $v of $tableDir ${if (removed.nonEmpty)
            s"retires ${removed.size} file(s)" else "changes delete masks"} — " +
            "a plain streaming read tails appends only. Stream the change feed " +
            "(option(\"changeFeed\") / graft.sources.ParquetChanges) for " +
            "row-level changes, or set option(\"skipNonAppends\", \"true\") " +
            "to skip maintenance commits whole (exact for compaction/zorder/" +
            "rebucket; LOSSY for UPDATE/DELETE/MERGE).")
        Nil // skipped whole: additions of a retiring commit carry no new rows
      } else (cur -- prev).toSeq.sorted
    }
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(FsConf.get)
    (snapshot ++ appended).distinct.zipWithIndex.map { case (name, i) =>
      val p = new Path(data, name)
      val st = try fs.getFileStatus(p) catch {
        case _: java.io.FileNotFoundException => throw new IllegalStateException(
          s"streamed file $name is gone from $tableDir — vacuumed inside the " +
            "retention window this stream still needed")
      }
      val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty, org.apache.spark.paths.SparkPath.fromPath(st.getPath),
        0L, st.getLen, Array.empty, st.getModificationTime, st.getLen, Map.empty)
      val fp = FilePartition(i, Array(pf))
      // homogeneous batch rule (see [[MaskedReaderFactory]]): when the
      // snapshot carries ANY mask, every partition of this batch wraps
      // (all-row); mask-free batches stay plain and columnar
      if (snapMasks.valuesIterator.forall(_.isEmpty)) fp: InputPartition
      else MaskedFilePartition(fp,
        snapMasks.getOrElse(name, Seq.empty)): InputPartition
    }.toArray
  }

  /** The genuine vectorized parquet reader factory, schema-pinned to
    * the table manifest — built ONCE per stream, not per trigger, and
    * over an EMPTY file index: the factory carries only schema + conf
    * (per-file work comes from each partition's PartitionedFile), so a
    * directory listing here would be an O(files) cost paid every
    * micro-batch for nothing. */
  private lazy val readerFactory: PartitionReaderFactory = {
    val spark = org.apache.spark.sql.classic.SparkSession.active
    // mask-aware wrapper: snapshot partitions of masked files filter
    // their lightweight-deleted rows; unmasked partitions delegate.
    // Predicate masks evaluate on the data row; a DV-bearing list
    // ([[DeletionVectors]]) routes to a second, position-widened
    // factory and projects the survivors back to the stream schema.
    // Both factories are built EAGERLY here on the driver —
    // PinnedParquetFactory touches the session, which does not exist
    // on executors — and the wrapper is a NAMED serializable class: an
    // anonymous PartitionReaderFactory would capture `$outer` = this
    // stream, which is not Serializable, and die on task ship.
    val widenedSchema = PinnedParquetFactory.widen(dataSchema)
    new DvMaskedReaderFactory(
      EpochRouted.wrap(spark, dataSchema, dataSchema,
        PinnedParquetFactory(spark, dataSchema, dataSchema)),
      EpochRouted.wrap(spark, dataSchema, widenedSchema,
        PinnedParquetFactory(spark, dataSchema, widenedSchema)),
      tableDir, widenedSchema, dataSchema)
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def deserializeOffset(json: String): streaming.Offset =
    ParquetTailOffset.fromJson(json)

  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Ledger position of a tail stream: the last fully-read version, plus
  * whether that version's full snapshot has been emitted (false only
  * while a fresh stream drains its first-snapshot chunks). `snapIdx`
  * is the count of snapshot files (of the sorted membership) already
  * emitted — nonzero only mid-snapshot under admission control; the
  * field is omitted from checkpoints written before r16 and defaults
  * to 0 on read. */
case class ParquetTailOffset(version: Long, snapshotDone: Boolean,
    snapIdx: Int = 0)
    extends streaming.Offset {
  override def json(): String =
    s"""{"version":$version,"snapshotDone":$snapshotDone,"snapIdx":$snapIdx}"""
}

object ParquetTailOffset {
  def fromJson(json: String): ParquetTailOffset = {
    val v = "\"version\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalArgumentException(s"bad tail offset: $json"))
      .group(1).toLong
    val done = "\"snapshotDone\"\\s*:\\s*(true|false)".r.findFirstMatchIn(json)
      .map(_.group(1).toBoolean).getOrElse(true)
    val idx = "\"snapIdx\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt).getOrElse(0)
    ParquetTailOffset(v, done, idx)
  }
}

/** Mixin giving a catalog parquet [[Scan]] its micro-batch tail. The
  * batch scan semantics of the mixing class are untouched — streaming
  * planning only ever calls [[Scan.toMicroBatchStream]]. */
trait ParquetTailable extends Scan {
  protected def tailTableDir: String
  protected def tailDataSchema: StructType
  protected def tailOptions: CaseInsensitiveStringMap

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream =
    new ParquetTailMicroBatchStream(tailTableDir, tailDataSchema,
      Option(tailOptions.get("startVersion")).map(_.toLong),
      Option(tailOptions.get("skipNonAppends")).exists(_.toBoolean),
      Option(tailOptions.get("maxCommitsPerTrigger")).map(_.toInt),
      Option(tailOptions.get("maxFilesPerTrigger")).map(_.toInt),
      Option(tailOptions.get("maxBytesPerTrigger")).map(_.toLong))
}
