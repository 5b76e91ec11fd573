package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{streaming => sread}
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Change data feed between two snapshots of a versioned table — the
  * Delta CDF / Iceberg changelog shape, derived entirely from the
  * version ledger's SEGMENT diffs, never from row comparisons over the
  * full table:
  *
  *   - a segment present in `to` but not `from` contributes its rows as
  *     `insert`s; present in `from` but not `to`, as `delete`s. Since
  *     every writer (append, compaction, DELETE, UPDATE, MERGE) commits
  *     whole segments, the diff is exact at segment granularity, and
  *     segments common to both versions — the overwhelming majority on
  *     a 100 TB table — are never read at all.
  *   - reads go through the normal sources with an explicit file list
  *     (`option("segments", ...)` on the log scan; direct file paths on
  *     the parquet tier), so planning touches only the diff.
  *
  * Two output modes:
  *
  *   - **changelog** (`net = false`): one block per intermediate
  *     commit, tagged `_change_type` ∈ {insert, delete} and
  *     `_commit_version` (the ordinal at which the change became
  *     visible). A segment rewritten by copy-on-write appears as its
  *     old rows deleted + new rows inserted at that commit — faithful
  *     to what each commit physically replaced.
  *   - **net** (`net = true`): the endpoint-to-endpoint row diff.
  *     Segment names common to both endpoints cancel for free; the
  *     carried-over rows inside rewritten segments (copy-on-write
  *     copies untouched rows into new files) are cancelled row-level
  *     with a multiset EXCEPT ALL between just the two diff row sets —
  *     the result is exactly `snapshot(to) EXCEPT ALL snapshot(from)`
  *     (inserts) and the reverse (deletes), computed without scanning
  *     either snapshot.
  *
  * Both modes only need the ledger's membership lists, so they work on
  * any span whose versions are inside the vacuum retention window; a
  * vacuumed segment fails loudly through the sources' pinned-read
  * checks rather than under-reporting changes. */
object ChangeFeed {

  val CHANGE_TYPE_COL = "_change_type"
  val COMMIT_VERSION_COL = "_commit_version"

  /** Change feed of a LOG table directory between ledger ordinals
    * `fromVersion` (exclusive) and `toVersion` (inclusive). */
  def logChanges(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, net: Boolean = false): DataFrame = {
    val read = (names: Seq[String], pinned: Long) => spark.read
      .format(LimitHashLog.FORMAT)
      .option("versionAsOf", pinned)
      .option("segments", names.mkString(","))
      .load(dir)
    changes(spark, fromVersion, toVersion, net,
      v => LogVersions.get(dir, v).getOrElse(throw new IllegalArgumentException(
        s"version $v does not exist for $dir")),
      read,
      emptyOf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), LimitHashLog.SCHEMA))
  }

  /** Change feed of a catalog PARQUET table directory (same contract).
    * Data files are plain parquet under `data/`, so the diff reads are
    * direct vectorized parquet scans of exactly the named files. */
  def parquetChanges(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, net: Boolean = false): DataFrame = {
    require(SchemaManifest.exists(dir),
      s"$dir has no _schema.json — not a catalog parquet table")
    val schema = {
      val json = SchemaManifest.readJson(dir)
      org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }
    val base = new Path(dir, "data")
    val read = (names: Seq[String], _: Long) => spark.read.schema(schema)
      .parquet(names.map(n => new Path(base, n).toString): _*)
    changes(spark, fromVersion, toVersion, net,
      v => ParquetVersions.get(dir, v).getOrElse(throw new IllegalArgumentException(
        s"version $v does not exist for $dir")),
      read,
      emptyOf = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema))
  }

  /** Shared tier-independent core: `membership` resolves a version's
    * file-name list; `read(names, pinnedVersion)` produces their rows. */
  private def changes(spark: SparkSession, fromVersion: Long, toVersion: Long,
      net: Boolean, membership: Long => Seq[String],
      read: (Seq[String], Long) => DataFrame, emptyOf: => DataFrame): DataFrame = {
    require(fromVersion <= toVersion,
      s"change span is [from, to] with from <= to; got ($fromVersion, $toVersion)")
    def block(names: Seq[String], pinned: Long, kind: String, commit: Long) =
      read(names, pinned)
        .withColumn(CHANGE_TYPE_COL, lit(kind))
        .withColumn(COMMIT_VERSION_COL, lit(commit))
    val emptyBlock = emptyOf
      .withColumn(CHANGE_TYPE_COL, lit(""))
      .withColumn(COMMIT_VERSION_COL, lit(0L))
      .limit(0)

    if (net) {
      val fromNames = membership(fromVersion).toSet
      val toNames = membership(toVersion).toSet
      val added = (toNames -- fromNames).toSeq.sorted
      val removed = (fromNames -- toNames).toSeq.sorted
      val ins = if (added.isEmpty) emptyBlock
        else block(added, toVersion, "insert", toVersion)
      val del = if (removed.isEmpty) emptyBlock
        else block(removed, fromVersion, "delete", toVersion)
      val dataCols = emptyOf.columns.toSeq
      // cancel copy-on-write carry-over rows: a rewritten segment holds
      // mostly rows identical to the ones it replaced; EXCEPT ALL on the
      // data columns nets them out, leaving exactly the endpoint diff
      val insNet = ins.select(dataCols.map(col): _*)
        .exceptAll(del.select(dataCols.map(col): _*))
        .withColumn(CHANGE_TYPE_COL, lit("insert"))
        .withColumn(COMMIT_VERSION_COL, lit(toVersion))
      val delNet = del.select(dataCols.map(col): _*)
        .exceptAll(ins.select(dataCols.map(col): _*))
        .withColumn(CHANGE_TYPE_COL, lit("delete"))
        .withColumn(COMMIT_VERSION_COL, lit(toVersion))
      insNet.unionByName(delNet)
    } else {
      val steps = ((fromVersion + 1) to toVersion).map { v =>
        val prev = membership(v - 1).toSet
        val cur = membership(v).toSet
        val added = (cur -- prev).toSeq.sorted
        val removed = (prev -- cur).toSeq.sorted
        val ins = if (added.isEmpty) emptyBlock
          else block(added, v, "insert", v)
        val del = if (removed.isEmpty) emptyBlock
          else block(removed, v - 1, "delete", v)
        ins.unionByName(del)
      }
      if (steps.isEmpty) emptyBlock else steps.reduce(_ unionByName _)
    }
  }

  /** A table's streaming changelog schema: its data columns plus the
    * two change-feed tags. */
  def streamSchemaOf(dataSchema: StructType): StructType = StructType(
    dataSchema.fields ++ Seq(
      StructField(CHANGE_TYPE_COL, StringType, nullable = false),
      StructField(COMMIT_VERSION_COL, LongType, nullable = false)))

  /** The log tier's streaming changelog schema. */
  val LOG_STREAM_SCHEMA: StructType = streamSchemaOf(LimitHashLog.SCHEMA)
}

/** STREAMING changelog of a versioned log —
  * `spark.readStream.format(LimitHashLog.FORMAT)
  *   .option("changeFeed", "true").load(dir)`:
  * the Delta CDF streaming read. Offsets are LEDGER ORDINALS (not
  * segment sets): each micro-batch emits the per-commit changelog
  * blocks of `(startOrdinal, endOrdinal]` — inserts from segments a
  * commit added, DELETES from segments it removed — so a downstream
  * materialization can apply retractions, which the plain streaming
  * read (inserts only, no visibility into maintenance commits) cannot
  * express. `option("startVersion", n)` seeds a fresh stream at
  * ordinal n (changes SINCE snapshot n); default = the current latest
  * (changes from now on). Checkpoint restarts resume from the
  * committed ordinal; a restart whose next versions were vacuumed
  * fails loudly rather than under-reporting. */
class LogChangesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"limit_hash_log_changes(`$path`)"
  override def schema(): StructType = ChangeFeed.LOG_STREAM_SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = ChangeFeed.LOG_STREAM_SCHEMA
        override def toMicroBatchStream(checkpointLocation: String): sread.MicroBatchStream =
          new LogChangesMicroBatchStream(path,
            Option(options.get("startVersion")).map(_.toLong))
        override def description(): String = s"LogChangesScan path=$path"
      }
    }
}

/** Offset = the newest ledger ordinal whose changes have been emitted. */
case class LogVersionOffset(ordinal: Long) extends sread.Offset {
  override def json(): String = ordinal.toString
}

/** One changelog block: a segment's rows tagged (changeType, commit). */
case class CdcSegmentPartition(file: String, changeType: String, commit: Long)
    extends InputPartition

class LogChangesMicroBatchStream(path: String, startVersion: Option[Long])
    extends sread.MicroBatchStream {

  private def requireVersioned(): Unit =
    require(LogVersions.enabled(path),
      s"change feed needs a versioned log — enable versioning on $path first")

  override def initialOffset(): sread.Offset = {
    requireVersioned()
    startVersion match {
      case Some(v) =>
        require(LogVersions.get(path, v).isDefined,
          s"startVersion $v: no such version in $path (never committed, or vacuumed)")
        LogVersionOffset(v)
      case None => LogVersionOffset(LogVersions.latest(path).get._1)
    }
  }

  override def latestOffset(): sread.Offset = {
    requireVersioned()
    LogVersionOffset(LogVersions.latest(path).get._1)
  }

  override def planInputPartitions(start: sread.Offset,
      end: sread.Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LogVersionOffset].ordinal
    val to = end.asInstanceOf[LogVersionOffset].ordinal
    if (to <= from) return Array.empty
    // qualified path per live NAME; a diff member missing from the
    // listing was vacuumed inside the retention window a reader still
    // needed — fail loudly, never silently under-report changes
    val listed = LimitHashLog.segments(path)
      .map { case (f, _) => (new Path(f).getName, f) }.toMap
    def resolve(n: String): String = listed.getOrElse(n,
      throw new IllegalStateException(
        s"change-feed segment $n is gone from $path — vacuumed inside " +
          "the retention window this stream still needed"))
    def membership(v: Long): Set[String] =
      LogVersions.get(path, v).getOrElse(throw new IllegalStateException(
        s"version $v of $path was vacuumed under a running change feed")).toSet
    ((from + 1) to to).flatMap { v =>
      val prev = membership(v - 1)
      val cur = membership(v)
      (cur -- prev).toSeq.sorted.map(n => CdcSegmentPartition(resolve(n), "insert", v)) ++
        (prev -- cur).toSeq.sorted.map(n => CdcSegmentPartition(resolve(n), "delete", v))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcSegmentReaderFactory()

  override def deserializeOffset(json: String): sread.Offset =
    LogVersionOffset(json.trim.toLong)

  override def commit(end: sread.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Delegates row parsing to the plain segment reader, appending the
  * constant (change_type, commit_version) tail per block. */
class CdcSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CdcSegmentPartition(f, kind, commit) =>
        val inner = new LogSegmentReader(f, LimitHashLog.SCHEMA, Array.empty)
        val tail = new GenericInternalRow(
          Array[Any](UTF8String.fromString(kind), commit))
        val joined = new JoinedRow()
        new PartitionReader[InternalRow] {
          override def next(): Boolean = inner.next()
          override def get(): InternalRow = joined(inner.get(), tail)
          override def close(): Unit = inner.close()
        }
    }
}

/** STREAMING changelog of a versioned catalog PARQUET table — the
  * parquet tier's [[LogChangesTable]]:
  * `spark.readStream.format("graft.sources.ParquetChanges")
  *   .option("path", tableDir).load()`. Same ledger-ordinal offsets and
  * per-commit insert/delete blocks; rows are decoded by Spark's own
  * vectorized parquet reader factory, one partition per diff file with
  * the (change_type, commit_version) tail joined per block. */
class ParquetChanges extends org.apache.spark.sql.connector.catalog.TableProvider {
  private def dataSchema(tableDir: String): StructType = {
    require(SchemaManifest.exists(tableDir),
      s"$tableDir has no _schema.json — not a catalog parquet table")
    SchemaManifest.read(tableDir, "streaming changelog")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeFeed.streamSchemaOf(dataSchema(options.get("path")))

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = properties.get("path")
    new ParquetChangesTable(dir, dataSchema(dir))
  }

  override def supportsExternalMetadata(): Boolean = false
}

class ParquetChangesTable(tableDir: String, dataSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"parquet_changes(`$tableDir`)"
  override def schema(): StructType = ChangeFeed.streamSchemaOf(dataSchema)
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.Collections.singleton(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String): sread.MicroBatchStream =
          new ParquetChangesMicroBatchStream(tableDir, dataSchema,
            Option(options.get("startVersion")).map(_.toLong))
        override def description(): String = s"ParquetChangesScan dir=$tableDir"
      }
    }
}

class ParquetChangesMicroBatchStream(tableDir: String, dataSchema: StructType,
    startVersion: Option[Long]) extends sread.MicroBatchStream {

  private def requireVersioned(): Unit =
    require(ParquetVersions.enabled(tableDir),
      s"change feed needs a versioned table — enable versioning on $tableDir first")

  override def initialOffset(): sread.Offset = {
    requireVersioned()
    startVersion match {
      case Some(v) =>
        require(ParquetVersions.get(tableDir, v).isDefined,
          s"startVersion $v: no such version in $tableDir (never committed, or vacuumed)")
        LogVersionOffset(v)
      case None => LogVersionOffset(ParquetVersions.latest(tableDir).get._1)
    }
  }

  override def latestOffset(): sread.Offset = {
    requireVersioned()
    LogVersionOffset(ParquetVersions.latest(tableDir).get._1)
  }

  override def planInputPartitions(start: sread.Offset,
      end: sread.Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[LogVersionOffset].ordinal
    val to = end.asInstanceOf[LogVersionOffset].ordinal
    if (to <= from) return Array.empty
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(new org.apache.hadoop.conf.Configuration())
    def pf(name: String): org.apache.spark.sql.execution.datasources.PartitionedFile = {
      val p = new Path(data, name)
      val st = try fs.getFileStatus(p) catch {
        case _: java.io.FileNotFoundException => throw new IllegalStateException(
          s"change-feed file $name is gone from $tableDir — vacuumed inside " +
            "the retention window this stream still needed")
      }
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty, org.apache.spark.paths.SparkPath.fromPath(st.getPath),
        0L, st.getLen, Array.empty, st.getModificationTime, st.getLen,
        Map.empty)
    }
    def membership(v: Long): Set[String] =
      ParquetVersions.get(tableDir, v).getOrElse(throw new IllegalStateException(
        s"version $v of $tableDir was vacuumed under a running change feed")).toSet
    ((from + 1) to to).flatMap { v =>
      val prev = membership(v - 1)
      val cur = membership(v)
      (cur -- prev).toSeq.sorted.map(n => CdcParquetPartition(pf(n), "insert", v)) ++
        (prev -- cur).toSeq.sorted.map(n => CdcParquetPartition(pf(n), "delete", v))
    }.toArray
  }

  /** ONE genuine parquet reader factory serves every diff file: the
    * per-file work is driven by the PartitionedFile in each partition,
    * and the factory carries only schema + conf — built once per
    * stream over an EMPTY index (a data/ listing here would cost
    * O(files) per micro-batch for nothing). */
  private lazy val readerFactory: PartitionReaderFactory = {
    val spark = org.apache.spark.sql.classic.SparkSession.active
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      spark, Seq.empty, Map.empty, Some(dataSchema))
    val builder = new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      spark, index, dataSchema, dataSchema,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    builder.pruneColumns(dataSchema)
    new CdcParquetReaderFactory(builder.build().createReaderFactory())
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def deserializeOffset(json: String): sread.Offset =
    LogVersionOffset(json.trim.toLong)

  override def commit(end: sread.Offset): Unit = ()
  override def stop(): Unit = ()
}

case class CdcParquetPartition(
    file: org.apache.spark.sql.execution.datasources.PartitionedFile,
    changeType: String, commit: Long) extends InputPartition

class CdcParquetReaderFactory(inner: PartitionReaderFactory)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CdcParquetPartition(f, kind, commit) =>
        val delegate = inner.createReader(
          org.apache.spark.sql.execution.datasources.FilePartition(0, Array(f)))
        val tail = new GenericInternalRow(
          Array[Any](UTF8String.fromString(kind), commit))
        val joined = new JoinedRow()
        new PartitionReader[InternalRow] {
          override def next(): Boolean = delegate.next()
          override def get(): InternalRow = joined(delegate.get(), tail)
          override def close(): Unit = delegate.close()
        }
    }
}
