package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style METADATA TABLES: `graft.<ns>.<t>.history` and
  * `graft.<ns>.<t>.files` — the version ledger and the physical file
  * inventory as ordinary SQL relations, so introspection composes
  * (join history against files, filter, aggregate) instead of being
  * locked behind `CALL graft.system.history`.
  *
  * Resolution rule (the Iceberg one): a REAL table always wins — the
  * metadata suffix only resolves when `ns.t.history` names no existing
  * directory AND `ns.t` is a table. Both tiers serve both suffixes:
  *
  *   - `history`: one row per ledger version — ordinal, publish stamp
  *     (embedded at CAS time; mtime fallback for pre-stamp files),
  *     file count, `is_latest`. Un-versioned tables have no history.
  *   - `files`: one row per ON-DISK data file — name, size,
  *     `live` (member of the current read set) and `referenced`
  *     (member of ANY retained version): `live=false, referenced=true`
  *     is a retired file awaiting vacuum, `referenced=false` on a
  *     versioned table is an un-published append (live) or a crashed
  *     maintenance orphan (not).
  *
  * Rows are computed on the driver at scan time — the ledger and the
  * listing are manifest-scale metadata (same posture as the
  * procedures and the COUNT pushdown), never data-scale. */
object MetaTables {

  val HISTORY_SCHEMA: StructType = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("published_ms", LongType, nullable = false),
    StructField("files", IntegerType, nullable = false),
    StructField("is_latest", BooleanType, nullable = false)))

  val FILES_SCHEMA: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("live", BooleanType, nullable = false),
    StructField("referenced", BooleanType, nullable = false),
    StructField("partition", StringType, nullable = true),
    StructField("masks", IntegerType, nullable = false)))

  /** `.partitions`: one row per partition directory — file count,
    * bytes, rows-masked count. A flat (unpartitioned) table reports a
    * single NULL-partition row, so the relation is total. */
  val PARTITIONS_SCHEMA: StructType = StructType(Seq(
    StructField("partition", StringType, nullable = true),
    StructField("files", IntegerType, nullable = false),
    StructField("size_bytes", LongType, nullable = false),
    StructField("masked_files", IntegerType, nullable = false)))

  /** The metadata suffixes; anything else under a table identifier is
    * a loud error (never expose internals like the `data/` dir). */
  val SUFFIXES: Set[String] = Set("history", "files", "partitions")

  def history(identName: String, tableDir: String): Table = {
    val rows: () => Seq[Array[Any]] = () => {
      val hist = VersionLedger.history(tableDir)
      val last = hist.lastOption.map(_._1)
      hist.map { case (ord, ms, n) =>
        Array[Any](ord, ms, n, last.contains(ord))
      }
    }
    new MetaRowsTable(identName, HISTORY_SCHEMA, rows)
  }

  /** `isParquet` = the catalog's schema-manifest dispatch. */
  def files(identName: String, tableDir: String, isParquet: Boolean): Table = {
    val rows: () => Seq[Array[Any]] = () => {
      if (isParquet) {
        val data = new Path(tableDir, "data")
        val fs = data.getFileSystem(FsConf.get)
        // committed-file walk ([[ParquetVersions.walkData]]): reported
        // names are data/-relative paths
        val listed: Seq[(String, Long)] =
          ParquetVersions.walkData(fs, data)
            .map { case (rel, s) => (rel, s.getLen) }.sortBy(_._1)
        // live + referenced + masks from ONE consistent ledger snapshot
        // (same rule as ParquetVersions.live — two separate reads can
        // straddle a publish and misreport a file's state)
        val (live, referenced) = VersionLedger.snapshot(tableDir) match {
          case None => (listed.map(_._1).toSet, Set.empty[String])
          case Some((_, names, ref)) =>
            val appends = listed.map(_._1)
              .filterNot(ref).filterNot(ParquetVersions.maintenanceNamed)
            ((names ++ appends).toSet, ref)
        }
        val masks = ParquetVersions.masksFor(tableDir, None)
        listed.map { case (name, len) =>
          Array[Any](name, len, live(name), referenced(name),
            partitionOf(name).orNull,
            masks.get(name).map(_.size).getOrElse(0))
        }
      } else {
        val segs = LimitHashLog.segments(tableDir)
          .map { case (p, len) => (new Path(p).getName, len) }
        val (live, referenced): (String => Boolean, String => Boolean) =
          VersionLedger.snapshot(tableDir) match {
            case None => (_ => true, _ => false)
            case Some((_, names, ref)) => (names.toSet, ref)
          }
        // merge-on-read log DELETE masks surface here too — the same
        // pressure signal the parquet tier exposes (p29)
        val masks = VersionLedger.latestPayload(tableDir)
          .map(_._2.masks).getOrElse(Map.empty)
        segs.map { case (name, len) =>
          Array[Any](name, len, live(name), referenced(name), null,
            masks.get(name).map(_.size).getOrElse(0))
        }
      }
    }
    new MetaRowsTable(identName, FILES_SCHEMA, rows)
  }

  /** The partition-dir path of a data/-relative name; None on the flat
    * layout. */
  private def partitionOf(rel: String): Option[String] =
    Some(PartitionSpecs.dirOfRel(rel)).filter(_.nonEmpty)

  /** `.partitions` — per-partition summary over the LIVE file set. */
  def partitions(identName: String, tableDir: String, isParquet: Boolean): Table = {
    val rows: () => Seq[Array[Any]] = () => {
      if (isParquet) {
        val data = new Path(tableDir, "data")
        val fs = data.getFileSystem(FsConf.get)
        val live: Set[String] =
          if (ParquetVersions.enabled(tableDir)) ParquetVersions.live(tableDir).toSet
          else ParquetVersions.listing(tableDir).toSet
        val masks = ParquetVersions.masksFor(tableDir, None)
        val sized = ParquetVersions.walkData(fs, data)
          .filter { case (rel, _) => live(rel) }
        sized.groupBy { case (rel, _) => partitionOf(rel) }
          .toSeq.sortBy(_._1.getOrElse(""))
          .map { case (part, files) =>
            Array[Any](part.orNull, files.size,
              files.map(_._2.getLen).sum,
              files.count { case (rel, _) => masks.get(rel).exists(_.nonEmpty) })
          }
      } else {
        val segs = LimitHashLog.segments(tableDir)
        if (segs.isEmpty) Seq.empty
        else Seq(Array[Any](null, segs.size, segs.map(_._2).sum, 0))
      }
    }
    new MetaRowsTable(identName, PARTITIONS_SCHEMA, rows)
  }
}

/** A read-only table whose rows are computed on the driver at scan
  * planning (metadata-scale by contract). One input partition; values
  * are JVM externals converted to Catalyst form in the reader. */
class MetaRowsTable(tableName: String, tableSchema: StructType,
    rows: () => Seq[Array[Any]]) extends Table with SupportsRead {

  import scala.jdk.CollectionConverters._

  override def name(): String = tableName
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        // rows pinned at plan time, consistent with scan semantics
        private val pinned: Seq[Array[Any]] = rows()
        override def readSchema(): StructType = tableSchema
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] =
          Array(MetaRowsPartition(pinned.toArray))
        override def createReaderFactory(): PartitionReaderFactory =
          new MetaRowsReaderFactory(tableSchema)
        override def description(): String = s"MetaRowsTable($tableName)"
      }
    }
}

case class MetaRowsPartition(rows: Array[Array[Any]]) extends InputPartition

class MetaRowsReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[MetaRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow = {
        val vals = rows(i).zip(schema.fields).map {
          case (v: String, _) => UTF8String.fromString(v)
          case (v, _) => v
        }
        new GenericInternalRow(vals.asInstanceOf[Array[Any]])
      }
      override def close(): Unit = ()
    }
  }
}
