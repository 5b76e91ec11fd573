package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

/** Atomic `CREATE TABLE … AS SELECT` / `REPLACE TABLE … AS SELECT` for
  * the graft catalog — the [[org.apache.spark.sql.connector.catalog.StagingTableCatalog]]
  * side of [[LogCatalog]]. Without it Spark falls back to the
  * non-atomic CTAS path (create, then write, then best-effort drop on
  * failure: a crash strands an empty or half-loaded table), and
  * `REPLACE TABLE` becomes drop-then-create with a visible gap.
  *
  * Two mechanisms, chosen by what already exists:
  *
  *   - '''CTAS''' ([[StagedCreateTable]]): the whole table materializes
  *     in a hidden `.ctas-<name>-<uuid>` sibling directory (invisible
  *     to `listTables` and unreachable by identifier — leading dots are
  *     rejected path parts), written through the SAME write path the
  *     real table would use (log staged-commit writer or the parquet
  *     v1 file writer). Commit renames the directory into place —
  *     one metadata operation; a concurrent `CREATE` of the same name
  *     loses loudly, never merges.
  *   - '''RTAS''' on a parquet table ([[StagedReplaceParquetTable]]):
  *     the version ledger is the atomicity mechanism, same as UPDATE /
  *     MERGE — new files stage in a dot-dir, rename into `data/` under
  *     the maintenance prefix `rtas-`, and ONE
  *     [[ParquetVersions.commit]] publishes a membership of exactly
  *     the new files. Readers see the old table or the new, never a
  *     mix; pinned scans keep their snapshot; `VERSION AS OF` history
  *     survives the replacement (an un-versioned table auto-upgrades,
  *     v1 = its pre-replace state).
  *   - '''RTAS''' on an entity log ([[StagedReplaceLogTable]]): the
  *     log's truncate-mode staged-commit write is already an atomic
  *     replace (old segments retired inside the same commit that lands
  *     the new ones — on a versioned log, one version publish), so the
  *     staged table just forces `truncate()` on the real write builder
  *     and the write's own commit is the visibility event. The entity
  *     schema is fixed, so RTAS must redeclare it exactly.
  *
  * The reference's posture is warehouse-side DDL+load as one migration
  * step (`migrate.go:13-34` — tables appear fully formed); CTAS is the
  * DSv2 expression of that contract.
  *
  * A driver that dies mid-CTAS strands its `.ctas-` staging dir —
  * invisible (dot-named, listTables filters it, dot identifiers are
  * rejected) but occupying disk; `CALL graft.system.clean_staging
  * (namespace => …)` reclaims idle ones. */
object LogStaging {

  private def fsOf(p: Path) =
    p.getFileSystem(FsConf.get)

  /** Entity-log shape test shared with [[LogCatalog.createTable]]:
    * same names and types, any nullability/metadata. */
  def entityShaped(schema: StructType): Boolean = {
    val want = LimitHashLog.SCHEMA.fields.map(f => (f.name, f.dataType)).toSeq
    schema.fields.map(f => (f.name, f.dataType)).toSeq == want
  }

  /** Stage a CTAS: build the staging directory (log: bare dir; parquet:
    * `data/` + `_schema.json` + optional `_partition.json`, so the
    * renamed-in result is a complete table) and wrap the real table
    * implementation over it — a partitioned CTAS writes through the
    * same partition-routing builder the final table uses, its ledger
    * staged inside the hidden dir and renamed in whole. */
  def stageCreate(ident: Identifier, targetDir: Path, schema: StructType,
      partitions: Array[Transform] = Array.empty): StagedTable = {
    val staging = new Path(targetDir.getParent,
      s".ctas-${ident.name()}-${java.util.UUID.randomUUID().toString.take(12)}")
    val fs = fsOf(staging)
    val delegate: Table =
      if (schema.isEmpty || entityShaped(schema)) {
        require(partitions.isEmpty,
          "entity log tables are unpartitioned (fixed layout)")
        fs.mkdirs(staging)
        new LimitHashLogTable(staging.toString)
      } else {
        val spec = if (partitions.isEmpty) None
          else Some(PartitionSpecs.fromTransforms(partitions, schema))
        fs.mkdirs(new Path(staging, "data"))
        val out = fs.create(new Path(staging, "_schema.json"), false)
        try out.write(schema.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        spec.foreach { s =>
          PartitionSpecs.write(staging.toString, s)
          ParquetVersions.enable(staging.toString) // versioned from birth
        }
        new StatsPrunedParquetTable(ident.toString,
          org.apache.spark.sql.classic.SparkSession.active,
          Seq(new Path(staging, "data").toString), schema)
      }
    new StagedCreateTable(ident, staging, targetDir, delegate)
  }

  /** Stage an RTAS over an existing table directory. `partitions` is
    * the statement's `PARTITIONED BY` — the REPLACEMENT layout (empty =
    * the replaced table is flat, even if the old one was partitioned). */
  def stageReplace(ident: Identifier, dir: Path, schemaFile: Path,
      schema: StructType,
      partitions: Array[Transform] = Array.empty): StagedTable = {
    if (fsOf(dir).exists(schemaFile)) {
      val newSpec = if (partitions.isEmpty) None
        else Some(PartitionSpecs.fromTransforms(partitions, schema))
      new StagedReplaceParquetTable(ident.toString, dir.toString, schema, newSpec)
    } else {
      require(partitions.isEmpty,
        "entity log tables are unpartitioned (fixed layout)")
      require(entityShaped(schema),
        s"REPLACE TABLE on entity log $ident must redeclare the entity " +
          s"schema (${LimitHashLog.SCHEMA.fieldNames.mkString(", ")}) — " +
          "log tables are fixed in layout")
      new StagedReplaceLogTable(dir.toString)
    }
  }
}

/** CTAS staged table: writes go to the hidden staging directory through
  * the delegate's own write path; commit renames the directory into
  * place. Rename-into-existing on Hadoop local/HDFS NESTS the source
  * inside the target instead of failing, so commit re-checks existence
  * and verifies no nesting happened — a lost create-create race aborts
  * loudly with nothing half-visible. */
class StagedCreateTable(ident: Identifier, stagingDir: Path, targetDir: Path,
    delegate: Table) extends StagedTable with SupportsWrite {

  private def fs = stagingDir.getFileSystem(FsConf.get)

  override def name(): String = ident.toString
  override def schema(): StructType = delegate.schema()
  override def partitioning(): Array[Transform] = delegate.partitioning()
  override def properties(): java.util.Map[String, String] = delegate.properties()
  override def capabilities(): java.util.Set[TableCapability] =
    delegate.capabilities()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    delegate.asInstanceOf[SupportsWrite].newWriteBuilder(info)

  override def commitStagedChanges(): Unit = {
    fs.mkdirs(targetDir.getParent)
    if (fs.exists(targetDir)) {
      abortStagedChanges()
      throw new TableAlreadyExistsException(ident.toString)
    }
    if (!fs.rename(stagingDir, targetDir)) {
      abortStagedChanges()
      throw new java.io.IOException(
        s"CTAS commit: rename $stagingDir -> $targetDir failed")
    }
    // lost the race to a concurrent CREATE after the existence check:
    // rename into an existing directory nests rather than fails
    val nested = new Path(targetDir, stagingDir.getName)
    if (fs.exists(nested)) {
      fs.delete(nested, true)
      throw new TableAlreadyExistsException(ident.toString)
    }
  }

  override def abortStagedChanges(): Unit = {
    fs.delete(stagingDir, true)
    ()
  }
}

/** RTAS on an entity log: the log's truncate-mode write IS the atomic
  * replace (old segments retire inside the commit that lands the new
  * ones; one version publish when versioned), so this staged table
  * only forces `truncate()` on the real builder. Commit/abort of the
  * staging layer are no-ops — the write's commit is the visibility
  * event, and its abort already removes the staged `_`-files. */
class StagedReplaceLogTable(dir: String) extends StagedTable with SupportsWrite {
  private val delegate = new LimitHashLogTable(dir)

  override def name(): String = delegate.name()
  override def schema(): StructType = delegate.schema()
  override def capabilities(): java.util.Set[TableCapability] =
    delegate.capabilities()

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    delegate.newWriteBuilder(info) match {
      case ow: org.apache.spark.sql.connector.write.SupportsOverwrite =>
        ow.truncate()
      case other => throw new IllegalStateException(
        // never silently APPEND when the statement promised a REPLACE
        s"log write builder lost its overwrite support: $other")
    }

  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = ()
}

/** RTAS on a catalog parquet table: stage → rename under `rtas-` names
  * → swap `_schema.json` if redeclared → ONE version publish whose
  * membership is exactly the new files. The bucket layout survives
  * when the spec's column survives (writers tag outputs with the same
  * murmur3-pmod as every other write path); a replacement that drops
  * the bucket column drops the spec with it — a layout claim must
  * never outlive its column. */
class StagedReplaceParquetTable(identName: String, tableDir: String,
    newSchema: StructType,
    newSpec: Option[PartitionSpecs.Spec] = None)
    extends StagedTable with SupportsWrite {

  import scala.jdk.CollectionConverters._

  override def name(): String = identName
  override def schema(): StructType = newSchema
  override def partitioning(): Array[Transform] =
    newSpec.fold(Array.empty[Transform])(s =>
      PartitionSpecs.toTransforms(s))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.TRUNCATE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val got = info.schema().fieldNames.toSeq
    val want = newSchema.fieldNames.toSeq
    require(got == want,
      s"RTAS write schema $got does not match the declared schema $want")
    new WriteBuilder with SupportsTruncate {
      // REPLACE TABLE plans an unconditional overwrite; replacement is
      // this write's entire semantic, so truncate() is the identity
      override def truncate(): WriteBuilder = this
      override def build(): Write =
        new ParquetReplaceAllWrite(tableDir, newSchema, info.queryId(), newSpec)
    }
  }

  override def commitStagedChanges(): Unit = ()
  override def abortStagedChanges(): Unit = ()
}

/** The replace-everything write: Spark's parquet `OutputWriterFactory`
  * writes into a `.rtas-<query>` staging dot-dir (invisible to the
  * listing rule); the driver renames committed files into `data/`
  * under `rtas-` maintenance names and publishes one version commit
  * whose membership is exactly those files. A crash before the publish
  * leaves only unreferenced maintenance-named files the live rule
  * ignores and vacuum reclaims. Racing plain appends are folded by the
  * publish's catch-up first and then retired — they ordered before the
  * replace. */
class ParquetReplaceAllWrite(tableDir: String, writeSchema: StructType,
    queryId: String,
    newSpec: Option[PartitionSpecs.Spec] = None)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {

  /** A PARTITIONED replacement clusters rows by the new layout's
    * TRANSFORM expressions (same contract as the partitioned INSERT
    * path — see [[PartitionedWriteBuilder]]): a distinct partition
    * value lands in ~one task → ~one file per partition, the
    * file-count property that keeps a 100 TB table's metadata
    * bounded. */
  private def distributionMode: String =
    org.apache.spark.sql.classic.SparkSession.active.conf
      .get("spark.graft.partitioned.write.distribution", "clustered")

  override def requiredDistribution()
      : org.apache.spark.sql.connector.distributions.Distribution =
    newSpec match {
      // the hot-partition opt-out the INSERT path honors applies here
      // too (a single-day bulk RTAS backfill would otherwise serialize
      // the whole partition through one task)
      case Some(spec) if distributionMode != "none" =>
        org.apache.spark.sql.connector.distributions.Distributions.clustered(
          PartitionSpecs.toTransforms(spec)
            .map(t => t: org.apache.spark.sql.connector.expressions.Expression))
      case _ =>
        org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    }
  /** Pinned like the partitioned INSERT path ([[PartitionedWriteBuilder]]
    * Scaladoc) — AQE's byte-sized coalescing serializes the per-dir
    * parquet writer opens of a many-partition replacement. */
  override def requiredNumPartitions(): Int =
    if (newSpec.isEmpty || distributionMode == "none") 0
    else {
      val conf = org.apache.spark.sql.classic.SparkSession.active.conf
      conf.get("spark.graft.partitioned.write.shuffle.partitions", "").trim match {
        case "" => conf.get("spark.sql.shuffle.partitions").toInt
        case n => n.toInt // 0 = AQE-sized
      }
    }
  /** Dir-contiguous task input → one open parquet writer at a time
    * ([[PartitionSpecs.sortOrderFor]]). */
  override def requiredOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    newSpec.fold(Array.empty[org.apache.spark.sql.connector.expressions
      .SortOrder])(PartitionSpecs.sortOrderFor)

  override def toBatch: BatchWrite = new BatchWrite {
    private def spark = org.apache.spark.sql.classic.SparkSession.active
    private val stagingDir = new Path(tableDir, s".rtas-$queryId")

    /** The bucket layout to preserve: spec present AND its column
      * survives the redeclared schema as a string
      * ([[ParquetBucketing.layoutFor]]) — and the replacement is NOT
      * partitioned (a `PARTITIONED BY` replacement defines the whole
      * new layout; bucket tags don't co-exist with it). */
    private def keptSpec: Option[(Int, Int)] =
      if (newSpec.isDefined) None
      else ParquetBucketing.layoutFor(tableDir, writeSchema)
        .map { case (spec, idx) => (idx, spec.n) }

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        spark.sessionState.newHadoopConf())
      val owf = new ParquetFileFormat().prepareWrite(spark, job, Map.empty, writeSchema)
      val conf = new SerializableConfiguration(job.getConfiguration)
      newSpec match {
        case Some(spec) =>
          // partition-routed staging: each task writes one staged file
          // per partition dir it encounters, exactly the INSERT path
          new PartitionedStageWriterFactory(owf, conf, writeSchema, spec,
            stagingDir.toString)
        case None =>
          new ParquetStageWriterFactory(owf, conf, writeSchema,
            stagingDir.toString, keptSpec)
      }
    }

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val data = new Path(tableDir, "data")
      val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(data)

      // the ledger IS the atomicity mechanism; an un-versioned table
      // upgrades first (v1 = its pre-replace listing)
      if (!ParquetVersions.enabled(tableDir)) ParquetVersions.enable(tableDir)

      val written = Seq.newBuilder[String]
      messages.foreach {
        case ParquetStageCommit(staged, pid) =>
          staged.zipWithIndex.foreach { case ((path, tag), j) =>
            val name = f"rtas-$queryId-$pid%05d-$j" +
              tag.fold("")(k => s"-b$k") + ".parquet"
            val to = new Path(data, name)
            if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
            if (!fs.rename(new Path(path), to)) {
              throw new java.io.IOException(
                s"ParquetReplaceAllWrite: rename $path -> $to failed")
            }
            written += name
          }
        case PartitionedStageCommit(staged, pid) =>
          staged.zipWithIndex.foreach { case ((path, relDir), j) =>
            val name = f"rtas-$queryId-$pid%05d-$j.parquet"
            val rel = if (relDir.isEmpty) name else s"$relDir/$name"
            val to = new Path(data, rel)
            fs.mkdirs(to.getParent)
            if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
            if (!fs.rename(new Path(path), to)) {
              throw new java.io.IOException(
                s"ParquetReplaceAllWrite: rename $path -> $to failed")
            }
            written += rel
          }
        case _ =>
      }
      fs.delete(stagingDir, true)

      // a bucket spec whose column did not survive must not outlive it
      // (a partitioned replacement always drops it — the new layout is
      // the statement's PARTITIONED BY)
      if (ParquetBucketing.readSpec(tableDir).isDefined && keptSpec.isEmpty) {
        fs.delete(new Path(tableDir, ".bucketspec"), false)
      }

      // the PARTITION SPEC swap — the replacement's declared layout (or
      // its removal when the statement had no PARTITIONED BY). Advisory
      // for reads: files of the OLD layout pinned in older versions are
      // simply never dir-pruned (always correct); a crash between this
      // swap and the publish below leaves the old membership under the
      // new spec — same safe mixed state as partition evolution.
      if (PartitionSpecs.read(tableDir) != newSpec) {
        PartitionSpecs.replace(tableDir, newSpec)
      }

      // ONE atomic publish carries the new membership AND the
      // (possibly redeclared) schema — readers see the old table or
      // the new, never new files under the old schema (ADVICE r10).
      // The `_schema.json` manifest is swapped AFTERWARDS as a cache
      // for un-ledgered consumers; a crash between the two leaves the
      // ledger authoritative ([[SchemaManifest.readJson]] prefers it)
      // and loadTable read-repairs the file. Pinned older versions
      // read their files under the new read schema — added columns
      // null, dropped columns pruned, the ALTER semantics.
      ParquetVersions.commit(tableDir, Some(writeSchema.json), Map.empty)(
        _ => written.result().sorted)
      if (SchemaManifest.manifestJson(tableDir) != writeSchema.json) {
        SchemaManifest.repair(tableDir, writeSchema.json)
      }
      ()
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = stagingDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(stagingDir, true)
      ()
    }
  }

  override def description(): String =
    s"ParquetReplaceAllWrite dir=$tableDir"
}
