package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.connector.read.{InputPartition, SupportsReportPartitioning}
import org.apache.spark.sql.connector.expressions.Expressions
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.functions.{col, hash, pmod, lit}
import org.apache.spark.sql.types.StringType

/** Bucketed layout for catalog PARQUET tables → STORAGE-PARTITIONED
  * JOINS — [[LogBucketing]]'s `.bucketspec` + `KeyGroupedPartitioning`
  * design on the parquet tier (VERDICT r9 next-round #5), so a
  * parquet fact-to-fact join on the bucket key plans with NO shuffle
  * exchange on either side, and a `GROUP BY key` aggregates
  * exchange-free.
  *
  * Layout contract:
  *   - `.bucketspec` in the TABLE dir pins `{col, n}` (create-exclusive,
  *     conflicting re-declarations rejected; `col` must be a STRING
  *     column of the declared schema — the catalog `bucket(n, key)`
  *     function is (int, string));
  *   - every BUCKETED data file carries its bucket ordinal in its NAME:
  *     `b<k>-…` from [[writeBucketed]] (append-named, so the version
  *     ledger treats them like any v1-path append);
  *   - the scan claims key-grouped partitioning only when the spec
  *     exists AND every live file is bucket-tagged. One untagged file —
  *     a plain `INSERT INTO` append, a `delete-`/`rlo-` rewrite output —
  *     downgrades the scan to unknown partitioning: joins fall back to
  *     shuffling, never to wrong co-location. (Restoring the layout
  *     after un-bucketed DML = re-run [[writeBucketed]] compaction;
  *     the log tier's writers re-tag in place, the parquet tier
  *     downgrades-then-repairs.)
  *
  * The bucket function is `pmod(murmur3(key, seed=42), n)` — exactly
  * Spark's `hash()` and exactly [[LogBucketFunction]], so
  * `repartition(n, col)` pre-clusters writes perfectly (partition
  * index == bucket) and the catalog-registered function lets Spark
  * validate join compatibility. */
object ParquetBucketing {

  private def specPath(tableDir: String) = new Path(tableDir, ".bucketspec")

  def readSpec(tableDir: String): Option[LogBucketing.Spec] = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val p = specPath(tableDir)
    val fs = p.getFileSystem(FsConf.get)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    Some(Serialization.read[LogBucketing.Spec](
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Pin the table's bucket spec. Idempotent for an identical spec; a
    * DIFFERENT spec on an already-bucketed table is rejected. */
  def writeSpec(spark: SparkSession, tableDir: String,
      spec: LogBucketing.Spec): Unit = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    require(spec.n > 0, s"bucket count must be positive: ${spec.n}")
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table; entity logs bucket via LogBucketing")
    val declared = SchemaManifest.read(tableDir, "set_bucket_spec")
    val field = declared.find(_.name.equalsIgnoreCase(spec.col))
    require(field.isDefined, s"bucket column ${spec.col} is not in the schema")
    require(field.get.dataType == StringType,
      s"bucket column ${spec.col} must be STRING (bucket(n, key) hashes strings)")
    readSpec(tableDir) match {
      case Some(existing) =>
        require(existing == spec,
          s"table at $tableDir is already bucketed as $existing; cannot re-bucket as $spec")
      case None =>
        val p = specPath(tableDir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val out = try fs.create(p, false) catch {
          case _: java.io.IOException if fs.exists(p) =>
            val cur = readSpec(tableDir)
            require(cur.contains(spec),
              s"concurrent bucket declaration mismatch at $tableDir: $cur vs $spec")
            return
        }
        try out.write(Serialization.write(spec)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
    }
  }

  /** The one place the write paths resolve "is this table's layout
    * applicable to this write schema": the `.bucketspec`, its column
    * located case-insensitively in `schema`, restricted to STRING keys
    * (the tag writers hash UTF8 key bytes). Returns the spec
    * CANONICALIZED to the schema's own column spelling — distribution
    * clustering resolves against the query output, so the recorded
    * spec case must never leak into the plan (a case-sensitive session
    * would fail to resolve it). Shared by the batch append, the
    * REPLACE WHERE payload, RTAS, and the streaming sink. */
  def layoutFor(tableDir: String,
      schema: org.apache.spark.sql.types.StructType): Option[(LogBucketing.Spec, Int)] =
    readSpec(tableDir).flatMap { spec =>
      val idx = schema.fieldNames.indexWhere(_.equalsIgnoreCase(spec.col))
      if (idx >= 0 && schema.fields(idx).dataType ==
          org.apache.spark.sql.types.StringType)
        Some((spec.copy(col = schema.fieldNames(idx)), idx))
      else None
    }

  /** The bucket a data file's NAME declares, if any: `b<k>-…` (the
    * bucketed writer) or `…-b<k>.parquet` (a future bucket-aware
    * maintenance rewrite). */
  def bucketOfName(name: String): Option[Int] = {
    if (name.startsWith("b")) {
      val dash = name.indexOf('-')
      if (dash > 1) name.substring(1, dash).toIntOption else None
    } else {
      val stem = name.stripSuffix(".parquet")
      val idx = stem.lastIndexOf("-b")
      if (idx >= 0) stem.substring(idx + 2).toIntOption else None
    }
  }

  /** `cat.ns.t` → table directory under that catalog's warehouse. */
  private def dirOfTable(spark: SparkSession, table: String): String = {
    val parts = table.split("\\.")
    require(parts.length >= 2, s"want catalog.ns.table, got '$table'")
    require(parts.forall(LogCatalog.validPathPart), s"bad identifier '$table'")
    val wh = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.warehouse")
      .getOrElse(throw new IllegalArgumentException(
        s"'${parts.head}' is not a configured graft catalog"))
    parts.tail.foldLeft(new Path(wh))(new Path(_, _)).toString
  }

  /** Pre-cluster + bucketed append: one shuffle on the key
    * (`repartition(n, col)` — partition index equals bucket by
    * construction), files staged per bucket directory and renamed into
    * `data/` as `b<k>-…`. Every co-located join against any same-spec
    * table afterwards is shuffle-free. */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, n: Int): Unit = {
    val tableDir = dirOfTable(spark, table)
    writeSpec(spark, tableDir, LogBucketing.Spec(bucketCol, n))
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(tableDir, s".bucketed-$opId")
    val fs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // partition index == pmod(hash(col), n) == the `_gb` value: each
    // task writes exactly one bucket directory
    df.withColumn("_gb", pmod(hash(col(bucketCol)), lit(n)))
      .repartition(n, col(bucketCol))
      .write.partitionBy("_gb").parquet(staging.toString)
    val data = new Path(tableDir, "data")
    fs.mkdirs(data)
    try {
      fs.listStatus(staging).foreach { d =>
        if (d.isDirectory && d.getPath.getName.startsWith("_gb=")) {
          val k = d.getPath.getName.stripPrefix("_gb=").toInt
          require(k >= 0 && k < n, s"impossible bucket $k")
          var i = 0
          fs.listStatus(d.getPath).foreach { f =>
            if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
              val name = f"b$k-$opId-$i%05d.parquet"
              if (!fs.rename(f.getPath, new Path(data, name))) {
                throw new java.io.IOException(s"bucketed stage rename failed: $name")
              }
              i += 1
            }
          }
        }
      }
    } finally fs.delete(staging, true)
    // a versioned table folds these append-named files in at the next
    // maintenance commit; an unversioned one sees them immediately
  }

  /** Repair a bucketed table's layout: rewrite every UNTAGGED live data
    * file (plain `INSERT INTO` appends, `delete-`/`rlo-` rewrite
    * outputs) into bucket-tagged files and retire the originals in one
    * version publish. This is the parquet tier's downgrade-then-repair
    * contract: the scan refuses the key-grouped claim while any live
    * file is untagged; after this, storage-partitioned joins plan
    * shuffle-free again. Requires versioning (the repair IS a
    * maintenance commit — `CALL enable_versioning` first): outputs are
    * maintenance-named (`compact-…-b<k>.parquet` — never mistaken for
    * un-published appends, invisible until the publish, vacuumed if
    * crashed) and tagged through the same `-b<k>` channel bucket-aware
    * compaction uses. Tagged files are untouched — the repair's write
    * amplification is proportional to the UNTAGGED fraction, not the
    * table. Returns (files retagged, rows rewritten, output files). */
  def rebucket(spark: SparkSession, tableDir: String): (Long, Long, Long) =
    // serialized against other maintainers ([[MaintenanceLease]])
    MaintenanceLease.withLease(tableDir) {
    val spec = readSpec(tableDir).getOrElse(throw new IllegalArgumentException(
      s"$tableDir has no .bucketspec — CALL set_bucket_spec first"))
    require(!PartitionSpecs.exists(tableDir),
      s"$tableDir is partitioned — bucket layouts and partition layouts " +
        "are mutually exclusive")
    require(ParquetVersions.enabled(tableDir),
      s"rebucket_table needs a versioned table — CALL enable_versioning first")
    ParquetVersions.catchUp(tableDir) // pending appends join the ledger
    val live = ParquetVersions.latest(tableDir).get._2
    val untagged = live.filter(n => bucketOfName(n).isEmpty)
    if (untagged.isEmpty) return (0L, 0L, 0L)
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = SchemaManifest.read(tableDir, "rebucket_table")
    // mask-conflict retry (ADVICE r11): masks re-read per attempt and
    // the publish guarded against concurrent merge-on-read DML
    ParquetVersions.retryOnMaskConflict() {
    // mask-aware read ([[DeleteMasks]]): rewritten rows exclude
    // merge-on-read-deleted ones; the publish retires the inputs' masks
    val masks = ParquetVersions.masksFor(tableDir, None)
    val rows = DeleteMasks.readVisible(spark, schema, data, untagged, masks)
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(tableDir, s".rebucket-$opId")
    val nRows = rows.count()
    rows.withColumn("_gb", pmod(hash(col(spec.col)), lit(spec.n)))
      .repartition(spec.n, col(spec.col))
      .write.partitionBy("_gb").parquet(staging.toString)
    val outNames = Seq.newBuilder[String]
    try {
      fs.listStatus(staging).foreach { d =>
        if (d.isDirectory && d.getPath.getName.startsWith("_gb=")) {
          val k = d.getPath.getName.stripPrefix("_gb=").toInt
          var i = 0
          fs.listStatus(d.getPath).foreach { f =>
            if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
              val name = f"compact-$opId-$i%05d-b$k.parquet"
              if (!fs.rename(f.getPath, new Path(data, name))) {
                throw new java.io.IOException(s"rebucket stage rename failed: $name")
              }
              outNames += name
              i += 1
            }
          }
        }
      }
    } finally fs.delete(staging, true)
    val out = outNames.result()
    try {
      ParquetVersions.commitGuarded(tableDir, None, Map.empty,
        ParquetVersions.guardFor(untagged.toSet, masks)) { prev =>
        (prev.filterNot(untagged.toSet) ++ out).distinct.sorted
      }
    } catch {
      case e: VersionLedger.MaskConflictException =>
        out.foreach(n => fs.delete(new Path(data, n), false))
        throw e
    }
    (untagged.size.toLong, nRows, out.size.toLong)
    }
  }
}

/** One BUCKET of a bucketed parquet table — the key-grouped unit: all
  * rows across `files` share this bucket ordinal, which IS the
  * partition key. An empty file list is a footer-pruned-but-present
  * group (group stability over micro-optimization, same rule as the
  * log tier). */
class KeyedFilePartition(index: Int, files: Array[PartitionedFile],
    val bucket: Int) extends FilePartition(index, files) with
    org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

/** A [[ParquetScan]] over a FULLY-TAGGED bucketed table: input
  * partitions re-grouped one per bucket, reported as
  * `KeyGroupedPartitioning(bucket(n, col))` — same-spec joins and key
  * group-bys then plan with no exchange. Built only when every live
  * file carries a tag ([[FileTagParquetScanBuilder.build]]); the
  * reader factory, pushed filters, and footer pruning are the genuine
  * scan's own. */
class BucketedParquetScan(val inner: ParquetScan,
    spec: LogBucketing.Spec, buckets: Seq[Int])
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters,
      inner.pushedVariantExtractions)
    with SupportsReportPartitioning with ParquetTailable {

  override protected def tailTableDir: String =
    inner.fileIndex.rootPaths.head.getParent.toString
  override protected def tailDataSchema: org.apache.spark.sql.types.StructType =
    inner.dataSchema
  override protected def tailOptions
      : org.apache.spark.sql.util.CaseInsensitiveStringMap = inner.options

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(spec.n, spec.col)), buckets.size)

  override def planInputPartitions(): Array[InputPartition] = {
    val files = super.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected parquet partition shape: $other")
    }
    val byBucket: Map[Int, Array[PartitionedFile]] =
      files.groupBy(f => ParquetBucketing.bucketOfName(f.toPath.getName)
        .getOrElse(throw new IllegalStateException(
          s"untagged file ${f.toPath.getName} in a bucket-claimed scan")))
    buckets.zipWithIndex.map { case (b, i) =>
      new KeyedFilePartition(i, byBucket.getOrElse(b, Array.empty), b): InputPartition
    }.toArray
  }

  override def createReaderFactory()
      : org.apache.spark.sql.connector.read.PartitionReaderFactory =
    EpochRouted.wrap(inner.sparkSession, inner.dataSchema,
      inner.readDataSchema, super.createReaderFactory())

  override def description(): String =
    s"Bucketed(${spec.col} into ${spec.n})(${super.description()})"

  override def equals(obj: Any): Boolean = obj match {
    case b: BucketedParquetScan => inner == b.inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() ^ 0x6bc1e7a1
}
