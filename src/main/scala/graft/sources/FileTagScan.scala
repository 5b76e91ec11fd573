package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitioningAwareFileIndex}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A [[ParquetScanBuilder]] that can additionally serve the `_file`
  * METADATA COLUMN ([[ParquetFileMetaColumn]]) — which data file each
  * row lives in.
  *
  * Why the REGULAR scan needs this: Spark's runtime group filtering
  * for row-level operations (`RowLevelOperationRuntimeGroupFiltering`)
  * deliberately plans its `SELECT DISTINCT _file WHERE <cond>`
  * subquery against the ORIGINAL table relation, not the row-level
  * operation's group scan — precisely so the subquery enjoys the plain
  * scan's full pushdown (here: pushed parquet filters, row-group
  * skipping, AND [[StatsPrunedFileIndex]] footer pruning — a selective
  * UPDATE's subquery opens only the files whose footer bounds can
  * match). The same mechanism gives users `SELECT _file FROM t`
  * provenance queries for free, the Iceberg `_file` surface.
  *
  * Mechanics: `pruneColumns` strips `_file` before delegating (the
  * parquet reader must never see a column data files don't carry);
  * when `_file` was requested, [[build]] wraps the genuine
  * [[ParquetScan]]: input partitions are re-planned ONE PER FILE (the
  * per-row value is then a per-partition constant) and the row reader
  * appends the file name. Aggregate pushdown is declined on such scans
  * — a metadata-served aggregate would bypass the column entirely. */
class FileTagParquetScanBuilder(sparkSession: SparkSession,
    fileIndex: PartitioningAwareFileIndex, schema: StructType,
    dataSchema: StructType, options: CaseInsensitiveStringMap,
    masks: Map[String, Seq[String]] = Map.empty)
    extends ParquetScanBuilder(sparkSession, fileIndex, schema, dataSchema, options) {

  private var wantsFile = false

  /** Delete masks widen the pruned read schema by their referenced
    * columns — the mask must be evaluable on the rows the reader
    * produces (Spark projects the extras away upstream; pruning is
    * advisory, `readSchema()` is authoritative). A POSITIONAL mask
    * ([[DeletionVectors]]) references no data column and must NOT
    * widen the schema Catalyst sees — the pushdown layer rejects a
    * readSchema field absent from the relation output (round 15: the
    * r14 widening crashed every batch read of a DV-masked table).
    * Its carrier, the synthetic row-position column
    * ([[DeleteMasks.POS_COL]]), lives only inside a SECOND,
    * driver-built reader factory the DV-aware scans route masked
    * partitions through ([[PinnedParquetFactory]]), with survivors
    * projected back to this scan's row schema. */
  override def pruneColumns(requiredSchema: StructType): Unit = {
    wantsFile = requiredSchema.fieldNames.contains(ParquetFileMetaColumn.name())
    val base = requiredSchema.fields.filterNot(
      _.name == ParquetFileMetaColumn.name())
    val widened = if (masks.isEmpty) base else {
      val need = masks.valuesIterator.flatten
        .flatMap(DeleteMasks.references).map(_.toLowerCase).toSet
      val have = base.map(_.name.toLowerCase).toSet
      base ++ dataSchema.fields.filter(f =>
        need(f.name.toLowerCase) && !have(f.name.toLowerCase))
    }
    super.pruneColumns(StructType(widened))
  }

  /** Aggregate pushdown answers from footer metadata, which counts
    * MASKED rows — declined whenever masks exist (and on `_file`
    * scans, which a metadata-served aggregate would bypass).
    *
    * RENAMED tables cannot take Spark's own parquet aggregate path
    * (its footer reads key stats by the REQUESTED name; a pre-rename
    * file would answer wrong or crash) — instead the aggregate is
    * served HERE from the SAME translated stats the pruning index
    * uses ([[StatsPrunedFileIndex.translateStats]]), as a COMPLETE
    * pushdown: MIN/MAX over the exact-stats domains (integral, date,
    * timestamp — strings excluded for footer truncation, floats for
    * NaN hazards, decimals for scale semantics), COUNT(*) from row
    * counts, COUNT(col) from row − null counts; any file missing a
    * needed stat declines the whole push (row scan, correct). Values
    * are computed at ACCEPTANCE time from the index's pinned listing —
    * the snapshot rule the log tier established (ADVICE r7). */
  private var renamedAggValues: Option[(StructType, Seq[Any], Seq[String])] = None

  /** `supportCompletePushDown` and `pushAggregation` both ask for the
    * same Aggregation's translated values; computing twice re-listed
    * every file and re-resolved stats twice per query, and could
    * observe two different listings under concurrent appends (ADVICE
    * r16). Memoized on the Aggregation INSTANCE — Spark passes the
    * same object to both calls of one pushdown negotiation, and a new
    * negotiation brings a new instance. */
  private var renamedAggMemo: Option[(Aggregation, Option[(StructType, Seq[Any], Seq[String])])] = None

  private def renamedAggMemoized(aggregation: Aggregation)
      : Option[(StructType, Seq[Any], Seq[String])] = renamedAggMemo match {
    case Some((a, v)) if a eq aggregation => v
    case _ =>
      val v = renamedAggOf(aggregation)
      renamedAggMemo = Some((aggregation, v))
      v
  }

  private def renamedAggOf(aggregation: Aggregation)
      : Option[(StructType, Seq[Any], Seq[String])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Count, CountStar, Max, Min}
    import org.apache.spark.sql.types._
    if (!sparkSession.sessionState.conf.parquetAggregatePushDown) return None
    if (wantsFile || masks.nonEmpty) return None
    if (pushedFilters.nonEmpty) return None
    if (aggregation.groupByExpressions.nonEmpty) return None
    if (aggregation.aggregateExpressions.isEmpty) return None
    val index = fileIndex match {
      case s: StatsPrunedFileIndex => s
      case _ => return None
    }
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[StructField] = e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
          if nr.fieldNames.length == 1 =>
        dataSchema.fields.find(_.name.equalsIgnoreCase(nr.fieldNames.head))
      case _ => None
    }
    // declared type → (expected stats domain, stats value → internal)
    def domainOf(dt: DataType): Option[(ParquetFooterStats.Domain, Any => Any)] =
      dt match {
        case LongType => Some((ParquetFooterStats.DInt, identity))
        case IntegerType => Some((ParquetFooterStats.DInt,
          v => v.asInstanceOf[Long].toInt))
        case ShortType => Some((ParquetFooterStats.DInt,
          v => v.asInstanceOf[Long].toShort))
        case ByteType => Some((ParquetFooterStats.DInt,
          v => v.asInstanceOf[Long].toByte))
        case DateType => Some((ParquetFooterStats.DDays,
          v => v.asInstanceOf[Long].toInt))
        case TimestampType | TimestampNTZType =>
          Some((ParquetFooterStats.DMicros, identity))
        case _ => None // strings truncate, floats carry NaN, decimals scale
      }
    val stats = index.translatedStatsOfAll().getOrElse(return None)
    def colStatsOf(f: StructField): Option[Seq[ParquetFooterStats.ColStats]] = {
      val (dom, _) = domainOf(f.dataType).getOrElse(return None)
      val per = stats.map(_.cols.get(f.name.toLowerCase))
      if (per.exists(_.isEmpty)) return None
      val cs = per.flatten
      if (cs.exists(_.domain != dom)) return None
      Some(cs)
    }
    val fields = Seq.newBuilder[StructField]
    val values = Seq.newBuilder[Any]
    val tags = Seq.newBuilder[String]
    aggregation.aggregateExpressions.toSeq.zipWithIndex.foreach {
      case (_: CountStar, i) =>
        fields += StructField(s"agg_$i", LongType, nullable = false)
        values += stats.map(_.rowCount).sum
        tags += "count_star"
      case (c: Count, i) if !c.isDistinct =>
        val f = fieldOf(c.column).getOrElse(return None)
        // COUNT(col) = rows − nulls; needs a null count from EVERY file
        // (domain doesn't matter — null counts are type-agnostic, but
        // the column must be stats-covered everywhere)
        val per = stats.map(_.cols.get(f.name.toLowerCase))
        if (per.exists(_.isEmpty)) return None
        val nulls = per.flatten.map(_.nulls.getOrElse(return None))
        fields += StructField(s"agg_$i", LongType, nullable = false)
        values += stats.map(_.rowCount).sum - nulls.sum
        tags += s"count(${f.name})"
      case (m: Min, i) =>
        val f = fieldOf(m.column).getOrElse(return None)
        val (_, conv) = domainOf(f.dataType).getOrElse(return None)
        val cs = colStatsOf(f).getOrElse(return None)
        val mins = cs.flatMap(_.min) // all-null files contribute nothing
        fields += StructField(s"agg_$i", f.dataType, nullable = true)
        values += (if (mins.isEmpty) null
          else conv(mins.map(_.asInstanceOf[Long]).min))
        tags += s"min(${f.name})"
      case (m: Max, i) =>
        val f = fieldOf(m.column).getOrElse(return None)
        val (_, conv) = domainOf(f.dataType).getOrElse(return None)
        val cs = colStatsOf(f).getOrElse(return None)
        val maxs = cs.flatMap(_.max)
        fields += StructField(s"agg_$i", f.dataType, nullable = true)
        values += (if (maxs.isEmpty) null
          else conv(maxs.map(_.asInstanceOf[Long]).max))
        tags += s"max(${f.name})"
      case _ => return None
    }
    Some((StructType(fields.result()), values.result(), tags.result()))
  }

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    if (Renames.hasRenames(dataSchema)) renamedAggMemoized(aggregation).isDefined
    else super.supportCompletePushDown(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    if (Renames.hasRenames(dataSchema)) {
      renamedAggValues = renamedAggMemoized(aggregation)
      renamedAggValues.isDefined
    } else {
      !wantsFile && masks.isEmpty && super.pushAggregation(aggregation)
    }

  override def build(): ParquetScan = {
    renamedAggValues.foreach { case (aggSchema, vals, tags) =>
      return new PrecomputedAggScan(super.build(), aggSchema, vals, tags)
    }
    val inner = super.build()
    if (wantsFile) new FileTaggedScan(inner, masks)
    else if (masks.nonEmpty) new MaskedParquetScan(inner, masks)
    else bucketLayout(inner) match {
      // masks downgrade the bucketed-layout claim (same posture as an
      // untagged file): the masked rows need per-row filtering, so the
      // join shuffles rather than risking a wrong co-location shortcut;
      // compaction purges masks and restores the claim
      case Some((spec, buckets)) => new BucketedParquetScan(inner, spec, buckets)
      // plain scans carry the micro-batch tail (readStream.table) —
      // batch planning is untouched, the subtype only adds
      // toMicroBatchStream over the version ledger
      case None => new TailableParquetScan(inner)
    }
  }

  /** Bucketed layout in force for THIS scan ([[ParquetBucketing]]):
    * present only when the table pins a spec, the scan is a genuine
    * row scan (no aggregate pushdown), and EVERY live file carries a
    * bucket tag in its name. One untagged file downgrades to unknown
    * partitioning — a join then shuffles, it never mis-co-locates. */
  private def bucketLayout(inner: ParquetScan): Option[(LogBucketing.Spec, Seq[Int])] = {
    if (inner.pushedAggregate.nonEmpty) return None
    val roots = fileIndex.rootPaths
    if (roots.length != 1 || roots.head.getParent == null) return None
    val tableDir = roots.head.getParent.toString
    ParquetBucketing.readSpec(tableDir).flatMap { spec =>
      val live: Seq[String] = fileIndex match {
        case s: StatsPrunedFileIndex if s.allowed.isDefined => s.allowed.get.toSeq
        case _ => fileIndex.allFiles().map(_.getPath.getName)
      }
      val tags = live.map(ParquetBucketing.bucketOfName)
      if (live.nonEmpty && tags.forall(_.isDefined))
        Some((spec, tags.flatten.distinct.sorted))
      else None
    }
  }
}

/** The `_file`-bearing scan: a [[ParquetScan]] subtype (the builder's
  * return type demands one) that keeps the genuine scan's pushed
  * filters, footer-pruned listing and columnar decode inside each
  * per-file reader, re-grouped one partition per file with the name
  * appended to every row. */
class FileTaggedScan(val inner: ParquetScan,
    val masks: Map[String, Seq[String]] = Map.empty)
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters,
      inner.pushedVariantExtractions) {

  override def readSchema(): StructType = StructType(
    inner.readSchema().fields :+
      StructField(ParquetFileMetaColumn.name(), StringType, nullable = false))

  override def planInputPartitions(): Array[InputPartition] = {
    val files = super.planInputPartitions().flatMap {
      case fp: FilePartition => fp.files
      case other => throw new IllegalStateException(
        s"unexpected parquet partition shape: $other")
    }
    files.zipWithIndex.map { case (f, i) =>
      FilePartition(i, Array(f)): InputPartition
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    def routed(readSchema: StructType, f: PartitionReaderFactory) =
      EpochRouted.wrap(inner.sparkSession, inner.dataSchema, readSchema, f)
    // DV masks need the position-widened second factory (built on the
    // driver) — rows tag with `_file` AFTER the DV filter+project
    val widened =
      if (masks.valuesIterator.exists(DeletionVectors.anyDv)) {
        val ws = PinnedParquetFactory.widen(inner.readDataSchema)
        Some((routed(ws,
          PinnedParquetFactory(inner.sparkSession, inner.dataSchema, ws)), ws))
      } else None
    new FileTaggedReaderFactory(
      routed(inner.readDataSchema, super.createReaderFactory()), masks,
      inner.readDataSchema,
      inner.fileIndex.rootPaths.head.getParent.toString, widened)
  }

  override def description(): String =
    s"FileTagged(${super.description()})"

  override def equals(obj: Any): Boolean = obj match {
    case f: FileTaggedScan => inner == f.inner && masks == f.masks
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() ^ 0x5f11e7a9
}

/** The DELETE-MASK-aware scan ([[DeleteMasks]]): files carrying masks
  * are re-grouped into per-mask-signature partitions whose readers run
  * ROW-BASED with the compiled deleted-test applied (filter pushdown
  * and row-group skipping stay active — the mask is a predicate, not a
  * position list, so skipped rows cost nothing); unmasked files keep
  * their original bin-packed partitions AND columnar decode. Split
  * files are no problem: a predicate mask is range-independent. */
class MaskedParquetScan(val inner: ParquetScan, val masks: Map[String, Seq[String]])
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters,
      inner.pushedVariantExtractions)
    with ParquetTailable {

  override protected def tailTableDir: String =
    inner.fileIndex.rootPaths.head.getParent.toString
  override protected def tailDataSchema: StructType = inner.dataSchema
  override protected def tailOptions: CaseInsensitiveStringMap = inner.options

  private def maskOf(
      f: org.apache.spark.sql.execution.datasources.PartitionedFile): Seq[String] =
    masks.getOrElse(PartitionSpecs.relFromData(f.toPath), Seq.empty)

  override def planInputPartitions(): Array[InputPartition] = {
    val cleanParts = Seq.newBuilder[FilePartition]
    val maskedFiles = Seq.newBuilder[
      org.apache.spark.sql.execution.datasources.PartitionedFile]
    var idx = 0
    super.planInputPartitions().foreach {
      case fp: FilePartition =>
        val (masked, clean) = fp.files.partition(f => maskOf(f).nonEmpty)
        maskedFiles ++= masked
        if (clean.nonEmpty) { cleanParts += FilePartition(idx, clean); idx += 1 }
      case other => throw new IllegalStateException(
        s"unexpected parquet partition shape: $other")
    }
    val maskedParts = maskedFiles.result().groupBy(f => maskOf(f).sorted)
      .toSeq.sortBy(_._1.mkString)
      .map { case (preds, files) =>
        val p = MaskedFilePartition(FilePartition(idx, files.toArray), preds)
        idx += 1
        p
      }
    // homogeneous batch rule (see [[MaskedReaderFactory]]): pruning may
    // have dropped every masked file, in which case the clean scan
    // keeps columnar decode; otherwise wrap the clean partitions too
    // (empty preds — pass-through rows) so the batch is all-row
    if (maskedParts.isEmpty) cleanParts.result().toArray
    else (cleanParts.result().map(fp =>
      MaskedFilePartition(fp, Seq.empty): InputPartition) ++ maskedParts).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val tableDir = inner.fileIndex.rootPaths.head.getParent.toString
    // every bottom factory is epoch-routed ([[EpochRouted]]): files
    // still carrying pre-rename names read through a name-vector-
    // matched twin; mask wrappers stack above unchanged
    def routed(readSchema: StructType, f: PartitionReaderFactory) =
      EpochRouted.wrap(inner.sparkSession, inner.dataSchema, readSchema, f)
    val primary = routed(inner.readDataSchema, super.createReaderFactory())
    if (masks.valuesIterator.exists(DeletionVectors.anyDv)) {
      // positional masks: route DV-bearing partitions through a
      // position-widened second factory, built HERE on the driver
      val widenedSchema = PinnedParquetFactory.widen(inner.readDataSchema)
      new DvMaskedReaderFactory(primary,
        routed(widenedSchema,
          PinnedParquetFactory(inner.sparkSession, inner.dataSchema, widenedSchema)),
        tableDir, widenedSchema, inner.readDataSchema)
    } else new MaskedReaderFactory(primary,
      inner.readDataSchema, Some(tableDir))
  }

  override def description(): String =
    s"Masked(files=${masks.size})(${super.description()})"

  override def equals(obj: Any): Boolean = obj match {
    case m: MaskedParquetScan => inner == m.inner && masks == m.masks
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() ^ 0x3a5ced11
}

/** A group of same-mask-signature file ranges. */
case class MaskedFilePartition(fp: FilePartition, preds: Seq[String])
    extends InputPartition {
  override def preferredLocations(): Array[String] = fp.preferredLocations()
}

/** A schema-pinned vectorized parquet reader factory over an EMPTY
  * file index: the factory carries only schema + conf (per-file work
  * comes from each partition's PartitionedFile), so no directory
  * listing is paid. DRIVER-ONLY construction (it touches the session);
  * the returned factory is serializable and ships to tasks. This is
  * how every DV-aware path obtains its position-widened reader —
  * [[DeleteMasks.POS_COL]] must never surface in a schema Catalyst
  * validates against the relation output. */
private[sources] object PinnedParquetFactory {
  def apply(spark: org.apache.spark.sql.SparkSession,
      dataSchema: StructType, readSchema: StructType): PartitionReaderFactory = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
      classic, Seq.empty, Map.empty, Some(dataSchema))
    val builder = new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
      classic, index, dataSchema, dataSchema,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
    builder.pruneColumns(readSchema)
    builder.build().createReaderFactory()
  }

  /** `rowSchema` widened by the synthetic row-position column. */
  def widen(rowSchema: StructType): StructType =
    StructType(rowSchema.fields :+
      StructField(DeleteMasks.POS_COL, org.apache.spark.sql.types.LongType))
}

/** [[MaskedReaderFactory]] semantics for predicate masks, plus
  * DV-bearing partitions ([[DeletionVectors]]) rerouted through the
  * position-widened factory with survivors projected back to the scan
  * row schema. A top-level class on purpose — PartitionReaderFactory
  * ships to every task, so every field must be Serializable (both
  * delegates are Spark parquet factories, which are). */
class DvMaskedReaderFactory(plain: PartitionReaderFactory,
    widened: PartitionReaderFactory, tableDir: String,
    widenedSchema: StructType, rowSchema: StructType)
    extends PartitionReaderFactory {
  private val inner = new MaskedReaderFactory(plain, rowSchema, Some(tableDir))

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(p)
  override def createColumnarReader(p: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(p)
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case MaskedFilePartition(fp, preds) if DeletionVectors.anyDv(preds) =>
        DeleteMasks.projectingDvReader(widened.createReader(fp),
          tableDir, widenedSchema, rowSchema, preds)
      case other => inner.createReader(other)
    }
}

class MaskedReaderFactory(inner: PartitionReaderFactory,
    rowSchema: StructType, tableDir: Option[String] = None)
    extends PartitionReaderFactory {

  /** Spark rejects scans that MIX columnar and row partitions, so the
    * answer is per-partition-TYPE and the planners keep each batch
    * homogeneous: when any file in a batch carries masks, EVERY
    * partition of that batch is wrapped as [[MaskedFilePartition]]
    * (possibly with empty predicates) → all-row; a mask-free batch
    * plans plain FilePartitions and keeps the inner factory's columnar
    * decode — the transient row-based tax applies only while masks are
    * pending, and only to batches that actually contain them. */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    partition match {
      case _: MaskedFilePartition => false
      case p => inner.supportColumnarReads(p)
    }

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    inner.createColumnarReader(partition)

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case MaskedFilePartition(fp, preds) if preds.nonEmpty =>
        // the table dir is consulted ONLY to resolve DV sidecars;
        // predicate masks never touch it. A DV entry reaching a
        // factory built without one fails LOUDLY — the old
        // getParent.getParent guess resolved a partitioned layout
        // (data/<col>~<val>/f.parquet) to data/ and would seek the
        // sidecar at data/_dv, silently resurrecting deleted rows
        // (VERDICT r14 wrong #3).
        val dir = tableDir.getOrElse {
          if (DeletionVectors.anyDv(preds)) throw new IllegalStateException(
            "deletion-vector mask reached a MaskedReaderFactory built " +
              "without a tableDir — the sidecar directory cannot be " +
              "derived from file paths on partitioned layouts; pass the " +
              "table dir explicitly at scan build")
          "" // unused for pure-predicate masks
        }
        DeleteMasks.filteringReaderFn(inner.createReader(fp),
          DeleteMasks.compiledRowFilter(dir, rowSchema, preds))
      case MaskedFilePartition(fp, _) => inner.createReader(fp)
      case p => inner.createReader(p)
    }
}

/** The ordinary catalog parquet scan, plus the ledger-tailing
  * micro-batch stream ([[ParquetTailable]]). Construction mirrors
  * [[FileTaggedScan]]: same ctor args as the genuine scan, so every
  * batch code path is inherited unchanged. */
class TailableParquetScan(val inner: ParquetScan)
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters,
      inner.pushedVariantExtractions)
    with ParquetTailable {

  override protected def tailTableDir: String =
    inner.fileIndex.rootPaths.head.getParent.toString
  override protected def tailDataSchema: StructType = inner.dataSchema
  override protected def tailOptions
      : org.apache.spark.sql.util.CaseInsensitiveStringMap = inner.options

  override def createReaderFactory(): PartitionReaderFactory =
    EpochRouted.wrap(inner.sparkSession, inner.dataSchema,
      inner.readDataSchema, super.createReaderFactory())

  override def equals(obj: Any): Boolean = obj match {
    case t: TailableParquetScan => inner == t.inner
    case _ => false
  }
  override def hashCode(): Int = inner.hashCode() ^ 0x7a11ab1e
}

class FileTaggedReaderFactory(inner: PartitionReaderFactory,
    masks: Map[String, Seq[String]] = Map.empty,
    rowSchema: StructType = new StructType(),
    tableDir: String = "",
    widened: Option[(PartitionReaderFactory, StructType)] = None)
    extends PartitionReaderFactory {

  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val fp = partition.asInstanceOf[FilePartition]
    // the group identity is the data/-relative name (equal to the bare
    // name on the flat layout) — partitioned tables' rows tag with
    // their partition-dir path so `_file` stays a unique file id
    val name = PartitionSpecs.relFromData(fp.files.head.toPath)
    // masked rows are deleted on the `_file` surface too — the runtime
    // group-filter subquery and provenance queries must not see them.
    // DV entries reroute through the position-widened factory (built
    // on the driver) and project back before the name is appended.
    val delegate = masks.get(name).filter(_.nonEmpty) match {
      case Some(preds) if DeletionVectors.anyDv(preds) =>
        val (wf, ws) = widened.getOrElse(throw new IllegalStateException(
          s"DV mask on $name but the scan built no widened factory"))
        DeleteMasks.projectingDvReader(wf.createReader(fp),
          tableDir, ws, rowSchema, preds)
      case Some(preds) => DeleteMasks.filteringReaderFn(inner.createReader(fp),
        DeleteMasks.compiledRowFilter(tableDir, rowSchema, preds))
      case None => inner.createReader(fp)
    }
    new PartitionReader[InternalRow] {
      private val fileRow =
        new GenericInternalRow(Array[Any](UTF8String.fromString(name)))
      private val joined = new JoinedRow
      override def next(): Boolean = delegate.next()
      override def get(): InternalRow = joined(delegate.get(), fileRow)
      override def close(): Unit = delegate.close()
    }
  }
}

/** A pushed aggregate over a RENAMED table served ENTIRELY from the
  * translated footer/sidecar stats ([[StatsPrunedFileIndex]]): one
  * value partition, no data file opened — the parquet twin of the log
  * tier's metadata-served aggregates, for the tables Spark's own
  * footer-aggregate path cannot read (stats keyed by historical
  * names). Values were computed and PINNED at pushdown-acceptance
  * time from the index's listing snapshot. */
class PrecomputedAggScan(val inner: ParquetScan, aggSchema: StructType,
    values: Seq[Any], tags: Seq[String])
    extends ParquetScan(inner.sparkSession, inner.hadoopConf, inner.fileIndex,
      inner.dataSchema, inner.readDataSchema, inner.readPartitionSchema,
      inner.pushedFilters, inner.options, inner.pushedAggregate,
      inner.partitionFilters, inner.dataFilters,
      inner.pushedVariantExtractions) {

  override def readSchema(): StructType = aggSchema

  override def planInputPartitions(): Array[InputPartition] =
    Array(PrecomputedAggPartition(values))

  override def createReaderFactory(): PartitionReaderFactory =
    new PrecomputedAggReaderFactory

  override def description(): String =
    s"PrecomputedAgg(translated-stats)[${tags.mkString(", ")}]" +
      s"(${inner.description()})"

  override def equals(obj: Any): Boolean = obj match {
    case p: PrecomputedAggScan =>
      inner == p.inner && aggSchema == p.aggSchema0 && values == p.values0
    case _ => false
  }
  override def hashCode(): Int =
    (inner.hashCode() ^ 0x51a7c0de) + values.hashCode()
  private[sources] def aggSchema0: StructType = aggSchema
  private[sources] def values0: Seq[Any] = values
}

case class PrecomputedAggPartition(values: Seq[Any]) extends InputPartition

class PrecomputedAggReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case PrecomputedAggPartition(values) => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = new GenericInternalRow(
          values.map {
            case s: String => UTF8String.fromString(s)
            case other => other
          }.toArray)
        override def close(): Unit = ()
      }
      case other => throw new IllegalStateException(
        s"unexpected partition for a precomputed aggregate: $other")
    }
  // one constant row: the row reader is the whole story
  override def supportColumnarReads(partition: InputPartition): Boolean = false
}
