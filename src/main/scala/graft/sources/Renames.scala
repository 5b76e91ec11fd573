package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.read.PartitionReaderFactory
import org.apache.spark.sql.types.{MetadataBuilder, StructField, StructType}

/** COLUMN RENAME without a rewrite on a by-NAME format (VERDICT r13
  * #2): parquet matches columns by name, so after `RENAME COLUMN a TO
  * b` the pre-rename files still carry `a` — a plain read under the
  * new declared schema would serve silent NULLs. Instead of field IDs
  * in every file (which existing files don't have and can never get
  * without a rewrite), the declared schema records each field's NAME
  * HISTORY in field metadata:
  *
  *   `graft.renames` = [{"from": "a", "seq": 3}, …]
  *
  * where `seq` is a table-wide rename ordinal (strictly increasing
  * across ALL fields), so the linear sequence of historical SCHEMA
  * EPOCHS is reconstructible: epoch e names every field as it was
  * after the first e renames. Readers resolve each data FILE to the
  * newest epoch whose names it carries (one footer read, executor-
  * side, cached) and read it under that epoch's name vector — same
  * positions, same types, so the produced rows are layout-identical
  * and need no projection. Writers always write CURRENT names; any
  * full rewrite (compaction, zorder, CoW DML) therefore migrates
  * files forward, and a compacted table reads entirely through the
  * primary factory again.
  *
  * Scale posture: epoch factories are built once per scan on the
  * driver (O(#renames), typically 1–2); the per-file footer sniff is
  * one ~8 KB read adjacent to data the task is about to scan anyway,
  * cached per (path, length) for the executor's lifetime. */
object Renames {

  val KEY = "graft.renames"

  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmt: Formats = DefaultFormats

  final case class Entry(from: String, seq: Int)

  def entriesOf(f: StructField): Seq[Entry] =
    if (!f.metadata.contains(KEY)) Seq.empty
    else JsonMethods.parse(f.metadata.getString(KEY)) match {
      case JArray(items) => items.map { j =>
        Entry((j \ "from").extract[String], (j \ "seq").extract[Int])
      }
      case _ => Seq.empty
    }

  def hasRenames(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(KEY))

  /** Every name a field has EVER had (history + current). */
  def allNamesOf(f: StructField): Seq[String] =
    entriesOf(f).map(_.from) :+ f.name

  private def maxSeq(schema: StructType): Int =
    schema.fields.flatMap(entriesOf(_).map(_.seq)).foldLeft(0)(math.max)

  /** Record `oldName` → the field now called `newName` (call AFTER the
    * structural rename was applied to `schema`). */
  def addRename(schema: StructType, oldName: String, newName: String): StructType = {
    val seq = maxSeq(schema) + 1
    StructType(schema.fields.map { f =>
      if (!f.name.equalsIgnoreCase(newName)) f
      else {
        val entries = entriesOf(f) :+ Entry(oldName, seq)
        val json = JsonMethods.compact(JsonMethods.render(JArray(
          entries.map(e => JObject("from" -> JString(e.from),
            "seq" -> JInt(e.seq))).toList)))
        f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
          .putString(KEY, json).build())
      }
    })
  }

  /** The historical name vectors, OLDEST first, ending with the
    * current names — one entry per epoch that DIFFERS from its
    * successor. Each is the full-width name list (types/positions are
    * always the current declared ones; only names move). */
  def epochNameVectors(schema: StructType): Seq[Seq[String]] = {
    val mx = maxSeq(schema)
    (0 until mx).map { e =>
      schema.fields.toSeq.map { f =>
        // name at epoch e = the earliest recorded rename with seq > e
        // (that rename's `from` was the field's name until it fired)
        entriesOf(f).sortBy(_.seq).collectFirst {
          case Entry(from, s) if s > e => from
        }.getOrElse(f.name)
      }
    }.distinct
  }

  /** `readSchema` with names replaced by `nameVector` entries (matched
    * through the declared schema by position of the pruned fields). */
  private def renamed(declared: StructType, readSchema: StructType,
      nameVector: Seq[String]): StructType = {
    val byCurrent: Map[String, String] =
      declared.fields.map(_.name.toLowerCase).zip(nameVector).toMap
    StructType(readSchema.fields.map { f =>
      byCurrent.get(f.name.toLowerCase).fold(f)(n => f.copy(name = n))
    })
  }

  /** The (full epoch schema, epoch read schema) ladder a scan needs,
    * NEWEST first, EXCLUDING the current epoch (a file carrying the
    * current names reads through the primary factory). Empty when the
    * table has no renames. Fields of `readSchema` that are not
    * declared columns (the synthetic row-position column) pass
    * through untouched. */
  def epochReadSchemas(declared: StructType,
      readSchema: StructType): Seq[(StructType, StructType)] =
    epochNameVectors(declared).reverse
      .map(v => (renamed(declared, declared, v), renamed(declared, readSchema, v)))
      .filterNot(_._2.fieldNames.sameElements(readSchema.fieldNames))

  // --- per-file vintage resolution -----------------------------------

  /** Top-level column names of one parquet file's footer, lowercased;
    * cached per (path, length) for the JVM's lifetime (files are
    * immutable). Runs executor-side with the SparkEnv-derived conf. */
  private val footerCache =
    new java.util.concurrent.ConcurrentHashMap[String, Set[String]]

  def fileColumns(conf: Configuration, path: Path, len: Long): Set[String] = {
    val key = s"$path#$len"
    val hit = footerCache.get(key)
    if (hit != null) return hit
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(path, conf)
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val names = try {
      val b = Set.newBuilder[String]
      r.getFileMetaData.getSchema.getFields.forEach(f => b += f.getName.toLowerCase)
      b.result()
    } finally r.close()
    footerCache.put(key, names)
    names
  }

  /** Index into `epochSchemas` (NEWEST-first, current excluded) of the
    * schema this file must be read under; -1 = the primary (current)
    * schema. A file is compatible with a schema when every REQUESTED
    * field's name is present, or absent under EVERY name the field
    * ever had (column added later — reads null either way). */
  def resolve(fileCols: Set[String], current: StructType,
      epochSchemas: Seq[StructType], declared: StructType): Int = {
    def compatible(s: StructType): Boolean =
      s.fields.zip(current.fields).forall { case (ef, cf) =>
        val everNames = declared.fields
          .find(_.name.equalsIgnoreCase(cf.name))
          .map(allNamesOf(_).map(_.toLowerCase)).getOrElse(Seq(cf.name.toLowerCase))
        fileCols(ef.name.toLowerCase) || !everNames.exists(fileCols)
      }
    if (compatible(current)) -1
    else {
      val i = epochSchemas.indexWhere(compatible)
      // unknown vintage: REFUSE rather than fall back to the primary —
      // Spark's parquet readers silently null-fill columns absent from
      // a file, so an externally-copied file of no known epoch would
      // serve silent NULLs for a renamed column, the exact failure
      // mode this module exists to prevent (ADVICE r15)
      if (i >= 0) i else throw new IllegalStateException(
        s"parquet file of unknown schema vintage: its columns " +
          s"[${fileCols.toSeq.sorted.mkString(", ")}] match neither the " +
          s"current schema nor any recorded rename epoch of " +
          s"[${current.fieldNames.mkString(", ")}] — refusing to read it " +
          "(Spark would silently null-fill the renamed column). If the " +
          "file is legitimate, register its name vector via ALTER or " +
          "rewrite it through compaction.")
    }
  }

  // --- DataFrame-level rename-aware reads (maintenance/DML paths) ----

  import org.apache.spark.sql.{Column, DataFrame, SparkSession}
  import org.apache.spark.sql.functions.{col, input_file_name}

  /** The visible surface of `names` under a possibly-renamed declared
    * schema, as DECLARED columns plus `_gfilefull` (originating file)
    * and `_gpos` (row position in that file): files group by their
    * resolved epoch (one footer read per file, cached), each group
    * reads under its own name vector and aliases back. The no-rename
    * fast path is a single plain read. */
  def read(spark: SparkSession, declared: StructType,
      dataDir: Path, names: Seq[String]): DataFrame = {
    def metaOf(df: DataFrame): DataFrame = df
      .withColumn("_gfilefull", input_file_name())
      .withColumn("_gpos", col("_metadata.row_index"))
    def pathsOf(ns: Seq[String]) = ns.map(n => new Path(dataDir, n).toString)
    if (names.isEmpty) {
      // no _metadata on a local relation — synthesize the meta columns
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), declared)
        .withColumn("_gfilefull", org.apache.spark.sql.functions.lit(""))
        .withColumn("_gpos", org.apache.spark.sql.functions.lit(0L))
        .limit(0)
    }
    if (!hasRenames(declared)) {
      return metaOf(spark.read.schema(declared).parquet(pathsOf(names): _*))
    }
    val conf = org.apache.spark.sql.GraftShims.hadoopConf()
    val fs = dataDir.getFileSystem(conf)
    val epochs = epochReadSchemas(declared, declared)
    // footer sniffs in parallel (cached, ~8 KB each) — a large
    // maintenance read over a renamed table would otherwise pay an
    // O(files) SERIAL driver walk
    val resolved: Seq[(String, Int)] =
      Compaction.inParallel(names, par = 16) { n =>
        val p = new Path(dataDir, n)
        n -> resolve(fileColumns(conf, p, fs.getFileStatus(p).getLen),
          declared, epochs.map(_._2), declared)
      }
    val groups: Map[Int, Seq[String]] =
      resolved.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    groups.toSeq.sortBy(_._1).map { case (idx, ns) =>
      if (idx < 0) metaOf(spark.read.schema(declared).parquet(pathsOf(ns): _*))
      else {
        val (full, _) = epochs(idx)
        val raw = spark.read.schema(full).parquet(pathsOf(ns): _*)
        raw.select((full.fields.zip(declared.fields).map { case (ef, df) =>
          col(ef.name).as(df.name)
        } :+ input_file_name().as("_gfilefull")
          :+ col("_metadata.row_index").as("_gpos")).toSeq: _*)
      }
    }.reduce(_ unionByName _)
  }

  /** [[read]] projected to the declared columns only. */
  def readPlain(spark: SparkSession, declared: StructType,
      dataDir: Path, names: Seq[String]): DataFrame =
    read(spark, declared, dataDir, names)
      .select(declared.fieldNames.toSeq.map(col): _*)
}

/** Per-FILE epoch routing at the BOTTOM of a reader-factory stack: a
  * file still carrying a pre-rename name vector reads through the
  * matching epoch factory (layout-identical rows — same positions and
  * types, different parquet names), everything else delegates to the
  * primary. Mask/file-tag wrappers stack ABOVE unchanged. Partitions
  * whose files ALL resolve primary delegate whole (bin-packed reads
  * keep their efficiency); mixed partitions concatenate per-file
  * readers. Serializable; the footer sniff runs executor-side against
  * the JVM-lifetime cache. */
class EpochRoutedFactory(primary: PartitionReaderFactory,
    epochs: Seq[(StructType, PartitionReaderFactory)],
    current: StructType, declared: StructType)
    extends PartitionReaderFactory {

  private def pickIdx(f: org.apache.spark.sql.execution.datasources.PartitionedFile,
      conf: Configuration): Int =
    Renames.resolve(Renames.fileColumns(conf, f.toPath, f.fileSize),
      current, epochs.map(_._1), declared)

  private def factoryAt(i: Int): PartitionReaderFactory =
    if (i < 0) primary else epochs(i)._2

  override def supportColumnarReads(
      p: org.apache.spark.sql.connector.read.InputPartition): Boolean =
    primary.supportColumnarReads(p)

  override def createReader(
      p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.catalyst.InternalRow] = p match {
    case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
      val conf = org.apache.spark.sql.GraftShims.hadoopConf()
      val idxs = fp.files.map(pickIdx(_, conf))
      if (idxs.forall(_ < 0)) primary.createReader(fp)
      else new org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.catalyst.InternalRow] {
        private var i = 0
        private var cur: org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.catalyst.InternalRow] = _
        override def next(): Boolean = {
          while (true) {
            if (cur == null) {
              if (i >= fp.files.length) return false
              cur = factoryAt(idxs(i)).createReader(
                org.apache.spark.sql.execution.datasources.FilePartition(
                  fp.index, Array(fp.files(i))))
              i += 1
            }
            if (cur.next()) return true
            cur.close(); cur = null
          }
          false
        }
        override def get(): org.apache.spark.sql.catalyst.InternalRow = cur.get()
        override def close(): Unit = if (cur != null) cur.close()
      }
    case other => primary.createReader(other)
  }

  override def createColumnarReader(
      p: org.apache.spark.sql.connector.read.InputPartition)
      : org.apache.spark.sql.connector.read.PartitionReader[
        org.apache.spark.sql.vectorized.ColumnarBatch] = p match {
    case fp: org.apache.spark.sql.execution.datasources.FilePartition =>
      val conf = org.apache.spark.sql.GraftShims.hadoopConf()
      val idxs = fp.files.map(pickIdx(_, conf))
      if (idxs.forall(_ < 0)) primary.createColumnarReader(fp)
      else new org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.vectorized.ColumnarBatch] {
        private var i = 0
        private var cur: org.apache.spark.sql.connector.read.PartitionReader[
          org.apache.spark.sql.vectorized.ColumnarBatch] = _
        override def next(): Boolean = {
          while (true) {
            if (cur == null) {
              if (i >= fp.files.length) return false
              cur = factoryAt(idxs(i)).createColumnarReader(
                org.apache.spark.sql.execution.datasources.FilePartition(
                  fp.index, Array(fp.files(i))))
              i += 1
            }
            if (cur.next()) return true
            cur.close(); cur = null
          }
          false
        }
        override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = cur.get()
        override def close(): Unit = if (cur != null) cur.close()
      }
    case other => primary.createColumnarReader(other)
  }
}

/** Driver-side construction of the epoch ladder for one scan. */
object EpochRouted {
  def wrap(spark: org.apache.spark.sql.SparkSession, declared: StructType,
      readSchema: StructType,
      primary: PartitionReaderFactory): PartitionReaderFactory =
    if (!Renames.hasRenames(declared)) primary
    else {
      val eps = Renames.epochReadSchemas(declared, readSchema).map {
        case (full, rs) => (rs, PinnedParquetFactory(spark, full, rs))
      }
      if (eps.isEmpty) primary
      else new EpochRoutedFactory(primary, eps, readSchema, declared)
    }
}
