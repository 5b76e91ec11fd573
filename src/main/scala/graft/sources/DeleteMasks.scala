package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BasePredicate, BoundReference, Expression, Literal => CLit, Or => COr, Predicate => CPredicate}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** MERGE-ON-READ delete state — the ClickHouse "lightweight DELETE"
  * posture (`DELETE FROM t WHERE p` marks rows; the physical rewrite
  * happens at merge/compaction time, `hashes_test.go:235-239` is the
  * exact statement the reference's tests run) re-expressed for an
  * immutable-file lake:
  *
  * A masking DELETE attaches the RESIDUAL PREDICATE to each data file
  * it could not drop whole, inside the same atomic version publish that
  * would otherwise carry the rewrite ([[VersionLedger.Payload.masks]]).
  * Because parquet files are immutable, a predicate pinned to a
  * specific file is EXACTLY equivalent to a row-position bitmap — rows
  * matching it are deleted forever, later appends land in new files —
  * without needing stable row positions (which pushdown + row-group
  * skipping make treacherous) or sidecar files (which vacuum would have
  * to track). Stacked deletes append predicates; a row is deleted when
  * ANY attached predicate evaluates TRUE (three-valued: NULL is not
  * deleted, the SQL DELETE rule).
  *
  * Write amplification: a 1-row DELETE on a 100 TB table writes one
  * ledger payload — zero data bytes; every data file stays
  * byte-identical. Read cost: masked files decode row-based (the mask
  * is evaluated per row), unmasked files keep columnar batches; any
  * rewrite (compaction, Z-order, UPDATE/MERGE, copy-on-write DELETE)
  * PURGES the masks it consumes — the rewrite-at-merge-time half of
  * the ClickHouse contract.
  *
  * Predicates serialize as a small JSON tree over the v1 `Filter`
  * shapes [[ParquetDelete.supported]] already gates on; anything not
  * serializable falls back to copy-on-write. Mode knob:
  * `spark.graft.delete.mode` = `copy-on-write` (default) |
  * `merge-on-read` (requires a versioned table). */
object DeleteMasks {

  val MODE_KEY = "spark.graft.delete.mode"

  def mergeOnRead(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.conf.get(MODE_KEY, "copy-on-write") == "merge-on-read"

  // --- predicate JSON codec ---------------------------------------

  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods

  private implicit val fmt: Formats = DefaultFormats

  /** Typed scalar → JSON; None = value type we refuse to carry (then
    * the DELETE falls back to copy-on-write). Dates/timestamps are
    * normalized to epoch days / micros so the round-trip is exact. */
  private def valJson(v: Any): Option[JValue] = v match {
    case null => Some(("t" -> "null") ~ ("v" -> JNull))
    case b: Boolean => Some(("t" -> "bool") ~ ("v" -> b))
    case n: Byte => Some(("t" -> "byte") ~ ("v" -> n.toLong))
    case n: Short => Some(("t" -> "short") ~ ("v" -> n.toLong))
    case n: Int => Some(("t" -> "int") ~ ("v" -> n.toLong))
    case n: Long => Some(("t" -> "long") ~ ("v" -> n))
    case n: Float => Some(("t" -> "float") ~ ("v" -> n.toDouble))
    case n: Double => Some(("t" -> "double") ~ ("v" -> n))
    case s: String => Some(("t" -> "string") ~ ("v" -> s))
    case d: java.sql.Date => Some(("t" -> "date") ~ ("v" -> d.toLocalDate.toEpochDay))
    case d: java.time.LocalDate => Some(("t" -> "date") ~ ("v" -> d.toEpochDay))
    case t: java.sql.Timestamp =>
      val i = t.toInstant
      Some(("t" -> "ts") ~ ("v" -> (Math.multiplyExact(i.getEpochSecond, 1000000L)
        + i.getNano / 1000L)))
    case i: java.time.Instant =>
      Some(("t" -> "ts") ~ ("v" -> (Math.multiplyExact(i.getEpochSecond, 1000000L)
        + i.getNano / 1000L)))
    case d: java.math.BigDecimal => Some(("t" -> "dec") ~ ("v" -> d.toPlainString))
    case d: scala.math.BigDecimal => Some(("t" -> "dec") ~ ("v" -> d.bigDecimal.toPlainString))
    case _ => None
  }

  private def valOf(j: JValue): Any = {
    val t = (j \ "t").extract[String]
    val v = j \ "v"
    t match {
      case "null" => null
      case "bool" => v.extract[Boolean]
      case "byte" => v.extract[Long].toByte
      case "short" => v.extract[Long].toShort
      case "int" => v.extract[Long].toInt
      case "long" => v.extract[Long]
      case "float" => v.extract[Double].toFloat
      case "double" => v.extract[Double]
      case "string" => v.extract[String]
      case "date" => java.time.LocalDate.ofEpochDay(v.extract[Long])
      case "ts" =>
        val micros = v.extract[Long]
        java.time.Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
          Math.floorMod(micros, 1000000L) * 1000L)
      case "dec" => new java.math.BigDecimal(v.extract[String])
      case other => throw new IllegalStateException(s"unknown mask value tag $other")
    }
  }

  private def filterJson(f: Filter): Option[JValue] = f match {
    case And(l, r) =>
      for (a <- filterJson(l); b <- filterJson(r))
        yield ("op" -> "and") ~ ("l" -> a) ~ ("r" -> b): JValue
    case Or(l, r) =>
      for (a <- filterJson(l); b <- filterJson(r))
        yield ("op" -> "or") ~ ("l" -> a) ~ ("r" -> b): JValue
    case Not(c) => filterJson(c).map(x => ("op" -> "not") ~ ("c" -> x): JValue)
    case AlwaysTrue() => Some(("op" -> "true"): JValue)
    case AlwaysFalse() => Some(("op" -> "false"): JValue)
    case IsNull(a) => Some(("op" -> "isnull") ~ ("col" -> a): JValue)
    case IsNotNull(a) => Some(("op" -> "notnull") ~ ("col" -> a): JValue)
    case EqualTo(a, v) => leaf("eq", a, v)
    case EqualNullSafe(a, v) => leaf("eqns", a, v)
    case GreaterThan(a, v) => leaf("gt", a, v)
    case GreaterThanOrEqual(a, v) => leaf("gte", a, v)
    case LessThan(a, v) => leaf("lt", a, v)
    case LessThanOrEqual(a, v) => leaf("lte", a, v)
    case StringStartsWith(a, p) => leaf("startswith", a, p)
    case In(a, vs) =>
      val encoded = vs.toSeq.map(valJson)
      if (encoded.exists(_.isEmpty)) None
      else Some(("op" -> "in") ~ ("col" -> a) ~ ("vals" -> JArray(encoded.flatten.toList)): JValue)
    case _ => None
  }

  private def filterOf(j: JValue): Filter = (j \ "op").extract[String] match {
    case "and" => And(filterOf(j \ "l"), filterOf(j \ "r"))
    case "or" => Or(filterOf(j \ "l"), filterOf(j \ "r"))
    case "not" => Not(filterOf(j \ "c"))
    case "true" => AlwaysTrue()
    case "false" => AlwaysFalse()
    case "isnull" => IsNull((j \ "col").extract[String])
    case "notnull" => IsNotNull((j \ "col").extract[String])
    case "eq" => EqualTo((j \ "col").extract[String], valOf(j \ "val"))
    case "eqns" => EqualNullSafe((j \ "col").extract[String], valOf(j \ "val"))
    case "gt" => GreaterThan((j \ "col").extract[String], valOf(j \ "val"))
    case "gte" => GreaterThanOrEqual((j \ "col").extract[String], valOf(j \ "val"))
    case "lt" => LessThan((j \ "col").extract[String], valOf(j \ "val"))
    case "lte" => LessThanOrEqual((j \ "col").extract[String], valOf(j \ "val"))
    case "startswith" =>
      StringStartsWith((j \ "col").extract[String], valOf(j \ "val").asInstanceOf[String])
    case "in" =>
      In((j \ "col").extract[String], (j \ "vals").extract[List[JValue]]
        .map(valOf).toArray)
    case other => throw new IllegalStateException(s"unknown mask op $other")
  }

  private def leaf(op: String, col: String, v: Any): Option[JValue] =
    valJson(v).map(jv => ("op" -> op) ~ ("col" -> col) ~ ("val" -> jv): JValue)

  /** Serialize a delete predicate; None = not maskable (fall back to
    * copy-on-write). */
  def serialize(f: Filter): Option[String] =
    filterJson(f).map(j => JsonMethods.compact(JsonMethods.render(j)))

  def deserialize(s: String): Filter = filterOf(JsonMethods.parse(s))

  /** Spark's parquet readers populate a LongType column of this name
    * with each row's 0-based position in its file (correct under
    * pushdown and row-group skipping) — the read-side carrier for
    * positional deletion vectors ([[DeletionVectors]]). */
  val POS_COL: String = org.apache.spark.sql.execution.datasources.parquet
    .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME

  /** Column names a serialized mask references (for read-schema
    * widening: the mask must be evaluable on the scan's output rows).
    * DV entries reference no DATA column (their carrier is the
    * synthetic row-position column, handled by the scan builder). */
  def references(pred: String): Set[String] = {
    if (DeletionVectors.isDv(pred)) return Set.empty
    def refs(f: Filter): Set[String] = f match {
      case And(l, r) => refs(l) ++ refs(r)
      case Or(l, r) => refs(l) ++ refs(r)
      case Not(c) => refs(c)
      case IsNull(a) => Set(a)
      case IsNotNull(a) => Set(a)
      case EqualTo(a, _) => Set(a)
      case EqualNullSafe(a, _) => Set(a)
      case GreaterThan(a, _) => Set(a)
      case GreaterThanOrEqual(a, _) => Set(a)
      case LessThan(a, _) => Set(a)
      case LessThanOrEqual(a, _) => Set(a)
      case StringStartsWith(a, _) => Set(a)
      case In(a, _) => Set(a)
      case _ => Set.empty
    }
    refs(deserialize(pred))
  }

  /** "Deleted" as a Catalyst expression over `schema`: OR of the
    * parsed predicates — a row is deleted when ANY evaluates TRUE. */
  def deletedExpr(schema: StructType, preds: Seq[String]): Expression =
    preds.map { p =>
      ParquetDelete.toCatalyst(schema, deserialize(p)).getOrElse(
        throw new IllegalStateException(
          s"delete mask predicate no longer translates against the " +
            s"declared schema (dropped column?): $p"))
    }.reduceOption(COr).getOrElse(CLit(false, BooleanType))

  /** A VISIBLE-row Column (for DataFrame-level maintenance reads):
    * NOT(deleted), with NULL → visible (SQL DELETE removes only TRUE). */
  def visibleColumn(schema: StructType, preds: Seq[String]): org.apache.spark.sql.Column = {
    val unresolved = deletedExpr(schema, preds).transform {
      case a: AttributeReference =>
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
    }
    !org.apache.spark.sql.functions.coalesce(
      org.apache.spark.sql.GraftShims.column(unresolved),
      org.apache.spark.sql.functions.lit(false))
  }

  /** [[compileDeleted]] generalized to mask lists that may contain DV
    * entries ([[DeletionVectors]]): the predicate part compiles as
    * before; the DV part tests the row's position (the synthetic
    * [[POS_COL]] the scan builder widened into `rowSchema`) against
    * the sidecar bitmaps. Throws loudly when a DV entry is present but
    * the reader's rows carry no position column — silently ignoring it
    * would resurrect deleted rows. */
  def compiledRowFilter(tableDir: String, rowSchema: StructType,
      preds: Seq[String]): InternalRow => Boolean =
    compiledRowFilterAt(tableDir, rowSchema, preds, POS_COL)

  /** [[compiledRowFilter]] with an explicit position-column name — the
    * log tier's readers expose line ordinals as
    * [[LimitHashLog.LPOS_COL]] instead of the parquet row-index
    * column. */
  def compiledRowFilterAt(tableDir: String, rowSchema: StructType,
      preds: Seq[String], posCol: String): InternalRow => Boolean = {
    val (dvRefs, predJsons) = DeletionVectors.split(preds)
    val predTest: Option[BasePredicate] =
      if (predJsons.isEmpty) None else Some(compileDeleted(rowSchema, predJsons))
    if (dvRefs.isEmpty) {
      val p = predTest.getOrElse(return (_: InternalRow) => false)
      row => p.eval(row)
    } else {
      val posIdx = rowSchema.fieldNames.indexWhere(_.equalsIgnoreCase(posCol))
      if (posIdx < 0) throw new IllegalStateException(
        s"deletion-vector mask on a reader without the $posCol row-position " +
          s"column (schema ${rowSchema.fieldNames.mkString(",")})")
      val pd = new DeletionVectors.PositionDeleted(tableDir, dvRefs)
      row =>
        predTest.exists(_.eval(row)) ||
          (!row.isNullAt(posIdx) && pd.deleted(row.getLong(posIdx)))
    }
  }

  /** Compile a row-level DELETED test bound by NAME against `rowSchema`
    * (the physical row layout a reader produces). `eval(row)` is true
    * only when some predicate evaluates TRUE; NULL counts as kept.
    * Codegen with interpreted fallback — executor-side, built once per
    * (partition, mask set). PREDICATE masks only — DV-bearing lists go
    * through [[compiledRowFilter]]. */
  def compileDeleted(rowSchema: StructType, preds: Seq[String]): BasePredicate = {
    val expr = deletedExpr(rowSchema, preds)
    val bound = expr.transform {
      case a: AttributeReference =>
        val idx = rowSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
        if (idx < 0) throw new IllegalStateException(
          s"mask column ${a.name} absent from reader schema " +
            s"${rowSchema.fieldNames.mkString(",")}")
        BoundReference(idx, rowSchema(idx).dataType, rowSchema(idx).nullable)
    }
    CPredicate.create(bound)
  }

  /** Wrap a row reader, dropping rows the mask deletes. */
  def filteringReader(
      inner: org.apache.spark.sql.connector.read.PartitionReader[InternalRow],
      deleted: BasePredicate)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    filteringReaderFn(inner, r => deleted.eval(r))

  /** [[filteringReader]] over an arbitrary row test (the DV-composed
    * filter of [[compiledRowFilter]]). */
  def filteringReaderFn(
      inner: org.apache.spark.sql.connector.read.PartitionReader[InternalRow],
      deleted: InternalRow => Boolean)
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] =
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean = {
        while (inner.next()) {
          val r = inner.get()
          if (!deleted(r)) { cur = r; return true }
        }
        false
      }
      override def get(): InternalRow = cur
      override def close(): Unit = inner.close()
    }

  /** Whole-file reader for DV-bearing mask lists in paths whose OUTPUT
    * rows must stay `out`-width (streaming tail, CDC): `inner` reads
    * with `widenedSchema` (= `out` :+ [[POS_COL]]), the composed mask
    * test drops deleted rows, and survivors project back to `out`. */
  def projectingDvReader(
      inner: org.apache.spark.sql.connector.read.PartitionReader[InternalRow],
      tableDir: String, widenedSchema: StructType, out: StructType,
      preds: Seq[String])
      : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
    val deleted = compiledRowFilter(tableDir, widenedSchema, preds)
    val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(out)
    val filtered = filteringReaderFn(inner, deleted)
    new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
      override def next(): Boolean = filtered.next()
      override def get(): InternalRow = proj(filtered.get())
      override def close(): Unit = filtered.close()
    }
  }

  /** Row-level VISIBLE test that dispatches the mask list on the
    * row's ORIGINATING FILE — one scan serves files with arbitrarily
    * DIVERSE mask sets. Without it, a reader grouping files by
    * identical mask signature plans O(distinct mask sets) separate
    * scans: after a trickle MERGE leaves a different key mask on every
    * file of a 400-file table, the NEXT merge's target read became a
    * 400-way union of single-file scans (r15 soak: 76 s where one
    * scan takes 3 s). Children: file path (full URI), row position,
    * then the declared columns in order; per-file tests compile
    * lazily executor-side and cache for the expression's lifetime.
    * Eval-only (CodegenFallback) — it serves already-row-based masked
    * reads. */
  case class FileDispatchVisible(tableDir: String, dataPathPrefix: String,
      masks: Map[String, Seq[String]], schema: StructType,
      children: Seq[Expression])
      extends Expression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def dataType: org.apache.spark.sql.types.DataType = BooleanType
    override def nullable: Boolean = false
    override def foldable: Boolean = false

    @transient private lazy val widened =
      StructType(schema.fields :+ StructField(POS_COL, LongType))
    @transient private lazy val compiled =
      new java.util.concurrent.ConcurrentHashMap[String, InternalRow => Boolean]
    @transient private lazy val alwaysVisible: InternalRow => Boolean = _ => false

    // rows arrive clustered by file within a partition — memoize the
    // last (file-string → compiled test) pair so the URI parse and
    // map lookup run once per FILE per partition, not once per row
    // (ADVICE r15; per-instance mutable state is safe: each task
    // deserializes its own expression tree)
    @transient private var lastFile: String = _
    @transient private var lastTest: InternalRow => Boolean = _

    private def testFor(rel: String): InternalRow => Boolean = {
      val hit = compiled.get(rel)
      if (hit != null) return hit
      val t = masks.get(rel).filter(_.nonEmpty) match {
        case Some(preds) => compiledRowFilter(tableDir, widened, preds)
        case None => alwaysVisible
      }
      compiled.put(rel, t)
      t
    }

    override def eval(input: InternalRow): Any = {
      val file = children.head.eval(input)
      if (file == null) return true
      val fileStr = file.toString
      val deleted =
        if (fileStr == lastFile) lastTest
        else {
          val p = new java.net.URI(fileStr).getPath
          val rel =
            if (p.startsWith(dataPathPrefix + "/")) p.substring(dataPathPrefix.length + 1)
            else p
          val t = testFor(rel)
          lastFile = fileStr
          lastTest = t
          t
        }
      if (deleted eq alwaysVisible) return true
      val vals = new Array[Any](children.length - 1)
      var i = 2
      while (i < children.length) {
        vals(i - 2) = children(i).eval(input)
        i += 1
      }
      vals(children.length - 2) = children(1).eval(input) // pos last
      !deleted(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(vals))
    }

    override protected def withNewChildrenInternal(
        newChildren: IndexedSeq[Expression]): Expression =
      copy(children = newChildren)
    override def prettyName: String = "mask_file_dispatch_visible"
  }

  /** Maintenance-read helper: the VISIBLE rows of `names` under
    * `masks`, as one DataFrame — unmasked files in a single scan,
    * masked files grouped by identical mask set (each group one scan +
    * filter). Every physical rewrite path (compaction, Z-order,
    * copy-on-write DELETE, rebucket) reads through this so masked rows
    * can never be resurrected into a rewritten file. */
  def readVisible(spark: org.apache.spark.sql.SparkSession,
      declared: StructType, dataDir: org.apache.hadoop.fs.Path,
      names: Seq[String],
      masks: Map[String, Seq[String]]): org.apache.spark.sql.DataFrame = {
    val renamed = Renames.hasRenames(declared)
    val dataCols = declared.fieldNames.toSeq
      .map(org.apache.spark.sql.functions.col)
    // rename-aware path: [[Renames.read]] resolves each file's epoch
    // and aliases back to declared names; the DV leg then tests the
    // materialized `_gpos` (the aliasing projection drops `_metadata`)
    def read(ns: Seq[String]) =
      if (renamed) Renames.readPlain(spark, declared, dataDir, ns)
      else spark.read.schema(declared)
        .parquet(ns.map(n => new org.apache.hadoop.fs.Path(dataDir, n).toString): _*)
    val (masked, clean) = names.partition(n => masks.get(n).exists(_.nonEmpty))
    val cleanDf = if (clean.nonEmpty) Some(read(clean)) else None
    val tableDir = dataDir.getParent.toString
    // HYBRID masked read (VERDICT r15 `readVisible` watch item):
    //   - FEW distinct mask sets (≤ 4 — compaction bins, zorder, CoW
    //     DML after one DELETE): one scan per set with the CODEGEN'd
    //     visible filter — the per-row cost matters more than a couple
    //     of extra scans;
    //   - MANY sets (trickle-merged tables: every file its own key
    //     mask): ONE scan for all masked files through the per-file
    //     dispatch ([[FileDispatchVisible]] — interpreted, but one
    //     compiled test per FILE), the same fix as the change feed's —
    //     the former unconditional grouping planned one scan per SET,
    //     i.e. one scan per FILE.
    // Non-renamed dispatch reads materialize inputs from `_metadata`;
    // rename-aware reads expose them already.
    val bySet = masked.groupBy(n => masks(n).sorted)
    val maskedDfs: Seq[org.apache.spark.sql.DataFrame] =
      if (masked.isEmpty) Seq.empty
      else if (bySet.size <= 4) bySet.toSeq.map {
        case (preds, ns) =>
          if (renamed) {
            Renames.read(spark, declared, dataDir, ns)
              .filter(visibleAllColumnAt(tableDir, declared, preds, Seq("_gpos")))
              .select(dataCols: _*)
          } else {
            read(ns).filter(visibleAllColumn(tableDir, declared, preds))
              .select(dataCols: _*)
          }
      }
      else {
        val sub = masks.view.filterKeys(masked.toSet).toMap
        val dataPrefix = dataDir
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
          .makeQualified(dataDir).toUri.getPath
        val children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gfilefull")) +:
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gpos")) +:
            declared.fieldNames.toSeq.map(n =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n)))
        val dispatch = org.apache.spark.sql.GraftShims.column(
          FileDispatchVisible(tableDir, dataPrefix, sub, declared, children))
        val df =
          if (renamed) Renames.read(spark, declared, dataDir, masked)
          else read(masked)
            .withColumn("_gfilefull",
              org.apache.spark.sql.functions.col("_metadata.file_path"))
            .withColumn("_gpos",
              org.apache.spark.sql.functions.col("_metadata.row_index"))
        Seq(df.filter(dispatch).select(dataCols: _*))
      }
    (cleanDf.toSeq ++ maskedDfs).reduceOption(_ unionByName _).getOrElse {
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        declared)
    }
  }

  /** A VISIBLE-row Column over a mask list that may carry DV entries
    * ([[DeletionVectors]]): predicate part as [[visibleColumn]]; the
    * DV part tests `_metadata.row_index` (served by the file source on
    * any parquet read — no schema widening needed at the DataFrame
    * level) against the sidecar bitmaps. Callers projecting to the
    * declared columns afterwards lose nothing: the metadata struct is
    * resolved inside the filter only. */
  def visibleAllColumn(tableDir: String, schema: StructType,
      preds: Seq[String]): org.apache.spark.sql.Column =
    visibleAllColumnAt(tableDir, schema, preds, Seq("_metadata", "row_index"))

  /** [[visibleAllColumn]] with an explicit row-position column — for
    * frames where the position was already materialized as a regular
    * column (the rename-aware reads of [[Renames.read]] expose it as
    * `_gpos`, since `_metadata` does not survive their aliasing
    * projection). */
  def visibleAllColumnAt(tableDir: String, schema: StructType,
      preds: Seq[String], posParts: Seq[String]): org.apache.spark.sql.Column = {
    val (dvRefs, predJsons) = DeletionVectors.split(preds)
    val predVisible =
      if (predJsons.isEmpty) org.apache.spark.sql.functions.lit(true)
      else visibleColumn(schema, predJsons)
    if (dvRefs.isEmpty) predVisible
    else {
      val dvDeleted = org.apache.spark.sql.GraftShims.column(
        DeletionVectors.DvContainsExpr(tableDir, dvRefs,
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(posParts)))
      predVisible && !dvDeleted
    }
  }
}

/** MASK-PRESSURE policy (VERDICT r12 #2): stacked merge-on-read
  * DELETE/UPDATE/MERGE predicates are evaluated per row of their file,
  * and any mask in a scan batch flips the batch to row-based decode —
  * nothing bounds the degradation until a rewrite consumes the masks.
  * The `.files`/`.partitions` metadata exposes the signal; this is the
  * actuator:
  *
  *   - every merge-on-read DML publish calls [[afterMaskPublish]];
  *   - a live file whose mask stack reaches
  *     `spark.graft.mask.pressure.maxPreds` (default 64) is OVER
  *     PRESSURE: with `spark.graft.mask.pressure.autopurge=true` the
  *     DML synchronously runs [[Compaction.purgeMasks]] scoped to the
  *     pressured files (surgical — only those files rewrite); with
  *     `…autopurge=dv` (parquet tier) it runs
  *     [[Compaction.compactMasks]] instead — each pressured file's
  *     stack folds into ONE deletion-vector sidecar on a hardlink of
  *     the same bytes, O(deleted bits) written instead of a rewrite
  *     (decode stays row-based, but the per-row tax drops to one
  *     bitmap probe); with it off (default) a loud warning names the
  *     table and the verbs (`CALL graft.system.purge_masks` /
  *     `compact_masks`), leaving the latency trade to the operator;
  *   - the purge takes the maintenance lease, so an auto-purge racing
  *     a running compaction just queues behind it. */
object MaskPressure extends org.apache.spark.internal.Logging {

  val MAX_PREDS_KEY = "spark.graft.mask.pressure.maxPreds"
  val AUTOPURGE_KEY = "spark.graft.mask.pressure.autopurge"

  /** Advisory post-publish hook — MUST NOT throw (ADVICE r13, low):
    * the triggering DML has already committed, and several callers sit
    * inside `retryOnMaskConflict`, so a purge-side
    * `MaskConflictException` escaping here would re-run the committed
    * DML body (double-applied UPDATE/MERGE: re-masked candidates plus
    * duplicate appended images). Any failure of the synchronous
    * auto-purge leaves the masks in place — pressure persists and the
    * next publish retries — so swallowing with a warning is lossless. */
  def afterMaskPublish(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Unit =
    try afterMaskPublishUnsafe(spark, tableDir)
    catch {
      case scala.util.control.NonFatal(e) =>
        logWarning(s"mask-pressure hook failed on $tableDir (the DML " +
          "itself already committed; masks stay until the next purge): " +
          s"${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  private def afterMaskPublishUnsafe(spark: org.apache.spark.sql.SparkSession,
      tableDir: String): Unit = {
    val maxPreds = spark.conf.get(MAX_PREDS_KEY, "64").toInt
    if (maxPreds <= 0) return // policy disabled
    // tier-agnostic: masks attach only to ledger-referenced names, and
    // one latestPayload read carries both (parquet data files and log
    // segments alike)
    val over = VersionLedger.latestPayload(tableDir).toSeq.flatMap {
      case (_, p) =>
        val names = p.names.toSet
        p.masks.filter { case (f, preds) =>
          names(f) && preds.size >= maxPreds
        }
    }
    if (over.isEmpty) return
    val mode = spark.conf.get(AUTOPURGE_KEY, "false")
    if (mode == "dv" && SchemaManifest.exists(tableDir)) {
      // stack-compaction instead of a rewrite: fold each pressured
      // file's entries into ONE DV on a hardlink ([[Compaction
      // .compactMasks]]) — O(deleted bits) instead of O(file bytes);
      // the per-row tax drops to one bitmap probe (decode stays
      // row-based until a real purge)
      val st = Compaction.compactMasks(spark, tableDir, minPreds = maxPreds)
      logInfo(s"mask pressure DV-compaction on $tableDir: " +
        s"${st.compacted} stacks folded, ${st.unmasked} files unmasked, " +
        s"${st.remainingMasked} still masked")
      return
    }
    if (mode == "dv" || mode.toBoolean) { // "dv" on the log tier: purge
      if (SchemaManifest.exists(tableDir)) {
        val st = Compaction.purgeMasks(spark, tableDir, minPreds = maxPreds)
        logInfo(s"mask pressure auto-purge on $tableDir: " +
          s"${st.rewrittenFiles} files rewritten, ${st.remainingMasked} still masked")
      } else {
        val (_, rw, rem) = MaintenanceLease.withLease(tableDir) {
          LogDelete.purgeMasksInner(spark, tableDir, minPreds = maxPreds)
        }
        logInfo(s"mask pressure auto-purge on $tableDir (log tier): " +
          s"$rw segments rewritten, $rem still masked")
      }
    } else {
      logWarning(s"mask pressure on $tableDir: ${over.size} file(s) carry " +
        s">= $maxPreds stacked delete-mask predicates and decode row-based " +
        "until rewritten — run CALL <catalog>.system.purge_masks(table => …) " +
        s"or set $AUTOPURGE_KEY=true")
    }
  }
}
