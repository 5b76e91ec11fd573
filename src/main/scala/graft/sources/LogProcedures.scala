package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable MAINTENANCE — the operational verbs of the storage tier
  * exposed as catalog procedures (the Iceberg `CALL` pattern, on
  * Spark's native `ProcedureCatalog` API), so an operator runs the
  * whole lifecycle from SQL, no Scala entry points needed:
  *
  * {{{
  *   CALL graft.system.enable_versioning(table => 'ops.limits');
  *   CALL graft.system.compact_log(table => 'ops.limits', compaction_id => 'c1');
  *   CALL graft.system.vacuum(table => 'ops.limits', retain_last => 2);
  *   CALL graft.system.compact_table(table => 'lake.orders');  -- parquet tier
  * }}}
  *
  * Each returns its stats as a one-row result (a driver-local scan —
  * the numbers are manifest-scale metadata, never data rows). The
  * `table` argument is the catalog-relative `ns.table` identifier; the
  * procedure resolves it under the SAME warehouse the catalog serves,
  * so there is no path the SQL surface can reach that the catalog
  * couldn't. */
object LogProcedures {

  /** Driver-local result rows (procedure outputs are manifest-scale
    * metadata, never data rows). */
  private def localRows(schema: StructType,
      out: Seq[Seq[Any]]): java.util.Iterator[Scan] = {
    val scan: Scan = new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = out.map(values =>
        new GenericInternalRow(values.map {
          case s: String => UTF8String.fromString(s)
          case x => x
        }.toArray): InternalRow).toArray
      override def description(): String = "graft procedure result"
    }
    java.util.Collections.singletonList(scan).iterator()
  }

  /** One-row driver-local result. */
  private def oneRow(schema: StructType, values: Seq[Any]): java.util.Iterator[Scan] =
    localRows(schema, Seq(values))

  private def spark = org.apache.spark.sql.classic.SparkSession.active

  /** All procedures share the shape: bind is identity (Spark aligns
    * arguments to `parameters()`, applying declared defaults), one IN
    * parameter list, one result row. */
  private abstract class MaintenanceProcedure(
      procName: String, desc: String) extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def isDeterministic: Boolean = false // mutates storage state
    /** Every parameter of every maintenance procedure is required
      * non-NULL (optional semantics go through '' / 'none' sentinels
      * with documented defaults); an explicit NULL argument used to NPE
      * inside the body at `getUTF8String(i).toString` (ADVICE r19 —
      * ann_rebuild's payload, and latently every `where` param). Guard
      * once here with a named error instead. */
    final override def call(input: InternalRow): java.util.Iterator[Scan] = {
      val ps = parameters()
      var i = 0
      while (i < ps.length) {
        require(!input.isNullAt(i),
          s"$procName: parameter '${ps(i).name}' must not be NULL — " +
            "omit it to take the default, or pass the documented sentinel")
        i += 1
      }
      run(input)
    }
    def run(input: InternalRow): java.util.Iterator[Scan]
  }

  private def tableParam: ProcedureParameter =
    ProcedureParameter.in("table", StringType)
      .comment("catalog-relative identifier, e.g. 'ops.limits'").build()

  /** `ns.table` → directory under the warehouse (same mapping as
    * [[LogCatalog.loadTable]]). Each part must be a plain path segment:
    * `.`/`..` components, separators, and scheme-qualified parts are
    * rejected, so `CALL graft.system.vacuum(table => '../../other')`
    * cannot resolve — let alone delete — anything outside the warehouse
    * (ADVICE r9). */
  private def dirOf(warehouse: String, table: String): String = {
    val parts = table.split("\\.", -1)
    require(parts.length >= 1 && parts.forall(LogCatalog.validPathPart),
      s"bad table identifier '$table' (want ns.table; plain names only)")
    parts.foldLeft(new Path(warehouse))(new Path(_, _)).toString
  }

  /** A `_schema.json` manifest marks a parquet-managed table; its
    * absence an entity log — the same dispatch [[LogCatalog.loadTable]]
    * applies, so each verb routes to the right tier's machinery. */
  private def isParquetTable(dir: String): Boolean = {
    val p = new Path(dir, "_schema.json")
    p.getFileSystem(FsConf.get).exists(p)
  }

  def all(warehouse: String): Map[String, UnboundProcedure] =
    all(warehouse, catalogName = None)

  def all(warehouse: String, catalogName: Option[String]): Map[String, UnboundProcedure] = Map(
    "history" -> new MaintenanceProcedure("history",
      "version history of a versioned table: ordinal, publish time, file count") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam)
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val hist = VersionLedger.history(dir)
        require(hist.nonEmpty,
          s"$dir has no version ledger — CALL enable_versioning first")
        localRows(StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("published_ms", LongType, nullable = false),
          StructField("files", IntegerType, nullable = false))),
          hist.map { case (v, ts, n) => Seq[Any](v, ts, n) })
      }
    },
    "rollback_to_version" -> new MaintenanceProcedure("rollback_to_version",
      "restore a versioned table's CURRENT state to an older snapshot's membership") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("version", LongType)
          .comment("target snapshot ordinal (as shown by VERSION AS OF)").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val target = input.getLong(1)
        // Iceberg-style rollback: publish a NEW version whose membership
        // equals the target snapshot's — history is preserved (the
        // rolled-back states stay time-travelable until vacuumed), the
        // ledger stays monotonic, and concurrent committers converge
        // through the same CAS the row-level ops use. Fails cleanly if
        // the target ordinal is unknown or any of its files has been
        // vacuumed away (the restored state must actually be readable).
        val parquetTier = isParquetTable(dir)
        val names = (if (parquetTier) ParquetVersions.get(dir, target)
          else LogVersions.get(dir, target)).getOrElse(
            throw new IllegalArgumentException(
              s"version $target does not exist for $dir"))
        val base = if (parquetTier) new Path(dir, "data") else new Path(dir)
        val fs = base.getFileSystem(FsConf.get)
        val missing = names.filterNot(n => fs.exists(new Path(base, n)))
        require(missing.isEmpty,
          s"cannot roll back to version $target: ${missing.size} of its files " +
            s"were vacuumed (first: ${missing.headOption.getOrElse("")})")
        val v = if (parquetTier) ParquetVersions.commit(dir)(_ => names)
          else LogVersions.commit(dir)(_ => names)
        oneRow(StructType(Seq(
          StructField("restored_version", LongType, nullable = false),
          StructField("new_version", LongType, nullable = false),
          StructField("files", LongType, nullable = false))),
          Seq(target, v, names.length.toLong))
      }
    },
    "delete_where" -> new MaintenanceProcedure("delete_where",
      "SQL DELETE by predicate through the catalog (log and parquet tiers)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("predicate", StringType)
          .comment("SQL boolean expression over the table's columns").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "delete_where needs the owning catalog name (procedure loaded outside a catalog?)"))
        val table = input.getUTF8String(0).toString
        dirOf(warehouse, table) // identifier sanitation — rejects traversal
        val pred = input.getUTF8String(1).toString
        val ident = table.split("\\.", -1).map(p => s"`$p`").mkString(".")
        // routed through the standard DELETE plan: the log tier's
        // SupportsDelete fast path / copy-on-write fallback and the
        // parquet tier's footer-stats classify all apply unchanged.
        // rows_deleted via before/after COUNTs — metadata-served when
        // every segment carries stats (footer row counts on the parquet
        // tier), an ordinary scan otherwise.
        val counted = () => spark.sql(s"SELECT COUNT(*) FROM `$cat`.$ident").head.getLong(0)
        val before = counted()
        spark.sql(s"DELETE FROM `$cat`.$ident WHERE $pred")
        oneRow(StructType(Seq(
          StructField("rows_deleted", LongType, nullable = false))),
          Seq(before - counted()))
      }
    },
    "clean_staging" -> new MaintenanceProcedure("clean_staging",
      "reclaim CTAS staging dirs a dead driver orphaned in a namespace") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("namespace", StringType)
          .comment("namespace whose .ctas-* staging dirs to sweep").build(),
        ProcedureParameter.in("older_than_hours", IntegerType).defaultValue("24")
          .comment("only staging dirs idle at least this long — a LIVE " +
            "CTAS is still writing; don't sweep under it").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val nsDir = new Path(dirOf(warehouse, input.getUTF8String(0).toString))
        val hours = input.getInt(1)
        require(hours >= 0, "older_than_hours must be non-negative")
        val fs = nsDir.getFileSystem(FsConf.get)
        val cutoff = System.currentTimeMillis() - hours * 3600L * 1000L
        val removed =
          if (!fs.exists(nsDir)) 0L
          else fs.listStatus(nsDir).count { st =>
            // newest mtime under the dir, not the dir's own: a live
            // CTAS keeps writing files while the dir mtime can go stale
            def newest(p: Path): Long = {
              val kids = fs.listStatus(p)
              (fs.getFileStatus(p).getModificationTime +:
                kids.map(k => if (k.isDirectory) newest(k.getPath)
                  else k.getModificationTime).toSeq).max
            }
            st.isDirectory && st.getPath.getName.startsWith(".ctas-") &&
              // a dir that vanishes mid-inspection (its CTAS committed
              // the rename, or aborted the delete, between our listing
              // and the recursion) is simply not ours to sweep — skip
              // it and keep sweeping, don't abort the whole call
              (try newest(st.getPath) < cutoff && fs.delete(st.getPath, true)
               catch { case _: java.io.FileNotFoundException => false })
          }.toLong
        oneRow(StructType(Seq(
          StructField("staging_dirs_removed", LongType, nullable = false))),
          Seq(removed))
      }
    },
    "enable_versioning" -> new MaintenanceProcedure("enable_versioning",
      "opt a log or parquet table into snapshot versioning (v1 = current listing)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam)
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val v = if (isParquetTable(dir)) ParquetVersions.enable(dir)
          else LogVersions.enable(dir)
        oneRow(StructType(Seq(StructField("version", LongType, nullable = false))),
          Seq(v))
      }
    },
    "vacuum" -> new MaintenanceProcedure("vacuum",
      "physically delete files referenced by none of the retained versions") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("retain_last", IntegerType).defaultValue("2")
          .comment("how many newest versions stay readable").build(),
        ProcedureParameter.in("retain_hours", DoubleType).defaultValue("-1")
          .comment("ALSO keep every version published within this many " +
            "hours (wall-clock retention over the embedded publish " +
            "stamps); negative = count-based only").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val hours = input.getDouble(2)
        val olderThan =
          if (hours >= 0) Some((hours * 3600 * 1000).toLong) else None
        val deleted = if (isParquetTable(dir))
          ParquetVersions.vacuum(dir, input.getInt(1), olderThan)
          else LogVersions.vacuum(dir, input.getInt(1), olderThan)
        oneRow(StructType(Seq(
          StructField("deleted_files", LongType, nullable = false))),
          Seq(deleted.length.toLong))
      }
    },
    "compact_log" -> new MaintenanceProcedure("compact_log",
      "bin-pack log segments (bucket-aware); retry with the SAME compaction_id") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("compaction_id", StringType).build(),
        ProcedureParameter.in("target_bytes", LongType)
          .defaultValue((64L << 20).toString).build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val st = Compaction.compactLog(spark,
          dirOf(warehouse, input.getUTF8String(0).toString),
          input.getUTF8String(1).toString, input.getLong(2))
        oneRow(StructType(Seq(
          StructField("segments_before", LongType, nullable = false),
          StructField("bytes_before", LongType, nullable = false),
          StructField("segments_after", LongType, nullable = false))),
          Seq(st.segmentsBefore, st.bytesBefore, st.segmentsAfter))
      }
    },
    "set_bucket_spec" -> new MaintenanceProcedure("set_bucket_spec",
      "pin a table's bucket layout {col, n} for storage-partitioned joins") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("col", StringType)
          .comment("bucket key column").build(),
        ProcedureParameter.in("n", IntegerType)
          .comment("bucket count").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(!PartitionSpecs.exists(dir),
          s"$dir is partitioned — bucket layouts and partition layouts " +
            "are mutually exclusive")
        val spec = LogBucketing.Spec(input.getUTF8String(1).toString, input.getInt(2))
        if (isParquetTable(dir)) ParquetBucketing.writeSpec(spark, dir, spec)
        else LogBucketing.writeSpec(dir, spec)
        oneRow(StructType(Seq(
          StructField("col", StringType, nullable = false),
          StructField("n", IntegerType, nullable = false))),
          Seq(spec.col, spec.n))
      }
    },
    "rebucket_table" -> new MaintenanceProcedure("rebucket_table",
      "re-tag a bucketed parquet table's untagged files; restores shuffle-free joins") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam)
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(isParquetTable(dir),
          s"rebucket_table repairs catalog parquet tables; log writers re-tag in place")
        val (files, rows, out) = ParquetBucketing.rebucket(spark, dir)
        oneRow(StructType(Seq(
          StructField("files_retagged", LongType, nullable = false),
          StructField("rows_rewritten", LongType, nullable = false),
          StructField("files_written", LongType, nullable = false))),
          Seq(files, rows, out))
      }
    },
    "set_partition_spec" -> new MaintenanceProcedure("set_partition_spec",
      "evolve a catalog parquet table's partition layout (new writes route " +
        "by it; existing files keep reading; repartition_table migrates lazily)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("spec", StringType)
          .comment("comma-separated: col or days(col); 'none' clears").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(isParquetTable(dir),
          s"set_partition_spec lays out catalog parquet tables")
        val (old, next) = PartitionEvolution.setSpec(spark, dir,
          input.getUTF8String(1).toString)
        oneRow(StructType(Seq(
          StructField("old_spec", StringType, nullable = false),
          StructField("new_spec", StringType, nullable = false))),
          Seq(old, next))
      }
    },
    "repartition_table" -> new MaintenanceProcedure("repartition_table",
      "rewrite live files that do not conform to the current partition spec") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam)
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(isParquetTable(dir),
          s"repartition_table migrates catalog parquet tables")
        val (files, rows, out) = PartitionEvolution.repartitionTable(spark, dir)
        oneRow(StructType(Seq(
          StructField("files_rewritten", LongType, nullable = false),
          StructField("rows_rewritten", LongType, nullable = false),
          StructField("files_written", LongType, nullable = false))),
          Seq(files, rows, out))
      }
    },
    "zorder_table" -> new MaintenanceProcedure("zorder_table",
      "Z-order a catalog parquet table by the given columns (OPTIMIZE ZORDER BY)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("comma-separated numeric/date columns to interleave").build(),
        ProcedureParameter.in("files", IntegerType)
          .defaultValue("16").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(isParquetTable(dir),
          s"zorder_table lays out catalog parquet tables; the log tier clusters via compact_log")
        val cols = input.getUTF8String(1).toString.split(",").map(_.trim).filter(_.nonEmpty)
        val (before, rows, after) =
          ParquetZorder.zorderTable(spark, dir, cols.toSeq, input.getInt(2))
        oneRow(StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("rows_rewritten", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false))),
          Seq(before, rows, after))
      }
    },
    "purge_masks" -> new MaintenanceProcedure("purge_masks",
      "rewrite ONLY the files carrying >= min_preds stacked delete-mask " +
        "predicates, restoring columnar decode (mask-pressure relief)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("min_preds", IntegerType)
          .defaultValue("1").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val minPreds = input.getInt(1)
        // tier dispatch: catalog parquet tables carry _schema.json;
        // everything else is an entity log (same rule as loadTable)
        val (maskedF, rewrittenF, outF, remaining) =
          if (SchemaManifest.exists(dir)) {
            val st = Compaction.purgeMasks(spark, dir, minPreds)
            (st.maskedFiles, st.rewrittenFiles, st.outputFiles,
              st.remainingMasked)
          } else {
            val (m, rw, rem) = MaintenanceLease.withLease(dir) {
              LogDelete.purgeMasksInner(spark, dir, minPreds)
            }
            (m, rw, rw, rem)
          }
        oneRow(StructType(Seq(
          StructField("masked_files", LongType, nullable = false),
          StructField("rewritten_files", LongType, nullable = false),
          StructField("output_files", LongType, nullable = false),
          StructField("remaining_masked", LongType, nullable = false))),
          Seq(maskedF, rewrittenF, outF, remaining))
      }
    },
    "compact_masks" -> new MaintenanceProcedure("compact_masks",
      "fold each pressured file's stacked mask entries into ONE " +
        "deletion-vector sidecar on a hardlink of the same bytes — " +
        "pressure relief at zero data-rewrite cost (parquet tier only)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("min_preds", IntegerType)
          .defaultValue("2").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        require(SchemaManifest.exists(dir),
          "compact_masks consolidates parquet-tier masks; the log tier " +
            "purges via purge_masks")
        val st = Compaction.compactMasks(spark, dir, input.getInt(1))
        oneRow(StructType(Seq(
          StructField("masked_files", LongType, nullable = false),
          StructField("compacted", LongType, nullable = false),
          StructField("unmasked", LongType, nullable = false),
          StructField("remaining_masked", LongType, nullable = false),
          StructField("sidecar_bytes", LongType, nullable = false))),
          Seq(st.maskedFiles, st.compacted, st.unmasked,
            st.remainingMasked, st.sidecarBytes))
      }
    },
    "build_bloom" -> new MaintenanceProcedure("build_bloom",
      "build (incrementally) the per-file Bloom skip index over the " +
        "named probe columns — point lookups on high-cardinality, " +
        "non-clustered keys then skip files at planning time " +
        "(parquet tier; the log tier builds blooms at commit)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("columns", StringType)
          .comment("comma-separated probe columns (string/integral)").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getUTF8String(0).toString)
        val (indexed, total, bytes) = ParquetBloom.build(spark, dir,
          input.getUTF8String(1).toString.split(",").toSeq)
        oneRow(StructType(Seq(
          StructField("files_indexed", LongType, nullable = false),
          StructField("files_covered", LongType, nullable = false),
          StructField("sidecar_bytes", LongType, nullable = false))),
          Seq(indexed, total, bytes))
      }
    },
    "ann_build" -> new MaintenanceProcedure("ann_build",
      "fit the IVF coarse quantizer on the corpus table's bounded " +
        "deterministic sample and persist centroids + cell-partitioned " +
        "inverted lists + version meta (graft.operators.IvfIndex.build); " +
        "replaces any prior index under the prefix") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("index", StringType)
          .comment("catalog-relative index prefix, e.g. 'ann.emb'").build(),
        ProcedureParameter.in("corpus", StringType)
          .comment("catalog-relative corpus table with (vec_id, embedding)").build(),
        ProcedureParameter.in("k", IntegerType).defaultValue("16")
          .comment("cell count; <= 0 auto-sizes from the corpus like " +
            "ann_rebuild's default (ceil(sqrt(n)) clamped to [16, 1024])").build(),
        ProcedureParameter.in("iters", IntegerType).defaultValue("8").build(),
        ProcedureParameter.in("quantized", BooleanType)
          .defaultValue("false")
          .comment("SQ8 lists: int8 codes instead of raw vectors — " +
            "~4x smaller index; search refines against the corpus").build(),
        ProcedureParameter.in("payload", StringType)
          .defaultValue("''")
          .comment("comma-separated corpus columns carried into the " +
            "inverted lists so ann_search's where-predicates prune " +
            "inside the probed-cell scan").build(),
        ProcedureParameter.in("pq_m", IntegerType).defaultValue("0")
          .comment("> 0 builds the IVF-PQ layout instead: m product-" +
            "quantizer subspaces with 256-entry codebooks — lists store " +
            "m bytes + a norm per vector (~dim/m x smaller than SQ8); " +
            "search refines against the corpus; mutually exclusive " +
            "with quantized").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "ann_build needs the owning catalog name (procedure loaded outside a catalog?)"))
        val index = input.getUTF8String(0).toString
        val corpus = input.getUTF8String(1).toString
        require(index.split("\\.", -1).forall(LogCatalog.validPathPart),
          s"bad identifier '$index' (want ns.name; plain names only)")
        val corpusDir = dirOf(warehouse, corpus) // validates too
        // on a versioned corpus the build records which ledger version
        // the assignments cover, so a later ann_refresh folds exactly
        // the span since this build
        val v = if (ParquetVersions.enabled(corpusDir)) {
          ParquetVersions.catchUp(corpusDir)
          ParquetVersions.latest(corpusDir).get._1
        } else 0L
        val fq = s"$cat.$index"
        val payload = input.getUTF8String(5).toString
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        val pqM = input.getInt(6)
        if (pqM > 0) {
          require(!input.getBoolean(4),
            "quantized and pq_m are mutually exclusive layouts — pick one")
          graft.operators.IvfIndex.buildPq(spark,
            spark.table(s"$cat.$corpus"), s"$cat.$corpus", fq,
            k = input.getInt(2), m = pqM, iters = input.getInt(3),
            indexedVersion = v, payload = payload)
        } else if (input.getBoolean(4)) {
          graft.operators.IvfIndex.buildQuantized(spark,
            spark.table(s"$cat.$corpus"), s"$cat.$corpus", fq,
            k = input.getInt(2), iters = input.getInt(3), indexedVersion = v,
            payload = payload)
        } else {
          graft.operators.IvfIndex.build(spark, spark.table(s"$cat.$corpus"),
            fq, k = input.getInt(2), iters = input.getInt(3), indexedVersion = v,
            payload = payload)
        }
        oneRow(StructType(Seq(
          StructField("cells", LongType, nullable = false),
          StructField("vectors", LongType, nullable = false),
          StructField("indexed_version", LongType, nullable = false),
          StructField("base_drift", DoubleType, nullable = false))),
          // Seq[Any], NOT Seq(...): Long and Double elements would
          // otherwise unify to Seq[Double] by weak conformance,
          // silently converting every LONG field's value
          Seq[Any](
            spark.table(graft.operators.IvfIndex.centroidsTableName(spark, fq)).count(),
            spark.table(graft.operators.IvfIndex.assignTableName(spark, fq)).count(), v,
            graft.operators.IvfIndex.driftBaseline(spark, fq).getOrElse(0.0)))
      }
    },
    "ann_refresh" -> new MaintenanceProcedure("ann_refresh",
      "fold the corpus change feed since the indexed version into the " +
        "inverted lists in O(delta) (existing list files byte-identical, " +
        "centroids not re-fit), then run index hygiene: fold mask stacks " +
        "past fold_preds into DV sidecars, bin-pack the small-file tail " +
        "past file_cap, vacuum to retain_last versions") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("index", StringType).build(),
        ProcedureParameter.in("corpus", StringType).build(),
        ProcedureParameter.in("fold_preds", IntegerType).defaultValue("8").build(),
        ProcedureParameter.in("retain_last", IntegerType).defaultValue("4").build(),
        ProcedureParameter.in("file_cap", IntegerType).defaultValue("64").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "ann_refresh needs the owning catalog name (procedure loaded outside a catalog?)"))
        val index = input.getUTF8String(0).toString
        require(index.split("\\.", -1).forall(LogCatalog.validPathPart),
          s"bad identifier '$index' (want ns.name; plain names only)")
        val corpusDir = dirOf(warehouse, input.getUTF8String(1).toString)
        val fq = s"$cat.$index"
        val v = graft.operators.IvfIndex.refresh(spark, corpusDir, fq)
        val (folded, packed, vacuumed) = graft.operators.IvfIndex.hygiene(
          spark, fq, input.getInt(2), input.getInt(3), input.getInt(4))
        oneRow(StructType(Seq(
          StructField("indexed_version", LongType, nullable = false),
          StructField("masks_folded", LongType, nullable = false),
          StructField("files_packed", LongType, nullable = false),
          StructField("files_vacuumed", LongType, nullable = false))),
          Seq(v, folded, packed, vacuumed))
      }
    },
    "ann_rebuild" -> new MaintenanceProcedure("ann_rebuild",
      "re-fit the IVF quantizer ONLINE with no serving gap (the answer " +
        "to ann_stats' needs_rebuild): the new generation is built under " +
        "staged names while searches keep serving the current one, then " +
        "swapped in by one atomic replace of the index meta root — " +
        "resetting the drift baseline. Keeps the index's layout " +
        "(raw/quantized) and corpus pointer; serializes with ann_refresh " +
        "via the maintenance lease") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("index", StringType).build(),
        ProcedureParameter.in("corpus", StringType).build(),
        ProcedureParameter.in("k", IntegerType).defaultValue("-1")
          .comment("cell count for the new generation; any value <= 0 " +
            "(the default) auto-sizes from the corpus — ceil(sqrt(n)) " +
            "clamped to [16, 1024] — so a rebuilt index keeps probed " +
            "lists O(sqrt n) as the corpus grows").build(),
        ProcedureParameter.in("iters", IntegerType).defaultValue("8").build(),
        ProcedureParameter.in("payload", StringType)
          .defaultValue("''")
          .comment("comma-separated corpus columns to carry into the " +
            "new generation's inverted lists — REPLACES the payload " +
            "set, so a live index gains a filter attribute through a " +
            "gap-free rebuild; empty (the default) carries the current " +
            "set forward unchanged; the sentinel 'none' CLEARS the " +
            "payload set back to empty").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "ann_rebuild needs the owning catalog name (procedure loaded outside a catalog?)"))
        val index = input.getUTF8String(0).toString
        val corpus = input.getUTF8String(1).toString
        Seq(index, corpus).foreach { id =>
          require(id.split("\\.", -1).forall(LogCatalog.validPathPart),
            s"bad identifier '$id' (want ns.name; plain names only)")
        }
        val corpusDir = dirOf(warehouse, corpus)
        val fq = s"$cat.$index"
        // ADVICE r19: '' (the carry-forward sentinel) could never CLEAR
        // a payload set — 'none' clears back to empty. NULL is rejected
        // by the base-class guard.
        val payloadArg = input.getUTF8String(4).toString.trim
        val payload: Option[Seq[String]] =
          if (payloadArg.isEmpty) None
          else if (payloadArg.equalsIgnoreCase("none")) Some(Nil)
          else Some(payloadArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        val v = graft.operators.IvfIndex.rebuild(spark,
          spark.table(s"$cat.$corpus"), corpusDir, fq,
          k = input.getInt(2), iters = input.getInt(3), payload = payload)
        oneRow(StructType(Seq(
          StructField("cells", LongType, nullable = false),
          StructField("vectors", LongType, nullable = false),
          StructField("indexed_version", LongType, nullable = false),
          StructField("base_drift", DoubleType, nullable = false),
          StructField("gen", LongType, nullable = false))),
          Seq[Any](
            spark.table(graft.operators.IvfIndex.centroidsTableName(spark, fq)).count(),
            spark.table(graft.operators.IvfIndex.assignTableName(spark, fq)).count(), v,
            graft.operators.IvfIndex.driftBaseline(spark, fq).getOrElse(0.0),
            graft.operators.IvfIndex.generation(spark, fq).getOrElse(0L)))
      }
    },
    "ann_stats" -> new MaintenanceProcedure("ann_stats",
      "health of a persisted IVF index: cardinalities, mask pressure, " +
        "indexed version, and the DRIFT gauge (current quantizer-fit vs " +
        "the build-time baseline; needs_rebuild once the ratio crosses " +
        "factor) — the SQL face of the rebuild policy") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("index", StringType).build(),
        ProcedureParameter.in("factor", DoubleType).defaultValue("1.5").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "ann_stats needs the owning catalog name (procedure loaded outside a catalog?)"))
        val index = input.getUTF8String(0).toString
        require(index.split("\\.", -1).forall(LogCatalog.validPathPart),
          s"bad identifier '$index' (want ns.name; plain names only)")
        val fq = s"$cat.$index"
        val factor = input.getDouble(1)
        val d = graft.operators.IvfIndex.drift(spark, fq)
        // the physical tables live at the CURRENT generation's names
        // once the index has been rebuilt online (gen in _meta)
        val assignDir = graft.operators.IvfIndex.assignDir(spark, fq)
        val masked = ParquetVersions.masksFor(assignDir, None)
          .count(_._2.nonEmpty).toLong
        val liveFiles =
          if (ParquetVersions.enabled(assignDir))
            ParquetVersions.live(assignDir).size.toLong
          else -1L
        oneRow(StructType(Seq(
          StructField("cells", LongType, nullable = false),
          StructField("vectors", LongType, nullable = false),
          StructField("live_files", LongType, nullable = false),
          StructField("masked_files", LongType, nullable = false),
          StructField("indexed_version", LongType, nullable = false),
          StructField("base_drift", DoubleType, nullable = true),
          StructField("drift", DoubleType, nullable = false),
          StructField("drift_ratio", DoubleType, nullable = true),
          StructField("needs_rebuild", BooleanType, nullable = false),
          StructField("gen", LongType, nullable = false))),
          Seq[Any](
            spark.table(graft.operators.IvfIndex.centroidsTableName(spark, fq)).count(),
            spark.table(graft.operators.IvfIndex.assignTableName(spark, fq)).count(),
            liveFiles, masked,
            graft.operators.IvfIndex.indexedVersion(spark, fq),
            d.baseline.map(Double.box).orNull, d.current,
            d.ratio.map(Double.box).orNull,
            d.ratio.exists(_ > factor),
            // 0 = the pre-rebuild legacy generation; advances with each
            // online ann_rebuild — pairs with needs_rebuild so the
            // operator can see the policy AND its last answer
            graft.operators.IvfIndex.generation(spark, fq).getOrElse(0L)))
      }
    },
    "ann_search" -> new MaintenanceProcedure("ann_search",
      "top-k cosine search THROUGH a persisted IVF index " +
        "(graft.operators.IvfIndex tables): probe n_probe cells per " +
        "query, scan only those inverted-list partitions, exact-cosine " +
        "re-rank — the SQL-callable serving verb (queries is a " +
        "bounded-batch table with (qid BIGINT, qe ARRAY<FLOAT>))") {
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("index", StringType)
          .comment("catalog-relative index prefix, e.g. 'ann.emb' " +
            "(the <prefix>_centroids/_assign/_meta tables)").build(),
        ProcedureParameter.in("queries", StringType)
          .comment("catalog-relative query table with (qid, qe)").build(),
        ProcedureParameter.in("n_probe", IntegerType).defaultValue("2").build(),
        ProcedureParameter.in("top_k", IntegerType).defaultValue("10").build(),
        ProcedureParameter.in("where", StringType)
          .defaultValue("''")
          .comment("optional boolean SQL expression over the index's " +
            "payload columns (and vec_id) — applied INSIDE the " +
            "probed-cell scan before the top-k cut (pre-filter), with " +
            "automatic over-probing").build(),
        ProcedureParameter.in("over_probe", IntegerType)
          .defaultValue("4")
          .comment("filtered searches probe n_probe × this many cells " +
            "(capped at k) so selective slices don't under-return").build(),
        ProcedureParameter.in("refine_factor", IntegerType)
          .defaultValue("4")
          .comment("quantized indexes keep top_k × this many coarse " +
            "candidates per query for the exact refine").build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val cat = catalogName.getOrElse(throw new IllegalStateException(
          "ann_search needs the owning catalog name (procedure loaded outside a catalog?)"))
        val index = input.getUTF8String(0).toString
        val queries = input.getUTF8String(1).toString
        // identifier sanitation, same rule as dirOf — these splice
        // into table identifiers
        Seq(index, queries).foreach { id =>
          require(id.split("\\.", -1).forall(LogCatalog.validPathPart),
            s"bad identifier '$id' (want ns.name; plain names only)")
        }
        // the predicate is PARSED as one expression (never spliced into
        // statement text) and becomes a plan filter on the list scan
        val where = Option(input.getUTF8String(4).toString)
          .map(_.trim).filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
        // quantized indexes (built with quantized => true) dispatch to
        // the coarse+refine path automatically — one meta snapshot
        // resolves generation and layout, same result shape either way
        val fqIx = s"$cat.$index"
        val result = graft.operators.IvfIndex.searchAuto(spark,
          spark.table(s"$cat.$queries"), fqIx,
          nProbe = input.getInt(2), topK = input.getInt(3),
          refineFactor = input.getInt(6), where = where,
          overProbe = input.getInt(5))
        // procedure results are driver-local rows; this one is bounded
        // by queries × top_k (the search contract already requires a
        // bounded query batch)
        localRows(StructType(Seq(
          StructField("qid", LongType, nullable = false),
          StructField("rn", IntegerType, nullable = false),
          StructField("nid", LongType, nullable = false),
          StructField("cos", DoubleType, nullable = false))),
          result.orderBy("qid", "rn").collect().toSeq.map(r =>
            Seq[Any](r.getAs[Number]("qid").longValue,
              r.getAs[Number]("rn").intValue,
              r.getAs[Number]("nid").longValue,
              r.getAs[Number]("cos").doubleValue)))
      }
    },
    "compact_table" -> new MaintenanceProcedure("compact_table",
      "bin-pack a catalog parquet table's data files (crash-safe generation swap)") {
      override def parameters(): Array[ProcedureParameter] = Array(tableParam,
        ProcedureParameter.in("target_bytes", LongType)
          .defaultValue((128L << 20).toString).build())
      override def run(input: InternalRow): java.util.Iterator[Scan] = {
        val st = Compaction.compactTable(spark,
          dirOf(warehouse, input.getUTF8String(0).toString), input.getLong(1))
        oneRow(StructType(Seq(
          StructField("files_before", LongType, nullable = false),
          StructField("bytes_before", LongType, nullable = false),
          StructField("rows_before", LongType, nullable = false),
          StructField("files_after", LongType, nullable = false))),
          Seq(st.filesBefore, st.bytesBefore, st.rowsBefore, st.filesAfter))
      }
    })
}
