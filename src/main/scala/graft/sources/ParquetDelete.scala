package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, AttributeReference, Expression, Literal, Or => COr}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.functions.{coalesce, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{BooleanType, StructType}

/** Row-level DELETE for the catalog's PARQUET-managed tables — the p10
  * three-valued classify/drop/rewrite design ([[LogDelete]]) ported
  * onto parquet footer statistics ([[ParquetFooterStats]] domains), so
  * `DELETE FROM graft.<ns>.<pq-table> WHERE p` works through the same
  * `SupportsDelete` surface as the entity logs.
  *
  * Scale design — metadata first, I/O only where provably needed.
  * Every data file is classified against its footer min/max/nullCount:
  *
  *   - **Clean**: footer bounds PROVE no row satisfies the predicate
  *     (`FooterPrune.excludes` — the exact machinery the skip-scan
  *     uses) → the file is HARDLINKED into the new generation, zero
  *     read or write I/O. At 100 TB this is the cold tail: a delete
  *     keyed on recent data touches none of it.
  *   - **Drop**: bounds prove EVERY row satisfies the predicate — the
  *     negated predicate is excluded AND the referenced columns carry
  *     no nulls (three-valued logic: a NULL comparison outcome is not
  *     deleted, so a file can only be dropped whole when no row can
  *     evaluate to NULL) → the file simply does not enter the new
  *     generation: a metadata-only delete, never read.
  *   - **Rewrite** (the rest): ONE distributed Spark job reads all
  *     affected files under the table's authoritative `_schema.json`
  *     schema (pre-ALTER files read consistently) and writes the
  *     survivors — rows where the predicate is FALSE or NULL.
  *
  * Crash safety is the SAME staged generation swap as
  * [[Compaction.compactTable]]: build `data.next` completely, mark
  * `_COMPACT_SUCCESS`, swap; a crash at any point is repaired by
  * [[Compaction.repairGenerations]] on the next catalog load. A reader
  * planned before the swap keeps its listed generation (files live on
  * until the old dir drops); single-writer maintenance semantics.
  *
  * Reference: the warehouse-side `ALTER TABLE ... DELETE` mutation the
  * reference delegates to ClickHouse (`hashes_test.go:236-240` clears
  * by predicate between cases); SURVEY §2.1 #10 extended to the
  * parquet tier (VERDICT r8 next-round #2). */
object ParquetDelete {

  /** Filter shapes this module can BOTH evaluate exactly (via Spark's
    * own expression engine on the rewrite path) and negate for the
    * drop-whole-file proof. `supported` is what `canDeleteWhere`
    * promises — anything else makes Spark report DELETE unsupported
    * rather than us guessing. */
  def supported(schema: StructType)(f: Filter): Boolean =
    nnf(f, negate = false).flatMap(translate(schema, _)).isDefined

  /** NNF + Catalyst translation of a v1 Filter over `schema` — the
    * evaluation form shared with [[DeleteMasks]] (mask predicates are
    * stored as Filter JSON and re-translated at read). */
  private[sources] def toCatalyst(schema: StructType, f: Filter): Option[Expression] =
    nnf(f, negate = false).flatMap(translate(schema, _))

  /** Negation normal form at the v1 Filter level: push NOT through
    * And/Or (De Morgan holds in three-valued logic) and flip the
    * leaves TRUE-preservingly: ¬(a<v) ⇨ a>=v (both NULL when a is
    * NULL), ¬(a=v) ⇨ a<v ∨ a>v, ¬(a IN set) ⇨ conjunction of ¬(a=v)
    * over non-null members — with a NULL member the negation is never
    * TRUE (x IN (…,NULL) is TRUE or NULL), i.e. AlwaysFalse for the
    * excludes proof. None = shape not representable (¬StartsWith). */
  private def nnf(f: Filter, negate: Boolean): Option[Filter] = f match {
    case And(l, r) =>
      for (a <- nnf(l, negate); b <- nnf(r, negate))
        yield if (negate) Or(a, b) else And(a, b)
    case Or(l, r) =>
      for (a <- nnf(l, negate); b <- nnf(r, negate))
        yield if (negate) And(a, b) else Or(a, b)
    case Not(c) => nnf(c, !negate)
    case AlwaysTrue() => Some(if (negate) AlwaysFalse() else AlwaysTrue())
    case AlwaysFalse() => Some(if (negate) AlwaysTrue() else AlwaysFalse())
    case IsNull(a) => Some(if (negate) IsNotNull(a) else IsNull(a))
    case IsNotNull(a) => Some(if (negate) IsNull(a) else IsNotNull(a))
    case EqualTo(a, v) =>
      if (v == null) Some(AlwaysFalse()) // = NULL is never TRUE; nor is its negation
      else Some(if (negate) Or(LessThan(a, v), GreaterThan(a, v)) else EqualTo(a, v))
    case EqualNullSafe(a, v) =>
      if (v == null) Some(if (negate) IsNotNull(a) else IsNull(a))
      else Some(if (negate) Or(IsNull(a), Or(LessThan(a, v), GreaterThan(a, v)))
        else EqualTo(a, v)) // non-null <=> equals = on non-null rows; NULL rows are FALSE, handled by IsNull arm when negated
    case GreaterThan(a, v) =>
      if (v == null) Some(AlwaysFalse())
      else Some(if (negate) LessThanOrEqual(a, v) else GreaterThan(a, v))
    case GreaterThanOrEqual(a, v) =>
      if (v == null) Some(AlwaysFalse())
      else Some(if (negate) LessThan(a, v) else GreaterThanOrEqual(a, v))
    case LessThan(a, v) =>
      if (v == null) Some(AlwaysFalse())
      else Some(if (negate) GreaterThanOrEqual(a, v) else LessThan(a, v))
    case LessThanOrEqual(a, v) =>
      if (v == null) Some(AlwaysFalse())
      else Some(if (negate) GreaterThan(a, v) else LessThanOrEqual(a, v))
    case In(a, vs) =>
      if (!negate) Some(In(a, vs))
      else if (vs.contains(null)) Some(AlwaysFalse())
      else if (vs.isEmpty) Some(AlwaysTrue()) // x IN () is FALSE… but NULL x gives NULL; see below
      else vs.toSeq.map(v => nnf(EqualTo(a, v), negate = true))
        .reduce((x, y) => for (p <- x; q <- y) yield And(p, q))
    case StringStartsWith(a, p) =>
      if (negate || p == null) None else Some(StringStartsWith(a, p))
    case _ => None
  }

  /** NNF Filter → Catalyst over the declared schema (case-insensitive
    * attribute resolution; external→internal literal conversion).
    * None = unknown column or a literal the column type can't carry. */
  private def translate(schema: StructType, f: Filter): Option[Expression] = {
    def attr(name: String): Option[AttributeReference] =
      schema.find(_.name.equalsIgnoreCase(name))
        .map(sf => AttributeReference(sf.name, sf.dataType, sf.nullable)())
    def litOf(a: AttributeReference, v: Any): Option[Literal] =
      try Some(Literal.create(v, a.dataType))
      catch { case scala.util.control.NonFatal(_) => None }
    def cmp(a: String, v: Any, mk: (Expression, Expression) => Expression): Option[Expression] =
      for (ar <- attr(a); l <- litOf(ar, v)) yield mk(ar, l)
    f match {
      case And(l, r) =>
        for (a <- translate(schema, l); b <- translate(schema, r)) yield CAnd(a, b)
      case Or(l, r) =>
        for (a <- translate(schema, l); b <- translate(schema, r)) yield COr(a, b)
      case AlwaysTrue() => Some(Literal(true, BooleanType))
      case AlwaysFalse() => Some(Literal(false, BooleanType))
      case IsNull(a) => attr(a).map(ce.IsNull)
      case IsNotNull(a) => attr(a).map(ce.IsNotNull)
      case EqualTo(a, v) => cmp(a, v, ce.EqualTo)
      case GreaterThan(a, v) => cmp(a, v, ce.GreaterThan)
      case GreaterThanOrEqual(a, v) => cmp(a, v, ce.GreaterThanOrEqual)
      case LessThan(a, v) => cmp(a, v, ce.LessThan)
      case LessThanOrEqual(a, v) => cmp(a, v, ce.LessThanOrEqual)
      case In(a, vs) =>
        attr(a).flatMap { ar =>
          val lits = vs.toSeq.map(v => litOf(ar, v))
          if (lits.exists(_.isEmpty)) None
          // InSet past Spark's own conversion threshold: a key-mask IN
          // can carry thousands of keys (merge-on-read MERGE), and a
          // literal `In` evaluates them LINEARLY per row (the codegen
          // blows past the JIT method limit and falls back interpreted)
          // — measured seconds per masked scan; InSet is one hash probe
          else if (lits.length > 10)
            Some(ce.InSet(ar, lits.flatten.map(_.value).toSet))
          else Some(ce.In(ar, lits.flatten))
        }
      case StringStartsWith(a, p) => cmp(a, p, ce.StartsWith)
      case _ => None
    }
  }

  /** Column names referenced by VALUE comparisons (the ones that can
    * evaluate to NULL); null tests are excluded — they never do. */
  private def valueRefs(f: Filter): Set[String] = f match {
    case And(l, r) => valueRefs(l) ++ valueRefs(r)
    case Or(l, r) => valueRefs(l) ++ valueRefs(r)
    case Not(c) => valueRefs(c)
    case EqualTo(a, _) => Set(a)
    case EqualNullSafe(a, _) => Set.empty // 2-valued by definition
    case GreaterThan(a, _) => Set(a)
    case GreaterThanOrEqual(a, _) => Set(a)
    case LessThan(a, _) => Set(a)
    case LessThanOrEqual(a, _) => Set(a)
    case In(a, _) => Set(a)
    case StringStartsWith(a, _) => Set(a)
    case _ => Set.empty
  }

  case class ParquetDeleteStats(untouched: Long, dropped: Long, rewritten: Long,
      masked: Long = 0L)

  /** Execute the delete. Quiesced-table maintenance semantics (same as
    * [[Compaction.compactTable]]); crash-repair via the generation
    * machinery on next load. */
  def deleteWhere(spark: SparkSession, tableDir: String,
      filters: Array[Filter]): ParquetDeleteStats =
    deleteCore(spark, tableDir, filters, protect = Set.empty,
      alsoPublish = Seq.empty, preCaughtUp = false)

  /** The delete with the knobs REPLACE WHERE needs
    * ([[ParquetReplaceWrite]]): `protect` — file names classified
    * untouched unconditionally (the overwrite's freshly-committed
    * payload, which typically matches the very condition it replaces);
    * `alsoPublish` — names folded into the SAME version publish as the
    * retirement, so the whole replace is one visibility event;
    * `preCaughtUp` — the caller already folded un-ledgered appends into
    * the ledger, so the publish goes straight to [[VersionLedger]]
    * (no internal catch-up, which would re-reference the payload as its
    * own transient commit) and the INPUT set is the latest version's
    * names ∪ `protect` — an append racing the replace stays untouched
    * and absorbed-live, serialized after this operation. */
  private[sources] def deleteCore(spark: SparkSession, tableDir: String,
      filters: Array[Filter], protect: Set[String],
      alsoPublish: Seq[String], preCaughtUp: Boolean): ParquetDeleteStats =
    // mask-conflict retry (ADVICE r11): each attempt re-classifies and
    // re-reads masks; the guarded publish aborts if a concurrent
    // merge-on-read DELETE/UPDATE masked one of the rewrite inputs
    ParquetVersions.retryOnMaskConflict() {
    val base = new Path(tableDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table (no _schema.json); " +
        "entity logs delete via LogDelete")
    Compaction.repairGenerations(fs, base)
    val declared = SchemaManifest.read(tableDir, "DELETE")

    def unsupported(f: Filter): Nothing = throw new UnsupportedOperationException(
      s"ParquetDelete: unsupported filter $f (canDeleteWhere should have declined)")
    val whole: Filter = filters.reduceOption(And).getOrElse(AlwaysTrue())
    val cond = nnf(whole, negate = false).flatMap(translate(declared, _))
      .getOrElse(unsupported(whole))
    // the negation powers the OPTIONAL drop-whole-file proof; a shape
    // with no exact negation bound (¬StartsWith) just never drops whole
    val negCond: Option[Expression] =
      nnf(whole, negate = true).flatMap(translate(declared, _))
    val refs = valueRefs(whole).map(_.toLowerCase)

    val conf = spark.sparkContext.hadoopConfiguration
    val data = new Path(base, "data")
    // On a VERSIONED table ([[ParquetVersions]]) only the LIVE files
    // are inputs — the listing can hold vacuum-pending files of older
    // versions, and re-processing those would resurrect deleted rows.
    val versioned = ParquetVersions.enabled(tableDir)
    val liveNames: Option[Set[String]] =
      if (!versioned) None
      else if (preCaughtUp) Some(VersionLedger.latest(tableDir)
        .map(_._2).getOrElse(Seq.empty).toSet ++ protect)
      else Some(ParquetVersions.live(tableDir).toSet)
    // committed-file walk ([[ParquetVersions.walkData]]): partitioned
    // tables nest files under partition dirs; names data/-relative
    val files: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      ParquetVersions.walkData(fs, data)
        .filter { case (rel, _) => liveNames.forall(_(rel)) }
    val partLayout = PartitionSpecs.read(tableDir)

    // three-valued classification — partition-dir bounds first (zero
    // I/O), then footer bounds; an unreadable or stats-free footer
    // conservatively lands in the rewrite class
    val (untouched, dropped, rewrites) = {
      val u = Seq.newBuilder[(String, Path)]; val d = Seq.newBuilder[(String, Path)]
      val w = Seq.newBuilder[(String, Path)]
      files.foreach { case (rel, st) =>
        val cls = try {
          val syn = partLayout.flatMap(ps =>
            PartitionSpecs.statsOfRelPath(ps, declared, rel))
          if (protect(rel)) 'u'
          // partition-dir bounds first — zero I/O: a whole-partition
          // probe classifies every file as untouched OR dropped-whole
          // (the refs-no-nulls requirement holds when every referenced
          // column IS a partition column: homogeneous by construction)
          else if (syn.exists(s => FooterPrune.excludes(s, cond))) 'u'
          else if (syn.exists(s => negCond.exists(nc => FooterPrune.excludes(s, nc)) &&
              refs.forall(c => s.cols.get(c).exists(_.nulls.contains(0L))))) 'd'
          else {
          val fstats = ParquetFooterStats.get(conf, st.getPath, st.getLen,
            st.getModificationTime)
          if (FooterPrune.excludes(fstats, cond)) 'u'
          else if (negCond.exists(nc => FooterPrune.excludes(fstats, nc)) &&
              refs.forall(c => fstats.cols.get(c).exists(_.nulls.contains(0L))))
            'd'
          else 'w'
          }
        } catch { case scala.util.control.NonFatal(_) => 'w' }
        cls match {
          case 'u' => u += ((rel, st.getPath))
          case 'd' => d += ((rel, st.getPath))
          case 'w' => w += ((rel, st.getPath))
        }
      }
      (u.result(), d.result(), w.result())
    }

    // MERGE-ON-READ (lightweight) DELETE — the ClickHouse posture
    // ([[DeleteMasks]]): instead of rewriting the partial-match files,
    // attach the predicate to each as a delete mask inside one version
    // publish. Zero data I/O; every data file stays byte-identical;
    // scans filter masked rows until a rewrite purges them. Taken for
    // the plain DELETE verb AND for REPLACE WHERE's retirement side
    // (`alsoPublish` carries the payload into the SAME publish; the
    // payload files are `protect`ed so the mask never applies to the
    // rows that replace the condition's range), on a versioned table
    // with `spark.graft.delete.mode=merge-on-read`. A trivially-TRUE
    // condition (truncate / unfiltered DELETE) keeps copy-on-write:
    // masking every row of every file is strictly worse than the
    // metadata-only retirement the CoW path already does.
    val maskPred: Option[String] =
      if (versioned && DeleteMasks.mergeOnRead(spark) &&
          whole != AlwaysTrue()) DeleteMasks.serialize(whole)
      else None
    if (maskPred.isDefined) {
      val droppedNames = dropped.map(_._1).toSet
      // classification proved no row can match → genuine no-op, no
      // version churn (same contract as the merge-on-read UPDATE) —
      // unless a payload must still publish
      if (rewrites.isEmpty && droppedNames.isEmpty && alsoPublish.isEmpty) {
        return ParquetDeleteStats(untouched.length.toLong, 0L, 0L)
      }
      val addMasks =
        rewrites.map { case (rel, _) => rel -> Seq(maskPred.get) }.toMap
      // Guard the DROPPED files (ADVICE r13 follow-through): a
      // concurrent rewrite (compaction/Z-order) retiring a drop-whole
      // candidate moved its rows into new unmasked outputs — the
      // `filterNot` would silently no-op and the DELETE lose exactly
      // those rows. Mask-target retirement is already a ledger-level
      // conflict (merged() throws); drift on a dropped file is
      // harmless (its every row matches the predicate regardless), so
      // the guard carries the masks observed now to keep spurious
      // conflicts rare.
      val dropGuard = ParquetVersions.guardFor(droppedNames,
        ParquetVersions.masksFor(tableDir, None))
      if (preCaughtUp) {
        // REPLACE WHERE: one publish covers drops, masks AND the
        // appended payload — straight to the ledger, no internal
        // catch-up (which would publish the payload as its own commit)
        VersionLedger.commit(tableDir, None, addMasks, dropGuard,
          Some(n => new Path(data, n))) { prev =>
          (prev.filterNot(droppedNames) ++ alsoPublish).distinct.sorted
        }
      } else {
        ParquetVersions.commitGuarded(tableDir, None, addMasks, dropGuard) { live =>
          (live.filterNot(droppedNames) ++ alsoPublish).distinct.sorted
        }
      }
      MaskPressure.afterMaskPublish(spark, tableDir)
      return ParquetDeleteStats(untouched.length.toLong, dropped.length.toLong,
        0L, masked = rewrites.length.toLong)
    }

    // PRIOR masks on the input files (earlier merge-on-read deletes):
    // a rewrite must not resurrect rows an attached mask already
    // deleted, so the survivor read goes through the mask-aware reader
    // — which also PURGES those masks (the outputs are new names; the
    // commit's carry-forward drops masks of retired inputs).
    val priorMasks: Map[String, Seq[String]] =
      if (versioned) ParquetVersions.masksFor(tableDir, None) else Map.empty

    // survivors are rows where the predicate is FALSE **or NULL** (SQL
    // DELETE removes only TRUE rows). The condition is re-resolved
    // against THIS DataFrame's attributes (the classify expression
    // carries fresh exprIds).
    def rewriteSurvivors(inputs: Seq[String], staging: Path): Unit = {
      val unresolvedCond = cond.transform {
        case a: AttributeReference =>
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(a.name))
      }
      DeleteMasks.readVisible(spark, declared, data, inputs, priorMasks)
        .filter(not(coalesce(
          org.apache.spark.sql.GraftShims.column(unresolvedCond), lit(false))))
        .write.mode("overwrite").parquet(staging.toString)
    }
    // per-operation token in output names: an UNTOUCHED file from an
    // earlier delete keeps its `delete-…` name (through the hardlink
    // or the version set), and an index-only name here would collide
    // with it (rename fails if the destination exists). Same
    // discipline as [[Compaction.compactTable]].
    val opId = java.util.UUID.randomUUID().toString.take(8)
    def renameParts(staging: Path, into: Path, relDir: String, group: Int,
        tag: Option[Int]): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      fs.listStatus(staging).foreach { s =>
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) {
          val name = f"delete-$opId-$group-$i%05d" +
            tag.fold("")(k => s"-b$k") + ".parquet"
          val rel = if (relDir.isEmpty) name else s"$relDir/$name"
          val to = new Path(into, rel)
          fs.mkdirs(to.getParent)
          if (!fs.rename(s.getPath, to)) {
            throw new java.io.IOException(s"stage rename failed for ${s.getPath}")
          }
          out += rel
          i += 1
        }
      }
      fs.delete(staging, true)
      out.result()
    }
    // Bucketed table ([[ParquetBucketing]]): rewrite WITHIN each
    // name-tagged bucket; partitioned table: WITHIN each partition dir
    // (survivors stay in their partition — the layout survives the
    // DELETE). One job per affected group, submitted CONCURRENTLY
    // ([[Compaction.inParallel]]). Untagged inputs rewrite together.
    val tagOf: String => Option[Int] =
      if (ParquetBucketing.readSpec(tableDir).isEmpty) _ => None
      else rel => ParquetBucketing.bucketOfName(PartitionSpecs.nameOfRel(rel))
    val rewriteGroups: Seq[((String, Option[Int]), Seq[String])] =
      rewrites.map(_._1).groupBy(rel => (PartitionSpecs.dirOfRel(rel), tagOf(rel)))
        .toSeq.sortBy(_._1)
    def rewriteAll(into: Path): Seq[String] =
      Compaction.inParallel(rewriteGroups.zipWithIndex) {
        case (((relDir, tag), members), g) =>
          val staging = new Path(base,
            s".delete-$opId-$g" + tag.fold("")(k => s"-b$k"))
          fs.delete(staging, true)
          rewriteSurvivors(members, staging)
          renameParts(staging, into, relDir, g, tag)
      }.flatten

    if (versioned) {
      // Snapshot commit ([[ParquetVersions]]): survivors land in
      // `data/` under maintenance names, inputs stay on disk for
      // pinned readers, and the version publish is the only
      // visibility event. A crash before it leaves unreferenced
      // `delete-*` files that the live rule ignores and vacuum
      // reclaims.
      val written =
        if (rewrites.isEmpty) Seq.empty[String] else rewriteAll(data)
      val droppedNames = dropped.map(_._1).toSet
      val rewriteNames = rewrites.map(_._1).toSet
      // guarded publish: the rewrite read visible rows of
      // `rewriteNames` under `priorMasks` — a fresh mask on one of
      // them since then means its rows would be resurrected in
      // `written`; abort, clean the staged outputs, retry the classify
      val guard = ParquetVersions.guardFor(rewriteNames, priorMasks)
      try {
        if (preCaughtUp) {
          // REPLACE WHERE: one publish covers retirement, rewrites AND
          // the appended payload — straight to the ledger, no internal
          // catch-up (which would publish the payload as its own commit)
          VersionLedger.commit(tableDir, None, Map.empty, guard,
            Some(n => new Path(data, n))) { prev =>
            (prev.toSet -- droppedNames -- rewriteNames ++ written
              ++ alsoPublish).toSeq
          }
        } else {
          ParquetVersions.commitGuarded(tableDir, None, Map.empty, guard) { live =>
            (live.toSet -- droppedNames -- rewriteNames ++ written).toSeq
          }
        }
      } catch {
        case e: VersionLedger.MaskConflictException =>
          written.foreach(n => fs.delete(new Path(data, n), false))
          throw e
      }
    } else {
      val next = new Path(base, "data.next")
      fs.delete(next, true)
      fs.mkdirs(next)
      untouched.foreach { case (rel, p) =>
        val to = new Path(next, rel)
        fs.mkdirs(to.getParent)
        Compaction.linkOrCopy(fs, conf, p, to)
      }
      if (rewrites.nonEmpty) rewriteAll(next)
      fs.create(new Path(next, "_COMPACT_SUCCESS"), true).close()
      Compaction.swapGenerations(fs, base)
    }
    ParquetDeleteStats(untouched.length.toLong, dropped.length.toLong,
      rewrites.length.toLong)
    }
}
