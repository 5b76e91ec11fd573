package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.types.{BooleanType, StringType, StructType}

/** MERGE-ON-READ `UPDATE` for catalog parquet tables — the other half
  * of the lightweight-DML contract ([[DeleteMasks]] is the DELETE
  * half; the reference's warehouse mutates rows server-side between
  * its test cases, `hashes_test.go:235-239`, and ClickHouse's
  * "lightweight" tier marks rows now and physically rewrites at merge
  * time).
  *
  * `UPDATE t SET … WHERE p` under `spark.graft.delete.mode =
  * merge-on-read` decomposes into masks + an append, published as ONE
  * atomic version commit:
  *
  *   - every live file whose footer stats cannot EXCLUDE `p` gets `p`
  *     attached as a delete mask (exactly a lightweight DELETE of the
  *     matched rows — per-file predicate ≡ position bitmap on an
  *     immutable file);
  *   - the updated images of those rows — visible rows where `p` is
  *     TRUE, with the SET projection applied — are appended as NEW
  *     files under the `rlo-` maintenance prefix.
  *
  * Write amplification collapses from O(candidate FILES) to
  * O(matched ROWS): a one-key UPDATE on a 100 TB table reads the
  * pushdown-pruned row groups of the candidate files and writes one
  * small file plus one ledger payload, instead of rewriting every
  * candidate file whole. Untouched-row bytes are never copied; the
  * physical merge happens when compaction (or any other rewrite)
  * consumes the masks.
  *
  * HOW it intercepts: Spark's analyzer rewrites `UpdateTable` on a
  * `SupportsRowLevelOperations` table into the group-based
  * `ReplaceData` plan inside the Resolution fixed-point — before any
  * injectable resolution rule can run — so the interception happens in
  * the OPTIMIZER: [[ParquetMoRUpdate.InterceptRule]] matches the
  * `ReplaceData` whose operation is [[ParquetRowLevelOperation]] with
  * command UPDATE, re-derives the SET projection from the update
  * `Project` the rewrite built, and swaps the whole plan for
  * [[MergeOnReadUpdateCommand]]. Anything the mask machinery cannot
  * express — a condition [[DeleteMasks.serialize]] refuses (subquery,
  * unsupported shape), an un-versioned table, a nondeterministic
  * WHERE, a SET that assigns a PARTITION column (rows would move
  * across partition dirs) — leaves the plan untouched and the
  * copy-on-write path runs unchanged; the fallback is silent and
  * always correct, the MoR path is an optimization of the same
  * semantics. Routed layouts are preserved: bucketed images append
  * bucket-tagged, partitioned images run one concurrent job per
  * touched partition writing into its own directory (partition-dir
  * bounds exclude whole partitions from the candidate set with zero
  * I/O first).
  *
  * Consistency invariants:
  *   - the mask predicate and the matched-row filter derive from the
  *     SAME serialized Filter JSON, so "row masked out" and "row
  *     re-appended updated" agree exactly (three-valued: NULL rows are
  *     neither);
  *   - the appended files carry NO mask — `SET x = x+1 WHERE x < 5`
  *     cannot re-delete its own output, masks attach only to the
  *     pre-existing candidate files;
  *   - prior masks on candidate files are honored when reading the
  *     rows to update (an earlier lightweight DELETE cannot be
  *     resurrected as an updated row);
  *   - a crash before the publish leaves only unreferenced `rlo-`
  *     maintenance files that the live rule ignores and vacuum
  *     reclaims — readers see the old table or the new, never a mix.
  *
  * Same snapshot-isolation caveat as the copy-on-write path: two
  * concurrent UPDATEs of overlapping rows both read the pre-state
  * (the ledger CAS serializes the publishes, not the reads). */
object ParquetMoRUpdate {

  /** Optimizer interception of the group-based UPDATE plan (see class
    * doc for why the optimizer and not resolution). Idempotent: the
    * replacement contains no `ReplaceData`, so fixed-point batches
    * stabilize after one application. */
  object InterceptRule extends Rule[LogicalPlan] {
    private def dbg(msg: => String): Unit =
      if (System.getenv("GRAFT_MORU_DEBUG") != null) {
        // scalastyle:off println
        println(s"[moru] $msg")
        // scalastyle:on println
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      // a row-level command is always the plan root (commands execute
      // eagerly; ReplaceData never nests under other operators)
      case rd: ReplaceData =>
        dbg(s"saw ReplaceData op=${rd.operation.getClass} " +
          s"cond=${rd.condition} query=\n${rd.query.treeString}")
        rewrite(rd).getOrElse(rd)
      case other =>
        dbg(s"root is ${other.getClass.getName}")
        other
    }

    private def rewrite(rd: ReplaceData): Option[LogicalPlan] = {
      val op = rd.operation match {
        case p: ParquetRowLevelOperation
            if p.command() == RowLevelOperation.Command.UPDATE => p
        case _ => return None
      }
      if (conf.getConfString(DeleteMasks.MODE_KEY, "copy-on-write")
          != "merge-on-read") return None
      val tableDir = op.tableDir
      // masks ride the version ledger (partitioned and bucketed
      // layouts are handled: the appended images route into partition
      // dirs / carry bucket tags)
      if (!ParquetVersions.enabled(tableDir)) return None
      if (!rd.condition.deterministic) return None
      val declaredNames = op.declared.fieldNames.map(_.toLowerCase).toSet
      // a SET that assigns a PARTITION column moves rows across
      // partition dirs — the copy-on-write router handles that; the
      // per-partition append below relies on rows staying put
      val partCols: Set[String] = PartitionSpecs.read(tableDir)
        .map(_.fields.map(_.col.toLowerCase).toSet).getOrElse(Set.empty)
      for {
        filter <- toV1(rd.condition)
        // evaluable, not just serializable: the NNF translation the
        // masked reader compiles must exist (¬StartsWith has a JSON
        // form but no evaluation form)
        if ParquetDelete.supported(op.declared)(filter)
        maskJson <- DeleteMasks.serialize(filter)
        // the mask must be evaluable over declared columns alone (a
        // condition on `_file` would reference a column the masked
        // reader's row schema lacks)
        if DeleteMasks.references(maskJson)
          .forall(r => declaredNames(r.toLowerCase))
        extracted <- setProjection(rd, op.declared, declaredNames)
        (sets, assigned) = extracted
        if assigned.forall(a => !partCols(a.toLowerCase))
      } yield MergeOnReadUpdateCommand(tableDir, op.declared, maskJson, sets)
    }

    /** Catalyst → v1 `Filter`, restricted to the shapes
      * [[DeleteMasks]] can serialize (Spark's own
      * `DataSourceStrategy.translateFilter` is `protected[sql]`).
      * Literal values convert to their EXTERNAL representations —
      * the mask codec stores external scalars. Any unhandled shape
      * (casts on the column side, functions, subqueries) returns None
      * → copy-on-write. Shared with the log tier's interception
      * ([[LogMoRUpdate]]). */
    private[sources] def toV1(e: Expression): Option[v1.Filter] = {
      def ext(l: Literal): Any =
        CatalystTypeConverters.convertToScala(l.value, l.dataType)
      e match {
        case ce.And(l, r) => for (a <- toV1(l); b <- toV1(r)) yield v1.And(a, b)
        case ce.Or(l, r) => for (a <- toV1(l); b <- toV1(r)) yield v1.Or(a, b)
        case ce.Not(c) => toV1(c).map(v1.Not)
        case ce.IsNull(a: AttributeReference) => Some(v1.IsNull(a.name))
        case ce.IsNotNull(a: AttributeReference) => Some(v1.IsNotNull(a.name))
        case ce.EqualTo(a: AttributeReference, l: Literal) =>
          Some(v1.EqualTo(a.name, ext(l)))
        case ce.EqualTo(l: Literal, a: AttributeReference) =>
          Some(v1.EqualTo(a.name, ext(l)))
        case ce.EqualNullSafe(a: AttributeReference, l: Literal) =>
          Some(v1.EqualNullSafe(a.name, ext(l)))
        case ce.EqualNullSafe(l: Literal, a: AttributeReference) =>
          Some(v1.EqualNullSafe(a.name, ext(l)))
        case ce.GreaterThan(a: AttributeReference, l: Literal) =>
          Some(v1.GreaterThan(a.name, ext(l)))
        case ce.GreaterThan(l: Literal, a: AttributeReference) =>
          Some(v1.LessThan(a.name, ext(l)))
        case ce.GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          Some(v1.GreaterThanOrEqual(a.name, ext(l)))
        case ce.GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          Some(v1.LessThanOrEqual(a.name, ext(l)))
        case ce.LessThan(a: AttributeReference, l: Literal) =>
          Some(v1.LessThan(a.name, ext(l)))
        case ce.LessThan(l: Literal, a: AttributeReference) =>
          Some(v1.GreaterThan(a.name, ext(l)))
        case ce.LessThanOrEqual(a: AttributeReference, l: Literal) =>
          Some(v1.LessThanOrEqual(a.name, ext(l)))
        case ce.LessThanOrEqual(l: Literal, a: AttributeReference) =>
          Some(v1.GreaterThanOrEqual(a.name, ext(l)))
        case ce.In(a: AttributeReference, vs)
            if vs.forall(_.isInstanceOf[Literal]) =>
          Some(v1.In(a.name,
            vs.map(l => ext(l.asInstanceOf[Literal])).toArray))
        case ce.InSet(a: AttributeReference, set) =>
          Some(v1.In(a.name, set.toArray.map(
            CatalystTypeConverters.convertToScala(_, a.dataType))))
        case ce.StartsWith(a: AttributeReference, l: Literal)
            if l.dataType == StringType && l.value != null =>
          Some(v1.StringStartsWith(a.name, l.value.toString))
        case Literal(true, BooleanType) => Some(v1.AlwaysTrue())
        case Literal(false, BooleanType) => Some(v1.AlwaysFalse())
        case _ => None
      }
    }

    /** The per-column update expressions, recovered from the
      * `If(cond, updated, original)` projection `RewriteUpdateTable`
      * built over the group scan — re-targeted at a plain
      * declared-schema read by unresolving the attribute references.
      * Evaluated only over rows where the condition is TRUE, the `If`
      * collapses to the assigned value; unassigned columns pass
      * through. None = a shape we don't recognize (MERGE's MergeRows,
      * the nondeterministic union plan, a `_file` reference, a
      * subquery in a SET value) → copy-on-write. Returns the
      * per-column expressions plus the names of ASSIGNED columns. */
    private[sources] def setProjection(rd: ReplaceData, declared: StructType,
        declaredNames: Set[String])
        : Option[(Seq[(String, Expression)], Seq[String])] = {
      // the TOPMOST Project is the update projection (the rewrite may
      // interpose a runtime group-filter Filter between it and the
      // scan relation, so don't pattern-match the child)
      val projectList = rd.query.collectFirst {
        case Project(list, _) => list
      }.getOrElse(return None)
      val assigned = Seq.newBuilder[String]
      val sets = declared.fields.toSeq.map { f =>
        val ne = projectList.find(_.name.equalsIgnoreCase(f.name))
          .getOrElse(return None)
        val e = ne match {
          case Alias(child, _) => child
          case other => other
        }
        val expressible = !e.exists {
          case a: AttributeReference => !declaredNames(a.name.toLowerCase)
          case _: PlanExpression[_] => true
          case _ => false
        }
        if (!expressible) return None
        if (!e.isInstanceOf[AttributeReference]) assigned += f.name
        (f.name, e.transform {
          case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
        })
      }
      // every column passing through unchanged means this Project is a
      // wrapper over a nested update projection, not the projection
      // itself — re-deriving SET values from it would silently drop
      // the update, so fall back
      val assignedNames = assigned.result()
      if (assignedNames.isEmpty) return None
      Some((sets, assignedNames))
    }
  }

  /** Session-builder registration (the imperative twin of
    * `GraftExtensions`, same pattern as `TopKPerGroup.register`). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(InterceptRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ InterceptRule
    }
  }
}

/** The decomposed UPDATE: classify → read matched visible rows → apply
  * SET → append → publish masks + membership atomically. */
case class MergeOnReadUpdateCommand(tableDir: String, declared: StructType,
    maskJson: String, sets: Seq[(String, Expression)])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] =
    // each attempt re-reads the live set and prior masks; the publish
    // throws MaskConflictException when a concurrent rewrite retired a
    // candidate between classification and publish (the masks would
    // otherwise be silently dropped and the UPDATE lost for those rows)
    ParquetVersions.retryOnMaskConflict() { runOnce(session) }

  private def runOnce(session: SparkSession): Seq[Row] = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val base = new Path(tableDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = base.getFileSystem(hconf)
    val data = new Path(base, "data")

    // candidates: live files whose footer stats cannot exclude the
    // condition (the same proof the skip-scan and DELETE classify use;
    // stats-free or unreadable footers are conservatively candidates)
    val cond = ParquetDelete
      .toCatalyst(declared, DeleteMasks.deserialize(maskJson))
      .getOrElse(throw new IllegalStateException(
        s"mask predicate no longer translates against the declared " +
          s"schema: $maskJson"))
    val live = ParquetVersions.live(tableDir).toSet
    val partLayout = PartitionSpecs.read(tableDir)
    val candidates = ParquetVersions.walkData(fs, data)
      .filter { case (rel, _) => live(rel) }
      .filter { case (rel, st) =>
        try {
          // partition-dir bounds first (zero I/O — whole partitions
          // drop out before any footer opens), then footer stats
          val syn = partLayout.flatMap(ps =>
            PartitionSpecs.statsOfRelPath(ps, declared, rel))
          if (syn.exists(s => FooterPrune.excludes(s, cond))) false
          else {
            val fstats = ParquetFooterStats.get(hconf, st.getPath, st.getLen,
              st.getModificationTime)
            !FooterPrune.excludes(fstats, cond)
          }
        } catch { case scala.util.control.NonFatal(_) => true }
      }
      .map(_._1)
    if (candidates.isEmpty) return Seq.empty // proof: no row matches

    // updated images of the matched rows: visible under PRIOR masks
    // (an earlier lightweight DELETE stays deleted), condition TRUE
    // (NULL/FALSE rows are untouched — they stay in place, invisible
    // to the new mask), SET projection applied. The read is a plain
    // pushdown-pruned parquet scan of the candidate files only.
    val priorMasks = ParquetVersions.masksFor(tableDir, None)
    val matched = !DeleteMasks.visibleColumn(declared, Seq(maskJson))
    def imagesOf(files: Seq[String]): org.apache.spark.sql.DataFrame =
      DeleteMasks.readVisible(spark, declared, data, files, priorMasks)
        .filter(matched)
        .select(sets.map { case (n, e) =>
          org.apache.spark.sql.GraftShims.column(e).as(n)
        }: _*)

    val opId = java.util.UUID.randomUUID().toString.take(8)
    // Zero-row staged parts (a candidate file whose rows all proved
    // NULL or FALSE) are dropped rather than accumulated; the
    // surviving images land in `data/` under the rlo- maintenance
    // prefix (ledger-gated invisible until the publish; a crash
    // leaves vacuumable orphans).
    def stageIn(dir: Path, relDir: String, tag: Option[Int],
        group: Int): Seq[String] = {
      val out = Seq.newBuilder[String]
      var i = 0
      fs.listStatus(dir).foreach { s =>
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) {
          val rows =
            try ParquetFooterStats.get(hconf, s.getPath, s.getLen,
              s.getModificationTime).rowCount
            catch { case scala.util.control.NonFatal(_) => 1L }
          if (rows > 0L) {
            val name = f"rlo-upd-$opId-$group-$i%05d" +
              tag.fold("")(k => s"-b$k") + ".parquet"
            val rel = if (relDir.isEmpty) name else s"$relDir/$name"
            val to = new Path(data, rel)
            fs.mkdirs(to.getParent)
            if (!fs.rename(s.getPath, to)) {
              throw new java.io.IOException(
                s"MergeOnReadUpdate: rename ${s.getPath} -> $to failed")
            }
            out += rel
            i += 1
          }
        }
      }
      out.result()
    }

    // layout-preserving appends: a BUCKETED table's images write
    // bucket-tagged (`-b<k>` — same murmur3-pmod as the layout and the
    // CoW rewrite), so after compaction purges the masks the
    // key-grouped claim restores without a rebucket repair; a
    // PARTITIONED table's images stay in their partition — the rule
    // rejects a SET on a partition column, so rows cannot move, and
    // each touched partition runs as its own concurrent job writing
    // into its own directory
    val bucketSpec = ParquetBucketing.readSpec(tableDir)
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val written: Seq[String] = (bucketSpec, partLayout) match {
      case (Some(spec), _) =>
        val staging = new Path(base, s".morupd-$opId")
        fs.delete(staging, true)
        imagesOf(candidates)
          .withColumn("_gb", pmod(hash(col(spec.col)), lit(spec.n)))
          .repartition(spec.n, col(spec.col))
          .write.partitionBy("_gb").mode("overwrite").parquet(staging.toString)
        val out = fs.listStatus(staging).toSeq.flatMap { d =>
          if (d.isDirectory && d.getPath.getName.startsWith("_gb=")) {
            stageIn(d.getPath, "",
              Some(d.getPath.getName.stripPrefix("_gb=").toInt), 0)
          } else Seq.empty
        }
        fs.delete(staging, true)
        out
      case (None, Some(_)) =>
        val groups = candidates.groupBy(PartitionSpecs.dirOfRel).toSeq.sortBy(_._1)
        Compaction.inParallel(groups.zipWithIndex) {
          case ((relDir, members), g) =>
            val staging = new Path(base, s".morupd-$opId-$g")
            fs.delete(staging, true)
            imagesOf(members)
              .write.mode("overwrite").parquet(staging.toString)
            val out = stageIn(staging, relDir, None, g)
            fs.delete(staging, true)
            out
        }.flatten
      case _ =>
        val staging = new Path(base, s".morupd-$opId")
        fs.delete(staging, true)
        imagesOf(candidates).write.mode("overwrite").parquet(staging.toString)
        val out = stageIn(staging, "", None, 0)
        fs.delete(staging, true)
        out
    }

    // ONE visibility event: the condition lands as a delete mask on
    // every candidate file and the updated images join the membership.
    // The commit's carry-forward keeps masks version-accurate; a
    // concurrent append lands under new names and is never masked.
    // Guarded (ADVICE r13, medium): a concurrent lightweight DELETE
    // masking a row of a candidate between the image read above and
    // this publish must abort — the appended unmasked image would
    // resurrect the deleted row — and a retired candidate means a
    // rewrite moved its rows into unmasked outputs. Either conflict
    // throws MaskConflictException; the retry re-classifies.
    try {
      ParquetVersions.commitGuarded(tableDir, None,
        candidates.map(_ -> Seq(maskJson)).toMap,
        ParquetVersions.guardFor(candidates.toSet, priorMasks)) { liveNow =>
        (liveNow ++ written).distinct.sorted
      }
    } catch {
      case e: VersionLedger.MaskConflictException =>
        // the retry re-appends under a fresh opId — reclaim this
        // attempt's image files instead of orphaning them to vacuum
        written.foreach(n => fs.delete(new Path(data, n), false))
        throw e
    }
    MaskPressure.afterMaskPublish(spark, tableDir)
    Seq.empty
  }
}
