package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, Literal, PlanExpression}
import org.apache.spark.sql.catalyst.{expressions => ce}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, MergeRows, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.functions.{coalesce, col, hash, input_file_name, lit, pmod, when}
import org.apache.spark.sql.{sources => v1}
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** MERGE-ON-READ `MERGE INTO` for catalog parquet tables — the third
  * leg of the lightweight-DML contract ([[DeleteMasks]] is DELETE,
  * [[ParquetMoRUpdate]] is UPDATE; the reference's warehouse applies
  * CDC upserts as lightweight mutations server-side,
  * `hashes_test.go:235-239`).
  *
  * A MERGE under `spark.graft.delete.mode = merge-on-read` decomposes
  * into masks + appends, published as ONE atomic version commit:
  *
  *   - MATCHED rows taking an UPDATE or DELETE arm are hidden by a
  *     per-file delete mask `key IN (matched keys of that file)` —
  *     the join keys come from the ON clause's target-side equality
  *     columns, so the mask is exact per immutable file;
  *   - updated images (UPDATE arms' projections) and NOT MATCHED
  *     inserts append as NEW files, routed into the table's layout
  *     (partition dirs by row value, bucket tags, or flat);
  *   - pre-existing data files stay byte-identical; write
  *     amplification is O(matched + inserted rows), not O(candidate
  *     files) — a CDC-upsert MERGE touching one key per file on a
  *     100 TB table writes a handful of small files and one ledger
  *     payload instead of rewriting every candidate file whole.
  *
  * HOW it intercepts: the analyzer rewrites `MergeIntoTable` on a
  * `SupportsRowLevelOperations` table into the group-based
  * `ReplaceData(query = … MergeRows …)` plan; like
  * [[ParquetMoRUpdate]], the interception happens in the OPTIMIZER.
  * The rule re-derives the merge program from
  * [[MergeRows]]'s instruction lists — matched `Discard(cond)` =
  * DELETE arm, `Keep(Update, cond, output)` = UPDATE arm,
  * `Keep(Copy, …)` = carry; not-matched `Keep(Insert, cond, output)`
  * = INSERT arm (first-match-wins order preserved) — and swaps the
  * plan for [[MergeOnReadMergeCommand]]. NOT MATCHED BY SOURCE
  * DELETE/UPDATE arms decompose too (r15): their scope is the
  * source-UNMATCHED complement, evaluated as a target anti-join and
  * hidden through the same mask/DV/rewrite ladder — the source-key
  * prefilter is skipped when they exist, since it would prune exactly
  * their candidates. Anything outside the mask machinery's reach
  * leaves the plan untouched and the copy-on-write path runs
  * unchanged (silent, always-correct fallback): an un-versioned
  * table, a nondeterministic ON/arm condition, an ON clause with no
  * serializable target-side equality key, a BY-SOURCE arm referencing
  * source columns, or expressions referencing non-declared columns.
  *
  * TWO EXECUTION REGIMES, chosen at runtime from the actual matched
  * delta (both end in one atomic publish):
  *
  *   - MASK regime (the point of the feature): per-file IN masks over
  *     the matched keys + routed appends. Requires the matched key
  *     set to fit the ledger-payload budget
  *     (`spark.graft.merge.mor.maxMaskKeys`, default 10 000) and
  *     every masked (file, key) to be FULLY hidden — a key whose
  *     rows split between an UPDATE/DELETE arm and a COPY arm (or an
  *     unmatched residual row under a non-equality ON conjunct)
  *     cannot be expressed as a key mask;
  *   - GROUP-REWRITE regime (fallback for huge or mixed deltas): the
  *     candidate files (those holding hidden rows) are rewritten
  *     whole — visible rows left-joined to the source, arms applied,
  *     deletes dropped — and retired in the same publish, exactly the
  *     copy-on-write contract, still reading only candidate files.
  *
  * Scale posture: one pushdown-pruned target scan (the distinct
  * source keys, when collectible, push an IN prefilter into the
  * parquet scan — footer zone maps drop untouched files before any
  * row decodes), one shuffle join against the (typically small,
  * broadcastable) source, O(matched) appended bytes. The cardinality
  * check and the mixed-key probe both run on the matched delta, not
  * the table.
  *
  * Consistency invariants (shared with the UPDATE path): prior masks
  * are honored when reading matched rows (an earlier lightweight
  * DELETE cannot resurrect through a MERGE); appended files carry no
  * mask; the publish throws [[VersionLedger.MaskConflictException]]
  * if a concurrent rewrite retired a candidate (the command
  * re-classifies and retries); a crash before the publish leaves only
  * unreferenced `rlo-` files that vacuum reclaims. */
object ParquetMoRMerge {

  val MAX_MASK_KEYS_KEY = "spark.graft.merge.mor.maxMaskKeys"

  /** Cap on the distinct source-key tuples collected for the target
    * scan's `InSet` PREFILTER — decoupled from [[MAX_MASK_KEYS_KEY]]
    * (r15): a delta past the MASK cap still lands lightweight through
    * the DV regime, and the prefilter is exactly what keeps that
    * merge O(matched) instead of a full-table join (soak: the DV
    * merge's wall-time exponent dropped from 0.60 once the prefilter
    * survived the cap split). */
  val PREFILTER_KEYS_KEY = "spark.graft.merge.prefilter.maxKeys"
  val PREFILTER_KEYS_DEFAULT = 100000

  // --- the merge program, re-derived from MergeRows ------------------

  sealed trait MatchedArm extends Serializable {
    def cond: Expression
  }
  /** WHEN MATCHED [AND cond] THEN DELETE. */
  case class DeleteArm(cond: Expression) extends MatchedArm
  /** WHEN MATCHED [AND cond] THEN UPDATE SET …; `outs` is the full
    * declared-width projection (field name → expression over the
    * substituted join columns). */
  case class UpdateArm(cond: Expression, outs: Seq[(String, Expression)])
      extends MatchedArm
  /** The rewrite-generated carry arm (rows matched but not taken by
    * any DML arm stay in place). */
  case class CopyArm(cond: Expression) extends MatchedArm

  case class InsertArm(cond: Expression, outs: Seq[(String, Expression)])

  /** ON-clause equality key: declared target field name + the
    * source-side expression (already substituted to `_sN` columns). */
  case class MergeKey(field: String, srcExpr: Expression)

  /** Opaque expression holder: the command's substituted expressions
    * are UNRESOLVED on purpose (they resolve against the DataFrames it
    * builds at run time), but a bare `Expression` constructor field
    * would surface through `QueryPlan.expressions` and fail the
    * optimizer's "plan became unresolved" validation. */
  case class Cond(e: Expression)

  /** The tier-agnostic MERGE program re-derived from the group-based
    * rewrite plan — everything a mask+append decomposition needs,
    * expressed over positional `_t<i>`/`_s<i>` column names so either
    * tier's command can bind it to its own scan. `bySourceArms` are
    * the NOT MATCHED BY SOURCE instructions (target-only scope: their
    * conditions and outputs reference only `_t<i>` columns — enforced
    * at extraction; the commands evaluate them on the source-unmatched
    * anti-join complement). */
  private[sources] case class Program(onCond: Cond,
      matchedArms: Seq[MatchedArm], insertArms: Seq[InsertArm],
      bySourceArms: Seq[MatchedArm],
      keys: Seq[MergeKey], srcPresent: String, source: LogicalPlan,
      checkCardinality: Boolean)

  private def maskableType(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | StringType | DateType | TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case rd: ReplaceData => rewrite(rd).getOrElse(rd)
      case other => other
    }

    private def rewrite(rd: ReplaceData): Option[LogicalPlan] = {
      val op = rd.operation match {
        case p: ParquetRowLevelOperation
            if p.command() == RowLevelOperation.Command.MERGE => p
        case _ => return None
      }
      if (conf.getConfString(DeleteMasks.MODE_KEY, "copy-on-write")
          != "merge-on-read") return None
      val tableDir = op.tableDir
      if (!ParquetVersions.enabled(tableDir)) return None
      if (!rd.condition.deterministic) return None
      val declared = op.declared
      extractProgram(rd, declared).map { p =>
        MergeOnReadMergeCommand(tableDir, declared, p.onCond,
          p.matchedArms, p.insertArms, p.bySourceArms, p.keys,
          p.srcPresent, p.source, p.checkCardinality)
      }
    }
  }

  /** Re-derive the [[Program]] from `rd`'s analyzed `MergeRows` plan;
    * None = a shape outside the mask machinery's reach (either tier
    * then leaves the plan to the copy-on-write group rewrite). */
  private[sources] def extractProgram(rd: ReplaceData,
      declared: StructType): Option[Program] = {
      val m = rd.query.collectFirst { case mr: MergeRows => mr }
        .getOrElse(return None)
      val join = m.child.collectFirst { case j: Join => j }.getOrElse(return None)
      // the SOURCE side always carries the `__row_from_source` marker;
      // the target side's `__row_from_target` twin exists only on the
      // full-outer shape (a matched-only MERGE plans target LEFT OUTER
      // source with no target marker), so detect by the source marker
      def marked(p: LogicalPlan, marker: String): Boolean =
        p.output.exists(_.name == marker)
      val (tSide, sSide) =
        if (marked(join.right, "__row_from_source") &&
            !marked(join.left, "__row_from_source")) (join.left, join.right)
        else if (marked(join.left, "__row_from_source") &&
            !marked(join.right, "__row_from_source")) (join.right, join.left)
        else return None

      // attribute substitution: target relation attrs → `_t<i>` by
      // declared field position; every source output attr → `_s<i>`
      val declaredNames = declared.fieldNames
      val tAttrMap: Map[Long, String] = declaredNames.zipWithIndex.map {
        case (n, i) =>
          val a = tSide.output.find(_.name.equalsIgnoreCase(n))
            .getOrElse(return None)
          a.exprId.id -> s"_t$i"
      }.toMap
      val sAttrMap: Map[Long, String] = sSide.output.zipWithIndex.map {
        case (a, i) => a.exprId.id -> s"_s$i"
      }.toMap
      val sub = tAttrMap ++ sAttrMap

      def subst(e: Expression): Option[Expression] = {
        if (!e.deterministic) return None
        if (e.exists(_.isInstanceOf[PlanExpression[_]])) return None
        var ok = true
        val out = e.transform {
          case a: AttributeReference =>
            sub.get(a.exprId.id) match {
              case Some(n) => UnresolvedAttribute(Seq(n))
              case None => ok = false; a
            }
        }
        if (ok) Some(out) else None
      }

      // the ON clause comes from the JOIN, not rd.condition: the
      // latter is the group-FILTER condition, which degenerates to
      // literal TRUE when BY-SOURCE arms exist (every target row is a
      // candidate) — keys extracted from it would come back empty
      val onExpr = join.condition.getOrElse(return None)
      val onCond = subst(onExpr).getOrElse(return None)
      val srcPresent: String = m.isSourceRowPresent match {
        case ce.IsNotNull(a: AttributeReference) =>
          sAttrMap.getOrElse(a.exprId.id, return None)
        case _ => return None
      }

      // the mask keys: ON conjuncts `targetCol = <source expr>` where
      // the target side is a bare declared attribute of a type the
      // mask codec carries and the other side is source-only
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case ce.And(l, r) => conjuncts(l) ++ conjuncts(r)
        case x => Seq(x)
      }
      def sourceOnly(e: Expression): Boolean = !e.exists {
        case a: AttributeReference => !sAttrMap.contains(a.exprId.id)
        case _ => false
      }
      def fieldOf(a: AttributeReference): Option[String] =
        if (tAttrMap.contains(a.exprId.id))
          declaredNames.find(_.equalsIgnoreCase(a.name))
        else None
      val keys: Seq[MergeKey] = conjuncts(onExpr).flatMap {
        case ce.EqualTo(a: AttributeReference, b)
            if fieldOf(a).isDefined && sourceOnly(b) &&
              maskableType(a.dataType) =>
          subst(b).map(MergeKey(fieldOf(a).get, _))
        case ce.EqualTo(b, a: AttributeReference)
            if fieldOf(a).isDefined && sourceOnly(b) &&
              maskableType(a.dataType) =>
          subst(b).map(MergeKey(fieldOf(a).get, _))
        case _ => Seq.empty
      }.groupBy(_.field).map(_._2.head).toSeq.sortBy(_.field)
      if (keys.isEmpty) return None

      // the declared-width projection of a Keep's positional output
      val outIdx: Map[String, Int] = declaredNames.map { n =>
        val i = m.output.indexWhere(_.name.equalsIgnoreCase(n))
        if (i < 0) return None
        n -> i
      }.toMap
      def outsOf(output: Seq[Expression]): Option[Seq[(String, Expression)]] = {
        val b = Seq.newBuilder[(String, Expression)]
        declaredNames.foreach { n =>
          subst(output(outIdx(n))) match {
            case Some(e) => b += ((n, e))
            case None => return None
          }
        }
        Some(b.result())
      }

      val matchedArms: Seq[MatchedArm] = m.matchedInstructions.map {
        case MergeRows.Discard(cond) =>
          subst(cond).map(DeleteArm).getOrElse(return None)
        case MergeRows.Keep(MergeRows.Update, cond, output) =>
          (for (c <- subst(cond); o <- outsOf(output)) yield UpdateArm(c, o))
            .getOrElse(return None)
        case MergeRows.Keep(MergeRows.Copy, cond, _) =>
          subst(cond).map(CopyArm).getOrElse(return None)
        case _ => return None // Split / unknown shapes → copy-on-write
      }
      val insertArms: Seq[InsertArm] = m.notMatchedInstructions.map {
        case MergeRows.Keep(MergeRows.Insert, cond, output) =>
          (for (c <- subst(cond); o <- outsOf(output)) yield InsertArm(c, o))
            .getOrElse(return None)
        case _ => return None
      }

      // NOT MATCHED BY SOURCE arms act on the table's source-UNMATCHED
      // complement: the commands evaluate them over a target-only
      // anti-join frame, so every condition/output must reference `_t`
      // columns ONLY (SQL guarantees this for user-written arms; a
      // source-referencing shape falls back to copy-on-write). The
      // rewrite-generated unconditional carry contributes nothing.
      def targetOnly(e: Expression): Boolean = !e.exists {
        case UnresolvedAttribute(parts) => parts.last.startsWith("_s")
        case _ => false
      }
      val bySourceArms: Seq[MatchedArm] = m.notMatchedBySourceInstructions.map {
        case MergeRows.Keep(MergeRows.Copy, cond, _) =>
          subst(cond).filter(targetOnly).map(CopyArm).getOrElse(return None)
        case MergeRows.Discard(cond) =>
          subst(cond).filter(targetOnly).map(DeleteArm).getOrElse(return None)
        case MergeRows.Keep(MergeRows.Update, cond, output) =>
          (for {
            c <- subst(cond) if targetOnly(c)
            o <- outsOf(output) if o.forall(kv => targetOnly(kv._2))
          } yield UpdateArm(c, o)).getOrElse(return None)
        case _ => return None
      }.filter {
        // drop UNCONDITIONAL carries (the rewrite's identity arm);
        // conditional copies stay in the chain — first-match-wins
        // means they shield later DML arms
        case CopyArm(Literal(true, BooleanType)) => false
        case _ => true
      }

      // nothing to hide and nothing to insert would be a no-op MERGE;
      // let the trivial case fall through to CoW (it will no-op too)
      if (matchedArms.isEmpty && insertArms.isEmpty && bySourceArms.isEmpty)
        return None

      Some(Program(Cond(onCond), matchedArms, insertArms, bySourceArms,
        keys, srcPresent, sSide, m.checkCardinality))
  }

  /** Session-builder registration (the imperative twin of
    * `GraftExtensions`). */
  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(InterceptRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ InterceptRule
    }
  }
}

/** The runtime pieces BOTH tiers' decomposed-MERGE commands share —
  * pure DataFrame algebra over the positional `_t<i>`/`_s<i>` frames
  * and the v1-filter mask construction. The tier-specific parts (the
  * scan, the writers, the ledger publish) stay in each command; ONE
  * definition of everything else so the twins cannot drift (r13
  * self-review: the census, arm chain and prefilter were duplicated
  * verbatim, and a bug fix in one had already missed the other). */
private[sources] object MoRMergeKernel {
  import ParquetMoRMerge._

  private def colOf(e: Expression): Column =
    org.apache.spark.sql.GraftShims.column(e)

  /** Distinct source key tuples — the scan prefilter. None past the
    * cap (driver-memory bound, [[ParquetMoRMerge.PREFILTER_KEYS_KEY]]):
    * the full scan stays. The cap is deliberately LARGER than the mask
    * cap — a delta past the mask cap still lands lightweight through
    * the DV regime, and the prefilter is what keeps that path
    * O(matched). */
  def srcKeyRows(src: DataFrame, keys: Seq[MergeKey],
      cap: Int): Option[Array[Row]] = {
    val rows = src.select(keys.map(k => colOf(k.srcExpr).as(k.field)): _*)
      .distinct().limit(cap + 1).collect()
    if (rows.length > cap) None else Some(rows)
  }

  /** InSet prefilter over the distinct key tuples: one expression node
    * and one hash probe per row (thousands of `isin` Literal nodes
    * cost the driver seconds of analyzer/optimizer re-walks, and an
    * un-optimized `In` evaluates linearly); still pushes down through
    * the v1 `In` translation. */
  def inSetPrefilter(rows: Array[Row], keys: Seq[MergeKey],
      declared: StructType, tColName: String => String): Column = {
    keys.zipWithIndex.map { case (k, i) =>
      val vals = rows.map(_.get(i)).filter(_ != null).distinct.toSeq
      if (vals.isEmpty) lit(false)
      else {
        val dt = declared(declared.fieldNames
          .indexWhere(_.equalsIgnoreCase(k.field))).dataType
        colOf(ce.InSet(UnresolvedAttribute(Seq(tColName(k.field))),
          vals.map(v => Literal.create(v, dt).value).toSet))
      }
    }.reduce(_ && _)
  }

  /** MERGE_CARDINALITY_VIOLATION: a target row (identified by
    * `rowIdCols` — (file, position) on the parquet tier, the
    * synthetic `_grid` on the log tier) matched more than one source
    * row. */
  def requireCardinality(joined: DataFrame,
      rowIdCols: Seq[String] = Seq("_grid")): Unit = {
    val viol = joined.groupBy(rowIdCols.map(col): _*).count()
      .filter(col("count") > 1).limit(1).count()
    if (viol > 0) {
      throw new UnsupportedOperationException(
        "MERGE_CARDINALITY_VIOLATION: a target row matched more than " +
          "one source row; deduplicate the source or tighten the ON " +
          "clause")
    }
  }

  /** First-match-wins arm tag (−1 = no arm took the row). `offset`
    * shifts the tag space so two arm families (matched / not-matched-
    * by-source) can share one `_gtag` column without collisions. */
  def armTag(matchedArms: Seq[MatchedArm], offset: Int = 0): Column = {
    val chain = matchedArms.zipWithIndex.foldLeft(Option.empty[Column]) {
      case (acc, (arm, i)) =>
        val c = colOf(arm.cond)
        Some(acc.fold(when(c, lit(i + offset)))(_.when(c, lit(i + offset))))
    }
    chain.fold(lit(-1))(_.otherwise(lit(-1)))
  }

  /** Rows a DELETE/UPDATE arm HIDES (the mask candidates). */
  def hideOf(classified: DataFrame,
      matchedArms: Seq[MatchedArm]): DataFrame = {
    val hideTags = matchedArms.zipWithIndex.collect {
      case (_: DeleteArm, i) => i
      case (_: UpdateArm, i) => i
    }
    if (hideTags.isEmpty) classified.limit(0)
    else classified.filter(col("_gtag").isin(hideTags: _*))
  }

  /** Mask-regime exactness census: every masked (file, key) must be
    * FULLY hidden — a same-key row in the same file that stays visible
    * (copy arm, or unmatched under a residual ON conjunct) would be
    * deleted by the key mask too.
    *
    * The hidden side counts DISTINCT TARGET rows (`rowId`), not raw
    * join rows (ADVICE r13, high): with a single unconditional WHEN
    * MATCHED THEN DELETE Spark plans `checkCardinality = false`, so
    * duplicate source key tuples legally multiply the hide join — a
    * raw count can equal `totCnt` while a same-file same-key row
    * actually stays visible, and the published key mask would silently
    * delete it.
    *
    * `rowId` is the row-identity column: `_gpos` (file position —
    * DETERMINISTIC across recomputes) on the parquet tier; the log
    * tier still passes `_grid` (monotonically_increasing_id), where a
    * persisted-partition eviction could in principle reassign ids —
    * the census then over-counts and flips to the rewrite regime,
    * which is the fail-safe direction (ADVICE r14, low). */
  def morExact(hide: DataFrame, tgt: DataFrame,
      grpCols: Seq[String], rowId: String = "_grid"): Boolean = {
    val hideCnt = hide.select((grpCols :+ rowId).map(col): _*)
      .distinct().groupBy(grpCols.map(col): _*).count()
      .withColumnRenamed("count", "_hc")
    val totCnt = tgt.groupBy(grpCols.map(col): _*).count()
      .withColumnRenamed("count", "_tc")
    totCnt.join(hideCnt, grpCols)
      .filter(col("_tc") =!= col("_hc")).limit(1).count() == 0L
  }

  /** Per-file/segment key masks from the collected hidden rows (column
    * 0 = the file key, columns 1.. = the merge keys). `fileKeyOf` maps
    * the collected value to the ledger name; `supported` is the tier's
    * read-side evaluability check. None = some predicate the tier
    * cannot carry → rewrite regime. */
  def masksByFile(maskRows: Seq[Row], keys: Seq[MergeKey],
      fileKeyOf: String => String,
      supported: v1.Filter => Boolean): Option[Map[String, Seq[String]]] = {
    def keyFilter(r: Row): v1.Filter =
      keys.zipWithIndex.map { case (k, i) =>
        v1.EqualTo(k.field, r.get(i + 1)): v1.Filter
      }.reduce(v1.And)
    def balancedOr(fsq: Seq[v1.Filter]): v1.Filter =
      if (fsq.length == 1) fsq.head
      else {
        val (l, r) = fsq.splitAt(fsq.length / 2)
        v1.Or(balancedOr(l), balancedOr(r))
      }
    val byFile = maskRows.groupBy(_.getString(0))
    val out = scala.collection.mutable.Map.empty[String, Seq[String]]
    val ok = byFile.forall { case (full, rows) =>
      val pred: v1.Filter =
        if (keys.length == 1)
          v1.In(keys.head.field, rows.map(_.get(1)).distinct.toArray)
        else balancedOr(rows.map(keyFilter))
      supported(pred) &&
        DeleteMasks.serialize(pred).exists { json =>
          out += (fileKeyOf(full) -> Seq(json)); true
        }
    }
    if (ok) Some(out.toMap) else None
  }

  /** UPDATE-arm images of `of` in declared field order. */
  def updateImages(of: DataFrame,
      matchedArms: Seq[MatchedArm]): Option[DataFrame] =
    matchedArms.zipWithIndex.collect { case (UpdateArm(_, outs), i) =>
      of.filter(col("_gtag") === i)
        .select(outs.map { case (n, e) => colOf(e).as(n) }: _*)
    }.reduceOption(_ unionByName _)

  /** NOT MATCHED inserts: anti-join then the first-match-wins arm
    * chain. */
  def insertsOf(src: DataFrame, tgt: DataFrame, onCol: Column,
      insertArms: Seq[InsertArm]): Option[DataFrame] =
    if (insertArms.isEmpty) None
    else {
      val srcAnti = src.join(tgt, onCol, "left_anti")
      insertArms.zipWithIndex.map { case (InsertArm(cond, outs), i) =>
        val notPrior = insertArms.take(i)
          .map(a => !coalesce(colOf(a.cond), lit(false)))
          .foldLeft(lit(true))(_ && _)
        srcAnti.filter(notPrior && coalesce(colOf(cond), lit(false)))
          .select(outs.map { case (n, e) => colOf(e).as(n) }: _*)
      }.reduceOption(_ unionByName _)
    }

  /** Rewrite-regime projection: the visible-candidate ⟕ source frame,
    * arms applied — deletes dropped, updates imaged, copies and
    * untaken rows carried in declared field order. Source-UNMATCHED
    * rows run the NOT MATCHED BY SOURCE chain (tag space shifted past
    * the matched arms). */
  def rewriteRows(visJoinedSrc: DataFrame, srcPresent: String,
      matchedArms: Seq[MatchedArm], declared: StructType,
      tColName: String => String,
      bySourceArms: Seq[MatchedArm] = Seq.empty): DataFrame = {
    val present = col(srcPresent).isNotNull
    val bsTag =
      if (bySourceArms.isEmpty) lit(-1)
      else armTag(bySourceArms, offset = matchedArms.length)
    val tagged = visJoinedSrc.withColumn("_gtag",
      when(present, armTag(matchedArms)).otherwise(bsTag))
    val allArms = matchedArms.zipWithIndex ++
      bySourceArms.zipWithIndex.map { case (a, i) =>
        (a, i + matchedArms.length)
      }
    val delTags = allArms.collect { case (_: DeleteArm, i) => i }
    val kept =
      if (delTags.isEmpty) tagged
      else tagged.filter(!col("_gtag").isin(delTags: _*))
    val updIdx = allArms.collect {
      case (UpdateArm(_, outs), i) => (i, outs.toMap)
    }
    kept.select(declared.fieldNames.toSeq.map { n =>
      updIdx.foldRight(col(tColName(n))) { case ((i, outs), alt) =>
        when(col("_gtag") === i, colOf(outs(n))).otherwise(alt)
      }.as(n)
    }: _*)
  }
}

/** The decomposed MERGE: join the (pruned, mask-visible) target with
  * the source, classify rows by arm, then either mask+append (small
  * exact deltas) or rewrite the candidate files (huge/mixed deltas) —
  * one atomic publish either way. */
case class MergeOnReadMergeCommand(tableDir: String, declared: StructType,
    onCond: ParquetMoRMerge.Cond,
    matchedArms: Seq[ParquetMoRMerge.MatchedArm],
    insertArms: Seq[ParquetMoRMerge.InsertArm],
    bySourceArms: Seq[ParquetMoRMerge.MatchedArm],
    keys: Seq[ParquetMoRMerge.MergeKey],
    srcPresent: String,
    source: LogicalPlan,
    checkCardinality: Boolean)
    extends LeafRunnableCommand {

  import ParquetMoRMerge._

  override def run(session: SparkSession): Seq[Row] =
    // each attempt re-reads the live set and prior masks; the publish
    // throws MaskConflictException when a concurrent rewrite retired a
    // candidate (or changed its masks) between classification and
    // publish
    ParquetVersions.retryOnMaskConflict() { runOnce(session) }

  private def colOf(e: Expression): Column =
    org.apache.spark.sql.GraftShims.column(e)

  private def tColName(field: String): String =
    s"_t${declared.fieldNames.indexWhere(_.equalsIgnoreCase(field))}"

  /** Positional-DV construction: per-file bitmaps of the hidden rows'
    * positions, aggregated EXECUTOR-SIDE ([[DeletionVectors.BitmapAgg]]
    * — the driver never holds raw positions, only O(touched files)
    * (rel, sidecar, cardinality) triples), sidecars written executor-
    * side under deterministic names (task retries idempotent), then
    * referenced by DV mask entries that ride the same atomic publish
    * as key masks would. The byte budget (`dv.maxBytes`) and the
    * 32-bit position domain are checked on the PERSISTED aggregate
    * BEFORE any sidecar writes, so a rejected batch leaves no debris.
    * None → the caller falls back to the group-rewrite regime. */
  private def buildDvMasks(spark: org.apache.spark.sql.classic.SparkSession,
      hide: DataFrame, dataPathPrefix: String, opId: String)
      : Option[(Map[String, Seq[String]], Seq[String])] = {
    import org.apache.spark.sql.{functions => F}
    if (!spark.conf.get(DeletionVectors.ENABLED_KEY, "true").toBoolean) return None
    val maxBytes = spark.conf.get(DeletionVectors.MAX_BYTES_KEY,
      DeletionVectors.MAX_BYTES_DEFAULT.toString).toLong
    val dvAgg = F.udaf(new DeletionVectors.BitmapAgg(),
      org.apache.spark.sql.Encoders.scalaLong)
    val grouped = hide.select(col("_gfilefull"), col("_gpos")).distinct()
      .groupBy("_gfilefull")
      .agg(dvAgg(col("_gpos")).as("_gdv"), F.max(col("_gpos")).as("_gmax"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val st = grouped.agg(F.sum(F.length(col("_gdv"))).as("_b"),
        F.max(col("_gmax")).as("_m")).collect()(0)
      if (st.isNullAt(0)) return None // empty hide set — nothing to mask
      if (st.getLong(0) > maxBytes ||
          st.getLong(1) > Int.MaxValue.toLong) return None
      val dirLocal = tableDir
      val prefixLocal = dataPathPrefix
      val opLocal = opId
      import spark.implicits._
      val refs: Array[(String, String, Long)] = grouped
        .select(col("_gfilefull"), col("_gdv"))
        .as[(String, Array[Byte])]
        .mapPartitions { it =>
          val conf = org.apache.spark.sql.GraftShims.hadoopConf()
          it.map { case (full, bytes) =>
            val p = new java.net.URI(full).getPath
            require(p.startsWith(prefixLocal + "/"),
              s"scanned file $p outside table data dir $prefixLocal")
            val rel = p.substring(prefixLocal.length + 1)
            val name = DeletionVectors.sidecarName(opLocal, rel)
            val sp = DeletionVectors.sidecarPath(dirLocal, name)
            val fsx = sp.getFileSystem(conf)
            fsx.mkdirs(sp.getParent)
            val out = fsx.create(sp, true)
            try out.write(bytes) finally out.close()
            (rel, name, DeletionVectors.deserialize(bytes).getLongCardinality)
          }
        }.collect()
      Some((refs.map { case (rel, name, card) =>
        rel -> Seq(DeletionVectors.refJson(name, card))
      }.toMap, refs.map(_._2).toSeq))
    } finally { grouped.unpersist(); () }
  }

  private def runOnce(session: SparkSession): Seq[Row] = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val base = new Path(tableDir)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = base.getFileSystem(hconf)
    val data = new Path(base, "data")
    val dataPathPrefix = fs.makeQualified(data).toUri.getPath

    val live = ParquetVersions.live(tableDir)
    val priorMasks = ParquetVersions.masksFor(tableDir, None)
    val maskCap = spark.conf.get(MAX_MASK_KEYS_KEY, "10000").toInt

    def relOf(fullFile: String): String = {
      val p = new java.net.URI(fullFile).getPath
      require(p.startsWith(dataPathPrefix + "/"),
        s"scanned file $p outside table data dir $dataPathPrefix")
      p.substring(dataPathPrefix.length + 1)
    }

    // --- source, renamed positionally to _sN --------------------------
    val srcRaw = org.apache.spark.sql.GraftShims.ofRows(spark, source)
    val src = srcRaw.toDF(srcRaw.columns.indices.map(i => s"_s$i"): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    var tgt: DataFrame = null
    var joined: DataFrame = null
    try {
      val srcKeyRows: Option[Array[Row]] =
        MoRMergeKernel.srcKeyRows(src, keys, math.max(maskCap,
          spark.conf.get(PREFILTER_KEYS_KEY,
            PREFILTER_KEYS_DEFAULT.toString).toInt))

      // --- target: mask-visible rows + originating file ---------------
      // (the per-scan file column binds before the union, so it stays
      // within the scan's stage; the IN prefilter pushes down to the
      // parquet footers and drops untouched files with zero row I/O)
      val tSelect = declared.fieldNames.toSeq.zipWithIndex.map {
        case (n, i) => col(n).as(s"_t$i")
      } :+ col("_gfilefull") :+ col("_gpos")
      // _gpos: the row's position in its file — both the DV read
      // side (prior positional masks drop here) and the DV WRITE
      // side (the hidden rows' positions become the new bitmaps).
      // Renames.read is the rename-aware reader (per-file epoch
      // resolution); on a rename-free table it is the same plain
      // declared-schema scan as before. Masked files read in ONE scan
      // with the per-file mask DISPATCH ([[DeleteMasks
      // .FileDispatchVisible]]) — grouping by identical mask set
      // planned O(distinct mask sets) scans, which after a trickle
      // MERGE (every file its own key mask) meant one scan PER FILE.
      def readClean(ns: Seq[String]): DataFrame =
        Renames.read(spark, declared, data, ns)
      def readMasked(ns: Seq[String]): DataFrame = {
        val children: Seq[Expression] =
          UnresolvedAttribute(Seq("_gfilefull")) +:
            UnresolvedAttribute(Seq("_gpos")) +:
            declared.fieldNames.toSeq.map(n => UnresolvedAttribute(Seq(n)))
        Renames.read(spark, declared, data, ns)
          .filter(colOf(DeleteMasks.FileDispatchVisible(tableDir,
            dataPathPrefix, priorMasks.view.filterKeys(ns.toSet).toMap,
            declared, children)))
      }
      val emptyTgt = {
        val sch = StructType(declared.fields.zipWithIndex.map { case (f, i) =>
          StructField(s"_t$i", f.dataType, f.nullable)
        } :+ StructField("_gfilefull", StringType)
          :+ StructField("_gpos", LongType))
        spark.createDataFrame(new java.util.ArrayList[Row](), sch)
      }
      val tgtBase: DataFrame = {
        val (masked, clean) =
          live.partition(n => priorMasks.get(n).exists(_.nonEmpty))
        val parts =
          (if (clean.nonEmpty) Seq(readClean(clean)) else Seq.empty) ++
            (if (masked.nonEmpty) Seq(readMasked(masked)) else Seq.empty)
        parts.map(_.select(tSelect: _*))
          .reduceOption(_ unionByName _).getOrElse(emptyTgt)
      }
      // NOT MATCHED BY SOURCE arms scope the WHOLE source-unmatched
      // complement, so the source-key prefilter must not prune the
      // target when any exist (their candidates are exactly the rows
      // the prefilter would drop)
      val prefilter: Option[Column] =
        if (bySourceArms.nonEmpty) None
        else srcKeyRows.map(
          MoRMergeKernel.inSetPrefilter(_, keys, declared, tColName))
      // persist the PREFILTERED target: the join, the mask-exactness
      // census, and the NOT-MATCHED anti-join each consume it, and
      // without the cache each one re-scans the table (observed: p32
      // paid the full scan 3×). Only when the IN prefilter bounds it —
      // an uncapped source (rewrite regime territory) means `tgt` is
      // the whole table, and caching 100 TB to evict it two jobs later
      // costs more than the second scan. Row identity on this tier is
      // (`_gfilefull`, `_gpos`) — deterministic across recomputes
      // (ADVICE r14: the previous monotonically_increasing_id `_grid`
      // could reassign on persisted-partition eviction).
      val tgt0 = prefilter.fold(tgtBase)(tgtBase.filter)
      tgt = if (prefilter.isDefined)
        tgt0.persist(StorageLevel.MEMORY_AND_DISK) else tgt0

      val onCol = colOf(onCond.e)
      joined = tgt.join(src, onCol, "inner").persist(StorageLevel.MEMORY_AND_DISK)

      if (checkCardinality)
        MoRMergeKernel.requireCardinality(joined, Seq("_gfilefull", "_gpos"))

      // --- arm classification (first-match-wins, null ≠ true) ---------
      val classified =
        joined.withColumn("_gtag", MoRMergeKernel.armTag(matchedArms))
      val hide = MoRMergeKernel.hideOf(classified, matchedArms)

      // the NOT MATCHED BY SOURCE complement, classified by its own
      // chain (tags 0-based within bySourceArms — the two families
      // never share a frame outside rewriteRows). Candidates prefilter
      // on the OR of the arm conditions BEFORE the anti join — they
      // are target-only predicates, so they push into the scan
      // (footer zone maps) and the anti-join shuffle carries only
      // condition-matching rows, not the whole table; a row matching
      // no arm is carried unchanged either way.
      val bsClassified: Option[DataFrame] =
        if (bySourceArms.isEmpty) None
        else {
          val anyArm = bySourceArms
            .map(a => coalesce(colOf(a.cond), lit(false)))
            .reduce(_ || _)
          Some(tgt.filter(anyArm).join(src, onCol, "left_anti")
            .withColumn("_gtag", MoRMergeKernel.armTag(bySourceArms)))
        }
      val bsHide: Option[DataFrame] =
        bsClassified.map(MoRMergeKernel.hideOf(_, bySourceArms))

      val keyTCols = keys.map(k => tColName(k.field))
      // ONE hidden-row set feeds the cap probe, the exactness census,
      // the DV builder and the candidate list — matched and by-source
      // arms hide through the same machinery
      val hideCols = (col("_gfilefull") +: keyTCols.map(col)) :+ col("_gpos")
      val hideAll: DataFrame = bsHide.foldLeft(hide.select(hideCols: _*)) {
        (acc, b) => acc.unionByName(b.select(hideCols: _*))
      }
      val maskRows = hideAll
        .select((col("_gfilefull") +: keyTCols.map(col)): _*)
        .distinct().limit(maskCap + 1).collect()

      // mask regime is exact only when every masked (file, key) is
      // FULLY hidden: any same-key row in the same file that stays
      // visible (copy arm, or unmatched under a residual ON conjunct)
      // forces the rewrite regime
      val morFits = maskRows.length <= maskCap
      val morExact = morFits && (maskRows.isEmpty ||
        MoRMergeKernel.morExact(hideAll, tgt, "_gfilefull" +: keyTCols,
          rowId = "_gpos"))

      // per-file masks; a value the codec cannot carry (shouldn't
      // happen — key types are vetted at intercept) forces the rewrite
      val masksByFile: Option[Map[String, Seq[String]]] =
        if (!morFits || !morExact) None
        else MoRMergeKernel.masksByFile(maskRows.toSeq, keys,
          fileKeyOf = relOf, supported = ParquetDelete.supported(declared))

      // --- the appends shared by both regimes --------------------------
      val opId = java.util.UUID.randomUUID().toString.take(8)
      def updateImages(of: DataFrame): Option[DataFrame] =
        MoRMergeKernel.updateImages(of, matchedArms)
      val inserts: Option[DataFrame] =
        MoRMergeKernel.insertsOf(src, tgt, onCol, insertArms)

      /** Route `df` into the table's layout under the `rlo-mrg`
        * maintenance prefix; returns the data/-relative names. */
      def appendRouted(df: DataFrame, group: Int): Seq[String] = {
        val bucketSpec = ParquetBucketing.readSpec(tableDir)
        val partLayout = PartitionSpecs.read(tableDir)
        val written = Seq.newBuilder[String]
        bucketSpec match {
          case Some(spec) =>
            val staging = new Path(base, s".mormrg-$opId-$group")
            fs.delete(staging, true)
            df.withColumn("_gb", pmod(hash(col(spec.col)), lit(spec.n)))
              .repartition(spec.n, col(spec.col))
              .write.partitionBy("_gb").mode("overwrite")
              .parquet(staging.toString)
            var i = 0
            fs.listStatus(staging).foreach { d =>
              if (d.isDirectory && d.getPath.getName.startsWith("_gb=")) {
                val tag = d.getPath.getName.stripPrefix("_gb=").toInt
                fs.listStatus(d.getPath).foreach { s =>
                  if (s.isFile && s.getPath.getName.endsWith(".parquet") &&
                      s.getLen > 0) {
                    val rows =
                      try ParquetFooterStats.get(hconf, s.getPath, s.getLen,
                        s.getModificationTime).rowCount
                      catch { case scala.util.control.NonFatal(_) => 1L }
                    if (rows > 0L) {
                      val rel = f"rlo-mrg-$opId-$group-$i%05d-b$tag.parquet"
                      if (!fs.rename(s.getPath, new Path(data, rel))) {
                        throw new java.io.IOException(
                          s"MergeOnReadMerge: rename ${s.getPath} failed")
                      }
                      written += rel
                      i += 1
                    }
                  }
                }
              }
            }
            fs.delete(staging, true)
          case None =>
            // partition-routed (or flat) executor-side staging — the
            // same write discipline as partition evolution; inserts may
            // open NEW partitions, updates may MOVE rows across them
            val staging = new Path(base, s".mormrg-$opId-$group")
            fs.delete(staging, true)
            val clustered = partLayout match {
              case Some(ps) =>
                df.repartition(PartitionSpecs.clusterColumnsFor(ps): _*)
              case None => df
            }
            val ordered = clustered.select(
              declared.fieldNames.toSeq.map(col): _*)
            val staged = PartitionEvolution.stageRouted(spark, ordered,
              declared, partLayout, staging.toString)
            staged.zipWithIndex.foreach { case ((path, relDir), j) =>
              val name = f"rlo-mrg-$opId-$group-$j%05d.parquet"
              val rel = if (relDir.isEmpty) name else s"$relDir/$name"
              val to = new Path(data, rel)
              fs.mkdirs(to.getParent)
              if (!fs.rename(new Path(path), to)) {
                throw new java.io.IOException(
                  s"MergeOnReadMerge: rename $path -> $to failed")
              }
              written += rel
            }
            fs.delete(staging, true)
        }
        written.result()
      }

      // ---- positional-DV fallback (VERDICT r13/r14 #1): when key
      // masks cannot carry the delta (> maxMaskKeys, or mixed same-key
      // visibility), hide the rows by POSITION instead of rewriting
      // the candidate files — positions identify rows exactly, so
      // neither downgrade reason applies. None = DV disabled, over the
      // sidecar byte budget, or a file past the 2^31-row domain →
      // group rewrite as before.
      val dvMasks: Option[(Map[String, Seq[String]], Seq[String])] =
        if (masksByFile.isDefined) None
        else buildDvMasks(spark, hideAll, dataPathPrefix, opId)

      // by-source UPDATE images (target-only projections over the
      // anti-join frame) append alongside the matched images
      val bsImages: Option[DataFrame] = bsClassified.flatMap(
        MoRMergeKernel.updateImages(_, bySourceArms))

      masksByFile.map((_, Seq.empty[String])).orElse(dvMasks) match {
        case Some((masks, sidecars)) =>
          // ---- MASK/DV regime ---------------------------------------
          val appended =
            (updateImages(classified).toSeq ++ bsImages.toSeq ++ inserts.toSeq)
            .reduceOption(_ unionByName _)
          val written = appended.fold(Seq.empty[String])(appendRouted(_, 0))
          if (masks.isEmpty && written.isEmpty) return Seq.empty // no-op
          try {
            // guarded like the rewrite regime (ADVICE r13, medium): a
            // concurrent lightweight DELETE masking a matched key in a
            // candidate between classification and publish must abort —
            // the appended unmasked image would resurrect the deleted
            // row in either commit order. Retirement alone is already a
            // ledger-level conflict (merged() throws for retired mask
            // targets); the guard adds mask-DRIFT detection.
            ParquetVersions.commitGuarded(tableDir, None, masks,
              ParquetVersions.guardFor(masks.keySet, priorMasks)) { liveNow =>
              (liveNow ++ written).distinct.sorted
            }
          } catch {
            case e: VersionLedger.MaskConflictException =>
              // a concurrent rewrite retired a masked candidate: the
              // retry re-classifies and re-appends under a fresh opId —
              // reclaim this attempt's files (and unpublished DV
              // sidecars) instead of orphaning them
              written.foreach(n => fs.delete(new Path(data, n), false))
              sidecars.foreach(n => DeletionVectors.delete(fs, tableDir, n))
              throw e
          }
          if (masks.nonEmpty) MaskPressure.afterMaskPublish(spark, tableDir)
        case None =>
          // ---- GROUP-REWRITE regime ---------------------------------
          val candRels = hideAll.select("_gfilefull").distinct()
            .collect().map(r => relOf(r.getString(0))).toSeq.sorted
          val candSet = candRels.toSet
          // rewritten content: visible candidate rows, left-joined to
          // the source, arms applied (deletes dropped, updates imaged,
          // copies carried; source-unmatched rows run the by-source
          // chain)
          val vis = DeleteMasks
            .readVisible(spark, declared, data, candRels, priorMasks)
            .select(declared.fieldNames.toSeq.zipWithIndex.map {
              case (n, i) => col(n).as(s"_t$i")
            }: _*)
          val rewritten = MoRMergeKernel.rewriteRows(
            vis.join(src, onCol, "left_outer"), srcPresent, matchedArms,
            declared, tColName, bySourceArms)
          val newContent =
            if (candRels.isEmpty) inserts
            else (Seq(rewritten) ++ inserts.toSeq).reduceOption(_ unionByName _)
          val written = newContent.fold(Seq.empty[String])(appendRouted(_, 0))
          if (candRels.isEmpty && written.isEmpty) return Seq.empty // no-op
          try {
            ParquetVersions.commitGuarded(tableDir, None, Map.empty,
              ParquetVersions.guardFor(candSet,
                priorMasks.view.filterKeys(candSet).toMap)) { liveNow =>
              (liveNow.filterNot(candSet) ++ written).distinct.sorted
            }
          } catch {
            case e: VersionLedger.MaskConflictException =>
              written.foreach(n => fs.delete(new Path(data, n), false))
              throw e
          }
      }
      Seq.empty
    } finally {
      if (joined != null) joined.unpersist()
      if (tgt != null && tgt.storageLevel != StorageLevel.NONE) tgt.unpersist()
      src.unpersist()
      ()
    }
  }
}
