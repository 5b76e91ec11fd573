package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.write.RowLevelOperation
import org.apache.spark.sql.execution.command.LeafRunnableCommand

/** MERGE-ON-READ `UPDATE` for the ENTITY LOG — the log tier's twin of
  * [[ParquetMoRUpdate]], completing the lightweight-DML symmetry
  * between both storage tiers (the reference's warehouse mutates rows
  * server-side between its test cases, `hashes_test.go:235-239`):
  *
  *   - every live segment whose zone stats cannot EXCLUDE the
  *     condition gets the predicate attached as a delete mask in the
  *     ledger payload (each segment stays byte-identical);
  *   - the updated images — visible rows where the condition is TRUE,
  *     SET projection applied — append as NEW segments written through
  *     the log's own staged writers (exact stats sidecars, bucket tags
  *     on bucketed logs), renamed in ledger-gated invisible;
  *   - ONE guarded version publish carries masks + membership; write
  *     amplification is O(matched rows), not O(candidate segments).
  *
  * Interception is the same optimizer swap as the parquet tier: the
  * analyzer rewrites `UpdateTable` on the log's
  * `SupportsRowLevelOperations` into the group-based `ReplaceData`;
  * this rule matches the LOG operation with command UPDATE, re-derives
  * the SET projection from the update `Project`, and replaces the plan
  * with [[LogMoRUpdateCommand]]. Anything outside the mask machinery's
  * reach — un-versioned log, nondeterministic condition, a shape
  * [[DeleteMasks.serialize]] or [[LogDelete.supported]] refuses, a SET
  * referencing non-log columns — leaves the plan untouched and the
  * copy-on-write group rewrite runs unchanged. */
object LogMoRUpdate {

  object InterceptRule extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan = plan match {
      case rd: ReplaceData => rewrite(rd).getOrElse(rd)
      case other => other
    }

    private def rewrite(rd: ReplaceData): Option[LogicalPlan] = {
      val op = rd.operation match {
        case l: LogRowLevelOperation
            if l.command() == RowLevelOperation.Command.UPDATE => l
        case _ => return None
      }
      if (conf.getConfString(DeleteMasks.MODE_KEY, "copy-on-write")
          != "merge-on-read") return None
      val dir = op.path
      if (!LogVersions.enabled(dir)) return None
      if (!rd.condition.deterministic) return None
      val schema = LimitHashLog.SCHEMA
      val names = schema.fieldNames.map(_.toLowerCase).toSet
      for {
        filter <- ParquetMoRUpdate.InterceptRule.toV1(rd.condition)
        // the mask must be BOTH serializable and evaluable by the
        // log's raw-field evaluator (read-side consistency)
        if LogDelete.supported(filter)
        maskJson <- DeleteMasks.serialize(filter)
        if DeleteMasks.references(maskJson).forall(r => names(r.toLowerCase))
        extracted <- ParquetMoRUpdate.InterceptRule
          .setProjection(rd, schema, names)
        (sets, _) = extracted
      } yield LogMoRUpdateCommand(dir, maskJson, sets)
    }
  }

  def register(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(InterceptRule)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ InterceptRule
    }
  }

  /** Append `images` as NEW segments through the log's own staged
    * writers (exact stats sidecars, bucket tags on bucketed logs) and
    * rename them to `segment-<queryId>-…` committed names —
    * ledger-gated invisible until the caller's publish references
    * them. Returns the added segment names. Shared by the
    * merge-on-read UPDATE and MERGE ([[LogMoRMerge]]) commands. */
  private[sources] def appendImages(
      spark: org.apache.spark.sql.classic.SparkSession,
      dir: String, images: org.apache.spark.sql.DataFrame,
      queryId: String): Seq[String] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucket = LogBucketing.readSpec(dir)
    val factory = new LogWriterFactory(dir, queryId, bucket)
    val messages = images.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val attempt = org.apache.spark.TaskContext.get().taskAttemptId()
        val w = factory.createWriter(pid, attempt)
        try {
          it.foreach(w.write)
          Iterator.single(w.commit())
        } catch {
          case t: Throwable => w.abort(); throw t
        }
      }.collect()

    val manifest = Map.newBuilder[String, SegmentStats]
    val added = Seq.newBuilder[String]
    def rename(staged: String, to: Path, stats: Option[SegmentStats]): Unit = {
      if (fs.exists(to)) fs.delete(to, false) // retried stage: replace
      if (!fs.rename(new Path(staged), to)) {
        throw new java.io.IOException(
          s"LogMoRUpdate.appendImages: rename $staged -> $to failed")
      }
      stats.foreach(st => manifest += (to.getName -> st))
      added += to.getName
    }
    messages.foreach {
      case LogCommit(staged, pid, stats) if staged.nonEmpty =>
        rename(staged, new Path(base, s"segment-$queryId-$pid"), stats)
      case LogBucketedCommit(parts, pid) =>
        parts.foreach { case (staged, b, st) =>
          rename(staged, new Path(base, s"segment-$queryId-$pid-b$b"), Some(st))
        }
      case _ => () // empty partition: nothing staged
    }
    val entries = manifest.result()
    if (entries.nonEmpty) LimitHashLog.writeManifest(fs, base, queryId, entries)
    added.result()
  }

  /** Reclaim segments a conflicted publish attempt appended (the retry
    * re-appends under a fresh opId — without this they orphan until
    * vacuum). Best-effort: a missing file is already gone. */
  private[sources] def deleteAppended(
      spark: org.apache.spark.sql.classic.SparkSession,
      dir: String, names: Seq[String]): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    names.foreach { n =>
      try fs.delete(new Path(base, n), false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }
}

/** The decomposed log UPDATE: zone-classify → read matched visible
  * rows through the (mask-aware) scan → apply SET → append staged
  * segments → publish masks + membership atomically. */
case class LogMoRUpdateCommand(dir: String, maskJson: String,
    sets: Seq[(String, Expression)])
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] =
    ParquetVersions.retryOnMaskConflict() { runOnce(session) }

  private def runOnce(session: SparkSession): Seq[Row] = {
    val spark = session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val schema = LimitHashLog.SCHEMA
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(DeleteMasks.deserialize(maskJson))

    // zone classification (same three-valued proof as DELETE): Clean
    // segments are untouched with zero I/O; everything else is a
    // candidate — masked, and its matched rows re-imaged
    val candidates = LimitHashLog.segmentsWithStats(dir).collect {
      case (f, _, st) if LogDelete.classify(filters, st) != LogDelete.Clean =>
        new Path(f).getName
    }
    if (candidates.isEmpty) return Seq.empty // proof: no row matches

    // prior masks observed at classification — the publish guard's
    // baseline (the scan below applies the same masks at parse)
    val priorMasks: Map[String, Seq[String]] =
      LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2

    // matched visible rows of the candidates, via the scan itself
    // (prior masks apply automatically; `segments` restricts the
    // snapshot to the candidate set)
    val matched = !DeleteMasks.visibleColumn(schema, Seq(maskJson))
    val images = spark.read.format(LimitHashLog.FORMAT)
      .option("segments", candidates.mkString(","))
      .load(dir)
      .filter(matched)
      .select(sets.map { case (n, e) =>
        org.apache.spark.sql.GraftShims.column(e).as(n)
      }: _*)

    // stage the images through the log's own writers (exact stats,
    // bucket tags on bucketed logs), executor-side
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val queryId = s"rlo-upd-$opId"
    // ONE visibility event: the condition lands as a mask on every
    // candidate segment, the images join the membership. A concurrent
    // rewrite retiring a candidate throws MaskConflictException (the
    // retry re-classifies); appended images carry NO mask — a
    // self-referential SET cannot re-delete its own output. Guarded
    // (ADVICE r13, medium): a concurrent lightweight DELETE masking a
    // row of a candidate between the image read and this publish also
    // aborts — the appended unmasked image would resurrect it.
    val addedNames = LogMoRUpdate.appendImages(spark, dir, images, queryId)
    try {
      LogVersions.commitGuarded(dir,
        candidates.map(_ -> Seq(maskJson)).toMap,
        ParquetVersions.guardFor(candidates.toSet, priorMasks)) { prev =>
        (prev ++ addedNames).distinct
      }
    } catch {
      case e: VersionLedger.MaskConflictException =>
        // a concurrent rewrite retired a candidate: the retry
        // re-classifies and re-appends under a fresh opId — reclaim
        // this attempt's image segments instead of orphaning them
        LogMoRUpdate.deleteAppended(spark, dir, addedNames)
        throw e
    }
    MaskPressure.afterMaskPublish(spark, dir)
    Seq.empty
  }
}
