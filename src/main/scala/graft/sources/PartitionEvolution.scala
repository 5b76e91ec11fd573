package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** PARTITION EVOLUTION for catalog parquet tables (VERDICT r10 #1's
  * "partition evolution interacts safely with time travel" clause):
  * change a table's partition layout WITHOUT rewriting history.
  *
  * The design rests on one property the layout already has: the spec
  * is ADVISORY for reads. A file whose relative path the CURRENT spec
  * does not describe (old-layout dirs, pre-partitioning root files, a
  * row-level rewrite that landed at the root) is simply never
  * dir-pruned — [[PartitionSpecs.statsOfRelPath]] returns None and the
  * file is always kept, footer stats still prune it. So:
  *
  *   - `CALL set_partition_spec(table, spec)` swaps `_partition.json`
  *     atomically; NEW writes route by the new spec, every existing
  *     file keeps reading exactly as before, and time travel is
  *     untouched (version membership is explicit names — layout never
  *     enters into it);
  *   - `CALL repartition_table(table)` migrates LAZILY: it rewrites
  *     only the live files that do NOT conform to the current spec
  *     (mask-aware visible rows, routed through the same per-row
  *     partition evaluation as the write path) and retires them in ONE
  *     version publish. Conforming files are untouched — write
  *     amplification is proportional to the non-conforming fraction,
  *     the rebucket-repair contract applied to partition layouts. It
  *     also heals the documented root-landing of copy-on-write
  *     row-level rewrites on partitioned tables.
  *
  * Reference posture: ClickHouse's MergeTree re-partitioning is a
  * CREATE+INSERT+swap; this is the lake-native lazy equivalent. */
object PartitionEvolution {

  /** Swap the spec. Returns (old, new) rendered as strings. The table
    * is auto-upgraded to versioned first — every partitioned write
    * path assumes the ledger gate. A bucket layout is mutually
    * exclusive, same as CREATE TABLE. */
  def setSpec(spark: SparkSession, tableDir: String,
      specStr: String): (String, String) =
    // the lease serializes spec swaps (replace() completes a crashed
    // predecessor's swap under the assumption it is the only mutator)
    MaintenanceLease.withLease(tableDir) {
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table")
    require(ParquetBucketing.readSpec(tableDir).isEmpty,
      "partitioning and bucket layouts are mutually exclusive — " +
        "drop the bucket spec first")
    val schema = SchemaManifest.read(tableDir, "set_partition_spec")
    val next = PartitionSpecs.parse(specStr, schema)
    if (!ParquetVersions.enabled(tableDir)) ParquetVersions.enable(tableDir)
    val old = PartitionSpecs.read(tableDir)
    PartitionSpecs.replace(tableDir, next)
    (render(old), render(next))
  }

  private def render(spec: Option[PartitionSpecs.Spec]): String = spec match {
    case None => "none"
    case Some(s) => s.fields.map { f =>
      f.transform match {
        case "identity" => f.col
        case "bucket" => s"bucket(${f.n.getOrElse(0)}, ${f.col})"
        case t => s"$t(${f.col})"
      }
    }.mkString(", ")
  }

  /** Lazy migration: rewrite live files that do not conform to the
    * CURRENT spec into it. Returns (files rewritten, rows, files
    * written). Serialized against other maintainers; masked rows are
    * not resurrected and consumed masks retire with their files. */
  def repartitionTable(spark: SparkSession,
      tableDir: String): (Long, Long, Long) =
    MaintenanceLease.withLease(tableDir) {
    require(ParquetVersions.enabled(tableDir),
      s"repartition_table needs a versioned table — CALL enable_versioning first")
    ParquetVersions.catchUp(tableDir)
    val schema = SchemaManifest.read(tableDir, "repartition_table")
    val spec = PartitionSpecs.read(tableDir)
    val live = ParquetVersions.latest(tableDir).get._2
    def conforms(rel: String): Boolean = spec match {
      case None => !rel.contains("/")
      case Some(ps) =>
        try PartitionSpecs.statsOfRelPath(ps, schema, rel).isDefined
        catch { case scala.util.control.NonFatal(_) => false }
    }
    val inputs = live.filterNot(conforms)
    if (inputs.isEmpty) return (0L, 0L, 0L)

    val base = new Path(tableDir)
    val data = new Path(base, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // mask-conflict retry (ADVICE r11): masks re-read per attempt and
    // the publish guarded against concurrent merge-on-read DML
    ParquetVersions.retryOnMaskConflict() {
    val masks = ParquetVersions.masksFor(tableDir, None)
    val rows = DeleteMasks.readVisible(spark, schema, data, inputs, masks)
    val nRows = rows.count()
    // cluster by the partition columns first — same rationale as the
    // write path's required distribution: ~one file per target
    // partition, not (tasks × partitions)
    val clustered = spec match {
      case Some(ps) => rows.repartition(PartitionSpecs.clusterColumnsFor(ps): _*)
      case None => rows
    }
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(base, s".repart-$opId")
    fs.delete(staging, true)
    val staged = stageRouted(spark, clustered, schema, spec, staging.toString)
    val written = Seq.newBuilder[String]
    try {
      staged.zipWithIndex.foreach { case ((path, relDir), i) =>
        // compact- prefix: an already-registered maintenance name —
        // ledger-gated invisible until the publish, vacuumable on crash
        val name = f"compact-repart-$opId-$i%05d.parquet"
        val rel = if (relDir.isEmpty) name else s"$relDir/$name"
        val to = new Path(data, rel)
        fs.mkdirs(to.getParent)
        if (!fs.rename(new Path(path), to)) {
          throw new java.io.IOException(s"repartition stage rename failed: $rel")
        }
        written += rel
      }
    } finally fs.delete(staging, true)
    val out = written.result()
    val inputSet = inputs.toSet
    try {
      ParquetVersions.commitGuarded(tableDir, None, Map.empty,
        ParquetVersions.guardFor(inputSet, masks)) { prev =>
        (prev.filterNot(inputSet) ++ out).distinct.sorted
      }
    } catch {
      case e: VersionLedger.MaskConflictException =>
        out.foreach(n => fs.delete(new Path(data, n), false))
        throw e
    }
    (inputs.size.toLong, nRows, out.size.toLong)
    }
  }

  /** Executor-side partition-routed staging of a DataFrame: each task
    * writes one staged file per partition dir it encounters (the
    * [[PartitionedStageWriterFactory]] discipline on a maintenance
    * read), returning (staged path, relative dir) pairs. */
  private[sources] def stageRouted(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame,
      schema: org.apache.spark.sql.types.StructType,
      spec: Option[PartitionSpecs.Spec],
      stagingDir: String): Seq[(String, String)] = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val job = org.apache.hadoop.mapreduce.Job.getInstance(
      classic.sessionState.newHadoopConf())
    val owf = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat().prepareWrite(classic, job, Map.empty, schema)
    val conf = new SerializableConfiguration(job.getConfiguration)
    val specV = spec
    val schemaV = schema
    // dir-contiguous task input → ONE open parquet writer at a time
    // ([[PartitionSpecs.sortColumnsFor]] — dozens of concurrently-open
    // writers serialize on parquet's global MemoryManager lock); the
    // writer below still tolerates non-contiguous input by keeping
    // revisited dirs' writers open
    val sortCols = specV.toSeq.flatMap(PartitionSpecs.sortColumnsFor)
    val shaped =
      if (sortCols.isEmpty) df else df.sortWithinPartitions(sortCols: _*)
    shaped.queryExecution.toRdd
      .mapPartitionsWithIndex { (pid, it) =>
        import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
        import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
        // task-ATTEMPT-unique staged names: a retried or speculative
        // attempt must never write the same staged path as a zombie
        // twin (the PartitionedStageWriterFactory discipline)
        val attemptId = org.apache.spark.TaskContext.get().taskAttemptId()
        val ctx = new TaskAttemptContextImpl(conf.value,
          new TaskAttemptID(new TaskID(new JobID("graft-repart", 0),
            TaskType.MAP, pid), (attemptId % Int.MaxValue).toInt))
        val dirOf: org.apache.spark.sql.catalyst.InternalRow => String =
          specV match {
            case Some(ps) => PartitionSpecs.rowDirFn(ps, schemaV)
            case None => _ => ""
          }
        // one shared adaptive-writer state machine with the DSv2 stage
        // writer ([[RoutedStageWriter]]) — one open writer per task on
        // sorted runs, map-regime fallback on dir revisits
        val routed = new RoutedStageWriter(owf, schemaV, ctx, dirOf,
          (relDir, k) =>
            if (relDir.isEmpty) s"$stagingDir/stage-$pid-$attemptId-$k.parquet"
            else s"$stagingDir/$relDir/stage-$pid-$attemptId-$k.parquet")
        try {
          it.foreach(routed.write)
        } catch {
          case t: Throwable =>
            routed.closeQuietly()
            throw t
        }
        Iterator.single(routed.finish())
      }.collect().toSeq.flatten
  }
}
