package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** `OPTIMIZE ... ZORDER BY` for catalog parquet tables: rewrites the
  * current snapshot through [[graft.operators.Layout.zorder]] so the
  * footer-stats skip index ([[StatsPrunedFileIndex]]) serves selective
  * probes on EVERY participating column, and publishes the swap as one
  * ledger commit — pinned readers keep their snapshot, crashed runs
  * leave only unreferenced files for vacuum.
  *
  * Cost model (the honest 100 TB accounting): one sampled
  * approxQuantile pass for all k columns' range boundaries, one count,
  * then THE rewrite — a single `repartitionByRange` shuffle of the
  * live data, the unavoidable price of any clustering layout. Run it
  * like compaction: periodically, after bulk ingest, not per-query.
  *
  * Refused on bucketed tables: a Z-order rewrite re-clusters rows
  * across files, which would break the `.bucketspec` co-location
  * contract (the two layouts optimize different access paths — joins
  * vs multi-dimensional probes — and a table pins at most one).
  *
  * On a PARTITIONED table the rewrite runs PARTITION-WISE: each
  * partition's live files re-cluster among themselves and the outputs
  * stay inside their directory (`files` = files per partition). That
  * composes the two pruning tiers instead of trading them — partition
  * dirs prune first (zero I/O), then the Z-order footer bounds prune
  * within the surviving partitions — and the range boundaries are
  * computed per partition, so local clustering adapts to local value
  * distributions. Partitions rewrite concurrently
  * ([[Compaction.inParallel]]); ONE ledger commit publishes the whole
  * swap atomically.
  *
  * Reference posture: layout maintenance is what ClickHouse's
  * `ORDER BY` table key + background merges do for the reference's
  * warehouse — per MergeTree partition, exactly this shape; this is
  * the Spark-native, SQL-callable equivalent. */
object ParquetZorder {

  /** Returns (filesBefore, rowsRewritten, filesAfter). */
  def zorderTable(spark: SparkSession, tableDir: String, cols: Seq[String],
      files: Int): (Long, Long, Long) =
    // serialized against other maintainers ([[MaintenanceLease]])
    MaintenanceLease.withLease(tableDir) {
    require(cols.nonEmpty, "zorder_table: need at least one column")
    require(files > 0, "zorder_table: files must be positive")
    require(ParquetBucketing.readSpec(tableDir).isEmpty,
      s"$tableDir pins a bucket layout — zorder would break join co-location; " +
        "drop the bucket spec first if probe locality matters more")
    require(ParquetVersions.enabled(tableDir),
      s"zorder_table needs a versioned table — CALL enable_versioning first")
    ParquetVersions.catchUp(tableDir) // pending appends join the ledger
    val live = ParquetVersions.latest(tableDir).get._2
    if (live.isEmpty) return (0L, 0L, 0L)
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = SchemaManifest.read(tableDir, "zorder_table")

    // one group per partition dir ("" = the flat layout's single group)
    val groups: Seq[(String, Seq[String])] =
      live.groupBy(PartitionSpecs.dirOfRel).toSeq.sortBy(_._1)

    // mask-conflict retry (ADVICE r11): masks re-read per attempt, the
    // publish guarded — a merge-on-read DELETE/UPDATE landing on an
    // input mid-rewrite re-runs the rewrite under the fresh masks
    ParquetVersions.retryOnMaskConflict() {
    val masks = ParquetVersions.masksFor(tableDir, None)
    val opId = java.util.UUID.randomUUID().toString.take(8)

    val perGroup: Seq[(Long, Seq[String])] =
      graft.sources.Compaction.inParallel(groups.zipWithIndex) {
        case ((relDir, members), g) =>
          // mask-aware read ([[DeleteMasks]]): the rewrite keeps only
          // visible rows and retires the inputs, purging their
          // merge-on-read deletes
          val rows = DeleteMasks.readVisible(spark, schema, data, members, masks)
          val nRows = rows.count()
          val staging = new Path(tableDir, s".zorder-$opId-$g")
          fs.delete(staging, true)
          graft.operators.Layout.zorder(rows, cols, files)
            .write.parquet(staging.toString)
          val outNames = Seq.newBuilder[String]
          try {
            var i = 0
            fs.listStatus(staging).sortBy(_.getPath.getName).foreach { f =>
              if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
                val name = f"zorder-$opId-$g-$i%05d.parquet"
                val rel = if (relDir.isEmpty) name else s"$relDir/$name"
                val to = new Path(data, rel)
                fs.mkdirs(to.getParent)
                if (!fs.rename(f.getPath, to)) {
                  throw new java.io.IOException(s"zorder stage rename failed: $rel")
                }
                outNames += rel
                i += 1
              }
            }
          } finally fs.delete(staging, true)
          (nRows, outNames.result())
      }

    val out = perGroup.flatMap(_._2)
    val nRows = perGroup.map(_._1).sum
    try {
      ParquetVersions.commitGuarded(tableDir, None, Map.empty,
        ParquetVersions.guardFor(live.toSet, masks)) { prev =>
        (prev.filterNot(live.toSet) ++ out).distinct.sorted
      }
    } catch {
      case e: VersionLedger.MaskConflictException =>
        out.foreach(n => fs.delete(new Path(data, n), false))
        throw e
    }
    (live.size.toLong, nRows, out.size.toLong)
    }
  }
}
