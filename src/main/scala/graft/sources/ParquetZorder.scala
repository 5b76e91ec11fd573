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
  * Reference posture: layout maintenance is what ClickHouse's
  * `ORDER BY` table key + background merges do for the reference's
  * warehouse; this is the Spark-native, SQL-callable equivalent. */
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
    require(!PartitionSpecs.exists(tableDir),
      s"$tableDir is partitioned — a global Z-order rewrite would flatten the " +
        "partition layout; compact_table handles partition-wise maintenance")
    require(ParquetVersions.enabled(tableDir),
      s"zorder_table needs a versioned table — CALL enable_versioning first")
    ParquetVersions.catchUp(tableDir) // pending appends join the ledger
    val live = ParquetVersions.latest(tableDir).get._2
    if (live.isEmpty) return (0L, 0L, 0L)
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val schema = SchemaManifest.read(tableDir, "zorder_table")
    // mask-aware read ([[DeleteMasks]]): the rewrite keeps only visible
    // rows and retires the inputs, purging their merge-on-read deletes
    val rows = DeleteMasks.readVisible(spark, schema, data, live,
      ParquetVersions.masksFor(tableDir, None))
    val nRows = rows.count()
    val opId = java.util.UUID.randomUUID().toString.take(8)
    val staging = new Path(tableDir, s".zorder-$opId")
    graft.operators.Layout.zorder(rows, cols, files)
      .write.parquet(staging.toString)
    val outNames = Seq.newBuilder[String]
    try {
      var i = 0
      fs.listStatus(staging).sortBy(_.getPath.getName).foreach { f =>
        if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
          val name = f"zorder-$opId-$i%05d.parquet"
          if (!fs.rename(f.getPath, new Path(data, name))) {
            throw new java.io.IOException(s"zorder stage rename failed: $name")
          }
          outNames += name
          i += 1
        }
      }
    } finally fs.delete(staging, true)
    val out = outNames.result()
    ParquetVersions.commit(tableDir) { prev =>
      (prev.filterNot(live.toSet) ++ out).distinct.sorted
    }
    (live.size.toLong, nRows, out.size.toLong)
  }
}
