package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational counterpart of micro-batch
  * ingest. A tick-per-micro-batch sink ([[graft.streaming.ParquetBatchSink]]
  * writes one directory per batch) necessarily produces many small
  * files; at 100 TB that degrades every downstream scan (footer reads,
  * task-per-file scheduling, shuffle fan-in). Compaction bin-packs the
  * accumulated output into ~target-sized files.
  *
  * Scale notes: the rewrite is one distributed pass —
  * `repartition(ceil(bytes / target))` hash-distributes rows evenly
  * across exactly the number of output files needed (round-robin-ish;
  * no sort, no skew sensitivity); `maxRecordsPerFile` stays unset
  * because the partition count already fixes the file size. For a
  * live table the production recipe is compact-to-new-dir + atomic
  * swap, which is what the (inDir, outDir) signature expresses.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      rowsBefore: Long, filesAfter: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        buf += ((f.getPath.toString, f.getLen))
      }
    }
    buf.result()
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` as
    * ~`targetBytes` files. Returns before/after stats. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): CompactionStats = {
    val before = parquetFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.option("basePath", inDir).parquet(inDir)
    val rows = df.count()
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    CompactionStats(before.size.toLong, totalBytes, rows,
      parquetFiles(spark, outDir).size.toLong)
  }

  final case class LogCompactionStats(segmentsBefore: Long, bytesBefore: Long,
      segmentsAfter: Long)

  /** Compact an ENTITY-LOG directory in place: bin-pack every segment
    * into ~`targetBytes` merged segments (byte-level concatenation —
    * the TSV layout is append-closed: every segment ends in a newline),
    * then replace the stats manifests with ONE whose entries are the
    * exact MERGE of the members' stats: row counts sum, min/max combine
    * in the same orderings the writer used, and Bloom filters union
    * bitwise (the union filter answers membership for the combined
    * value set exactly — no re-scan, no rebuild). A merged segment
    * whose members aren't all stats-covered gets no entry (it is then
    * never skipped — correctness first).
    *
    * Maintenance-window semantics, like every rewrite compactor:
    * staged files are invisible while building; the swap renames new
    * segments in BEFORE deleting old ones, so a concurrent reader sees
    * transient duplication, never loss. Not safe against CONCURRENT
    * writers (they could commit between listing and delete) — run it
    * when the log is quiesced, the same contract as the parquet
    * [[compact]]. */
  def compactLog(spark: SparkSession, dir: String, compactionId: String,
      targetBytes: Long = 64L << 20): LogCompactionStats = {
    import org.apache.spark.unsafe.types.UTF8String
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = LimitHashLog.segments(dir)
    val stats = LimitHashLog.loadStats(dir)
    if (segs.isEmpty) return LogCompactionStats(0, 0, 0)

    // first-fit pack on the sorted listing (same rule as the scan's splits)
    val groups = scala.collection.mutable.ArrayBuffer.empty[(List[(String, Long)], Long)]
    segs.foreach { case (f, len) =>
      groups.lastOption match {
        case Some((fs0, tot)) if tot + len <= targetBytes =>
          groups(groups.length - 1) = ((f, len) :: fs0, tot + len)
        case _ => groups += ((List((f, len)), len))
      }
    }

    val manifest = Map.newBuilder[String, SegmentStats]
    val renames = Seq.newBuilder[(Path, Path)]
    groups.zipWithIndex.foreach { case ((membersRev, _), i) =>
      val members = membersRev.reverse
      val name = s"segment-$compactionId-$i"
      val staged = new Path(base, s"_compact-$compactionId-$i")
      val out = fs.create(staged, true)
      try members.foreach { case (f, _) =>
        val in = fs.open(new Path(f))
        try {
          val buf = new Array[Byte](1 << 16)
          var n = in.read(buf)
          while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
        } finally in.close()
      } finally out.close()
      renames += ((staged, new Path(base, name)))

      val memberStats = members.map { case (f, _) => stats.get(new Path(f).getName) }
      if (memberStats.forall(_.isDefined)) {
        val ss = memberStats.flatten
        val blooms = ss.map(_.bloom)
        val merged = SegmentStats(
          ss.map(_.rows).sum,
          ss.map(s => UTF8String.fromString(s.minUserId)).min.toString,
          ss.map(s => UTF8String.fromString(s.maxUserId)).max.toString,
          ss.map(_.minAmount).min,
          ss.map(_.maxAmount).max,
          if (blooms.forall(_.isDefined))
            Some(blooms.flatten.map(SegmentBloom.fromBase64)
              .reduce(_ union _).toBase64)
          else None)
        manifest += (name -> merged)
      }
    }

    // swap: new in, old out, single fresh manifest
    renames.result().foreach { case (from, to) =>
      if (fs.exists(to)) fs.delete(to, false) // same-id retry: replace
      if (!fs.rename(from, to)) {
        throw new java.io.IOException(s"compactLog: rename $from -> $to failed")
      }
    }
    segs.foreach { case (f, _) => fs.delete(new Path(f), false) }
    LimitHashLog.writeManifest(fs, base, compactionId, manifest.result())
    LimitHashLog.dropOtherManifests(fs, base, compactionId)
    LogCompactionStats(segs.length.toLong, segs.map(_._2).sum, groups.length.toLong)
  }
}
