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
    * [[compact]].
    *
    * Crash/retry contract: retry a failed compaction with the SAME
    * `compactionId`. The input listing excludes this id's own
    * `segment-<id>-<i>` outputs (so a retry never re-packs what a
    * previous attempt already merged), and the delete phase is fenced
    * by a `_compact-<id>.committed` marker recording the exact input
    * names: a retry after the rename phase committed resumes the
    * deletes from the marker instead of re-packing, and a retry before
    * it re-packs the identical (untouched) input set. Retrying with a
    * DIFFERENT id after a crash is rejected when it would pack a
    * half-finished compaction's outputs together with their members
    * (row duplication). */
  def compactLog(spark: SparkSession, dir: String, compactionId: String,
      targetBytes: Long = 64L << 20): LogCompactionStats =
    // serialized against other maintainers ([[MaintenanceLease]]) —
    // two concurrent compactions converge instead of racing renames
    MaintenanceLease.withLease(dir) {
    import org.apache.spark.unsafe.types.UTF8String
    require(compactionId.nonEmpty && !compactionId.contains("/"),
      s"bad compactionId: $compactionId")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(base, s"_compact-$compactionId.committed")
    // `-b<k>` suffix: a tagged pack group's output carries its bucket
    // in the NAME as well as the manifest, keeping LogBucketing's two
    // documented tag channels consistent through compaction (ADVICE r9)
    val ownTarget = s"segment-${java.util.regex.Pattern.quote(compactionId)}-\\d+(-b\\d+)?".r

    // Resume path: the previous attempt committed renames + manifest and
    // recorded its inputs, then crashed mid-delete. Finish the deletes.
    if (fs.exists(marker)) {
      val in = fs.open(marker)
      val recorded = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty).toSeq
      finally in.close()
      recorded.foreach { name =>
        val p = new Path(base, name)
        if (fs.exists(p)) fs.delete(p, false)
      }
      LimitHashLog.dropOtherManifests(fs, base, compactionId)
      fs.delete(marker, false)
      val after = LimitHashLog.segments(dir)
      return LogCompactionStats(recorded.length.toLong, 0L, after.length.toLong)
    }

    // Drop staged leftovers of a crashed attempt of THIS id (invisible
    // to readers; superseded by the re-pack below).
    fs.listStatus(base).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith(s"_compact-$compactionId-"))
        fs.delete(s.getPath, false)
    }

    // On a VERSIONED log ([[LogVersions]]) the inputs come from the
    // latest version's pinned set (the listing can hold vacuum-pending
    // segments of older versions — re-packing those would duplicate
    // rows), and the commit is a version publish instead of a fenced
    // physical delete: old segments stay on disk for pinned readers.
    val versioned = LogVersions.enabled(dir)
    // MERGE-ON-READ masks on live segments ([[DeleteMasks]] on the log
    // tier) must be PURGED before the byte-level pack: concatenation
    // cannot line-filter, and packing a masked segment whole would
    // resurrect its deleted rows into an unmasked output. The purge is
    // a separate guarded version publish (we already hold the lease);
    // the pack below then runs over mask-free inputs.
    if (versioned &&
        LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2.nonEmpty) {
      LogDelete.purgeMasksInner(spark, dir)
    }
    val all = LimitHashLog.segments(dir)
    val live = if (versioned) LimitHashLog.liveSegments(dir) else all
    // Inputs = everything that is not an output of this compaction id.
    // A previous SAME-id attempt's committed targets are outputs, not
    // inputs — re-packing them alongside their still-present members
    // would duplicate every row (ADVICE r7).
    val segs = live.filterNot { case (f, _) =>
      ownTarget.pattern.matcher(new Path(f).getName).matches()
    }
    val staleTargets = live.length - segs.length
    if (staleTargets > 0 && staleTargets == live.length) {
      // Nothing but this id's own outputs: the compaction already
      // completed (marker deleted last / version committed). Idempotent
      // no-op.
      return LogCompactionStats(0, 0, live.length.toLong)
    }
    val stats = LimitHashLog.loadStats(dir)
    if (segs.isEmpty) return LogCompactionStats(0, 0, 0)

    // Bucket-aware packing: on a bucketed log ([[LogBucketing]]) pack
    // WITHIN each bucket, so every merged segment keeps its tag and the
    // key-grouped layout survives compaction (a cross-bucket merge would
    // silently downgrade every later join to shuffling). Untagged
    // segments pack together as before; their outputs stay untagged —
    // the scan's every-segment-tagged proof handles the mix safely.
    val tagOf: String => Option[Int] =
      if (LogBucketing.readSpec(dir).isEmpty) _ => None
      else name => stats.get(name).flatMap(_.bucket)
    val packGroups: Seq[(Option[Int], Seq[(String, Long)])] =
      segs.groupBy { case (f, _) => tagOf(new Path(f).getName) }
        .toSeq.sortBy(_._1.getOrElse(Int.MinValue))

    // first-fit pack on the sorted listing (same rule as the scan's
    // splits), per pack group
    val groups = scala.collection.mutable.ArrayBuffer.empty[(List[(String, Long)], Long, Option[Int])]
    packGroups.foreach { case (tag, members) =>
      var open = false
      members.foreach { case (f, len) =>
        groups.lastOption match {
          case Some((fs0, tot, _)) if open && tot + len <= targetBytes =>
            groups(groups.length - 1) = ((f, len) :: fs0, tot + len, tag)
          case _ =>
            groups += ((List((f, len)), len, tag))
            open = true
        }
      }
    }

    val manifest = Map.newBuilder[String, SegmentStats]
    val renames = Seq.newBuilder[(Path, Path)]
    groups.zipWithIndex.foreach { case ((membersRev, _, tag), i) =>
      val members = membersRev.reverse
      val name = s"segment-$compactionId-$i" + tag.fold("")(k => s"-b$k")
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
          else None,
          bucket = tag) // a same-bucket merge keeps the layout tag
        manifest += (name -> merged)
      }
    }

    // swap: new in, old out, single fresh manifest
    val committed = renames.result().map { case (from, to) =>
      if (fs.exists(to)) fs.delete(to, false) // same-id retry: replace
      if (!fs.rename(from, to)) {
        throw new java.io.IOException(s"compactLog: rename $from -> $to failed")
      }
      to.getName
    }.toSet
    // A same-id retry with fewer inputs cannot happen (inputs are only
    // deleted after the marker commits), but clear any higher-indexed
    // stale target defensively rather than leave duplicated rows.
    all.foreach { case (f, _) =>
      val name = new Path(f).getName
      if (ownTarget.pattern.matcher(name).matches() && !committed(name))
        fs.delete(new Path(f), false)
    }
    // Old commit manifests are dropped only after the marker commits,
    // so a crash before the marker leaves the originals' stats intact
    // for the re-pack.
    LimitHashLog.writeManifest(fs, base, compactionId, manifest.result())
    val inputNames = segs.map { case (f, _) => new Path(f).getName }
      .filterNot(committed)
    if (versioned) {
      // Snapshot commit: publish live = prev − inputs + outputs. The
      // inputs stay physically present — a reader pinned to the prior
      // version keeps hash-exact results while this runs; [[LogVersions
      // .vacuum]] is the retention knob that reclaims them. Old
      // manifests stay too (pinned readers zone-prune against them;
      // entries for dead names are inert). A crash before this line
      // re-packs the identical input set on retry — the version file is
      // the only visibility event, so no fence marker is needed.
      // GUARDED against merge-on-read masks: the inputs were packed
      // mask-free (pre-pass purge above); a lightweight DELETE masking
      // one of them mid-pack aborts loudly (retry with the same id
      // resumes safely) instead of resurrecting its rows.
      LogVersions.commitGuarded(dir, Map.empty,
        Some(VersionLedger.MaskGuard(inputNames.toSet, Map.empty))) { prev =>
        (prev.toSet -- inputNames ++ committed).toSeq
      }
    } else {
      // Fence the delete phase: record exactly which inputs to remove,
      // THEN remove them. A crash mid-delete resumes from the marker; a
      // crash before it re-packs the identical input set. Never delete a
      // name that was just committed as a target (ADVICE r7: the old
      // listing on retry contained the freshly merged segments).
      val mOut = fs.create(marker, true)
      try mOut.write(inputNames.mkString("\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally mOut.close()
      inputNames.foreach(name => fs.delete(new Path(base, name), false))
      LimitHashLog.dropOtherManifests(fs, base, compactionId)
      fs.delete(marker, false)
    }
    LogCompactionStats(segs.length.toLong, segs.map(_._2).sum, groups.length.toLong)
  }

  // ------------------------------------------------------------------
  // In-place compaction of a CATALOG parquet table (`<dir>/_schema.json`
  // + `<dir>/data/*.parquet`)
  // ------------------------------------------------------------------

  /** Finish an interrupted [[compactTable]] generation swap — the
    * MatView read-repair pattern applied to the table's `data/` dir.
    * Called from both `compactTable` and the catalog's `loadTable`, so
    * a crash at ANY point leaves the table readable on next touch:
    *
    *   - `data` missing, `data.next` carries `_COMPACT_SUCCESS` →
    *     the build finished and the swap half-ran: promote `.next`;
    *   - `data` missing otherwise → restore `data.prev`;
    *   - `data` present → any `.next`/`.prev` remnant is a stale build
    *     or an un-deleted old generation: drop it. */
  private[sources] def repairGenerations(fs: org.apache.hadoop.fs.FileSystem,
      tableDir: Path): Unit = {
    val data = new Path(tableDir, "data")
    val next = new Path(tableDir, "data.next")
    val prev = new Path(tableDir, "data.prev")
    if (!fs.exists(data)) {
      if (fs.exists(new Path(next, "_COMPACT_SUCCESS"))) {
        if (!fs.rename(next, data)) {
          throw new java.io.IOException(s"repair: promote $next failed")
        }
        fs.delete(prev, true)
      } else if (fs.exists(prev)) {
        if (!fs.rename(prev, data)) {
          throw new java.io.IOException(s"repair: restore $prev failed")
        }
        fs.delete(next, true)
      }
    } else {
      fs.delete(next, true)
      fs.delete(prev, true)
    }
  }

  final case class PurgeStats(maskedFiles: Long, rewrittenFiles: Long,
      outputFiles: Long, remainingMasked: Long)

  /** SURGICAL mask purge — the operational half of the mask-pressure
    * policy (VERDICT r12 #2): rewrite ONLY the live files carrying at
    * least `minPreds` stacked delete-mask predicates, restoring their
    * columnar decode, and leave everything else untouched (a full
    * `compact_table` merges all small files too — far more I/O than
    * the pressure problem needs). Masked files pack per
    * (partition dir, bucket tag) group like compaction, outputs keep
    * layout claims, and the guarded publish retires the inputs —
    * the version carry-forward drops their masks with them. Zero
    * masked files is a free no-op (no lease churn beyond the probe,
    * no version churn).
    *
    * WHY pressure matters at 100 TB: every stacked predicate is
    * evaluated per row of its file, and ANY mask in a scan batch flips
    * that whole batch to row-based decode
    * ([[MaskedReaderFactory.supportColumnarReads]]) — unbounded DML
    * stacking degrades scans until some rewrite consumes the masks.
    * This verb is that rewrite, scoped to exactly the pressured
    * files. The automatic trigger lives in [[MaskPressure]]. */
  def purgeMasks(spark: SparkSession, tableDir: String, minPreds: Int = 1,
      targetBytes: Long = 128L << 20): PurgeStats =
    MaintenanceLease.withLease(tableDir) {
    require(minPreds >= 1, "minPreds must be at least 1")
    val base = new Path(tableDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table (no _schema.json)")
    val declared = SchemaManifest.read(tableDir, "purgeMasks")
    val data = new Path(base, "data")
    if (!ParquetVersions.enabled(tableDir)) {
      return PurgeStats(0L, 0L, 0L, 0L) // masks exist only on versioned tables
    }
    val tagOf: String => Option[Int] =
      if (ParquetBucketing.readSpec(tableDir).isEmpty) _ => None
      else rel => ParquetBucketing.bucketOfName(PartitionSpecs.nameOfRel(rel))
    val opId = java.util.UUID.randomUUID().toString.take(8)
    ParquetVersions.retryOnMaskConflict() {
      val allMasks = ParquetVersions.masksFor(tableDir, None).filter(_._2.nonEmpty)
      val live = ParquetVersions.live(tableDir).toSet
      val targets = allMasks.view.filterKeys(live).toMap
        .filter(_._2.size >= minPreds)
      if (targets.isEmpty) {
        return PurgeStats(allMasks.keySet.count(live).toLong, 0L, 0L,
          allMasks.keySet.count(live).toLong)
      }
      // pack per (partition dir, bucket tag) so outputs keep their
      // layout claim; greedy adjacent bins up to targetBytes
      val statOf = targets.keys.toSeq.sorted.map { rel =>
        rel -> fs.getFileStatus(new Path(data, rel))
      }
      val groups = statOf.groupBy { case (rel, _) =>
        (PartitionSpecs.dirOfRel(rel), tagOf(rel))
      }.toSeq.sortBy(_._1)
      val bins = Seq.newBuilder[(Seq[String], (String, Option[Int]))]
      groups.foreach { case (key, members) =>
        var cur = Vector.empty[String]
        var curBytes = 0L
        members.foreach { case (rel, st) =>
          if (cur.nonEmpty && curBytes + st.getLen > targetBytes) {
            bins += ((cur, key)); cur = Vector.empty; curBytes = 0L
          }
          cur = cur :+ rel; curBytes += st.getLen
        }
        if (cur.nonEmpty) bins += ((cur, key))
      }
      val allBins = bins.result()
      val outputs = inParallel(allBins.zipWithIndex) {
        case ((bin, (relDir, tag)), i) =>
          val staging = new Path(base, s".purge-$opId-$i")
          fs.delete(staging, true)
          DeleteMasks.readVisible(spark, declared, data, bin, targets)
            .coalesce(1).write.mode("overwrite").parquet(staging.toString)
          val part = fs.listStatus(staging)
            .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            .getOrElse(throw new java.io.IOException(s"no output part in $staging"))
          // `compact-` prefix: same ledger-gated maintenance namespace
          // (vacuum classification, crash-debris reclaim) as compaction
          val name = f"compact-$opId-$i%05d" + tag.fold("")(k => s"-b$k") +
            ".parquet"
          val rel = if (relDir.isEmpty) name else s"$relDir/$name"
          val to = new Path(data, rel)
          fs.mkdirs(to.getParent)
          if (fs.exists(to)) fs.delete(to, false) // prior conflicted attempt
          if (!fs.rename(part.getPath, to)) {
            throw new java.io.IOException(s"purge stage rename failed for bin $i")
          }
          fs.delete(staging, true)
          rel
      }
      val inputNames = allBins.flatMap(_._1).toSet
      // visible input rows must equal staged output rows (same
      // abort-before-publish proof as compaction)
      val rowsIn = DeleteMasks.readVisible(spark, declared, data,
        inputNames.toSeq, targets).count()
      val rowsOut = spark.read.schema(declared)
        .parquet(outputs.map(n => new Path(data, n).toString): _*).count()
      if (rowsIn != rowsOut) {
        outputs.foreach(n => fs.delete(new Path(data, n), false))
        throw new IllegalStateException(
          s"mask purge row mismatch: $rowsIn visible in vs $rowsOut staged — aborted")
      }
      try {
        ParquetVersions.commitGuarded(tableDir, None, Map.empty,
          ParquetVersions.guardFor(inputNames, targets)) { liveNow =>
          (liveNow.toSet -- inputNames ++ outputs).toSeq.sorted
        }
      } catch {
        case e: VersionLedger.MaskConflictException =>
          outputs.foreach(n => fs.delete(new Path(data, n), false))
          throw e
      }
      val remaining = ParquetVersions.masksFor(tableDir, None)
        .count(_._2.nonEmpty).toLong
      PurgeStats(targets.size.toLong, inputNames.size.toLong,
        outputs.size.toLong, remaining)
    }
  }

  final case class MaskCompactStats(maskedFiles: Long, compacted: Long,
      unmasked: Long, remainingMasked: Long, sidecarBytes: Long)

  /** MASK-STACK COMPACTION WITHOUT A DATA REWRITE (r15): fold each
    * pressured file's stacked mask entries (predicates and/or DVs)
    * into ONE consolidated position bitmap, attached to a HARDLINK of
    * the same bytes under a fresh maintenance name — the old name
    * retires and the version carry-forward drops its stack. Steady-
    * state churn cost becomes O(deleted-row BITS) per pressured file
    * instead of [[purgeMasks]]'s full rewrite: a sustained trickle of
    * MoR MERGEs can be stack-compacted forever at near-zero write
    * amplification, and the per-row read tax drops from N predicate
    * evaluations to one bitmap probe. Files whose consolidated stack
    * hides NOTHING come back mask-free (pure un-mask). `purgeMasks`
    * stays the columnar-restoring endgame (any mask still forces
    * row-based decode); this verb is the cheap middle gear.
    *
    * Correctness rails shared with every rewrite: deleted positions
    * compute under the SAME per-file dispatch the scans use, the
    * publish is guarded (concurrent DML on a target aborts and the
    * retry re-reads), a conflicted attempt reclaims its links and
    * sidecars, time travel keeps serving the retired names' stacks,
    * and vacuum reclaims the retired files (the hardlink keeps the
    * shared bytes alive) plus any orphaned sidecars. A file past the
    * 2^31-position domain is left as-is (purge handles it). */
  def compactMasks(spark: SparkSession, tableDir: String,
      minPreds: Int = 2): MaskCompactStats =
    MaintenanceLease.withLease(tableDir) {
    require(minPreds >= 1, "minPreds must be at least 1")
    val base = new Path(tableDir)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = base.getFileSystem(conf)
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table (no _schema.json)")
    val declared = SchemaManifest.read(tableDir, "compactMasks")
    val data = new Path(base, "data")
    if (!ParquetVersions.enabled(tableDir)) {
      return MaskCompactStats(0L, 0L, 0L, 0L, 0L)
    }
    val dataPathPrefix = fs.makeQualified(data).toUri.getPath
    val tagOf: String => String =
      if (ParquetBucketing.readSpec(tableDir).isEmpty) _ => ""
      else rel => ParquetBucketing.bucketOfName(PartitionSpecs.nameOfRel(rel))
        .fold("")(k => s"-b$k")
    val opId = java.util.UUID.randomUUID().toString.take(8)
    ParquetVersions.retryOnMaskConflict() {
      val live = ParquetVersions.live(tableDir).toSet
      val priorMasks = ParquetVersions.masksFor(tableDir, None)
        .filter(_._2.nonEmpty)
      val targets = priorMasks.view.filterKeys(live).toMap
        .filter(_._2.size >= minPreds)
      val maskedLive = priorMasks.keySet.count(live).toLong
      if (targets.isEmpty) {
        return MaskCompactStats(maskedLive, 0L, 0L, maskedLive, 0L)
      }
      // DELETED positions of every target, one distributed job: plain
      // read + per-file mask dispatch (the exact test the scans run),
      // bitmaps aggregated executor-side
      import spark.implicits._
      import org.apache.spark.sql.{functions => F}
      val children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
        org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gfilefull")) +:
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gpos")) +:
          declared.fieldNames.toSeq.map(n =>
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n)))
      val visible = org.apache.spark.sql.GraftShims.column(
        DeleteMasks.FileDispatchVisible(tableDir, dataPathPrefix,
          targets, declared, children))
      val dvAgg = F.udaf(new DeletionVectors.BitmapAgg(),
        org.apache.spark.sql.Encoders.scalaLong)
      val perFile: Array[(String, Array[Byte], Long)] =
        Renames.read(spark, declared, data, targets.keys.toSeq.sorted)
          .filter(!visible)
          .groupBy("_gfilefull")
          .agg(dvAgg(F.col("_gpos")).as("_gdv"), F.max("_gpos").as("_gmax"))
          .as[(String, Array[Byte], Long)].collect()
      def relOf(full: String): String = {
        val p = new java.net.URI(full).getPath
        require(p.startsWith(dataPathPrefix + "/"),
          s"scanned file $p outside table data dir $dataPathPrefix")
        p.substring(dataPathPrefix.length + 1)
      }
      val hidden: Map[String, (Array[Byte], Long)] = perFile
        .filter(_._3 <= Int.MaxValue.toLong) // overflow: leave to purge
        .map { case (full, bytes, _) =>
          relOf(full) -> ((bytes,
            DeletionVectors.deserialize(bytes).getLongCardinality))
        }.toMap
      val present = perFile.map(p => relOf(p._1)).toSet
      val eligible = targets.keys.toSeq.sorted.filter { rel =>
        // a target absent from `perFile` hides nothing (pure un-mask);
        // one past the position domain is skipped entirely
        hidden.contains(rel) || !present(rel)
      }
      if (eligible.isEmpty) {
        return MaskCompactStats(maskedLive, 0L, 0L, maskedLive, 0L)
      }
      // hardlink + sidecar per eligible target; publish retires the
      // old names (their stacks drop with them)
      val links = Seq.newBuilder[(String, String)] // old rel -> new rel
      val sidecars = Seq.newBuilder[String]
      var sidecarBytes = 0L
      eligible.zipWithIndex.foreach { case (rel, i) =>
        val dirPart = PartitionSpecs.dirOfRel(rel)
        val name = f"compact-dv-$opId-$i%05d${tagOf(rel)}.parquet"
        val newRel = if (dirPart.isEmpty) name else s"$dirPart/$name"
        val to = new Path(data, newRel)
        if (fs.exists(to)) fs.delete(to, false) // prior conflicted attempt
        linkOrCopy(fs, conf, new Path(data, rel), to)
        links += ((rel, newRel))
        hidden.get(rel).foreach { case (bytes, _) =>
          sidecarBytes += bytes.length
        }
      }
      val linkMap = links.result()
      val addMasks: Map[String, Seq[String]] = linkMap.flatMap {
        case (oldRel, newRel) => hidden.get(oldRel).map { case (bytes, card) =>
          val sidecar = DeletionVectors.sidecarName(opId, oldRel)
          val sp = DeletionVectors.sidecarPath(tableDir, sidecar)
          fs.mkdirs(sp.getParent)
          val out = fs.create(sp, true)
          try out.write(bytes) finally out.close()
          sidecars += sidecar
          newRel -> Seq(DeletionVectors.refJson(sidecar, card))
        }
      }.toMap
      val retired = linkMap.map(_._1).toSet
      try {
        ParquetVersions.commitGuarded(tableDir, None, addMasks,
          ParquetVersions.guardFor(retired, priorMasks)) { liveNow =>
          (liveNow.filterNot(retired) ++ linkMap.map(_._2)).distinct.sorted
        }
      } catch {
        case e: VersionLedger.MaskConflictException =>
          linkMap.foreach { case (_, nr) => fs.delete(new Path(data, nr), false) }
          sidecars.result().foreach(n => DeletionVectors.delete(fs, tableDir, n))
          throw e
      }
      val remaining = ParquetVersions.masksFor(tableDir, None)
        .count(_._2.nonEmpty).toLong
      MaskCompactStats(maskedLive, addMasks.size.toLong,
        (linkMap.size - addMasks.size).toLong, remaining, sidecarBytes)
    }
  }

  /** Bin-pack the small files of a catalog parquet table into
    * ~`targetBytes` files, IN PLACE and crash-safe, preserving the
    * table's clustering: files are packed ADJACENT in (mtime, name)
    * order — write order within and across jobs — so a range- or
    * Z-ordered table's merged files cover compact key intervals and
    * footer-stats skipping keeps working at the coarser granularity
    * (a hash `repartition` rewrite like [[compact]] would destroy it).
    *
    * Already-large-enough files are HARDLINKED into the new generation
    * (copy fallback for filesystems without links): zero rewrite I/O
    * for the part of the table that is already well-laid-out — at
    * 100 TB the steady-state compaction touches only the fresh tail of
    * small files.
    *
    * Crash safety is a staged generation swap, not file juggling in
    * the live dir: build `data.next` completely, mark it with
    * `_COMPACT_SUCCESS` (underscore-prefixed → invisible to Spark's
    * listing), then `data`→`data.prev`, `data.next`→`data`, drop
    * `data.prev`. A reader can never observe duplicated or missing
    * rows; the only crash residue is repaired by
    * [[repairGenerations]] on the next load. Single-writer maintenance
    * semantics, same contract as [[compactLog]]. */
  def compactTable(spark: SparkSession, tableDir: String,
      targetBytes: Long = 128L << 20): CompactionStats =
    // serialized against other maintainers ([[MaintenanceLease]])
    MaintenanceLease.withLease(tableDir) {
    val base = new Path(tableDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(SchemaManifest.exists(tableDir),
      s"$tableDir is not a catalog parquet table (no _schema.json); " +
        "entity logs compact via compactLog")
    // Merge bins under the table's AUTHORITATIVE schema, not one sampled
    // footer: after ALTER TABLE ADD COLUMN a bin can mix pre- and
    // post-ALTER files, and schema inference from an old file would
    // silently drop the added column's values from the merged output
    // (the rows-before/after check cannot see it). Reading with the
    // declared schema fills absent columns with null and prunes DROPped
    // ones — exactly the table's read semantics (ADVICE r8).
    val declared = SchemaManifest.read(tableDir, "compactTable")
    repairGenerations(fs, base)
    val data = new Path(base, "data")

    // On a VERSIONED table ([[ParquetVersions]]) the inputs are the
    // LIVE files only (the listing can hold vacuum-pending files of
    // older versions — re-packing those would duplicate rows), and the
    // commit is a version publish instead of a generation swap: old
    // files stay on disk for pinned readers.
    val versioned = ParquetVersions.enabled(tableDir)
    val liveNames: Option[Set[String]] =
      if (versioned) Some(ParquetVersions.live(tableDir).toSet) else None

    // committed-file walk ([[ParquetVersions.walkData]]): partitioned
    // tables nest files under partition dirs; names data/-relative
    val files: Seq[(String, org.apache.hadoop.fs.FileStatus)] =
      ParquetVersions.walkData(fs, data)
        .filter { case (rel, _) => liveNames.forall(_(rel)) }
        .sortBy { case (rel, s) => (s.getModificationTime, rel) }
    val bytesBefore = files.map(_._2.getLen).sum

    // Bucket-aware packing: on a bucketed table ([[ParquetBucketing]])
    // pack WITHIN each name-tagged bucket, so merged files keep their
    // tag (`…-b<k>.parquet`) and the key-grouped layout survives
    // compaction. On a PARTITIONED table, pack WITHIN each partition
    // dir — partition-wise maintenance, outputs stay in their
    // partition. Untagged files pack together; their outputs stay
    // untagged — the scan's every-file-tagged proof handles the mix
    // safely (same contract as compactLog on the log tier).
    val tagOf: String => Option[Int] =
      if (ParquetBucketing.readSpec(tableDir).isEmpty) _ => None
      else rel => ParquetBucketing.bucketOfName(PartitionSpecs.nameOfRel(rel))
    val packGroups: Seq[((String, Option[Int]), Seq[(String, org.apache.hadoop.fs.FileStatus)])] =
      files.groupBy { case (rel, _) => (PartitionSpecs.dirOfRel(rel), tagOf(rel)) }
        .toSeq.sortBy(_._1)

    // greedy adjacent bin-pack, per pack group; each bin remembers its
    // (partition dir, bucket tag)
    val bins = Seq.newBuilder[(Seq[(String, org.apache.hadoop.fs.FileStatus)], (String, Option[Int]))]
    packGroups.foreach { case (key, members) =>
      var cur = Vector.empty[(String, org.apache.hadoop.fs.FileStatus)]
      var curBytes = 0L
      for (f <- members) {
        if (cur.nonEmpty && curBytes + f._2.getLen > targetBytes) {
          bins += ((cur, key)); cur = Vector.empty; curBytes = 0L
        }
        cur = cur :+ f; curBytes += f._2.getLen
      }
      if (cur.nonEmpty) bins += ((cur, key))
    }

    // Output names carry a fresh per-operation token: a hardlinked
    // single-file bin keeps its ORIGINAL name, which may be a previous
    // compaction's `compact-…` output — an index-only name for this
    // run's merges could collide with it (rename-fails-if-exists).
    // Crash safety never depends on the names; the generation swap /
    // version publish does that.
    val opId = java.util.UUID.randomUUID().toString.take(8)

    if (versioned) {
      // Merge each multi-file bin into `data/` under a maintenance
      // name; single-file bins carry forward in the version set
      // untouched (zero I/O). The version publish is the only
      // visibility event — a crash before it leaves unreferenced
      // `compact-*` files the live rule ignores and vacuum reclaims.
      // delete masks ([[DeleteMasks]]): a masked file is force-rewritten
      // even alone in its bin — compaction is the merge step that PURGES
      // merge-on-read deletes (the rewrite reads only visible rows; the
      // publish retires the input name, dropping its masks).
      // MASK-CONFLICT retry (ADVICE r11, high): masks are re-read at
      // the top of each attempt and the publish is guarded — a
      // merge-on-read DELETE/UPDATE landing a new mask on one of the
      // bins' inputs mid-rewrite aborts the publish (its rows would be
      // resurrected in the merged output) and the attempt re-reads
      // visible rows under the fresh masks.
      return ParquetVersions.retryOnMaskConflict() {
      val tableMasks = ParquetVersions.masksFor(tableDir, None).filter(_._2.nonEmpty)
      val multiBins = bins.result().filter { case (bin, _) =>
        bin.length > 1 || bin.exists(s => tableMasks.contains(s._1))
      }
      val outputs = inParallel(multiBins.zipWithIndex) { case ((bin, (relDir, tag)), i) =>
        val staging = new Path(base, s".compact-$opId-$i")
        fs.delete(staging, true)
        val merged = DeleteMasks.readVisible(spark, declared, data,
          bin.map(_._1), tableMasks)
        merged.coalesce(1).write.mode("overwrite").parquet(staging.toString)
        val part = fs.listStatus(staging)
          .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .getOrElse(throw new java.io.IOException(s"no output part in $staging"))
        // a tagged bin's output keeps its bucket in the name, a
        // partitioned bin's output stays in its partition dir — both
        // layouts survive compaction
        val name = f"compact-$opId-$i%05d" + tag.fold("")(k => s"-b$k") + ".parquet"
        val rel = if (relDir.isEmpty) name else s"$relDir/$name"
        val to = new Path(data, rel)
        fs.mkdirs(to.getParent)
        if (fs.exists(to)) fs.delete(to, false) // prior conflicted attempt
        if (!fs.rename(part.getPath, to)) {
          throw new java.io.IOException(s"stage rename failed for bin $i")
        }
        fs.delete(staging, true)
        rel
      }
      val inputNames = multiBins.flatMap(_._1).map(_._1).toSet
      // abort-on-mismatch BEFORE the publish: the staged outputs must
      // carry exactly the rows of the bins they replace
      if (multiBins.nonEmpty) {
        // VISIBLE input rows (mask-filtered) must equal staged output rows
        val rowsIn = DeleteMasks.readVisible(spark, declared, data,
          multiBins.flatMap(_._1).map(_._1), tableMasks).count()
        val rowsOut = spark.read.schema(declared)
          .parquet(outputs.map(n => new Path(data, n).toString): _*).count()
        if (rowsIn != rowsOut) {
          outputs.foreach(n => fs.delete(new Path(data, n), false))
          throw new IllegalStateException(
            s"compaction row mismatch: $rowsIn in vs $rowsOut staged — aborted")
        }
      }
      try {
        ParquetVersions.commitGuarded(tableDir, None, Map.empty,
          ParquetVersions.guardFor(inputNames, tableMasks)) { live =>
          (live.toSet -- inputNames ++ outputs).toSeq
        }
      } catch {
        case e: VersionLedger.MaskConflictException =>
          // conflicted attempt's outputs: remove before the retry
          // re-stages (same names are regenerated per opId+bin index)
          outputs.foreach(n => fs.delete(new Path(data, n), false))
          throw e
      }
      val liveAfter = ParquetVersions.live(tableDir)
      // the rows stat from FOOTERS, not a data scan: a post-commit
      // count() re-read the whole live table for one metric — O(table)
      // per compaction at the 100 TB posture. Footer row counts are
      // exact and cached (ParquetFooterStats).
      val conf = spark.sessionState.newHadoopConf()
      val rows = liveAfter.map { n =>
        val st = fs.getFileStatus(new Path(data, n))
        ParquetFooterStats.get(conf, st.getPath, st.getLen,
          st.getModificationTime).rowCount
      }.sum
      CompactionStats(files.length.toLong, bytesBefore, rows,
        liveAfter.length.toLong)
      } // retryOnMaskConflict
    }

    val next = new Path(base, "data.next")
    fs.delete(next, true) // stale unfinished build of a crashed attempt
    fs.mkdirs(next)
    var rows = 0L
    inParallel(bins.result().zipWithIndex) { case ((bin, (relDir, tag)), i) =>
      if (bin.length == 1) {
        val (rel, src) = bin.head
        val to = new Path(next, rel)
        fs.mkdirs(to.getParent)
        linkOrCopy(fs, spark.sparkContext.hadoopConfiguration, src.getPath, to)
      } else {
        val staging = new Path(next, s".bin-$i")
        // rename-aware: a pre-rename file reads under its own name
        // vector and the merged output lands with CURRENT names —
        // compaction migrates old vintages forward
        val merged =
          if (Renames.hasRenames(declared))
            Renames.readPlain(spark, declared,
              bin.head._2.getPath.getParent, bin.map(b => b._2.getPath.getName))
          else spark.read.schema(declared)
            .parquet(bin.map(_._2.getPath.toString): _*)
        merged.coalesce(1).write.mode("overwrite").parquet(staging.toString)
        val part = fs.listStatus(staging)
          .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .getOrElse(throw new java.io.IOException(s"no output part in $staging"))
        val name = f"compact-$opId-$i%05d" + tag.fold("")(k => s"-b$k") + ".parquet"
        val rel = if (relDir.isEmpty) name else s"$relDir/$name"
        val to = new Path(next, rel)
        fs.mkdirs(to.getParent)
        if (!fs.rename(part.getPath, to)) {
          throw new java.io.IOException(s"stage rename failed for bin $i")
        }
        fs.delete(staging, true)
      }
    }
    rows = spark.read.schema(declared).parquet(next.toString).count()
    val rowsBefore = spark.read.schema(declared).parquet(data.toString).count()
    if (rows != rowsBefore) {
      fs.delete(next, true)
      throw new IllegalStateException(
        s"compaction row mismatch: $rowsBefore before vs $rows staged — aborted")
    }
    fs.create(new Path(next, "_COMPACT_SUCCESS"), true).close()
    swapGenerations(fs, base)
    CompactionStats(files.length.toLong, bytesBefore, rows,
      fs.listStatus(data).count(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet")).toLong)
  }

  /** Run independent maintenance sub-jobs (bin merges, per-bucket
    * rewrites) CONCURRENTLY from the driver. Each sub-job is a small
    * Spark action — a `coalesce(1)` bin merge is literally one task —
    * and running them back-to-back serially leaves a large cluster
    * idle; Spark's scheduler interleaves concurrently-submitted jobs
    * fine. Bounded pool: maintenance parallelism, not a fork bomb.
    * Result order matches input order. */
  private[sources] def inParallel[A, B](items: Seq[A], par: Int = 4)(f: A => B): Seq[B] =
    if (items.lengthCompare(2) < 0) items.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(par, items.length))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(items.map(a => Future(f(a)))),
        scala.concurrent.duration.Duration.Inf)
      finally pool.shutdown()
    }

  /** Hardlink `src` to `dst` (copy fallback for filesystems without
    * links) — zero-I/O carry-over of an untouched file into a new
    * generation. Shared by [[compactTable]], [[ParquetDelete]] and the
    * bucket-wise [[graft.streaming.CdcMatView]] maintenance. */
  private[graft] def linkOrCopy(fs: org.apache.hadoop.fs.FileSystem,
      conf: org.apache.hadoop.conf.Configuration, src: Path, dst: Path): Unit = {
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(dst.toUri.getPath),
        java.nio.file.Paths.get(src.toUri.getPath))
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
    }
  }

  /** Commit a fully-built, `_COMPACT_SUCCESS`-marked `data.next` as the
    * live generation: `data`→`data.prev`, `data.next`→`data`, drop the
    * marker and `data.prev`. A crash at any point is repaired by
    * [[repairGenerations]] on the next load. */
  private[sources] def swapGenerations(fs: org.apache.hadoop.fs.FileSystem,
      base: Path): Unit = {
    val data = new Path(base, "data")
    val next = new Path(base, "data.next")
    val prev = new Path(base, "data.prev")
    if (!fs.rename(data, prev)) {
      throw new java.io.IOException(s"swap: $data -> $prev failed")
    }
    if (!fs.rename(next, data)) {
      // data is gone but next is complete: exactly the state
      // repairGenerations promotes — surface the error, stay repairable
      throw new java.io.IOException(s"swap: $next -> $data failed")
    }
    // the new generation is live; _COMPACT_SUCCESS has done its job
    fs.delete(new Path(data, "_COMPACT_SUCCESS"), false)
    fs.delete(prev, true)
  }
}
