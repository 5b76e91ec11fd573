package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** CHANGE-FEED-maintained materialized view — [[MatView]]'s contract
  * driven by a CDC stream ([[graft.sources.ChangeFeed]]) instead of an
  * inserts-only stream: every micro-batch of changelog rows folds in as
  * SIGNED deltas (+1 per insert, −1 per delete), so the view tracks the
  * TABLE — deletions and copy-on-write updates included — not just its
  * append history.
  *
  * The changelog is segment-granular (a rewrite emits carried-over rows
  * as delete+insert pairs), and the signed fold nets those pairs to
  * zero whether they arrive in one batch or across batches — the view
  * converges to the per-key aggregate of the table's CURRENT state with
  * no special-casing of maintenance commits. A key whose count reaches
  * zero LEAVES the view (retraction-to-empty), which an inserts-only
  * view cannot express.
  *
  * Bootstrap: the feed starts at a snapshot ordinal, so [[seed]] folds
  * the snapshot's batch aggregate in as the pre-stream generation
  * (batch-read the snapshot, stream the rest — the same composition the
  * `startVersion` read documents). Effectively-once via the same
  * batchId high-water mark and crash-safe staged generation swap as
  * [[MatView]] (replays skip; a crash at any point leaves a complete
  * generation; interrupted swaps read-repair before the next merge). */
class CdcMatView(viewDir: String) extends Serializable {

  import CdcMatView.{MaxBuckets, bucketOfName}

  private def bucketCol(n: Int) = pmod(hash(col("user_id")), lit(n))

  /** `_vb=k/part-*` dirs of a freshly written generation → flat
    * `b<k>-<tag>-<i>.parquet` files (the bucket rides the NAME, so an
    * untouched bucket can carry forward by hardlink, name intact). */
  private def flattenBuckets(fs: org.apache.hadoop.fs.FileSystem,
      gen: Path, tag: String): Unit = {
    fs.listStatus(gen).foreach { d =>
      if (d.isDirectory && d.getPath.getName.startsWith("_vb=")) {
        val k = d.getPath.getName.stripPrefix("_vb=").toInt
        var i = 0
        fs.listStatus(d.getPath).foreach { f =>
          if (f.isFile && f.getPath.getName.endsWith(".parquet")) {
            if (!fs.rename(f.getPath, new Path(gen, s"b$k-$tag-$i.parquet")))
              throw new java.io.IOException(
                s"CdcMatView: bucket flatten rename failed for ${f.getPath}")
            i += 1
          }
        }
        fs.delete(d.getPath, true)
      }
    }
  }

  // --- ADAPTIVE bucket count (VERDICT r11 #4) ------------------------
  // The O(delta) design pays a fixed per-trigger cost proportional to
  // the BUCKET COUNT (generation management, hardlink carry-over,
  // marker discipline) for an asymptotic win proportional to the VIEW
  // SIZE. A toy view under 32 fixed buckets paid 32 files of
  // orchestration per trigger for nothing — so the count now GROWS
  // with the view: 1 bucket below the size threshold, doubling up to
  // [[CdcMatView.MaxBuckets]]. Each generation records its own count
  // in a `_nb-<n>` marker (bucket ids are baked into file names, so
  // the count is per-generation state, never a global constant); a
  // count change rewrites the whole view once (the same full-merge
  // path that migrates legacy un-bucketed layouts). Grow-only: the
  // per-generation cost of an over-bucketed shrunken view is noise,
  // while shrinking would force full rewrites on every size
  // oscillation.

  private def confLong(spark: SparkSession, key: String, dflt: Long): Long =
    spark.conf.getOption(key).flatMap(_.toLongOption).getOrElse(dflt)

  /** Smallest power of two covering `units`, clamped to [1, MaxBuckets]. */
  private def clampPow2(units: Long): Int = {
    var b = 1
    while (b < MaxBuckets && b.toLong < units) b <<= 1
    b
  }

  /** Fold the snapshot aggregate in as the pre-stream generation.
    * Input needs (user_id, amount); no-op if the view already exists
    * (a checkpoint restart must not re-seed). Staged through `.next` +
    * rename like every generation: a torn direct write of main would
    * block the exists-check from ever re-seeding, while a crash before
    * the rename leaves a `_SUCCESS`-complete `.next` that the next
    * call's read-repair promotes. */
  def seed(snapshot: DataFrame): Unit = {
    val spark = snapshot.sparkSession
    val fs = new Path(viewDir).getFileSystem(spark.sessionState.newHadoopConf())
    repairSwap(fs)
    val main = new Path(viewDir)
    if (fs.exists(main)) return
    val next = new Path(viewDir + ".next")
    val grouped = snapshot.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("cents"))
    // size the INITIAL bucket count from the INPUT's plan-statistics
    // size — zero jobs, where an exact `grouped.count()` paid a full
    // snapshot scan before the write re-ran the same aggregate. The
    // input size over-estimates the (aggregated) view, so a big seed
    // may start over-bucketed — grow-only absorbs that for the cost of
    // some near-empty files, while UNDER-bucketing is impossible
    // (|view| ≤ |input| rows and the write still caps at MaxBuckets).
    // A plan with no real size statistics (a join over non-file
    // sources estimates toward defaultSizeInBytes ≈ Long.MaxValue)
    // would seed every toy view at MaxBuckets FOREVER (grow-only) —
    // past a sanity bound the exact count job is the better trade
    val bytesPerBucket = math.max(1L,
      confLong(spark, "spark.graft.cdcview.bucket.bytes", 8L << 20))
    val inputBytes = snapshot.queryExecution.optimizedPlan.stats.sizeInBytes
    val buckets =
      if (inputBytes < BigInt(1L << 40)) clampPow2(
        ((inputBytes + bytesPerBucket - 1) / bytesPerBucket)
          .min(BigInt(MaxBuckets)).toLong)
      else {
        val rowsPerBucket = math.max(1L,
          confLong(spark, "spark.graft.cdcview.bucket.rows", 200000L))
        clampPow2((grouped.count() + rowsPerBucket - 1) / rowsPerBucket)
      }
    // repartition ON the bucket id first: without it every aggregate
    // task holds keys of many buckets and partitionBy writes a
    // (tasks × buckets) file explosion — one small shuffle caps the
    // generation at ~one file per bucket
    grouped
      .withColumn("_b", lit(-1L))
      .withColumn("_vb", bucketCol(buckets))
      .repartition(buckets, col("_vb"))
      .write.partitionBy("_vb").mode("overwrite").parquet(next.toString)
    flattenBuckets(fs, next, "s")
    fs.create(new Path(next, s"_nb-$buckets"), true).close()
    // seed watermark: -1 (pre-stream) — also what makes the staged seed
    // generation COMPLETE for repairSwap
    fs.create(new Path(next, "_b--1"), true).close()
    if (!fs.rename(next, main))
      throw new java.io.IOException(s"CdcMatView seed: rename to $main failed")
    ()
  }

  /** Fold one micro-batch of changelog rows into the summary —
    * O(delta), not O(view) (VERDICT r10 #5): the view is HASH-BUCKETED
    * by key across its generation's bucket count, the batch's delta
    * names the buckets it touches, ONLY those buckets re-aggregate, and
    * every untouched bucket hardlinks into the new generation with its
    * name (and bytes) intact. A pre-bucketing generation (legacy
    * `part-*` files) — or a generation whose size outgrew its bucket
    * count — counts every bucket as touched once, migrating the layout
    * in that merge. Input needs (user_id, amount, _change_type). */
  def maintain(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(viewDir).getFileSystem(conf)
    repairSwap(fs)
    // after repairSwap the current generation IS `main` (a complete
    // `.next` or surviving `.prev` was just promoted) or there is none
    // at all — so ONE listing of it serves replay detection (the `_b-`
    // watermark), the generation's files, and its `_nb-` bucket-count
    // marker, where separate exists/listStatus probes paid five
    // filesystem round-trips per trigger
    val mainLs: Option[Seq[org.apache.hadoop.fs.FileStatus]] =
      try Some(fs.listStatus(new Path(viewDir)).toSeq)
      catch { case _: java.io.FileNotFoundException => None }
    val genNames = mainLs.getOrElse(Seq.empty).map(_.getPath.getName)
    val watermarks =
      genNames.filter(_.startsWith("_b-")).flatMap(_.stripPrefix("_b-").toLongOption)
    val applied: Option[Long] =
      if (watermarks.nonEmpty) Some(watermarks.max)
      else if (mainLs.isEmpty) None
      else { // pre-marker legacy generation: the max `_b` data cell
        val r = read(spark).agg(max(col("_b"))).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
    if (applied.exists(_ >= batchId)) return // replay: no-op
    val genFiles: Seq[org.apache.hadoop.fs.FileStatus] =
      mainLs.getOrElse(Seq.empty)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val curBuckets: Option[Int] =
      genNames.find(_.startsWith("_nb-"))
        .flatMap(_.stripPrefix("_nb-").toIntOption)
        .orElse {
          if (genFiles.nonEmpty &&
              genFiles.forall(s => bucketOfName(s.getPath.getName).isDefined))
            Some(MaxBuckets) // round-11 fixed-count layout
          else None
        }
    // grow-only: the next count covers the current generation's bytes
    val bytesPerBucket = math.max(1L,
      confLong(spark, "spark.graft.cdcview.bucket.bytes", 8L << 20))
    val grown = clampPow2(
      (genFiles.map(_.getLen).sum + bytesPerBucket - 1) / bytesPerBucket)
    val nextBuckets = math.max(curBuckets.getOrElse(1), grown)
    // a layout change (legacy flat files, or a count growth) rewrites
    // everything once; a stable count rewrites only touched buckets
    val migrate = genFiles.nonEmpty && !curBuckets.contains(nextBuckets)

    val w = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    // raw signed rows: (+1, +amount) per insert, (−1, −amount) per
    // delete — pre-aggregated only when bucket detection needs it
    val signed = batch.select(col("user_id"), w.as("n"),
      (w * col("amount")).as("cents"))
    // touched-bucket detection needs a separate pass over the delta (a
    // pre-aggregate + collect, and a persist so the merge below reuses
    // it) — pay that ONLY when the generation actually spreads across
    // buckets. A 1-bucket generation rewrites its whole (single-file)
    // state either way, a migration rewrites everything by definition,
    // and in both cases the raw signed rows fold STRAIGHT into the
    // merge aggregate: per trigger that is one Spark job and one
    // shuffle against the changelog, not two of each
    val needTouched = !migrate && curBuckets.exists(_ > 1)
    val delta = if (!needTouched) None else Some(signed
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      // bucket ids of the CURRENT generation's layout (touched-file
      // detection); the merged output re-derives ids under nextBuckets
      .withColumn("_vb", bucketCol(curBuckets.getOrElse(nextBuckets)))
      .persist())
    try {
      val (rewriteFiles, carryFiles) =
        if (!needTouched) (genFiles, Seq.empty)
        else {
          val touched: Set[Int] = delta.get.select(col("_vb")).distinct()
            .collect().map(_.getInt(0)).toSet
          genFiles.partition(s =>
            bucketOfName(s.getPath.getName).exists(touched))
        }
      val existing =
        if (rewriteFiles.isEmpty) {
          spark.range(0).select(lit("").as("user_id"), lit(0L).as("n"),
            lit(0L).cast(LongType).as("cents")).filter(lit(false))
        } else spark.read.parquet(rewriteFiles.map(_.getPath.toString): _*)
          .select(col("user_id"), col("n"), col("cents"))
      val merged = existing
        .union(delta.fold(signed)(_.select(col("user_id"), col("n"), col("cents"))))
        .groupBy(col("user_id"))
        .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
        .filter(col("n") =!= 0L) // fully-retracted keys leave the view
        .withColumn("_b", lit(batchId))
        .withColumn("_vb", bucketCol(nextBuckets))
      val next = new Path(viewDir + ".next")
      // same bucket-clustering shuffle as [[seed]] — one file per
      // touched bucket, not per (task × bucket)
      merged.repartition(nextBuckets, col("_vb"))
        .write.partitionBy("_vb").mode("overwrite").parquet(next.toString)
      flattenBuckets(fs, next, batchId.toString)
      // untouched buckets: zero-I/O carry-over, names intact
      carryFiles.foreach { s =>
        graft.sources.Compaction.linkOrCopy(fs, conf, s.getPath,
          new Path(next, s.getPath.getName))
      }
      fs.create(new Path(next, s"_nb-$nextBuckets"), true).close()
      // the watermark MARKER: a batch that retracts the view to ZERO rows
      // writes an empty generation with no `_b` cell to carry the
      // high-water mark — a replay after a crash would then re-apply its
      // deltas (negative counts resurrected). The marker file travels
      // with the generation directory, and repairSwap/read treat a
      // marker-less `.next` as incomplete (the replayed batch then merges
      // onto `.prev`, which is exactly the state it first saw).
      fs.create(new Path(next, s"_b-$batchId"), true).close()

      val main = new Path(viewDir)
      val prev = new Path(viewDir + ".prev")
      if (fs.exists(prev)) fs.delete(prev, true)
      if (fs.exists(main) && !fs.rename(main, prev))
        throw new java.io.IOException(s"CdcMatView swap: rename $main -> $prev failed")
      if (!fs.rename(next, main))
        throw new java.io.IOException(s"CdcMatView swap: rename $next -> $main failed")
    } finally delta.foreach { d => d.unpersist(); () }
  }

  /** Same read-repair contract as [[MatView.repairSwap]], with one
    * addition: a `.next` without its `_b-` watermark marker is NOT
    * complete (crash between the parquet write and the marker) — fall
    * back to `.prev` and let the checkpoint replay the batch. */
  private def repairSwap(fs: org.apache.hadoop.fs.FileSystem): Unit = {
    val main = new Path(viewDir)
    if (fs.exists(main)) return
    val prev = new Path(viewDir + ".prev")
    val next = new Path(viewDir + ".next")
    def marked(d: Path): Boolean =
      fs.exists(d) && fs.listStatus(d).exists(_.getPath.getName.startsWith("_b-"))
    if (fs.exists(new Path(next, "_SUCCESS")) && marked(next)) {
      if (!fs.rename(next, main))
        throw new java.io.IOException(s"CdcMatView repair: rename $next -> $main failed")
    } else if (fs.exists(prev)) {
      if (!fs.rename(prev, main))
        throw new java.io.IOException(s"CdcMatView repair: rename $prev -> $main failed")
    }
  }

  /** Current view state (main, proven-complete `.next`, `.prev`, or
    * empty — [[MatView.read]]'s resolution order). */
  def read(spark: SparkSession): DataFrame = {
    val emptyView = spark.range(0).select(
      lit("").as("user_id"), lit(0L).as("n"),
      lit(0L).cast(LongType).as("cents"), lit(-1L).as("_b"))
      .filter(lit(false))
    def tryDir(d: String, requireMarker: Boolean = false): Option[DataFrame] = {
      val fs = new Path(d).getFileSystem(spark.sessionState.newHadoopConf())
      try {
        if (requireMarker) {
          if (!fs.exists(new Path(d, "_SUCCESS"))) return None
          // a generation is complete only WITH its watermark marker
          if (!fs.listStatus(new Path(d))
              .exists(_.getPath.getName.startsWith("_b-"))) return None
        }
        Some(spark.read.parquet(d).select(
          col("user_id"), col("n"), col("cents"), col("_b")))
      }
      catch {
        case _: org.apache.spark.sql.AnalysisException =>
          // a marker-bearing generation with NO parquet files is the
          // fully-retracted EMPTY view — authoritative, never a reason
          // to fall back to the pre-retraction `.prev` (the bucketed
          // partitionBy write emits zero files for zero rows)
          if (fs.exists(new Path(d)) && fs.listStatus(new Path(d))
              .exists(_.getPath.getName.startsWith("_b-"))) Some(emptyView)
          else None
      }
    }
    tryDir(viewDir)
      .orElse(tryDir(viewDir + ".next", requireMarker = true))
      .orElse(tryDir(viewDir + ".prev"))
      .getOrElse(
        spark.range(0).select(
          lit("").as("user_id"), lit(0L).as("n"),
          lit(0L).cast(LongType).as("cents"), lit(-1L).as("_b"))
          .filter(lit(false)))
  }
}

object CdcMatView {
  /** Cap on the adaptive view bucket count. Bucket ids are baked into
    * file names (`b<k>-…`) and each generation records its own count
    * in a `_nb-<n>` marker, so generations with different counts
    * coexist across swaps; a foreign or legacy layout is detected by
    * name/marker and migrated in one full merge. */
  val MaxBuckets = 32

  private val BucketName = "^b(\\d+)-.*\\.parquet$".r

  def bucketOfName(name: String): Option[Int] = name match {
    case BucketName(k) => k.toIntOption.filter(_ < MaxBuckets)
    case _ => None
  }
}
