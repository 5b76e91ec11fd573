package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.distributions
import org.apache.spark.sql.connector.expressions
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.{streaming => sread}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.{streaming => swrite}
import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader AND writer for the reference's entity log at
  * rest (write path documented on [[LogWriteBuilder]]) — the
  * `limits_hashes` row stream (`user_id, amount, msg, sha256sum`;
  * schema recovered in SURVEY §1.1 from `hashes.go:25` and the test
  * fixtures `hashes_test.go:146-162`) as tab-separated lines, one file
  * per producer segment.
  *
  * This is the engine's "build a source, don't just call one" tier, and
  * each hook exists because of what it saves at 100 TB:
  *
  *   - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *     reader parses ONLY requested fields — a `count(user_id)` never
  *     base64-decodes a single msg payload.
  *   - **Filter pushdown** ([[SupportsPushDownFilters]]): the
  *     reference's verification probes are conjunctive equality
  *     lookups (`hashes_test.go:191-203`, SURVEY §2.1 #9); EqualTo on
  *     `user_id` / `sha256sum` / `amount` is evaluated during the
  *     parse, before any row object exists. Everything else is
  *     returned as residual for Spark to evaluate — never silently
  *     dropped.
  *   - **Split planning**: one [[InputPartition]] per file segment —
  *     parallelism scales with the log, no driver-side file content.
  *   - **Reported statistics** ([[SupportsReportStatistics]]): total
  *     byte size (scaled by pruning) feeds Catalyst's broadcast
  *     decision, so a small log on the build side of a join
  *     broadcast-joins without hints.
  *
  * Usage: `spark.read.format("graft.sources.LimitHashLog").load(dir)`.
  */
class LimitHashLog extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (Option(options.get("changeFeed")).exists(_.toBoolean))
      ChangeFeed.LOG_STREAM_SCHEMA
    else LimitHashLog.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    if (Option(properties.get("changeFeed"))
        .orElse(Option(properties.get("changefeed"))).exists(_.toBoolean))
      new LogChangesTable(properties.get("path"))
    else new LimitHashLogTable(properties.get("path"), {
      val path = properties.get("path")
      Option(properties.get("versionAsOf"))
        .orElse(Option(properties.get("versionasof"))).map(_.toLong)
        .orElse(Option(properties.get("timestampAsOf"))
          .orElse(Option(properties.get("timestampasof")))
          .map { t =>
            // accept epoch micros or a timestamp string; parse with
            // Spark's OWN timestamp parser in the SESSION timezone, so
            // this option and SQL `TIMESTAMP AS OF` resolve the same
            // literal to the same instant (a naive literal is
            // session-local, explicit offsets — including negative
            // ones — are honored)
            val micros = t.toLongOption.getOrElse {
              val zone = org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
                org.apache.spark.sql.classic.SparkSession.active
                  .sessionState.conf.sessionLocalTimeZone)
              org.apache.spark.sql.catalyst.util.DateTimeUtils.stringToTimestamp(
                org.apache.spark.unsafe.types.UTF8String.fromString(t), zone)
                .getOrElse(throw new IllegalArgumentException(
                  s"timestampAsOf: unparseable timestamp '$t'"))
            }
            LogVersions.asOfTimestamp(path, micros).getOrElse(
              throw new IllegalArgumentException(
                s"timestampAsOf $t: no version published at or before it in $path"))
          })
    })

  override def supportsExternalMetadata(): Boolean = false
}

object LimitHashLog {
  val SCHEMA: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("msg", BinaryType, nullable = true),
    StructField("sha256sum", StringType, nullable = false)))

  val FORMAT = "graft.sources.LimitHashLog"

  /** Metadata column exposing the segment file NAME a row came from —
    * the log's group identity (Iceberg's `_file` analogue). Provenance
    * queries project it; group-based row-level operations (UPDATE /
    * MERGE / rewrite-DELETE) group and runtime-filter on it. */
  val SEGMENT_COL = "_segment"

  /** Metadata column exposing a row's 0-based LINE ordinal within its
    * segment file — the log tier's row-position domain (the parquet
    * tier's `_metadata.row_index` twin): every physical line counts,
    * visible or masked, so positions are stable under pushdown and
    * masking. Carrier for positional deletion vectors
    * ([[DeletionVectors]]) on the log tier — the DV write side reads
    * it, the read side tests it against the sidecar bitmaps. */
  val LPOS_COL = "_lpos"

  /** Parse-layout index of a projected column: the four data fields sit
    * at their raw TSV positions; [[SEGMENT_COL]] is the virtual fifth,
    * [[LPOS_COL]] the virtual sixth. */
  private[sources] def fieldIdx(name: String): Int =
    if (name == SEGMENT_COL) 4
    else if (name == LPOS_COL) 5
    else SCHEMA.fieldIndex(name)

  /** Segment files of a log directory (sorted for determinism). */
  private[sources] def segments(dir: String): Seq[(String, Long)] = {
    val path = new Path(dir)
    val fs = path.getFileSystem(FsConf.get)
    if (!fs.exists(path)) return Seq.empty
    val it = fs.listStatus(path).toSeq
    // "_" = this writer's staging; "." = hidden (Hadoop .crc sidecars,
    // our .stats zone-map sidecars)
    it.filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
  }

  /** Per-COMMIT stats manifest — `.stats-manifest-<commitId>` maps each
    * committed segment NAME to its [[SegmentStats]] (the Delta/Iceberg
    * shape). One manifest per commit instead of one sidecar per segment
    * keeps planning I/O at O(commits), not O(segments): a log that
    * accumulated 100 k producer flushes still plans its zone maps from
    * a handful of files. A retried commit reuses its deterministic id,
    * so the manifest is replaced, never duplicated. Names (not paths)
    * key the map — directory renames stay free. */
  private[sources] def manifestPath(dir: Path, commitId: String): Path =
    new Path(dir, s".stats-manifest-$commitId")

  /** Returns whether the manifest actually LANDED (rename succeeded).
    * Commit-side callers may ignore the result — a deterministic
    * replay rewrites the same content under the same name — but a FOLD
    * must not: its zfold name is unique, so a lost rename means the
    * fold file never existed anywhere, and deleting the fold's inputs
    * anyway would permanently lose their stats (ADVICE r18). */
  private[sources] def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, commitId: String, stats: Map[String, SegmentStats]): Boolean = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    if (stats.isEmpty) return true
    // temp + rename: a concurrent reader (loadStats, a racing fold)
    // must never observe a half-written manifest (ADVICE r17: an
    // in-place create raced a fold's read, parsed as garbage, and the
    // fold deleted it — losing the stats). The "_" prefix keeps the
    // temp out of both the segment listing and the manifest readers.
    // On a same-name replace (epoch replay / query retry) the delete+
    // rename window exposes either absence or a complete file, never a
    // partial one; a reader that catches the gap just skips the entry.
    val dst = manifestPath(dir, commitId)
    val tmp = new Path(dir,
      s"_tmp-stats-manifest-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write(Serialization.write(stats).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    if (!fs.rename(tmp, dst)) {
      // lost a replace race to an equivalent writer (replays are
      // deterministic per commitId) — drop our temp and defer
      try fs.delete(tmp, false)
      catch { case scala.util.control.NonFatal(_) => () }
      false
    } else true
  }

  /** The stats-manifest listing in MERGE-PRECEDENCE order: fold
    * manifests first (later fold wins among folds), then commit
    * manifests (later name wins, which only collides on same-commit
    * replace). Commit manifests OVERRIDE fold entries: a fold is
    * derived state, and a commit manifest that reappears AFTER its
    * original was folded away (epoch replay, query retry) carries the
    * fresher stats for its own segments — a plain lexicographic sort
    * would let the stale fold win forever (ADVICE r17). */
  private def manifestsOrdered(
      fs: org.apache.hadoop.fs.FileSystem, path: Path): Seq[Path] = {
    val all = fs.listStatus(path).toSeq
      .filter(s => s.isFile && s.getPath.getName.startsWith(".stats-manifest-"))
      .map(_.getPath)
    val (folds, commits) =
      all.partition(_.getName.startsWith(".stats-manifest-zfold-"))
    folds.sortBy(_.getName) ++ commits.sortBy(_.getName)
  }

  /** Union of every stats manifest in the directory, merged in
    * [[manifestsOrdered]] precedence (folds first, commit manifests
    * override). Entries for since-deleted segments are harmless —
    * lookups key off the LIVE segment listing. */
  private[sources] def loadStats(dir: String): Map[String, SegmentStats] = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val path = new Path(dir)
    val fs = path.getFileSystem(FsConf.get)
    if (!fs.exists(path)) return Map.empty
    manifestsOrdered(fs, path)
      .foldLeft(Map.empty[String, SegmentStats]) { (acc, p) =>
        try {
          val in = fs.open(p)
          val bytes = try in.readAllBytes() finally in.close()
          acc ++ Serialization.read[Map[String, SegmentStats]](
            new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        } catch { case scala.util.control.NonFatal(_) => acc }
      }
  }

  /** Fold the commit manifests into ONE once their count crosses the
    * shard-fold threshold ([[SidecarShards.foldThreshold]] — the same
    * O(commits-since-fold) planning contract the parquet tier's shard
    * store keeps, r17): a producer flushing thousands of micro-batches
    * otherwise accumulates one manifest per commit until the next
    * compactLog, and every plan's zone-map load pays the whole
    * listing. Called WRITE-side (after a commit's own manifest lands)
    * so read paths stay read-only. Entries merge in
    * [[manifestsOrdered]] precedence (folds first, commit manifests
    * override — the [[loadStats]] rule, so a commit manifest REPLAYED
    * after its original was folded away still beats the stale fold
    * entry, ADVICE r17). Best-effort and concurrency-tolerant: the
    * fold file lands BEFORE its inputs delete, a vanished input is
    * skipped by any racing reader, only inputs that PARSED delete (an
    * unreadable one — corruption, a mid-replace gap — survives for
    * the next fold rather than silently losing its stats), duplicate
    * folds union to the same entries, a replayed epoch recreates its
    * folded manifest with identical stats, and compactLog's
    * dropOtherManifests still resets everything on truncate/compact.
    * Stale entries for since-deleted segments stay harmless — lookups
    * key off the LIVE segment listing. */
  private[sources] def maybeFoldManifests(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path): Unit = try {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val manifests = manifestsOrdered(fs, dir)
    if (manifests.length < SidecarShards.foldThreshold) return
    val parsed = scala.collection.mutable.ArrayBuffer.empty[Path]
    val merged = manifests.foldLeft(Map.empty[String, SegmentStats]) { (acc, p) =>
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        val entries = Serialization.read[Map[String, SegmentStats]](
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        parsed += p
        acc ++ entries
      } catch { case scala.util.control.NonFatal(_) => acc }
    }
    val landed = writeManifest(fs, dir,
      f"zfold-${System.currentTimeMillis()}%013d-" +
        java.util.UUID.randomUUID().toString.take(8), merged)
    // inputs delete ONLY once the fold file is durably in place: a
    // zfold name is unique (timestamp + uuid), so a lost rename has no
    // "equivalent writer" to fall back on — deleting the parsed inputs
    // would lose the folded segments' stats forever, degrading pruning
    // silently (ADVICE r18). The un-deleted inputs just fold again
    // next time.
    if (landed) parsed.foreach { p =>
      try fs.delete(p, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // reap temp debris crashed writers left behind — age-gated so a
    // LIVE writer's in-flight temp (created, not yet renamed) survives
    val cutoff = System.currentTimeMillis() - 10L * 60L * 1000L
    fs.listStatus(dir).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith("_tmp-stats-manifest-") &&
          s.getModificationTime < cutoff) {
        try fs.delete(s.getPath, false)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Delete every stats manifest except `keep` — truncate semantics:
    * all prior segments are gone, so all prior manifests are stale. */
  private[sources] def dropOtherManifests(fs: org.apache.hadoop.fs.FileSystem,
      dir: Path, keep: String): Unit = {
    if (!fs.exists(dir)) return
    fs.listStatus(dir).foreach { s =>
      val n = s.getPath.getName
      if (s.isFile && n.startsWith(".stats-manifest-") &&
          n != s".stats-manifest-$keep") fs.delete(s.getPath, false)
    }
  }

  /** All segments with their stats; a segment absent from every
    * manifest (external fixture, pre-stats era) maps to None. */
  private[sources] def segmentsWithStats(dir: String): Seq[(String, Long, Option[SegmentStats])] = {
    val stats = loadStats(dir)
    liveSegments(dir).map { case (f, len) => (f, len, stats.get(new Path(f).getName)) }
  }

  /** The LIVE segment set: the latest version's exact name set when the
    * log is versioned ([[LogVersions]]), else the raw listing. All READ
    * planning goes through this (or [[segmentsAt]]) — on a versioned
    * log the listing can contain vacuum-pending segments dropped by a
    * maintenance commit, which must stay invisible. */
  private[sources] def liveSegments(dir: String): Seq[(String, Long)] =
    segmentsAt(dir, None)

  /** Segment set pinned to `version` (None = latest-or-listing). A
    * referenced segment missing from disk means retention was violated
    * (vacuumed under a pinned reader) — fail loudly, never silently
    * under-read. */
  private[sources] def segmentsAt(dir: String, version: Option[Long]): Seq[(String, Long)] = {
    def resolve(names: Seq[String]): Seq[(String, Long)] = {
      val listed = segments(dir).map { case (f, len) => (new Path(f).getName, (f, len)) }.toMap
      names.sorted.map { n =>
        listed.getOrElse(n, throw new IllegalStateException(
          s"segment $n of a pinned version is gone from $dir — vacuumed " +
            "inside the retention window a reader still needed"))
      }
    }
    version match {
      case Some(v) => resolve(LogVersions.get(dir, v).getOrElse(
        throw new IllegalArgumentException(
          s"VERSION AS OF $v: no such version in $dir (never committed, or vacuumed)")))
      case None => LogVersions.latest(dir) match {
        case Some((_, names)) => resolve(names)
        case None => segments(dir)
      }
    }
  }

  /** [[segmentsAt]] restricted to an explicit NAME allowlist
    * (`option("segments", ...)`). Names absent from the snapshot fail
    * loudly on EVERY read path (row scan and metadata-served
    * aggregates alike) — a caller naming a segment this snapshot does
    * not hold is asking for rows it can't provide, and silently
    * serving 0 rows for it would corrupt a change feed. */
  private[sources] def segmentsAllowed(dir: String, version: Option[Long],
      allow: Option[Set[String]]): Seq[(String, Long)] =
    segmentsAndMasksAllowed(dir, version, allow)._1

  /** [[segmentsAllowed]] plus the snapshot's DELETE MASKS
    * ([[DeleteMasks]] on the log tier): per-segment serialized
    * predicates whose matching rows a read must drop. Membership and
    * masks come from the SAME payload read, so a merge-on-read DELETE
    * publishing between two separate reads can never pair one
    * version's names with another's masks. */
  private[sources] def segmentsAndMasksAllowed(dir: String, version: Option[Long],
      allow: Option[Set[String]]): (Seq[(String, Long)], Map[String, Seq[String]]) = {
    def resolve(names: Seq[String]): Seq[(String, Long)] = {
      val listed = segments(dir).map { case (f, len) => (new Path(f).getName, (f, len)) }.toMap
      names.sorted.map { n =>
        listed.getOrElse(n, throw new IllegalStateException(
          s"segment $n of a pinned version is gone from $dir — vacuumed " +
            "inside the retention window a reader still needed"))
      }
    }
    val (all, masks) = version match {
      case Some(v) =>
        val p = VersionLedger.getPayload(dir, v).getOrElse(
          throw new IllegalArgumentException(
            s"VERSION AS OF $v: no such version in $dir (never committed, or vacuumed)"))
        (resolve(p.names), p.masks)
      case None => VersionLedger.latestPayload(dir) match {
        case Some((_, p)) => (resolve(p.names), p.masks)
        case None => (segments(dir), Map.empty[String, Seq[String]])
      }
    }
    val narrowed = allow match {
      case None => all
      case Some(names) =>
        val byName = all.map { case (f, len) => (new Path(f).getName, (f, len)) }.toMap
        names.toSeq.sorted.map { n =>
          byName.getOrElse(n, throw new IllegalArgumentException(
            s"option segments names '$n', which is not in the scanned " +
              s"snapshot of $dir" + version.fold("")(v => s" (VERSION AS OF $v)")))
        }
    }
    (narrowed, masks.filter(_._2.nonEmpty))
  }

  /** Compile one segment's serialized masks into row evaluators over
    * the raw split fields. A mask that deserializes to a shape
    * [[LogDelete.supported]] cannot evaluate fails LOUDLY — silently
    * skipping it would resurrect deleted rows. PREDICATE masks only —
    * split DV entries off first ([[DeletionVectors.split]]). */
  private[sources] def compileMasks(preds: Seq[String]): Seq[Filter] =
    preds.map { json =>
      val f = DeleteMasks.deserialize(json)
      require(LogDelete.supported(f),
        s"log delete mask deserialized to an unevaluable shape: $f " +
          s"(from $json) — refusing to read rows it might have deleted")
      f
    }

  /** One segment's mask list compiled for the line readers: predicate
    * entries as raw-field closures ([[LogDelete.compileRow]]), DV
    * entries as ONE position test over the sidecar bitmaps (positions
    * are 0-based line ordinals within the segment, [[LPOS_COL]]).
    * `tableDir` resolves the `_dv/` sidecars — the segment's parent
    * directory on this tier. */
  private[sources] def compileLineMasks(tableDir: String, preds: Seq[String])
      : (Array[Array[String] => Boolean], DeletionVectors.PositionDeleted) = {
    val (dvRefs, predJsons) = DeletionVectors.split(preds)
    val rows = compileMasks(predJsons).map(LogDelete.compileRow).toArray
    val pd = if (dvRefs.isEmpty) null
      else new DeletionVectors.PositionDeleted(tableDir, dvRefs)
    (rows, pd)
  }

  /** Parse-stage compilation of pushed filters: EqualTo → singleton,
    * In → value set; a raw line passes when every checked field is in
    * its set (string compare on the unparsed field — no row object,
    * no base64 decode, before any materialization). */
  private[sources] def parseChecks(pushed: Array[Filter]): Array[(Int, Set[String])] =
    pushed.collect {
      case EqualTo(a, v) => (SCHEMA.fieldIndex(a), Set(String.valueOf(v)))
      // a null IN-list member matches NOTHING in SQL; String.valueOf
      // would turn it into the text "null" and wrongly match a row whose
      // field is literally that string (ADVICE r7) — drop null members
      // (the ScanBuilder additionally declines to fully-push such an In)
      case In(a, vs) => (SCHEMA.fieldIndex(a),
        vs.filter(_ != null).map(String.valueOf).toSet)
    }

  /** Zone-map + Bloom pruning against equality probes: drop segments
    * whose stats PROVE the value can't be present. Disjunctive value
    * sets (runtime IN filters from join pruning) keep a segment if ANY
    * value might match. Shared by the batch scan, the streaming read,
    * and runtime filtering — a segment without stats is never skipped. */
  private[sources] def zonePrune(dir: String, pushed: Array[Filter]): Seq[(String, Long)] =
    zonePruneOver(dir, liveSegments(dir), pushed)

  /** Zone pruning over an explicit base set — the version-pinned scans
    * hand in their snapshot so pruning can never resurrect or drop a
    * segment relative to the pinned view. */
  private[sources] def zonePruneOver(dir: String, base: Seq[(String, Long)],
      pushed: Array[Filter]): Seq[(String, Long)] = {
    if (pushed.isEmpty) return base
    val eqs = pushed.collect {
      // null IN-list members match nothing (SQL three-valued logic) —
      // exclude them from the probe set; an In reduced to all-nulls is
      // treated as non-pruning (conservative: keep every segment)
      case EqualTo(a, v) => (a, Seq(v))
      case In(a, vs) if vs.exists(_ != null) => (a, vs.toSeq.filter(_ != null))
    }
    if (eqs.isEmpty) return base
    val allStats = loadStats(dir)
    base.map { case (f, len) => (f, len, allStats.get(new Path(f).getName)) }.collect {
      case (f, len, None) => (f, len)
      case (f, len, Some(st)) if {
        lazy val bloom = st.bloom.map(SegmentBloom.fromBase64)
        eqs.forall { case (a, vs) => vs.exists { v => a match {
          case "amount" => v match {
            case n: Number =>
              val x = n.longValue(); x >= st.minAmount && x <= st.maxAmount
            case _ => true
          }
          case "user_id" =>
            val u = UTF8String.fromString(String.valueOf(v))
            u.compareTo(UTF8String.fromString(st.minUserId)) >= 0 &&
              u.compareTo(UTF8String.fromString(st.maxUserId)) <= 0 &&
              bloom.forall(_.mightContain("u:" + String.valueOf(v)))
          case "sha256sum" =>
            // uniform hashes defeat range pruning; the bloom is the
            // skip structure for the reference's verification probe
            bloom.forall(_.mightContain("s:" + String.valueOf(v)))
          case _ => true // no stats tracked for this column
        } } }
      } => (f, len)
    }
  }
}

/** Per-segment statistics, written as a sidecar at COMMIT time (the
  * segment content is immutable from then on, so the stats are exact
  * forever): row count answers COUNT(*) probes from metadata, the
  * min/max pairs are the sparse-index analogue of ClickHouse's primary
  * key — a selective equality probe skips whole segments whose range
  * excludes the value (`hashes_test.go:191-203` is exactly such a
  * probe). String bounds use UTF8String (binary) ordering — the same
  * ordering Spark's comparisons use — so pruning is exact.
  *
  * `bloom` is the ClickHouse `bloom_filter` skip-index analogue for the
  * columns where a [min, max] range can't prune: `sha256sum` is
  * uniformly distributed (every segment's range spans the hash space),
  * yet hash-equality lookup is the reference's PRIMARY verification
  * probe (`hashes_test.go:192-202`). Each committed segment carries an
  * 8 KiB Bloom filter over its `s:<sha256sum>` and `u:<user_id>` values
  * — a definite miss skips the whole segment; a false positive merely
  * reads one (correctness never depends on the filter). */
case class SegmentStats(rows: Long, minUserId: String, maxUserId: String,
    minAmount: Long, maxAmount: Long, bloom: Option[String] = None,
    bucket: Option[Int] = None)

/** Fixed-size (2^16-bit) Bloom filter, Kirsch–Mitzenmacher double
  * hashing over two murmur3 seeds, k = 4 probes. Sized for the log's
  * flush-bounded segments (≲ 8 k rows/segment keeps fpp ≈ 1%; larger
  * segments degrade gracefully toward "never skips", not wrong
  * results). Wire form: base64 of the 1024-long bit array. */
final class SegmentBloom(val bits: Array[Long]) {
  import SegmentBloom._
  def add(s: String): Unit = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, SEED1)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, SEED2)
    var i = 0
    while (i < K) {
      val b = math.floorMod(h1 + i * h2, M)
      bits(b >>> 6) |= 1L << (b & 63)
      i += 1
    }
  }
  def mightContain(s: String): Boolean = {
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, SEED1)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, SEED2)
    var i = 0
    while (i < K) {
      val b = math.floorMod(h1 + i * h2, M)
      if ((bits(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }
  /** Bitwise OR — the union filter answers membership for the combined
    * value set (compaction merges segment blooms this way; exact, no
    * rebuild needed). */
  def union(o: SegmentBloom): SegmentBloom = {
    val b = bits.clone()
    var i = 0
    while (i < b.length) { b(i) |= o.bits(i); i += 1 }
    new SegmentBloom(b)
  }

  def toBase64: String = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }
}

object SegmentBloom {
  private val M = 1 << 16 // bits
  private val K = 4
  private val SEED1 = 0x9747b28c
  private val SEED2 = 0x85ebca6b
  def empty(): SegmentBloom = new SegmentBloom(new Array[Long](M / 64))

  /** Decode memo: a zone probe with an `In` of thousands of members
    * (merge-on-read MERGE key masks) evaluates one `EqualTo` per
    * member, and each used to re-decode the 8 KiB filter from base64 —
    * thousands of decodes per segment per classification. Keyed by the
    * base64 text itself; bounded by a wholesale clear (filters are
    * per-segment and tables hold bounded segment counts, so the cap is
    * a leak backstop, not a working-set limit). */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[String, SegmentBloom]()
  def fromBase64(b64: String): SegmentBloom = {
    val hit = decodeCache.get(b64)
    if (hit != null) return hit
    val bb = java.nio.ByteBuffer.wrap(java.util.Base64.getDecoder.decode(b64))
    val arr = new Array[Long](M / 64)
    var i = 0
    while (i < arr.length && bb.remaining() >= 8) { arr(i) = bb.getLong; i += 1 }
    val decoded = new SegmentBloom(arr)
    if (decodeCache.size() > 4096) decodeCache.clear()
    decodeCache.putIfAbsent(b64, decoded)
    decoded
  }
}

class LimitHashLogTable(path: String, version: Option[Long] = None)
    extends Table with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {
  override def name(): String =
    s"limit_hash_log(`$path`)" + version.fold("")(v => s" VERSION AS OF $v")

  private def requireCurrent(op: String): Unit =
    if (version.isDefined) throw new UnsupportedOperationException(
      s"$op on a VERSION AS OF snapshot — time-travel tables are read-only")

  /** `_segment` — the segment file name a row belongs to (Iceberg's
    * `_file`): provenance when projected, the GROUP identity for
    * copy-on-write UPDATE / MERGE / DELETE ([[LogRowLevelOperation]]). */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(LogSegmentMetaColumn, LogLposMetaColumn)

  /** SQL `UPDATE` / `MERGE INTO` / rewrite-`DELETE` — Spark's
    * group-based row-level-operations API; full design on
    * [[LogRowLevelOperation]]. (Zone-provable DELETEs keep taking the
    * metadata-only `SupportsDelete` path above — the optimizer converts
    * a rewritten DELETE back when `canDeleteWhere` accepts it.) */
  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    requireCurrent(info.command.toString)
    new RowLevelOperationBuilder {
      override def build(): RowLevelOperation =
        new LogRowLevelOperation(path, info.command)
    }
  }

  // Row-level DELETE (SQL `DELETE FROM graft.<ns>.<t> WHERE p` via the
  // catalog, `deleteWhere` via the API) — zone-classified metadata-first
  // delete, full design on [[LogDelete]].
  override def canDeleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    version.isEmpty && filters.forall(LogDelete.supported)
  override def deleteWhere(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    requireCurrent("DELETE")
    LogDelete.deleteWhere(
      org.apache.spark.sql.classic.SparkSession.active, path, filters)
  }
  override def truncateTable(): Boolean = {
    requireCurrent("TRUNCATE"); LogDelete.truncateAll(path); true
  }
  override def schema(): StructType = LimitHashLog.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LimitHashLogScanBuilder(path,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt),
      Option(options.get("maxPartitionBytes")).map(_.toLong)
        .getOrElse(128L * 1024 * 1024),
      columnar = Option(options.get("columnar")).forall(_.toBoolean),
      maxBytesPerTrigger = Option(options.get("maxBytesPerTrigger")).map(_.toLong),
      version = version,
      startVersion = Option(options.get("startVersion")).map(_.toLong),
      segmentsAllow = Option(options.get("segments"))
        .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSet))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    requireCurrent("WRITE")
    new LogWriteBuilder(path, info.queryId(), info.options())
  }
}

/** DSv2 WRITE path — the reference's batch sink semantics
  * (`hashes.go:75-96`: accumulate, flush as one unit, never partially
  * visible) expressed through the V2 commit protocol:
  *
  *   - **Staged files**: each task writes
  *     `_staged-<queryId>-<partition>-<task>` — the `_` prefix keeps
  *     in-flight output invisible to [[LimitHashLog.segments]] readers,
  *     so a concurrent scan NEVER sees a half-written batch (the
  *     reference gets this from ClickHouse insert atomicity; a file log
  *     has to stage).
  *   - **Driver commit**: renames exactly the files named in the task
  *     commit messages to `segment-<queryId>-<partition>` — a
  *     DETERMINISTIC name per (query, partition), so a whole-stage
  *     retry or speculative duplicate can only replace its own output,
  *     never double it (the same effectively-once key the parquet
  *     batchId sink uses, SURVEY §2.1 #3).
  *   - **Abort**: deletes staged files; committed segments are
  *     untouched.
  *   - **Truncate** (`mode("overwrite")`): old segments are removed
  *     inside `commit()`, after every new staged file exists — the
  *     closest a rename-based log gets to atomic replace, and failure
  *     before commit leaves the old data fully intact.
  */
class LogWriteBuilder(path: String, queryId: String,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends WriteBuilder with SupportsOverwrite {
  private var doTruncate = false
  private var owFilters: Option[Array[Filter]] = None
  override def truncate(): WriteBuilder = { doTruncate = true; this }

  /** REPLACE WHERE — `df.writeTo(t).overwrite(cond)` / `INSERT INTO t
    * REPLACE WHERE cond`: atomically retire every CURRENT row matching
    * the condition and land the payload, the classic idempotent
    * backfill (re-load one day of a 100 TB log without touching the
    * rest). Delete side = [[LogDelete]]'s three-valued zone classify —
    * cold segments whose zones can't match are NEVER read — and on a
    * versioned log the retirement, the rewritten survivors and the new
    * payload publish as ONE version: readers see the old state or the
    * new, nothing between. Un-versioned logs keep the delete tier's
    * rename-in-then-remove contract (transient old ∪ new, never a
    * gap). Only [[LogDelete.supported]] conditions are accepted —
    * `canOverwrite` declines the rest at planning, so Spark reports a
    * clean analysis error instead of a half-applied overwrite. */
  override def canOverwrite(filters: Array[Filter]): Boolean =
    filters.forall(LogDelete.supported)
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(filters.forall(LogDelete.supported),
      s"unsupported REPLACE WHERE filters: ${filters.mkString(", ")}")
    owFilters = Some(filters)
    this
  }

  /** `option("bucketBy", "col:n")` → bucketed layout ([[LogBucketing]]).
    * Validated at PLANNING: a spec conflicting with the log's pinned
    * one fails before any task runs. */
  private val declared: Option[LogBucketing.Spec] =
    Option(options.get("bucketBy")).map(LogBucketing.parseOption)
  declared.foreach { s =>
    LogBucketing.readSpec(path).foreach(ex => require(ex == s,
      s"log at $path is bucketed as $ex; write declared $s"))
  }

  /** Effective BATCH spec: the declared option, or the table's pinned
    * `.bucketspec` — a plain `INSERT INTO` a bucketed log keeps the
    * layout without the caller pre-clustering anything (before r10 it
    * silently landed untagged segments and downgraded the table's
    * storage-partitioned joins until the next compaction). */
  private def batchBucket: Option[LogBucketing.Spec] =
    declared.orElse(LogBucketing.readSpec(path))

  override def build(): Write = {
    val bucket = batchBucket
    new Write with RequiresDistributionAndOrdering {
      /** Bucketed writes ask Spark to arrange the data: clustered by the
        * bucket column into EXACTLY n partitions. [[LogBucketing.bucketOf]]
        * is bit-for-bit Spark's own `HashPartitioning` hash (murmur3 seed
        * 42, pmod), so partition id == bucket id and each task writes
        * exactly ONE tagged segment — n files total per insert, no n×m
        * small-file blowup, no manual repartition at call sites (plain
        * column clustering, no FunctionCatalog needed to resolve it).
        * An already-clustered input (`repartition(n, col)` upstream)
        * collapses with this requirement into a single exchange
        * (CollapseRepartition), so writeBucketed-style callers pay
        * nothing extra. Unbucketed logs require nothing. */
      override def requiredDistribution(): distributions.Distribution =
        bucket match {
          case Some(s) => distributions.Distributions.clustered(
            Array(Expressions.column(s.col)))
          case None => distributions.Distributions.unspecified()
        }
      override def requiredNumPartitions(): Int = bucket.fold(0)(_.n)
      override def requiredOrdering(): Array[expressions.SortOrder] = Array.empty

      override def toBatch: BatchWrite =
        new LogBatchWrite(path, queryId, doTruncate, bucket, owFilters)
      override def toStreaming: swrite.StreamingWrite = {
        require(declared.isEmpty,
          "bucketed writes are batch-only (stream into an unbucketed log, " +
            "then compact into the bucketed layout)")
        require(owFilters.isEmpty,
          "REPLACE WHERE is batch-only (streaming output modes map to " +
            "append/truncate, not conditional overwrite)")
        new LogStreamingWrite(path, queryId, doTruncate)
      }
    }
  }
}

/** STREAMING write into the entity log — the reference's whole job
  * (`connect.go:75` + `hashes.go:35`: buffered rows → batched,
  * effectively-once inserts into `limits_hashes`) through this
  * connector: `df.writeStream.format(LimitHashLog.FORMAT)` lands each
  * micro-batch as log segments via the same staged-commit protocol as
  * the batch path, with the EPOCH in the committed name —
  * `segment-<queryId>-<epochId>-<partition>` — so a replayed epoch
  * (failure between sink commit and offset-log write) REPLACES its own
  * segments instead of duplicating them. That is the exactly-once sink
  * contract Structured Streaming asks of a DSv2 streaming writer, and
  * precisely the dedup key the reference lacks (its at-most-once race,
  * SURVEY §0).
  *
  * Truncate (complete/update output modes): when the WriteBuilder saw
  * `truncate()`, each epoch's commit removes every segment that is not
  * part of the epoch being committed — new segments are renamed into
  * place FIRST, then stale ones deleted, so a concurrent reader sees
  * (old ∪ new) transiently but never an empty log. Without this, a
  * complete-mode query would re-append its full result every trigger. */
class LogStreamingWrite(path: String, queryId: String, truncate: Boolean = false)
    extends swrite.StreamingWrite {

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): swrite.StreamingDataWriterFactory =
    new LogStreamingWriterFactory(path, queryId)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(FsConf.get)
    val versioned = LogVersions.enabled(path)
    val old = if (truncate && !versioned) LimitHashLog.segments(path).map(_._1)
      else Seq.empty
    val committed = scala.collection.mutable.Set.empty[String]
    val committedNames = scala.collection.mutable.Set.empty[String]
    val manifest = Map.newBuilder[String, SegmentStats]
    messages.foreach { case LogCommit(staged, pid, stats) =>
      if (staged.nonEmpty) { // empty partitions stage nothing
        val to = new Path(dir, s"segment-$queryId-$epochId-$pid")
        if (fs.exists(to)) fs.delete(to, false) // epoch replay: replace
        if (!fs.rename(new Path(staged), to)) {
          // HDFS signals rename failure by returning false, not throwing;
          // swallowing it would silently drop this partition's rows
          throw new java.io.IOException(
            s"LimitHashLog streaming commit: rename $staged -> $to failed")
        }
        stats.foreach(st => manifest += (to.getName -> st))
        committed += to.toString
        committedNames += to.getName
      }
    }
    // one manifest per epoch (replay overwrites the same name); fold
    // once the count crosses the threshold so a long-running stream's
    // planning I/O stays O(commits-since-fold)
    LimitHashLog.writeManifest(fs, dir, s"$queryId-$epochId", manifest.result())
    LimitHashLog.maybeFoldManifests(fs, dir)
    if (versioned) {
      // snapshot commit: the new version IS the visibility event; old
      // segments stay on disk for pinned readers until vacuum
      LogVersions.commit(path)(prev =>
        if (truncate) committedNames.toSeq
        else (prev.toSet ++ committedNames).toSeq)
    } else {
      // truncate semantics: this epoch's output REPLACES the log. The old
      // listing can include this epoch's own prior attempt (replay) — those
      // names were already replaced above, so exclude them from deletion;
      // prior manifests are wholly stale once their segments are gone.
      old.filterNot(committed).foreach(f => fs.delete(new Path(f), false))
      if (truncate) LimitHashLog.dropOtherManifests(fs, dir, s"$queryId-$epochId")
    }
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(FsConf.get)
    messages.foreach {
      case LogCommit(staged, _, _) if staged.nonEmpty =>
        val p = new Path(staged)
        if (fs.exists(p)) fs.delete(p, false)
      case _ =>
    }
  }
}

class LogStreamingWriterFactory(path: String, queryId: String)
    extends swrite.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new LogDataWriter(path, s"$queryId-$epochId", partitionId, taskId)
}

case class LogCommit(staged: String, partitionId: Int,
    stats: Option[SegmentStats] = None) extends WriterCommitMessage

class LogBatchWrite(path: String, queryId: String, truncate: Boolean,
    bucket: Option[LogBucketing.Spec] = None,
    overwrite: Option[Array[Filter]] = None)
    extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new LogWriterFactory(path, queryId, bucket)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(FsConf.get)
    // pin (or re-validate) the layout spec BEFORE anything becomes
    // visible — a conflicting concurrent declaration aborts the commit
    bucket.foreach(s => LogBucketing.writeSpec(path, s))
    val versioned = LogVersions.enabled(path)
    val old = if (truncate && !versioned) LimitHashLog.segments(path).map(_._1)
      else Seq.empty
    val committed = scala.collection.mutable.Set.empty[String]
    val committedNames = scala.collection.mutable.Set.empty[String]
    val manifest = Map.newBuilder[String, SegmentStats]
    def rename(staged: String, to: Path, stats: Option[SegmentStats]): Unit = {
      if (fs.exists(to)) fs.delete(to, false) // same-query retry: replace, never duplicate
      if (!fs.rename(new Path(staged), to)) {
        // rename failure is a boolean on Hadoop FileSystem; a silent
        // false would drop this partition while the job reports success
        throw new java.io.IOException(
          s"LimitHashLog batch commit: rename $staged -> $to failed")
      }
      stats.foreach(st => manifest += (to.getName -> st))
      committed += to.toString
      committedNames += to.getName
    }
    messages.foreach {
      case LogCommit(staged, pid, stats) =>
        if (staged.nonEmpty) { // empty partitions stage nothing
          rename(staged, new Path(dir, s"segment-$queryId-$pid"), stats)
        }
      case LogBucketedCommit(parts, pid) =>
        parts.foreach { case (staged, b, st) =>
          rename(staged, new Path(dir, s"segment-$queryId-$pid-b$b"), Some(st))
        }
    }
    // one manifest per commit (a retried query overwrites its own);
    // fold past the threshold — planning I/O O(commits-since-fold)
    LimitHashLog.writeManifest(fs, dir, queryId, manifest.result())
    LimitHashLog.maybeFoldManifests(fs, dir)

    // REPLACE WHERE: retire every pre-existing row matching the
    // condition, via the delete tier's zone classify + distributed
    // rewrite. Inputs are fenced against THIS write's own output —
    // the appended payload (which typically matches the condition: a
    // backfill re-loads the very partition it replaces) and a retry's
    // already-renamed rewrite outputs. On a versioned log the renamed
    // appends are unpublished (invisible) at this point, so the single
    // publish below is the only visibility event; un-versioned readers
    // see (old ∪ new) transiently, the delete tier's standing contract.
    require(overwrite.isEmpty || !truncate,
      "overwrite-by-filter and truncate are mutually exclusive")
    // MERGE-ON-READ REPLACE WHERE — the backfill without the rewrite:
    // zone-proof Drop segments retire metadata-only, the condition
    // lands as a DELETE MASK on every might-match segment, and the
    // payload joins the membership in the SAME publish — zero
    // pre-existing bytes rewritten, O(payload) write amplification.
    // THIS write's own renamed segments are fenced out of the
    // classification (a backfill's payload typically matches the very
    // condition it replaces). A trivially-TRUE condition or a shape
    // the mask codec refuses keeps the copy-on-write path below.
    val morReplace: Option[(Set[String], Map[String, Seq[String]])] =
      overwrite.flatMap { filters =>
        val spark = org.apache.spark.sql.classic.SparkSession.active
        val whole: Filter = filters.toSeq
          .reduceOption(org.apache.spark.sql.sources.And)
          .getOrElse(org.apache.spark.sql.sources.AlwaysTrue())
        if (!versioned || !DeleteMasks.mergeOnRead(spark) ||
            whole == org.apache.spark.sql.sources.AlwaysTrue()) None
        else DeleteMasks.serialize(whole).map { maskJson =>
          val verdicts = LimitHashLog.segmentsWithStats(path)
            .map { case (f, _, st) =>
              (new Path(f).getName, LogDelete.classify(filters, st))
            }
            .filterNot { case (n, _) => committedNames(n) }
          val drops = verdicts.collect { case (n, LogDelete.Drop) => n }.toSet
          val masked = verdicts.collect { case (n, LogDelete.Rewrite) => n }
          (drops, masked.map(_ -> Seq(maskJson)).toMap)
        }
      }
    // PRIOR delete masks on the replaced inputs (merge-on-read log
    // DELETEs): the rewrite must not resurrect masked rows, and the
    // publish is guarded so a mask landing mid-operation aborts loudly
    val priorMasks: Map[String, Seq[String]] =
      if (versioned && overwrite.isDefined && morReplace.isEmpty)
        LimitHashLog.segmentsAndMasksAllowed(path, None, None)._2
      else Map.empty
    val replaced: Option[(Seq[String], Seq[String])] =
      if (morReplace.isDefined) None
      else overwrite.map { filters =>
        val delId = s"ow-$queryId"
        val spark = org.apache.spark.sql.classic.SparkSession.active
        // a crashed prior attempt may have recorded removals it never
        // finished (un-versioned tier): complete them before re-planning
        LogDelete.resumeMarker(fs, dir, delId)
        LogDelete.applyDelete(spark, path, filters, delId,
          fence = Seq(s"segment-$queryId-", s"segment-$delId-"), priorMasks)
      }

    morReplace match {
      case Some((drops, masks)) =>
        // classification proved no row matches AND the payload is
        // empty → genuine no-op, no version churn
        if (drops.isEmpty && masks.isEmpty && committedNames.isEmpty) return
        LogVersions.commitGuarded(path, masks, None) { prev =>
          (prev.toSet -- drops ++ committedNames).toSeq
        }
        MaskPressure.afterMaskPublish(
          org.apache.spark.sql.classic.SparkSession.active, path)
        return
      case None => ()
    }

    if (versioned) {
      // snapshot commit: publish the next version; truncated-away
      // segments stay physically present for pinned readers (vacuum is
      // the retention knob), and prior manifests stay for their zones
      val guard = replaced.flatMap { case (removed, _) =>
        if (removed.isEmpty) None
        else Some(VersionLedger.MaskGuard(removed.toSet,
          priorMasks.view.filterKeys(removed.toSet).toMap))
      }
      LogVersions.commitGuarded(path, Map.empty, guard)(prev =>
        if (truncate) committedNames.toSeq
        else replaced match {
          case Some((removed, added)) =>
            (prev.toSet -- removed ++ added ++ committedNames).toSeq
          case None => (prev.toSet ++ committedNames).toSeq
        })
    } else {
      // a retried query's old listing can contain names this commit just
      // replaced — never delete what we committed moments ago; truncate
      // leaves no prior segments, so prior manifests are wholly stale
      old.filterNot(committed).foreach(f => fs.delete(new Path(f), false))
      if (truncate) LimitHashLog.dropOtherManifests(fs, dir, queryId)
      replaced.foreach { case (removed, _) =>
        if (removed.nonEmpty) {
          LogDelete.fencedRemove(fs, dir, s"ow-$queryId", removed)
        }
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(FsConf.get)
    messages.foreach {
      case LogCommit(staged, _, _) if staged.nonEmpty =>
        val p = new Path(staged)
        if (fs.exists(p)) fs.delete(p, false)
      case LogBucketedCommit(parts, _) =>
        parts.foreach { case (staged, _, _) =>
          val p = new Path(staged)
          if (fs.exists(p)) fs.delete(p, false)
        }
      case _ =>
    }
  }
}

class LogWriterFactory(path: String, queryId: String,
    bucket: Option[LogBucketing.Spec] = None) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    bucket match {
      case Some(spec) => new LogBucketedDataWriter(path, queryId, partitionId, taskId, spec)
      case None => new LogDataWriter(path, queryId, partitionId, taskId)
    }
}

/** TSV encoder + running EXACT stats for one staged segment file — the
  * unit both the plain and the bucketed writer compose. LAZY open: a
  * writer that never sees a row leaves no file (file sources pay a task
  * per segment forever after; the reference likewise never flushes an
  * empty batch, hashes.go:55-63). */
private[sources] final class SegmentFileWriter(path: String, stagedName: String) {
  private val staged = new Path(path, stagedName)
  private val fs = staged.getFileSystem(FsConf.get)
  private var out: java.io.BufferedWriter = _

  // The line layout has no escaping (matching the reference's plain TSV
  // rows); a tab/newline inside a string field would silently shift every
  // later field on read. The binary msg column is base64-armored, but the
  // string columns must fail LOUDLY at write time, not round-trip corrupt.
  private def checkedField(v: String, name: String): String = {
    if (v.indexOf('\t') >= 0 || v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0)
      throw new java.io.IOException(
        s"LimitHashLog: field '$name' contains a tab/newline, which the " +
          s"tab-separated segment layout cannot represent: ${v.take(80)}")
    v
  }

  // running segment stats for the commit-time sidecar (exact: the
  // segment is immutable once committed). UTF8String (binary) ordering
  // for the string bounds — what Spark's own comparisons use.
  private var nRows = 0L
  private var minUid: UTF8String = _
  private var maxUid: UTF8String = _
  private var minAmt = Long.MaxValue
  private var maxAmt = Long.MinValue
  private val bloom = SegmentBloom.empty() // s:<sha> and u:<uid> entries

  def write(row: InternalRow): Unit = {
    if (out == null) {
      out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))
    }
    val msg = if (row.isNullAt(2)) ""
      else java.util.Base64.getEncoder.encodeToString(row.getBinary(2))
    val uid = row.getUTF8String(0)
    val amt = row.getLong(1)
    val sha = checkedField(row.getUTF8String(3).toString, "sha256sum")
    out.write(checkedField(uid.toString, "user_id"))
    out.write('\t'); out.write(amt.toString)
    out.write('\t'); out.write(msg)
    out.write('\t'); out.write(sha)
    out.write('\n')
    nRows += 1
    // clone on retention: the UTF8String is backed by a reused row buffer
    if (minUid == null || uid.compareTo(minUid) < 0) minUid = uid.clone()
    if (maxUid == null || uid.compareTo(maxUid) > 0) maxUid = uid.clone()
    if (amt < minAmt) minAmt = amt
    if (amt > maxAmt) maxAmt = amt
    bloom.add("s:" + sha)
    bloom.add("u:" + uid.toString)
  }

  /** Close and return (stagedPath, stats); None if no row ever arrived. */
  def finish(): Option[(String, SegmentStats)] = {
    if (out == null) return None
    out.close()
    Some((staged.toString,
      SegmentStats(nRows, minUid.toString, maxUid.toString, minAmt, maxAmt,
        Some(bloom.toBase64))))
  }

  def abort(): Unit = {
    if (out != null) out.close()
    if (fs.exists(staged)) fs.delete(staged, false)
  }
}

/** TSV row writer for one task attempt. Attempt-unique staged name —
  * speculative attempts never clobber each other; only the attempt
  * whose message reaches `commit()` becomes visible. */
class LogDataWriter(path: String, queryId: String, partitionId: Int, taskId: Long)
    extends DataWriter[InternalRow] {
  private val w = new SegmentFileWriter(path, s"_staged-$queryId-$partitionId-$taskId")

  override def write(row: InternalRow): Unit = w.write(row)

  override def commit(): WriterCommitMessage = w.finish() match {
    case None => LogCommit("", partitionId) // empty: nothing staged
    case Some((staged, stats)) => LogCommit(staged, partitionId, Some(stats))
  }

  override def abort(): Unit = w.abort()

  override def close(): Unit = ()
}

/** BUCKETED task writer ([[LogBucketing]]): each row's bucket is
  * computed from its own key bytes — never inferred from the incoming
  * partitioning — and lands in that bucket's staged file, so the layout
  * contract holds under ANY upstream distribution (a pre-clustered
  * write just produces one file here; a pathological one produces up
  * to n small files, which compaction later merges per-bucket). */
class LogBucketedDataWriter(path: String, queryId: String, partitionId: Int,
    taskId: Long, spec: LogBucketing.Spec)
    extends DataWriter[InternalRow] {
  private val keyIdx = LimitHashLog.SCHEMA.fieldIndex(spec.col)
  private val perBucket = scala.collection.mutable.Map.empty[Int, SegmentFileWriter]

  override def write(row: InternalRow): Unit = {
    val b = LogBucketing.bucketOf(row.getUTF8String(keyIdx), spec.n)
    perBucket.getOrElseUpdate(b, new SegmentFileWriter(path,
      s"_staged-$queryId-$partitionId-$taskId-b$b")).write(row)
  }

  override def commit(): WriterCommitMessage =
    LogBucketedCommit(perBucket.toSeq.sortBy(_._1).flatMap { case (b, w) =>
      w.finish().map { case (staged, st) => (staged, b, st.copy(bucket = Some(b))) }
    }, partitionId)

  override def abort(): Unit = perBucket.values.foreach(_.abort())

  override def close(): Unit = ()
}

/** Commit message of a bucketed task: (stagedPath, bucket, stats) per
  * bucket file this task produced. */
case class LogBucketedCommit(parts: Seq[(String, Int, SegmentStats)],
    partitionId: Int) extends WriterCommitMessage

class LimitHashLogScanBuilder(path: String, maxFilesPerTrigger: Option[Int] = None,
    maxPartitionBytes: Long = 128L * 1024 * 1024, columnar: Boolean = true,
    maxBytesPerTrigger: Option[Long] = None, version: Option[Long] = None,
    startVersion: Option[Long] = None,
    segmentsAllow: Option[Set[String]] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownAggregates with SupportsPushDownLimit {
  private var required: StructType = LimitHashLog.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  private var aggTags: Seq[String] = Seq.empty
  private var aggStats: Seq[SegmentStats] = Seq.empty
  private var limit: Option[Int] = None

  /** LIMIT pushdown — `SELECT ... LIMIT n` over a 100 TB log must not
    * open every segment. Partial push (Spark keeps its global Limit on
    * top): the scan truncates its SPLIT LIST once the stats manifests
    * prove ≥ n rows are already covered (exact row counts, only
    * legal with no pushed/runtime filters — a filtered scan emits
    * fewer rows than stats promise), and every reader stops parsing
    * after n emitted rows regardless. */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // push conjunctive equality and IN-sets on parse-cheap fields (the
  // reference's probe shape, plus the key-list probes runtime filtering
  // produces); anything else stays residual and Spark evaluates it
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val cols = Seq("user_id", "sha256sum", "amount")
    val (ours, residual) = filters.partition {
      case EqualTo(a, _) => cols.contains(a)
      // an In containing a null member stays residual: pushed filters
      // are fully source-evaluated, and the parse-stage string compare
      // cannot express "NULL matches nothing" (ADVICE r7)
      case In(a, vs) => cols.contains(a) && vs.nonEmpty && !vs.contains(null)
      case _ => false
    }
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  /** AGGREGATE pushdown — the reference's main probe is a bare
    * `SELECT COUNT(*)` over the log (`hashes_test.go:227-233`); with
    * per-segment stats sidecars that probe (and global MIN/MAX of the
    * stats-covered columns) is answerable from METADATA — zero row
    * bytes read, zero lines parsed, at any log size. Pushdown is
    * accepted only when it is provably exact: no grouping, no pushed
    * filters (a filtered count needs the rows), and a stats sidecar
    * present for EVERY segment (a log with foreign segments falls back
    * to the scan path). Complete pushdown: the returned row is final. */
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean =
    translate(agg) match {
      // capture the PROVEN (segment, stats) snapshot at acceptance time:
      // planInputPartitions must answer from exactly this set, not a
      // re-listing — a segment appearing in between (concurrent writer)
      // would otherwise be silently dropped from the pushed COUNT/MIN/MAX
      // (ADVICE r7)
      case Some((tags, stats)) => aggTags = tags; aggStats = stats; true
      case None => false
    }

  private def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _ => None
    }

  private def translate(agg: Aggregation): Option[(Seq[String], Seq[SegmentStats])] = {
    if (pushed.nonEmpty || agg.groupByExpressions.nonEmpty) return None
    // an optimizer-pruned aggregation can arrive EMPTY (e.g. count()
    // over an already-aggregated frame) — declining keeps readSchema
    // honest; accepting would promise zero columns over a row scan
    if (agg.aggregateExpressions.isEmpty) return None
    val tags = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => "count_star"
      case m: Min => fieldOf(m.column) match {
        case Some("amount") => "min_amount"
        case Some("user_id") => "min_user"
        case _ => return None
      }
      case m: Max => fieldOf(m.column) match {
        case Some("amount") => "max_amount"
        case Some("user_id") => "max_user"
        case _ => return None
      }
      case _ => return None
    }
    // every segment must carry stats, or the answer can't come from
    // metadata (checked LAST — it reads a sidecar per segment); the
    // snapshot honors a VERSION AS OF pin — a time-travel COUNT(*)
    // answers from the pinned set's stats, not the current log's
    val stats = LimitHashLog.loadStats(path)
    val (segs, masks) =
      LimitHashLog.segmentsAndMasksAllowed(path, version, segmentsAllow)
    // a MASKED segment's stats claim rows a merge-on-read DELETE hid —
    // a metadata-served COUNT/MIN/MAX would overcount; fall back to the
    // (mask-aware) row scan
    if (segs.exists { case (f, _) =>
        masks.contains(new org.apache.hadoop.fs.Path(f).getName) }) return None
    val withStats = segs
      .map { case (f, _) => stats.get(new org.apache.hadoop.fs.Path(f).getName) }
    if (withStats.forall(_.isDefined)) Some((tags, withStats.flatten))
    else None
  }

  override def build(): Scan =
    new LimitHashLogScan(path, required, pushed, maxFilesPerTrigger,
      maxPartitionBytes, columnar, aggTags, maxBytesPerTrigger, aggStats,
      limit, version, startVersion, segmentsAllow)
}

/** Sum-aggregated scan metrics (driver-reported; keyed into the SQL
  * metrics panel of the scan node). One concrete zero-arg class per
  * metric — the UI status listener re-instantiates them by reflection. */
class SegmentsTotalMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "segmentsTotal"
  override def description(): String = "log segments listed"
}
class SegmentsPrunedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "segmentsPruned"
  override def description(): String = "segments skipped by zone map / Bloom / runtime filter"
}
class SplitsPlannedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "splitsPlanned"
  override def description(): String = "bin-packed input splits"
}
class SegmentsTruncatedByLimitMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "segmentsTruncatedByLimit"
  override def description(): String = "segments dropped by proven-coverage LIMIT truncation"
}
class MetadataAggServedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "metadataAggServed"
  override def description(): String = "aggregate queries answered from stats manifests (no segment opened)"
}
class LinesParsedMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "linesParsed"
  override def description(): String = "raw segment lines parsed by tasks"
}
class RowsEmittedAtParseMetric extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "rowsEmittedAtParse"
  override def description(): String = "rows surviving parse-stage pushed filters"
}

private[sources] case class LogDriverMetric(n: String, v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = n
  override def value(): Long = v
}

class LimitHashLogScan(path: String, required: StructType, pushed: Array[Filter],
    maxFilesPerTrigger: Option[Int] = None,
    maxPartitionBytes: Long = 128L * 1024 * 1024,
    columnar: Boolean = true,
    aggTags: Seq[String] = Seq.empty,
    maxBytesPerTrigger: Option[Long] = None,
    aggStats: Seq[SegmentStats] = Seq.empty,
    limit: Option[Int] = None,
    version: Option[Long] = None,
    startVersion: Option[Long] = None,
    segmentsAllow: Option[Set[String]] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering with SupportsReportPartitioning {

  /** The scan's SNAPSHOT: resolved ONCE per scan — explicitly pinned
    * (`VERSION AS OF`), or the latest version of a versioned log, or
    * the listing. Planning, runtime-filter re-planning and the cost
    * model all answer from this one set, so a maintenance commit (or
    * concurrent writer) landing mid-query can never add, drop, or
    * duplicate segments under a running scan.
    *
    * `option("segments", "a,b")` restricts the snapshot to an explicit
    * NAME allowlist at planning time (no splits are even built for the
    * rest) — the change-feed reader ([[ChangeFeed]]) uses it to read
    * exactly the segments a version diff identified. Names absent from
    * the snapshot fail loudly: a caller naming a segment this version
    * does not hold is asking for rows the snapshot can't provide. */
  private lazy val pinnedState: (Seq[(String, Long)], Map[String, Seq[String]]) =
    LimitHashLog.segmentsAndMasksAllowed(path, version, segmentsAllow)

  private def pinnedSegments: Seq[(String, Long)] = pinnedState._1

  /** The pinned version's DELETE MASKS (merge-on-read log DELETEs),
    * keyed by segment name — threaded into every reader this scan
    * creates so masked rows drop at parse, version-accurately (a
    * `VERSION AS OF` pin applies exactly that version's masks). */
  private def pinnedMasks: Map[String, Seq[String]] = pinnedState._2

  /** Scan observability — the numbers that tell an operator whether the
    * skip machinery is WORKING at scale (a 100 TB log where
    * `segmentsPruned` is 0 on a selective probe means missing stats or
    * a non-prunable predicate — visible in the Spark UI per scan, no
    * log spelunking). Driver metrics: populated at planning, reported
    * through the DSv2 metric hook into the SQL metrics panel. */
  override def supportedCustomMetrics(): Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new SegmentsTotalMetric, new SegmentsPrunedMetric,
      new SplitsPlannedMetric, new SegmentsTruncatedByLimitMetric,
      new MetadataAggServedMetric,
      new LinesParsedMetric, new RowsEmittedAtParseMetric)

  private var plannedMetrics: Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array.empty
  override def reportDriverMetrics(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    plannedMetrics

  /** RUNTIME filtering (dynamic segment pruning): when this log is the
    * probe side of a join whose build side is selective, Spark hands
    * the scan the build side's key set as In/EqualTo filters AFTER
    * planning — `planInputPartitions` then re-plans against the zone
    * maps and Bloom filters, skipping every segment that provably holds
    * none of the join keys. This is DSv2's dynamic-partition-pruning
    * hook, and at warehouse scale it turns "scan the whole log to join
    * 50 users" into "open the handful of segments those users touched".
    * Filters that don't prune (non-equality, stats-less segments) are
    * simply ignored — rows are never filtered here, so correctness
    * stays with the join itself. */
  private var runtimeFilters: Array[Filter] = Array.empty

  // only columns surviving pruning: Spark resolves these against the
  // scan OUTPUT, so advertising a pruned-away column breaks analysis
  override def filterAttributes(): Array[NamedReference] =
    if (aggTags.nonEmpty) Array.empty
    else required.fieldNames
      .filter(Set("user_id", "amount", "sha256sum"))
      .map(org.apache.spark.sql.connector.expressions.Expressions.column)

  override def filter(filters: Array[Filter]): Unit = { runtimeFilters = filters }

  override def readSchema(): StructType =
    if (aggTags.isEmpty) required
    else StructType(aggTags.map {
      case "count_star" => StructField("count_star", LongType, nullable = false)
      case t @ ("min_amount" | "max_amount") => StructField(t, LongType, nullable = true)
      case t @ ("min_user" | "max_user") => StructField(t, StringType, nullable = true)
    })

  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): sread.MicroBatchStream = {
    // fail loudly, not silently ignore: a streaming read's row set is
    // governed by offsets, so an explicit allowlist cannot be honored
    require(segmentsAllow.isEmpty,
      "option(\"segments\", ...) is batch-only — a streaming read's row " +
        "set is governed by its offsets (use startVersion / changeFeed)")
    new LogMicroBatchStream(path, required, pushed, maxFilesPerTrigger,
      maxBytesPerTrigger, startVersion)
  }
  override def description(): String =
    s"LimitHashLog path=$path, PushedFilters: ${pushed.mkString("[", ", ", "]")}" +
      (if (aggTags.nonEmpty) s", PushedAggregates: ${aggTags.mkString("[", ", ", "]")}" else "") +
      limit.fold("")(l => s", PushedLimit: $l")

  /** Zone-map pruning: with pushed equality filters and stats sidecars,
    * whole segments whose [min, max] range excludes the probe value are
    * dropped at PLANNING — the ClickHouse sparse-primary-key effect.
    * A segment without a sidecar is never skipped (correctness first). */
  private def zoneFiltered: Seq[(String, Long)] =
    LimitHashLog.zonePruneOver(path, pinnedSegments, pushed ++ runtimeFilters)

  /** Bucketed layout in force for THIS scan ([[LogBucketing]]): present
    * only when the log pins a spec, the scan is a genuine row scan (no
    * aggregate pushdown), and EVERY pinned segment carries a bucket
    * tag. One foreign or pre-spec segment downgrades to unknown
    * partitioning — a join then shuffles, it never mis-co-locates. */
  private lazy val bucketLayout: Option[(LogBucketing.Spec, Map[String, SegmentStats], Seq[Int])] =
    if (aggTags.nonEmpty) None
    else LogBucketing.readSpec(path).flatMap { spec =>
      val stats = LimitHashLog.loadStats(path)
      val tags = pinnedSegments.map { case (f, _) =>
        stats.get(new Path(f).getName).flatMap(_.bucket)
      }
      if (tags.nonEmpty && tags.forall(_.isDefined))
        Some((spec, stats, tags.flatten.distinct.sorted))
      else None
    }

  /** STORAGE-PARTITIONED reads: a fully-bucketed log reports
    * `KeyGroupedPartitioning(bucket(n, col))` — a join of two same-spec
    * logs (or a GROUP BY on the bucket key) then plans WITHOUT a
    * shuffle exchange, the single most expensive stage of a
    * fact-to-fact join at 100 TB. The group count is a function of the
    * PINNED set only: runtime filtering empties a group's file list but
    * never removes the group, so the partitioning Spark validated at
    * planning stays exact through dynamic pruning. */
  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketLayout match {
      case Some((spec, _, buckets)) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions
            .bucket(spec.n, spec.col)), buckets.size)
      case None =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /** Bin-pack segments into ≤ maxPartitionBytes splits (first-fit on
    * the sorted listing): an entity log accumulates one segment per
    * producer flush, and a task per tiny segment costs scheduler
    * round-trips forever after — the same packing Spark's own file
    * scans apply via files.maxPartitionBytes. Segments larger than the
    * target get their own split (a segment is the atomic unit — TSV
    * lines have no row-group index to split on).
    *
    * A pushed-down aggregation short-circuits all of it: the single
    * result row is computed here on the driver from the stats sidecars
    * (already proven complete by the ScanBuilder) and shipped as one
    * value partition — no segment is opened at all. */
  override def planInputPartitions(): Array[InputPartition] = {
    if (aggTags.nonEmpty) {
      // answer from the stats snapshot PROVEN complete at pushdown
      // acceptance — never a fresh listing, which could silently drop a
      // segment committed in between (ADVICE r7)
      val stats = aggStats
      val values: Seq[Any] = aggTags.map {
        case "count_star" => stats.map(_.rows).sum
        case "min_amount" => if (stats.isEmpty) null else stats.map(_.minAmount).min
        case "max_amount" => if (stats.isEmpty) null else stats.map(_.maxAmount).max
        case "min_user" => if (stats.isEmpty) null
          else stats.map(s => UTF8String.fromString(s.minUserId)).min.toString
        case "max_user" => if (stats.isEmpty) null
          else stats.map(s => UTF8String.fromString(s.maxUserId)).max.toString
      }
      plannedMetrics = Array(LogDriverMetric("metadataAggServed", 1L),
        LogDriverMetric("segmentsTotal", stats.size.toLong))
      return Array(LogAggPartition(values))
    }
    val total = pinnedSegments.size
    val afterZone = zoneFiltered
    // bucketed layout: one input partition per bucket, keyed for
    // key-grouped execution. Zone/Bloom/runtime pruning still drops
    // FILES (a pruned group keeps an empty file list); LIMIT split
    // truncation is skipped — group stability over micro-optimization.
    bucketLayout match {
      case Some((_, stats, buckets)) =>
        val byBucket = afterZone.groupBy { case (f, _) =>
          stats(new Path(f).getName).bucket.get
        }
        plannedMetrics = Array(
          LogDriverMetric("segmentsTotal", total.toLong),
          LogDriverMetric("segmentsPruned", (total - afterZone.size).toLong),
          LogDriverMetric("splitsPlanned", buckets.size.toLong))
        return buckets.map { b =>
          LogBucketPartition(b,
            byBucket.getOrElse(b, Seq.empty).map(_._1)): InputPartition
        }.toArray
      case None => ()
    }
    // LIMIT split truncation: with no filters anywhere, the manifests'
    // exact row counts prove when enough segments are included — the
    // rest of the log is never planned, let alone opened. A stats-less
    // segment contributes no proof (counts 0 toward the threshold) but
    // is kept, so the scan never under-delivers.
    val surviving = limit match {
      case Some(n) if pushed.isEmpty && runtimeFilters.isEmpty =>
        val stats = LimitHashLog.loadStats(path)
        var covered = 0L
        val keep = Seq.newBuilder[(String, Long)]
        val it = afterZone.iterator
        while (it.hasNext && covered < n) {
          val seg = it.next()
          keep += seg
          // a MASKED segment's stats overcount its visible rows —
          // contributing them to the coverage proof could truncate the
          // split list before n rows actually exist (under-delivery);
          // masked segments count 0 toward the proof, like stats-less
          val name = new Path(seg._1).getName
          if (!pinnedMasks.contains(name)) {
            covered += stats.get(name).map(_.rows).getOrElse(0L)
          }
        }
        keep.result()
      case _ => afterZone
    }
    val packed = scala.collection.mutable.ArrayBuffer.empty[(List[String], Long)]
    surviving.foreach { case (f, len) =>
      packed.lastOption match {
        case Some((fs, tot)) if tot + len <= maxPartitionBytes =>
          packed(packed.length - 1) = (f :: fs, tot + len)
        case _ => packed += ((List(f), len))
      }
    }
    // pruned = zone map / Bloom / runtime-filter skips only; LIMIT
    // truncation is a separate number — lumping them overstated prune
    // effectiveness on plain LIMIT queries in the SQL UI (ADVICE r8)
    plannedMetrics = Array(
      LogDriverMetric("segmentsTotal", total.toLong),
      LogDriverMetric("segmentsPruned", (total - afterZone.size).toLong),
      LogDriverMetric("segmentsTruncatedByLimit",
        (afterZone.size - surviving.size).toLong),
      LogDriverMetric("splitsPlanned", packed.length.toLong))
    packed.map(p => LogSegmentsPartition(p._1.reverse): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LogSegmentReaderFactory(required, pushed, columnar, limit, pinnedMasks)

  // size scaled by the pruned fraction of the fixed-ish row layout, so
  // a key-only projection of a big log still reports small enough to
  // broadcast. Zone-pruned segments are EXCLUDED — a selective probe
  // reports only the bytes it will actually read, which is what lets
  // Catalyst broadcast the filtered side of a join. Row count is exact
  // when every surviving segment is manifest-covered (the same metadata
  // that serves COUNT(*) pushdown feeds the cost model here).
  override def estimateStatistics(): Statistics = new Statistics {
    private val surviving = zoneFiltered
    private val raw = surviving.map(_._2).sum
    // _segment is virtual (costs no line bytes) — cap the fraction at 1
    private val frac = math.min(1.0,
      math.max(required.size, 1).toDouble / LimitHashLog.SCHEMA.size)
    private val rowCount: OptionalLong = {
      val stats = LimitHashLog.loadStats(path)
      val names = surviving.map { case (f, _) => new Path(f).getName }
      // masked segments' stats overcount visible rows → not exact
      if (names.forall(stats.contains) && !names.exists(pinnedMasks.contains))
        OptionalLong.of(names.map(stats(_).rows).sum)
      else OptionalLong.empty()
    }
    override def sizeInBytes(): OptionalLong = OptionalLong.of((raw * frac).toLong max 1L)
    override def numRows(): OptionalLong = rowCount
  }
}

case class LogSegmentPartition(file: String) extends InputPartition
case class LogSegmentsPartition(files: Seq[String]) extends InputPartition
/** One BUCKET of a bucketed log — the key-grouped unit: all rows across
  * `files` share this bucket ordinal, which IS the partition key. An
  * empty file list is a pruned-but-present group (see
  * [[LimitHashLogScan.outputPartitioning]]). */
case class LogBucketPartition(bucket: Int, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}
/** One pre-computed aggregate row (plain JVM values; the reader maps
  * strings to UTF8String) — the whole "scan" of a pushed aggregation. */
case class LogAggPartition(values: Seq[Any]) extends InputPartition

class LogSegmentReaderFactory(required: StructType, pushed: Array[Filter],
    columnar: Boolean = true, limit: Option[Int] = None,
    masks: Map[String, Seq[String]] = Map.empty)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case LogSegmentPartition(f) => new LogSegmentReader(f, required, pushed, limit, masks)
      case LogSegmentsPartition(fs) => new MultiSegmentReader(fs, required, pushed, limit, masks)
      case LogBucketPartition(_, fs) => new MultiSegmentReader(fs, required, pushed, limit, masks)
      case LogAggPartition(values) => new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean = { val r = !emitted; emitted = true; r }
        override def get(): InternalRow = new GenericInternalRow(
          values.map {
            case s: String => UTF8String.fromString(s)
            case other => other
          }.toArray)
        override def close(): Unit = ()
      }
    }

  // VECTORIZED path: every built-in file scan in the engine hands Spark
  // ColumnarBatches; this source must too, or a log scan is the one
  // per-core row-at-a-time tier left in a 100 TB read. Spark's
  // ColumnarToRow conversion over these batches is codegen'd (one tight
  // loop per batch), vs. a virtual next()/get() call pair per row.
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar && !partition.isInstanceOf[LogAggPartition] // one row: row reader
  override def createColumnarReader(partition: InputPartition): PartitionReader[ColumnarBatch] =
    partition match {
      case LogSegmentPartition(f) =>
        new LogColumnarReader(Seq(f), required, pushed, limit = limit, masks = masks)
      case LogSegmentsPartition(fs) =>
        new LogColumnarReader(fs, required, pushed, limit = limit, masks = masks)
      case LogBucketPartition(_, fs) =>
        new LogColumnarReader(fs, required, pushed, limit = limit, masks = masks)
      case p: LogAggPartition =>
        throw new UnsupportedOperationException(s"no columnar read for $p")
    }
}

/** Columnar twin of [[LogSegmentReader]]/[[MultiSegmentReader]]: parses
  * a split's segment files into [[ColumnarBatch]]es of up to
  * `batchSize` rows, populating on-heap column vectors directly —
  * pruning (only projected fields materialize; msg base64-decodes only
  * if projected) and pushed equality filters (evaluated on the raw
  * split fields, before anything is stored) are IDENTICAL to the row
  * reader's. Vector capacity is reused across batches (`reset()`), so
  * allocation is O(batchSize) once per task, not per batch. */
class LogColumnarReader(files: Seq[String], required: StructType,
    pushed: Array[Filter], batchSize: Int = 4096, limit: Option[Int] = None,
    masks: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[ColumnarBatch] {
  private var emitted = 0L
  private val fileIt = files.iterator
  private var reader: java.io.BufferedReader = _
  // name bytes of the file the CURRENT line came from (_segment column);
  // updated at each file transition inside nextLine()
  private var segNameBytes: Array[Byte] = Array.empty
  // delete masks of the CURRENT file (merge-on-read log DELETEs),
  // compiled at each file transition into per-row closures
  // ([[LogDelete.compileRow]] — a thousands-of-keys IN mask is one
  // hash-set probe per line, not a linear scan); array + index loop —
  // the common unmasked path pays one length check per line. DV
  // entries compile to ONE bitmap probe over the line ordinal.
  private var segMasks: Array[Array[String] => Boolean] = Array.empty
  private var segDv: DeletionVectors.PositionDeleted = _
  // 0-based line ordinal WITHIN the current file (every physical
  // line counts — the [[LimitHashLog.LPOS_COL]] position domain);
  // curPos is the ordinal of the line nextLine() just returned
  private var segLine = 0L
  private var curPos = -1L

  private def maskedLine(parts: Array[String]): Boolean = {
    var i = 0
    while (i < segMasks.length) {
      if (segMasks(i)(parts)) return true
      i += 1
    }
    segDv != null && segDv.deleted(curPos)
  }

  private val colIdx = required.fields.map(f => LimitHashLog.fieldIdx(f.name))
  private val checks: Array[(Int, Set[String])] = LimitHashLog.parseChecks(pushed)

  private val vectors = OnHeapColumnVector.allocateColumns(batchSize, required)
  private val batch = new ColumnarBatch(vectors.asInstanceOf[Array[ColumnVector]])

  /** Next raw line across the split's files, or null at end. */
  private def nextLine(): String = {
    while (true) {
      if (reader == null) {
        if (!fileIt.hasNext) return null
        val p = new Path(fileIt.next())
        segNameBytes = p.getName.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val (rows, pd) = LimitHashLog.compileLineMasks(
          p.getParent.toString, masks.getOrElse(p.getName, Seq.empty))
        segMasks = rows
        segDv = pd
        segLine = 0L
        reader = new java.io.BufferedReader(new java.io.InputStreamReader(
          p.getFileSystem(FsConf.get).open(p),
          java.nio.charset.StandardCharsets.UTF_8))
      }
      val line = reader.readLine()
      if (line != null) { curPos = segLine; segLine += 1; return line }
      reader.close(); reader = null
    }
    null // unreachable
  }

  override def next(): Boolean = {
    var i = 0
    while (i < vectors.length) { vectors(i).reset(); i += 1 }
    var n = 0
    var done = false
    while (n < batchSize && !done && limit.forall(emitted + n < _)) {
      val line = nextLine()
      if (line == null) done = true
      else {
        linesSeen += 1
        val parts = line.split("\t", -1)
        if (parts.length == 4 && checks.forall(c => c._2.contains(parts(c._1))) &&
            ((segMasks.length == 0 && segDv == null) || !maskedLine(parts))) {
          rowsKept += 1
          var j = 0
          while (j < colIdx.length) {
            colIdx(j) match {
              case 0 =>
                val b = parts(0).getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vectors(j).putByteArray(n, b, 0, b.length)
              case 1 => vectors(j).putLong(n, parts(1).toLong)
              case 2 =>
                if (parts(2).isEmpty) vectors(j).putNull(n)
                else {
                  val b = java.util.Base64.getDecoder.decode(parts(2))
                  vectors(j).putByteArray(n, b, 0, b.length)
                }
              case 3 =>
                val b = parts(3).getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vectors(j).putByteArray(n, b, 0, b.length)
              case 4 => // _segment metadata column
                vectors(j).putByteArray(n, segNameBytes, 0, segNameBytes.length)
              case 5 => // _lpos metadata column: line ordinal in file
                vectors(j).putLong(n, curPos)
            }
            j += 1
          }
          n += 1
        }
      }
    }
    batch.setNumRows(n)
    emitted += n
    n > 0
  }

  override def get(): ColumnarBatch = batch

  private var linesSeen = 0L
  private var rowsKept = 0L
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(LogDriverMetric("linesParsed", linesSeen),
      LogDriverMetric("rowsEmittedAtParse", rowsKept))

  override def close(): Unit = {
    if (reader != null) reader.close()
    batch.close() // frees the vectors
  }
}

/** Sequential reader over a bin-packed split's segment files. */
class MultiSegmentReader(files: Seq[String], required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None, masks: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[InternalRow] {
  private val it = files.iterator
  private var cur: LogSegmentReader = _
  private var doneLines = 0L
  private var doneRows = 0L

  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext || limit.exists(doneRows >= _)) return false
        // remaining budget: rows already emitted by finished children
        cur = new LogSegmentReader(it.next(), required, pushed,
          limit.map(l => math.max(0, l - doneRows.toInt)), masks)
      }
      if (cur.next()) return true
      doneLines += cur.linesSeen; doneRows += cur.rowsKept
      cur.close()
      cur = null
    }
    false
  }

  override def get(): InternalRow = cur.get()
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(
      LogDriverMetric("linesParsed",
        doneLines + (if (cur != null) cur.linesSeen else 0L)),
      LogDriverMetric("rowsEmittedAtParse",
        doneRows + (if (cur != null) cur.rowsKept else 0L)))
  override def close(): Unit = if (cur != null) cur.close()
}

/** Streams one segment: per line, evaluate pushed equality filters on
  * the raw split fields first, then materialize only the pruned
  * columns (msg base64-decodes only if projected). */
class LogSegmentReader(file: String, required: StructType, pushed: Array[Filter],
    limit: Option[Int] = None, masks: Map[String, Seq[String]] = Map.empty)
    extends PartitionReader[InternalRow] {
  private val p = new Path(file)
  private val in = p.getFileSystem(FsConf.get).open(p)
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  private var row: InternalRow = _
  private val segName = UTF8String.fromString(p.getName)

  // (field index in the raw line) of each projected column
  private val colIdx = required.fields.map(f => LimitHashLog.fieldIdx(f.name))
  private val checks: Array[(Int, Set[String])] = LimitHashLog.parseChecks(pushed)
  // merge-on-read delete masks of THIS segment: a matching line is a
  // deleted row — dropped at parse, before any materialization.
  // Compiled per-row closures ([[LogDelete.compileRow]]: a
  // thousands-of-keys IN mask is one hash-set probe per line); array +
  // index loop — the unmasked common case pays one length check. DV
  // entries compile to ONE bitmap probe over the line ordinal.
  // plain field assignment, NOT a val tuple-destructure: a type
  // pattern in a destructure is a runtime match, and segDv is null
  // for DV-free segments (the common case) — null fails a type
  // pattern with a MatchError
  private val compiledLineMasks =
    LimitHashLog.compileLineMasks(p.getParent.toString,
      masks.getOrElse(p.getName, Seq.empty))
  private val segMasks: Array[Array[String] => Boolean] = compiledLineMasks._1
  private val segDv: DeletionVectors.PositionDeleted = compiledLineMasks._2

  private def maskedLine(parts: Array[String], pos: Long): Boolean = {
    var i = 0
    while (i < segMasks.length) {
      if (segMasks(i)(parts)) return true
      i += 1
    }
    segDv != null && segDv.deleted(pos)
  }

  private[sources] var linesSeen = 0L
  private[sources] var rowsKept = 0L

  override def next(): Boolean = {
    if (limit.exists(rowsKept >= _)) return false
    var line = reader.readLine()
    while (line != null) {
      // position = linesSeen BEFORE increment: the 0-based line
      // ordinal within this segment (every physical line counts)
      val pos = linesSeen
      linesSeen += 1
      val parts = line.split("\t", -1)
      if (parts.length == 4 && checks.forall(c => c._2.contains(parts(c._1))) &&
          ((segMasks.length == 0 && segDv == null) || !maskedLine(parts, pos))) {
        rowsKept += 1
        val values = new Array[Any](colIdx.length)
        var i = 0
        while (i < colIdx.length) {
          values(i) = colIdx(i) match {
            case 0 => UTF8String.fromString(parts(0))
            case 1 => parts(1).toLong
            case 2 => if (parts(2).isEmpty) null
                      else java.util.Base64.getDecoder.decode(parts(2))
            case 3 => UTF8String.fromString(parts(3))
            case 4 => segName // _segment metadata column
            case 5 => pos // _lpos metadata column: line ordinal in file
          }
          i += 1
        }
        row = new GenericInternalRow(values)
        return true
      }
      line = reader.readLine()
    }
    false
  }

  override def get(): InternalRow = row
  override def currentMetricsValues(): Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
    Array(LogDriverMetric("linesParsed", linesSeen),
      LogDriverMetric("rowsEmittedAtParse", rowsKept))
  override def close(): Unit = reader.close()
}

/** Streaming-read offset: the set of segment files already processed.
  * This is FileStreamSource's contract (Spark's own file source
  * persists its seen-files map) expressed as the offset itself —
  * honest for an entity log whose segment count is the number of
  * producer flushes; a high-volume deployment would compact the name
  * list to a (name-watermark, overflow-set) pair exactly as
  * FileStreamSource's compaction does. */
case class LogOffset(segments: Seq[String]) extends sread.Offset {
  override def json(): String = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    Serialization.write(segments)
  }
}

object LogOffset {
  def fromJson(json: String): LogOffset = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    LogOffset(Serialization.read[Seq[String]](json))
  }
}

/** MICRO-BATCH streaming READ of the entity log — the consumer side of
  * the reference's pipeline (downstream jobs tailing `limits_hashes`
  * as it fills): each trigger processes exactly the segments that
  * appeared since the last committed offset, one input partition per
  * new segment. Committed segments are immutable (the writers' rename
  * protocol), so a (offset-start, offset-end] batch is reproducible —
  * the property Structured Streaming needs from a replayable source.
  * Column pruning and pushed equality filters ride along from the
  * ScanBuilder: a streaming probe parses only projected fields, same
  * as the batch scan. */
class LogMicroBatchStream(path: String, required: StructType, pushed: Array[Filter],
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None,
    startVersion: Option[Long] = None)
    extends sread.MicroBatchStream with sread.SupportsAdmissionControl {

  /** Where a FRESH stream (no checkpoint) starts: from the beginning,
    * or — `option("startVersion", n)` — from snapshot n of a versioned
    * log: version n's segments count as already-seen, so the stream
    * replays exactly the changes SINCE that snapshot (batch-read the
    * snapshot itself with `VERSION AS OF n`, stream the rest — the
    * Delta `startingVersion` shape, composing the r9 ledger with the
    * offset log). A checkpoint restart keeps its committed offset;
    * startVersion only seeds the initial one. */
  override def initialOffset(): sread.Offset = startVersion match {
    case None => LogOffset(Seq.empty)
    case Some(v) =>
      val names = LogVersions.get(path, v).getOrElse(
        throw new IllegalArgumentException(
          s"startVersion $v: no such version in $path " +
            "(not versioned, never committed, or vacuumed)")).toSet
      // resolve through the listing so the offset carries the same
      // QUALIFIED paths latestOffset compares against (a name the
      // listing no longer has was vacuumed — it can never be listed
      // again, so omitting it is safe)
      LogOffset(LimitHashLog.segments(path).collect {
        case (f, _) if names(new Path(f).getName) => f
      })
  }

  override def latestOffset(): sread.Offset =
    LogOffset(LimitHashLog.liveSegments(path).map(_._1))

  /** Admission control — the READ-side twin of the reference's batch
    * cap (`hashes.go:68`): `option("maxFilesPerTrigger", n)` bounds
    * every micro-batch to n new segments, `option("maxBytesPerTrigger",
    * b)` to ~b new bytes (always admitting at least one segment for
    * progress, like Spark's own file source), so a backlogged log
    * drains in bounded units instead of one giant catch-up batch
    * (bounded memory, steady checkpoint cadence). Both set → both
    * bind (composite limit). */
  override def getDefaultReadLimit: sread.ReadLimit = {
    val limits = Seq(
      maxFilesPerTrigger.map(n => sread.ReadLimit.maxFiles(n)),
      maxBytesPerTrigger.map(b => sread.ReadLimit.maxBytes(b))).flatten
    limits match {
      case Seq() => sread.ReadLimit.allAvailable()
      case Seq(one) => one
      case many => sread.ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Admitted PREFIX length of `unseen` under a limit (admission is
    * prefix-based, so a composite is the min over its parts). */
  private def admitCount(unseen: Seq[(String, Long)], limit: sread.ReadLimit): Int =
    limit match {
      case m: sread.ReadMaxFiles => math.min(m.maxFiles(), unseen.length)
      case b: sread.ReadMaxBytes =>
        var tot = 0L
        var n = 0
        while (n < unseen.length && (n == 0 || tot + unseen(n)._2 <= b.maxBytes())) {
          tot += unseen(n)._2; n += 1
        }
        n
      case c: sread.CompositeReadLimit =>
        c.getReadLimits.map(admitCount(unseen, _)).min
      case _ => unseen.length
    }

  override def latestOffset(start: sread.Offset, limit: sread.ReadLimit): sread.Offset = {
    val seen = start.asInstanceOf[LogOffset].segments
    val seenSet = seen.toSet
    val live = LimitHashLog.liveSegments(path)
    // a RETIRING commit (compaction, CoW DML, zone DELETE) replaced or
    // dropped segments this stream already emitted — the replacement
    // outputs would DOUBLE-EMIT their carried-over rows and dropped
    // rows cannot be retracted, so fail loudly (the parquet tail's
    // contract, ParquetTailSpec "retiring commit" case). The changelog
    // stream (`option("changeFeed")`) is the rewrite-aware feed.
    val liveSet = live.map(_._1).toSet
    val retired = seen.filterNot(liveSet)
    if (retired.nonEmpty) throw new IllegalStateException(
      s"log tail of $path: ${retired.size} segment(s) this stream already " +
        s"emitted were retired by a rewrite (e.g. ${retired.head}) — an " +
        "append tail can neither retract their rows nor distinguish a " +
        "rewrite's carried-over rows from new data; restart from a fresh " +
        "checkpoint after maintenance, or consume the changelog stream " +
        "(option(\"changeFeed\", \"true\")) for rewrite-aware semantics")
    val unseen = live.filterNot(s => seenSet.contains(s._1))
    val admitted = unseen.take(admitCount(unseen, limit)).map(_._1)
    LogOffset(seen ++ admitted)
  }

  override def planInputPartitions(start: sread.Offset, end: sread.Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[LogOffset].segments.toSet
    val fresh = end.asInstanceOf[LogOffset].segments.filterNot(seen)
    // the same zone-map/Bloom pruning as the batch scan: a streaming
    // probe (pushed equality filters) skips whole fresh segments whose
    // stats prove a miss — they still advance the offset (their rows
    // could never match), so replay semantics are unchanged
    val kept =
      if (pushed.isEmpty) fresh
      else {
        val listed = LimitHashLog.liveSegments(path).map(_._1).toSet
        val surviving = LimitHashLog.zonePrune(path, pushed).map(_._1).toSet
        // a fresh segment missing from the current listing is NOT
        // silently dropped — the reader fails loudly, as before
        fresh.filter(f => surviving.contains(f) || !listed.contains(f))
      }
    kept.map(f => LogSegmentPartition(f): InputPartition).toArray
  }

  /** Each micro-batch applies the delete masks CURRENT at its planning
    * time (predicate masks and DVs both — the factory's readers test
    * them at parse), so a fresh stream's snapshot batch serves exactly
    * what a batch read at that moment would: lightweight-deleted rows
    * never resurrect into the stream (the parquet tail's contract,
    * ParquetTailSpec "masks" case). A mask landing on an ALREADY-
    * emitted segment is inherently unretractable in an append tail —
    * the changelog stream (`logChanges`) is the retraction-aware feed. */
  override def createReaderFactory(): PartitionReaderFactory =
    new LogSegmentReaderFactory(required, pushed,
      masks = LimitHashLog.segmentsAndMasksAllowed(path, None, None)._2)

  override def deserializeOffset(json: String): sread.Offset = LogOffset.fromJson(json)
  override def commit(end: sread.Offset): Unit = ()
  override def stop(): Unit = ()
}
