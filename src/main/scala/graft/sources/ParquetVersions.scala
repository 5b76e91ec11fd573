package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Snapshot isolation + time travel for the catalog's PARQUET-managed
  * tables — [[LogVersions]]' monotonic commit ledger ported to the
  * `data/` generation model (VERDICT r9 next-round #2), so
  * `VERSION AS OF` / `TIMESTAMP AS OF` work on parquet tables and
  * compaction / DELETE / UPDATE / MERGE are safe under concurrent
  * readers there too.
  *
  * Ledger files are the same `.v-<ordinal>` [[VersionLedger]] payloads,
  * living in the TABLE directory (siblings of `_schema.json` — outside
  * `data/`, so an INSERT OVERWRITE truncate of the data path cannot
  * destroy the history of what it replaced… though it does delete the
  * bytes; see the limitations note below). Names refer to files inside
  * `data/`.
  *
  * The one structural difference from the log tier: parquet APPENDS
  * arrive through Spark's own file batch write (`INSERT INTO` /
  * `writeTo(...).append()` → `FileBatchWrite`), which renames
  * `part-*.parquet` files straight into `data/` with NO ledger
  * publish. The live-set rule absorbs them:
  *
  *   live = latest.names ∪ { f ∈ listing : f referenced by NO version
  *                           ∧ f not maintenance-named }
  *
  * A file referenced by no version is either an un-published append
  * (keep — it is newer than every commit) or a crashed maintenance
  * op's renamed-but-never-published output (drop — replaying it would
  * duplicate rows). The two are distinguished by NAME: maintenance
  * rewrites always commit under a `compact-` / `delete-` / `rlo-`
  * prefix, the v1 writer always under `part-` (and the bucketed writer
  * under `b<k>-`). Every maintenance op starts by folding the current
  * appends into its commit, so the unreferenced set stays small.
  *
  * Versioned maintenance REPLACES the `data.next` generation swap: new
  * files land in `data/` under maintenance names, inputs stay on disk
  * for pinned readers, and the version publish is the only visibility
  * event. [[vacuum]] reclaims files that only dropped versions
  * reference (plain-named appends are NEVER vacuumed — they are
  * someone's un-published write).
  *
  * `INSERT OVERWRITE` is history-preserving: [[CatalogParquetTable]]
  * keeps the catalog's table off Spark's `FallBackFileSourceV2` v1
  * rewrite (which physically truncated `data/`), so a SQL overwrite
  * plans as v2 truncate — retirement through the footer-stats
  * classify, retired bytes kept for pinned readers, one ledger publish
  * on versioned tables. Remaining limitation (documented, not
  * silent): single-maintainer semantics for maintenance ops, same as
  * the log tier. */
/** The `_schema.json` manifest of a catalog parquet table — the ONE
  * reader for the declared schema, shared by every tier (catalog load,
  * compaction, delete, zorder, rebucket, change feed, RTAS). Its
  * presence IS the parquet-vs-entity-log dispatch. */
object SchemaManifest {
  def path(tableDir: String): Path = new Path(tableDir, "_schema.json")

  def exists(tableDir: String): Boolean = {
    val p = path(tableDir)
    p.getFileSystem(FsConf.get).exists(p)
  }

  /** The manifest FILE's bytes — the cache, not necessarily the truth
    * (see [[readJson]]). */
  def manifestJson(tableDir: String): String = {
    val p = path(tableDir)
    val in = p.getFileSystem(FsConf.get).open(p)
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** The DECLARED schema JSON. On a versioned table the ledger's
    * embedded schema (carried forward by every commit) wins over the
    * `_schema.json` file: the version publish is the single atomic
    * event of a schema-changing commit (RTAS, ALTER), and the manifest
    * file is a cache the publish updates AFTERWARDS — a crash between
    * the two must never surface the new file set under the old schema
    * (ADVICE r10). Un-versioned tables (and versioned tables whose
    * commits never embedded a schema) read the file as before. */
  def readJson(tableDir: String): String =
    VersionLedger.latestSchema(tableDir).getOrElse(manifestJson(tableDir))

  /** The declared schema; requires the manifest to exist — callers on
    * maintenance paths pass a clear operation name for the error. */
  def read(tableDir: String, forOp: String = "read"): org.apache.spark.sql.types.StructType = {
    require(exists(tableDir),
      s"$tableDir is not a catalog parquet table (no _schema.json); " +
        s"$forOp applies to parquet-managed catalog tables")
    org.apache.spark.sql.types.DataType.fromJson(readJson(tableDir))
      .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  /** Rewrite the manifest cache to `json` via the crash-safe staged
    * swap (idempotent; a crash mid-swap is read-repaired by
    * [[LogCatalog]]'s `repairSchemaSwap`). Called after a
    * schema-carrying publish, and by loadTable when it finds the cache
    * lagging the ledger. */
  def repair(tableDir: String, json: String): Unit = {
    val sf = path(tableDir)
    val fs = sf.getFileSystem(FsConf.get)
    val swap = new Path(tableDir, "_schema.json.swap")
    // CONCURRENT repairs (two loadTables both finding the cache lagging
    // the ledger) carry identical bytes and run outside any lease — the
    // create/delete/rename steps can interleave so one session's rename
    // fails or its freshly-renamed file is deleted by the other's
    // delete step. Neither is corruption: every writer installs the
    // same json. So a failed rename is TOLERATED when the destination
    // now holds exactly the json we were installing, and otherwise the
    // whole write-delete-rename sequence retries; only persistent
    // divergence throws (ADVICE r11).
    var attempt = 0
    while (true) {
      // every step can fail or THROW under a concurrent repair (the
      // local ChecksumFileSystem's .crc sidecars race too): any
      // IOException in the sequence just falls through to the
      // did-someone-else-install-it check
      try {
        val out = fs.create(swap, true)
        try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        fs.delete(sf, false)
        if (fs.rename(swap, sf)) return
      } catch { case _: java.io.IOException => () }
      val now = try Some(manifestJson(tableDir))
        catch { case _: java.io.IOException => None }
      if (now.contains(json)) {
        try fs.delete(swap, false)
        catch { case _: java.io.IOException => () }
        return
      }
      attempt += 1
      if (attempt >= 20) {
        throw new java.io.IOException(s"schema manifest swap failed in $tableDir")
      }
      Thread.sleep(5L * attempt)
    }
  }
}

object ParquetVersions {

  /** Names whose visibility is LEDGER-GATED — the complement of the
    * append namespace (`part-*` from the v1 writer, `b<k>-*` from the
    * bucketed writer), matched on the BASE name so partitioned tables'
    * relative paths (`date~…/ins-….parquet`) classify the same.
    * `rtas-` is REPLACE TABLE AS SELECT ([[ParquetReplaceAllWrite]]),
    * `zorder-` is OPTIMIZE ZORDER ([[ParquetZorder]]), `ins-` is the
    * partitioned tables' staged INSERT ([[PartitionedWriteBuilder]] —
    * gated so a crash mid-multi-partition-rename leaves no torn commit
    * visible), `stream-` is the streaming sinks' epoch files
    * ([[ParquetStreamingWrite]]/[[PartitionedStreamingWrite]] — gated
    * so a torn or crashed epoch is never partially visible and its
    * debris is vacuumable; the epoch publish is the ONLY visibility
    * event, exactly as those sinks document). A rewrite path that
    * invents a NEW prefix without registering it here double-serves
    * every row in its rename-to-publish window and leaks crashed
    * outputs as permanently-live appends vacuum can never reclaim. */
  private[sources] def maintenanceNamed(name: String): Boolean = {
    val base = name.substring(name.lastIndexOf('/') + 1)
    base.startsWith("compact-") || base.startsWith("delete-") ||
      base.startsWith("rlo-") || base.startsWith("rtas-") ||
      base.startsWith("zorder-") || base.startsWith("ins-") ||
      base.startsWith("stream-")
  }

  private def fsOf(p: Path) = p.getFileSystem(FsConf.get)

  private def dataDir(tableDir: String): Path = new Path(tableDir, "data")

  /** The COMMITTED-file walk of a `data/` dir: parquet files directly
    * inside it plus those under PARTITION dirs (`col~val/…`,
    * [[PartitionSpecs]]) — and nothing else. Dot/underscore names are
    * staged or committer-internal (`.rtas-*`, `_temporary/…`) and are
    * never surfaced or descended into; non-partition subdirs don't
    * exist in this layout and are ignored rather than guessed at. A
    * dir vanishing mid-walk (a racing commit/abort) is skipped.
    * Returns (data/-relative name, status), unsorted. */
  private[sources] def walkData(fs: org.apache.hadoop.fs.FileSystem,
      data: Path): Seq[(String, org.apache.hadoop.fs.FileStatus)] = {
    val out = Seq.newBuilder[(String, org.apache.hadoop.fs.FileStatus)]
    def walk(dir: Path, prefix: String): Unit = {
      val statuses =
        try fs.listStatus(dir)
        catch { case _: java.io.FileNotFoundException => return }
      statuses.foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) ()
        else if (s.isDirectory) {
          if (n.contains("~")) walk(s.getPath, s"$prefix$n/")
        } else if (n.endsWith(".parquet")) out += ((prefix + n, s))
      }
    }
    if (fs.exists(data)) walk(data, "")
    out.result()
  }

  /** Current `data/` parquet file names, RELATIVE to `data/` (bare
    * names on the flat layout, `col~val/…` paths on partitioned
    * tables), committed files only ([[walkData]]). */
  private[sources] def listing(tableDir: String): Seq[String] = {
    val data = dataDir(tableDir)
    walkData(fsOf(data), data).map(_._1).sorted
  }

  def enabled(tableDir: String): Boolean = VersionLedger.enabled(tableDir)

  def latest(tableDir: String): Option[(Long, Seq[String])] =
    VersionLedger.latest(tableDir)

  def get(tableDir: String, ordinal: Long): Option[Seq[String]] =
    VersionLedger.get(tableDir, ordinal)

  def asOfTimestamp(tableDir: String, micros: Long): Option[Long] =
    VersionLedger.asOfTimestamp(tableDir, micros)

  /** Opt the table into versioning: v1 = the current data listing. */
  def enable(tableDir: String): Long =
    VersionLedger.enable(tableDir, listing(tableDir))

  /** Un-published appends relative to one consistent `referenced` set:
    * in the listing, referenced by no version, append-named. */
  private def appendsVs(tableDir: String, referenced: Set[String]): Seq[String] =
    listing(tableDir).filterNot(referenced).filterNot(maintenanceNamed)

  /** The file set a CURRENT scan reads: the latest commit plus
    * un-published appends. Latest membership and the referenced set
    * come from ONE ledger listing ([[VersionLedger.snapshot]]) — two
    * separate reads can straddle a concurrent catch-up publish and
    * return a live set missing the file that publish referenced
    * (observed: a compaction racing a streaming tail's catch-up saw a
    * single-file live set and silently no-opped). */
  def live(tableDir: String): Seq[String] =
    VersionLedger.snapshot(tableDir) match {
      case None => listing(tableDir)
      case Some((_, names, referenced)) =>
        (names ++ appendsVs(tableDir, referenced)).distinct.sorted
    }

  /** Fold the current un-published appends into the ledger as their
    * own CATCH-UP commit. This must be a separate version, not an
    * inline union inside a maintenance transform: a maintenance op
    * that consumes an append (e.g. DELETE rewriting a fresh file)
    * removes it from its own output set, and if no version ever
    * REFERENCED the append, the live rule would classify it as still
    * un-published and resurrect its rows. After the catch-up the file
    * is referenced, so dropping it from the next commit retires it
    * like any other input.
    *
    * The un-referenced set is recomputed INSIDE the commit transform
    * from a fresh consistent snapshot on every CAS attempt: a stale
    * `extra` captured before the loop could re-add a file that a
    * concurrent op folded AND retired between attempts (resurrection).
    * On publish success the snapshot provably matches the CAS head —
    * any commit landing after it would have taken our ordinal. */
  def catchUp(tableDir: String): Unit = {
    val needed = VersionLedger.snapshot(tableDir).exists {
      case (_, _, referenced) => appendsVs(tableDir, referenced).nonEmpty
    }
    if (needed) {
      val data = dataDir(tableDir)
      VersionLedger.commit(tableDir, None, Map.empty, None,
        Some(n => new Path(data, n))) { prev =>
        val extra = VersionLedger.snapshot(tableDir) match {
          case Some((_, _, referenced)) => appendsVs(tableDir, referenced)
          case None => Seq.empty
        }
        (prev ++ extra).distinct.sorted
      }
      ()
    }
  }

  /** Maintenance commit: catch-up first (appends racing the op are
    * carried forward, never dropped), then publish `transform(prev)`.
    * The transform re-applies on a CAS loss, same composition rule as
    * the log tier; an append landing between the two publishes simply
    * stays un-ledgered (and live) until the next op folds it. */
  def commit(tableDir: String)(transform: Seq[String] => Seq[String]): Long =
    commit(tableDir, None, Map.empty)(transform)

  /** [[commit]] with a new declared schema and/or additional delete
    * masks riding the same atomic publish ([[VersionLedger]] carries
    * both forward thereafter). Added names are existence-verified
    * before the publish (ADVICE r11). */
  def commit(tableDir: String, schema: Option[String],
      addMasks: Map[String, Seq[String]])(
      transform: Seq[String] => Seq[String]): Long =
    commitGuarded(tableDir, schema, addMasks, None)(transform)

  /** [[commit]] carrying a REWRITE's mask-conflict guard
    * ([[VersionLedger.MaskGuard]]): a concurrent merge-on-read
    * DELETE/UPDATE landing a mask on one of the rewrite's inputs
    * aborts the publish ([[VersionLedger.MaskConflictException]])
    * instead of being silently undone (ADVICE r11, high). */
  private[sources] def commitGuarded(tableDir: String, schema: Option[String],
      addMasks: Map[String, Seq[String]],
      guard: Option[VersionLedger.MaskGuard])(
      transform: Seq[String] => Seq[String]): Long = {
    catchUp(tableDir)
    val data = dataDir(tableDir)
    VersionLedger.commit(tableDir, schema, addMasks, guard,
      Some(n => new Path(data, n)))(transform)
  }

  /** The guard a rewrite should commit under: its input names plus the
    * mask state it READ them under. */
  private[sources] def guardFor(inputs: Set[String],
      observed: Map[String, Seq[String]]): Option[VersionLedger.MaskGuard] =
    if (inputs.isEmpty) None
    else Some(VersionLedger.MaskGuard(inputs,
      observed.view.filterKeys(inputs).toMap))

  /** Re-run `body` (which must re-read masks and visible rows each
    * attempt) when its guarded publish hits a mask conflict — a
    * concurrent merge-on-read DELETE/UPDATE landed between the read
    * and the publish. Bounded: steady conflicting DML eventually
    * surfaces the conflict to the operator instead of livelocking the
    * maintenance pass. */
  /** Total MaskConflict retries taken JVM-wide — observability for the
    * concurrent-writer soak (how much re-classification work sustained
    * multi-writer contention actually costs). */
  val maskConflictRetries = new java.util.concurrent.atomic.AtomicLong(0L)

  private[sources] val DefaultRetryAttempts = 3

  private[sources] def retryOnMaskConflict[A](
      attempts: Int = DefaultRetryAttempts)(body: => A): A = {
    // sustained multi-writer churn (SoakConcurrent) legitimately needs
    // a deeper budget than the 3 attempts interactive DML wants —
    // overridable without threading a parameter through every command.
    // The property only REPLACES the default: a caller that chose its
    // own budget keeps it, and a malformed/non-positive property value
    // falls back instead of throwing inside every retry wrapper
    // (ADVICE r16).
    val budget =
      if (attempts != DefaultRetryAttempts) attempts
      else sys.props.get("graft.mor.retry.attempts")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
        .filter(_ >= 1)
        .getOrElse(attempts)
    var i = 0
    while (true) {
      try return body
      catch {
        case e: VersionLedger.MaskConflictException =>
          maskConflictRetries.incrementAndGet()
          i += 1
          if (i >= budget) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The delete masks a scan of this table must apply: the pinned
    * version's payload masks, or the latest payload's for a current
    * read. Un-ledgered appends never carry masks (masks attach only
    * through commits), so the live-set union needs no mask merge. */
  def masksFor(tableDir: String,
      pinned: Option[Long]): Map[String, Seq[String]] = pinned match {
    case Some(v) => VersionLedger.getPayload(tableDir, v)
      .map(_.masks).getOrElse(Map.empty)
    case None => VersionLedger.latestPayload(tableDir)
      .map(_._2.masks).getOrElse(Map.empty)
  }

  /** Retention: keep the newest `retainLast` versions, then physically
    * delete every data file that is (a) referenced ONLY by dropped
    * versions, or (b) an unreferenced maintenance-named file (a crashed
    * op's never-published output). Unreferenced APPEND-named files are
    * never touched — they are a concurrent writer's un-published rows.
    * A catch-up commit first folds current appends into the ledger so
    * the retained window describes the table as it stands. */
  def vacuum(tableDir: String, retainLast: Int = 2,
      olderThanMs: Option[Long] = None): Seq[String] =
    MaintenanceLease.withLease(tableDir) {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    val base = new Path(tableDir)
    val fs = fsOf(base)
    if (!enabled(tableDir)) return Seq.empty
    catchUp(tableDir)
    // retained window and the referenced-by-any set from ONE listing —
    // a second listing could include a commit the window computation
    // missed and mark its files deletable. Time-based retention
    // (RETAIN n HOURS over the embedded publish stamps) composes with
    // the count-based window: either rule keeps a version.
    val view = VersionLedger.vacuumView(tableDir)
    val payloads = view.map { case (o, p, names, _, _) => (o, p, names) }
    val retainedOrds = VersionLedger.retainedOf(
      view.map(v => (v._1, v._4)), retainLast, olderThanMs)
    val (droppedVs, retainedVs) = payloads.partition(p => !retainedOrds(p._1))
    val referencedRetained = retainedVs.flatMap(_._3).toSet
    val referencedAny = payloads.iterator.flatMap(_._3).toSet
    // an UNREFERENCED maintenance-named file is crashed-op debris ONLY
    // once it is old: a row-level op or a streaming-epoch commit that
    // does NOT hold the maintenance lease may be inside its
    // rename-to-publish window right now, and deleting its fresh
    // output would corrupt the commit it is about to publish. Retired
    // files (referenced by some dropped version) carry no such window.
    val now = System.currentTimeMillis()
    val deleted = walkData(fs, dataDir(tableDir)).filter { case (name, st) =>
      !referencedRetained(name) && (
        referencedAny(name) ||
          (maintenanceNamed(name) &&
            now - st.getModificationTime > InFlightGraceMs))
    }.map(_._1)
    deleted.foreach(n => fs.delete(new Path(dataDir(tableDir), n), false))
    droppedVs.foreach { case (_, p, _) => fs.delete(p, false) }
    // DV sidecar retention follows the SAME window: a sidecar is live
    // while any RETAINED version's masks reference it ([[DeletionVectors]]);
    // unreferenced sidecars get the in-flight grace (a DML may have
    // written one and not yet published its commit), then reclaim.
    val referencedDv: Set[String] = view.iterator
      .filter(v => retainedOrds(v._1))
      .flatMap(_._5.valuesIterator.flatten)
      .flatMap(DeletionVectors.parse(_).map(_.sidecar)).toSet
    val dvDir = new Path(tableDir, DeletionVectors.DIR)
    if (fs.exists(dvDir)) {
      fs.listStatus(dvDir).foreach { s =>
        if (s.isFile && !referencedDv(s.getPath.getName) &&
            now - s.getModificationTime > InFlightGraceMs) {
          fs.delete(s.getPath, false)
        }
      }
    }
    deleted.sorted
  }

  /** How long vacuum leaves an unreferenced maintenance-named file
    * alone before calling it crashed-op debris — longer than any
    * plausible rename-to-publish window of a lease-less committer
    * (row-level ops, streaming epochs), shorter than any reasonable
    * vacuum cadence. */
  private[sources] val InFlightGraceMs: Long = 15L * 60L * 1000L
}
