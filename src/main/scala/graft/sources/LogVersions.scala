package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Snapshot isolation + time travel for the entity log — the MVCC
  * part-set semantics the reference inherits from its warehouse
  * (ClickHouse's DELETE probe `hashes_test.go:235-239` runs against
  * part snapshots while other cases read), rebuilt for a file log as a
  * MONOTONIC COMMIT LEDGER:
  *
  *   - every committed state is a version file `.v-<ordinal>` whose
  *     content is the COMPLETE live segment-name set as of that commit
  *     (O(segments) bytes — manifest-scale, same as the stats files)
  *     plus the publish timestamp;
  *   - a new version is published with CREATE-EXCLUSIVE at the next
  *     ordinal: two concurrent committers race on the same name, the
  *     loser re-reads the new latest and re-applies its TRANSFORM
  *     (set-level CAS — a writer adds names, a compaction swaps
  *     inputs for outputs; both compose under retry);
  *   - a scan PINS one version at planning and reads exactly that set;
  *   - maintenance ops (compaction, DELETE, truncate-mode overwrite)
  *     commit a version that drops their inputs but leave the bytes on
  *     disk, so a reader pinned to an older version is never yanked;
  *   - [[vacuum]] is the explicit retention knob (the Delta VACUUM
  *     shape): physically delete segments referenced by none of the
  *     retained versions, then drop the superseded version files.
  *
  * Versioning is OPT-IN per log directory ([[enable]] snapshots the
  * current listing as v1). An un-versioned log keeps the original
  * listing-based behavior byte-for-byte — including the maintenance
  * ops' quiesced-log contract; a versioned log upgrades them to
  * safe-under-concurrent-readers.
  *
  * The ledger mechanics (ordinal files, CAS publish, timestamp
  * resolution) live in [[VersionLedger]], shared with the parquet
  * tier's [[ParquetVersions]].
  */
object LogVersions {

  def enabled(dir: String): Boolean = VersionLedger.enabled(dir)

  /** Latest (ordinal, live segment names), if versioning is enabled. */
  def latest(dir: String): Option[(Long, Seq[String])] =
    VersionLedger.latest(dir)

  /** The exact segment set as of version `ordinal`; None if that
    * version does not exist (never created, or vacuumed away). */
  def get(dir: String, ordinal: Long): Option[Seq[String]] =
    VersionLedger.get(dir, ordinal)

  /** Per-segment delete-mask lists of `version` (None = latest) — the
    * public twin of [[ParquetVersions.masksFor]]; entries may be
    * predicate JSONs or DV references ([[DeletionVectors]]). */
  def masksFor(dir: String, version: Option[Long]): Map[String, Seq[String]] =
    (version match {
      case Some(v) => VersionLedger.getPayload(dir, v)
      case None => VersionLedger.latestPayload(dir).map(_._2)
    }).map(_.masks).getOrElse(Map.empty)

  /** Opt a log into versioning: snapshot the current listing as v1.
    * Idempotent; concurrent enables converge (one wins the v1 CAS). */
  def enable(dir: String): Long =
    VersionLedger.enable(dir,
      LimitHashLog.segments(dir).map(p => new Path(p._1).getName))

  /** Publish the next version as `transform(currentLiveSet)`. The
    * transform must be a pure function of the set it is handed — on a
    * CAS loss it re-applies against the newer set, which is what makes
    * writer-appends and maintenance-swaps commute. Returns the ordinal
    * committed. Names the commit ADDS are verified to exist on disk
    * before the publish (segments live directly in the log dir). */
  def commit(dir: String)(transform: Seq[String] => Seq[String]): Long =
    commitGuarded(dir, Map.empty, None)(transform)

  /** [[commit]] with delete masks riding the publish and/or a rewrite
    * mask-conflict guard ([[VersionLedger.MaskGuard]]) — the log-tier
    * merge-on-read surface. */
  private[sources] def commitGuarded(dir: String,
      addMasks: Map[String, Seq[String]],
      guard: Option[VersionLedger.MaskGuard])(
      transform: Seq[String] => Seq[String]): Long = {
    val base = new Path(dir)
    VersionLedger.commit(dir, None, addMasks, guard,
      Some(n => new Path(base, n)))(transform)
  }

  /** `TIMESTAMP AS OF` resolution: the newest version whose PUBLISH
    * time is ≤ the given epoch micros. The publish instant is stamped
    * INSIDE the version file at CAS time, so it survives copies/rsyncs
    * of the log directory (ADVICE r9 — mtime does not); version files
    * from before the stamp exist fall back to mtime. None when the log
    * wasn't versioned yet at that instant (or ever). */
  def asOfTimestamp(dir: String, micros: Long): Option[Long] =
    VersionLedger.asOfTimestamp(dir, micros)

  /** Retention: keep the newest `retainLast` versions; physically
    * delete every segment file that some DROPPED version references
    * and no RETAINED one does, then drop the superseded version
    * files. Returns the deleted segment names. A reader pinned inside
    * the retained window is never affected; pinning older than the
    * window is the operator's documented trade-off, exactly like
    * Delta's VACUUM horizon.
    *
    * Segments referenced by NO version are NEVER deleted: log segment
    * names carry no append-vs-maintenance distinction, and an
    * unreferenced segment is most likely a concurrent writer inside
    * its rename-to-publish window — deleting it would destroy a
    * commit the writer is about to publish. (Versioned reads serve
    * only ledger-referenced names, so such a segment is invisible
    * either way; the cost is that a crashed maintenance op's
    * renamed-but-unpublished output leaks until the operator removes
    * it by hand — the safe side of the trade.) Both the retained and
    * the any-version reference sets come from ONE ledger listing. */
  def vacuum(dir: String, retainLast: Int = 2,
      olderThanMs: Option[Long] = None): Seq[String] =
    MaintenanceLease.withLease(dir) {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    val base = new Path(dir)
    val fs = base.getFileSystem(FsConf.get)
    // membership AND the retention window from ONE listing — a commit
    // landing between two listings could put the takeRight window past
    // versions whose payloads this pass holds, marking files the
    // newest commit references as deletable ([[VersionLedger.retainedOf]]).
    // Time-based retention composes with count-based: a version stays
    // while EITHER rule wants it. Publish instants are the embedded
    // payload stamps (mtime fallback for pre-stamp files), so
    // `RETAIN n HOURS` survives copied/rsynced directories.
    val view = VersionLedger.vacuumView(dir)
    if (view.isEmpty) return Seq.empty
    val payloads = view.map { case (o, p, names, _, _) => (o, p, names) }
    val retainedOrds = VersionLedger.retainedOf(
      view.map(v => (v._1, v._4)), retainLast, olderThanMs)
    val (droppedVs, retainedVs) = payloads.partition(p => !retainedOrds(p._1))
    val referencedRetained = retainedVs.flatMap(_._3).toSet
    val referencedAny = payloads.iterator.flatMap(_._3).toSet
    val deleted = LimitHashLog.segments(dir)
      .map(p => new Path(p._1).getName)
      .filter(n => referencedAny(n) && !referencedRetained(n))
    deleted.foreach(n => fs.delete(new Path(base, n), false))
    droppedVs.foreach { case (_, p, _) => fs.delete(p, false) }
    // DV sidecar retention follows the SAME window as the parquet
    // tier's ([[ParquetVersions.vacuum]]): a sidecar is live while any
    // RETAINED version's masks reference it; unreferenced ones get the
    // in-flight grace (a MERGE may have written one and not yet
    // published), then reclaim.
    val referencedDv: Set[String] = view.iterator
      .filter(v => retainedOrds(v._1))
      .flatMap(_._5.valuesIterator.flatten)
      .flatMap(DeletionVectors.parse(_).map(_.sidecar)).toSet
    val dvDir = new Path(base, DeletionVectors.DIR)
    val now = System.currentTimeMillis()
    if (fs.exists(dvDir)) {
      fs.listStatus(dvDir).foreach { s =>
        if (s.isFile && !referencedDv(s.getPath.getName) &&
            now - s.getModificationTime > ParquetVersions.InFlightGraceMs) {
          fs.delete(s.getPath, false)
        }
      }
    }
    deleted
  }
}

/** A TABLE-SCOPED MAINTENANCE LEASE — closes the documented
  * single-maintainer caveat (VERDICT r10 #6): two concurrent
  * `compact_table` / `zorder_table` / `rebucket_table` calls SERIALIZE
  * instead of racing their multi-step rewrites.
  *
  * CREATE-ONLY ordinal protocol (the [[VersionLedger]] CAS pattern —
  * O_EXCL creation is the only atomic primitive a filesystem gives):
  * leases are numbered `.maintenance-lease-<n>`; acquiring means
  * create-exclusive of `highest+1` AFTER observing the highest
  * ordinal dead (expired by its embedded stamp, or released/absent).
  * Two takeover racers both attempt the same next ordinal and O_EXCL
  * picks exactly one — nobody ever DELETES a potentially-live lease
  * (the delete-then-recreate takeover had a window where racer B's
  * queued delete removed racer A's brand-new live lease and both held
  * the table). Dead ordinals are reclaimed by the next holder, which
  * is exclusive by construction; a live-but-stalled holder past its
  * TTL is out of contract, as with any TTL lease. User DML (DELETE /
  * UPDATE / MERGE / writes) never takes the lease: the ledger CAS
  * already serializes those safely. */
private[graft] object MaintenanceLease {

  case class Token(dir: Path, id: String, ord: Long,
      ttlMs: Long = 10 * 60 * 1000L)

  private val Prefix = ".maintenance-lease"

  private def fileOf(dir: Path, n: Long): Path =
    if (n == 0L) new Path(dir, Prefix) else new Path(dir, s"$Prefix-$n")

  /** Bare legacy name = ordinal 0 (a pre-protocol lease on disk still
    * blocks while live and is taken over when expired). */
  private def ordinalOf(name: String): Option[Long] =
    if (name == Prefix) Some(0L)
    else if (name.startsWith(Prefix + "-"))
      scala.util.Try(name.substring(Prefix.length + 1).toLong).toOption
    else None

  private def tryCreate(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      bytes: Array[Byte]): Boolean =
    LedgerStores.forPath(fs, p).tryCreateExclusive(fs, p, bytes)

  /** Leases the CURRENT THREAD holds, by qualified table dir — lets
    * [[VersionLedger.commit]] re-validate the lease immediately before
    * a leased operation's publish without threading tokens through
    * every maintenance path (ADVICE r11: a holder running past its TTL
    * would otherwise publish concurrently with its taker-over). */
  private val heldByThread =
    new ThreadLocal[Map[String, Token]] {
      override def initialValue(): Map[String, Token] = Map.empty
    }

  private[sources] def qualifiedDir(dir: Path): String = {
    val fs = dir.getFileSystem(FsConf.get)
    fs.makeQualified(dir).toString
  }

  private[sources] def heldFor(tableDir: String): Option[Token] = {
    // fast path: the common case is "no lease held anywhere on this
    // thread" — skip building a Configuration / qualifying the path on
    // every ledger commit (ADVICE r12). NOTE: the registry is
    // per-thread by design; a leased operation must publish from the
    // thread that called withLease (all maintenance verbs do — their
    // bodies run inline, never on a pool).
    val held = heldByThread.get()
    if (held.isEmpty) None
    else held.get(qualifiedDir(new Path(tableDir)))
  }

  private def payloadOf(id: String, ttlMs: Long): Array[Byte] =
    s"""{"id":"$id","expires":${System.currentTimeMillis() + ttlMs}}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Extend our own live lease's expiry. Only the holder ever WRITES
    * its lease file, so the overwrite cannot race another writer; a
    * reader catching the truncate-then-write window sees an
    * unparseable payload, which reads as LIVE (worst case: it waits).
    * Renewal refuses once the lease is within `margin` of expiring —
    * extending an already-expired (or about-to-expire) lease could
    * resurrect one a taker-over has observed dead. Best-effort: any
    * failure is left for [[validate]] to surface loudly at publish. */
  private[sources] def renew(t: Token): Unit = t.synchronized {
    val fs = t.dir.getFileSystem(FsConf.get)
    val margin = math.max(1000L, t.ttlMs / 10)
    try {
      val p = fileOf(t.dir, t.ord)
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val stillOurs = txt.contains(t.id) &&
        "\"expires\":(\\d+)".r.findFirstMatchIn(txt)
          .exists(_.group(1).toLong >= System.currentTimeMillis() + margin)
      if (stillOurs) {
        val out = fs.create(p, true)
        try out.write(payloadOf(t.id, t.ttlMs)) finally out.close()
      }
    } catch { case scala.util.control.NonFatal(_) => () }
  }

  /** Re-validate a held lease: our file still exists, still carries
    * our id, is unexpired, and no LIVE lease exists at a HIGHER
    * ordinal (a taker-over that observed us dead). Called immediately
    * before a leased operation's ledger publish — a maintainer that
    * lost its lease mid-operation must fail LOUDLY there, not race the
    * taker-over through the very rename/publish sequences the lease
    * serializes (ADVICE r11). */
  /** Synchronized with [[renew]] on the token: renew overwrites the
    * lease file truncate-then-write, and while external readers fail
    * safe (a torn payload reads LIVE), the HOLDER's own validate racing
    * its renewer thread could read the truncated payload, miss its id,
    * and abort a healthy publish with a spurious "lease lost"
    * (ADVICE r12). */
  private[sources] def validate(t: Token): Unit = t.synchronized {
    val fs = t.dir.getFileSystem(FsConf.get)
    val p = fileOf(t.dir, t.ord)
    val txt =
      try {
        val in = fs.open(p)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      } catch {
        case _: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"maintenance lease on ${t.dir} lost: lease file vanished " +
              "(expired past its TTL and reclaimed by a taker-over?) — " +
              "aborting before publish to avoid racing the new holder")
        case e: java.io.IOException =>
          throw new IllegalStateException(
            s"maintenance lease on ${t.dir} unverifiable before publish: $e")
      }
    if (!txt.contains(t.id)) {
      throw new IllegalStateException(
        s"maintenance lease on ${t.dir} lost: lease file no longer carries " +
          "our id (taken over after TTL expiry) — aborting before publish")
    }
    val unexpired = "\"expires\":(\\d+)".r.findFirstMatchIn(txt)
      .forall(_.group(1).toLong >= System.currentTimeMillis())
    if (!unexpired) {
      throw new IllegalStateException(
        s"maintenance lease on ${t.dir} expired mid-operation (TTL " +
          s"${t.ttlMs}ms) — renewal failed or the operation outran it; " +
          "aborting before publish")
    }
    val higherLive =
      try fs.listStatus(t.dir).toSeq
        .flatMap(s => ordinalOf(s.getPath.getName))
        .exists(n => n > t.ord && isLiveAt(fs, fileOf(t.dir, n)))
      catch { case _: java.io.IOException => false }
    if (higherLive) {
      throw new IllegalStateException(
        s"maintenance lease on ${t.dir} superseded: a live lease exists at " +
          "a higher ordinal (taken over after our TTL lapsed) — aborting")
    }
  }

  /** Liveness of one lease file. Vanished (released/reclaimed) is
    * DEAD; a transient read error is LIVE; an UNPARSEABLE payload
    * (torn write, truncation) is LIVE — assuming dead on anything but
    * proven absence would take over (and reclaim!) a healthy holder's
    * lease, while assuming live only makes us wait and, at worst, time
    * out loudly (VERDICT r11 #6). */
  private def isLiveAt(fs: org.apache.hadoop.fs.FileSystem, p: Path): Boolean =
    try {
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      "\"expires\":(\\d+)".r.findFirstMatchIn(txt) match {
        case Some(m) => m.group(1).toLong >= System.currentTimeMillis()
        case None => true // unparseable reads as live, never as takeable
      }
    } catch {
      case _: java.io.FileNotFoundException => false
      case _: java.io.IOException => true
    }

  /** Blocking acquire: waits up to `waitMs` for the current holder,
    * taking over expired leases. Throws on timeout — a maintenance verb
    * that cannot get the table is an operator error, not a hang. */
  def acquire(tableDir: String, ttlMs: Long = 10 * 60 * 1000L,
      waitMs: Long = 60 * 1000L): Token = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(FsConf.get)
    fs.mkdirs(dir)
    val id = java.util.UUID.randomUUID().toString
    val deadline = System.currentTimeMillis() + waitMs

    def isLive(n: Long): Boolean = isLiveAt(fs, fileOf(dir, n))

    def listOrdinals(): Seq[Long] =
      try fs.listStatus(dir).toSeq
        .flatMap(s => ordinalOf(s.getPath.getName)).sorted
      catch { case _: java.io.FileNotFoundException => Seq.empty }

    while (System.currentTimeMillis() <= deadline) {
      val ordinals = listOrdinals()
      // only the HIGHEST ordinal can be live in a quiescent chain:
      // creating n+1 requires n dead, and dead ordinals stay dead (no
      // renewal) — staleness is re-checked after the create below
      if (!ordinals.lastOption.exists(isLive)) {
        val next = ordinals.lastOption.getOrElse(0L) + 1L
        if (tryCreate(fs, fileOf(dir, next), payloadOf(id, ttlMs))) {
          // POST-CREATE VALIDATION: our pre-create listing may have
          // been stale — the chain can wind down and restart at other
          // ordinals while we stall (reuse), so a live lease our
          // listing never showed may exist at ANY ordinal. If one
          // does, back off (delete our own, which we have not used
          // yet) and re-loop; two simultaneous creators both back off
          // and converge on the same next ordinal, where O_EXCL picks
          // one. Predecessors are reclaimed only by a validated
          // holder.
          val peers = listOrdinals().filterNot(_ == next)
          if (peers.exists(isLive)) {
            fs.delete(fileOf(dir, next), false) // back off before use
          } else {
            peers.foreach(n => if (n < next) fs.delete(fileOf(dir, n), false))
            return Token(dir, id, next, ttlMs)
          }
        }
        // lost the O_EXCL race (or backed off) — loop
      } else Thread.sleep(50)
    }
    throw new IllegalStateException(
      s"maintenance lease on $tableDir still held after ${waitMs}ms — " +
        "another maintainer is running (or crashed within its TTL)")
  }

  def release(t: Token): Unit = {
    val fs = t.dir.getFileSystem(FsConf.get)
    // id-verified: ordinals CAN be reused after the chain winds down
    // to empty (next restarts at max+1 of what remains), so a zombie
    // holder's blind delete could remove a later holder's recreated
    // ordinal — only a file still carrying OUR id is ours to delete
    try {
      val p = fileOf(t.dir, t.ord)
      val in = fs.open(p)
      val txt = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      if (txt.contains(t.id)) fs.delete(p, false)
    } catch { case _: java.io.IOException => () }
    ()
  }

  /** Run `f` holding the table's maintenance lease, with (a) periodic
    * RENEWAL at TTL/3 so a legitimately long operation keeps its lease
    * instead of being silently taken over, and (b) the token registered
    * per-thread so [[VersionLedger.commit]] re-validates it immediately
    * before the publish and fails loudly if lost (ADVICE r11). */
  def withLease[A](tableDir: String)(f: => A): A = {
    val t = acquire(tableDir)
    val key = qualifiedDir(t.dir)
    val renewer = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
      (r: Runnable) => {
        val th = new Thread(r, s"graft-lease-renew-${t.id.take(8)}")
        th.setDaemon(true)
        th
      })
    renewer.scheduleAtFixedRate(() => renew(t), t.ttlMs / 3, t.ttlMs / 3,
      java.util.concurrent.TimeUnit.MILLISECONDS)
    heldByThread.set(heldByThread.get() + (key -> t))
    try f finally {
      heldByThread.set(heldByThread.get() - key)
      renewer.shutdownNow()
      release(t)
    }
  }
}

/** LogStore-style pluggable CREATE-EXCLUSIVE — the one primitive the
  * whole transactional edifice (version CAS, maintenance lease) stands
  * on. It is genuinely atomic only where the store coordinates it:
  * kernel O_EXCL on `file://`, the namenode on HDFS. On S3A-style
  * object stores `create(path, overwrite = false)` is CHECK-THEN-ACT —
  * two same-instant committers can both "win" an ordinal and one
  * transform is silently lost. Rather than degrade silently, an
  * unregistered scheme FAILS LOUDLY here (VERDICT r11 #3); a
  * deployment on such a store plugs in a conditional-put
  * implementation (S3 `If-None-Match`, a DynamoDB-style coordination
  * table — the Delta LogStore pattern) via [[LedgerStores.register]].
  */
object LedgerStores {

  /** One atomic create-if-absent attempt: true = created with `bytes`,
    * false = the path already existed (lost the CAS). Implementations
    * MUST be atomic — returning true for a create a concurrent writer
    * also won corrupts the ledger. */
  trait AtomicCreate {
    def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem, p: Path,
        bytes: Array[Byte]): Boolean
  }

  /** `file://` — Hadoop's LocalFileSystem create(overwrite=false) is
    * check-then-create, NOT atomic: two same-millisecond committers
    * can both pass the existence check. Go through the kernel's O_EXCL
    * instead — CREATE_NEW is open(2)-atomic. */
  private object LocalOExcl extends AtomicCreate {
    override def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
        p: Path, bytes: Array[Byte]): Boolean =
      try {
        val ch = java.nio.file.Files.newByteChannel(
          java.nio.file.Paths.get(p.toUri.getPath),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        try ch.write(java.nio.ByteBuffer.wrap(bytes)) finally ch.close()
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
  }

  /** Stores whose `create(p, overwrite = false)` is coordinated and
    * atomic (namenode-atomic on HDFS and its federated/ha faces). */
  private object CoordinatedCreate extends AtomicCreate {
    override def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
        p: Path, bytes: Array[Byte]): Boolean =
      try {
        val out = fs.create(p, false)
        try out.write(bytes) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(p) => false
      }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, AtomicCreate]
  registry.put("file", LocalOExcl)
  Seq("hdfs", "viewfs", "webhdfs", "swebhdfs").foreach(
    registry.put(_, CoordinatedCreate))

  /** Plug in (or override) the atomic-create implementation for a URI
    * scheme — e.g. a conditional-put S3 store. */
  def register(scheme: String, impl: AtomicCreate): Unit = {
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), impl)
    ()
  }

  def forPath(fs: org.apache.hadoop.fs.FileSystem, p: Path): AtomicCreate = {
    val scheme = Option(p.toUri.getScheme).getOrElse(fs.getScheme)
      .toLowerCase(java.util.Locale.ROOT)
    val impl = registry.get(scheme)
    if (impl == null) {
      throw new IllegalStateException(
        s"ledger create-exclusive is not atomic on scheme '$scheme' " +
          s"(create(overwrite=false) is check-then-act on object stores, " +
          "so two concurrent committers could both win an ordinal and one " +
          "commit would be silently lost). Register a conditional-put " +
          "implementation for this store via LedgerStores.register(" +
          s"\"$scheme\", impl) — e.g. S3 If-None-Match conditional writes " +
          "or an external coordination table (the Delta LogStore pattern).")
    }
    impl
  }
}

/** The MONOTONIC COMMIT LEDGER shared by the log and parquet storage
  * tiers: `.v-<ordinal>` files whose payload is `{"ts": <publish epoch
  * millis>, "names": [...]}` — the complete live file-name set as of
  * that commit, stamped with the publish instant at CAS time. The old
  * (round-9) payload was a bare JSON array; [[readPayload]] reads both,
  * with `ts = -1` marking "no embedded stamp, fall back to mtime".
  *
  * Round-11 optional payload fields, each CARRIED FORWARD by every
  * commit so the latest payload alone describes the table:
  *
  *   - `"schema"`: the declared schema JSON. Embedding it makes the
  *     version publish the SINGLE atomic event for schema-changing
  *     commits (RTAS, ALTER on a versioned table): a crash between the
  *     publish and the `_schema.json` manifest swap leaves the ledger
  *     authoritative and the manifest a stale cache that
  *     [[SchemaManifest]] readers bypass and [[LogCatalog.loadTable]]
  *     read-repairs (ADVICE r10 — previously that window surfaced the
  *     OLD file set under the NEW schema, or vice versa, permanently).
  *   - `"masks"`: `{file -> [serialized delete predicates]}` — the
  *     MERGE-ON-READ delete state ([[DeleteMasks]]): rows of `file`
  *     matching any listed predicate are deleted as of this version.
  *     Masks ride the payload (no sidecar files), so they are
  *     version-accurate under time travel, survive vacuum for retained
  *     versions, and vanish with the file when a rewrite retires it —
  *     the carry-forward restricts to surviving names. */
private[sources] object VersionLedger {

  private val Prefix = ".v-"

  case class Payload(ts: Long, names: Seq[String],
      schema: Option[String] = None,
      masks: Map[String, Seq[String]] = Map.empty)

  private def fsOf(dir: Path) = dir.getFileSystem(FsConf.get)

  def pathOf(dir: Path, ordinal: Long): Path =
    new Path(dir, f"$Prefix$ordinal%020d")

  private def ordinalOf(name: String): Option[Long] =
    if (name.startsWith(Prefix)) name.stripPrefix(Prefix).toLongOption else None

  /** (ordinal, file) pairs, ascending. */
  def versionFiles(dir: Path): Seq[(Long, Path)] =
    versionStatuses(dir).map { case (o, s) => (o, s.getPath) }

  private def versionStatuses(dir: Path): Seq[(Long, org.apache.hadoop.fs.FileStatus)] = {
    val fs = fsOf(dir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.flatMap { s =>
      if (s.isFile) ordinalOf(s.getPath.getName).map(o => (o, s))
      else None
    }.sortBy(_._1)
  }

  /** Version files are WRITE-ONCE (create-exclusive publish, never
    * modified), so their payloads cache by identity — without this,
    * every ledger read (snapshot / referencedByAny / history) re-parses
    * O(versions) payloads, and a streaming tail's per-trigger catch-up
    * over a long history turns O(versions²). The key includes length
    * and mtime so a dropped-and-recreated table at the same path (new
    * ledger, reused ordinals) cannot serve stale entries. */
  private val payloadCache =
    new java.util.LinkedHashMap[String, Payload](64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Payload]): Boolean = size() > 4096
    }

  private def cachedPayload(st: org.apache.hadoop.fs.FileStatus): Payload = {
    val key =
      s"${st.getPath}#${st.getLen}#${st.getModificationTime}"
    val hit = payloadCache.synchronized(Option(payloadCache.get(key)))
    hit.getOrElse {
      val p = readPayload(st.getPath)
      payloadCache.synchronized(payloadCache.put(key, p))
      p
    }
  }

  /** The create-exclusive publish makes the version FILE visible a few
    * microseconds before its bytes land (create → write → close); a
    * reader that catches that gap sees empty or truncated JSON. Retry
    * briefly — the writer is mid-close, never wedged — then fail loud:
    * a version file that stays unreadable is corruption, not a race. */
  def readPayload(p: Path): Payload = {
    var attempt = 0
    while (true) {
      try return readPayloadOnce(p)
      catch {
        case scala.util.control.NonFatal(_) if attempt < 100 =>
          attempt += 1
          Thread.sleep(10)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def readPayloadOnce(p: Path): Payload = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val fs = fsOf(p.getParent)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    JsonMethods.parse(new String(bytes,
        java.nio.charset.StandardCharsets.UTF_8)) match {
      case arr: JArray => Payload(-1L, arr.extract[Seq[String]])
      case obj: JObject =>
        Payload((obj \ "ts").extract[Long], (obj \ "names").extract[Seq[String]],
          (obj \ "schema").extractOpt[String],
          (obj \ "masks").extractOpt[Map[String, Seq[String]]]
            .getOrElse(Map.empty))
      case other => throw new IllegalStateException(
        s"unreadable version payload in $p: $other")
    }
  }

  /** Create-exclusive publish; false = ordinal already taken (lost the
    * race — re-read and retry). The publish timestamp is embedded in
    * the payload, so `TIMESTAMP AS OF` resolution survives a copied or
    * rsynced directory whose mtimes were not preserved. */
  def tryPublish(dir: Path, ordinal: Long, names: Seq[String],
      schema: Option[String] = None,
      masks: Map[String, Seq[String]] = Map.empty): Boolean = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val fs = fsOf(dir)
    val target = pathOf(dir, ordinal)
    val base =
      ("ts" -> System.currentTimeMillis()) ~ ("names" -> names.sorted)
    val withSchema = schema.fold(base)(s => base ~ ("schema" -> s))
    val full = if (masks.isEmpty) withSchema
      else withSchema ~ ("masks" -> masks.view.mapValues(_.sorted).toMap)
    val json = JsonMethods.compact(JsonMethods.render(full))
    val bytes = json.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    // scheme-dispatched atomic create ([[LedgerStores]]): kernel O_EXCL
    // locally, namenode-coordinated create on HDFS, LOUD REJECTION on
    // stores where create-exclusive is check-then-act (object stores)
    // unless a conditional-put implementation was registered
    LedgerStores.forPath(fs, target).tryCreateExclusive(fs, target, bytes)
  }

  def enabled(dir: String): Boolean = versionFiles(new Path(dir)).nonEmpty

  def latest(dir: String): Option[(Long, Seq[String])] =
    versionStatuses(new Path(dir)).lastOption.map { case (o, s) =>
      (o, cachedPayload(s).names)
    }

  def get(dir: String, ordinal: Long): Option[Seq[String]] = {
    val base = new Path(dir)
    val p = pathOf(base, ordinal)
    val fs = fsOf(base)
    if (fs.exists(p)) Some(cachedPayload(fs.getFileStatus(p)).names) else None
  }

  /** Every name referenced by ANY retained version — the complement is
    * "published by no commit": un-ledgered appends (union them into the
    * live set) or a crashed operation's renamed-but-never-published
    * outputs (drop them). O(versions × names) payload reads; the
    * callers are maintenance paths, never scans. */
  def referencedByAny(dir: String): Set[String] =
    versionStatuses(new Path(dir)).flatMap { case (_, s) =>
      cachedPayload(s).names
    }.toSet

  /** One CONSISTENT ledger read: (latest ordinal, latest names,
    * referenced-by-any) derived from a SINGLE directory listing, so a
    * concurrent publish appears in all three or in none. Separate
    * `latest()` + `referencedByAny()` calls can straddle a publish and
    * classify a just-referenced file as neither a latest member nor an
    * un-ledgered append — observed as a maintenance op computing a live
    * set MISSING a freshly caught-up file (a silently no-op compaction
    * racing a streaming tail's catch-up); the mirror-image staleness
    * can resurrect a just-retired file as an "append". */
  def snapshot(dir: String): Option[(Long, Seq[String], Set[String])] = {
    val payloads = versionStatuses(new Path(dir)).map { case (o, s) =>
      (o, cachedPayload(s).names)
    }
    payloads.lastOption.map { case (ord, names) =>
      (ord, names, payloads.iterator.flatMap(_._2).toSet)
    }
  }

  /** Latest (ordinal, FULL payload) — names plus the carried schema and
    * delete masks. */
  def latestPayload(dir: String): Option[(Long, Payload)] =
    versionStatuses(new Path(dir)).lastOption.map { case (o, s) =>
      (o, cachedPayload(s))
    }

  /** Full payload of one ordinal (for time-travel mask/schema reads). */
  def getPayload(dir: String, ordinal: Long): Option[Payload] = {
    val base = new Path(dir)
    val p = pathOf(base, ordinal)
    val fs = fsOf(base)
    if (fs.exists(p)) Some(cachedPayload(fs.getFileStatus(p))) else None
  }

  /** The declared schema as of the newest commit, if any commit ever
    * embedded one (schema is carried forward by [[commit]], so the
    * latest payload alone answers this). */
  def latestSchema(dir: String): Option[String] =
    latestPayload(dir).flatMap(_._2.schema)

  /** Drop cached payloads of a table directory — called when a ledger
    * is (re)started or its table dropped, so a drop-and-recreate at the
    * same path within one mtime granule (1 s on some filesystems) with
    * a same-length v1 payload cannot serve a stale membership
    * (ADVICE r10). */
  def invalidate(dir: String): Unit = {
    val base = new Path(dir)
    val qualified = fsOf(base).makeQualified(base).toString
    payloadCache.synchronized {
      val it = payloadCache.keySet().iterator()
      while (it.hasNext) {
        val key = it.next()
        // keys are "<qualified file path>#len#mtime"; version files live
        // directly under the table dir
        if (key.startsWith(qualified + "/")) it.remove()
      }
    }
  }

  /** Snapshot `names` as v1 unless a ledger already exists. */
  def enable(dir: String, names: => Seq[String]): Long = {
    val base = new Path(dir)
    fsOf(base).mkdirs(base)
    invalidate(dir)
    if (versionFiles(base).nonEmpty) return versionFiles(base).last._1
    if (tryPublish(base, 1L, names)) 1L else versionFiles(base).last._1
  }

  def commit(dir: String)(transform: Seq[String] => Seq[String]): Long =
    commit(dir, None, Map.empty)(transform)

  /** A REWRITE's write-conflict guard (ADVICE r11, high): the rewrite
    * read visible rows of `inputs` under the delete masks it `observed`
    * at start; if a merge-on-read DELETE/UPDATE commits a NEW mask on
    * one of those inputs before the rewrite publishes, the publish
    * would retire the input — silently dropping the new mask — while
    * the rewrite's output still contains the rows that DML deleted
    * (or duplicates the rows it updated). [[commit]] re-checks the
    * guard against the fresh payload on every CAS attempt and throws
    * [[MaskConflictException]] on divergence; the caller re-reads
    * visible rows and retries (maintenance) or fails loudly (row-level
    * ops driven by Spark's write path). */
  case class MaskGuard(inputs: Set[String], observed: Map[String, Seq[String]])

  final class MaskConflictException(message: String)
      extends IllegalStateException(message)

  /** CAS-commit `transform(latest)` with jittered exponential backoff:
    * under N concurrent committers every loser would otherwise
    * immediately re-list and re-read the directory (ADVICE r9) — the
    * backoff caps at ~100ms so a long convoy drains without a listing
    * storm, while the common uncontended path never sleeps.
    *
    * Carried-forward state: the published payload's schema is
    * `schema.orElse(previous.schema)` and its masks are the previous
    * masks RESTRICTED to surviving names (a rewrite that retires a file
    * retires its masks with it) merged with `addMasks` (predicates
    * appended per file — stacked deletes compose as OR at read). Both
    * merges re-derive from the fresh `latest` on every CAS attempt, the
    * same composition rule as the name transform.
    *
    * Publish-time safety checks, each re-run per CAS attempt:
    *   - `guard`: rewrite mask-conflict detection (see [[MaskGuard]]);
    *   - `resolveName`: every name the commit ADDS must physically
    *     exist — a stalled committer whose staged outputs were
    *     vacuumed (past the in-flight grace) fails LOUDLY here instead
    *     of publishing a version that references vanished files
    *     (ADVICE r11); each added name is verified once per call;
    *   - a maintenance lease held by this thread for `dir` is
    *     re-validated ([[MaintenanceLease.validate]]) so an operation
    *     that outran its TTL cannot race its taker-over's publishes. */
  def commit(dir: String, schema: Option[String],
      addMasks: Map[String, Seq[String]],
      guard: Option[MaskGuard] = None,
      resolveName: Option[String => Path] = None)(
      transform: Seq[String] => Seq[String]): Long = {
    val base = new Path(dir)
    val fs = fsOf(base)
    val rnd = new java.util.Random()
    val verified = scala.collection.mutable.Set.empty[String]
    var attempt = 0
    while (attempt < 1000) {
      val (ord, cur) = latestPayload(dir).getOrElse(throw new IllegalStateException(
        s"VersionLedger.commit on un-versioned dir $dir — call enable() first"))
      guard.foreach { g =>
        // Input RETIREMENT is a conflict too (ADVICE r12, medium): a
        // concurrent whole-file DELETE (or competing rewrite) that drops
        // an unmasked input leaves no mask divergence — carried masks
        // filterKeys to live names, so both sides read empty — yet this
        // rewrite's publish would re-add the deleted rows via its
        // outputs. Retired inputs must fail the guard like mask drift.
        val retired = g.inputs.filterNot(cur.names.toSet)
        if (retired.nonEmpty) {
          throw new MaskConflictException(
            s"write conflict in $dir: rewrite inputs " +
              s"${retired.toSeq.sorted.take(5).mkString(", ")}" +
              (if (retired.size > 5) s" (+${retired.size - 5} more)" else "") +
              " were retired by a concurrent commit (whole-file DELETE or " +
              "competing rewrite) since the rewrite read them — publishing " +
              "would resurrect their rows. Re-read visible rows and retry.")
        }
        val diverged = g.inputs.filter { n =>
          cur.masks.getOrElse(n, Seq.empty).toSet !=
            g.observed.getOrElse(n, Seq.empty).toSet
        }
        if (diverged.nonEmpty) {
          throw new MaskConflictException(
            s"write conflict in $dir: delete masks changed on rewrite " +
              s"inputs ${diverged.toSeq.sorted.take(5).mkString(", ")}" +
              (if (diverged.size > 5) s" (+${diverged.size - 5} more)" else "") +
              " since the rewrite read them — a concurrent merge-on-read " +
              "DELETE/UPDATE committed; publishing would silently undo it. " +
              "Re-read visible rows and retry the operation.")
        }
      }
      val next = transform(cur.names)
      val nextSet = next.toSet
      resolveName.foreach { resolve =>
        val added = (nextSet -- cur.names).filterNot(verified)
        val missing = added.filterNot(n => fs.exists(resolve(n)))
        if (missing.nonEmpty) {
          throw new IllegalStateException(
            s"commit to $dir references files that do not exist: " +
              s"${missing.toSeq.sorted.take(5).mkString(", ")}" +
              (if (missing.size > 5) s" (+${missing.size - 5} more)" else "") +
              " — staged outputs vanished before the publish (renames " +
              "failed, or the committer stalled past the vacuum in-flight " +
              "grace and its files were reclaimed). Refusing to publish a " +
              "corrupt version.")
        }
        verified ++= added
      }
      MaintenanceLease.heldFor(dir).foreach(MaintenanceLease.validate)
      if (tryPublish(base, ord + 1, next, schema.orElse(cur.schema), merged(cur, nextSet, addMasks)))
        return ord + 1
      attempt += 1
      val cap = math.min(100L, 1L << math.min(attempt, 7))
      Thread.sleep(rnd.nextLong(cap) + 1)
    }
    throw new IllegalStateException(
      s"VersionLedger.commit: lost the version CAS 1000 times in $dir")
  }

  private def merged(cur: Payload, nextSet: Set[String],
      addMasks: Map[String, Seq[String]]): Map[String, Seq[String]] = {
    // addMasks on a name the NEXT version does not carry is a WRITE
    // CONFLICT, not a silent no-op: the DML classified its candidates
    // against a snapshot, and a concurrent rewrite that retired one of
    // them moved those rows into new (unmasked) output files — dropping
    // the mask here would silently lose the committed DELETE/UPDATE for
    // exactly those rows. Throwing lets retryOnMaskConflict re-classify
    // against the fresh live set.
    val retired = addMasks.keySet.filterNot(nextSet)
    if (retired.nonEmpty) {
      throw new MaskConflictException(
        s"write conflict: delete masks target files no longer live after " +
          s"the transform: ${retired.toSeq.sorted.take(5).mkString(", ")}" +
          (if (retired.size > 5) s" (+${retired.size - 5} more)" else "") +
          " — a concurrent rewrite retired them (their rows now live in " +
          "unmasked outputs). Re-classify against the current version and " +
          "retry.")
    }
    val carried = cur.masks.view.filterKeys(nextSet).toMap
    addMasks.foldLeft(carried) {
      case (acc, (f, preds)) =>
        acc.updated(f, (acc.getOrElse(f, Seq.empty) ++ preds).distinct)
    }
  }

  /** Newest version published at or before `micros`: the embedded
    * payload stamp when present (millis, stamped at CAS time), the
    * version file's mtime for pre-stamp files. */
  def asOfTimestamp(dir: String, micros: Long): Option[Long] = {
    versionStatuses(new Path(dir)).flatMap { case (o, s) =>
      val payload = cachedPayload(s)
      val publishedMs =
        if (payload.ts >= 0) payload.ts else s.getModificationTime
      if (publishedMs * 1000L <= micros) Some(o) else None
    }.lastOption
  }

  /** The version ordinals retention keeps: the newest `retainLast`
    * PLUS every version published within `olderThanMs` of now (the
    * Delta `RETAIN n HOURS` shape) — a version survives while either
    * rule wants it. */
  /** Retention window over an ALREADY-LISTED (ordinal, publishMs)
    * history — vacuum derives this from the SAME listing its payload
    * reads came from, because a commit landing between two listings
    * would make the longer history's `takeRight` window exclude
    * versions the shorter payload set still holds, marking files the
    * NEWEST commit references as deletable (data loss). */
  private[sources] def retainedOf(hist: Seq[(Long, Long)], retainLast: Int,
      olderThanMs: Option[Long]): Set[Long] = {
    val sorted = hist.sortBy(_._1)
    val byCount = sorted.takeRight(retainLast).map(_._1).toSet
    val byTime = olderThanMs.fold(Set.empty[Long]) { window =>
      val cutoff = System.currentTimeMillis() - window
      sorted.collect { case (o, ms) if ms >= cutoff => o }.toSet
    }
    byCount ++ byTime
  }

  /** ONE consistent listing for vacuum: (ordinal, version file, names,
    * publish millis, masks) — membership, the retention window AND the
    * DV-sidecar reference set must come from the same snapshot
    * ([[retainedOf]]). */
  private[sources] def vacuumView(dir: String)
      : Seq[(Long, Path, Seq[String], Long, Map[String, Seq[String]])] =
    versionStatuses(new Path(dir)).map { case (o, s) =>
      val p = cachedPayload(s)
      (o, s.getPath, p.names,
        if (p.ts >= 0) p.ts else s.getModificationTime, p.masks)
    }

  /** Table history, ascending: (ordinal, publish millis — the embedded
    * stamp, or the version file's mtime for pre-stamp files — and the
    * version's file count). Tier-agnostic: both storage tiers keep
    * their ledger in the table directory. */
  def history(dir: String): Seq[(Long, Long, Int)] = {
    versionStatuses(new Path(dir)).map { case (o, s) =>
      val payload = cachedPayload(s)
      val publishedMs =
        if (payload.ts >= 0) payload.ts else s.getModificationTime
      (o, publishedMs, payload.names.size)
    }
  }
}
