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
  *     (O(segments) bytes — manifest-scale, same as the stats files);
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
  */
object LogVersions {

  private val Prefix = ".v-"

  private def fsOf(dir: Path) = dir.getFileSystem(new Configuration())

  private def pathOf(dir: Path, ordinal: Long): Path =
    new Path(dir, f"$Prefix$ordinal%020d")

  private def ordinalOf(name: String): Option[Long] =
    if (name.startsWith(Prefix)) name.stripPrefix(Prefix).toLongOption else None

  /** (ordinal, file) pairs, ascending. */
  private def versionFiles(dir: Path): Seq[(Long, Path)] = {
    val fs = fsOf(dir)
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).toSeq.flatMap { s =>
      if (s.isFile) ordinalOf(s.getPath.getName).map(o => (o, s.getPath))
      else None
    }.sortBy(_._1)
  }

  private def readNames(p: Path): Seq[String] = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = fsOf(p.getParent)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    Serialization.read[Seq[String]](
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Create-exclusive publish; false = ordinal already taken (lost the
    * race — re-read and retry). */
  private def tryPublish(dir: Path, ordinal: Long, names: Seq[String]): Boolean = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val fs = fsOf(dir)
    val target = pathOf(dir, ordinal)
    try {
      val out = fs.create(target, false) // exclusive: the CAS
      try out.write(Serialization.write(names.sorted)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case e: java.io.IOException if fs.exists(target) => false
      case e: java.io.IOException => throw e
    }
  }

  def enabled(dir: String): Boolean = versionFiles(new Path(dir)).nonEmpty

  /** Latest (ordinal, live segment names), if versioning is enabled. */
  def latest(dir: String): Option[(Long, Seq[String])] =
    versionFiles(new Path(dir)).lastOption.map { case (o, p) => (o, readNames(p)) }

  /** The exact segment set as of version `ordinal`; None if that
    * version does not exist (never created, or vacuumed away). */
  def get(dir: String, ordinal: Long): Option[Seq[String]] = {
    val p = pathOf(new Path(dir), ordinal)
    if (fsOf(new Path(dir)).exists(p)) Some(readNames(p)) else None
  }

  /** Opt a log into versioning: snapshot the current listing as v1.
    * Idempotent; concurrent enables converge (one wins the v1 CAS). */
  def enable(dir: String): Long = {
    val base = new Path(dir)
    fsOf(base).mkdirs(base)
    if (versionFiles(base).nonEmpty) return versionFiles(base).last._1
    val names = LimitHashLog.segments(dir).map(p => new Path(p._1).getName)
    if (tryPublish(base, 1L, names)) 1L else versionFiles(base).last._1
  }

  /** Publish the next version as `transform(currentLiveSet)`. The
    * transform must be a pure function of the set it is handed — on a
    * CAS loss it re-applies against the newer set, which is what makes
    * writer-appends and maintenance-swaps commute. Returns the ordinal
    * committed. */
  def commit(dir: String)(transform: Seq[String] => Seq[String]): Long = {
    val base = new Path(dir)
    var attempt = 0
    while (attempt < 1000) {
      val (ord, cur) = latest(dir).getOrElse(throw new IllegalStateException(
        s"LogVersions.commit on un-versioned log $dir — call enable() first"))
      val next = transform(cur)
      if (tryPublish(base, ord + 1, next)) return ord + 1
      attempt += 1
    }
    throw new IllegalStateException(
      s"LogVersions.commit: lost the version CAS 1000 times in $dir")
  }

  /** `TIMESTAMP AS OF` resolution: the newest version whose PUBLISH
    * time (the version file's modification time — set once at the
    * create-exclusive publish, never touched again) is ≤ the given
    * epoch micros. None when the log wasn't versioned yet at that
    * instant (or ever). */
  def asOfTimestamp(dir: String, micros: Long): Option[Long] = {
    val base = new Path(dir)
    val fs = fsOf(base)
    versionFiles(base).flatMap { case (o, p) =>
      val publishedMs = fs.getFileStatus(p).getModificationTime
      if (publishedMs * 1000L <= micros) Some(o) else None
    }.lastOption
  }

  /** Retention: keep the newest `retainLast` versions; physically
    * delete every segment file referenced by NONE of them, then drop
    * the superseded version files. Returns the deleted segment names.
    * A reader pinned inside the retained window is never affected;
    * pinning older than the window is the operator's documented
    * trade-off, exactly like Delta's VACUUM horizon. */
  def vacuum(dir: String, retainLast: Int = 2): Seq[String] = {
    require(retainLast >= 1, "vacuum must retain at least the latest version")
    val base = new Path(dir)
    val fs = fsOf(base)
    val files = versionFiles(base)
    if (files.isEmpty) return Seq.empty
    val retained = files.takeRight(retainLast)
    val referenced = retained.flatMap { case (_, p) => readNames(p) }.toSet
    val deleted = LimitHashLog.segments(dir)
      .map(p => new Path(p._1).getName)
      .filterNot(referenced)
    deleted.foreach(n => fs.delete(new Path(base, n), false))
    files.dropRight(retainLast).foreach { case (_, p) => fs.delete(p, false) }
    deleted
  }
}
