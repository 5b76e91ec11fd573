package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** SHARDED planning-metadata store for the parquet tier's skip indexes
  * — the footer-stats bounds ([[ParquetFooterStats]]) and the Bloom
  * point-probe filters ([[ParquetBloom]]).
  *
  * The first cut of both sidecars was one monolithic JSON file per
  * table, read entirely at every cold plan and REWRITTEN entirely by
  * every update. That shape has two 100 TB ceilings (VERDICT r16):
  * driver memory and rewrite I/O are O(live files) — at 1M files the
  * Bloom sidecar alone is ~8 GB rewritten per incremental build — and
  * two concurrent plan-time writers are last-wins, silently dropping
  * each other's learned entries.
  *
  * This is the log tier's per-commit `.stats-manifest-*` discipline
  * ("planning I/O is O(commits), not O(segments)") ported to the
  * parquet tier:
  *
  *   - entries live in uniquely-named SHARD files under
  *     `<table>/_fstats/` or `<table>/_fbloom/`; a writer APPENDS one
  *     shard holding only the entries it learned — never a
  *     read-modify-write, so concurrent planners cannot lose each
  *     other's work, and a steady-state append costs one small shard,
  *     not a whole-manifest rewrite;
  *   - a reader unions the shards in name order (later shards win name
  *     collisions; every entry additionally self-validates by
  *     (len, mtime) at use, so a stale winner only costs a footer
  *     re-open, never a wrong prune). A `keep` predicate lets planning
  *     retain only the files the query actually probes, bounding
  *     driver memory to the probe set instead of the table;
  *   - when the shard count crosses [[foldThreshold]], the next writer
  *     FOLDS: union all shards, drop entries that no longer validate
  *     against the live listing, write ONE merged shard, delete the
  *     inputs — the same compaction contract `compactLog` keeps for
  *     the log manifests. Shards written DURING a fold carry fresh
  *     names the fold never deletes; readers racing the fold tolerate
  *     shard files vanishing mid-list.
  *
  * The legacy single-file sidecars (`.fstats`, `.fbloom`) are read as
  * the lowest-priority shard and reclaimed by the first fold, so
  * pre-shard tables migrate in place. Everything here is a CACHE of
  * the parquet footers: a lost shard, torn fold, or corrupt file costs
  * re-opened footers, never correctness. */
object SidecarShards {

  /** Shard-count fold trigger. Small enough that planning I/O stays a
    * handful of files; large enough that a fold amortizes over many
    * appends. Overridable for tests / unusual commit cadences. */
  def foldThreshold: Int =
    sys.props.get("graft.sidecar.fold.threshold")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 2).getOrElse(16)

  /** `kind` is the shard directory name: `_fstats` or `_fbloom`. */
  def dirFor(dataDir: Path, kind: String): Path =
    new Path(dataDir.getParent, kind)

  /** The pre-shard monolithic file this kind replaces. */
  private def legacyFor(dataDir: Path, kind: String): Path =
    new Path(dataDir.getParent, "." + kind.stripPrefix("_"))

  private def isShard(name: String): Boolean =
    name.startsWith("shard-") && name.endsWith(".json")

  /** (shard path, json text) in FOLD ORDER: the legacy file first (it
    * predates every shard), then shards by name — names embed a
    * zero-padded write-time millis stamp, so later writers win name
    * collisions. Unreadable members are skipped: a shard vanishing
    * under a concurrent fold, or corrupt bytes, degrade to missing
    * cache entries. */
  def readAll(conf: Configuration, dataDir: Path,
      kind: String): Seq[(Path, String)] = {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    def textOf(p: Path): Option[String] =
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } catch { case scala.util.control.NonFatal(_) => None }
    val legacy = legacyFor(dataDir, kind)
    val head: Seq[(Path, String)] =
      if (try fs.exists(legacy) catch { case _: java.io.IOException => false })
        textOf(legacy).map(legacy -> _).toSeq
      else Seq.empty
    val shards: Seq[(Path, String)] =
      try fs.listStatus(dir).toSeq
        .filter(s => s.isFile && isShard(s.getPath.getName))
        .sortBy(_.getPath.getName)
        .flatMap(s => textOf(s.getPath).map(s.getPath -> _))
      catch { case _: java.io.FileNotFoundException => Seq.empty
              case scala.util.control.NonFatal(_) => Seq.empty }
    head ++ shards
  }

  /** Number of members a fold would consume (legacy + shards) — the
    * cheap trigger probe: one listStatus of a small directory. */
  def memberCount(conf: Configuration, dataDir: Path, kind: String): Int = {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    val n = try fs.listStatus(dir)
        .count(s => s.isFile && isShard(s.getPath.getName))
      catch { case _: java.io.FileNotFoundException => 0
              case scala.util.control.NonFatal(_) => 0 }
    val legacy =
      try if (fs.exists(legacyFor(dataDir, kind))) 1 else 0
      catch { case _: java.io.IOException => 0 }
    n + legacy
  }

  /** Total bytes across live members — observability (`build_bloom`
    * reports it). */
  def totalBytes(conf: Configuration, dataDir: Path, kind: String): Long = {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    val shardBytes =
      try fs.listStatus(dir).toSeq
        .filter(s => s.isFile && isShard(s.getPath.getName))
        .map(_.getLen).sum
      catch { case _: java.io.FileNotFoundException => 0L
              case scala.util.control.NonFatal(_) => 0L }
    val legacyBytes =
      try fs.getFileStatus(legacyFor(dataDir, kind)).getLen
      catch { case _: java.io.IOException => 0L }
    shardBytes + legacyBytes
  }

  /** Append one new shard (atomic: temp + rename into the shard dir).
    * Never touches existing members. Best-effort — a failed append
    * costs the next planner its footer opens, nothing else. */
  def append(conf: Configuration, dataDir: Path, kind: String,
      json: String): Unit = try {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val name = f"shard-${System.currentTimeMillis()}%013d-" +
      java.util.UUID.randomUUID().toString.take(8) + ".json"
    val tmp = new Path(dir, s".tmp-$name")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, name))) fs.delete(tmp, false)
    ()
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Fold `inputs` (paths returned by [[readAll]]) into one merged
    * shard: write the merged member FIRST, then delete the inputs (and
    * the legacy file if it was one of them). A crash between the two
    * steps leaves duplicate entries — harmless, the next fold collapses
    * them. Concurrent appenders' fresh shards are never in `inputs`
    * and survive untouched. */
  def fold(conf: Configuration, dataDir: Path, kind: String,
      mergedJson: String, inputs: Seq[Path]): Unit = try {
    append(conf, dataDir, kind, mergedJson)
    val fs = dirFor(dataDir, kind).getFileSystem(conf)
    inputs.foreach { p =>
      try fs.delete(p, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  } catch { case scala.util.control.NonFatal(_) => () }
}
