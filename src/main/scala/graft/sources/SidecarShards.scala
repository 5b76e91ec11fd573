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

  /** Entries per fold bucket — the bucket-skip granularity (a probe
    * reads ≤ |candidate buckets| × this many entries). Each kind picks
    * a production default sized to its entry payload (stats ~200 B →
    * 4096 ≈ 1 MB buckets; Bloom ~1 KB → 256); overridable so
    * soaks/tests can exercise the skip mechanism at small file
    * counts. */
  def perBucket(default: Int): Int =
    sys.props.get("graft.sidecar.fold.perbucket")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 1).getOrElse(default)

  /** `kind` is the shard directory name: `_fstats` or `_fbloom`. */
  def dirFor(dataDir: Path, kind: String): Path =
    new Path(dataDir.getParent, kind)

  /** The pre-shard monolithic file this kind replaces. */
  private def legacyFor(dataDir: Path, kind: String): Path =
    new Path(dataDir.getParent, "." + kind.stripPrefix("_"))

  private def isShard(name: String): Boolean =
    name.startsWith("shard-") && name.endsWith(".json")

  /** Fold shards carry a `-b<k>of<B>` suffix: the fold splits its
    * merged entries into B HASH BUCKETS of bounded size (keyed by
    * entry name), so a probe that survived partition pruning reads
    * only the buckets its candidate names hash into — cold-plan
    * sidecar I/O is O(probe set), not O(live files), even right after
    * a fold of a million-file table. Delta shards (no suffix) are
    * always read. */
  private val BucketRe = "-b(\\d+)of(\\d+)\\.json$".r.unanchored

  /** Stable bucket of an entry name (String.hashCode is specified by
    * the JLS — identical across JVMs and runs). */
  def bucketOf(name: String, buckets: Int): Int =
    Math.floorMod(name.hashCode, buckets)

  /** (shard path, json text) in FOLD ORDER: the legacy file first (it
    * predates every shard), then shards by name — names embed a
    * zero-padded write-time millis stamp, so later writers win name
    * collisions. Unreadable members are skipped: a shard vanishing
    * under a concurrent fold, or corrupt bytes, degrade to missing
    * cache entries. */
  def readAll(conf: Configuration, dataDir: Path,
      kind: String): Seq[(Path, String)] =
    readAll(conf, dataDir, kind, None)

  /** [[readAll]] with a candidate-name pre-filter: bucketed FOLD
    * shards whose bucket contains none of the candidates are skipped
    * WITHOUT being read or parsed — the I/O face of the keep-filter.
    * `None` reads everything (maintenance, coverage probes, folds). */
  def readAll(conf: Configuration, dataDir: Path, kind: String,
      candidates: Option[Set[String]]): Seq[(Path, String)] = {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    def textOf(p: Path): Option[String] =
      try {
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } catch { case scala.util.control.NonFatal(_) => None }
    // candidate buckets per distinct B, computed once — a near-full
    // candidate set (unselective probe) must not re-hash every name
    // for every bucket shard
    val bucketsFor = scala.collection.mutable.Map.empty[Int, Set[Int]]
    def wanted(name: String): Boolean = (candidates, name) match {
      case (Some(cands), BucketRe(k, b)) =>
        val buckets = b.toInt
        buckets <= 0 ||
          bucketsFor.getOrElseUpdate(buckets,
            cands.map(bucketOf(_, buckets))).contains(k.toInt)
      case _ => true // delta shard, unparseable suffix, or no filter
    }
    val legacy = legacyFor(dataDir, kind)
    val head: Seq[(Path, String)] =
      if (try fs.exists(legacy) catch { case _: java.io.IOException => false })
        textOf(legacy).map(legacy -> _).toSeq
      else Seq.empty
    val shards: Seq[(Path, String)] =
      try fs.listStatus(dir).toSeq
        .filter(s => s.isFile && isShard(s.getPath.getName) &&
          wanted(s.getPath.getName))
        .sortBy(_.getPath.getName)
        .flatMap(s => textOf(s.getPath).map(s.getPath -> _))
      catch { case _: java.io.FileNotFoundException => Seq.empty
              case scala.util.control.NonFatal(_) => Seq.empty }
    head ++ shards
  }

  /** Number of UN-FOLDED members (legacy + delta shards) — the fold
    * trigger probe: one listStatus of a small directory. Bucketed
    * fold shards are the folded state and must not re-trigger. */
  def memberCount(conf: Configuration, dataDir: Path, kind: String): Int = {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    val n = try fs.listStatus(dir)
        .count { s =>
          s.isFile && isShard(s.getPath.getName) &&
            !BucketRe.pattern.matcher(s.getPath.getName).find()
        }
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
      json: String, suffix: String = ""): Unit = try {
    val dir = dirFor(dataDir, kind)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val name = f"shard-${System.currentTimeMillis()}%013d-" +
      java.util.UUID.randomUUID().toString.take(8) + suffix + ".json"
    val tmp = new Path(dir, s".tmp-$name")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, name))) fs.delete(tmp, false)
    ()
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Fold `inputs` (paths returned by [[readAll]]) into hash-BUCKETED
    * members: each part is a (bucket, buckets, json) triple written
    * under the `-b<k>of<B>` suffix [[readAll]]'s candidate filter can
    * skip. Parts land FIRST, then the inputs delete (legacy file
    * included when it was one). A crash between the two leaves
    * duplicate entries — harmless, entry union is idempotent and the
    * next fold collapses them. Concurrent appenders' fresh shards are
    * never in `inputs` and survive untouched. The fold itself re-reads
    * and rewrites all buckets — O(live entries) once per threshold
    * crossing, i.e. amortized O(live/threshold) per commit, the same
    * amortization the log tier's manifest compaction carries. */
  def fold(conf: Configuration, dataDir: Path, kind: String,
      parts: Seq[(Int, Int, String)], inputs: Seq[Path]): Unit = try {
    parts.foreach { case (k, b, json) =>
      append(conf, dataDir, kind, json, suffix = s"-b${k}of$b")
    }
    val fs = dirFor(dataDir, kind).getFileSystem(conf)
    inputs.foreach { p =>
      try fs.delete(p, false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  } catch { case scala.util.control.NonFatal(_) => () }

  /** Split merged entries into bounded hash buckets for [[fold]]. */
  def bucketed[T](merged: Map[String, T], perBucket: Int,
      render: Map[String, T] => String): Seq[(Int, Int, String)] = {
    val buckets = math.max(1,
      math.ceil(merged.size.toDouble / perBucket).toInt)
    merged.groupBy { case (n, _) => bucketOf(n, buckets) }
      .toSeq.map { case (k, es) => (k, buckets, render(es)) }
  }
}
