package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** The log tier's per-commit stats manifests under REPLAY and FOLD
  * interleavings (ADVICE r17 medium): the one case where a segment's
  * stats legitimately change is a same-name manifest overwrite (epoch
  * replay / query retry). Once the original manifest has been folded
  * away and deleted, the replayed manifest must still WIN the merge —
  * under the old later-name-wins lexicographic rule the `zfold-` file
  * sorted after every uuid/queryId commit manifest, so the stale
  * folded stats won forever (wrong metadata-served COUNT/MIN/MAX,
  * wrong zone pruning). Also pins the atomic temp+rename write (a
  * racing fold must never parse a half-written manifest as garbage and
  * then DELETE it) and the parse-before-delete fold rule. */
class LogManifestSpec extends AnyFunSuite {

  private def freshDir(): (Path, org.apache.hadoop.fs.FileSystem) = {
    val p = new Path(Files.createTempDirectory("graft_manifest").toString)
    (p, p.getFileSystem(new Configuration()))
  }

  private def st(rows: Long): SegmentStats =
    SegmentStats(rows, "a", "z", 1L, 9L)

  private def withFoldThreshold[A](n: Int)(body: => A): A = {
    val prev = sys.props.put("graft.sidecar.fold.threshold", n.toString)
    try body
    finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("a commit manifest REPLAYED after folding overrides the stale fold entry") {
    withFoldThreshold(2) {
      val (dir, fs) = freshDir()
      LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(10)))
      LimitHashLog.writeManifest(fs, dir, "c2", Map("segment-y" -> st(5)))
      LimitHashLog.maybeFoldManifests(fs, dir) // threshold 2 → folds both
      val names = fs.listStatus(dir).map(_.getPath.getName)
        .filter(_.startsWith(".stats-manifest-")).toSeq
      assert(names.length === 1 && names.head.contains("zfold-"),
        s"expected one fold manifest, got $names")
      // epoch replay recreates c1's manifest with CHANGED stats — the
      // fresh commit manifest must beat the stale fold entry even
      // though 'c1' sorts before 'zfold-…'
      LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(11)))
      val loaded = LimitHashLog.loadStats(dir.toString)
      assert(loaded("segment-x").rows === 11L,
        s"replayed manifest must override the fold: $loaded")
      assert(loaded("segment-y").rows === 5L, "untouched fold entries survive")
      // a SECOND fold folds the replay in with the same precedence —
      // the fresh value persists into the new fold file
      LimitHashLog.maybeFoldManifests(fs, dir)
      val after = LimitHashLog.loadStats(dir.toString)
      assert(after("segment-x").rows === 11L && after("segment-y").rows === 5L,
        s"re-fold must capture the replayed stats: $after")
      // atomic write discipline: no temp leftovers anywhere
      assert(fs.listStatus(dir).count(_.getPath.getName.startsWith("_tmp-")) === 0)
    }
  }

  test("fold never deletes an input it could not parse — stats survive for the next fold") {
    withFoldThreshold(2) {
      val (dir, fs) = freshDir()
      LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(10)))
      // a manifest caught mid-overwrite (or corrupted): parses as garbage
      val bad = new Path(dir, ".stats-manifest-c2")
      val out = fs.create(bad, true)
      try out.write("{\"segment-y\": {trunca".getBytes("UTF-8"))
      finally out.close()
      LimitHashLog.maybeFoldManifests(fs, dir)
      assert(fs.exists(bad),
        "an unparseable manifest must survive the fold, not be deleted")
      // the good entry folded; the bad file contributes nothing but is
      // still on disk for a later writer to repair via same-name replace
      assert(LimitHashLog.loadStats(dir.toString)("segment-x").rows === 10L)
      LimitHashLog.writeManifest(fs, dir, "c2", Map("segment-y" -> st(7)))
      assert(LimitHashLog.loadStats(dir.toString)("segment-y").rows === 7L)
    }
  }

  test("writeManifest replaces same-name atomically: readers see old or new, never partial") {
    val (dir, fs) = freshDir()
    LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(1)))
    LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(2)))
    assert(LimitHashLog.loadStats(dir.toString)("segment-x").rows === 2L)
    assert(fs.listStatus(dir).count(
      _.getPath.getName.startsWith(".stats-manifest-")) === 1)
    assert(fs.listStatus(dir).count(_.getPath.getName.startsWith("_tmp-")) === 0)
  }

  test("fold reaps AGED temp debris from crashed writers but never a live writer's fresh temp") {
    withFoldThreshold(2) {
      val (dir, fs) = freshDir()
      LimitHashLog.writeManifest(fs, dir, "c1", Map("segment-x" -> st(10)))
      LimitHashLog.writeManifest(fs, dir, "c2", Map("segment-y" -> st(5)))
      // a crashed writer's orphan: created, never renamed — nothing
      // reaped these before (ADVICE r18), so they accumulated forever
      val stale = new Path(dir, "_tmp-stats-manifest-deadbeef0000")
      val outS = fs.create(stale, true)
      try outS.write("{}".getBytes("UTF-8")) finally outS.close()
      fs.setTimes(stale, System.currentTimeMillis() - 11L * 60L * 1000L, -1L)
      // a LIVE writer's in-flight temp (fresh mtime) must survive the fold
      val fresh = new Path(dir, "_tmp-stats-manifest-cafebabe0000")
      val outF = fs.create(fresh, true)
      try outF.write("{}".getBytes("UTF-8")) finally outF.close()
      LimitHashLog.maybeFoldManifests(fs, dir)
      assert(!fs.exists(stale), "aged temp debris must be reaped by the fold")
      assert(fs.exists(fresh), "a fresh in-flight temp must survive the fold")
      // and the fold itself behaved: one zfold, stats intact
      val loaded = LimitHashLog.loadStats(dir.toString)
      assert(loaded("segment-x").rows === 10L && loaded("segment-y").rows === 5L)
    }
  }
}
