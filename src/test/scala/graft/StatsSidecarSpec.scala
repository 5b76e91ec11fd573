package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The persisted stats sidecar ([[ParquetFooterStats]] +
  * [[SidecarShards]]): a fresh driver's selective plan reads a handful
  * of SHARDS instead of opening O(files) footers (VERDICT r10 #3), and
  * — since r17 (VERDICT r16 #1) — growing the table appends shards
  * without ever rewriting the manifest, concurrent planners cannot
  * lose each other's entries, and shards fold back to one member when
  * their count crosses the threshold. */
class StatsSidecarSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_fstats_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_fst", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_fst.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fst.lake")
    s
  }

  private def hconf = spark.sparkContext.hadoopConfiguration

  /** (name, len, mtime) of every stats shard of a table — the rewrite
    * detector: an append must leave existing members byte-untouched. */
  private def shardSigs(tableDir: String): Set[(String, Long, Long)] = {
    val dir = new Path(tableDir, "_fstats")
    val fs = dir.getFileSystem(hconf)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq.filter(_.isFile)
      .map(s => (s.getPath.getName, s.getLen, s.getModificationTime)).toSet
  }

  test("cold session plans a selective probe with ZERO footer opens") {
    spark.sql("DROP TABLE IF EXISTS graft_fst.lake.t")
    spark.sql("CREATE TABLE graft_fst.lake.t (id BIGINT, score BIGINT)")
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100).selectExpr("id", "id * 2 AS score")
        .coalesce(1).writeTo("graft_fst.lake.t").append()
    }
    val probe = "SELECT sum(score) AS s FROM graft_fst.lake.t WHERE id BETWEEN 150 AND 160"
    val expect = (150L to 160L).map(_ * 2).sum
    // FIRST plan (no shards yet): opens footers, learns the stats,
    // persists them as one shard
    assert(spark.sql(probe).head.getLong(0) === expect)
    assert(shardSigs(s"$warehouse/lake/t").nonEmpty,
      "plan must persist the stats it learned")
    // simulate a FRESH driver: forget every in-memory footer (the
    // counter is scoped to this table so parallel suites can't inflate it)
    val under = s"$warehouse/lake/t"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(probe).head.getLong(0) === expect)
    assert(ParquetFooterStats.footerReadsUnder(under) === before,
      "cold planning must be served by the shards, zero footer opens")
    // pruning still effective through the shards: only 1 of 4 files kept
    val (kept, total) = StatsPrunedFileIndex.lastListing.get(s"$warehouse/lake/t/data")
    assert(total === 4 && kept === 1, s"kept=$kept total=$total")
  }

  test("appends add a shard WITHOUT rewriting existing members, get opened once, then join") {
    val sigsBefore = shardSigs(s"$warehouse/lake/t")
    spark.range(1000, 1100).selectExpr("id", "id * 2 AS score")
      .coalesce(1).writeTo("graft_fst.lake.t").append()
    val under = s"$warehouse/lake/t"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(under)
    val probe = "SELECT count(*) AS c FROM graft_fst.lake.t WHERE id >= 1000"
    assert(spark.sql(probe).head.getLong(0) === 100)
    val opened1 = ParquetFooterStats.footerReadsUnder(under) - before
    assert(opened1 === 1, s"only the new file may be opened, got $opened1")
    // the append's learned stats arrive as a NEW shard; every
    // pre-existing member is byte-identical (no whole-manifest rewrite)
    val sigsAfter = shardSigs(s"$warehouse/lake/t")
    assert(sigsBefore.subsetOf(sigsAfter),
      s"existing shards must not be rewritten: $sigsBefore vs $sigsAfter")
    assert(sigsAfter.size === sigsBefore.size + 1,
      "one appended shard expected")
    // and after that plan, the shards cover the append too
    ParquetFooterStats.clearCacheForTesting()
    val b2 = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(probe).head.getLong(0) === 100)
    assert(ParquetFooterStats.footerReadsUnder(under) === b2)
  }

  test("concurrent planners append independent shards; the union loses neither") {
    val dataDir = new Path(s"$warehouse/lake/t/data")
    val conf = new org.apache.hadoop.conf.Configuration(hconf)
    val stA = ParquetFooterStats.FileStats(1L, Map("id" ->
      ParquetFooterStats.ColStats(ParquetFooterStats.DInt, Some(1L), Some(2L), Some(0L))))
    val stB = stA.copy(rowCount = 2L)
    val t1 = new Thread(() => ParquetFooterStats.appendSidecar(conf, dataDir,
      Map("planner-a.parquet" -> ((10L, 10L, stA)))))
    val t2 = new Thread(() => ParquetFooterStats.appendSidecar(conf, dataDir,
      Map("planner-b.parquet" -> ((20L, 20L, stB)))))
    t1.start(); t2.start(); t1.join(); t2.join()
    val union = ParquetFooterStats.readSidecar(conf, dataDir)
    assert(union.contains("planner-a.parquet") && union.contains("planner-b.parquet"),
      s"concurrent appends must both survive, got ${union.keySet}")
  }

  test("shards FOLD to one member past the threshold; planning stays zero-open and stale entries drop") {
    val prev = sys.props.put("graft.sidecar.fold.threshold", "4")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_fst.lake.f")
      spark.sql("CREATE TABLE graft_fst.lake.f (id BIGINT, v BIGINT)")
      val dataDir = new Path(s"$warehouse/lake/f/data")
      val conf = new org.apache.hadoop.conf.Configuration(hconf)
      // grow the table over N commits, planning after each — every plan
      // appends the shard it learned, and the fold keeps the member
      // count bounded by the threshold
      (0 until 8).foreach { i =>
        spark.range(i * 10, i * 10 + 10).selectExpr("id", "id * 3 AS v")
          .coalesce(1).writeTo("graft_fst.lake.f").append()
        assert(spark.sql(
          s"SELECT count(*) AS c FROM graft_fst.lake.f WHERE id >= ${i * 10}")
          .head.getLong(0) === 10)
      }
      val members = SidecarShards.memberCount(conf, dataDir, "_fstats")
      assert(members <= 4, s"fold must bound the member count, got $members")
      // a fresh driver still plans with zero footer opens through the
      // folded shard, and pruning is intact
      val under = s"$warehouse/lake/f"
      ParquetFooterStats.clearCacheForTesting()
      val before = ParquetFooterStats.footerReadsUnder(under)
      StatsPrunedFileIndex.lastListing.remove(s"$under/data")
      assert(spark.sql(
        "SELECT sum(v) AS s FROM graft_fst.lake.f WHERE id BETWEEN 31 AND 33")
        .head.getLong(0) === (31L to 33L).map(_ * 3).sum)
      assert(ParquetFooterStats.footerReadsUnder(under) === before,
        "post-fold cold planning must be zero-open")
      val (kept, total) = StatsPrunedFileIndex.lastListing.get(s"$under/data")
      assert(total === 8 && kept === 1, s"kept=$kept total=$total")
      // stale entries (vanished files) do not survive a fold
      ParquetFooterStats.appendSidecar(conf, dataDir, Map("gone.parquet" ->
        ((1L, 1L, ParquetFooterStats.FileStats(0L, Map.empty)))))
      (8 until 12).foreach { i =>
        spark.range(i * 10, i * 10 + 10).selectExpr("id", "id * 3 AS v")
          .coalesce(1).writeTo("graft_fst.lake.f").append()
        spark.sql(s"SELECT count(*) FROM graft_fst.lake.f WHERE id >= ${i * 10}").collect()
      }
      assert(!ParquetFooterStats.readSidecar(conf, dataDir).contains("gone.parquet"),
        "fold must drop entries of vanished files")
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("a legacy single-file sidecar is read as a shard and retired by the first fold") {
    val prev = sys.props.put("graft.sidecar.fold.threshold", "2")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_fst.lake.m")
      spark.sql("CREATE TABLE graft_fst.lake.m AS SELECT id, id * 2 AS v FROM range(20)")
      spark.sql("SELECT count(*) FROM graft_fst.lake.m WHERE id = 3").collect()
      val tableDir = s"$warehouse/lake/m"
      val dataDir = new Path(tableDir, "data")
      val conf = new org.apache.hadoop.conf.Configuration(hconf)
      val fs = dataDir.getFileSystem(conf)
      // demote the learned shard to the PRE-SHARD layout: one
      // monolithic .fstats file in the table dir
      val shardDir = new Path(tableDir, "_fstats")
      val shard = fs.listStatus(shardDir).filter(_.isFile).head.getPath
      assert(fs.rename(shard, new Path(tableDir, ".fstats")))
      // the legacy file serves cold planning as the lowest-priority shard
      ParquetFooterStats.clearCacheForTesting()
      val before = ParquetFooterStats.footerReadsUnder(tableDir)
      assert(spark.sql("SELECT count(*) AS c FROM graft_fst.lake.m WHERE id = 3")
        .head.getLong(0) === 1)
      assert(ParquetFooterStats.footerReadsUnder(tableDir) === before,
        "legacy sidecar must serve cold planning")
      // grow + plan until a fold runs: the legacy file is one of its
      // inputs and is reclaimed
      (0 until 3).foreach { i =>
        spark.range(100 + i * 10, 110 + i * 10).selectExpr("id", "id * 2 AS v")
          .coalesce(1).writeTo("graft_fst.lake.m").append()
        spark.sql(s"SELECT count(*) FROM graft_fst.lake.m WHERE id >= ${100 + i * 10}").collect()
      }
      assert(!fs.exists(new Path(tableDir, ".fstats")),
        "the first fold must migrate the legacy sidecar into the shard store")
      // and everything it knew still serves planning
      ParquetFooterStats.clearCacheForTesting()
      val b2 = ParquetFooterStats.footerReadsUnder(tableDir)
      assert(spark.sql("SELECT count(*) AS c FROM graft_fst.lake.m WHERE id = 3")
        .head.getLong(0) === 1)
      assert(ParquetFooterStats.footerReadsUnder(tableDir) === b2)
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("a fold triggered by a TIME-TRAVEL plan keeps current files' entries") {
    val prev = sys.props.put("graft.sidecar.fold.threshold", "2")
    try {
      spark.sql("DROP TABLE IF EXISTS graft_fst.lake.tt")
      spark.sql("CREATE TABLE graft_fst.lake.tt (id BIGINT, v BIGINT)")
      spark.range(0, 50).selectExpr("id", "id * 2 AS v")
        .coalesce(1).writeTo("graft_fst.lake.tt").append()
      spark.sql("CALL graft_fst.system.enable_versioning(table => 'lake.tt')") // v1
      spark.sql("SELECT count(*) FROM graft_fst.lake.tt WHERE id < 10").collect()
      // v2 adds a file; plan it so its stats join the shards
      spark.range(100, 150).selectExpr("id", "id * 2 AS v")
        .coalesce(1).writeTo("graft_fst.lake.tt").append()
      spark.sql("SELECT count(*) FROM graft_fst.lake.tt WHERE id >= 100").collect()
      graft.sources.ParquetVersions.catchUp(s"$warehouse/lake/tt")
      // a PINNED plan triggers the next fold (threshold 2); the fold
      // must validate against the raw listing, not the pinned set
      assert(spark.sql(
        "SELECT count(*) AS c FROM graft_fst.lake.tt VERSION AS OF 1 WHERE id < 10")
        .head.getLong(0) === 10)
      // current files' learned stats survived: a fresh driver's CURRENT
      // plan is still zero-open
      val under = s"$warehouse/lake/tt"
      ParquetFooterStats.clearCacheForTesting()
      val before = ParquetFooterStats.footerReadsUnder(under)
      assert(spark.sql(
        "SELECT count(*) AS c FROM graft_fst.lake.tt WHERE id >= 100")
        .head.getLong(0) === 50)
      assert(ParquetFooterStats.footerReadsUnder(under) === before,
        "a time-travel-triggered fold must not evict current files' entries")
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("folds are hash-bucketed; candidate reads skip foreign buckets entirely") {
    val conf = new org.apache.hadoop.conf.Configuration(hconf)
    val dataDir = new Path(
      java.nio.file.Files.createTempDirectory("graft_buckets").toString, "data")
    def render(m: Map[String, String]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
    val entries = (0 until 600).map(i => s"f$i.parquet" -> s"""{"x":$i}""").toMap
    // one delta shard, then a bucketed fold at 100 entries per bucket
    SidecarShards.append(conf, dataDir, "_fstats", render(entries))
    val members = SidecarShards.readAll(conf, dataDir, "_fstats")
    assert(members.size === 1)
    val parts = SidecarShards.bucketed(entries, perBucket = 100, render)
    assert(parts.size === 6 && parts.map(_._2).toSet === Set(6),
      s"600 entries at 100/bucket must make 6 buckets: ${parts.map(t => (t._1, t._2))}")
    SidecarShards.fold(conf, dataDir, "_fstats", parts, members.map(_._1))
    // the folded state: 6 bucket shards, ZERO un-folded members (the
    // fold trigger sees an empty delta set, no immediate re-fold)
    assert(SidecarShards.readAll(conf, dataDir, "_fstats").size === 6)
    assert(SidecarShards.memberCount(conf, dataDir, "_fstats") === 0)
    // a candidate read touches exactly the one bucket its name hashes
    // into — the other five are never opened
    val one = SidecarShards.readAll(conf, dataDir, "_fstats",
      Some(Set("f7.parquet")))
    assert(one.size === 1, s"expected one bucket read, got ${one.map(_._1)}")
    assert(one.head._2.contains("\"f7.parquet\""))
    // a full read still unions everything
    val all = SidecarShards.readAll(conf, dataDir, "_fstats", None)
    assert(all.flatMap(t => "f\\d+\\.parquet".r.findAllIn(t._2)).toSet.size === 600)
  }

  test("a corrupt shard is ignored, corrected, and never wrong") {
    spark.sql("DROP TABLE IF EXISTS graft_fst.lake.s")
    spark.sql("CREATE TABLE graft_fst.lake.s AS SELECT id FROM range(10)")
    spark.sql("SELECT count(*) FROM graft_fst.lake.s WHERE id = 3").collect()
    val dir = s"$warehouse/lake/s"
    // corrupt every shard wholesale — planning must shrug it off
    val shardDir = new Path(dir, "_fstats")
    val fs = shardDir.getFileSystem(hconf)
    fs.listStatus(shardDir).filter(_.isFile).foreach { s =>
      val out = fs.create(s.getPath, true); out.write("NOT JSON".getBytes); out.close()
    }
    assert(spark.sql("SELECT count(*) AS c FROM graft_fst.lake.s WHERE id = 3")
      .head.getLong(0) === 1)
  }
}
