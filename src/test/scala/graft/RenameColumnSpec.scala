package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** RENAME COLUMN without a rewrite ([[Renames]]): the declared schema
  * records each field's name history; readers resolve every file's
  * vintage from its own footer and read pre-rename files under their
  * old name vector — batch scans, filters, DML maintenance reads,
  * masks, change feeds and compaction all see ONE logical column. */
class RenameColumnSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_ren_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_rn", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_rn.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_rn.lake")
    s
  }

  test("old and new files in ONE scan: values, filters, aggregates") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r1")
    spark.sql("CREATE TABLE graft_rn.lake.r1 (id BIGINT, amt BIGINT)")
    spark.range(0, 50).selectExpr("id", "id * 2 AS amt")
      .coalesce(1).writeTo("graft_rn.lake.r1").append()
    spark.sql("ALTER TABLE graft_rn.lake.r1 RENAME COLUMN amt TO cents")
    assert(spark.table("graft_rn.lake.r1").schema.fieldNames.toSeq ===
      Seq("id", "cents"))
    // new files land with the NEW name; the old file keeps `amt`
    spark.range(50, 80).selectExpr("id", "id * 2 AS cents")
      .coalesce(1).writeTo("graft_rn.lake.r1").append()
    assert(spark.sql("SELECT sum(cents) AS s FROM graft_rn.lake.r1")
      .head.getLong(0) === (0L until 80L).map(_ * 2).sum)
    // filter straddles the vintages
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_rn.lake.r1 WHERE cents >= 60")
      .head.getLong(0) === 50L)
    // old rows really carry their values (not nulls)
    assert(spark.sql(
      "SELECT cents FROM graft_rn.lake.r1 WHERE id = 7").head.getLong(0) === 14L)
    // double rename: a→b→c still resolves the original files
    spark.sql("ALTER TABLE graft_rn.lake.r1 RENAME COLUMN cents TO pennies")
    spark.range(80, 90).selectExpr("id", "id * 2 AS pennies")
      .coalesce(1).writeTo("graft_rn.lake.r1").append()
    assert(spark.sql("SELECT sum(pennies) AS s FROM graft_rn.lake.r1")
      .head.getLong(0) === (0L until 90L).map(_ * 2).sum)
    assert(spark.sql(
      "SELECT pennies FROM graft_rn.lake.r1 WHERE id = 7").head.getLong(0) === 14L)
  }

  test("rename refuses history collisions and resurrection") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r2")
    spark.sql("CREATE TABLE graft_rn.lake.r2 (id BIGINT, a BIGINT, b BIGINT)")
    spark.sql("INSERT INTO graft_rn.lake.r2 VALUES (1, 10, 100)")
    spark.sql("ALTER TABLE graft_rn.lake.r2 RENAME COLUMN a TO a2")
    // a new column named like a FORMER name of another column is
    // ambiguous for vintage resolution
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft_rn.lake.r2 RENAME COLUMN b TO a"))
      .getMessage.contains("ambiguous"))
    // existing files carry 'b' bytes — renaming something else onto it
    // later would resurrect them
    spark.sql("ALTER TABLE graft_rn.lake.r2 DROP COLUMN b")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft_rn.lake.r2 RENAME COLUMN a2 TO b"))
      .getMessage.contains("resurrect"))
  }

  test("merge-on-read DELETE masks and DVs compose with renamed columns") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r3")
    spark.sql("CREATE TABLE graft_rn.lake.r3 (k BIGINT, v BIGINT)")
    spark.range(0, 40).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo("graft_rn.lake.r3").append()
    val dir = s"$warehouse/lake/r3"
    spark.sql("CALL graft_rn.system.enable_versioning(table => 'lake.r3')")
    spark.sql("ALTER TABLE graft_rn.lake.r3 RENAME COLUMN v TO score")
    spark.range(40, 60).selectExpr("id AS k", "id AS score")
      .coalesce(1).writeTo("graft_rn.lake.r3").append()
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      // predicate mask on the RENAMED column name, hitting BOTH vintages
      spark.sql("DELETE FROM graft_rn.lake.r3 WHERE score % 10 = 3")
      assert(spark.table("graft_rn.lake.r3").count() === 54)
      assert(spark.sql(
        "SELECT count(*) AS c FROM graft_rn.lake.r3 WHERE score % 10 = 3")
        .head.getLong(0) === 0)
      // DV regime on the renamed, mixed-vintage table
      spark.range(0, 50).selectExpr("id AS k").createOrReplaceTempView("r3_src")
      spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, "3")
      try spark.sql(
        """MERGE INTO graft_rn.lake.r3 t USING r3_src s ON t.k = s.k
           WHEN MATCHED AND t.score % 2 = 0 THEN DELETE""")
      finally spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
    } finally spark.conf.unset(DeleteMasks.MODE_KEY)
    val got = spark.table("graft_rn.lake.r3").collect().map(_.getLong(0)).toSet
    val expected = (0L until 60L)
      .filter(k => k % 10 != 3)           // masked DELETE
      .filterNot(k => k < 50 && k % 2 == 0) // DV MERGE delete
      .toSet
    assert(got === expected, s"extra=${got -- expected} missing=${expected -- got}")
  }

  test("compaction migrates old vintages to current names; change feed " +
      "spans the rename") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r4")
    spark.sql("CREATE TABLE graft_rn.lake.r4 (k BIGINT, v BIGINT)")
    spark.range(0, 20).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo("graft_rn.lake.r4").append()
    val dir = s"$warehouse/lake/r4"
    spark.sql("CALL graft_rn.system.enable_versioning(table => 'lake.r4')")
    val vBefore = ParquetVersions.latest(dir).get._1
    spark.sql("ALTER TABLE graft_rn.lake.r4 RENAME COLUMN v TO score")
    spark.range(20, 30).selectExpr("id AS k", "id AS score")
      .coalesce(1).writeTo("graft_rn.lake.r4").append()
    ParquetVersions.catchUp(dir)
    val vTo = ParquetVersions.latest(dir).get._1
    // change feed across the rename serves the logical column
    val net = ChangeFeed.parquetChanges(spark, dir, vBefore, vTo, net = true)
      .select("k", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(net === (20L until 30L).map((_, "insert")).toSet)
    // time travel to the pre-rename version reads under the CURRENT
    // declared schema (names are declared-level, files resolve)
    assert(spark.sql(
      s"SELECT sum(score) AS s FROM graft_rn.lake.r4 VERSION AS OF $vBefore")
      .head.getLong(0) === (0L until 20L).sum)
    // compaction rewrites through the rename-aware visible read: the
    // output files carry CURRENT names
    spark.sql("CALL graft_rn.system.compact_table(table => 'lake.r4')")
    assert(spark.sql("SELECT sum(score) AS s FROM graft_rn.lake.r4")
      .head.getLong(0) === (0L until 30L).sum)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val conf = spark.sparkContext.hadoopConfiguration
    ParquetVersions.latest(dir).get._2.foreach { rel =>
      val p = new Path(s"$dir/data", rel)
      val cols = Renames.fileColumns(conf, p, fs.getFileStatus(p).getLen)
      assert(cols("score") && !cols("v"),
        s"compacted file $rel must carry current names, got $cols")
    }
  }

  test("partition and mask-referenced columns refuse rename") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r5")
    spark.sql("""CREATE TABLE graft_rn.lake.r5 (tier STRING, amount BIGINT)
                 PARTITIONED BY (tier)""")
    spark.sql("INSERT INTO graft_rn.lake.r5 VALUES ('a', 1), ('b', 2)")
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft_rn.lake.r5 RENAME COLUMN tier TO t2"))
      .getMessage.contains("partition"))

    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r6")
    spark.sql("CREATE TABLE graft_rn.lake.r6 (k BIGINT, v BIGINT)")
    spark.range(0, 10).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo("graft_rn.lake.r6").append()
    val dir = s"$warehouse/lake/r6"
    ParquetVersions.enable(dir)
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_rn.lake.r6 WHERE v = 3")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    assert(ParquetVersions.masksFor(dir, None).nonEmpty)
    assert(intercept[Exception](spark.sql(
      "ALTER TABLE graft_rn.lake.r6 RENAME COLUMN v TO score"))
      .getMessage.contains("masks"))
  }

  test("rename COMPOSED with type widening: old files carry the old " +
      "name AND the old physical type") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r8")
    spark.sql("CREATE TABLE graft_rn.lake.r8 (id BIGINT, amt INT)")
    spark.range(0, 30).selectExpr("id", "CAST(id * 2 AS INT) AS amt")
      .coalesce(1).writeTo("graft_rn.lake.r8").append()
    spark.sql("ALTER TABLE graft_rn.lake.r8 ALTER COLUMN amt TYPE BIGINT")
    spark.sql("ALTER TABLE graft_rn.lake.r8 RENAME COLUMN amt TO cents")
    // new slice: new name, 64-bit values
    spark.range(30, 40).selectExpr("id", "id * 5000000000 AS cents")
      .coalesce(1).writeTo("graft_rn.lake.r8").append()
    // one scan spans (old name + int32) and (new name + int64) files
    assert(spark.sql("SELECT sum(cents) AS s FROM graft_rn.lake.r8")
      .head.getLong(0) ===
        (0L until 30L).map(_ * 2).sum + (30L until 40L).map(_ * 5000000000L).sum)
    assert(spark.sql(
      "SELECT cents FROM graft_rn.lake.r8 WHERE id = 4").head.getLong(0) === 8L)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_rn.lake.r8 WHERE cents >= 20")
      .head.getLong(0) === 30L)
  }

  test("streaming tail of a renamed table serves old files under the " +
      "current names") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r7")
    spark.sql("CREATE TABLE graft_rn.lake.r7 (k BIGINT, v BIGINT)")
    spark.range(0, 10).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo("graft_rn.lake.r7").append()
    val dir = s"$warehouse/lake/r7"
    spark.sql("CALL graft_rn.system.enable_versioning(table => 'lake.r7')")
    spark.sql("ALTER TABLE graft_rn.lake.r7 RENAME COLUMN v TO score")
    val ckpt = Files.createTempDirectory("graft_rn_ck").toString
    val q = spark.readStream.table("graft_rn.lake.r7")
      .writeStream.format("memory").queryName("rn_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT k, score FROM rn_tail").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === (0L until 10L).map(k => (k, k)).toSet)
    } finally q.stop()
  }

  test("aggregate pushdown on a renamed table serves MIN/MAX/COUNT from " +
      "translated stats — no data file opened, exact values") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r10")
    spark.sql("CREATE TABLE graft_rn.lake.r10 (id BIGINT, amt BIGINT)")
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100).selectExpr("id", "id * 3 AS amt")
        .coalesce(1).writeTo("graft_rn.lake.r10").append()
    }
    spark.sql("ALTER TABLE graft_rn.lake.r10 RENAME COLUMN amt TO cents")
    spark.range(400, 450).selectExpr("id", "id * 3 AS cents")
      .coalesce(1).writeTo("graft_rn.lake.r10").append()
    val agg = spark.sql("""SELECT min(cents) AS mn, max(cents) AS mx,
                                  count(*) AS n, count(cents) AS nc
                           FROM graft_rn.lake.r10""")
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PrecomputedAgg"),
      s"renamed-table aggregate must serve from translated stats:\n${plan.take(1500)}")
    val r = agg.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((0L, 449L * 3, 450L, 450L)))
    // composed with widening: the r8 table carries old-name int32 files
    // AND new-name int64 files under one BIGINT column — same DInt
    // stats domain, still metadata-served
    val agg8 = spark.sql(
      "SELECT min(cents) AS mn, max(cents) AS mx FROM graft_rn.lake.r8")
    assert(agg8.queryExecution.executedPlan.toString.contains("PrecomputedAgg"))
    val want = spark.sql(
      "SELECT /*+ REPARTITION(1) */ cents FROM graft_rn.lake.r8")
      .collect().map(_.getLong(0))
    assert(agg8.head.getLong(0) === want.min)
    assert(agg8.head.getLong(1) === want.max)
    // a filtered aggregate falls back to the row scan and stays exact
    val filtered = spark.sql(
      "SELECT max(cents) AS mx FROM graft_rn.lake.r10 WHERE id < 100")
    assert(!filtered.queryExecution.executedPlan.toString.contains("PrecomputedAgg"))
    assert(filtered.head.getLong(0) === 99L * 3)
    // a GROUP BY falls back too
    val grouped = spark.sql(
      "SELECT id % 2 AS g, max(cents) FROM graft_rn.lake.r10 GROUP BY 1")
    assert(!grouped.queryExecution.executedPlan.toString.contains("PrecomputedAgg"))
    assert(grouped.collect().length === 2)
  }

  test("footer pruning on a renamed column equals the pre-rename counts " +
      "(old-name stats translate through the name history — no permanent tax)") {
    spark.sql("DROP TABLE IF EXISTS graft_rn.lake.r9")
    spark.sql("CREATE TABLE graft_rn.lake.r9 (id BIGINT, amt BIGINT)")
    (0 until 6).foreach { i =>
      spark.range(i * 100, i * 100 + 100).selectExpr("id", "id AS amt")
        .coalesce(1).writeTo("graft_rn.lake.r9").append()
    }
    val dataKey = s"$warehouse/lake/r9/data"
    def keptOf(sql: String): (Int, Int, Long) = {
      StatsPrunedFileIndex.lastListing.remove(dataKey)
      val n = spark.sql(sql).count()
      val (kept, total) = StatsPrunedFileIndex.lastListing.get(dataKey)
      (kept, total, n)
    }
    assert(keptOf("SELECT * FROM graft_rn.lake.r9 WHERE amt = 250") ===
      ((1, 6, 1L)), "pre-rename baseline: range-disjoint files prune to 1")
    spark.sql("ALTER TABLE graft_rn.lake.r9 RENAME COLUMN amt TO cents")
    // one new-name file so both vintages coexist in the listing
    spark.range(600, 700).selectExpr("id", "id AS cents")
      .coalesce(1).writeTo("graft_rn.lake.r9").append()
    assert(keptOf("SELECT * FROM graft_rn.lake.r9 WHERE cents = 250") ===
      ((1, 7, 1L)),
      "old-vintage footers must keep pruning via their old-name stats")
    // the new-vintage file prunes on its own (current-name) stats too
    assert(keptOf("SELECT * FROM graft_rn.lake.r9 WHERE cents = 650") ===
      ((1, 7, 1L)))
    // a second rename translates through the WHOLE history
    spark.sql("ALTER TABLE graft_rn.lake.r9 RENAME COLUMN cents TO pennies")
    assert(keptOf("SELECT * FROM graft_rn.lake.r9 WHERE pennies = 250") ===
      ((1, 7, 1L)))
    // correctness unchanged: translated pruning never drops a match
    assert(spark.sql("SELECT sum(pennies) AS s FROM graft_rn.lake.r9")
      .head.getLong(0) === (0L until 700L).sum)
  }
}
