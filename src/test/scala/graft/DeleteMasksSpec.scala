package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ (lightweight) DELETE — [[DeleteMasks]]: the predicate
  * lands as a mask inside the version publish, data files stay
  * byte-identical, scans filter masked rows, rewrites purge masks.
  * The ClickHouse lightweight-DELETE contract (the statement the
  * reference's own tests run, `hashes_test.go:235-239`) on the
  * parquet tier. */
class DeleteMasksSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_dv_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_dv", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_dv.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_dv.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  /** (name, len, mtime, first-64-bytes checksum) of every data file. */
  private def fileSigs(dir: String): Map[String, (Long, Long, Int)] = {
    val data = new Path(dir, "data")
    fs.listStatus(data).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).map { s =>
      val in = fs.open(s.getPath)
      val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
        finally in.close()
      (s.getPath.getName,
        (s.getLen, s.getModificationTime, java.util.Arrays.hashCode(head)))
    }.toMap
  }

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  test("a 1-row DELETE leaves every data file byte-identical") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.t1")
    spark.sql("CREATE TABLE graft_dv.lake.t1 (id BIGINT, score BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") * 2).as("score"))
        .coalesce(1).writeTo("graft_dv.lake.t1").append()
    }
    val dir = s"$warehouse/lake/t1"
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.t1')")
    val before = fileSigs(dir)
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t1 WHERE id = 150")
    }
    assert(fileSigs(dir) === before, "merge-on-read DELETE must not touch data bytes")
    assert(spark.table("graft_dv.lake.t1").count() === 299)
    assert(spark.sql("SELECT count(*) AS c FROM graft_dv.lake.t1 WHERE id = 150")
      .head.getLong(0) === 0)
    // exactly one file carries exactly one mask
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.values.flatten.size === 1, masks)
    // aggregates stay exact (footer-count pushdown is declined on masks)
    assert(spark.sql("SELECT sum(score) AS s FROM graft_dv.lake.t1")
      .head.getLong(0) === (0L until 300L).filter(_ != 150).map(_ * 2).sum)
  }

  test("masks are version-accurate: time travel straddles the delete") {
    val dir = s"$warehouse/lake/t1"
    val vPre = ParquetVersions.latest(dir).get._1 - 1
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_dv.lake.t1 VERSION AS OF $vPre")
      .head.getLong(0) === 300, "pre-delete snapshot must show the row")
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_dv.lake.t1 VERSION AS OF ${vPre + 1}")
      .head.getLong(0) === 299)
  }

  test("stacked deletes compose; masks survive vacuum in the retained window") {
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t1 WHERE id >= 290")
    }
    assert(spark.table("graft_dv.lake.t1").count() === 289)
    val dir = s"$warehouse/lake/t1"
    spark.sql("CALL graft_dv.system.vacuum(table => 'lake.t1', retain_last => 2)")
    assert(spark.table("graft_dv.lake.t1").count() === 289,
      "vacuum must not disturb mask state (masks are payload, not files)")
    assert(ParquetVersions.masksFor(dir, None).nonEmpty)
  }

  test("compaction purges masks: same rows, no masks, files rewritten") {
    val dir = s"$warehouse/lake/t1"
    spark.sql("CALL graft_dv.system.compact_table(table => 'lake.t1')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "compaction is the merge step that purges merge-on-read deletes")
    assert(spark.table("graft_dv.lake.t1").count() === 289)
    assert(spark.sql("SELECT count(*) AS c FROM graft_dv.lake.t1 WHERE id = 150")
      .head.getLong(0) === 0, "purged masks must not resurrect rows")
  }

  test("UPDATE after a masked delete does not resurrect masked rows") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.t2")
    spark.sql("CREATE TABLE graft_dv.lake.t2 AS " +
      "SELECT id, CAST(id % 7 AS BIGINT) AS k FROM range(200)")
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.t2')")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t2 WHERE id BETWEEN 10 AND 19")
    }
    // the UPDATE group-rewrites the (single) file; masked rows must not
    // come back, and the input's masks retire with it
    spark.sql("UPDATE graft_dv.lake.t2 SET k = -1 WHERE id < 5")
    assert(spark.table("graft_dv.lake.t2").count() === 190)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_dv.lake.t2 WHERE id BETWEEN 10 AND 19")
      .head.getLong(0) === 0)
    assert(spark.sql("SELECT count(*) AS c FROM graft_dv.lake.t2 WHERE k = -1")
      .head.getLong(0) === 5)
    assert(ParquetVersions.masksFor(s"$warehouse/lake/t2", None).isEmpty,
      "group rewrite retires the masked input and its masks")
  }

  test("_file provenance scans and DELETE fall-backs respect masks") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.t3")
    spark.sql("CREATE TABLE graft_dv.lake.t3 AS SELECT id FROM range(100)")
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.t3')")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t3 WHERE id < 10")
    }
    val rows = spark.sql("SELECT id, _file FROM graft_dv.lake.t3").collect()
    assert(rows.length === 90 && rows.forall(_.getLong(0) >= 10))
    // copy-on-write DELETE over a masked file keeps prior masks applied
    spark.sql("DELETE FROM graft_dv.lake.t3 WHERE id >= 90") // default CoW
    assert(spark.table("graft_dv.lake.t3").collect().map(_.getLong(0)).sorted
      === (10L until 90L).toArray)
  }

  test("changelog reports newly-masked rows as deletes (batch + net)") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.t4")
    spark.sql("CREATE TABLE graft_dv.lake.t4 AS SELECT id FROM range(50)")
    val dir = s"$warehouse/lake/t4"
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.t4')")
    val v1 = ParquetVersions.latest(dir).get._1
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t4 WHERE id IN (7, 13)")
    }
    val v2 = ParquetVersions.latest(dir).get._1
    val log = ChangeFeed.parquetChanges(spark, dir, v1, v2)
    val dels = log.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "delete")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(dels.toSeq === Seq(7L, 13L), "mask delta must surface as deletes")
    assert(log.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "insert").count() === 0)
    val net = ChangeFeed.parquetChanges(spark, dir, v1, v2, net = true)
    val netDels = net.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "delete")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(netDels.toSeq === Seq(7L, 13L))
  }

  test("a masked DELETE provably matching nothing is a no-op (no version churn)") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.t5")
    spark.sql("CREATE TABLE graft_dv.lake.t5 AS SELECT id FROM range(100)")
    val dir = s"$warehouse/lake/t5"
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.t5')")
    val vBefore = ParquetVersions.latest(dir).get._1
    withMergeOnRead {
      spark.sql("DELETE FROM graft_dv.lake.t5 WHERE id = 999999")
    }
    assert(ParquetVersions.latest(dir).get._1 === vBefore,
      "footer proof excludes every file: no commit, no version churn")
    assert(spark.table("graft_dv.lake.t5").count() === 100)
  }

  test("MoR REPLACE WHERE: masks + payload in ONE publish, pre-existing " +
      "files byte-identical, truncate keeps copy-on-write") {
    spark.sql("DROP TABLE IF EXISTS graft_dv.lake.rw")
    spark.sql("CREATE TABLE graft_dv.lake.rw (id BIGINT, score BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") * 2).as("score"))
        .coalesce(1).writeTo("graft_dv.lake.rw").append()
    }
    val dir = s"$warehouse/lake/rw"
    spark.sql("CALL graft_dv.system.enable_versioning(table => 'lake.rw')")
    val vPre = ParquetVersions.latest(dir).get._1
    val before = fileSigs(dir)
    withMergeOnRead {
      // ids 150..159 live in the middle file only → one mask; the
      // replacement payload (same id range, recomputed scores) must be
      // visible in the SAME version and NEVER masked itself
      spark.sql("""INSERT INTO graft_dv.lake.rw
                   REPLACE WHERE id >= 150 AND id < 160
                   SELECT id, id * 10 AS score FROM range(150, 160)""")
    }
    before.foreach { case (name, sig) =>
      assert(fileSigs(dir).get(name).contains(sig),
        s"merge-on-read REPLACE WHERE must not rewrite pre-existing $name")
    }
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.values.count(_.nonEmpty) === 1,
      s"exactly the might-match file is masked: $masks")
    assert(ParquetVersions.latest(dir).get._1 === vPre + 1,
      "retirement + payload must be ONE publish")
    assert(spark.table("graft_dv.lake.rw").count() === 300)
    assert(spark.sql(
      "SELECT sum(score) AS s FROM graft_dv.lake.rw WHERE id >= 150 AND id < 160")
      .head.getLong(0) === (150L until 160L).map(_ * 10).sum,
      "the payload replaces the range exactly")
    // straddle: the pinned pre-replace version shows the old scores
    assert(spark.sql(
      s"""SELECT sum(score) AS s FROM graft_dv.lake.rw VERSION AS OF $vPre
          WHERE id >= 150 AND id < 160""")
      .head.getLong(0) === (150L until 160L).map(_ * 2).sum)
    // truncate (INSERT OVERWRITE) stays copy-on-write even in MoR mode:
    // masking every row of every file would be strictly worse than the
    // metadata-only retirement
    withMergeOnRead {
      spark.sql("INSERT OVERWRITE graft_dv.lake.rw SELECT id, id AS score FROM range(5)")
    }
    assert(spark.table("graft_dv.lake.rw").count() === 5)
    assert(ParquetVersions.masksFor(dir, None).values.forall(_.isEmpty),
      "truncate must not land masks")
  }

  test("mask predicates round-trip the codec for every carried type") {
    import org.apache.spark.sql.sources._
    val filters: Seq[Filter] = Seq(
      EqualTo("a", 7L), EqualTo("s", "x"), GreaterThan("d", 3.5),
      LessThanOrEqual("t", java.sql.Timestamp.valueOf("2024-01-02 03:04:05")),
      GreaterThanOrEqual("dt", java.sql.Date.valueOf("2023-11-30")),
      In("k", Array[Any](1, 2, 3)), IsNull("n"), IsNotNull("n"),
      And(EqualTo("a", 1), Or(LessThan("b", 2L), Not(EqualTo("c", false)))),
      StringStartsWith("s", "pre"))
    filters.foreach { f =>
      val j = DeleteMasks.serialize(f)
      assert(j.isDefined, s"$f must serialize")
      val back = DeleteMasks.serialize(DeleteMasks.deserialize(j.get))
      assert(back === j, s"unstable round-trip for $f")
    }
  }
}
