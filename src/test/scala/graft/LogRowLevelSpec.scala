package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Group-based row-level operations on the entity log: SQL UPDATE and
  * MERGE INTO through the catalog, arbitrary-predicate DELETE falling
  * back from the metadata path to copy-on-write, runtime group
  * filtering leaving unaffected segments untouched, and the atomic
  * version-publish visibility contract. */
class LogRowLevelSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def ensureCatalog(name: String): String = {
    val wh = Files.createTempDirectory(s"graft_${name}_wh").toString
    if (spark.conf.getOption(s"spark.sql.catalog.$name").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$name", "graft.sources.LogCatalog")
      spark.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    }
    spark.conf.get(s"spark.sql.catalog.$name.warehouse")
  }

  /** Catalog log table with three single-segment inserts of known,
    * zone-separable shape. Returns the table's directory. */
  private def freshTable(cat: String, tbl: String): String = {
    val wh = ensureCatalog(cat)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ops")
    spark.sql(s"""CREATE TABLE $cat.ops.$tbl
      (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    // single-partition inserts: one segment per logical batch, so the
    // per-segment assertions below are deterministic
    def ins(values: String): Unit =
      { spark.sql(s"INSERT INTO $cat.ops.$tbl SELECT /*+ COALESCE(1) */ * FROM VALUES $values"); () }
    ins("('u1', 10, CAST(NULL AS BINARY), 'ha1'), ('u1', 20, CAST(NULL AS BINARY), 'ha2')")
    ins("('zz', 100, CAST(NULL AS BINARY), 'hb1'), ('zz', 200, CAST(NULL AS BINARY), 'hb2')")
    ins("('u7', 700, CAST(NULL AS BINARY), 'hc1'), ('u8', 800, CAST(NULL AS BINARY), 'hc2')")
    new Path(new Path(wh, "ops"), tbl).toString
  }

  private def rows(cat: String, tbl: String): Set[(String, Long, String)] =
    spark.sql(s"SELECT user_id, amount, sha256sum FROM $cat.ops.$tbl")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  private def liveNames(dir: String): Set[String] =
    LogVersions.latest(dir).map(_._2.toSet)
      .getOrElse(LimitHashLog.segments(dir).map(p => new Path(p._1).getName).toSet)

  test("SQL UPDATE rewrites only the segments holding matching rows") {
    val dir = freshTable("graft_rlo", "upd")
    // INSERT INTO on an un-versioned log doesn't enable versioning; the
    // UPDATE below must auto-upgrade it
    assert(!LogVersions.enabled(dir))
    val namesBefore = LimitHashLog.segments(dir)
      .map(p => new Path(p._1).getName).toSet
    assert(namesBefore.size === 3)
    // the group set the update must touch, by provenance query
    val affected = spark.sql(
      "SELECT DISTINCT _segment FROM graft_rlo.ops.upd WHERE user_id = 'zz'")
      .collect().map(_.getString(0)).toSet
    assert(affected.size === 1)

    spark.sql("UPDATE graft_rlo.ops.upd SET amount = amount + 1000 WHERE user_id = 'zz'")

    assert(rows("graft_rlo", "upd") === Set(
      ("u1", 10L, "ha1"), ("u1", 20L, "ha2"),
      ("zz", 1100L, "hb1"), ("zz", 1200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2")))

    // atomic upgrade happened and exactly one version swap landed
    assert(LogVersions.enabled(dir))
    val live = liveNames(dir)
    // runtime group filtering: segments with no 'zz' rows are NOT
    // rewritten — their original names stay live; the affected one is
    // replaced by a segment-rlo-* rewrite
    assert(namesBefore.intersect(live) === namesBefore -- affected,
      s"expected only $affected rewritten, live=$live before=$namesBefore")
    assert(live.exists(_.startsWith("segment-rlo-")))
    assert(live.size === 3)

    // stats manifests stay exact: metadata-served COUNT agrees
    assert(spark.sql("SELECT count(*) FROM graft_rlo.ops.upd").head().getLong(0) === 6L)
  }

  test("UPDATE is snapshot-atomic: the pre-update version still reads exactly") {
    val dir = freshTable("graft_rlo", "updv")
    LogVersions.enable(dir)
    val vBefore = LogVersions.latest(dir).get._1
    spark.sql("UPDATE graft_rlo.ops.updv SET amount = 0 WHERE amount >= 700")
    assert(rows("graft_rlo", "updv").count(_._2 == 0L) === 2)
    val pinned = spark.sql(
      s"SELECT user_id, amount FROM graft_rlo.ops.updv VERSION AS OF $vBefore")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(pinned === Set(("u1", 10L), ("u1", 20L), ("zz", 100L),
      ("zz", 200L), ("u7", 700L), ("u8", 800L)))
  }

  test("MERGE INTO: matched update, not-matched insert, source-driven group pruning") {
    val dir = freshTable("graft_rlo", "mrg")
    import spark.implicits._
    Seq(("zz", 9999L, "hb1-new"), ("u9", 90L, "hd1"))
      .toDF("user_id", "amount", "sha256sum")
      .createOrReplaceTempView("mrg_source")

    spark.sql("""
      MERGE INTO graft_rlo.ops.mrg t
      USING mrg_source s
      ON t.sha256sum = 'hb1' AND s.user_id = 'zz'
      WHEN MATCHED THEN UPDATE SET t.amount = s.amount
      WHEN NOT MATCHED AND s.user_id = 'u9' THEN
        INSERT (user_id, amount, msg, sha256sum)
        VALUES (s.user_id, s.amount, CAST(NULL AS BINARY), s.sha256sum)
    """)

    assert(rows("graft_rlo", "mrg") === Set(
      ("u1", 10L, "ha1"), ("u1", 20L, "ha2"),
      ("zz", 9999L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"),
      ("u9", 90L, "hd1")))
    assert(LogVersions.enabled(dir))
  }

  test("DELETE with a predicate the metadata path can't evaluate falls back to rewrite") {
    val dir = freshTable("graft_rlo", "delx")
    // amount % 3 is not in LogDelete.supported → canDeleteWhere false →
    // Spark plans the group-based ReplaceData rewrite instead of failing
    spark.sql("DELETE FROM graft_rlo.ops.delx WHERE amount % 3 = 1")
    // 10, 100, 700 ≡ 1 (mod 3) go; 20, 200, 800 ≡ 2 stay
    assert(rows("graft_rlo", "delx") === Set(
      ("u1", 20L, "ha2"), ("zz", 200L, "hb2"), ("u8", 800L, "hc2")))
    assert(LogVersions.enabled(dir)) // rewrite commits are version publishes
  }

  test("_segment metadata column: provenance projection on a normal scan") {
    val dir = freshTable("graft_rlo", "seg")
    val bySeg = spark.sql(
      "SELECT _segment, count(*) AS n FROM graft_rlo.ops.seg GROUP BY _segment")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bySeg.size === 3)
    assert(bySeg.values.toSeq.sorted === Seq(2L, 2L, 2L))
    assert(bySeg.keys.forall(_.startsWith("segment-")))
    val dirNames = LimitHashLog.segments(dir).map(p => new Path(p._1).getName).toSet
    assert(bySeg.keySet === dirNames)
  }

  test("unconditioned UPDATE rewrites the whole table and keeps row count") {
    freshTable("graft_rlo", "updall")
    spark.sql("UPDATE graft_rlo.ops.updall SET amount = amount * 2")
    val r = rows("graft_rlo", "updall")
    assert(r.map(_._2) === Set(20L, 40L, 200L, 400L, 1400L, 1600L))
    assert(r.size === 6)
  }

  test("UPDATE on a VERSION AS OF snapshot is rejected") {
    val dir = freshTable("graft_rlo", "updpin")
    LogVersions.enable(dir)
    val e = intercept[Exception] {
      spark.sql("UPDATE graft_rlo.ops.updpin VERSION AS OF 1 SET amount = 0")
    }
    assert(e.getMessage != null)
  }
}
