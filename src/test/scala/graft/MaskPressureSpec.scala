package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Mask-pressure relief — [[Compaction.purgeMasks]] +
  * [[MaskPressure]]: stacked lightweight-DML predicates degrade scans
  * (per-row evaluation, row-based decode); the surgical purge rewrites
  * ONLY the pressured files, restores columnar decode, and keeps rows
  * hash-exact. */
class MaskPressureSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_maskp_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_mp", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_mp.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mp.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  test("N stacked deletes, one CALL purge_masks: zero masks, columnar " +
      "decode restored, rows exact, untouched files untouched") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.lake.t1")
    spark.sql("CREATE TABLE graft_mp.lake.t1 (id BIGINT, v BIGINT)")
    // two files: ids 0..99 and 1000..1099 — only the first gets masks
    spark.range(0, 100).selectExpr("id", "id AS v")
      .coalesce(1).writeTo("graft_mp.lake.t1").append()
    spark.range(1000, 1100).selectExpr("id", "id AS v")
      .coalesce(1).writeTo("graft_mp.lake.t1").append()
    val dir = s"$warehouse/lake/t1"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'lake.t1')")
    withMergeOnRead {
      (0 until 5).foreach { i =>
        spark.sql(s"DELETE FROM graft_mp.lake.t1 WHERE id = ${i * 7 + 1}")
      }
    }
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.size === 1 && masks.head._2.size === 5,
      s"five stacked predicates on the one candidate file: $masks")
    // row-based decode while masked (no ColumnarToRow span over the scan)
    val maskedPlan = spark.table("graft_mp.lake.t1")
      .queryExecution.executedPlan.toString
    assert(!maskedPlan.contains("ColumnarToRow"),
      s"masked batches must decode row-based:\n$maskedPlan")
    val expected = (0L until 100L).filterNot(i => i % 7 == 1 && i <= 29) ++
      (1000L until 1100L)
    val untouchedSig = {
      val live = ParquetVersions.latest(dir).get._2
      val clean = live.filterNot(masks.keySet)
      clean.map(n => n -> fs.getFileStatus(new Path(s"$dir/data", n)).getLen).toMap
    }
    val st = spark.sql(
      "CALL graft_mp.system.purge_masks(table => 'lake.t1')").head
    assert(st.getLong(0) === 1L && st.getLong(1) === 1L && st.getLong(3) === 0L,
      s"one masked file rewritten, none remaining: $st")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    // columnar decode restored
    val purgedPlan = spark.table("graft_mp.lake.t1")
      .queryExecution.executedPlan.toString
    assert(purgedPlan.contains("ColumnarToRow"),
      s"purged table must decode columnar again:\n$purgedPlan")
    // rows hash-exact
    val got = spark.table("graft_mp.lake.t1").select("id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected.sorted)
    // the clean file was never rewritten
    untouchedSig.foreach { case (n, len) =>
      assert(fs.getFileStatus(new Path(s"$dir/data", n)).getLen === len,
        s"unmasked file $n must stay untouched")
    }
  }

  test("min_preds scopes the purge to pressured files only") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.lake.t2")
    spark.sql("CREATE TABLE graft_mp.lake.t2 (id BIGINT, v BIGINT)")
    spark.range(0, 100).selectExpr("id", "id AS v")
      .coalesce(1).writeTo("graft_mp.lake.t2").append()
    spark.range(1000, 1100).selectExpr("id", "id AS v")
      .coalesce(1).writeTo("graft_mp.lake.t2").append()
    val dir = s"$warehouse/lake/t2"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'lake.t2')")
    withMergeOnRead {
      // file A: 3 stacked masks; file B: 1 mask
      spark.sql("DELETE FROM graft_mp.lake.t2 WHERE id = 1")
      spark.sql("DELETE FROM graft_mp.lake.t2 WHERE id = 2")
      spark.sql("DELETE FROM graft_mp.lake.t2 WHERE id = 3")
      spark.sql("DELETE FROM graft_mp.lake.t2 WHERE id = 1001")
    }
    assert(ParquetVersions.masksFor(dir, None).size === 2)
    val st = spark.sql(
      "CALL graft_mp.system.purge_masks(table => 'lake.t2', min_preds => 3)").head
    assert(st.getLong(1) === 1L, s"only the 3-pred file rewrites: $st")
    assert(st.getLong(3) === 1L, "the 1-pred file keeps its mask")
    val after = ParquetVersions.masksFor(dir, None)
    assert(after.size === 1 && after.head._2.size === 1)
    assert(spark.table("graft_mp.lake.t2").count() === 196)
  }

  test("autopurge policy: crossing maxPreds triggers the surgical purge " +
      "from the DML itself; default mode only warns") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.lake.t3")
    spark.sql("CREATE TABLE graft_mp.lake.t3 AS SELECT id, id AS v FROM range(100)")
    val dir = s"$warehouse/lake/t3"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'lake.t3')")
    spark.conf.set(MaskPressure.MAX_PREDS_KEY, "2")
    try {
      withMergeOnRead {
        // default (warn-only): masks accumulate past the threshold
        spark.sql("DELETE FROM graft_mp.lake.t3 WHERE id = 1")
        spark.sql("DELETE FROM graft_mp.lake.t3 WHERE id = 2")
        assert(ParquetVersions.masksFor(dir, None).values
          .exists(_.size >= 2), "warn-only mode leaves the masks")
        spark.conf.set(MaskPressure.AUTOPURGE_KEY, "true")
        try {
          // this DML pushes a file to >= 2 preds → synchronous purge
          spark.sql("DELETE FROM graft_mp.lake.t3 WHERE id = 3")
          assert(ParquetVersions.masksFor(dir, None).isEmpty,
            "autopurge must consume the pressured masks in the same call")
        } finally spark.conf.unset(MaskPressure.AUTOPURGE_KEY)
      }
    } finally spark.conf.unset(MaskPressure.MAX_PREDS_KEY)
    assert(spark.table("graft_mp.lake.t3").count() === 97)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mp.lake.t3 WHERE id IN (1,2,3)")
      .head.getLong(0) === 0)
  }

  test("purge on a mask-free table is a free no-op (no version churn)") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.lake.t4")
    spark.sql("CREATE TABLE graft_mp.lake.t4 AS SELECT id FROM range(10)")
    val dir = s"$warehouse/lake/t4"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'lake.t4')")
    val v = ParquetVersions.latest(dir).get._1
    val st = spark.sql(
      "CALL graft_mp.system.purge_masks(table => 'lake.t4')").head
    assert(st.getLong(1) === 0L && st.getLong(3) === 0L)
    assert(ParquetVersions.latest(dir).get._1 === v, "no version churn")
  }

  test("log tier: masks surface in .files and autopurge fires from the DML") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.ops_lg")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mp.ops")
    spark.sql("DROP TABLE IF EXISTS graft_mp.ops.lg")
    spark.sql("""CREATE TABLE graft_mp.ops.lg
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(50).selectExpr("concat('u', id % 5) AS user_id", "id AS amount",
      "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
      .repartition(1).writeTo("graft_mp.ops.lg").append()
    val dir = s"$warehouse/ops/lg"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'ops.lg')")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_mp.ops.lg WHERE user_id = 'u1'")
    }
    // the pressure signal is visible through the log's .files relation
    val masked = spark.sql(
      "SELECT masks FROM graft_mp.ops.lg.files WHERE masks > 0").collect()
    assert(masked.length === 1 && masked.head.getInt(0) === 1,
      s"log .files must surface mask counts: ${masked.toSeq}")
    // autopurge: the threshold-crossing DML purges synchronously
    spark.conf.set(MaskPressure.MAX_PREDS_KEY, "2")
    spark.conf.set(MaskPressure.AUTOPURGE_KEY, "true")
    try withMergeOnRead {
      spark.sql("DELETE FROM graft_mp.ops.lg WHERE user_id = 'u2'")
    } finally {
      spark.conf.unset(MaskPressure.AUTOPURGE_KEY)
      spark.conf.unset(MaskPressure.MAX_PREDS_KEY)
    }
    assert(LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2.isEmpty,
      "the log-tier autopurge must consume the pressured masks")
    assert(spark.table("graft_mp.ops.lg").count() === 30)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mp.ops.lg WHERE user_id IN ('u1','u2')")
      .head.getLong(0) === 0)
  }

  test("bucketed table: purge outputs keep their bucket tags") {
    spark.sql("DROP TABLE IF EXISTS graft_mp.lake.t5")
    spark.sql("CREATE TABLE graft_mp.lake.t5 (user_id STRING, amount BIGINT)")
    import spark.implicits._
    val df = (0 until 80).map(i => (s"u${i % 8}", i.toLong)).toDF("user_id", "amount")
    ParquetBucketing.writeBucketed(spark, df, "graft_mp.lake.t5", "user_id", 4)
    val dir = s"$warehouse/lake/t5"
    spark.sql("CALL graft_mp.system.enable_versioning(table => 'lake.t5')")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_mp.lake.t5 WHERE user_id = 'u3'")
    }
    assert(ParquetVersions.masksFor(dir, None).nonEmpty)
    spark.sql("CALL graft_mp.system.purge_masks(table => 'lake.t5')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    val live = ParquetVersions.latest(dir).get._2
    assert(live.forall(n => ParquetBucketing.bucketOfName(n).isDefined),
      s"purge outputs must keep the bucket claim: $live")
    assert(spark.table("graft_mp.lake.t5").count() === 70)
  }
}
