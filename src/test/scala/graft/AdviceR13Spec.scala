package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression pins for the round-13 ADVICE findings:
  *
  *   1. high — [[MoRMergeKernel.morExact]] counts DISTINCT TARGET rows,
  *      not raw hide-join rows: with a single unconditional WHEN
  *      MATCHED THEN DELETE Spark plans `checkCardinality = false`, so
  *      duplicate source key tuples legally multiply the hide join and
  *      a raw census could declare a (file, key) fully hidden while a
  *      same-key row under a residual ON conjunct stays visible — the
  *      published key mask would silently delete it;
  *   2. medium — the MASK-regime publish of merge-on-read
  *      MERGE/UPDATE carries a [[VersionLedger.MaskGuard]]: a
  *      concurrent lightweight DELETE masking a matched key in a
  *      candidate between classification and publish aborts the
  *      publish (the appended unmasked image would resurrect the
  *      deleted row in either commit order) and the retry
  *      re-classifies against the fresh masks;
  *   3. low — [[MaskPressure.afterMaskPublish]] never throws: the DML
  *      already committed, and a purge-side MaskConflictException
  *      escaping into `retryOnMaskConflict` would re-run the committed
  *      DML body (double-applied images).
  *
  * The races are made DETERMINISTIC by wrapping the `file` scheme's
  * [[LedgerStores.AtomicCreate]]: a one-shot hook fires immediately
  * before the victim's ledger create attempt, lands the concurrent
  * DELETE's commit first, and the victim's CAS retry walks into the
  * guard check with the drifted masks. */
class AdviceR13Spec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_advr13_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_a13", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_a13.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_a13.lake")
    s
  }

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  /** Run `f` with a one-shot `hook` firing right before the FIRST
    * ledger create attempt under `dirSubstring`; the original `file`
    * store is restored afterwards. The hook is cleared before it runs,
    * so ledger publishes it performs itself delegate straight through. */
  private def withPublishHook[A](dirSubstring: String)(hook: () => Unit)(
      f: => A): A = {
    val fs = new Path(warehouse).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val original = LedgerStores.forPath(fs, new Path(s"file:$warehouse/x"))
    @volatile var pending: Option[() => Unit] = Some(hook)
    LedgerStores.register("file", new LedgerStores.AtomicCreate {
      override def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
          p: Path, bytes: Array[Byte]): Boolean = {
        if (p.toUri.getPath.contains(dirSubstring)) {
          pending match {
            case Some(h) => pending = None; h()
            case None => ()
          }
        }
        original.tryCreateExclusive(fs, p, bytes)
      }
    })
    try f finally LedgerStores.register("file", original)
  }

  // --- 1. the exactness census under duplicate source keys ----------

  test("morExact: duplicate source keys + residual ON conjunct cannot " +
      "mask-delete a same-file same-key row that stays visible") {
    spark.sql("DROP TABLE IF EXISTS graft_a13.lake.cen")
    spark.sql("CREATE TABLE graft_a13.lake.cen (k BIGINT, v BIGINT)")
    import spark.implicits._
    Seq((1L, 10L), (1L, 20L), (5L, 50L)).toDF("k", "v")
      .coalesce(1).writeTo("graft_a13.lake.cen").append()
    spark.sql("CALL graft_a13.system.enable_versioning(table => 'lake.cen')")
    // two IDENTICAL source rows: legal under checkCardinality=false
    // (single unconditional WHEN MATCHED THEN DELETE); the hide join
    // then holds TWO raw rows for target (1,10) — a raw census reads
    // hideCnt=2 == totCnt=2 for (file, k=1) and the k IN (1) mask
    // would also delete (1,20), which only the residual t.v <= s.v
    // conjunct kept visible
    Seq((1L, 10L), (1L, 10L)).toDF("k", "v").createOrReplaceTempView("cen_src")
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_a13.lake.cen t USING cen_src s
                   ON t.k = s.k AND t.v <= s.v
                   WHEN MATCHED THEN DELETE""")
    }
    val left = spark.table("graft_a13.lake.cen")
      .as[(Long, Long)].collect().toSet
    assert(left === Set((1L, 20L), (5L, 50L)),
      s"only the matched (1,10) row may be deleted; table holds $left")
  }

  test("morExact: log tier shares the distinct-row census") {
    // same shape through the shared kernel on the entity log: user_id
    // is the key, amount carries the residual conjunct
    val dir = Files.createTempDirectory("graft_advr13_log").toString
    import spark.implicits._
    Seq(("a", 10L, "s1"), ("a", 20L, "s2"), ("b", 50L, "s3"))
      .toDF("user_id", "amount", "sha256sum")
      .selectExpr("user_id", "amount", "CAST(NULL AS BINARY) AS msg",
        "sha256sum")
      .repartition(1)
      .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    LogVersions.enable(dir)
    val parent = new Path(dir).getParent.toString
    val name = new Path(dir).getName
    spark.conf.set("spark.sql.catalog.graft_a13log", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_a13log.warehouse", parent)
    Seq(("a", 10L), ("a", 10L)).toDF("k", "amt")
      .createOrReplaceTempView("cen_log_s")
    withMergeOnRead {
      spark.sql(s"""MERGE INTO graft_a13log.`$name` t USING cen_log_s s
                    ON t.user_id = s.k AND t.amount <= s.amt
                    WHEN MATCHED THEN DELETE""")
    }
    val left = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .selectExpr("user_id", "amount").as[(String, Long)].collect().toSet
    assert(left === Set(("a", 20L), ("b", 50L)),
      s"log tier must not mask-delete the visible same-key row; got $left")
  }

  // --- 2. mask-regime publishes are guarded --------------------------

  test("MoR MERGE mask regime aborts and re-classifies when a concurrent " +
      "lightweight DELETE masks a matched key mid-publish") {
    spark.sql("DROP TABLE IF EXISTS graft_a13.lake.race_m")
    spark.sql("CREATE TABLE graft_a13.lake.race_m (k BIGINT, v BIGINT)")
    spark.range(1, 11).selectExpr("id AS k", "id * 10 AS v")
      .coalesce(1).writeTo("graft_a13.lake.race_m").append()
    spark.sql("CALL graft_a13.system.enable_versioning(table => 'lake.race_m')")
    spark.range(1, 2).selectExpr("id AS k", "111 AS v")
      .createOrReplaceTempView("race_m_src")
    withMergeOnRead {
      withPublishHook("/lake/race_m/")(() =>
        spark.sql("DELETE FROM graft_a13.lake.race_m WHERE k = 1")) {
        spark.sql("""MERGE INTO graft_a13.lake.race_m t USING race_m_src s
                     ON t.k = s.k
                     WHEN MATCHED THEN UPDATE SET v = s.v""")
      }
    }
    // either serial order deletes k=1: MERGE-then-DELETE removes the
    // updated row; DELETE-then-MERGE matches nothing. An unguarded
    // mask publish instead resurrects (1, 111) via the appended image.
    assert(spark.sql("SELECT count(*) FROM graft_a13.lake.race_m WHERE k = 1")
      .head.getLong(0) === 0L, "the concurrent DELETE must win")
    assert(spark.table("graft_a13.lake.race_m").count() === 9L)
  }

  test("MoR UPDATE mask regime aborts and re-classifies when a concurrent " +
      "lightweight DELETE masks a matched row mid-publish") {
    spark.sql("DROP TABLE IF EXISTS graft_a13.lake.race_u")
    spark.sql("CREATE TABLE graft_a13.lake.race_u (k BIGINT, v BIGINT)")
    spark.range(1, 11).selectExpr("id AS k", "id * 10 AS v")
      .coalesce(1).writeTo("graft_a13.lake.race_u").append()
    spark.sql("CALL graft_a13.system.enable_versioning(table => 'lake.race_u')")
    withMergeOnRead {
      withPublishHook("/lake/race_u/")(() =>
        spark.sql("DELETE FROM graft_a13.lake.race_u WHERE k = 1")) {
        spark.sql("UPDATE graft_a13.lake.race_u SET v = 999 WHERE k <= 1")
      }
    }
    assert(spark.sql("SELECT count(*) FROM graft_a13.lake.race_u WHERE k = 1")
      .head.getLong(0) === 0L, "the concurrent DELETE must win")
    assert(spark.sql("SELECT count(*) FROM graft_a13.lake.race_u WHERE v = 999")
      .head.getLong(0) === 0L, "no resurrected unmasked image")
    assert(spark.table("graft_a13.lake.race_u").count() === 9L)
  }
}
