package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan}
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ (lightweight) DELETE on the LOG tier — masks ride the
  * version-ledger payloads ([[LogVersions]]), segments stay
  * byte-identical, every reader (row, columnar, time travel, CoW
  * rewrites, compaction, change feed) honors them, and purge/compaction
  * consume them. */
class LogMoRSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  /** Versioned log with three single-segment commits of known shape:
    *   segment A: u1/u2, amounts 10..40
    *   segment B: every row user_id = "zz" (single-value zone)
    *   segment C: u7/u8, amounts 700..900 */
  private def freshLog(): String = {
    val dir = Files.createTempDirectory("graft_lhmor").toString
    def write(rows: Seq[(String, Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "amount", "sha256sum")
        .select(col("user_id"), col("amount"),
          lit(null).cast("binary").as("msg"), col("sha256sum"))
        .repartition(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
      ()
    }
    write(Seq(("u1", 10L, "ha1"), ("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u2", 40L, "ha4")))
    write(Seq(("zz", 100L, "hb1"), ("zz", 200L, "hb2")))
    write(Seq(("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    LogVersions.enable(dir)
    dir
  }

  private def fs(dir: String) = new Path(dir).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def segSigs(dir: String): Map[String, (Long, Long)] =
    LimitHashLog.segments(dir).map { case (f, len) =>
      val st = fs(dir).getFileStatus(new Path(f))
      (new Path(f).getName, (len, st.getModificationTime))
    }.toMap

  private def rows(dir: String, version: Option[Long] = None): Set[(String, Long, String)] = {
    val rd = spark.read.format(LimitHashLog.FORMAT)
    val df = version.fold(rd)(v => rd.option("versionAsOf", v)).load(dir)
      .select("user_id", "amount", "sha256sum")
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
  }

  private def masksOf(dir: String): Map[String, Seq[String]] =
    LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  test("masked DELETE: zero data I/O — drops metadata-only, masks on " +
      "might-match segments, every segment byte-identical") {
    val dir = freshLog()
    val before = segSigs(dir)
    val table = new LimitHashLogTable(dir)
    withMergeOnRead {
      // zz drops whole (single-value zone); A gets a mask (u1 inside
      // its zone); C is clean (no u1/zz)
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("user_id", "u1")))
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("user_id", "zz")))
    }
    val after = segSigs(dir)
    assert(after === before,
      "merge-on-read DELETE must leave every segment file byte-identical")
    val masks = masksOf(dir)
    assert(masks.size === 1 && masks.head._2.size === 1,
      s"exactly the might-match segment is masked: $masks")
    // exact rows, row AND columnar paths (columnar is the default)
    assert(rows(dir) === Set(("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    val rowBased = spark.read.format(LimitHashLog.FORMAT)
      .option("columnar", "false").load(dir)
      .select("user_id", "amount", "sha256sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(rowBased === rows(dir), "row reader applies masks too")
  }

  test("stacked masks compose; time travel straddles each version exactly") {
    val dir = freshLog()
    val table = new LimitHashLogTable(dir)
    withMergeOnRead {
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("user_id", "u1"))) // v2: mask on A
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        GreaterThanOrEqual("amount", 30L), LessThan("amount", 750L))) // v3
    }
    assert(rows(dir, Some(1L)).size === 9, "v1 pre-delete")
    assert(rows(dir, Some(2L)) === Set(("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    assert(rows(dir) === Set(("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    // a masked segment disables the metadata COUNT shortcut, never its
    // correctness: the count comes from the mask-aware scan
    val cnt = spark.read.format(LimitHashLog.FORMAT).load(dir).count()
    assert(cnt === 2L)
    // LIMIT on a masked log never under-delivers (masked stats count 0
    // toward the coverage proof)
    assert(spark.read.format(LimitHashLog.FORMAT).load(dir).limit(2)
      .collect().length === 2)
  }

  test("CoW rewrites honor and purge masks: a later DELETE (mode off) " +
      "cannot resurrect masked rows") {
    val dir = freshLog()
    val table = new LimitHashLogTable(dir)
    withMergeOnRead {
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("user_id", "u1"))) // mask on A
    }
    // mode off: a partial-match DELETE rewrites segment A — the rewrite
    // must drop the masked u1 rows too, and its publish retires A's mask
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("amount", 30L)))
    assert(rows(dir) === Set(("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    assert(masksOf(dir).isEmpty, "the rewrite purges the masks it consumed")
  }

  test("SQL UPDATE (copy-on-write) on a masked log: no resurrection") {
    val warehouse = Files.createTempDirectory("graft_lhmor_wh").toString
    spark.conf.set("spark.sql.catalog.graft_lmor", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_lmor.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lmor.ops")
    spark.sql("DROP TABLE IF EXISTS graft_lmor.ops.t")
    spark.sql("""CREATE TABLE graft_lmor.ops.t
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(20).selectExpr("concat('u', id % 5) AS user_id", "id AS amount",
      "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
      .repartition(1).writeTo("graft_lmor.ops.t").append()
    val dir = s"$warehouse/ops/t"
    LogVersions.enable(dir)
    withMergeOnRead {
      spark.sql("DELETE FROM graft_lmor.ops.t WHERE user_id = 'u3'")
    }
    assert(masksOf(dir).nonEmpty)
    // the group-based UPDATE reads through the mask-aware group scan
    spark.sql("UPDATE graft_lmor.ops.t SET amount = amount + 1000 WHERE user_id = 'u1'")
    val got = spark.table("graft_lmor.ops.t")
      .select("user_id", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!got.exists(_._1 == "u3"), "masked rows must not resurrect through CoW UPDATE")
    assert(got.count(_._1 == "u1") === 4 && got.filter(_._1 == "u1").forall(_._2 >= 1000))
    assert(got.size === 16)
  }

  test("purge_masks on the log tier: masks consumed, rows exact, stats " +
      "metadata-count restored; compaction also purges") {
    val warehouse = Files.createTempDirectory("graft_lhmor_wh2").toString
    spark.conf.set("spark.sql.catalog.graft_lmor2", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_lmor2.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lmor2.ops")
    spark.sql("DROP TABLE IF EXISTS graft_lmor2.ops.t")
    spark.sql("""CREATE TABLE graft_lmor2.ops.t
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(100).selectExpr("concat('u', id % 10) AS user_id", "id AS amount",
      "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
      .repartition(2).writeTo("graft_lmor2.ops.t").append()
    val dir = s"$warehouse/ops/t"
    LogVersions.enable(dir)
    withMergeOnRead {
      spark.sql("DELETE FROM graft_lmor2.ops.t WHERE user_id = 'u4'")
    }
    assert(masksOf(dir).nonEmpty)
    val st = spark.sql(
      "CALL graft_lmor2.system.purge_masks(table => 'ops.t')").head
    assert(st.getLong(1) >= 1L && st.getLong(3) === 0L, st.toString)
    assert(masksOf(dir).isEmpty)
    assert(spark.table("graft_lmor2.ops.t").count() === 90)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_lmor2.ops.t WHERE user_id = 'u4'")
      .head.getLong(0) === 0)
    // second round: mask again, then COMPACTION purges (pre-pass)
    withMergeOnRead {
      spark.sql("DELETE FROM graft_lmor2.ops.t WHERE user_id = 'u5'")
    }
    assert(masksOf(dir).nonEmpty)
    spark.sql("CALL graft_lmor2.system.compact_log(table => 'ops.t', " +
      "compaction_id => 'lmor2c1')")
    assert(masksOf(dir).isEmpty, "compaction must purge masks, never pack them away")
    assert(spark.table("graft_lmor2.ops.t").count() === 80)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_lmor2.ops.t WHERE user_id IN ('u4','u5')")
      .head.getLong(0) === 0)
  }

  test("change feed: a masked log DELETE emits exactly the newly-masked " +
      "rows as deletes (changelog and net)") {
    val dir = freshLog()
    val table = new LimitHashLogTable(dir)
    val v1 = LogVersions.latest(dir).get._1
    withMergeOnRead {
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("user_id", "u1"))) // v2: mask on A, zz/C untouched
    }
    val v2 = LogVersions.latest(dir).get._1
    assert(v2 === v1 + 1)
    val changelog = ChangeFeed.logChanges(spark, dir, v1, v2)
    val dels = changelog
      .filter(col(ChangeFeed.CHANGE_TYPE_COL) === "delete")
      .select("user_id", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(dels === Set(("u1", 10L), ("u1", 20L)),
      s"exactly the newly-masked rows surface as deletes: $dels")
    assert(changelog.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "insert")
      .count() === 0)
    val net = ChangeFeed.logChanges(spark, dir, v1, v2, net = true)
    val netDels = net.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "delete")
      .select("user_id", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(netDels === Set(("u1", 10L), ("u1", 20L)))
  }

  /** A catalog view over an existing log dir (UPDATE SQL needs a
    * catalog table; path-based DSv2 SQL is rejected by Spark). */
  private def catalogFor(dir: String, cat: String): String = {
    val parent = new Path(dir).getParent.toString
    val name = new Path(dir).getName
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", parent)
    s"$cat.$name"
  }

  test("MoR UPDATE on the log: segments byte-identical, masks + image " +
      "segments, exact result, time travel") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmu1")
    val before = segSigs(dir)
    withMergeOnRead {
      spark.sql(s"UPDATE $ident SET amount = amount + 10000 WHERE user_id = 'u1'")
    }
    val after = segSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"merge-on-read UPDATE must not rewrite pre-existing segment $name")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(_.startsWith("segment-rlo-upd-")),
      s"updated images append as new segments: $appended")
    // zone proof: only segment A (holding u1) is masked
    val masks = masksOf(dir)
    assert(masks.size === 1, s"only the might-match segment is masked: $masks")
    assert(rows(dir) === Set(("u1", 10010L, "ha1"), ("u1", 10020L, "ha2"),
      ("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    // time travel: v1 shows the originals
    assert(rows(dir, Some(1L)).exists(_ == ("u1", 10L, "ha1")))
    assert(rows(dir, Some(1L)).size === 9)
  }

  test("MoR UPDATE: self-referential SET does not re-mask its output; " +
      "stacks on a prior masked DELETE without resurrection") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmu2")
    val table = new LimitHashLogTable(dir)
    withMergeOnRead {
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("amount", 10L))) // mask u1/10 away first
      // amounts 20..40 double — 20 doubles to 40, which is still inside
      // the predicate range, but the image segment carries no mask
      spark.sql(s"UPDATE $ident SET amount = amount * 2 " +
        "WHERE amount >= 20 AND amount <= 40")
    }
    assert(rows(dir) === Set(("u1", 40L, "ha2"), ("u2", 60L, "ha3"),
      ("u2", 80L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")),
      s"deleted row stays deleted, images survive their own predicate: ${rows(dir)}")
  }

  test("MoR UPDATE on a bucketed log: image segments carry bucket tags") {
    val warehouse = Files.createTempDirectory("graft_lhmor_wh4").toString
    spark.conf.set("spark.sql.catalog.graft_lmor4", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_lmor4.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lmor4.ops")
    spark.sql("DROP TABLE IF EXISTS graft_lmor4.ops.t")
    spark.sql("""CREATE TABLE graft_lmor4.ops.t
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    val dir = s"$warehouse/ops/t"
    spark.sql("CALL graft_lmor4.system.set_bucket_spec(" +
      "table => 'ops.t', col => 'user_id', n => 4)")
    spark.range(40).selectExpr("concat('u', id % 8) AS user_id", "id AS amount",
      "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
      .writeTo("graft_lmor4.ops.t").append()
    LogVersions.enable(dir)
    val before = LogVersions.latest(dir).get._2.toSet
    withMergeOnRead {
      spark.sql("UPDATE graft_lmor4.ops.t SET amount = -1 WHERE user_id = 'u3'")
    }
    val appended = LogVersions.latest(dir).get._2.toSet -- before
    assert(appended.nonEmpty && appended.forall(n =>
      n.startsWith("segment-rlo-upd-") && n.matches(".*-b\\d+$")),
      s"images on a bucketed log must carry bucket tags: $appended")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_lmor4.ops.t WHERE amount = -1")
      .head.getLong(0) === 5)
    assert(spark.table("graft_lmor4.ops.t").count() === 40)
  }

  test("MoR MERGE on the log: masks + appended images/inserts, segments " +
      "byte-identical, exact result, time travel") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmm1")
    import spark.implicits._
    Seq(("ha1", "d", 0L, ""), ("ha3", "u", 999L, ""),
      ("hx1", "i", 111L, "u9"))
      .toDF("k", "op", "amt", "u").createOrReplaceTempView("lmm1_src")
    val before = segSigs(dir)
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING lmm1_src s
                    ON t.sha256sum = s.k
                    WHEN MATCHED AND s.op = 'd' THEN DELETE
                    WHEN MATCHED THEN UPDATE SET amount = s.amt
                    WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                      VALUES (s.u, s.amt, NULL, s.k)""")
    }
    val after = segSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"merge-on-read MERGE must not rewrite pre-existing segment $name")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(_.startsWith("segment-rlo-mrg-")),
      s"update images + inserts append as new segments: $appended")
    // only segment A (holding ha1/ha3) is masked
    val masks = masksOf(dir)
    assert(masks.size === 1, s"only the matched segment is masked: $masks")
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 999L, "ha3"),
      ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3"),
      ("u9", 111L, "hx1")),
      s"delete/update/insert arms applied exactly: ${rows(dir)}")
    // v1 shows the pre-merge state
    assert(rows(dir, Some(1L)).size === 9)
    assert(rows(dir, Some(1L)).contains(("u1", 10L, "ha1")))
  }

  test("MoR MERGE: a same-segment key the arms hide only PARTIALLY " +
      "takes the segment-rewrite regime when DVs are disabled " +
      "(no key mask can express it; LogDvSpec pins the DV default)") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmm2")
    import spark.implicits._
    // key on user_id: u1 has TWO rows in segment A, the arm deletes
    // only the amount=10 one — a `user_id IN ('u1')` mask would also
    // hide ha2, so the command must rewrite segment A instead
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("lmm2_src")
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING lmm2_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""")
    } finally spark.conf.unset(DeletionVectors.ENABLED_KEY)
    assert(masksOf(dir).isEmpty,
      "an inexact delta must not land as a mask")
    val names = LogVersions.latest(dir).get._2.toSet
    assert(names.exists(_.startsWith("segment-rlo-mrg-")),
      s"segment A rewrites under the rlo-mrg prefix: $names")
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
  }

  test("MoR MERGE honors a prior masked DELETE: the deleted row is NOT " +
      "MATCHED and re-enters through the INSERT arm") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmm3")
    import spark.implicits._
    Seq(("ha1", 5L, "u1")).toDF("k", "amt", "u")
      .createOrReplaceTempView("lmm3_src")
    val table = new LimitHashLogTable(dir)
    withMergeOnRead {
      table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
        EqualTo("amount", 10L))) // masks ha1 away
      spark.sql(s"""MERGE INTO $ident t USING lmm3_src s
                    ON t.sha256sum = s.k
                    WHEN MATCHED THEN UPDATE SET amount = s.amt + 1000
                    WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                      VALUES (s.u, s.amt, NULL, s.k)""")
    }
    // the masked row is invisible to the MERGE: INSERT arm fires, the
    // UPDATE arm does not — amount is 5, not 1005 and not 10
    assert(rows(dir).count(_._3 == "ha1") === 1)
    assert(rows(dir).contains(("u1", 5L, "ha1")),
      s"prior mask must make the row unmatched: ${rows(dir)}")
  }

  test("MoR MERGE: maxMaskKeys overflow falls to the rewrite regime " +
      "when DVs are disabled, and stays exact") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmm4")
    import spark.implicits._
    Seq(("ha1", 1L), ("ha3", 3L), ("hc2", 2L)).toDF("k", "amt")
      .createOrReplaceTempView("lmm4_src")
    spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, "1")
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING lmm4_src s
                    ON t.sha256sum = s.k
                    WHEN MATCHED THEN UPDATE SET amount = s.amt""")
    } finally {
      spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
      spark.conf.unset(DeletionVectors.ENABLED_KEY)
    }
    assert(masksOf(dir).isEmpty, "cap overflow must not land masks")
    assert(rows(dir) === Set(("u1", 1L, "ha1"), ("u1", 20L, "ha2"),
      ("u2", 3L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 2L, "hc2"), ("u8", 900L, "hc3")))
    // only the touched segments rewrote: B (zz) survives by name
    val names = LogVersions.latest(dir).get._2.toSet
    assert(names.exists(n => segSigs(dir).contains(n) &&
      !n.startsWith("segment-rlo-mrg-")),
      s"untouched segments keep their names: $names")
  }

  test("MoR REPLACE WHERE: drop-whole + masks + payload in one publish, " +
      "segments byte-identical, time travel straddles") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_lmrw")
    val before = segSigs(dir)
    withMergeOnRead {
      // segment B is single-value zz → zone-proof DROP; A and C are
      // clean (no zz) — no masks at all, payload rides the same publish
      spark.sql(s"""INSERT INTO $ident REPLACE WHERE user_id = 'zz'
                    SELECT 'zz' AS user_id, CAST(5000 AS BIGINT) AS amount,
                           CAST(NULL AS BINARY) AS msg, 'hz9' AS sha256sum""")
    }
    assert(masksOf(dir).isEmpty,
      "a drop-whole-only replace must land no masks")
    assert(rows(dir) === Set(("u1", 10L, "ha1"), ("u1", 20L, "ha2"),
      ("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3"),
      ("zz", 5000L, "hz9")))
    withMergeOnRead {
      // segment C (700..900) partially matches → MASKED; the first
      // replace's payload (5000) zone-drops whole; A (10..40) is clean
      spark.sql(s"""INSERT INTO $ident REPLACE WHERE amount >= 800
                    SELECT 'u8' AS user_id, CAST(42 AS BIGINT) AS amount,
                           CAST(NULL AS BINARY) AS msg, 'hn1' AS sha256sum""")
    }
    val after = segSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"merge-on-read REPLACE WHERE must not rewrite pre-existing segment $name")
    }
    assert(masksOf(dir).size === 1,
      s"exactly the might-match segment is masked: ${masksOf(dir)}")
    assert(rows(dir) === Set(("u1", 10L, "ha1"), ("u1", 20L, "ha2"),
      ("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("u7", 700L, "hc1"), ("u8", 42L, "hn1")),
      s"masked 800/900, dropped 5000, payload in: ${rows(dir)}")
    // straddle: v1 originals, the mid version holds the zz replacement
    assert(rows(dir, Some(1L)).size === 9)
    assert(rows(dir, Some(2L)).contains(("zz", 5000L, "hz9")))
    // a REPLACE WHERE that matches nothing with an empty payload is a
    // genuine no-op — zero version churn
    val vBefore = LogVersions.latest(dir).get._1
    withMergeOnRead {
      spark.sql(s"""INSERT INTO $ident REPLACE WHERE user_id = 'nosuch'
                    SELECT user_id, amount, msg, sha256sum
                    FROM $ident WHERE false""")
    }
    assert(LogVersions.latest(dir).get._1 === vBefore,
      "no-op replace must not publish a version")
  }

  test("REPLACE WHERE (CoW with payload) on a masked log: no resurrection") {
    val warehouse = Files.createTempDirectory("graft_lhmor_wh3").toString
    spark.conf.set("spark.sql.catalog.graft_lmor3", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_lmor3.warehouse", warehouse)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_lmor3.ops")
    spark.sql("DROP TABLE IF EXISTS graft_lmor3.ops.t")
    spark.sql("""CREATE TABLE graft_lmor3.ops.t
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(20).selectExpr("concat('u', id % 5) AS user_id", "id AS amount",
      "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
      .repartition(1).writeTo("graft_lmor3.ops.t").append()
    val dir = s"$warehouse/ops/t"
    LogVersions.enable(dir)
    withMergeOnRead {
      spark.sql("DELETE FROM graft_lmor3.ops.t WHERE user_id = 'u3'") // mask
    }
    assert(masksOf(dir).nonEmpty)
    // REPLACE WHERE rewrites the matching range; the segment rewrite
    // must drop the masked u3 rows too, never resurrect them
    spark.sql("""INSERT INTO graft_lmor3.ops.t
                 REPLACE WHERE user_id = 'u1'
                 SELECT 'u1' AS user_id, CAST(9999 AS BIGINT) AS amount,
                        CAST(NULL AS BINARY) AS msg, 'hrw' AS sha256sum""")
    val got = spark.table("graft_lmor3.ops.t")
      .select("user_id", "amount").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(!got.exists(_._1 == "u3"),
      s"masked u3 rows must stay deleted through REPLACE WHERE: $got")
    assert(got.filter(_._1 == "u1") === Set(("u1", 9999L)))
    assert(got.size === 13, s"4 u3 + 4 u1 originals out, 1 payload in: $got")
  }
}
