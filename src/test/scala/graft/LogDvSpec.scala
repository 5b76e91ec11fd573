package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.EqualTo
import org.scalatest.funsuite.AnyFunSuite

/** Positional deletion vectors on the LOG tier (VERDICT r15 #4 — the
  * parquet DV ladder's log twin, line ordinals as the position
  * domain): a MoR MERGE delta key masks cannot carry (cap overflow,
  * mixed same-key visibility) publishes per-segment line-position
  * bitmaps instead of rewriting segments; every reader (row, columnar,
  * time travel, CDC, rewrites, purge) honors them; vacuum reclaims
  * unreferenced sidecars. */
class LogDvSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  /** Same shape as LogMoRSpec.freshLog: A = u1/u2 amounts 10..40,
    * B = all-zz, C = u7/u8 700..900. */
  private def freshLog(): String = {
    val dir = Files.createTempDirectory("graft_lhdv").toString
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

  private def rows(dir: String, version: Option[Long] = None,
      columnar: Boolean = true): Set[(String, Long, String)] = {
    val rd = spark.read.format(LimitHashLog.FORMAT)
      .option("columnar", columnar.toString)
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

  private def catalogFor(dir: String, cat: String): String = {
    val parent = new Path(dir).getParent.toString
    val name = new Path(dir).getName
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", parent)
    s"$cat.$name"
  }

  private def dvSidecars(dir: String): Seq[String] = {
    val dvDir = new Path(dir, DeletionVectors.DIR)
    if (!fs(dir).exists(dvDir)) Seq.empty
    else fs(dir).listStatus(dvDir).filter(_.isFile).map(_.getPath.getName).toSeq
  }

  test("_lpos metadata column: 0-based line ordinal within the segment") {
    val dir = freshLog()
    val got = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .select(col("sha256sum"), col(LimitHashLog.SEGMENT_COL),
        col(LimitHashLog.LPOS_COL))
      .collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    // per-segment ordinals restart at 0 and follow write order
    assert(got("ha1") === 0L && got("ha2") === 1L &&
      got("ha3") === 2L && got("ha4") === 3L, s"segment A ordinals: $got")
    assert(got("hb1") === 0L && got("hb2") === 1L)
    assert(got("hc1") === 0L && got("hc2") === 1L && got("hc3") === 2L)
    // the row reader serves the same ordinals
    val rowBased = spark.read.format(LimitHashLog.FORMAT)
      .option("columnar", "false").load(dir)
      .select(col("sha256sum"), col(LimitHashLog.LPOS_COL))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rowBased === got)
  }

  test("cap overflow publishes DVs: segments byte-identical, all masks " +
      "are DV entries, sidecars exist, exact rows both readers, time travel") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv1")
    import spark.implicits._
    Seq(("ha1", 1L), ("ha3", 3L), ("hc2", 2L)).toDF("k", "amt")
      .createOrReplaceTempView("ldv1_src")
    val before = segSigs(dir)
    spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, "1")
    try withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv1_src s
                    ON t.sha256sum = s.k
                    WHEN MATCHED THEN UPDATE SET amount = s.amt""")
    } finally spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
    val after = segSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"DV regime must not rewrite pre-existing segment $name")
    }
    val masks = masksOf(dir)
    assert(masks.nonEmpty &&
      masks.valuesIterator.flatten.forall(DeletionVectors.isDv),
      s"past the cap every mask entry is a DV: $masks")
    assert(dvSidecars(dir).nonEmpty, "sidecars under <dir>/_dv")
    val want = Set(("u1", 1L, "ha1"), ("u1", 20L, "ha2"),
      ("u2", 3L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 2L, "hc2"), ("u8", 900L, "hc3"))
    assert(rows(dir) === want, "columnar reader")
    assert(rows(dir, columnar = false) === want, "row reader")
    // v1 pin serves the pre-merge state (no DV applies)
    assert(rows(dir, Some(1L)).contains(("u1", 10L, "ha1")))
    assert(rows(dir, Some(1L)).size === 9)
  }

  test("mixed same-key visibility publishes a positional DV — the exact " +
      "row hides, its same-key sibling stays, no rewrite") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv2")
    import spark.implicits._
    // u1 has TWO rows in segment A; the arm deletes only amount=10 —
    // inexpressible as a key mask, exactly expressible as position 0
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("ldv2_src")
    val before = segSigs(dir)
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv2_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""")
    }
    val after = segSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"DV regime must not rewrite pre-existing segment $name")
    }
    val masks = masksOf(dir)
    assert(masks.size === 1 && masks.head._2.forall(DeletionVectors.isDv),
      s"one DV on segment A: $masks")
    val ref = DeletionVectors.parse(masks.head._2.head).get
    assert(ref.card === 1L, s"exactly one hidden position: $ref")
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
  }

  test("change feed over a DV commit: batch net + span blocks emit " +
      "exactly the hidden rows as deletes") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv3")
    import spark.implicits._
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("ldv3_src")
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv3_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""") // v2
    }
    val v = LogVersions.latest(dir).get._1
    val net = ChangeFeed.logChanges(spark, dir, 1L, v, net = true)
      .select(col("sha256sum"), col(ChangeFeed.CHANGE_TYPE_COL))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(net === Set(("ha1", "delete")), s"net feed: $net")
    // the non-net span path (streaming reader's partitions) agrees
    val span = ChangeFeed.logChanges(spark, dir, 1L, v)
      .select(col("sha256sum"), col(ChangeFeed.CHANGE_TYPE_COL))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(span === Set(("ha1", "delete")), s"span feed: $span")
  }

  test("DV stacks with a later predicate mask (OR at read); purge " +
      "consumes both; vacuum reclaims the unreferenced sidecar") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv4")
    import spark.implicits._
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("ldv4_src")
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv4_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""") // DV on A
      // a later lightweight DELETE stacks a PREDICATE mask on A
      new LimitHashLogTable(dir).deleteWhere(
        Array[org.apache.spark.sql.sources.Filter](EqualTo("amount", 40L)))
    }
    val masksA = masksOf(dir).values.flatten.toSeq
    assert(masksA.exists(DeletionVectors.isDv) &&
      masksA.exists(!DeletionVectors.isDv(_)),
      s"stacked DV + predicate on segment A: ${masksOf(dir)}")
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    val sidecarsBefore = dvSidecars(dir)
    assert(sidecarsBefore.nonEmpty)
    // purge rewrites the masked segment mask-free — DV positions AND
    // the predicate both consumed, never resurrected
    LogDelete.purgeMasksInner(spark, dir, minPreds = 1)
    assert(masksOf(dir).isEmpty, "purge consumed the stack")
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")),
      "purge preserved exactly the visible rows")
    // age the sidecars past the in-flight grace, retain only the
    // latest (DV-free) version → reclaimed
    val old = System.currentTimeMillis() - 2 * ParquetVersions.InFlightGraceMs
    sidecarsBefore.foreach { n =>
      fs(dir).setTimes(DeletionVectors.sidecarPath(dir, n), old, old)
    }
    LogVersions.vacuum(dir, retainLast = 10)
    assert(dvSidecars(dir) === sidecarsBefore,
      "sidecars referenced by a retained version survive vacuum")
    LogVersions.vacuum(dir, retainLast = 1)
    assert(dvSidecars(dir).isEmpty,
      "unreferenced sidecars reclaimed once their versions drop")
  }

  test("streaming tail applies current masks: a fresh stream's snapshot " +
      "excludes DV-deleted AND predicate-deleted rows") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv6")
    import spark.implicits._
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("ldv6_src")
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv6_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""") // DV hides ha1
      new LimitHashLogTable(dir).deleteWhere(
        Array[org.apache.spark.sql.sources.Filter](
          org.apache.spark.sql.sources.EqualTo("amount", 40L))) // predicate hides ha4
    }
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ldv_ck").toString
    val q = spark.readStream.format(LimitHashLog.FORMAT).load(dir)
      .writeStream.format("memory").queryName("ldv_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT sha256sum FROM ldv_tail").collect()
        .map(_.getString(0)).toSet
      assert(got === Set("ha2", "ha3", "hb1", "hb2", "hc1", "hc2", "hc3"),
        s"tail snapshot must exclude masked rows: $got")
    } finally q.stop()
  }

  test("rewrite-DELETE on a DV-masked segment drops the DV positions " +
      "too (no resurrection through the CoW path)") {
    val dir = freshLog()
    val ident = catalogFor(dir, "graft_ldv5")
    import spark.implicits._
    Seq(("u1", 0L)).toDF("k", "amt").createOrReplaceTempView("ldv5_src")
    withMergeOnRead {
      spark.sql(s"""MERGE INTO $ident t USING ldv5_src s
                    ON t.user_id = s.k
                    WHEN MATCHED AND t.amount = 10 THEN DELETE""") // DV hides ha1
    }
    // copy-on-write DELETE of amount=30 rewrites segment A (zone can't
    // exclude) — the rewrite must consume the DV, not resurrect ha1
    new LimitHashLogTable(dir).deleteWhere(
      Array[org.apache.spark.sql.sources.Filter](EqualTo("amount", 30L)))
    assert(rows(dir) === Set(("u1", 20L, "ha2"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")),
      s"ha1 must stay deleted after the rewrite: ${rows(dir)}")
  }
}
