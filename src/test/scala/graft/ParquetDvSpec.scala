package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** POSITIONAL DELETION VECTORS, write side ([[DeletionVectors]] +
  * [[MergeOnReadMergeCommand.buildDvMasks]]): deltas a key mask cannot
  * carry — cap overflow, mixed same-key visibility — stay LIGHTWEIGHT
  * as per-file position bitmaps instead of falling to the candidate
  * rewrite. Pre-existing files stay byte-identical; DV entries ride
  * the ledger masks, so stacking, time travel, change feeds, purge and
  * vacuum compose through the existing mask lifecycle. */
class ParquetDvSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_dv_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_pdv", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_pdv.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_pdv.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def fileSigs(dir: String): Map[String, (Long, Int)] = {
    val out = Map.newBuilder[String, (Long, Int)]
    ParquetVersions.latest(dir).get._2.foreach { rel =>
      val p = new Path(s"$dir/data", rel)
      val st = fs.getFileStatus(p)
      val in = fs.open(p)
      val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
        finally in.close()
      out += rel -> ((st.getLen, java.util.Arrays.hashCode(head)))
    }
    out.result()
  }

  private def sidecarNames(dir: String): Seq[String] = {
    val d = new Path(dir, DeletionVectors.DIR)
    if (!fs.exists(d)) Seq.empty
    else fs.listStatus(d).toSeq.filter(_.isFile).map(_.getPath.getName).sorted
  }

  private def withMoR[A](maskCap: Int)(f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, maskCap.toString)
    try f finally {
      spark.conf.unset(DeleteMasks.MODE_KEY)
      spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
    }
  }

  test("mask-cap overflow stays lightweight: DV masks, pre-existing " +
      "files byte-identical, exact result, time travel intact") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d1")
    spark.sql("CREATE TABLE graft_pdv.lake.d1 (k BIGINT, v BIGINT)")
    (0 until 2).foreach { i =>
      spark.range(i * 100, i * 100 + 100).selectExpr("id AS k", "id AS v")
        .coalesce(1).writeTo("graft_pdv.lake.d1").append()
    }
    val dir = s"$warehouse/lake/d1"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d1')")
    val before = fileSigs(dir)
    val vBefore = ParquetVersions.latest(dir).get._1
    spark.range(0, 50).selectExpr("id AS k", "id + 7 AS nv")
      .createOrReplaceTempView("d1_src")
    withMoR(maskCap = 5) {
      spark.sql("""MERGE INTO graft_pdv.lake.d1 t USING d1_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.nv""")
    }
    assert(ParquetVersions.latest(dir).get._1 === vBefore + 1,
      "one MERGE = one atomic version publish")
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"DV regime must not rewrite pre-existing file $name")
    }
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty, "the delta landed as masks, not a rewrite")
    assert(masks.valuesIterator.flatten.forall(DeletionVectors.isDv),
      "past the key cap the masks are positional DV entries")
    assert(sidecarNames(dir).nonEmpty, "sidecars exist under _dv/")
    // cardinality metadata matches the hidden-row count
    val cards = masks.valuesIterator.flatten
      .flatMap(DeletionVectors.parse).map(_.card).sum
    assert(cards === 50L, s"DV cardinalities sum to the matched rows, got $cards")
    assert(spark.table("graft_pdv.lake.d1").count() === 200)
    assert(spark.sql("SELECT sum(v) AS s FROM graft_pdv.lake.d1")
      .head.getLong(0) === (0L until 50L).map(_ + 7).sum + (50L until 200L).sum)
    // time travel: the pinned pre-merge version ignores the DV
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM graft_pdv.lake.d1 VERSION AS OF $vBefore")
      .head.getLong(0) === (0L until 200L).sum)
  }

  test("mixed same-key visibility is positionally exact under the DV regime") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d2")
    spark.sql("CREATE TABLE graft_pdv.lake.d2 (k BIGINT, v BIGINT)")
    // two rows per key IN THE SAME FILE — a key mask cannot hide only
    // one of them; a position bitmap can
    spark.range(20).selectExpr("id % 10 AS k", "id % 10 + (id DIV 10) * 1000 AS v")
      .coalesce(1).writeTo("graft_pdv.lake.d2").append()
    val dir = s"$warehouse/lake/d2"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d2')")
    val before = fileSigs(dir)
    spark.range(3, 6).selectExpr("id AS k").createOrReplaceTempView("d2_src")
    withMoR(maskCap = 10000) {
      spark.sql("""MERGE INTO graft_pdv.lake.d2 t USING d2_src s ON t.k = s.k
                   WHEN MATCHED AND t.v < 1000 THEN DELETE""")
    }
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty && masks.valuesIterator.flatten.forall(DeletionVectors.isDv),
      "mixed visibility takes the DV regime, not the rewrite")
    fileSigs(dir).foreach { case (name, sig) =>
      if (before.contains(name))
        assert(before(name) === sig, s"file $name must stay byte-identical")
    }
    assert(spark.table("graft_pdv.lake.d2").count() === 17)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_pdv.lake.d2 WHERE k IN (3,4,5) AND v < 1000")
      .head.getLong(0) === 0, "low rows of matched keys deleted")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_pdv.lake.d2 WHERE k IN (3,4,5)")
      .head.getLong(0) === 3, "high rows of the same keys survive")
  }

  test("stacked DVs OR across commits; purge consumes them; vacuum " +
      "reclaims orphaned sidecars and keeps referenced ones") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d3")
    spark.sql("CREATE TABLE graft_pdv.lake.d3 AS " +
      "SELECT id AS k, id AS v FROM range(100)")
    val dir = s"$warehouse/lake/d3"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d3')")
    def mergeDelete(lo: Int, hi: Int): Unit = {
      spark.range(lo, hi).selectExpr("id AS k")
        .createOrReplaceTempView("d3_src")
      withMoR(maskCap = 3) {
        spark.sql("""MERGE INTO graft_pdv.lake.d3 t USING d3_src s ON t.k = s.k
                     WHEN MATCHED THEN DELETE""")
      }
    }
    mergeDelete(0, 10)
    mergeDelete(10, 20)
    val masks = ParquetVersions.masksFor(dir, None)
    val stacked = masks.valuesIterator.flatten.toSeq
    assert(stacked.nonEmpty && stacked.forall(DeletionVectors.isDv))
    assert(masks.exists(_._2.size === 2),
      "the second commit STACKS a DV on the already-masked file")
    assert(spark.table("graft_pdv.lake.d3").count() === 80,
      "stacked DVs OR: both deleted ranges hidden")
    val referenced = sidecarNames(dir)
    assert(referenced.size >= 2)

    // purge: the mask-consuming rewrite drops the DV entries
    spark.sql("CALL graft_pdv.system.purge_masks(table => 'lake.d3')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    assert(spark.table("graft_pdv.lake.d3").count() === 80)

    // vacuum with the DV-bearing version still retained → sidecars stay
    // (age them past the in-flight grace first so retention, not the
    // grace window, is what protects them)
    val dvDir = new Path(dir, DeletionVectors.DIR)
    val old = System.currentTimeMillis() - 2 * ParquetVersions.InFlightGraceMs
    sidecarNames(dir).foreach { n =>
      fs.setTimes(new Path(dvDir, n), old, old)
    }
    ParquetVersions.vacuum(dir, retainLast = 10)
    assert(sidecarNames(dir) === referenced,
      "sidecars referenced by a retained version survive vacuum")

    // drop the DV-bearing versions from retention → orphaned sidecars reclaimed
    ParquetVersions.vacuum(dir, retainLast = 1)
    assert(sidecarNames(dir).isEmpty,
      "orphaned sidecars are reclaimed once no retained version references them")
    assert(spark.table("graft_pdv.lake.d3").count() === 80)
  }

  test("dv.maxBytes budget: over budget falls to the rewrite regime " +
      "with zero sidecar debris") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d4")
    spark.sql("CREATE TABLE graft_pdv.lake.d4 AS " +
      "SELECT id AS k, id AS v FROM range(100)")
    val dir = s"$warehouse/lake/d4"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d4')")
    spark.range(0, 50).selectExpr("id AS k", "id + 7 AS nv")
      .createOrReplaceTempView("d4_src")
    spark.conf.set(DeletionVectors.MAX_BYTES_KEY, "4")
    try withMoR(maskCap = 5) {
      spark.sql("""MERGE INTO graft_pdv.lake.d4 t USING d4_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.nv""")
    } finally spark.conf.unset(DeletionVectors.MAX_BYTES_KEY)
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "over the byte budget the rewrite regime carries no masks")
    assert(sidecarNames(dir).isEmpty,
      "the budget check runs BEFORE any sidecar writes — no debris")
    assert(spark.sql("SELECT sum(v) AS s FROM graft_pdv.lake.d4")
      .head.getLong(0) === (0L until 50L).map(_ + 7).sum + (50L until 100L).sum)
  }

  test("change feed: DV commits emit their deltas as deletes") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d5")
    spark.sql("CREATE TABLE graft_pdv.lake.d5 AS " +
      "SELECT id AS k, id AS v FROM range(50)")
    val dir = s"$warehouse/lake/d5"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d5')")
    val vFrom = ParquetVersions.latest(dir).get._1
    spark.range(5, 25).selectExpr("id AS k").createOrReplaceTempView("d5_src")
    withMoR(maskCap = 3) {
      spark.sql("""MERGE INTO graft_pdv.lake.d5 t USING d5_src s ON t.k = s.k
                   WHEN MATCHED THEN DELETE""")
    }
    assert(ParquetVersions.masksFor(dir, None)
      .valuesIterator.flatten.forall(DeletionVectors.isDv))
    val vTo = ParquetVersions.latest(dir).get._1
    val net = ChangeFeed.parquetChanges(spark, dir, vFrom, vTo, net = true)
      .select("k", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(net === (5L until 25L).map((_, "delete")).toSet,
      "the DV delta streams as row-level deletes")
  }

  test("streaming tail snapshot hides DV-deleted rows (projecting DV reader)") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d7")
    spark.sql("CREATE TABLE graft_pdv.lake.d7 AS " +
      "SELECT id AS k, id AS v FROM range(60)")
    val dir = s"$warehouse/lake/d7"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d7')")
    spark.range(10, 30).selectExpr("id AS k").createOrReplaceTempView("d7_src")
    withMoR(maskCap = 3) {
      spark.sql("""MERGE INTO graft_pdv.lake.d7 t USING d7_src s ON t.k = s.k
                   WHEN MATCHED THEN DELETE""")
    }
    assert(ParquetVersions.masksFor(dir, None)
      .valuesIterator.flatten.forall(DeletionVectors.isDv))
    // a FRESH stream's first batch is the snapshot of the DV-bearing
    // version — the masked rows must not leak into the sink
    val ckpt = Files.createTempDirectory("graft_pdv_ck").toString
    val q = spark.readStream.table("graft_pdv.lake.d7")
      .writeStream.format("memory").queryName("dv_tail")
      .option("checkpointLocation", ckpt).start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT k FROM dv_tail").collect().map(_.getLong(0)).toSet
      assert(got === ((0L until 10L) ++ (30L until 60L)).toSet,
        "DV-hidden rows must not stream")
    } finally q.stop()
  }

  test("_file scans and copy-on-write rewrites honor DV masks") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d8")
    spark.sql("CREATE TABLE graft_pdv.lake.d8 AS " +
      "SELECT id AS k, id AS v FROM range(40)")
    val dir = s"$warehouse/lake/d8"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d8')")
    spark.range(5, 15).selectExpr("id AS k").createOrReplaceTempView("d8_src")
    withMoR(maskCap = 3) {
      spark.sql("""MERGE INTO graft_pdv.lake.d8 t USING d8_src s ON t.k = s.k
                   WHEN MATCHED THEN DELETE""")
    }
    assert(ParquetVersions.masksFor(dir, None)
      .valuesIterator.flatten.forall(DeletionVectors.isDv))
    // `_file` scan (FileTaggedReaderFactory DV branch): masked rows
    // invisible on the provenance surface too
    val viaFile = spark.table("graft_pdv.lake.d8")
      .select(org.apache.spark.sql.functions.col("k"),
        org.apache.spark.sql.functions.col("_file"))
      .collect()
    assert(viaFile.map(_.getLong(0)).toSet ===
      ((0L until 5L) ++ (15L until 40L)).toSet,
      "_file scans must not resurrect DV-hidden rows")
    assert(viaFile.forall(r => r.getString(1).nonEmpty))
    // copy-on-write UPDATE (ParquetGroupReaderFactory DV branch): the
    // rewrite reads visible rows only — DV-hidden rows must neither
    // update nor resurrect into the replacement files
    spark.sql("UPDATE graft_pdv.lake.d8 SET v = v + 1000 WHERE k < 20")
    val got = spark.table("graft_pdv.lake.d8").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected: Set[(Long, Long)] =
      (0L until 5L).map(k => (k, k + 1000)).toSet ++
        (15L until 20L).map(k => (k, k + 1000)).toSet ++
        (20L until 40L).map(k => (k, k)).toSet
    assert(got === expected, s"extra=${got -- expected} missing=${expected -- got}")
    // the rewrite consumed the masks it touched
    assert(spark.table("graft_pdv.lake.d8").count() === 30)
  }

  test("dv.enabled=false restores the pre-DV ladder (rewrite regime)") {
    spark.sql("DROP TABLE IF EXISTS graft_pdv.lake.d6")
    spark.sql("CREATE TABLE graft_pdv.lake.d6 AS " +
      "SELECT id AS k, id AS v FROM range(40)")
    val dir = s"$warehouse/lake/d6"
    spark.sql("CALL graft_pdv.system.enable_versioning(table => 'lake.d6')")
    spark.range(0, 20).selectExpr("id AS k").createOrReplaceTempView("d6_src")
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try withMoR(maskCap = 3) {
      spark.sql("""MERGE INTO graft_pdv.lake.d6 t USING d6_src s ON t.k = s.k
                   WHEN MATCHED THEN DELETE""")
    } finally spark.conf.unset(DeletionVectors.ENABLED_KEY)
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    assert(sidecarNames(dir).isEmpty)
    assert(spark.table("graft_pdv.lake.d6").count() === 20)
  }
}
