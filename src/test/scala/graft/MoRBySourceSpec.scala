package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** MERGE … WHEN NOT MATCHED BY SOURCE under merge-on-read (VERDICT
  * r13 #3 / r15): BY-SOURCE DELETE/UPDATE arms decompose into the same
  * mask / DV / rewrite ladder as matched arms — evaluated over the
  * source-unmatched anti-join complement, with the source-key
  * prefilter disabled (it would prune exactly their candidates).
  * Pre-existing files stay byte-identical in the mask and DV
  * regimes. */
class MoRBySourceSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_bysrc_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_bs", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_bs.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_bs.lake")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_bs.ops")
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

  private def withMoR[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  /** All five arm shapes in one statement; hand-computed expectation:
    *   k 0..9   unmatched, k<10          → BY-SOURCE DELETE
    *   k 10..29 unmatched                → carry (v = k)
    *   k 30..59 matched: nv = k+1000     → DELETE if even k, else v = k+1000
    *   k 60..89 unmatched                → carry
    *   k 90..99 unmatched, k>=90         → BY-SOURCE UPDATE v = -1
    *   src 200..204 unmatched-by-target  → INSERT (k, 0) */
  private def runFullMerge(ident: String): Unit = {
    spark.range(30, 60).selectExpr("id AS k", "id + 1000 AS nv")
      .union(spark.range(200, 205).selectExpr("id AS k", "CAST(0 AS BIGINT) AS nv"))
      .createOrReplaceTempView("bs_src")
    withMoR {
      spark.sql(s"""MERGE INTO $ident t USING bs_src s ON t.k = s.k
                    WHEN MATCHED AND s.nv % 2 = 0 THEN DELETE
                    WHEN MATCHED THEN UPDATE SET v = s.nv
                    WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, 0)
                    WHEN NOT MATCHED BY SOURCE AND t.k < 10 THEN DELETE
                    WHEN NOT MATCHED BY SOURCE AND t.k >= 90
                      THEN UPDATE SET v = -1""")
    }
  }

  private def checkFullMerge(ident: String): Unit = {
    val got = spark.table(ident).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected: Set[(Long, Long)] =
      (10L until 30L).map(k => (k, k)).toSet ++
        (30L until 60L).filter(_ % 2 == 1).map(k => (k, k + 1000)).toSet ++
        (60L until 90L).map(k => (k, k)).toSet ++
        (90L until 100L).map(k => (k, -1L)).toSet ++
        (200L until 205L).map(k => (k, 0L)).toSet
    assert(got === expected, s"diff: extra=${got -- expected} missing=${expected -- got}")
  }

  test("parquet: all three arm families in the MASK regime — files " +
      "byte-identical, exact result") {
    spark.sql("DROP TABLE IF EXISTS graft_bs.lake.t1")
    spark.sql("CREATE TABLE graft_bs.lake.t1 (k BIGINT, v BIGINT)")
    (0 until 2).foreach { i =>
      spark.range(i * 50, i * 50 + 50).selectExpr("id AS k", "id AS v")
        .coalesce(1).writeTo("graft_bs.lake.t1").append()
    }
    val dir = s"$warehouse/lake/t1"
    spark.sql("CALL graft_bs.system.enable_versioning(table => 'lake.t1')")
    val before = fileSigs(dir)
    val vBefore = ParquetVersions.latest(dir).get._1
    runFullMerge("graft_bs.lake.t1")
    assert(ParquetVersions.latest(dir).get._1 === vBefore + 1,
      "one MERGE = one atomic publish, by-source arms included")
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"mask-regime by-source MERGE must not rewrite $name")
    }
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty &&
      masks.valuesIterator.flatten.forall(m => !DeletionVectors.isDv(m)),
      s"small exact delta lands as KEY masks: $masks")
    checkFullMerge("graft_bs.lake.t1")
    // time travel ignores all of it
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_bs.lake.t1 VERSION AS OF $vBefore")
      .head.getLong(0) === 100)
  }

  test("parquet: by-source past the mask cap takes the DV regime, " +
      "still byte-identical") {
    spark.sql("DROP TABLE IF EXISTS graft_bs.lake.t2")
    spark.sql("CREATE TABLE graft_bs.lake.t2 AS " +
      "SELECT id AS k, id AS v FROM range(100)")
    val dir = s"$warehouse/lake/t2"
    spark.sql("CALL graft_bs.system.enable_versioning(table => 'lake.t2')")
    val before = fileSigs(dir)
    spark.range(90, 95).selectExpr("id AS k").createOrReplaceTempView("bs2_src")
    spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, "3")
    try withMoR {
      // 5 matched deletes + 50 by-source deletes >> cap 3
      spark.sql("""MERGE INTO graft_bs.lake.t2 t USING bs2_src s ON t.k = s.k
                   WHEN MATCHED THEN DELETE
                   WHEN NOT MATCHED BY SOURCE AND t.k < 50 THEN DELETE""")
    } finally spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty &&
      masks.valuesIterator.flatten.forall(DeletionVectors.isDv),
      s"past the cap the by-source delta lands as DVs: $masks")
    fileSigs(dir).foreach { case (name, sig) =>
      if (before.contains(name)) assert(before(name) === sig)
    }
    val got = spark.table("graft_bs.lake.t2").collect()
      .map(_.getLong(0)).toSet
    assert(got === (50L until 90L).toSet ++ Set(95L, 96L, 97L, 98L, 99L))
  }

  test("parquet: by-source over a mixed-visibility delta falls to the " +
      "rewrite regime and stays exact (DV disabled)") {
    spark.sql("DROP TABLE IF EXISTS graft_bs.lake.t3")
    spark.sql("CREATE TABLE graft_bs.lake.t3 (k BIGINT, v BIGINT)")
    // duplicate keys in one file: only the low-v row of unmatched keys
    // is deleted — not key-mask-expressible
    spark.range(20).selectExpr("id % 10 AS k", "id % 10 + (id DIV 10) * 1000 AS v")
      .coalesce(1).writeTo("graft_bs.lake.t3").append()
    val dir = s"$warehouse/lake/t3"
    spark.sql("CALL graft_bs.system.enable_versioning(table => 'lake.t3')")
    spark.range(0, 3).selectExpr("id AS k").createOrReplaceTempView("bs3_src")
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try withMoR {
      spark.sql("""MERGE INTO graft_bs.lake.t3 t USING bs3_src s ON t.k = s.k
                   WHEN MATCHED AND t.v < 1000 THEN UPDATE SET v = t.v + 77
                   WHEN NOT MATCHED BY SOURCE AND t.v < 1000 THEN DELETE""")
    } finally spark.conf.unset(DeletionVectors.ENABLED_KEY)
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "inexact delta with DV off = rewrite regime, no masks")
    val got = spark.table("graft_bs.lake.t3").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected: Set[(Long, Long)] =
      (0L until 3L).map(k => (k, k + 77)).toSet ++          // matched low rows updated
        (0L until 10L).map(k => (k, k + 1000)).toSet        // all high rows carry
    assert(got === expected, s"diff: extra=${got -- expected} missing=${expected -- got}")
  }

  test("log tier: all three arm families — segments byte-identical, " +
      "mask regime, exact result") {
    spark.sql("DROP TABLE IF EXISTS graft_bs.ops.t4")
    spark.sql("""CREATE TABLE graft_bs.ops.t4
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(100).selectExpr(
        "concat('u', id % 7) AS user_id", "id AS amount",
        "CAST(NULL AS BINARY) AS msg", "concat('h', id) AS sha256sum")
      .repartition(2)
      .writeTo("graft_bs.ops.t4").append()
    val dir = s"$warehouse/ops/t4"
    LogVersions.enable(dir)
    val segsBefore = LogVersions.latest(dir).get._2.toSet
    spark.range(30, 60).selectExpr("concat('h', id) AS k", "id + 1000 AS nv")
      .union(spark.range(200, 205).selectExpr(
        "concat('h', id) AS k", "CAST(0 AS BIGINT) AS nv"))
      .createOrReplaceTempView("bs4_src")
    withMoR {
      spark.sql("""MERGE INTO graft_bs.ops.t4 t USING bs4_src s
                   ON t.sha256sum = s.k
                   WHEN MATCHED AND s.nv % 2 = 0 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET amount = s.nv
                   WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                     VALUES ('nu', 0, NULL, s.k)
                   WHEN NOT MATCHED BY SOURCE AND t.amount < 10 THEN DELETE
                   WHEN NOT MATCHED BY SOURCE AND t.amount >= 90
                     THEN UPDATE SET amount = -1""")
    }
    // pre-existing segments byte-identical
    val segsNow = LogVersions.latest(dir).get._2.toSet
    assert(segsBefore.subsetOf(segsNow), "mask regime retires no segments")
    assert(LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2.nonEmpty)
    val got = spark.table("graft_bs.ops.t4")
      .selectExpr("amount", "sha256sum").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val expected: Set[(Long, String)] =
      (10L until 30L).map(a => (a, s"h$a")).toSet ++
        (30L until 60L).filter(_ % 2 == 1).map(a => (a + 1000, s"h$a")).toSet ++
        (60L until 90L).map(a => (a, s"h$a")).toSet ++
        (90L until 100L).map(a => (-1L, s"h$a")).toSet ++
        (200L until 205L).map(a => (0L, s"h$a")).toSet
    assert(got === expected, s"diff: extra=${got -- expected} missing=${expected -- got}")
  }
}
