package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ `MERGE INTO` — [[ParquetMoRMerge]]: matched
  * UPDATE/DELETE arms land as per-file key masks, updated images and
  * NOT MATCHED inserts append as routed new files, all in ONE version
  * publish. Pre-existing data files stay byte-identical; deltas the
  * mask codec cannot express exactly (mixed keys, cap overflow) take
  * the candidate group-rewrite regime; everything else falls back to
  * copy-on-write silently. */
class ParquetMoRMergeSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_mormg_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_mm", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_mm.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mm.lake")
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

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  test("mask regime: CDC upsert MERGE — files byte-identical, masks + " +
      "routed appends, one version, exact result") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m1")
    spark.sql("CREATE TABLE graft_mm.lake.m1 (k BIGINT, v BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .selectExpr("id AS k", "id * 10 AS v")
        .coalesce(1).writeTo("graft_mm.lake.m1").append()
    }
    val dir = s"$warehouse/lake/m1"
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m1')")
    val before = fileSigs(dir)
    val vBefore = ParquetVersions.latest(dir).get._1
    spark.range(150, 155).selectExpr("id AS k", "id * 1000 AS v")
      .union(spark.range(500, 505).selectExpr("id AS k", "id AS v"))
      .createOrReplaceTempView("m1_src")
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.m1 t USING m1_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.v
                   WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(ParquetVersions.latest(dir).get._1 === vBefore + 1,
      "one MERGE = one atomic version publish")
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"merge-on-read MERGE must not rewrite pre-existing file $name")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(_.startsWith("rlo-mrg-")),
      s"images and inserts append under the maintenance prefix: $appended")
    // footer bounds exclude the other files: only the 100..199 file masked
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.keySet.size === 1, s"only the candidate file is masked: $masks")
    // exact result
    assert(spark.table("graft_mm.lake.m1").count() === 305)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft_mm.lake.m1 WHERE k BETWEEN 150 AND 154")
      .head.getLong(0) === (150L to 154L).map(_ * 1000).sum)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m1 WHERE k >= 500")
      .head.getLong(0) === 5)
    assert(spark.sql("SELECT sum(v) AS s FROM graft_mm.lake.m1")
      .head.getLong(0) ===
        (0L until 300L).filterNot(k => k >= 150 && k <= 154).map(_ * 10).sum +
          (150L to 154L).map(_ * 1000).sum + (500L until 505L).sum)
  }

  test("time travel straddles the MERGE") {
    val dir = s"$warehouse/lake/m1"
    val vCur = ParquetVersions.latest(dir).get._1
    assert(spark.sql(
      s"SELECT v FROM graft_mm.lake.m1 VERSION AS OF ${vCur - 1} WHERE k = 150")
      .head.getLong(0) === 1500L, "pre-merge snapshot shows the original")
    assert(spark.sql(
      s"SELECT count(*) AS c FROM graft_mm.lake.m1 VERSION AS OF ${vCur - 1} " +
        "WHERE k >= 500").head.getLong(0) === 0)
    assert(spark.sql(
      s"SELECT v FROM graft_mm.lake.m1 VERSION AS OF $vCur WHERE k = 150")
      .head.getLong(0) === 150000L)
  }

  test("matched DELETE and conditional arms; compaction purges the masks") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m2")
    spark.sql("CREATE TABLE graft_mm.lake.m2 AS " +
      "SELECT id AS k, id * 10 AS v FROM range(100)")
    val dir = s"$warehouse/lake/m2"
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m2')")
    spark.range(40, 60).selectExpr("id AS k", "id AS sv")
      .createOrReplaceTempView("m2_src")
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.m2 t USING m2_src s ON t.k = s.k
                   WHEN MATCHED AND s.sv >= 55 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET v = s.sv""")
    }
    // 55..59 deleted, 40..54 updated to sv
    assert(spark.table("graft_mm.lake.m2").count() === 95)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m2 WHERE k >= 55 AND k < 60")
      .head.getLong(0) === 0)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft_mm.lake.m2 WHERE k BETWEEN 40 AND 54")
      .head.getLong(0) === (40L to 54L).sum)
    assert(ParquetVersions.masksFor(dir, None).nonEmpty)
    spark.sql("CALL graft_mm.system.compact_table(table => 'lake.m2')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    assert(spark.table("graft_mm.lake.m2").count() === 95)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft_mm.lake.m2 WHERE k BETWEEN 40 AND 54")
      .head.getLong(0) === (40L to 54L).sum)
  }

  test("mixed keys (duplicate-key rows split across arms) take the " +
      "group-rewrite regime, exactly (DV disabled — the positional " +
      "regime has its own spec)") {
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m3")
    // two rows per key IN THE SAME FILE: v = k and v = k + 1000 (a
    // cross-file duplicate key is NOT mixed — each file's mask is
    // per-file exact; the coalesce forces the in-file split)
    spark.sql("CREATE TABLE graft_mm.lake.m3 (k BIGINT, v BIGINT)")
    spark.range(20).selectExpr("id % 10 AS k", "id % 10 + (id DIV 10) * 1000 AS v")
      .coalesce(1).writeTo("graft_mm.lake.m3").append()
    val dir = s"$warehouse/lake/m3"
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m3')")
    spark.range(3, 6).selectExpr("id AS k").createOrReplaceTempView("m3_src")
    withMergeOnRead {
      // only the low-v row of each matched key is deleted; the high-v
      // row of the SAME key in the SAME file must stay → a key mask
      // cannot express this → rewrite regime
      spark.sql("""MERGE INTO graft_mm.lake.m3 t USING m3_src s ON t.k = s.k
                   WHEN MATCHED AND t.v < 1000 THEN DELETE""")
    }
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "the rewrite regime carries no masks")
    assert(spark.table("graft_mm.lake.m3").count() === 17)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m3 WHERE k IN (3,4,5) AND v < 1000")
      .head.getLong(0) === 0, "low rows of matched keys deleted")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m3 WHERE k IN (3,4,5)")
      .head.getLong(0) === 3, "high rows of matched keys survive")
    } finally spark.conf.unset(DeletionVectors.ENABLED_KEY)
  }

  test("mask-key cap overflow takes the group-rewrite regime, exactly " +
      "(DV disabled)") {
    spark.conf.set(DeletionVectors.ENABLED_KEY, "false")
    try {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m4")
    spark.sql("CREATE TABLE graft_mm.lake.m4 AS " +
      "SELECT id AS k, id AS v FROM range(100)")
    val dir = s"$warehouse/lake/m4"
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m4')")
    spark.range(0, 50).selectExpr("id AS k", "id + 7 AS nv")
      .createOrReplaceTempView("m4_src")
    spark.conf.set(ParquetMoRMerge.MAX_MASK_KEYS_KEY, "5")
    try withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.m4 t USING m4_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.nv""")
    } finally spark.conf.unset(ParquetMoRMerge.MAX_MASK_KEYS_KEY)
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "past the cap the rewrite regime carries no masks")
    assert(spark.table("graft_mm.lake.m4").count() === 100)
    assert(spark.sql("SELECT sum(v) AS s FROM graft_mm.lake.m4")
      .head.getLong(0) === (0L until 50L).map(_ + 7).sum + (50L until 100L).sum)
    } finally spark.conf.unset(DeletionVectors.ENABLED_KEY)
  }

  test("cardinality violation fails loudly") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m5")
    spark.sql("CREATE TABLE graft_mm.lake.m5 AS SELECT id AS k, id AS v FROM range(10)")
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m5')")
    // two source rows share key 3
    spark.sql("SELECT 3 AS k, 1 AS nv UNION ALL SELECT 3, 2")
      .createOrReplaceTempView("m5_src")
    withMergeOnRead {
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO graft_mm.lake.m5 t USING m5_src s ON t.k = s.k
                     WHEN MATCHED THEN UPDATE SET v = s.nv""")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.toUpperCase.contains("CARDINALITY")), e.toString)
    }
  }

  test("prior lightweight DELETE is honored: masked rows merge as NOT MATCHED") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m6")
    spark.sql("CREATE TABLE graft_mm.lake.m6 AS SELECT id AS k, id AS v FROM range(20)")
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m6')")
    spark.sql("SELECT 7 AS k, 777 AS nv").createOrReplaceTempView("m6_src")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_mm.lake.m6 WHERE k = 7")
      spark.sql("""MERGE INTO graft_mm.lake.m6 t USING m6_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.nv
                   WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)""")
    }
    // the deleted row is invisible → the source row INSERTS (one row, new image)
    assert(spark.table("graft_mm.lake.m6").count() === 20)
    val r = spark.sql("SELECT v FROM graft_mm.lake.m6 WHERE k = 7").collect()
    assert(r.length === 1 && r.head.getLong(0) === 777L,
      "exactly the inserted image, never the resurrected original")
  }

  test("partitioned table: inserts open new partitions, updates move rows") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m7")
    spark.sql("""CREATE TABLE graft_mm.lake.m7 (k BIGINT, region STRING, v BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_mm.lake.m7
                 SELECT id, CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id
                 FROM range(40)""")
    val dir = s"$warehouse/lake/m7"
    val before = fileSigs(dir)
    spark.sql("""SELECT 4 AS k, 'apac' AS region, 444 AS v
                 UNION ALL SELECT 100, 'apac', 1000""")
      .createOrReplaceTempView("m7_src")
    withMergeOnRead {
      // the matched UPDATE MOVES row k=4 from eu to apac; the insert
      // opens the brand-new apac partition
      spark.sql("""MERGE INTO graft_mm.lake.m7 t USING m7_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET region = s.region, v = s.v
                   WHEN NOT MATCHED THEN INSERT (k, region, v) VALUES (s.k, s.region, s.v)""")
    }
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig), s"pre-existing file $name changed")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(_.startsWith("region~apac/")),
      s"appends must land routed into the apac partition: $appended")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m7 WHERE region = 'apac'")
      .head.getLong(0) === 2)
    assert(spark.sql("SELECT v FROM graft_mm.lake.m7 WHERE k = 4")
      .head.getLong(0) === 444L)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m7 WHERE region = 'eu'")
      .head.getLong(0) === 19, "k=4 left eu")
    assert(spark.table("graft_mm.lake.m7").count() === 41)
  }

  test("bucketed table: appended images carry bucket tags") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m8")
    spark.sql("CREATE TABLE graft_mm.lake.m8 (user_id STRING, amount BIGINT)")
    val dir = s"$warehouse/lake/m8"
    import spark.implicits._
    val df = (0 until 80).map(i => (s"u${i % 8}", i.toLong)).toDF("user_id", "amount")
    ParquetBucketing.writeBucketed(spark, df, "graft_mm.lake.m8", "user_id", 4)
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m8')")
    val before = fileSigs(dir)
    Seq(("u3", 999L), ("u99", 5L)).toDF("user_id", "na")
      .createOrReplaceTempView("m8_src")
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.m8 t USING m8_src s
                   ON t.user_id = s.user_id
                   WHEN MATCHED THEN UPDATE SET amount = s.na
                   WHEN NOT MATCHED THEN INSERT (user_id, amount) VALUES (s.user_id, s.na)""")
    }
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig), s"pre-existing file $name rewritten")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(n =>
      n.startsWith("rlo-mrg-") && ParquetBucketing.bucketOfName(n).isDefined),
      s"images must carry bucket tags: $appended")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_mm.lake.m8 WHERE amount = 999")
      .head.getLong(0) === 10)
    assert(spark.sql("SELECT amount FROM graft_mm.lake.m8 WHERE user_id = 'u99'")
      .head.getLong(0) === 5L)
    assert(spark.table("graft_mm.lake.m8").count() === 81)
  }

  test("mode off / un-versioned tables keep copy-on-write, correctly") {
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.m9")
    spark.sql("CREATE TABLE graft_mm.lake.m9 AS SELECT id AS k, id AS v FROM range(30)")
    spark.sql("CALL graft_mm.system.enable_versioning(table => 'lake.m9')")
    spark.range(10, 15).selectExpr("id AS k", "id * 2 AS nv")
      .createOrReplaceTempView("m9_src")
    spark.sql("""MERGE INTO graft_mm.lake.m9 t USING m9_src s ON t.k = s.k
                 WHEN MATCHED THEN UPDATE SET v = s.nv""")
    assert(ParquetVersions.masksFor(s"$warehouse/lake/m9", None).isEmpty,
      "the CoW path carries no masks")
    assert(spark.sql("SELECT sum(v) AS s FROM graft_mm.lake.m9")
      .head.getLong(0) ===
        (0L until 30L).filterNot(k => k >= 10 && k < 15).sum +
          (10L until 15L).map(_ * 2).sum)
  }

  test("MERGE matching nothing with no inserts is a no-op (no version churn)") {
    val dir = s"$warehouse/lake/m1"
    val vBefore = ParquetVersions.latest(dir).get._1
    spark.sql("SELECT CAST(9999999 AS BIGINT) AS k, CAST(0 AS BIGINT) AS v")
      .createOrReplaceTempView("m1_noop_src")
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.m1 t USING m1_noop_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.v""")
    }
    assert(ParquetVersions.latest(dir).get._1 === vBefore,
      "nothing matched and nothing inserted: no commit")
  }

  test("the command releases every cache it takes (no per-statement leak)") {
    // the prefiltered target, the joined delta and the source are all
    // persisted inside one MERGE — a trickle-upsert session runs
    // thousands of these, so a single leaked block grows without bound
    spark.sql("DROP TABLE IF EXISTS graft_mm.lake.mleak")
    spark.sql("CREATE TABLE graft_mm.lake.mleak (k BIGINT, v BIGINT)")
    spark.range(1000).selectExpr("id AS k", "id AS v")
      .coalesce(1).writeTo("graft_mm.lake.mleak").append()
    graft.sources.ParquetVersions.enable(s"$warehouse/lake/mleak")
    spark.sql("SELECT CAST(7 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v")
      .createOrReplaceTempView("mleak_src")
    val before = spark.sparkContext.getPersistentRDDs.size
    withMergeOnRead {
      spark.sql("""MERGE INTO graft_mm.lake.mleak t USING mleak_src s ON t.k = s.k
                   WHEN MATCHED THEN UPDATE SET v = s.v + 100
                   WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    }
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "every cache the MERGE persisted must be released in its finally")
    assert(spark.sql(
      "SELECT v FROM graft_mm.lake.mleak WHERE k = 7").head.getLong(0) === 101L)
  }
}
