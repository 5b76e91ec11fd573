package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-ON-READ `UPDATE` — [[ParquetMoRUpdate]]: the condition lands
  * as a delete mask on the candidate files and the updated row images
  * append as new files, in ONE version publish. Pre-existing data
  * files stay byte-identical; non-maskable shapes and routed layouts
  * fall back to the copy-on-write group rewrite silently. */
class ParquetMoRUpdateSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_moru_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_moru", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_moru.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_moru.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def fileSigs(dir: String): Map[String, (Long, Int)] = {
    val data = new Path(dir, "data")
    fs.listStatus(data).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet")).map { s =>
      val in = fs.open(s.getPath)
      val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
        finally in.close()
      (s.getPath.getName, (s.getLen, java.util.Arrays.hashCode(head)))
    }.toMap
  }

  private def withMergeOnRead[A](f: => A): A = {
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try f finally spark.conf.unset(DeleteMasks.MODE_KEY)
  }

  test("MoR UPDATE: files byte-identical, mask + appended images, exact result") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u1")
    spark.sql("CREATE TABLE graft_moru.lake.u1 (id BIGINT, score BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") * 2).as("score"))
        .coalesce(1).writeTo("graft_moru.lake.u1").append()
    }
    val dir = s"$warehouse/lake/u1"
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u1')")
    val before = fileSigs(dir)
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u1 SET score = -1 WHERE id = 150")
    }
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig),
        s"merge-on-read UPDATE must not rewrite pre-existing file $name")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(_.startsWith("rlo-upd-")),
      s"updated images must append under the maintenance prefix: $appended")
    // the footer proof excludes the other two files: exactly one masked
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.keySet.size === 1, s"only the candidate file is masked: $masks")
    assert(spark.table("graft_moru.lake.u1").count() === 300)
    assert(spark.sql(
      "SELECT score FROM graft_moru.lake.u1 WHERE id = 150")
      .head.getLong(0) === -1L)
    assert(spark.sql("SELECT sum(score) AS s FROM graft_moru.lake.u1")
      .head.getLong(0) === (0L until 300L).filter(_ != 150).map(_ * 2).sum - 1)
  }

  test("time travel straddles the update; one version per UPDATE") {
    val dir = s"$warehouse/lake/u1"
    val vCur = ParquetVersions.latest(dir).get._1
    assert(spark.sql(
      s"SELECT score FROM graft_moru.lake.u1 VERSION AS OF ${vCur - 1} " +
        "WHERE id = 150").head.getLong(0) === 300L,
      "the pre-update snapshot must show the original value")
    assert(spark.sql(
      s"SELECT score FROM graft_moru.lake.u1 VERSION AS OF $vCur " +
        "WHERE id = 150").head.getLong(0) === -1L)
  }

  test("self-referential SET does not re-mask its own output") {
    // SET score = score + 1000 WHERE score < 10: the appended images
    // still satisfy score < 10? No — but build a case where they DO
    // keep matching the predicate column range and must NOT re-delete
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u2")
    spark.sql("CREATE TABLE graft_moru.lake.u2 AS " +
      "SELECT id, id AS x FROM range(100)")
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u2')")
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u2 SET x = x + 1 WHERE x < 5")
    }
    // rows 0..4 became 1..5 — still matching x < 5 for 1..4, but they
    // live in the unmasked appended file, so they survive
    assert(spark.sql("SELECT sum(x) AS s FROM graft_moru.lake.u2")
      .head.getLong(0) === (5L until 100L).sum + (1L to 5L).sum)
    assert(spark.table("graft_moru.lake.u2").count() === 100)
  }

  test("stacks on a prior lightweight DELETE without resurrection") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u3")
    spark.sql("CREATE TABLE graft_moru.lake.u3 AS " +
      "SELECT id, CAST(0 AS BIGINT) AS flag FROM range(100)")
    val dir = s"$warehouse/lake/u3"
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u3')")
    withMergeOnRead {
      spark.sql("DELETE FROM graft_moru.lake.u3 WHERE id BETWEEN 40 AND 49")
      spark.sql("UPDATE graft_moru.lake.u3 SET flag = 1 WHERE id BETWEEN 30 AND 59")
    }
    // deleted rows stay deleted; the update touched only visible rows
    assert(spark.table("graft_moru.lake.u3").count() === 90)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u3 WHERE flag = 1")
      .head.getLong(0) === 20, "40..49 were deleted before the update")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u3 WHERE id BETWEEN 40 AND 49")
      .head.getLong(0) === 0)
    // compaction merges everything physically: same rows, no masks
    spark.sql("CALL graft_moru.system.compact_table(table => 'lake.u3')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    assert(spark.table("graft_moru.lake.u3").count() === 90)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u3 WHERE flag = 1")
      .head.getLong(0) === 20)
  }

  test("non-maskable condition falls back to copy-on-write, correctly") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u4")
    spark.sql("CREATE TABLE graft_moru.lake.u4 AS " +
      "SELECT id, CAST(0 AS BIGINT) AS tag FROM range(100)")
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u4')")
    withMergeOnRead {
      // modulo is not a maskable Filter shape → group rewrite
      spark.sql("UPDATE graft_moru.lake.u4 SET tag = 1 WHERE id % 10 = 3")
    }
    assert(ParquetVersions.masksFor(s"$warehouse/lake/u4", None).isEmpty,
      "the CoW path must carry no masks")
    assert(spark.sql("SELECT count(*) AS c FROM graft_moru.lake.u4 WHERE tag = 1")
      .head.getLong(0) === 10)
    assert(spark.table("graft_moru.lake.u4").count() === 100)
  }

  test("mode off / un-versioned tables keep copy-on-write") {
    // mode off: maskable condition but no opt-in
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u5")
    spark.sql("CREATE TABLE graft_moru.lake.u5 AS SELECT id, id AS v FROM range(50)")
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u5')")
    spark.sql("UPDATE graft_moru.lake.u5 SET v = 0 WHERE id < 10")
    assert(ParquetVersions.masksFor(s"$warehouse/lake/u5", None).isEmpty)
    assert(spark.sql("SELECT sum(v) AS s FROM graft_moru.lake.u5")
      .head.getLong(0) === (10L until 50L).sum)
    // un-versioned: MoR requires the ledger; the CoW path auto-upgrades
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u6")
    spark.sql("CREATE TABLE graft_moru.lake.u6 AS SELECT id, id AS v FROM range(50)")
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u6 SET v = 0 WHERE id < 10")
    }
    assert(spark.sql("SELECT sum(v) AS s FROM graft_moru.lake.u6")
      .head.getLong(0) === (10L until 50L).sum)
  }

  test("bucketed table: MoR appends bucket-tagged images; compaction restores the claim") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u8")
    spark.sql("CREATE TABLE graft_moru.lake.u8 (user_id STRING, amount BIGINT)")
    val dir = s"$warehouse/lake/u8"
    import spark.implicits._
    val df = (0 until 80).map(i => (s"u${i % 8}", i.toLong)).toDF("user_id", "amount")
    ParquetBucketing.writeBucketed(spark, df, "graft_moru.lake.u8", "user_id", 4)
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u8')")
    val before = fileSigs(dir)
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u8 SET amount = -1 WHERE user_id = 'u3'")
    }
    val after = fileSigs(dir)
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig), s"pre-existing file $name rewritten")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(n =>
      n.startsWith("rlo-upd-") && ParquetBucketing.bucketOfName(n).isDefined),
      s"images must carry bucket tags: $appended")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u8 WHERE amount = -1")
      .head.getLong(0) === 10)
    // compaction purges the masks; every surviving live file is tagged,
    // so the key-grouped layout claim restores without a rebucket
    spark.sql("CALL graft_moru.system.compact_table(table => 'lake.u8')")
    assert(ParquetVersions.masksFor(dir, None).isEmpty)
    val live = ParquetVersions.latest(dir).get._2
    assert(live.forall(n => ParquetBucketing.bucketOfName(n).isDefined),
      s"all live files tagged after compaction: $live")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u8 WHERE amount = -1")
      .head.getLong(0) === 10)
    assert(spark.table("graft_moru.lake.u8").count() === 80)
  }

  test("partitioned table: images stay in their partition, others never open") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u9")
    spark.sql("""CREATE TABLE graft_moru.lake.u9 (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_moru.lake.u9
                 SELECT CASE WHEN id % 3 = 0 THEN 'eu'
                             WHEN id % 3 = 1 THEN 'us' ELSE 'ap' END, id
                 FROM range(90)""")
    val dir = s"$warehouse/lake/u9"
    val (usDir, apDir) = (s"$dir/data/region~us", s"$dir/data/region~ap")
    def sigs(): Map[String, (Long, Int)] = {
      val out = Map.newBuilder[String, (Long, Int)]
      ParquetVersions.latest(dir).get._2.foreach { rel =>
        val p = new org.apache.hadoop.fs.Path(s"$dir/data", rel)
        val st = fs.getFileStatus(p)
        val in = fs.open(p)
        val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
          finally in.close()
        out += rel -> ((st.getLen, java.util.Arrays.hashCode(head)))
      }
      out.result()
    }
    val before = sigs()
    val excludedBefore = ParquetFooterStats.footerReadsUnder(usDir) +
      ParquetFooterStats.footerReadsUnder(apDir)
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u9 SET amount = -1 " +
        "WHERE region = 'eu' AND amount < 30")
    }
    // excluded partitions never open a footer during classification
    // (partition-dir bounds prove them out with zero I/O)
    val excludedOpened = ParquetFooterStats.footerReadsUnder(usDir) +
      ParquetFooterStats.footerReadsUnder(apDir) - excludedBefore
    assert(excludedOpened === 0,
      s"excluded partitions must classify with zero footer I/O ($excludedOpened)")
    val after = sigs()
    before.foreach { case (name, sig) =>
      assert(after.get(name).contains(sig), s"pre-existing file $name changed")
    }
    val appended = (after.keySet -- before.keySet).toSeq
    assert(appended.nonEmpty && appended.forall(n =>
      n.startsWith("region~eu/") &&
        n.substring(n.indexOf('/') + 1).startsWith("rlo-upd-")),
      s"images must land inside the touched partition: $appended")
    // masks attach only inside the touched partition
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty && masks.keySet.forall(_.startsWith("region~eu/")), masks)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u9 WHERE amount = -1")
      .head.getLong(0) === 10, "eu rows 0,3,..,27")
    assert(spark.table("graft_moru.lake.u9").count() === 90)
    assert(spark.sql(
      "SELECT sum(amount) AS s FROM graft_moru.lake.u9 WHERE region = 'us'")
      .head.getLong(0) === (0L until 90L).filter(_ % 3 == 1).sum)
  }

  test("SET on a partition column falls back to copy-on-write routing") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u10")
    spark.sql("""CREATE TABLE graft_moru.lake.u10 (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_moru.lake.u10
                 SELECT CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id
                 FROM range(20)""")
    val dir = s"$warehouse/lake/u10"
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u10 SET region = 'apac' WHERE amount < 6")
    }
    assert(ParquetVersions.masksFor(dir, None).isEmpty,
      "partition-moving UPDATE must take the CoW router, not masks")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u10 WHERE region = 'apac'")
      .head.getLong(0) === 6)
    assert(spark.table("graft_moru.lake.u10").count() === 20)
  }

  test("change feed reports a MoR UPDATE as delete + insert") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u7")
    spark.sql("CREATE TABLE graft_moru.lake.u7 AS SELECT id, id AS v FROM range(50)")
    val dir = s"$warehouse/lake/u7"
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u7')")
    val v1 = ParquetVersions.latest(dir).get._1
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u7 SET v = 100 WHERE id = 7")
    }
    val v2 = ParquetVersions.latest(dir).get._1
    assert(v2 === v1 + 1, "one UPDATE = one version")
    val log = ChangeFeed.parquetChanges(spark, dir, v1, v2)
    val dels = log.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "delete")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    val ins = log.filter(col(ChangeFeed.CHANGE_TYPE_COL) === "insert")
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dels.toSeq === Seq((7L, 7L)), "old image surfaces as delete")
    assert(ins.toSeq === Seq((7L, 100L)), "new image surfaces as insert")
  }

  test("concurrent disjoint MoR UPDATEs converge through the ledger CAS") {
    spark.sql("DROP TABLE IF EXISTS graft_moru.lake.u11")
    spark.sql("CREATE TABLE graft_moru.lake.u11 AS " +
      "SELECT id, CAST(0 AS BIGINT) AS tag FROM range(200)")
    val dir = s"$warehouse/lake/u11"
    spark.sql("CALL graft_moru.system.enable_versioning(table => 'lake.u11')")
    withMergeOnRead {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(pool)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      val fs = Seq(
        Future(spark.sql("UPDATE graft_moru.lake.u11 SET tag = 1 WHERE id < 50")),
        Future(spark.sql("UPDATE graft_moru.lake.u11 SET tag = 2 WHERE id >= 150")))
      fs.foreach(Await.result(_, 120.seconds))
      pool.shutdown()
    }
    // both updates land; disjoint predicates cannot clobber each other
    assert(spark.table("graft_moru.lake.u11").count() === 200)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u11 WHERE tag = 1")
      .head.getLong(0) === 50)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u11 WHERE tag = 2")
      .head.getLong(0) === 50)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_moru.lake.u11 WHERE tag = 0")
      .head.getLong(0) === 100)
  }

  test("UPDATE provably matching nothing is a no-op (no new version)") {
    val dir = s"$warehouse/lake/u1"
    val vBefore = ParquetVersions.latest(dir).get._1
    withMergeOnRead {
      spark.sql("UPDATE graft_moru.lake.u1 SET score = 0 WHERE id = 9999999")
    }
    assert(ParquetVersions.latest(dir).get._1 === vBefore,
      "footer proof excludes every file: no commit, no version churn")
  }
}
