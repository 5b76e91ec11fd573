package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** REPLACE TABLE AS SELECT on PARTITIONED targets (VERDICT r12 #4):
  * the statement's PARTITIONED BY defines the replacement layout, the
  * write routes through the partition-staging writers, and the whole
  * replacement — files, schema, spec — lands as ONE version publish. */
class RtasPartitionedSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_rtasp_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_rp", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_rp.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_rp.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def liveFiles(dir: String): Seq[String] =
    ParquetVersions.latest(dir).get._2

  test("RTAS re-partitions: new layout routed, one publish, time travel " +
      "straddles, subsequent INSERTs route by the new spec") {
    spark.sql("DROP TABLE IF EXISTS graft_rp.lake.t1")
    spark.sql("""CREATE TABLE graft_rp.lake.t1 (region STRING, k BIGINT, v BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_rp.lake.t1
                 SELECT CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id, id * 10
                 FROM range(40)""")
    val dir = s"$warehouse/lake/t1"
    val vPre = ParquetVersions.latest(dir).get._1
    spark.sql("""REPLACE TABLE graft_rp.lake.t1 PARTITIONED BY (tier) AS
                 SELECT CASE WHEN k % 3 = 0 THEN 'hot' ELSE 'cold' END AS tier,
                        k, v + 1 AS v
                 FROM range(40) AS r(k)
                 JOIN (SELECT k AS k2, v FROM graft_rp.lake.t1) ON k = k2""")
    // ONE atomic publish for the whole replacement
    assert(ParquetVersions.latest(dir).get._1 === vPre + 1,
      "REPLACE TABLE must be exactly one version publish")
    // new files live under the NEW layout's partition dirs, rtas-named
    val live = liveFiles(dir)
    assert(live.nonEmpty && live.forall(n =>
      (n.startsWith("tier~hot/") || n.startsWith("tier~cold/")) &&
        PartitionSpecs.nameOfRel(n).startsWith("rtas-")),
      s"replacement files must route into the new layout: $live")
    // the spec swapped
    val spec = PartitionSpecs.read(dir)
    assert(spec.exists(_.fields.map(f => (f.col, f.transform)) ===
      Seq(("tier", "identity"))), s"spec must be the new layout: $spec")
    // rows exact
    assert(spark.table("graft_rp.lake.t1").count() === 40)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_rp.lake.t1 WHERE tier = 'hot'")
      .head.getLong(0) === 14, "k % 3 = 0 for 0,3,...,39")
    assert(spark.sql("SELECT sum(v) AS s FROM graft_rp.lake.t1")
      .head.getLong(0) === (0L until 40L).map(_ * 10 + 1).sum)
    // time travel reads the pre-replace FILES (under the new read
    // schema — ALTER semantics: the dropped `region` is gone, surviving
    // columns carry their old values)
    assert(spark.sql(
      s"SELECT count(*) AS c, sum(v) AS s FROM graft_rp.lake.t1 " +
        s"VERSION AS OF $vPre").head.getLong(0) === 40)
    assert(spark.sql(
      s"SELECT sum(v) AS s FROM graft_rp.lake.t1 VERSION AS OF $vPre")
      .head.getLong(0) === (0L until 40L).map(_ * 10).sum,
      "pre-replace values survive under the pinned version")
    // post-replace INSERTs route by the NEW spec
    spark.sql("INSERT INTO graft_rp.lake.t1 VALUES ('hot', 100, 1)")
    val afterIns = liveFiles(dir).filterNot(live.toSet)
    assert(afterIns.nonEmpty && afterIns.forall(_.startsWith("tier~hot/")),
      s"post-replace appends must route by the new layout: $afterIns")
  }

  test("RTAS flattens a partitioned table when PARTITIONED BY is absent") {
    spark.sql("DROP TABLE IF EXISTS graft_rp.lake.t2")
    spark.sql("""CREATE TABLE graft_rp.lake.t2 (region STRING, v BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("INSERT INTO graft_rp.lake.t2 VALUES ('eu', 1), ('us', 2)")
    val dir = s"$warehouse/lake/t2"
    spark.sql("""REPLACE TABLE graft_rp.lake.t2 AS
                 SELECT 'all' AS region, CAST(9 AS BIGINT) AS v""")
    assert(PartitionSpecs.read(dir).isEmpty,
      "no PARTITIONED BY in the statement → the replaced table is flat")
    val live = liveFiles(dir)
    assert(live.forall(n => !n.contains("/")),
      s"flat replacement files live at the data root: $live")
    assert(spark.table("graft_rp.lake.t2").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === Seq(("all", 9L)))
  }

  test("RTAS partitions a previously-flat table; probe prunes by dir " +
      "bounds with zero footer I/O in excluded partitions") {
    spark.sql("DROP TABLE IF EXISTS graft_rp.lake.t3")
    spark.sql("CREATE TABLE graft_rp.lake.t3 AS " +
      "SELECT id AS k, id * 2 AS v FROM range(30)")
    val dir = s"$warehouse/lake/t3"
    spark.sql("""REPLACE TABLE graft_rp.lake.t3 PARTITIONED BY (grp) AS
                 SELECT CASE WHEN id < 10 THEN 'a' WHEN id < 20 THEN 'b'
                             ELSE 'c' END AS grp, id AS k, id * 2 AS v
                 FROM range(30)""")
    assert(PartitionSpecs.read(dir).isDefined)
    val live = liveFiles(dir)
    assert(live.forall(n => n.startsWith("grp~")), s"routed: $live")
    // a grp-filtered probe opens no footers in the excluded partitions
    val excluded = Seq(s"$dir/data/grp~b", s"$dir/data/grp~c")
    val before = excluded.map(ParquetFooterStats.footerReadsUnder).sum
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft_rp.lake.t3 WHERE grp = 'a'")
      .head.getLong(0) === (0L until 10L).map(_ * 2).sum)
    val opened = excluded.map(ParquetFooterStats.footerReadsUnder).sum - before
    assert(opened === 0, s"excluded partitions must not open footers ($opened)")
  }

  test("entity-log RTAS still rejects PARTITIONED BY") {
    spark.sql("DROP TABLE IF EXISTS graft_rp.lake.lg")
    spark.sql("""CREATE TABLE graft_rp.lake.lg
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    val e = intercept[Exception] {
      spark.sql("""REPLACE TABLE graft_rp.lake.lg PARTITIONED BY (user_id) AS
                   SELECT 'u1' AS user_id, CAST(1 AS BIGINT) AS amount,
                          CAST(NULL AS BINARY) AS msg, 'h' AS sha256sum""")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unpartitioned")), e.toString)
  }
}
