package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CTAS / RTAS through the catalog's [[LogStaging]] surface:
  * `CREATE TABLE … AS SELECT` materializes in a hidden staging dir and
  * renames in whole; `REPLACE TABLE … AS SELECT` publishes one ledger
  * version on parquet tables (history intact, pinned readers safe) and
  * rides the log tier's atomic truncate-commit. */
class LogStagingSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_stage_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_st", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_st.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_st.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("CTAS parquet: atomic create, data lands, listTables hides staging") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.c_pq")
    spark.sql("""CREATE TABLE graft_st.lake.c_pq AS
                 SELECT id, id * 2 AS score FROM range(100)""")
    assert(spark.table("graft_st.lake.c_pq").count() === 100)
    assert(spark.sql("SELECT sum(score) AS s FROM graft_st.lake.c_pq")
      .collect()(0).getLong(0) === 9900)
    // the staging dir is gone; no dot-dirs survive in the namespace
    val ns = fs.listStatus(new Path(s"$warehouse/lake"))
      .map(_.getPath.getName).filter(_.startsWith("."))
    assert(ns.isEmpty, s"staging leftovers: ${ns.mkString(",")}")
    // schema manifest present → it is a parquet-managed table
    assert(fs.exists(new Path(s"$warehouse/lake/c_pq/_schema.json")))
    // CTAS into an existing name fails and leaves the table untouched
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft_st.lake.c_pq AS SELECT 1 AS x")
    }
    assert(e.getMessage.toLowerCase.contains("exists"), e.getMessage)
    assert(spark.table("graft_st.lake.c_pq").count() === 100)
  }

  test("CTAS with the entity schema creates a real log table") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.c_log")
    spark.sql("""CREATE TABLE graft_st.lake.c_log AS
                 SELECT concat('u', CAST(id % 7 AS STRING)) AS user_id,
                        id * 100 AS amount,
                        CAST(NULL AS BINARY) AS msg,
                        sha2(CAST(id AS STRING), 256) AS sha256sum
                 FROM range(50)""")
    // no _schema.json → dispatched to the entity-log tier
    assert(!fs.exists(new Path(s"$warehouse/lake/c_log/_schema.json")))
    assert(spark.table("graft_st.lake.c_log").count() === 50)
    // the log connector's metadata COUNT path serves this
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_st.lake.c_log WHERE user_id = 'u3'")
      .collect()(0).getLong(0) === 7)
  }

  test("RTAS parquet: one version publish, history and pinned reads intact") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.r_pq")
    spark.sql("""CREATE TABLE graft_st.lake.r_pq AS
                 SELECT id, id * 2 AS score FROM range(100)""")
    val dir = s"$warehouse/lake/r_pq"
    ParquetVersions.enable(dir) // v1 = the CTAS load
    // PLAN a scan before the replace (toLocalIterator materializes the
    // physical plan, which pins the live file set — the same
    // planning-time pin Delta gives); a DataFrame alone re-plans per
    // action and correctly sees the post-replace state
    val pinned = spark.table("graft_st.lake.r_pq").toLocalIterator()
    spark.sql("""REPLACE TABLE graft_st.lake.r_pq AS
                 SELECT id, id * 10 AS score FROM range(30)""")
    assert(spark.table("graft_st.lake.r_pq").count() === 30)
    assert(spark.sql("SELECT sum(score) AS s FROM graft_st.lake.r_pq")
      .collect()(0).getLong(0) === 4350)
    var pinnedRows = 0
    while (pinned.hasNext) { pinned.next(); pinnedRows += 1 }
    assert(pinnedRows === 100, "pinned pre-replace scan lost its snapshot")
    // time travel straddles the replacement
    assert(spark.sql("SELECT count(*) AS n FROM graft_st.lake.r_pq VERSION AS OF 1")
      .collect()(0).getLong(0) === 100)
    // the replaced files carry the maintenance prefix, old files remain
    // on disk until vacuum
    val data = fs.listStatus(new Path(s"$dir/data")).map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    assert(data.exists(_.startsWith("rtas-")))
    assert(data.exists(_.startsWith("part-")))
    val reclaimed = ParquetVersions.vacuum(dir, retainLast = 1)
    assert(reclaimed.nonEmpty)
    assert(spark.table("graft_st.lake.r_pq").count() === 30)
  }

  test("RTAS redeclares the schema; un-versioned tables auto-upgrade") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.r_schema")
    spark.sql("""CREATE TABLE graft_st.lake.r_schema AS
                 SELECT id, id * 2 AS score FROM range(10)""")
    // no enable: the replace itself must upgrade to versioned
    spark.sql("""REPLACE TABLE graft_st.lake.r_schema AS
                 SELECT CAST(id AS STRING) AS key, id * 1.5 AS rating,
                        id % 2 = 0 AS flag
                 FROM range(20)""")
    val t = spark.table("graft_st.lake.r_schema")
    assert(t.columns.toSeq === Seq("key", "rating", "flag"))
    assert(t.count() === 20)
    assert(ParquetVersions.enabled(s"$warehouse/lake/r_schema"))
    // v1 = the pre-replace state, still readable (under the new read
    // schema: old columns pruned, new ones null — the ALTER semantics)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_st.lake.r_schema VERSION AS OF 1")
      .collect()(0).getLong(0) === 10)
  }

  test("CREATE OR REPLACE works for both the exists and not-exists arms") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.cor")
    spark.sql("""CREATE OR REPLACE TABLE graft_st.lake.cor AS
                 SELECT id FROM range(5)""")
    assert(spark.table("graft_st.lake.cor").count() === 5)
    spark.sql("""CREATE OR REPLACE TABLE graft_st.lake.cor AS
                 SELECT id FROM range(12)""")
    assert(spark.table("graft_st.lake.cor").count() === 12)
  }

  test("RTAS on an entity log rides the truncate-commit; wrong schema is rejected") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.r_log")
    spark.sql("""CREATE TABLE graft_st.lake.r_log
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.range(10).select(
        concat(lit("u"), (col("id") % 3).cast("string")).as("user_id"),
        (col("id") * 10).as("amount"),
        lit(null).cast("binary").as("msg"),
        sha2(col("id").cast("string"), 256).as("sha256sum"))
      .writeTo("graft_st.lake.r_log").append()
    assert(spark.table("graft_st.lake.r_log").count() === 10)
    spark.sql("""REPLACE TABLE graft_st.lake.r_log AS
                 SELECT 'u9' AS user_id, id AS amount,
                        CAST(NULL AS BINARY) AS msg,
                        sha2(CAST(id AS STRING), 256) AS sha256sum
                 FROM range(4)""")
    val rows = spark.table("graft_st.lake.r_log")
    assert(rows.count() === 4)
    assert(rows.select("user_id").distinct().collect().map(_.getString(0)).toSeq
      === Seq("u9"))
    // a non-entity schema cannot replace a log
    val e = intercept[Exception] {
      spark.sql("REPLACE TABLE graft_st.lake.r_log AS SELECT 1 AS x")
    }
    assert(e.getMessage.contains("entity"), e.getMessage)
    assert(spark.table("graft_st.lake.r_log").count() === 4)
  }

  test("RTAS preserves a bucket layout whose column survives") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.r_bkt")
    spark.sql("""CREATE TABLE graft_st.lake.r_bkt
                 (user_id STRING, amount BIGINT)""")
    val dir = s"$warehouse/lake/r_bkt"
    spark.sql(
      s"""CALL graft_st.system.set_bucket_spec(table => 'lake.r_bkt',
         |col => 'user_id', n => 4)""".stripMargin)
    spark.sql("""REPLACE TABLE graft_st.lake.r_bkt AS
                 SELECT concat('u', CAST(id % 11 AS STRING)) AS user_id,
                        id AS amount FROM range(200)""")
    assert(spark.table("graft_st.lake.r_bkt").count() === 200)
    // every replacement file carries a bucket tag
    val names = fs.listStatus(new Path(s"$dir/data")).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && n.startsWith("rtas-"))
    assert(names.nonEmpty && names.forall(_.matches(".*-b\\d+\\.parquet")),
      names.mkString(","))
    assert(ParquetBucketing.readSpec(dir).isDefined)
    // replacing WITHOUT the bucket column drops the spec with it
    spark.sql("""REPLACE TABLE graft_st.lake.r_bkt AS
                 SELECT id AS k FROM range(5)""")
    assert(ParquetBucketing.readSpec(dir).isEmpty,
      "bucket spec must not outlive its column")
    assert(spark.table("graft_st.lake.r_bkt").count() === 5)
  }

  test("a failed CTAS leaves no table and no staging debris") {
    spark.sql("DROP TABLE IF EXISTS graft_st.lake.c_fail")
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_st.lake.c_fail AS
                   SELECT assert_true(id < 5, 'boom') AS chk, id FROM range(10)""")
    }
    assert(e != null)
    assert(!fs.exists(new Path(s"$warehouse/lake/c_fail")),
      "failed CTAS must not leave a table")
    val dots = fs.listStatus(new Path(s"$warehouse/lake"))
      .map(_.getPath.getName).filter(_.startsWith(".ctas-"))
    assert(dots.isEmpty, s"staging debris: ${dots.mkString(",")}")
  }

  test("dot-prefixed identifiers are rejected outright") {
    val e = intercept[Exception] {
      spark.sql(s"CREATE TABLE graft_st.lake.`.sneaky` (id BIGINT)")
    }
    assert(e.getMessage.contains("bad identifier") ||
      e.getMessage.contains("sneaky"), e.getMessage)
  }
}
