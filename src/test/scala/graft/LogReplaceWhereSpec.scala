package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REPLACE WHERE on the entity log ([[LogWriteBuilder]]
  * SupportsOverwrite): the idempotent-backfill write — retire every
  * current row matching the condition and land the payload, in ONE
  * version on a versioned log. The write side goes through the catalog
  * (`writeTo(...).overwrite(cond)` / SQL `INSERT INTO ... REPLACE
  * WHERE`); the catalog table dir doubles as a path-addressed log for
  * seeding and listing assertions. */
class LogReplaceWhereSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  /** One catalog per test (catalog options are cached per name):
    * returns (tableIdent, tableDir). */
  private def freshTable(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"graft_lhow_$tag").toString
    spark.conf.set(s"spark.sql.catalog.graft_ow$tag", "graft.sources.LogCatalog")
    spark.conf.set(s"spark.sql.catalog.graft_ow$tag.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_ow$tag.ops")
    spark.sql(s"""CREATE TABLE graft_ow$tag.ops.limits
                  (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    (s"graft_ow$tag.ops.limits", s"$wh/ops/limits")
  }

  /** Seed three single-segment commits of known shape. */
  private def seed(dir: String): Unit = {
    def write(rows: Seq[(String, Long, String)]): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "amount", "sha256sum")
        .select(col("user_id"), col("amount"),
          lit(null).cast("binary").as("msg"), col("sha256sum"))
        .repartition(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
      ()
    }
    write(Seq(("u1", 10L, "ha1"), ("u1", 20L, "ha2"), ("u2", 30L, "ha3")))
    write(Seq(("zz", 100L, "hb1"), ("zz", 200L, "hb2")))
    write(Seq(("u7", 700L, "hc1"), ("u8", 800L, "hc2")))
  }

  private def names(dir: String): Set[String] =
    LimitHashLog.segments(dir).map(p => new Path(p._1).getName).toSet

  private def rows(table: String): Set[(String, Long, String)] =
    spark.table(table).select("user_id", "amount", "sha256sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet

  private def payload(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("user_id", "amount", "sha256sum")
      .select(col("user_id"), col("amount"),
        lit(null).cast("binary").as("msg"), col("sha256sum"))
      .repartition(1)
  }

  test("replace-where retires exactly the matching rows and lands the payload") {
    val (table, dir) = freshTable("a")
    seed(dir)
    val before = names(dir)
    assert(before.size == 3)
    // replace the "zz" slice (a whole single-value-zone segment) with
    // fresh rows that ALSO match the condition — the fence must keep
    // the new payload out of the delete's inputs
    payload(Seq(("zz", 111L, "nb1"), ("zz", 222L, "nb2"), ("zz", 333L, "nb3")))
      .writeTo(table).overwrite(col("user_id") === "zz")
    assert(rows(table) == Set(
      ("u1", 10L, "ha1"), ("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"),
      ("zz", 111L, "nb1"), ("zz", 222L, "nb2"), ("zz", 333L, "nb3")))
    val after = names(dir)
    // zone-clean segments were never touched: their exact names survive,
    // and only the single-value "zz" segment was retired
    assert((before -- after).size == 1)
    assert((before intersect after).size == 2)
  }

  test("partial-segment replace rewrites survivors exactly") {
    val (table, dir) = freshTable("b")
    seed(dir)
    // condition straddles segment A (u1 matches, u2 survives)
    payload(Seq(("u1", 999L, "nw1")))
      .writeTo(table).overwrite(col("amount") < lit(25L))
    assert(rows(table) == Set(
      ("u2", 30L, "ha3"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"),
      ("u1", 999L, "nw1")))
  }

  test("versioned log: one atomic version; pre-state still exact via time travel") {
    val (table, dir) = freshTable("c")
    seed(dir)
    val v1 = LogVersions.enable(dir)
    val beforeRows = rows(table)
    payload(Seq(("zz", 1L, "nv1")))
      .writeTo(table).overwrite(col("user_id") === "zz")
    val (latest, _) = LogVersions.latest(dir).get
    // exactly ONE commit for the whole replace (retire + rewrite + append)
    assert(latest == v1 + 1)
    assert(rows(table) == Set(
      ("u1", 10L, "ha1"), ("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("zz", 1L, "nv1")))
    // the pinned pre-op snapshot is bit-exact
    val pinned = spark.read.format(LimitHashLog.FORMAT)
      .option("versionAsOf", v1.toString).load(dir)
      .select("user_id", "amount", "sha256sum")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(pinned == beforeRows)
  }

  test("unsupported replace condition fails at planning, table untouched") {
    val (table, dir) = freshTable("d")
    seed(dir)
    val before = rows(table)
    intercept[Exception] {
      payload(Seq(("u9", 1L, "nx1")))
        .writeTo(table).overwrite(substring(col("user_id"), 1, 1) === "u")
    }
    assert(before == rows(table))
  }

  test("SQL INSERT INTO ... REPLACE WHERE through the catalog") {
    val (table, dir) = freshTable("e")
    payload(Seq(("u1", 10L, "a1"), ("u2", 20L, "a2"), ("u3", 30L, "a3")))
      .writeTo(table).append()
    spark.sql(s"""INSERT INTO $table REPLACE WHERE user_id = 'u2'
                 SELECT 'u2' AS user_id, CAST(99 AS BIGINT) AS amount,
                        CAST(NULL AS BINARY) AS msg, 'r1' AS sha256sum""")
    assert(rows(table) == Set(
      ("u1", 10L, "a1"), ("u3", 30L, "a3"), ("u2", 99L, "r1")))
  }
}
