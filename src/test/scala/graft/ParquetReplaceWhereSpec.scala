package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** REPLACE WHERE on catalog parquet tables
  * ([[ParquetReplaceWriteBuilder]]): payload through Spark's own
  * parquet write, retirement through the footer-stats classify, one
  * ledger publish on versioned tables. */
class ParquetReplaceWhereSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def freshTable(tag: String): (String, String) = {
    val wh = Files.createTempDirectory(s"graft_pqow_$tag").toString
    spark.conf.set(s"spark.sql.catalog.graft_pow$tag", "graft.sources.LogCatalog")
    spark.conf.set(s"spark.sql.catalog.graft_pow$tag.warehouse", wh)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS graft_pow$tag.lake")
    spark.sql(s"""CREATE TABLE graft_pow$tag.lake.t
                  (k BIGINT, part STRING, v BIGINT)""")
    (s"graft_pow$tag.lake.t", s"$wh/lake/t")
  }

  private def payload(rows: Seq[(Long, String, Long)]) = {
    import spark.implicits._
    rows.toDF("k", "part", "v").repartition(1)
  }

  /** Two single-file appends with disjoint `part` values (footer
    * bounds make one provably clean for a `part='a'` condition). */
  private def seed(table: String): Unit = {
    payload(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L)))
      .writeTo(table).append()
    payload(Seq((4L, "b", 40L), (5L, "b", 50L)))
      .writeTo(table).append()
  }

  private def rows(table: String): Set[(Long, String, Long)] =
    spark.table(table).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private def dataFiles(dir: String): Set[String] =
    ParquetVersions.listing(dir).toSet

  test("replace-where retires the matching slice, clean files untouched") {
    val (table, dir) = freshTable("a")
    seed(table)
    val before = dataFiles(dir)
    assert(before.size == 2)
    // payload rows match the condition themselves — the fence must keep
    // them out of the retirement's inputs
    payload(Seq((7L, "a", 70L), (8L, "a", 80L)))
      .writeTo(table).overwrite(col("part") === "a")
    assert(rows(table) == Set(
      (4L, "b", 40L), (5L, "b", 50L), (7L, "a", 70L), (8L, "a", 80L)))
    val after = dataFiles(dir)
    // the all-"b" file is footer-provably clean: exact name survives
    assert((before intersect after).size == 1)
  }

  test("partial-file replace rewrites survivors exactly") {
    val (table, dir) = freshTable("b")
    // one file straddles the condition
    payload(Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L)))
      .writeTo(table).append()
    payload(Seq((9L, "c", 90L))).writeTo(table).overwrite(col("part") === "a")
    assert(rows(table) == Set((2L, "b", 20L), (9L, "c", 90L)))
  }

  test("versioned table: ONE atomic version; pre-state exact via VERSION AS OF") {
    val (table, dir) = freshTable("c")
    seed(table)
    val v1 = ParquetVersions.enable(dir)
    val beforeRows = rows(table)
    payload(Seq((7L, "a", 70L)))
      .writeTo(table).overwrite(col("part") === "a")
    val (latest, _) = ParquetVersions.latest(dir).get
    assert(latest == v1 + 1) // retire + rewrite + payload in one publish
    assert(rows(table) == Set((4L, "b", 40L), (5L, "b", 50L), (7L, "a", 70L)))
    val pinned = spark.sql(s"SELECT * FROM $table VERSION AS OF $v1").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(pinned == beforeRows)
  }

  test("v2 truncate is history-preserving on a versioned table") {
    val (table, dir) = freshTable("d")
    seed(table)
    val v1 = ParquetVersions.enable(dir)
    payload(Seq((99L, "z", 990L))).writeTo(table).overwrite(lit(true))
    assert(rows(table) == Set((99L, "z", 990L)))
    val pinned = spark.sql(s"SELECT count(*) AS n FROM $table VERSION AS OF $v1")
      .collect()(0).getLong(0)
    assert(pinned == 5L)
  }

  test("unsupported replace condition fails at planning, table untouched") {
    val (table, dir) = freshTable("e")
    seed(table)
    val before = rows(table)
    intercept[Exception] {
      payload(Seq((9L, "x", 90L)))
        .writeTo(table).overwrite(length(col("part")) === 1)
    }
    assert(rows(table) == before)
  }

  test("SQL INSERT INTO ... REPLACE WHERE on a parquet catalog table") {
    val (table, dir) = freshTable("f")
    seed(table)
    spark.sql(s"""INSERT INTO $table REPLACE WHERE part = 'b'
                  SELECT CAST(11 AS BIGINT) AS k, 'b' AS part,
                         CAST(110 AS BIGINT) AS v""")
    assert(rows(table) == Set(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (11L, "b", 110L)))
  }
}
