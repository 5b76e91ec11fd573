package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL UPDATE / MERGE INTO / group-rewrite DELETE on catalog PARQUET
  * tables ([[ParquetRowLevelOperation]]): copy-on-write with runtime
  * `_file` group filtering — untouched files keep their exact names,
  * the pre-operation version still reads exact, and footer-unprovable
  * DELETE predicates fall back to the rewrite instead of failing. */
class ParquetRowLevelSpec extends AnyFunSuite {

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_prl_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_prl", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_prl.warehouse", warehouse)
    s
  }

  private def dataFiles(name: String): Set[String] = {
    val data = new Path(s"$warehouse/lake/$name/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(data)) Set.empty
    else fs.listStatus(data).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
  }

  /** 6 range-disjoint files, ids [i*100, i*100+100). */
  private def mkTable(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_prl.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_prl.lake.$name")
    spark.sql(s"CREATE TABLE graft_prl.lake.$name (id BIGINT, score BIGINT)")
    (0 until 6).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") * 3).as("score"))
        .repartition(1)
        .writeTo(s"graft_prl.lake.$name").append()
    }
    s"graft_prl.lake.$name"
  }

  test("UPDATE rewrites only the files the runtime group filter proves") {
    val t = mkTable("u1")
    val before = dataFiles("u1")
    assert(before.size === 6)
    // touches ids 150..249 → exactly files 1 and 2 hold matching rows
    spark.sql(s"UPDATE $t SET score = score + 1000000 WHERE id >= 150 AND id < 250")
    val after = ParquetVersions.live(s"$warehouse/lake/u1").toSet
    // 4 untouched files keep their exact names; 2 replaced
    assert(before.intersect(after).size === 4)
    assert(after.count(_.startsWith("rlo-")) >= 1)
    val got = spark.table(t).agg(
      sum(when(col("score") >= 1000000, 1).otherwise(0)).as("updated"),
      sum("score").as("total")).collect()(0)
    assert(got.getLong(0) === 100L)
    val expectedTotal = (0L until 600L).map(_ * 3).sum + 100L * 1000000L
    assert(got.getLong(1) === expectedTotal)
    // the auto-upgrade pinned v1 = pre-update state
    assert(spark.sql(s"SELECT sum(score) AS s FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0) === (0L until 600L).map(_ * 3).sum)
  }

  test("MERGE INTO: matched update + not-matched insert, one commit") {
    val t = mkTable("m1")
    spark.range(550, 650).select(col("id"), lit(7L).as("score"))
      .createOrReplaceTempView("prl_source")
    spark.sql(s"""
      MERGE INTO $t x USING prl_source s ON x.id = s.id
      WHEN MATCHED THEN UPDATE SET x.score = s.score
      WHEN NOT MATCHED THEN INSERT (id, score) VALUES (s.id, s.score)""")
    assert(spark.table(t).count() === 650)
    assert(spark.table(t).filter(col("score") === 7L).count() === 100)
    // untouched files (ids < 500) kept their names
    val after = ParquetVersions.live(s"$warehouse/lake/m1").toSet
    assert(after.count(!_.startsWith("rlo-")) === 5)
  }

  test("footer-unprovable DELETE predicate falls back to group rewrite") {
    val t = mkTable("d1")
    // id % 7 = 0 is not provable from min/max footer stats —
    // canDeleteWhere declines and the row-level rewrite takes over
    spark.sql(s"DELETE FROM $t WHERE id % 7 = 0")
    val expect = (0L until 600L).filterNot(_ % 7 == 0)
    assert(spark.table(t).count() === expect.length.toLong)
    assert(spark.table(t).agg(sum("id")).collect()(0).getLong(0) === expect.sum)
  }

  test("UPDATE on an already-versioned table keeps older snapshots exact") {
    val t = mkTable("u2")
    ParquetVersions.enable(s"$warehouse/lake/u2")
    spark.sql(s"UPDATE $t SET score = 0 WHERE id < 100")
    spark.sql(s"UPDATE $t SET score = 1 WHERE id < 50")
    // v1 = load, then catch-up/commit pairs per update; the PRE-update
    // snapshot still reads the original scores
    assert(spark.sql(s"SELECT sum(score) AS s FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0) === (0L until 600L).map(_ * 3).sum)
    val cur = spark.table(t)
      .agg(sum(when(col("score") === 1, 1).otherwise(0)),
        sum(when(col("score") === 0, 1).otherwise(0))).collect()(0)
    assert(cur.getLong(0) === 50L && cur.getLong(1) === 50L)
  }

  test("row-level ops are rejected on a time-travel snapshot") {
    val t = mkTable("u3")
    ParquetVersions.enable(s"$warehouse/lake/u3")
    spark.sql(s"DELETE FROM $t WHERE id < 100")
    val err = intercept[Exception] {
      spark.sql(s"UPDATE $t VERSION AS OF 1 SET score = 0 WHERE id < 10").collect()
    }
    assert(err != null)
  }
}
