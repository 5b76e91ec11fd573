package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `graft.<ns>.<t>.history` / `.files` metadata tables
  * ([[MetaTables]]): ledger and file inventory as SQL relations on
  * both tiers, real-table-wins resolution, internals never exposed. */
class MetaTablesSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_meta_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_mt", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_mt.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mt.lake")
    s
  }

  test("parquet tier: history tracks versions, files tracks retirement") {
    spark.sql("DROP TABLE IF EXISTS graft_mt.lake.pq")
    spark.sql("CREATE TABLE graft_mt.lake.pq (id BIGINT, score BIGINT)")
    (0 until 3).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), (col("id") * 2).as("score"))
        .coalesce(1).writeTo("graft_mt.lake.pq").append()
    }
    val dir = s"$warehouse/lake/pq"
    ParquetVersions.enable(dir) // v1 = 3 files
    // un-versioned history is empty, versioned starts at the enable
    spark.sql("DELETE FROM graft_mt.lake.pq WHERE id < 100") // drops 1 whole
    val hist = spark.sql(
      """SELECT version, files, is_latest FROM graft_mt.lake.pq.history
         ORDER BY version""").collect()
    assert(hist.map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2))).toSeq
      === Seq((1L, 3, false), (2L, 2, true)))
    // publish stamps are real epoch millis
    val stamps = spark.sql(
      "SELECT published_ms FROM graft_mt.lake.pq.history").collect()
      .map(_.getLong(0))
    assert(stamps.forall(_ > 1600000000000L))
    // files: 3 on disk; 2 live; the dropped one referenced-but-retired
    val files = spark.sql(
      """SELECT file, live, referenced FROM graft_mt.lake.pq.files
         ORDER BY file""").collect()
    assert(files.length === 3)
    assert(files.count(_.getBoolean(1)) === 2)
    assert(files.forall(_.getBoolean(2)))
    val retired = files.filter(r => !r.getBoolean(1))
    assert(retired.length === 1 && retired.head.getBoolean(2))
    // metadata tables compose in SQL: join history with live file count
    val joined = spark.sql(
      """SELECT h.version, h.is_latest, f.n_live
         FROM graft_mt.lake.pq.history h
         CROSS JOIN (SELECT count(*) AS n_live FROM graft_mt.lake.pq.files
                     WHERE live) f
         ORDER BY h.version""").collect()
    assert(joined.map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq
      === Seq((1L, false, 2L), (2L, true, 2L)))
  }

  test("log tier: files inventory; un-versioned logs live=all referenced=none") {
    spark.sql("DROP TABLE IF EXISTS graft_mt.lake.lg")
    spark.sql("""CREATE TABLE graft_mt.lake.lg
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    (0 until 2).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select(
          concat(lit("u"), col("id") % 3).as("user_id"),
          col("id").as("amount"),
          lit(null).cast("binary").as("msg"),
          sha2(col("id").cast("string"), 256).as("sha256sum"))
        .coalesce(1).writeTo("graft_mt.lake.lg").append()
    }
    val unv = spark.sql(
      "SELECT live, referenced FROM graft_mt.lake.lg.files").collect()
    assert(unv.nonEmpty && unv.forall(r => r.getBoolean(0) && !r.getBoolean(1)))
    assert(spark.sql("SELECT * FROM graft_mt.lake.lg.history").count() === 0)
    LogVersions.enable(s"$warehouse/lake/lg")
    spark.sql("DELETE FROM graft_mt.lake.lg WHERE user_id = 'u0'")
    val hist = spark.sql(
      """SELECT version, is_latest FROM graft_mt.lake.lg.history
         ORDER BY version""").collect()
    assert(hist.map(r => (r.getLong(0), r.getBoolean(1))).toSeq
      === Seq((1L, false), (2L, true)))
    val files = spark.sql(
      "SELECT live, referenced FROM graft_mt.lake.lg.files").collect()
    assert(files.forall(_.getBoolean(1)), "all segments ledger-referenced")
    assert(files.exists(!_.getBoolean(0)), "the delete retired segments")
  }

  test("a real table named history wins over the metadata suffix") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_mt.lake.pq2")
    spark.sql("DROP TABLE IF EXISTS graft_mt.lake.pq2.history")
    spark.sql("CREATE TABLE graft_mt.lake.pq2.history (id BIGINT)")
    spark.range(7).writeTo("graft_mt.lake.pq2.history").append()
    assert(spark.table("graft_mt.lake.pq2.history").count() === 7)
    assert(spark.table("graft_mt.lake.pq2.history").columns.toSeq === Seq("id"))
  }

  test("unknown suffixes and internals stay unreachable") {
    // graft.lake.pq exists from test 1 (parquet, has data/)
    val e1 = intercept[Exception] {
      spark.sql("SELECT * FROM graft_mt.lake.pq.data").collect()
    }
    assert(e1.getMessage.contains("internal") ||
      e1.getMessage.contains("metadata"), e1.getMessage)
    // unknown suffixes keep the NOT-EXISTS contract (ADVICE r10): the
    // catalog throws NoSuchTableException (with the available-suffixes
    // hint in its message) and the SQL surface reports plain not-found —
    // so probes like tableExists / DROP IF EXISTS stay no-ops
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM graft_mt.lake.pq.manifest").collect()
    }
    assert(e2.getMessage.contains("manifest") &&
      e2.getMessage.toLowerCase.contains("found"), e2.getMessage)
    assert(!spark.catalog.tableExists("graft_mt.lake.pq.manifest"))
    spark.sql("DROP TABLE IF EXISTS graft_mt.lake.pq.manifest") // no-op
  }
}
