package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The persisted `.fstats` sidecar ([[ParquetFooterStats]]): a fresh
  * driver's selective plan reads one manifest instead of opening
  * O(files) footers (VERDICT r10 #3 — the parquet tier's analogue of
  * the log tier's per-commit stats manifests). */
class StatsSidecarSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_fstats_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_fst", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_fst.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_fst.lake")
    s
  }

  test("cold session plans a selective probe with ZERO footer opens") {
    spark.sql("DROP TABLE IF EXISTS graft_fst.lake.t")
    spark.sql("CREATE TABLE graft_fst.lake.t (id BIGINT, score BIGINT)")
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100).selectExpr("id", "id * 2 AS score")
        .coalesce(1).writeTo("graft_fst.lake.t").append()
    }
    val probe = "SELECT sum(score) AS s FROM graft_fst.lake.t WHERE id BETWEEN 150 AND 160"
    val expect = (150L to 160L).map(_ * 2).sum
    // FIRST plan (no sidecar yet): opens footers, learns the stats,
    // persists them
    assert(spark.sql(probe).head.getLong(0) === expect)
    val sidecar = new Path(s"$warehouse/lake/t", ".fstats")
    val fs = sidecar.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(sidecar), "plan must persist the stats it learned")
    // simulate a FRESH driver: forget every in-memory footer (the
    // counter is scoped to this table so parallel suites can't inflate it)
    val under = s"$warehouse/lake/t"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(probe).head.getLong(0) === expect)
    assert(ParquetFooterStats.footerReadsUnder(under) === before,
      "cold planning must be served by the sidecar, zero footer opens")
    // pruning still effective through the sidecar: only 1 of 4 files kept
    val (kept, total) = StatsPrunedFileIndex.lastListing.get(s"$warehouse/lake/t/data")
    assert(total === 4 && kept === 1, s"kept=$kept total=$total")
  }

  test("new appends miss the sidecar, get opened once, then join it") {
    spark.range(1000, 1100).selectExpr("id", "id * 2 AS score")
      .coalesce(1).writeTo("graft_fst.lake.t").append()
    val under = s"$warehouse/lake/t"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(under)
    val probe = "SELECT count(*) AS c FROM graft_fst.lake.t WHERE id >= 1000"
    assert(spark.sql(probe).head.getLong(0) === 100)
    val opened1 = ParquetFooterStats.footerReadsUnder(under) - before
    assert(opened1 === 1, s"only the new file may be opened, got $opened1")
    // and after that plan, the sidecar covers it too
    ParquetFooterStats.clearCacheForTesting()
    val b2 = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(probe).head.getLong(0) === 100)
    assert(ParquetFooterStats.footerReadsUnder(under) === b2)
  }

  test("a stale sidecar entry is ignored, corrected, and never wrong") {
    spark.sql("DROP TABLE IF EXISTS graft_fst.lake.s")
    spark.sql("CREATE TABLE graft_fst.lake.s AS SELECT id FROM range(10)")
    spark.sql("SELECT count(*) FROM graft_fst.lake.s WHERE id = 3").collect()
    val dir = s"$warehouse/lake/s"
    // corrupt the sidecar wholesale — planning must shrug it off
    val p = new Path(dir, ".fstats")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true); out.write("NOT JSON".getBytes); out.close()
    assert(spark.sql("SELECT count(*) AS c FROM graft_fst.lake.s WHERE id = 3")
      .head.getLong(0) === 1)
  }
}
