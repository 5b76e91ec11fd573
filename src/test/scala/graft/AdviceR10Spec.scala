package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Regression coverage for the round-10 ADVICE findings:
  *
  *   1. `ACCEPT_ANY_SCHEMA` no longer leaks through
  *      [[CatalogParquetTable.capabilities]] — a mismatched
  *      `INSERT INTO t SELECT …` is an analysis error, not silent
  *      null-column corruption.
  *   2. RTAS/ALTER schema changes are atomic with the version publish:
  *      the ledger's embedded schema wins over a stale `_schema.json`
  *      (crash window between publish and manifest swap), and loadTable
  *      read-repairs the manifest.
  *   3. The ledger payload cache is invalidated on drop/enable, so a
  *      dropped-and-recreated table at the same path serves the NEW
  *      membership.
  *   4. Unknown metadata suffixes under a table keep the not-exists
  *      contract (`tableExists` false, `DROP TABLE IF EXISTS` no-op).
  */
class AdviceR10Spec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_adv10_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_adv", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_adv.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_adv.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("INSERT with mismatched output is an analysis error, not silent nulls") {
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.strict")
    spark.sql("CREATE TABLE graft_adv.lake.strict (id BIGINT, name STRING, score DOUBLE)")
    // wrong arity
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft_adv.lake.strict SELECT 1L, 'a'")
    }
    assert(e1.getMessage.toLowerCase.contains("column"), e1.getMessage)
    // incompatible type (string into double without a safe cast)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("INSERT INTO graft_adv.lake.strict " +
        "SELECT 1L, 'a', named_struct('x', 1)")
    }
    // a correct insert still works, and by-position casts still apply
    spark.sql("INSERT INTO graft_adv.lake.strict SELECT 2, 'b', 3")
    val row = spark.table("graft_adv.lake.strict").collect().head
    assert(row.getLong(0) === 2L && row.getString(1) === "b" &&
      row.getDouble(2) === 3.0)
  }

  test("ledger-embedded schema wins over a stale manifest and is read-repaired") {
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.sch")
    spark.sql("CREATE TABLE graft_adv.lake.sch AS SELECT id, id * 2 AS v FROM range(10)")
    val dir = s"$warehouse/lake/sch"
    spark.sql("CALL graft_adv.system.enable_versioning(table => 'lake.sch')")
    // RTAS with a redeclared schema embeds it in the publish
    spark.sql("REPLACE TABLE graft_adv.lake.sch AS " +
      "SELECT id, CAST(id AS STRING) AS tag FROM range(5)")
    val declared = SchemaManifest.readJson(dir)
    assert(declared.contains("tag"))
    assert(VersionLedger.latestSchema(dir).contains(declared))
    // simulate the crash window: revert the manifest FILE to the old
    // schema — readers must still see the ledger's schema…
    val stale = """{"type":"struct","fields":[
      {"name":"id","type":"long","nullable":true,"metadata":{}},
      {"name":"v","type":"long","nullable":true,"metadata":{}}]}"""
    SchemaManifest.repair(dir, stale)
    assert(SchemaManifest.readJson(dir) === declared, "ledger schema must win")
    // …and loadTable must repair the manifest cache in passing
    spark.sessionState.catalogManager.catalog("graft_adv")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(
        Array("lake"), "sch"))
    assert(SchemaManifest.manifestJson(dir) === declared, "manifest repaired")
    val cols = spark.table("graft_adv.lake.sch").columns.toSeq
    assert(cols === Seq("id", "tag"))
  }

  test("ALTER on a versioned table publishes the schema through the ledger") {
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.alt")
    spark.sql("CREATE TABLE graft_adv.lake.alt AS SELECT id FROM range(3)")
    val dir = s"$warehouse/lake/alt"
    spark.sql("CALL graft_adv.system.enable_versioning(table => 'lake.alt')")
    val before = ParquetVersions.latest(dir).get._1
    spark.sql("ALTER TABLE graft_adv.lake.alt ADD COLUMN note STRING")
    val (after, names) = ParquetVersions.latest(dir).get
    assert(after === before + 1, "ALTER publishes one schema commit")
    assert(VersionLedger.latestSchema(dir).exists(_.contains("note")))
    assert(names === ParquetVersions.get(dir, before).get, "membership unchanged")
    assert(spark.table("graft_adv.lake.alt").columns.toSeq === Seq("id", "note"))
  }

  test("drop-and-recreate at the same path serves the fresh membership") {
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.recreate")
    spark.sql("CREATE TABLE graft_adv.lake.recreate AS SELECT id FROM range(4)")
    val dir = s"$warehouse/lake/recreate"
    spark.sql("CALL graft_adv.system.enable_versioning(table => 'lake.recreate')")
    val old = ParquetVersions.latest(dir).get._2
    assert(old.nonEmpty)
    spark.sql("DROP TABLE graft_adv.lake.recreate")
    spark.sql("CREATE TABLE graft_adv.lake.recreate AS SELECT id FROM range(7)")
    spark.sql("CALL graft_adv.system.enable_versioning(table => 'lake.recreate')")
    val fresh = ParquetVersions.latest(dir).get._2
    assert(fresh.nonEmpty && fresh != old, "stale cached payload served")
    assert(spark.table("graft_adv.lake.recreate").count() === 7)
  }

  test("unknown metadata suffix keeps the not-exists contract") {
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.meta")
    spark.sql("CREATE TABLE graft_adv.lake.meta AS SELECT id FROM range(2)")
    // probe-style calls must see not-exists, not a loud internal error
    spark.sql("DROP TABLE IF EXISTS graft_adv.lake.meta.bogus") // no-op, no throw
    assert(!spark.catalog.tableExists("graft_adv.lake.meta.bogus"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.table("graft_adv.lake.meta.bogus").collect()
    }
    assert(e.getMessage.contains("bogus"), e.getMessage)
    // the real suffixes still resolve
    assert(spark.table("graft_adv.lake.meta.files").count() >= 1)
  }
}
