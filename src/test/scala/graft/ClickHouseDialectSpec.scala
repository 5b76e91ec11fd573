package graft

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ClickHouseDialect
import graft.streaming.{AnsiMergeIdiom, ClickHouseMergeIdiom, MergeIdiom}

/** The ClickHouse JDBC tier, pinned without a live server: dialect
  * resolution by URL, the SURVEY §1.2 unsigned-type widening, DDL type
  * generation, identifier quoting, and the stage→target SQL idiom.
  * Embedded Derby (JdbcBatcherSpec) remains the live round-trip
  * stand-in for the shared step sequence. */
class ClickHouseDialectSpec extends AnyFunSuite {

  ClickHouseDialect.register()

  test("dialect registration: jdbc:clickhouse URLs resolve to the dialect") {
    assert(JdbcDialects.get("jdbc:clickhouse://ch:8123/default") eq ClickHouseDialect)
    assert(JdbcDialects.get("JDBC:ClickHouse://ch:8123/default") eq ClickHouseDialect)
    assert(!(JdbcDialects.get("jdbc:derby:memory:x") eq ClickHouseDialect))
  }

  test("read-side widening: unsigned types land in the smallest exact Catalyst container") {
    def cat(t: String) =
      ClickHouseDialect.getCatalystType(java.sql.Types.OTHER, t, 0, new MetadataBuilder)
    assert(cat("UInt8") === Some(ShortType))
    assert(cat("UInt16") === Some(IntegerType))
    assert(cat("UInt32") === Some(LongType))           // amount, hashes_test.go:146
    assert(cat("UInt64") === Some(DecimalType(20, 0))) // COUNT(*) results
    assert(cat("Nullable(UInt32)") === Some(LongType))
    assert(cat("UInt256") === Some(DecimalType(38, 0)))
    assert(cat("DateTime64(3)") === Some(TimestampType))
    assert(cat("Date32") === Some(DateType))
    assert(cat("Int64") === None) // signed: JDBC default is already exact
    assert(cat("String") === None)
  }

  test("write-side DDL: Catalyst types emit ClickHouse type names") {
    def ddl(dt: DataType) = ClickHouseDialect.getJDBCType(dt).map(_.databaseTypeDefinition)
    assert(ddl(StringType) === Some("String"))
    assert(ddl(BinaryType) === Some("String")) // byte-string: msg round-trips
    assert(ddl(LongType) === Some("Int64"))
    assert(ddl(IntegerType) === Some("Int32"))
    assert(ddl(DoubleType) === Some("Float64"))
    assert(ddl(TimestampType) === Some("DateTime64(3)"))
    assert(ddl(DecimalType(20, 0)) === Some("Decimal(20, 0)"))
  }

  test("identifier quoting: backticks, escaped") {
    assert(ClickHouseDialect.quoteIdentifier("user_id") === "`user_id`")
    assert(ClickHouseDialect.quoteIdentifier("we`ird") === "`we``ird`")
  }

  test("merge idiom selection by URL") {
    assert(MergeIdiom.forUrl("jdbc:clickhouse://ch/d") === ClickHouseMergeIdiom)
    assert(MergeIdiom.forUrl("jdbc:derby:memory:x") === AnsiMergeIdiom)
    assert(MergeIdiom.forUrl("jdbc:postgresql://p/d") === AnsiMergeIdiom)
  }

  test("ClickHouse idiom: anti-join INSERT (no MERGE), lightweight DELETE, backticks") {
    val sql = ClickHouseMergeIdiom.merge("limits_hashes", "limits_hashes_stage",
      Seq("sha256sum"), Seq("user_id", "amount", "msg", "sha256sum"))
    assert(sql.contains("INSERT INTO limits_hashes"))
    assert(sql.contains("LEFT ANTI JOIN limits_hashes AS t"))
    assert(sql.contains("s.`sha256sum` = t.`sha256sum`"))
    assert(!sql.toUpperCase.contains("MERGE INTO"), "ClickHouse has no MERGE statement")
    assert(sql.contains("(`user_id`, `amount`, `msg`, `sha256sum`)"))
    val del = ClickHouseMergeIdiom.deleteStaged("limits_hashes_stage", 7L)
    assert(del === "DELETE FROM limits_hashes_stage WHERE `batch_id` = 7")
  }

  test("ANSI idiom: unchanged MERGE shape with double-quoted identifiers (Derby-proven)") {
    val sql = AnsiMergeIdiom.merge("t1", "t1_stage", Seq("k"), Seq("k", "v"))
    assert(sql.contains("MERGE INTO t1 t USING t1_stage s ON (t.\"k\" = s.\"k\")"))
    assert(sql.contains("WHEN NOT MATCHED THEN INSERT (\"k\", \"v\") VALUES (s.\"k\", s.\"v\")"))
    assert(AnsiMergeIdiom.deleteStaged("t1_stage", 3L) ===
      "DELETE FROM t1_stage WHERE \"batch_id\" = 3")
  }
}
