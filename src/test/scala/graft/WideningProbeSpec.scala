package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Mechanics probe: which physical→declared parquet type widenings
  * Spark 4.1's readers serve natively (SPARK-40876 family). The ALTER
  * COLUMN TYPE allowlist ([[LogCatalog]]) must match exactly what the
  * runtime can actually read — a widening the reader rejects would
  * brick every scan of the table's old files. */
class WideningProbeSpec extends AnyFunSuite {

  private lazy val spark = graft.Sessions.base("local[4]", 4)

  private def roundTrip(writeExpr: String, readType: String): Seq[String] = {
    val dir = Files.createTempDirectory("graft_widen").toString
    spark.range(3).selectExpr(s"$writeExpr AS c").write.mode("overwrite").parquet(dir)
    spark.read.schema(s"c $readType").parquet(dir)
      .collect().map(r => String.valueOf(r.get(0))).toSeq.sorted
  }

  test("int32 file reads under BIGINT schema") {
    assert(roundTrip("CAST(id AS INT)", "BIGINT") === Seq("0", "1", "2"))
  }

  test("smallint file reads under INT schema") {
    assert(roundTrip("CAST(id AS SHORT)", "INT") === Seq("0", "1", "2"))
  }

  test("float file reads under DOUBLE schema") {
    assert(roundTrip("CAST(id AS FLOAT)", "DOUBLE") === Seq("0.0", "1.0", "2.0"))
  }

  test("int32 file reads under DOUBLE schema") {
    assert(roundTrip("CAST(id AS INT)", "DOUBLE") === Seq("0.0", "1.0", "2.0"))
  }

  test("decimal(9,2) file reads under DECIMAL(18,2) schema") {
    assert(roundTrip("CAST(id AS DECIMAL(9,2))", "DECIMAL(18,2)") ===
      Seq("0.00", "1.00", "2.00"))
  }

  test("date file reads under TIMESTAMP_NTZ schema") {
    val dir = Files.createTempDirectory("graft_widen").toString
    spark.range(1).selectExpr("DATE'2024-03-05' AS c").write.mode("overwrite").parquet(dir)
    val got = spark.read.schema("c TIMESTAMP_NTZ").parquet(dir).collect()
    assert(got.map(r => String.valueOf(r.get(0))).toSeq === Seq("2024-03-05T00:00"))
  }
}
