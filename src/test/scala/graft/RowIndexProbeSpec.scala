package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class RowIndexProbeSpec extends AnyFunSuite {
  lazy val spark = graft.Sessions.base("local[4]", 4)

  test("public _metadata.row_index works on plain parquet reads with filters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rowidx").toString
    spark.range(0, 1000).selectExpr("id AS k", "id*2 AS v").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(col("k"), col("_metadata.row_index").as("pos"))
      .filter(col("k") >= 990)
    val rows = df.as[(Long, Long)].collect().sortBy(_._1)
    println(rows.toSeq)
    assert(rows.forall { case (k, p) => k == p }, "position == write ordinal")
  }

  test("temp row-index column through the explicit read schema") {
    val dir = java.nio.file.Files.createTempDirectory("rowidx2").toString
    spark.range(0, 100).selectExpr("id AS k").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val tmp = org.apache.spark.sql.execution.datasources.parquet
      .ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME
    val schema = StructType(Seq(StructField("k", LongType),
      StructField(tmp, LongType)))
    val out = spark.read.schema(schema).parquet(dir)
      .filter(col("k") > 95).collect()
    println(out.toSeq)
    assert(out.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
