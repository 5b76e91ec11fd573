package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format coverage (SURVEY.md §2.2 "Sinks / file formats"):
  * csv, json, orc round-trips with explicit schemas, partitioned parquet
  * writes with partition pruning reaching the scan. */
class FormatsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"
  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("csv round-trip with explicit schema (no inference scan)") {
    val out = tmp("fmt_csv")
    val cust = Tables.customer(spark, dir)
    cust.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.schema(Tables.customer).option("header", "true").csv(out)
    assertSameRows(cust, back)
  }

  test("json round-trip with explicit schema") {
    val out = tmp("fmt_json")
    val nat = Tables.nation(spark, dir)
    nat.write.mode("overwrite").json(out)
    val back = spark.read.schema(Tables.nation).json(out)
    assertSameRows(nat, back)
  }

  test("orc round-trip preserves full lineitem including timestamps") {
    val out = tmp("fmt_orc")
    val li = Tables.lineitem(spark, dir)
    li.write.mode("overwrite").orc(out)
    assertSameRows(li, spark.read.orc(out))
  }

  test("partitioned parquet write + partition pruning reaches the scan") {
    val out = tmp("fmt_part")
    Tables.orders(spark, dir).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(out)
    val q = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("o_orderstatus"), s"pruning missing in:\n$plan")
    // only the F partition directory is read
    val expected = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F").count()
    assert(q.count() === expected)
  }

  test("malformed csv: PERMISSIVE captures corrupt records, FAILFAST raises") {
    val out = tmp("fmt_bad")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out, "bad.csv"),
      "1,alpha\n2,beta\nnot_a_number,gamma\n3,delta\n")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("name", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val permissive = spark.read.schema(schema).option("mode", "PERMISSIVE").csv(out).cache()
    assert(permissive.count() === 4)
    assert(permissive.filter(col("_corrupt_record").isNotNull).count() === 1)
    val failfast = spark.read
      .schema(org.apache.spark.sql.types.StructType(schema.dropRight(1)))
      .option("mode", "FAILFAST").csv(out)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("Dataset.observe collects data-quality metrics in the same pass") {
    val obs = new org.apache.spark.sql.Observation("quality")
    val li = Tables.lineitem(spark, dir)
      .observe(obs, count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(9,2)")).as("qty_sum"),
        count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
    li.write.format("noop").mode("overwrite").save() // one pass, metrics ride along
    val m = obs.get
    assert(m("n").asInstanceOf[Long] === li.count())
    assert(m("n_discounted").asInstanceOf[Long] > 0)
  }

  test("parquet writer honors maxRecordsPerFile (the batch-size knob)") {
    val out = tmp("fmt_cap")
    Tables.orders(spark, dir).coalesce(1).write.mode("overwrite")
      .option("maxRecordsPerFile", 100).parquet(out)
    val perFile = spark.read.parquet(out)
      .groupBy(input_file_name()).count()
      .agg(max("count")).head().getLong(0)
    assert(perFile <= 100)
  }

  test("binaryFile + text sources: raw media/corpus files become typed frames") {
    import spark.implicits._
    // the real-world multimodal ingest path: media lands as FILES, and
    // binaryFile lifts (path, length, content-bytes) into a frame the
    // Multimodal operators consume; text does the same for raw corpora
    val mediaDir = tmp("fmt_bin")
    Seq("alpha" -> "a.bin", "beta-longer" -> "b.bin").foreach { case (body, name) =>
      Files.write(java.nio.file.Paths.get(mediaDir, name), body.getBytes("UTF-8"))
    }
    val media = spark.read.format("binaryFile").load(mediaDir)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("name"),
        col("length"), col("content"))
      .orderBy("name")
      .collect()
    assert(media.map(_.getString(0)).toSeq === Seq("a.bin", "b.bin"))
    assert(media.map(_.getLong(1)).toSeq === Seq(5L, 11L))
    assert(new String(media(0).getAs[Array[Byte]](2), "UTF-8") === "alpha")

    val textDir = tmp("fmt_text")
    Files.write(java.nio.file.Paths.get(textDir, "docs.txt"),
      "line one\nline two\n".getBytes("UTF-8"))
    val lines = spark.read.text(textDir).as[String].collect().sorted
    assert(lines.toSeq === Seq("line one", "line two"))
  }

  test("schema evolution: mergeSchema unifies batches with added columns") {
    import spark.implicits._
    // the ingest reality at scale: a producer adds a field mid-stream;
    // earlier batch files lack the column, later ones carry it
    val out = tmp("fmt_evolve")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$out/batch_id=0")
    Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "v", "score")
      .write.parquet(s"$out/batch_id=1")
    val merged = spark.read.option("mergeSchema", "true")
      .option("basePath", out).parquet(out)
    assert(merged.columns.toSet === Set("id", "v", "score", "batch_id"))
    val rows = merged.orderBy("id")
      .select(col("id"), col("score")).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    assert(rows.take(2).forall(_.isNullAt(1)), "old batches read as null score")
    assert(rows.drop(2).map(_.getDouble(1)).toSeq === Seq(0.5, 0.7))
  }
}
