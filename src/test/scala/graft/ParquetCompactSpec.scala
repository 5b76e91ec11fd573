package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Compaction, StatsPrunedFileIndex}

/** In-place compaction of catalog parquet tables must shrink the file
  * count without changing a single row, keep footer-stats skipping
  * alive at the coarser granularity, and survive a crash at any point
  * of the generation swap. */
class ParquetCompactSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_cp", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_cp.warehouse", warehouse)
    s
  }

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_cp_wh").toString

  private def fs = new Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** 8 range-disjoint small files via 8 separate INSERTs. */
  private def freshTable(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cp.lake")
    spark.sql(s"CREATE TABLE graft_cp.lake.$name (id BIGINT, v STRING)")
    (0 until 8).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), format_string("v%04d", col("id")).as("v"))
        .repartition(1)
        .writeTo(s"graft_cp.lake.$name").append()
    }
    s"$warehouse/lake/$name"
  }

  private def dataFiles(dir: String): Seq[String] =
    fs.listStatus(new Path(dir, "data"))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSeq

  private def rowsOf(table: String): Seq[(Long, String)] =
    spark.table(s"graft_cp.lake.$table").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  test("pairwise bin-pack halves the file count, rows byte-identical, skipping intact") {
    val dir = freshTable("t1")
    val before = rowsOf("t1")
    val oneFile = fs.listStatus(new Path(dir, "data"))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).max
    val stats = Compaction.compactTable(spark, dir, targetBytes = oneFile * 2 + 64)
    assert(stats.filesBefore === 8 && stats.filesAfter === 4)
    assert(dataFiles(dir).size === 4)
    assert(rowsOf("t1") === before)
    // adjacent (write-order) packing keeps ranges compact: a point
    // probe opens exactly one merged file
    StatsPrunedFileIndex.lastListing.remove(s"$dir/data")
    assert(spark.sql(
      "SELECT * FROM graft_cp.lake.t1 WHERE id = 250").count() === 1)
    assert(StatsPrunedFileIndex.lastListing.get(s"$dir/data") === ((1, 4)))
  }

  test("big target compacts to one file; large files hardlink untouched on re-run") {
    val dir = freshTable("t2")
    val before = rowsOf("t2")
    val s1 = Compaction.compactTable(spark, dir)
    assert(s1.filesAfter === 1)
    assert(rowsOf("t2") === before)
    // second run: the single large-enough file is linked, not rewritten
    val nameBefore = dataFiles(dir)
    val s2 = Compaction.compactTable(spark, dir)
    assert(s2.filesBefore === 1 && s2.filesAfter === 1)
    assert(dataFiles(dir) === nameBefore)
    assert(rowsOf("t2") === before)
  }

  test("crash after build, before swap: stale data.next is discarded") {
    val dir = freshTable("t3")
    val before = rowsOf("t3")
    fs.mkdirs(new Path(dir, "data.next"))
    spark.range(5).write.parquet(s"$dir/data.next/.junk")
    assert(rowsOf("t3") === before) // loadTable repairs: next dropped
    assert(!fs.exists(new Path(dir, "data.next")))
  }

  test("crash mid-swap with complete next generation: promoted on next load") {
    val dir = freshTable("t4")
    val before = rowsOf("t4")
    Compaction.compactTable(spark, dir) // → 1 file
    // manufacture the half-swapped crash state: data → data.prev done,
    // data.next complete (with marker), data missing
    fs.rename(new Path(dir, "data"), new Path(dir, "data.next"))
    fs.create(new Path(dir, "data.next/_COMPACT_SUCCESS"), true).close()
    spark.range(3).select(col("id"), lit("stale").as("v"))
      .write.parquet(s"$dir/data.prev")
    assert(rowsOf("t4") === before) // repair promotes next, drops prev
    assert(!fs.exists(new Path(dir, "data.prev")))
  }

  test("crash after data moved aside, next NOT complete: prev generation restored") {
    val dir = freshTable("t5")
    val before = rowsOf("t5")
    fs.rename(new Path(dir, "data"), new Path(dir, "data.prev"))
    fs.mkdirs(new Path(dir, "data.next")) // no _COMPACT_SUCCESS
    assert(rowsOf("t5") === before) // repair restores prev
    assert(!fs.exists(new Path(dir, "data.next")))
  }

  test("z-ordered table stays skippable on both dimensions after compaction") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cp.lake")
    spark.sql("CREATE TABLE graft_cp.lake.tz (x BIGINT, y BIGINT, id BIGINT)")
    val grid = spark.range(10000).select(
      (col("id") % 100).as("x"), ((col("id") / 100) % 100).as("y"), col("id"))
    graft.operators.Layout.zorder(grid, Seq("x", "y"), files = 16)
      .writeTo("graft_cp.lake.tz").append()
    val dir = s"$warehouse/lake/tz"
    val oneFile = fs.listStatus(new Path(dir, "data"))
      .filter(_.getPath.getName.endsWith(".parquet")).map(_.getLen).max
    val stats = Compaction.compactTable(spark, dir, targetBytes = oneFile * 2 + 256)
    assert(stats.filesAfter < stats.filesBefore)
    def kept(cond: String): (Int, Int) = {
      StatsPrunedFileIndex.lastListing.remove(s"$dir/data")
      spark.sql(s"SELECT * FROM graft_cp.lake.tz WHERE $cond").count()
      StatsPrunedFileIndex.lastListing.get(s"$dir/data")
    }
    val (kx, tx) = kept("x BETWEEN 10 AND 15")
    assert(kx < tx, s"x-probe kept $kx of $tx after compaction")
    val (ky, ty) = kept("y BETWEEN 80 AND 85")
    assert(ky < ty, s"y-probe kept $ky of $ty after compaction")
  }

  test("bins mixing pre- and post-ALTER files keep the added column's values") {
    // ADVICE r8 (high): a bin whose sampled footer is a pre-ALTER file
    // must not silently null out the added column in the merged output
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cp.lake")
    spark.sql("CREATE TABLE graft_cp.lake.ta (id BIGINT, v STRING)")
    (0 until 4).foreach { i =>
      spark.range(i * 10, i * 10 + 10)
        .select(col("id"), format_string("v%02d", col("id")).as("v"))
        .repartition(1).writeTo("graft_cp.lake.ta").append()
    }
    spark.sql("ALTER TABLE graft_cp.lake.ta ADD COLUMN w BIGINT")
    (4 until 8).foreach { i =>
      spark.range(i * 10, i * 10 + 10)
        .select(col("id"), format_string("v%02d", col("id")).as("v"),
          (col("id") * 7).as("w"))
        .repartition(1).writeTo("graft_cp.lake.ta").append()
    }
    val dir = s"$warehouse/lake/ta"
    def snapshot(): Seq[(Long, String, Any)] =
      spark.table("graft_cp.lake.ta").collect()
        .map(r => (r.getLong(0), r.getString(1), r.get(2))).sortBy(_._1).toSeq
    val before = snapshot()
    assert(before.count(_._3 != null) === 40) // post-ALTER rows carry w
    // compact everything into one bin: it necessarily mixes old and new
    val stats = Compaction.compactTable(spark, dir)
    assert(stats.filesAfter === 1)
    assert(snapshot() === before)
  }
}
