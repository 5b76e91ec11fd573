package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{AlwaysTrue, EqualTo, Filter, GreaterThan, IsNull, LessThan, Not, Or, StringStartsWith}
import org.scalatest.funsuite.AnyFunSuite

/** Row-level DELETE on the catalog's parquet tables
  * ([[ParquetDelete]]): three-valued footer-stats classification with
  * UNTOUCHED-FILE assertions (ParquetSkipSpec's style — the point is
  * not just the surviving rows but which files were never read or
  * rewritten), null semantics, metadata-only drops, TRUNCATE, and the
  * shared generation-swap crash repair. */
class ParquetDeleteSpec extends AnyFunSuite {

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_pqdel_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_pqdel", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_pqdel.warehouse", warehouse)
    s
  }

  private def fsOf(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(table: String): Set[String] = {
    val data = new Path(s"$warehouse/lake/$table/data")
    val fs = fsOf(data)
    if (!fs.exists(data)) Set.empty
    else fs.listStatus(data).filter(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSet
  }

  /** 8 range-disjoint files, ids [i*100, i*100+100); file 7's score is
    * entirely NULL. Fresh table per test. */
  private def mkTable(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pqdel.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_pqdel.lake.$name")
    spark.sql(s"""CREATE TABLE graft_pqdel.lake.$name
                  (id BIGINT, name STRING, score DOUBLE)""")
    (0 until 8).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"),
          format_string("n%04d", col("id")).as("name"),
          when(lit(i) === 7, lit(null).cast("double"))
            .otherwise(col("id") * 1.5).as("score"))
        .repartition(1)
        .writeTo(s"graft_pqdel.lake.$name").append()
    }
    s"graft_pqdel.lake.$name"
  }

  test("classification: drops never read, clean files hardlinked untouched") {
    val t = mkTable("t1")
    val before = dataFiles("t1")
    assert(before.size === 8)
    // ids < 250: files 0,1 drop whole (max 99/199 < 250, null-free id),
    // file 2 rewrites (0..100 of its rows match), files 3-7 untouched
    val st = ParquetDelete.deleteWhere(spark, s"$warehouse/lake/t1",
      Array[Filter](LessThan("id", 250L)))
    assert(st.dropped === 2L && st.rewritten === 1L && st.untouched === 5L)
    val after = dataFiles("t1")
    // the 5 clean files kept their exact names (hardlinked, not rewritten)
    assert(before.intersect(after).size === 5)
    assert(spark.table(t).count() === 550)
    assert(spark.table(t).agg(min("id")).collect()(0).getLong(0) === 250L)
  }

  test("SQL DELETE through the catalog; NULL predicate rows survive") {
    val t = mkTable("t2")
    // score IS NULL for file 7 (800 rows total, 100 null-score).
    // DELETE WHERE score > 500 removes rows with score strictly >500;
    // NULL-score rows must SURVIVE (predicate is NULL, not TRUE).
    spark.sql(s"DELETE FROM $t WHERE score > 500.0")
    // survivors: score <= 500 (ids 0..333, files 0-3 partially) + all
    // of file 7 (null score). score = id*1.5 → id <= 333
    assert(spark.table(t).count() === 334 + 100)
    assert(spark.table(t).filter(col("score").isNull).count() === 100)
  }

  test("IS NULL delete drops the all-null file without reading it") {
    val t = mkTable("t3")
    val before = dataFiles("t3")
    val st = ParquetDelete.deleteWhere(spark, s"$warehouse/lake/t3",
      Array[Filter](IsNull("score")))
    // file 7 (all-null score) drops on nullCount==rowCount alone;
    // files 0-6 prove nullCount==0 → untouched
    assert(st.dropped === 1L && st.untouched === 7L && st.rewritten === 0L)
    assert(before.intersect(dataFiles("t3")).size === 7)
    assert(spark.table(t).count() === 700)
  }

  test("disjunction and string predicates rewrite exactly") {
    val t = mkTable("t4")
    spark.sql(s"DELETE FROM $t WHERE name LIKE 'n000%' OR id >= 780")
    // n000x covers ids 0..9 (n0000..n0009); ids >= 780 covers 20 rows
    assert(spark.table(t).count() === 800 - 10 - 20)
    spark.sql(s"DELETE FROM $t WHERE id IN (15, 16, 9999)")
    assert(spark.table(t).count() === 768)
  }

  test("NOT and negated-IN shapes are exact (NNF path)") {
    val t = mkTable("t5")
    spark.sql(s"DELETE FROM $t WHERE NOT (id < 790)")
    assert(spark.table(t).count() === 790)
    // NOT IN with a NULL member is never TRUE → deletes nothing
    val st = ParquetDelete.deleteWhere(spark, s"$warehouse/lake/t5",
      Array[Filter](Not(org.apache.spark.sql.sources.In("id",
        Array[Any](5L, null)))))
    assert(spark.table(t).count() === 790)
    assert(st.dropped === 0L && st.rewritten === 0L)
  }

  test("TRUNCATE TABLE is metadata-only: every file drops unread") {
    val t = mkTable("t6")
    val st = ParquetDelete.deleteWhere(spark, s"$warehouse/lake/t6",
      Array[Filter](AlwaysTrue()))
    assert(st.dropped === 8L && st.untouched === 0L && st.rewritten === 0L)
    assert(spark.table(t).count() === 0)
    // table stays writable after truncation (layout survives)
    spark.range(5).select(col("id"), lit("x").as("name"),
      lit(1.0).as("score")).writeTo(t).append()
    assert(spark.table(t).count() === 5)
  }

  test("unsupported shapes make canDeleteWhere decline") {
    val schema = spark.table(mkTable("t7")).schema
    val can = ParquetDelete.supported(schema) _
    assert(can(LessThan("id", 5L)))
    assert(can(Or(EqualTo("name", "n0001"), GreaterThan("id", 3L))))
    assert(can(StringStartsWith("name", "n00")))
    // negation of StartsWith has no exact bound representation
    assert(!can(Not(StringStartsWith("name", "n00"))))
    assert(!can(EqualTo("nope", 1L))) // unknown column
    assert(!can(EqualTo("id", "not-a-long"))) // literal/type mismatch
  }

  test("crash window: half-built data.next is discarded on next load") {
    mkTable("t8")
    val base = new Path(s"$warehouse/lake/t8")
    val fs = fsOf(base)
    // simulate a crash mid-build: data.next exists WITHOUT the marker
    fs.mkdirs(new Path(base, "data.next"))
    fs.create(new Path(base, "data.next/garbage.parquet"), true).close()
    assert(spark.table("graft_pqdel.lake.t8").count() === 800) // repair ran
    assert(!fs.exists(new Path(base, "data.next")))
    // and a delete right after a repaired load works
    spark.sql("DELETE FROM graft_pqdel.lake.t8 WHERE id < 100")
    assert(spark.table("graft_pqdel.lake.t8").count() === 700)
  }

  test("crash window: completed data.next promotes on next load") {
    mkTable("t9")
    val base = new Path(s"$warehouse/lake/t9")
    val fs = fsOf(base)
    // run a delete but crash AFTER the build, before the swap: emulate
    // by building next as the delete would, then yanking data
    val st = ParquetDelete.deleteWhere(spark, s"$warehouse/lake/t9",
      Array[Filter](LessThan("id", 100L)))
    assert(st.dropped === 1L)
    // now simulate the crash state for the NEXT maintenance op: a
    // complete, marked data.next with data gone
    val data = new Path(base, "data")
    val next = new Path(base, "data.next")
    assert(fs.rename(data, next)) // "next" is complete (it IS the live gen)
    fs.create(new Path(next, "_COMPACT_SUCCESS"), true).close()
    assert(spark.table("graft_pqdel.lake.t9").count() === 700) // promoted
    assert(fs.exists(data) && !fs.exists(next))
  }
}
