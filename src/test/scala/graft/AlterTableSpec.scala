package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Schema evolution on catalog parquet tables: nullable ADD (old rows
  * read null), DROP (pruned), rejected rename/retype/resurrection, and
  * the crash-safe `_schema.json` swap. */
class AlterTableSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  private lazy val wh: String = {
    val w = Files.createTempDirectory("graft_alter_wh").toString
    spark.conf.set("spark.sql.catalog.graft_alt", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_alt.warehouse", w)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_alt.lake")
    w
  }

  private def fresh(name: String): String = {
    wh
    spark.sql(s"DROP TABLE IF EXISTS graft_alt.lake.$name")
    spark.sql(s"CREATE TABLE graft_alt.lake.$name (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO graft_alt.lake.$name VALUES (1, 'a'), (2, 'b')")
    s"graft_alt.lake.$name"
  }

  test("ADD COLUMNS: old rows read null, new rows carry values, filters work") {
    val t = fresh("t_add")
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (score BIGINT)")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 30)")
    val got = spark.table(t).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set((1L, "a", None), (2L, "b", None), (3L, "c", Some(30L))))
    // pushed filter on the evolved column: old files (no such column)
    // must be treated conservatively, not wrongly skipped or matched
    val hit = spark.sql(s"SELECT id FROM $t WHERE score = 30").collect().map(_.getLong(0))
    assert(hit.toSeq == Seq(3L))
    assert(spark.sql(s"SELECT id FROM $t WHERE score IS NULL").count() == 2L)
  }

  test("DROP COLUMN prunes everywhere; re-ADD of the same name is rejected") {
    val t = fresh("t_drop")
    spark.sql(s"ALTER TABLE $t DROP COLUMN v")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id"))
    assert(spark.table(t).count() == 2L)
    // old files still carry 'v' bytes — resurrection must be refused
    val e = intercept[Exception](spark.sql(s"ALTER TABLE $t ADD COLUMNS (v STRING)"))
    assert(e.getMessage.contains("resurrect"))
    // a genuinely new name is fine
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (w STRING)")
    assert(spark.table(t).schema.fieldNames.toSeq == Seq("id", "w"))
  }

  test("narrowing retype is rejected (analyzer up-cast gate ahead of " +
      "the catalog's reader-support allowlist)") {
    val t = fresh("t_rej")
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE INT"))
      .getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN v TYPE BIGINT"))
      .getMessage.nonEmpty, "string→bigint is a type CHANGE")
    // an up-cast Spark's analyzer allows but the parquet reader cannot
    // serve over old files must still be refused by the catalog
    assert(intercept[Exception](
      spark.sql(s"ALTER TABLE $t ALTER COLUMN id TYPE DECIMAL(20,0)"))
      .getMessage.contains("widening"))
  }

  test("TYPE WIDENING: old int32 files read under the widened BIGINT " +
      "declared type, straddling the ALTER") {
    wh
    spark.sql("DROP TABLE IF EXISTS graft_alt.lake.t_widen")
    spark.sql("CREATE TABLE graft_alt.lake.t_widen (id BIGINT, score INT)")
    spark.sql("INSERT INTO graft_alt.lake.t_widen VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft_alt.lake.t_widen ALTER COLUMN score TYPE BIGINT")
    assert(spark.table("graft_alt.lake.t_widen").schema("score").dataType ===
      org.apache.spark.sql.types.LongType)
    // new writes land 64-bit; old files stay int32 and read widened
    spark.sql("INSERT INTO graft_alt.lake.t_widen VALUES (3, 5000000000)")
    val got = spark.sql(
      "SELECT id, score FROM graft_alt.lake.t_widen ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 10L), (2L, 20L), (3L, 5000000000L)))
    // filters (incl. footer pruning: int stats vs long probe share the
    // integral domain) stay exact across the mixed physical types
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_alt.lake.t_widen WHERE score > 15")
      .head.getLong(0) === 2L)
    // float→double and decimal precision growth also widen
    spark.sql("ALTER TABLE graft_alt.lake.t_widen ADD COLUMNS (f FLOAT)")
    spark.sql("ALTER TABLE graft_alt.lake.t_widen ALTER COLUMN f TYPE DOUBLE")
    assert(spark.table("graft_alt.lake.t_widen").schema("f").dataType ===
      org.apache.spark.sql.types.DoubleType)
  }

  test("TYPE WIDENING: pushed global MIN/MAX over mixed int32+int64 " +
      "footers is exact (ADVICE r15 probe)") {
    wh
    spark.sql("DROP TABLE IF EXISTS graft_alt.lake.t_wagg")
    spark.sql("CREATE TABLE graft_alt.lake.t_wagg (id BIGINT, score INT)")
    spark.sql("INSERT INTO graft_alt.lake.t_wagg VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft_alt.lake.t_wagg ALTER COLUMN score TYPE BIGINT")
    // a value only BIGINT can carry, in a 64-bit file next to the
    // 32-bit ones — footer-served MIN/MAX must mix the two widths
    spark.sql("INSERT INTO graft_alt.lake.t_wagg VALUES (3, 5000000000), (4, -7)")
    val q = spark.sql(
      "SELECT MIN(score) AS mn, MAX(score) AS mx FROM graft_alt.lake.t_wagg")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregation: [MIN(score), MAX(score)]"),
      s"expected footer-served MIN/MAX; plan was:\n$plan")
    val r = q.head
    assert((r.getLong(0), r.getLong(1)) === (-7L, 5000000000L))
    // the date→timestamp_ntz widening too: footer stats are int32
    // days in old files, int64 micros in new ones
    spark.sql("DROP TABLE IF EXISTS graft_alt.lake.t_wagg2")
    spark.sql("CREATE TABLE graft_alt.lake.t_wagg2 (d DATE)")
    spark.sql("INSERT INTO graft_alt.lake.t_wagg2 VALUES (DATE'2024-03-05')")
    spark.sql("ALTER TABLE graft_alt.lake.t_wagg2 ALTER COLUMN d TYPE TIMESTAMP_NTZ")
    spark.sql("INSERT INTO graft_alt.lake.t_wagg2 VALUES " +
      "(TIMESTAMP_NTZ'2020-01-01 01:02:03'), (TIMESTAMP_NTZ'2030-06-01 00:00:00')")
    val q2 = spark.sql(
      "SELECT MIN(d) AS mn, MAX(d) AS mx FROM graft_alt.lake.t_wagg2")
    val got = q2.collect().map(r2 =>
      (String.valueOf(r2.get(0)), String.valueOf(r2.get(1)))).head
    assert(got === ("2020-01-01T01:02:03", "2030-06-01T00:00"),
      s"plan was:\n${q2.queryExecution.executedPlan}")
  }

  test("TYPE WIDENING refuses mask-referenced and bucket columns") {
    wh
    spark.sql("DROP TABLE IF EXISTS graft_alt.lake.t_wmask")
    spark.sql("CREATE TABLE graft_alt.lake.t_wmask (id BIGINT, score INT)")
    // ONE file holding matching and non-matching rows — the DELETE can
    // neither drop it whole nor zone-prove it clear, so a mask lands
    spark.range(1, 3).selectExpr("id", "CAST(id * 10 AS INT) AS score")
      .coalesce(1).writeTo("graft_alt.lake.t_wmask").append()
    val dir = s"$wh/lake/t_wmask"
    graft.sources.ParquetVersions.enable(dir)
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_alt.lake.t_wmask WHERE score = 10")
    finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    assert(graft.sources.ParquetVersions.masksFor(dir, None).nonEmpty)
    val e = intercept[Exception](spark.sql(
      "ALTER TABLE graft_alt.lake.t_wmask ALTER COLUMN score TYPE BIGINT"))
    assert(e.getMessage.contains("masks"))
  }

  test("entity log tables stay layout-immutable") {
    wh
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_alt.lake.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft_alt.lake.limits ADD COLUMNS (extra STRING)"))
    assert(e.getMessage.contains("immutable"))
  }

  test("interrupted schema swap is read-repaired, never demotes the table") {
    val t = fresh("t_crash")
    val dir = new Path(s"$wh/lake/t_crash")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sf = new Path(dir, "_schema.json")
    val swap = new Path(dir, "_schema.json.swap")
    // simulate: ALTER staged the new schema, deleted main, crashed pre-rename
    val in = fs.open(sf)
    val json = new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    in.close()
    val widened = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
      .add("late", org.apache.spark.sql.types.LongType, nullable = true)
    val out = fs.create(swap, true)
    out.write(widened.json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    fs.delete(sf, false)
    spark.sql(s"REFRESH TABLE $t") // drop any cached resolution
    // loadTable must finish the swap and serve the evolved schema
    assert(spark.table(t).schema.fieldNames.contains("late"))
    assert(fs.exists(sf) && !fs.exists(swap))
  }
}
