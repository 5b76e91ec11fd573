package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `CALL graft.system.zorder_table` ([[ParquetZorder]]): the layout
  * rewrite is content-identical and versioned, pinned readers keep the
  * pre-layout snapshot, and — the point of the exercise — footer-stats
  * pruning fires on BOTH interleaved columns afterwards, where the
  * scattered input pruned on neither. */
class ZorderTableSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_zorder_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_z", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_z.warehouse", warehouse)
    s
  }

  /** 8 files, each holding a SCATTERED slice of both dimensions
    * (id mod-partitioned, score correlated with a different stride) —
    * every file's [min,max] spans nearly the full domain, so footer
    * pruning can drop nothing before the layout runs. */
  private def mkScattered(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_z.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_z.lake.$name")
    spark.sql(s"CREATE TABLE graft_z.lake.$name (id BIGINT, score BIGINT, payload STRING)")
    (0 until 8).foreach { i =>
      // file i holds ids ≡ i (mod 8): min≈i, max≈792+i — full-span bounds
      spark.range(0, 100).select(
        (col("id") * 8 + i).as("id"),
        ((col("id") * 37 + i * 11) % 800).as("score"),
        concat(lit("p"), col("id")).as("payload"))
        .repartition(1)
        .writeTo(s"graft_z.lake.$name").append()
    }
    s"graft_z.lake.$name"
  }

  private def dataDirKey(name: String): String = s"$warehouse/lake/$name/data"

  private def keptOf(name: String, cond: String): (Int, Int, Long) = {
    StatsPrunedFileIndex.lastListing.remove(dataDirKey(name))
    val n = spark.sql(s"SELECT * FROM graft_z.lake.$name WHERE $cond").count()
    val (kept, total) = StatsPrunedFileIndex.lastListing.get(dataDirKey(name))
    (kept, total, n)
  }

  test("zorder_table: content-identical, versioned, and both columns prune afterwards") {
    val t = mkScattered("zt")
    spark.sql("CALL graft_z.system.enable_versioning(table => 'lake.zt')")
    val before = spark.table(t).orderBy("id").collect()

    // scattered baseline: an id range probe keeps every file
    val (k0, n0, _) = keptOf("zt", "id BETWEEN 100 AND 120")
    assert(n0 === 8 && k0 === 8, "scattered layout must defeat pruning")

    val res = spark.sql(
      "CALL graft_z.system.zorder_table(table => 'lake.zt', columns => 'id, score', files => 8)")
      .collect()(0)
    assert(res.getLong(0) === 8L, "files_before")
    assert(res.getLong(1) === 800L, "rows_rewritten")
    assert(res.getLong(2) >= 1L, "files_after")

    // identical content after the rewrite
    assert(spark.table(t).orderBy("id").collect().toSeq === before.toSeq)

    // both interleaved dimensions now prune whole files
    val (k1, n1, c1) = keptOf("zt", "id BETWEEN 100 AND 120")
    assert(n1.toLong === res.getLong(2))
    assert(k1 < n1, s"id probe must skip files after zorder ($k1/$n1)")
    assert(c1 === 21)
    val (k2, n2, c2) = keptOf("zt", "score BETWEEN 100 AND 120")
    assert(k2 < n2, s"score probe must skip files after zorder ($k2/$n2)")
    assert(c2 === spark.table(t).where("score BETWEEN 100 AND 120").count())

    // the pre-layout snapshot is still pinned-readable, bit-exact
    val v1 = spark.sql(s"SELECT * FROM graft_z.lake.zt VERSION AS OF 1")
    assert(v1.orderBy("id").collect().toSeq === before.toSeq)
  }

  test("zorder outputs are maintenance-named: a crashed run's orphans stay invisible") {
    // Regression: "zorder-" was missing from ParquetVersions'
    // maintenance namespace, so a renamed-but-unpublished zorder file
    // was classified as an un-published APPEND — every row served
    // twice in the rename-to-publish window, and a crashed run's
    // orphans permanently live and unvacuumable.
    val t = mkScattered("zc")
    val dir = s"$warehouse/lake/zc"
    ParquetVersions.enable(dir)
    val before = spark.table(t).count()
    // simulate a crashed zorder: a rewrite output renamed into data/
    // with no ledger publish (duplicate content of the whole table)
    val data = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(dir, ".zorder-crash")
    spark.table(t).coalesce(1).write.parquet(staging.toString)
    val part = fs.listStatus(staging)
      .find(s => s.isFile && s.getPath.getName.endsWith(".parquet")).get
    assert(fs.rename(part.getPath,
      new org.apache.hadoop.fs.Path(data, "zorder-crash-00000.parquet")))
    fs.delete(staging, true)
    // the orphan must NOT surface as live rows…
    assert(spark.table(t).count() === before,
      "a crashed zorder output must not double-serve rows")
    // …and vacuum reclaims it once it is past the in-flight grace
    val orphan = new org.apache.hadoop.fs.Path(data, "zorder-crash-00000.parquet")
    val old = System.currentTimeMillis() - ParquetVersions.InFlightGraceMs - 60000L
    fs.setTimes(orphan, old, old)
    val reclaimed = ParquetVersions.vacuum(dir, retainLast = 1)
    assert(reclaimed.contains("zorder-crash-00000.parquet"),
      s"vacuum must reclaim the crashed output, got: ${reclaimed.mkString(",")}")
    assert(spark.table(t).count() === before)
  }

  test("zorder_table refuses bucketed tables and un-versioned tables") {
    val t = mkScattered("zb")
    val e1 = intercept[Exception] {
      spark.sql("CALL graft_z.system.zorder_table(table => 'lake.zb', columns => 'id')").collect()
    }
    assert(e1.getMessage.contains("enable_versioning"))
    spark.sql("CALL graft_z.system.enable_versioning(table => 'lake.zb')")
    spark.sql("CALL graft_z.system.set_bucket_spec(table => 'lake.zb', col => 'payload', n => 4)")
    val e2 = intercept[Exception] {
      spark.sql("CALL graft_z.system.zorder_table(table => 'lake.zb', columns => 'id')").collect()
    }
    assert(e2.getMessage.contains("bucket"))
    assert(spark.table(t).count() === 800, "refusals must not touch data")
  }
}
