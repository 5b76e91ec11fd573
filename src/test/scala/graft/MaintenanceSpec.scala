package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 maintenance hardening: the table-scoped maintenance lease
  * ([[MaintenanceLease]]), wall-clock vacuum retention (`retain_hours`
  * over the embedded publish stamps), and the `.partitions` metadata
  * relation. */
class MaintenanceSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_maint_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_mnt", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_mnt.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_mnt.lake")
    s
  }

  test("concurrent compact_table calls serialize on the lease and converge") {
    spark.sql("DROP TABLE IF EXISTS graft_mnt.lake.cc")
    spark.sql("CREATE TABLE graft_mnt.lake.cc (id BIGINT)")
    (0 until 6).foreach { i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1)
        .writeTo("graft_mnt.lake.cc").append()
    }
    val dir = s"$warehouse/lake/cc"
    ParquetVersions.enable(dir)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val runs = (1 to 3).map(_ => Future {
      Compaction.compactTable(spark, dir)
    })
    val stats = Await.result(Future.sequence(runs), 120.seconds)
    // every run completed; the table is exact and the lease is released
    assert(stats.forall(_.filesAfter >= 1))
    assert(spark.table("graft_mnt.lake.cc").count() === 60)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith(".maintenance-lease")),
      "lease released")
  }

  test("an expired lease is taken over; a live one blocks with a clear error") {
    val dir = Files.createTempDirectory("graft_lease").toString
    // expired lease on disk: acquire takes it over
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new Path(dir, ".maintenance-lease"), true)
    out.write(s"""{"id":"dead","expires":${System.currentTimeMillis() - 1000}}"""
      .getBytes)
    out.close()
    val t = MaintenanceLease.acquire(dir)
    // live lease: a second acquire times out loudly
    val e = intercept[IllegalStateException] {
      MaintenanceLease.acquire(dir, waitMs = 300)
    }
    assert(e.getMessage.contains("lease"), e.getMessage)
    MaintenanceLease.release(t)
    // released: acquirable again
    MaintenanceLease.release(MaintenanceLease.acquire(dir))
  }

  test("lease churn: six contenders, thirty acquisitions, never two holders") {
    val dir = Files.createTempDirectory("graft_lease_churn").toString
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a crashed predecessor's EXPIRED ordinal on disk: churn must take
    // it over and reclaim it without ever double-holding
    val out = fs.create(new Path(dir, ".maintenance-lease-3"), true)
    out.write(s"""{"id":"dead","expires":${System.currentTimeMillis() - 1000}}"""
      .getBytes)
    out.close()
    val holders = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    val tasks = (1 to 6).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit = (1 to 5).foreach { _ =>
          val t = MaintenanceLease.acquire(dir, waitMs = 120000L)
          try {
            val n = holders.incrementAndGet()
            maxSeen.updateAndGet(m => math.max(m, n))
            Thread.sleep(3)
            holders.decrementAndGet()
            ()
          } finally MaintenanceLease.release(t)
        }
      })
    }
    tasks.foreach(_.get(180, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(maxSeen.get() === 1, "mutual exclusion must hold through churn")
    assert(!fs.listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith(".maintenance-lease")),
      "all ordinals released/reclaimed after the churn")
  }

  test("vacuum retain_hours keeps every version inside the window") {
    spark.sql("DROP TABLE IF EXISTS graft_mnt.lake.tv")
    spark.sql("CREATE TABLE graft_mnt.lake.tv (id BIGINT)")
    val dir = s"$warehouse/lake/tv"
    (0 until 4).foreach { i =>
      spark.range(i * 10, i * 10 + 10).coalesce(1)
        .writeTo("graft_mnt.lake.tv").append()
      if (i == 0) ParquetVersions.enable(dir) else ParquetVersions.catchUp(dir)
    }
    val versions = VersionLedger.history(dir).map(_._1)
    assert(versions.size >= 4)
    // every publish happened "just now": a 24h window retains ALL
    // versions even though retain_last=1 would drop most
    spark.sql("CALL graft_mnt.system.vacuum(table => 'lake.tv', " +
      "retain_last => 1, retain_hours => 24.0)")
    assert(VersionLedger.history(dir).map(_._1) === versions,
      "wall-clock retention must keep every version in the window")
    assert(spark.table("graft_mnt.lake.tv").count() === 40)
    // a zero-hour window degenerates to count-based retention
    spark.sql("CALL graft_mnt.system.vacuum(table => 'lake.tv', " +
      "retain_last => 1, retain_hours => 0.0)")
    assert(VersionLedger.history(dir).map(_._1).size <= 1)
    assert(spark.table("graft_mnt.lake.tv").count() === 40)
  }

  test(".partitions summarizes the layout; flat tables report one NULL row") {
    spark.sql("DROP TABLE IF EXISTS graft_mnt.lake.pp")
    spark.sql("""CREATE TABLE graft_mnt.lake.pp (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    // one task → one file per partition (the eu file straddles the
    // delete predicate, so it gets MASKED rather than dropped whole)
    import spark.implicits._
    Seq(("eu", 1L), ("eu", 2L), ("us", 3L)).toDF("region", "amount")
      .repartition(1).writeTo("graft_mnt.lake.pp").append()
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_mnt.lake.pp WHERE amount = 2")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    val rows = spark.sql(
      """SELECT partition, files, masked_files
         FROM graft_mnt.lake.pp.partitions ORDER BY partition""").collect()
    assert(rows.map(r => (r.getString(0), r.getInt(2))).toSeq
      === Seq(("region~eu", 1), ("region~us", 0)))
    // .files carries partition + mask columns too
    val f = spark.sql(
      """SELECT partition, masks FROM graft_mnt.lake.pp.files
         WHERE masks > 0""").collect()
    assert(f.length === 1 && f.head.getString(0) === "region~eu")
    // flat table: single NULL-partition row
    spark.sql("DROP TABLE IF EXISTS graft_mnt.lake.flat")
    spark.sql("CREATE TABLE graft_mnt.lake.flat AS SELECT id FROM range(5)")
    val flat = spark.sql(
      "SELECT partition, files FROM graft_mnt.lake.flat.partitions").collect()
    assert(flat.length === 1 && flat.head.isNullAt(0))
  }
}
