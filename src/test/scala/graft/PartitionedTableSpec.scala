package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `PARTITIONED BY` on catalog parquet tables ([[PartitionSpecs]]):
  * identity and days() layouts under `data/<col>~<value>/`, versioned
  * from birth, atomic multi-partition INSERT, partition pruning BEFORE
  * footer I/O, partition-wise DELETE and compaction, and safe
  * composition with time travel. */
class PartitionedTableSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_part_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_ptn", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_ptn.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_ptn.lake")
    s
  }

  private def fs = new Path(warehouse).getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("identity partitioning: layout, atomic INSERT, exact reads") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.sales")
    spark.sql("""CREATE TABLE graft_ptn.lake.sales
                 (region STRING, day DATE, amount BIGINT)
                 PARTITIONED BY (region, day)""")
    val dir = s"$warehouse/lake/sales"
    assert(ParquetVersions.enabled(dir), "partitioned tables are versioned from birth")
    spark.sql("""INSERT INTO graft_ptn.lake.sales VALUES
      ('eu', DATE'2024-01-01', 10), ('eu', DATE'2024-01-02', 20),
      ('us', DATE'2024-01-01', 30), ('us', DATE'2024-01-02', 40),
      (NULL, DATE'2024-01-01', 50)""")
    // one INSERT = one ledger publish, names are partition-relative
    val (v, names) = ParquetVersions.latest(dir).get
    assert(names.nonEmpty && names.forall(_.contains("/")), names)
    assert(names.exists(_.startsWith("region~eu/day~2024-01-01/")), names)
    assert(names.exists(_.startsWith("region~~/")), s"null partition dir: $names")
    // rows read back exactly, partition columns from the data files
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_ptn.lake.sales")
      .head.getLong(0) === 150)
    assert(spark.sql(
      "SELECT amount FROM graft_ptn.lake.sales WHERE region IS NULL")
      .head.getLong(0) === 50)
    // second INSERT appends, one more version
    spark.sql("INSERT INTO graft_ptn.lake.sales VALUES ('eu', DATE'2024-01-01', 5)")
    assert(ParquetVersions.latest(dir).get._1 === v + 1)
    assert(spark.sql(
      "SELECT sum(amount) AS s FROM graft_ptn.lake.sales WHERE region = 'eu'")
      .head.getLong(0) === 35)
  }

  test("partition pruning runs BEFORE footer I/O: excluded partitions never open") {
    // the counters are SCOPED to this table's directory — parallel
    // suites in the shared JVM must not inflate the deltas
    val under = s"$warehouse/lake/sales"
    val probe = "SELECT sum(amount) AS s FROM graft_ptn.lake.sales WHERE region = 'us'"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(probe).head.getLong(0) === 70)
    val opened = ParquetFooterStats.footerReadsUnder(under) - before
    // only the two us-partition files (one per day) may be opened; the
    // eu and null partitions are dir-pruned with zero I/O
    assert(opened <= 2, s"footer opens for excluded partitions: $opened")
    // a range probe on the other partition column prunes the same way
    ParquetFooterStats.clearCacheForTesting()
    val b2 = ParquetFooterStats.footerReadsUnder(under)
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_ptn.lake.sales WHERE day > DATE'2024-01-01'")
      .head.getLong(0) === 2)
    assert(ParquetFooterStats.footerReadsUnder(under) - b2 <= 2)
  }

  test("days(ts) partitioning prunes timestamp range probes") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.events")
    spark.sql("""CREATE TABLE graft_ptn.lake.events (ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (days(ts))""")
    spark.sql("""INSERT INTO graft_ptn.lake.events VALUES
      (TIMESTAMP'2024-03-01 08:00:00', 1), (TIMESTAMP'2024-03-01 20:00:00', 2),
      (TIMESTAMP'2024-03-02 08:00:00', 3), (TIMESTAMP'2024-03-03 12:30:00', 4)""")
    val dir = s"$warehouse/lake/events"
    val names = ParquetVersions.latest(dir).get._2
    assert(names.exists(_.startsWith("ts~2024-03-01/")), names)
    assert(names.map(_.split("/").head).distinct.size === 3)
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(dir)
    assert(spark.sql(
      """SELECT sum(v) AS s FROM graft_ptn.lake.events
         WHERE ts >= TIMESTAMP'2024-03-02 00:00:00'
           AND ts <  TIMESTAMP'2024-03-03 00:00:00'""")
      .head.getLong(0) === 3)
    assert(ParquetFooterStats.footerReadsUnder(dir) - before <= 1,
      "only the 2024-03-02 partition may be opened")
  }

  test("INSERT OVERWRITE is a history-preserving truncate") {
    val dir = s"$warehouse/lake/sales"
    val vBefore = ParquetVersions.latest(dir).get._1
    spark.sql("""INSERT OVERWRITE graft_ptn.lake.sales VALUES
      ('apac', DATE'2024-02-01', 99)""")
    assert(spark.table("graft_ptn.lake.sales").count() === 1)
    assert(spark.sql(
      s"SELECT sum(amount) AS s FROM graft_ptn.lake.sales VERSION AS OF $vBefore")
      .head.getLong(0) === 155, "pre-overwrite snapshot intact")
  }

  test("whole-partition DELETE is metadata-only; masked DELETE works partitioned") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.pd")
    spark.sql("""CREATE TABLE graft_ptn.lake.pd (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_ptn.lake.pd
                 SELECT CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id
                 FROM range(100)""")
    val dir = s"$warehouse/lake/pd"
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(dir)
    spark.sql("DELETE FROM graft_ptn.lake.pd WHERE region = 'eu'")
    // classification proves the whole eu partition from dir values and
    // the whole us partition untouched — zero footer opens, zero rewrites
    assert(ParquetFooterStats.footerReadsUnder(dir) === before,
      "whole-partition delete must be metadata-only")
    assert(spark.table("graft_ptn.lake.pd").count() === 50)
    // merge-on-read DELETE on the surviving partition
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_ptn.lake.pd WHERE amount = 51")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    assert(spark.table("graft_ptn.lake.pd").count() === 49)
    val masks = ParquetVersions.masksFor(dir, None)
    assert(masks.nonEmpty && masks.keys.forall(_.startsWith("region~us/")),
      s"masks key on relative names: $masks")
  }

  test("compact_table packs partition-wise; outputs stay in their partition") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.pc")
    spark.sql("""CREATE TABLE graft_ptn.lake.pc (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO graft_ptn.lake.pc VALUES
        ('eu', $i), ('us', ${i + 100})""")
    }
    val dir = s"$warehouse/lake/pc"
    assert(ParquetVersions.latest(dir).get._2.size === 6)
    spark.sql("CALL graft_ptn.system.compact_table(table => 'lake.pc')")
    val after = ParquetVersions.latest(dir).get._2
    assert(after.size === 2, s"one packed file per partition: $after")
    assert(after.forall(n => n.startsWith("eu~") || n.startsWith("us~") ||
      n.startsWith("region~")), after)
    assert(after.forall(_.contains("/")), after)
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_ptn.lake.pc")
      .head.getLong(0) === (0 + 1 + 2) + (100 + 101 + 102))
    // vacuum reclaims the six retired originals
    spark.sql("CALL graft_ptn.system.vacuum(table => 'lake.pc', retain_last => 1)")
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_ptn.lake.pc")
      .head.getLong(0) === 306)
  }

  test("CTAS with PARTITIONED BY builds the layout atomically") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.ctasp")
    spark.sql("""CREATE TABLE graft_ptn.lake.ctasp PARTITIONED BY (k) AS
                 SELECT CAST(id % 3 AS STRING) AS k, id FROM range(30)""")
    val dir = s"$warehouse/lake/ctasp"
    assert(PartitionSpecs.exists(dir))
    assert(ParquetVersions.enabled(dir))
    val names = ParquetVersions.latest(dir).get._2
    assert(names.map(_.split("/").head).distinct.sorted ===
      Seq("k~0", "k~1", "k~2"))
    assert(spark.table("graft_ptn.lake.ctasp").count() === 30)
  }

  test("layout conflicts and unsupported combos are rejected loudly") {
    val e1 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_ptn.lake.bad1 (a STRING, d DOUBLE)
                   PARTITIONED BY (d)""")
    }
    assert(e1.getMessage.contains("identity partitioning"), e1.getMessage)
    // bucket(n, col) supports string/integral/date keys (r13) — a
    // DOUBLE key is still rejected, naming the supported set
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE graft_ptn.lake.bad2 (a STRING, d DOUBLE)
                   PARTITIONED BY (bucket(4, d))""")
    }
    assert(e2.getMessage.toLowerCase.contains("bucket"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("CALL graft_ptn.system.set_bucket_spec(" +
        "table => 'lake.sales', col => 'region', n => 4)")
    }
    assert(e3.getMessage.contains("mutually exclusive"), e3.getMessage)
    // REPLACE TABLE on partitioned targets is supported since r13
    // (RtasPartitionedSpec covers it)
  }

  test("zorder runs partition-wise: outputs stay in their partitions") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.pz")
    spark.sql("""CREATE TABLE graft_ptn.lake.pz (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    // several files per partition so the rewrite has something to cluster
    (0 until 4).foreach { i =>
      spark.sql(s"""INSERT INTO graft_ptn.lake.pz
        SELECT CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id
        FROM range(${i * 50}, ${i * 50 + 50})""")
    }
    val dir = s"$warehouse/lake/pz"
    val preSum = spark.sql("SELECT sum(amount) AS s FROM graft_ptn.lake.pz")
      .head.getLong(0)
    spark.sql("CALL graft_ptn.system.zorder_table(" +
      "table => 'lake.pz', columns => 'amount', files => 2)")
    val names = ParquetVersions.latest(dir).get._2
    assert(names.nonEmpty && names.forall(n =>
      n.contains("/") && n.substring(n.indexOf('/') + 1).startsWith("zorder-")),
      s"outputs must stay inside their partition dirs: $names")
    assert(names.count(_.startsWith("region~eu/")) === 2 &&
      names.count(_.startsWith("region~us/")) === 2, names)
    // content identical
    assert(spark.sql("SELECT sum(amount) AS s FROM graft_ptn.lake.pz")
      .head.getLong(0) === preSum)
    assert(spark.table("graft_ptn.lake.pz").count() === 200)
    // two-tier pruning: the partition dir prunes region first (zero
    // I/O), then z-order footer bounds prune within the partition
    spark.table("graft_ptn.lake.pz").count() // warm plan path
    val before = ParquetFooterStats.footerReadsUnder(dir)
    assert(spark.sql("""SELECT count(amount) AS c FROM graft_ptn.lake.pz
                        WHERE region = 'eu' AND amount < 50""")
      .head.getLong(0) === 25)
    val opened = ParquetFooterStats.footerReadsUnder(dir) - before
    assert(opened <= 2,
      s"us partition and out-of-range eu files must not open ($opened)")
  }

  test("INSERT clusters by partition value: one file per touched partition") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.pf")
    spark.sql("""CREATE TABLE graft_ptn.lake.pf (k BIGINT, amount BIGINT)
                 PARTITIONED BY (k)""")
    // a deliberately many-task input: without the required clustered
    // distribution this writes (tasks x partitions) files
    spark.range(0, 4000).repartition(8)
      .selectExpr("id % 5 AS k", "id AS amount")
      .writeTo("graft_ptn.lake.pf").append()
    val names = ParquetVersions.latest(s"$warehouse/lake/pf").get._2
    assert(names.size === 5,
      s"clustered write must produce one file per partition: $names")
    assert(spark.table("graft_ptn.lake.pf").count() === 4000)
    // the escape hatch for hot-partition bulk loads
    spark.conf.set("spark.graft.partitioned.write.distribution", "none")
    try {
      spark.range(0, 100).repartition(4).selectExpr("5 AS k", "id AS amount")
        .writeTo("graft_ptn.lake.pf").append()
    } finally spark.conf.unset("spark.graft.partitioned.write.distribution")
    assert(spark.table("graft_ptn.lake.pf").count() === 4100)
  }

  test("INSERT clusters by the TRANSFORM value: hours(ts) from a " +
      "many-task input lands one file per hour dir") {
    // regression pin: clustering on the raw ts column scatters one
    // hour's rows across tasks — under AQE-coalesced tiny exchanges it
    // looked fine (one task total), but any pinned/larger task count
    // then wrote (tasks × partitions) files. The write must cluster on
    // hours(ts) resolved through the catalog's function
    // (PartitionTransformFns), value-routing regardless of task count.
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.hcl")
    spark.sql("""CREATE TABLE graft_ptn.lake.hcl (ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (hours(ts))""")
    spark.range(0, 4000).repartition(8)
      .selectExpr(
        "timestamp_micros(CAST(1700000000000000 + (id % 3) * 3600000000 + " +
          "(id * 1000) AS BIGINT)) AS ts",
        "id AS v")
      .writeTo("graft_ptn.lake.hcl").append()
    val names = ParquetVersions.latest(s"$warehouse/lake/hcl").get._2
    assert(names.size === 3,
      s"transform-clustered write must produce one file per hour: $names")
    assert(names.map(_.split("/").head).distinct.size === 3)
    assert(spark.table("graft_ptn.lake.hcl").count() === 4000)
  }

  test("UPDATE on a partitioned table stays correct") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.pu")
    spark.sql("""CREATE TABLE graft_ptn.lake.pu (region STRING, amount BIGINT)
                 PARTITIONED BY (region)""")
    spark.sql("""INSERT INTO graft_ptn.lake.pu
                 SELECT CASE WHEN id % 2 = 0 THEN 'eu' ELSE 'us' END, id
                 FROM range(20)""")
    spark.sql("UPDATE graft_ptn.lake.pu SET amount = amount + 1000 WHERE region = 'eu'")
    val rows = spark.table("graft_ptn.lake.pu").collect()
    assert(rows.length === 20)
    assert(rows.filter(_.getString(0) == "eu").forall(_.getLong(1) >= 1000))
    assert(rows.filter(_.getString(0) == "us").forall(_.getLong(1) < 1000))
  }

  test("months(ts) partitioning prunes month-range probes with zero footer I/O") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.mev")
    spark.sql("""CREATE TABLE graft_ptn.lake.mev (ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (months(ts))""")
    spark.sql("""INSERT INTO graft_ptn.lake.mev VALUES
      (TIMESTAMP'2024-01-05 08:00:00', 1), (TIMESTAMP'2024-01-31 23:59:59', 2),
      (TIMESTAMP'2024-02-01 00:00:00', 3), (TIMESTAMP'2024-02-29 12:00:00', 4),
      (TIMESTAMP'2024-03-15 06:00:00', 5)""")
    val dir = s"$warehouse/lake/mev"
    val names = ParquetVersions.latest(dir).get._2
    assert(names.exists(_.startsWith("ts~2024-01/")), names)
    assert(names.map(_.split("/").head).distinct.sorted ===
      Seq("ts~2024-01", "ts~2024-02", "ts~2024-03"))
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(dir)
    // a month-aligned range probe opens ONLY the february partition
    assert(spark.sql(
      """SELECT sum(v) AS s FROM graft_ptn.lake.mev
         WHERE ts >= TIMESTAMP'2024-02-01 00:00:00'
           AND ts <  TIMESTAMP'2024-03-01 00:00:00'""")
      .head.getLong(0) === 7)
    assert(ParquetFooterStats.footerReadsUnder(dir) - before <= 1,
      "only the 2024-02 partition may be opened")
    // leap-month END boundary: the 02-29 row belongs to february's range
    assert(spark.sql(
      """SELECT count(*) AS c FROM graft_ptn.lake.mev
         WHERE ts > TIMESTAMP'2024-02-29 23:59:59.999999'""")
      .head.getLong(0) === 1)
  }

  test("hours(ts) partitioning prunes hour probes; DATE months() works too") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.hev")
    spark.sql("""CREATE TABLE graft_ptn.lake.hev (ts TIMESTAMP, v BIGINT)
                 PARTITIONED BY (hours(ts))""")
    spark.sql("""INSERT INTO graft_ptn.lake.hev VALUES
      (TIMESTAMP'2024-03-01 05:10:00', 1), (TIMESTAMP'2024-03-01 05:50:00', 2),
      (TIMESTAMP'2024-03-01 06:00:00', 3), (TIMESTAMP'2024-03-02 05:30:00', 4)""")
    val dir = s"$warehouse/lake/hev"
    val names = ParquetVersions.latest(dir).get._2
    assert(names.exists(_.startsWith("ts~2024-03-01T05/")), names)
    assert(names.map(_.split("/").head).distinct.size === 3)
    ParquetFooterStats.clearCacheForTesting()
    val before = ParquetFooterStats.footerReadsUnder(dir)
    assert(spark.sql(
      """SELECT sum(v) AS s FROM graft_ptn.lake.hev
         WHERE ts >= TIMESTAMP'2024-03-01 05:00:00'
           AND ts <  TIMESTAMP'2024-03-01 06:00:00'""")
      .head.getLong(0) === 3)
    assert(ParquetFooterStats.footerReadsUnder(dir) - before <= 1,
      "only the 05h partition may be opened")
    // months() on a DATE column: day-domain bounds
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.mdt")
    spark.sql("""CREATE TABLE graft_ptn.lake.mdt (d DATE, v BIGINT)
                 PARTITIONED BY (months(d))""")
    spark.sql("""INSERT INTO graft_ptn.lake.mdt VALUES
      (DATE'2024-01-15', 1), (DATE'2024-02-10', 2)""")
    val mdir = s"$warehouse/lake/mdt"
    ParquetFooterStats.clearCacheForTesting()
    val b2 = ParquetFooterStats.footerReadsUnder(mdir)
    assert(spark.sql(
      "SELECT sum(v) AS s FROM graft_ptn.lake.mdt WHERE d >= DATE'2024-02-01'")
      .head.getLong(0) === 2)
    assert(ParquetFooterStats.footerReadsUnder(mdir) - b2 <= 1)
  }

  test("bucket(n, col) partitioning routes by murmur3-pmod; reads stay exact") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.bkt")
    spark.sql("""CREATE TABLE graft_ptn.lake.bkt (k STRING, v BIGINT)
                 PARTITIONED BY (bucket(4, k))""")
    spark.sql("""INSERT INTO graft_ptn.lake.bkt
                 SELECT concat('key', id), id FROM range(40)""")
    val dir = s"$warehouse/lake/bkt"
    val names = ParquetVersions.latest(dir).get._2
    val dirs = names.map(_.split("/").head).distinct.sorted
    assert(dirs.forall(_.startsWith("k~")), names)
    assert(dirs.size > 1 && dirs.size <= 4, s"4 hash buckets max: $dirs")
    // the routing is the layout's murmur3-pmod contract: every row's
    // dir matches the hash of its key
    import org.apache.spark.unsafe.types.UTF8String
    names.foreach { n =>
      val b = n.split("/").head.stripPrefix("k~").toInt
      val rows = spark.read.parquet(s"$dir/data/$n").collect()
      assert(rows.forall(r => math.floorMod(org.apache.spark.sql.GraftShims
        .murmur3(UTF8String.fromString(r.getString(0))), 4) == b), n)
    }
    // reads, point probes and aggregates stay exact (footer stats prune
    // within partitions; bucket dirs synthesize no value bounds)
    assert(spark.table("graft_ptn.lake.bkt").count() === 40)
    assert(spark.sql("SELECT v FROM graft_ptn.lake.bkt WHERE k = 'key7'")
      .head.getLong(0) === 7)
    // NULL keys land in the null dir and IS NOT NULL still counts right
    spark.sql("INSERT INTO graft_ptn.lake.bkt VALUES (NULL, 999)")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_ptn.lake.bkt WHERE k IS NOT NULL")
      .head.getLong(0) === 40)
    // partition evolution round-trips the bucket spec string
    val (_, rendered) = PartitionEvolution.setSpec(spark, dir, "bucket(4, k)")
    assert(rendered === "bucket(4, k)")
  }

  test("bucket(n) on typed keys: BIGINT and DATE route by their own " +
      "type's murmur3 — bit-identical to functions.hash(col)") {
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.bktl")
    spark.sql("""CREATE TABLE graft_ptn.lake.bktl (k BIGINT, v BIGINT)
                 PARTITIONED BY (bucket(8, k))""")
    spark.sql("INSERT INTO graft_ptn.lake.bktl SELECT id, id * 10 FROM range(200)")
    val dirL = s"$warehouse/lake/bktl"
    val namesL = ParquetVersions.latest(dirL).get._2
    assert(namesL.forall(_.startsWith("k~")), namesL)
    assert(namesL.map(_.split("/").head).distinct.size > 4,
      s"200 long keys spread over 8 buckets: $namesL")
    // routing agrees with functions.hash(col) — the claim that lets a
    // writer pre-cluster with pmod(hash(k), 8): every row's dir bucket
    // equals pmod(hash(k), 8) computed by Spark itself
    val hashAgree = spark.sql(
      "SELECT k, pmod(hash(k), 8) AS hb FROM graft_ptn.lake.bktl")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    namesL.foreach { n =>
      val b = n.split("/").head.stripPrefix("k~").toInt
      val rows = spark.read.parquet(s"$dirL/data/$n").select("k").collect()
      assert(rows.forall(r => math.floorMod(org.apache.spark.sql.GraftShims
        .murmur3Typed(r.getLong(0), org.apache.spark.sql.types.LongType), 8) == b),
        s"every row of $n must hash to its dir")
      assert(rows.forall(r => hashAgree(r.getLong(0)) == b),
        s"dir bucket of $n must equal Spark's own pmod(hash(k), 8)")
    }
    assert(spark.table("graft_ptn.lake.bktl").count() === 200)
    assert(spark.sql("SELECT v FROM graft_ptn.lake.bktl WHERE k = 137")
      .head.getLong(0) === 1370)
    // DATE keys
    spark.sql("DROP TABLE IF EXISTS graft_ptn.lake.bktd")
    spark.sql("""CREATE TABLE graft_ptn.lake.bktd (d DATE, v BIGINT)
                 PARTITIONED BY (bucket(4, d))""")
    spark.sql("""INSERT INTO graft_ptn.lake.bktd
                 SELECT date_add(DATE'2024-01-01', CAST(id AS INT)), id
                 FROM range(30)""")
    val dirD = s"$warehouse/lake/bktd"
    val namesD = ParquetVersions.latest(dirD).get._2
    assert(namesD.forall(_.startsWith("d~")), namesD)
    assert(spark.table("graft_ptn.lake.bktd").count() === 30)
    assert(spark.sql(
      "SELECT v FROM graft_ptn.lake.bktd WHERE d = DATE'2024-01-11'")
      .head.getLong(0) === 10)
    // NULL typed keys land in the null dir; IS NOT NULL counts right
    spark.sql("INSERT INTO graft_ptn.lake.bktl VALUES (NULL, -1)")
    assert(spark.sql(
      "SELECT count(*) AS c FROM graft_ptn.lake.bktl WHERE k IS NOT NULL")
      .head.getLong(0) === 200)
  }
}
