package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.StatsPrunedFileIndex

/** The catalog's parquet tables must SKIP whole files at planning time
  * from footer min/max/nullCount — the parquet analogue of the log
  * connector's zone maps. Each test writes range-disjoint files
  * through the public `INSERT` path and asserts on the number of files
  * the scan actually schedules, not just the result. */
class ParquetSkipSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val s = Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_skip", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_skip.warehouse", warehouse)
    s
  }

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_skip_wh").toString

  /** 8 files, ids [i*100, i*100+100), zero-padded names so string
    * ranges are as disjoint as the numeric ones; file 7's score is
    * entirely NULL. */
  private lazy val table: String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_skip.lake")
    spark.sql("""CREATE TABLE graft_skip.lake.t
                 (id BIGINT, name STRING, score DOUBLE)""")
    (0 until 8).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"),
          format_string("n%04d", col("id")).as("name"),
          when(lit(i) === 7, lit(null).cast("double"))
            .otherwise(col("id") * 1.5).as("score"))
        .repartition(1)
        .writeTo("graft_skip.lake.t").append()
    }
    "graft_skip.lake.t"
  }

  private def probe(cond: String): DataFrame =
    spark.sql(s"SELECT * FROM $table WHERE $cond")

  // the index keys its listing probe by the ctor path, verbatim
  private def dataDirKey: String = s"$warehouse/lake/t/data"

  private def keptOf(df: DataFrame): (Int, Int, Long) = {
    StatsPrunedFileIndex.lastListing.remove(dataDirKey)
    val n = df.count()
    val (kept, total) = StatsPrunedFileIndex.lastListing.get(dataDirKey)
    (kept, total, n)
  }

  test("baseline: 8 files on disk, full scan sees every row") {
    assert(spark.table(table).count() === 800)
    // the listing the scan plans over really holds 8 separate files
    // (kept/total counters below are in units of these files)
    val dataDir = new java.io.File(s"$warehouse/lake/t/data")
    assert(dataDir.listFiles().count(_.getName.endsWith(".parquet")) === 8)
  }

  test("point probe schedules exactly one file") {
    val df = probe("id = 250")
    val (kept, total, n) = keptOf(df)
    assert((kept, total) === (1, 8), "footer bounds must exclude 7 of 8 files")
    assert(n === 1)
  }

  test("range probe keeps only the overlapping tail") {
    val (kept, total, n) = keptOf(probe("id > 650"))
    assert((kept, total) === (2, 8))
    assert(n === 149)
    // closed bound lands in a single file
    val (k2, _, n2) = keptOf(probe("id BETWEEN 310 AND 390"))
    assert(k2 === 1 && n2 === 81)
  }

  test("string equality and prefix probes skip on binary-ordered bounds") {
    val (kept, _, n) = keptOf(probe("name = 'n0250'"))
    assert(kept === 1 && n === 1)
    val (k2, _, n2) = keptOf(probe("name LIKE 'n02%'"))
    assert(k2 === 1 && n2 === 100)
  }

  test("IN-list prunes to the union of member files; NULL member changes nothing") {
    val (kept, _, n) = keptOf(probe("id IN (5, 15, 705)"))
    assert(kept === 2 && n === 3)
    val (k2, _, n2) = keptOf(probe("id IN (5, 15, 705, NULL)"))
    assert(k2 === 2 && n2 === 3, "NULL member matches nothing, prunes the same")
  }

  test("IS NULL keeps only the all-null file; IS NOT NULL drops it") {
    val (kept, _, n) = keptOf(probe("score IS NULL"))
    assert(kept === 1 && n === 100)
    val (k2, _, n2) = keptOf(probe("score IS NOT NULL AND id >= 700"))
    assert(k2 === 0 && n2 === 0, "conjunction proves emptiness before any task runs")
  }

  test("double-range probe prunes on float bounds") {
    val (kept, _, n) = keptOf(probe("score >= 1000.5"))
    // score = id*1.5 → ≥1000.5 means id ≥ 667: files 6 (667..699) only
    // (file 7 is all-null and excluded by the comparison semantics)
    assert(kept === 1 && n === 33)
  }

  test("unprovable predicates keep every file and stay correct") {
    val (kept, total, n) = keptOf(probe("id % 2 = 0 AND id < 100"))
    // id % 2 can't prune; id < 100 can — one file survives
    assert(kept === 1 && total === 8 && n === 50)
    val (k2, _, n2) = keptOf(probe("pmod(id, 7) = 3"))
    assert(k2 === 8 && n2 === 800 / 7 + (if (800 % 7 > 3) 1 else 0))
  }

  test("decimal bounds prune (unscaled int and binary-backed encodings)") {
    spark.sql("""CREATE TABLE graft_skip.lake.dec
                 (id BIGINT, small DECIMAL(9,2), wide DECIMAL(25,4))""")
    (0 until 4).foreach { i =>
      spark.range(i * 10, i * 10 + 10)
        .select(col("id"),
          (col("id") * 1.25).cast("decimal(9,2)").as("small"),
          (col("id") * 1000000.0001).cast("decimal(25,4)").as("wide"))
        .repartition(1)
        .writeTo("graft_skip.lake.dec").append()
    }
    val key = s"$warehouse/lake/dec/data"
    def kept(cond: String): (Int, Long) = {
      StatsPrunedFileIndex.lastListing.remove(key)
      val n = spark.sql(s"SELECT * FROM graft_skip.lake.dec WHERE $cond").count()
      (StatsPrunedFileIndex.lastListing.get(key)._1, n)
    }
    // DECIMAL(9,2) → INT32/INT64 unscaled; file i holds small in
    // [i*10*1.25, (i*10+9)*1.25]
    assert(kept("small = 31.25") === ((1, 1)))
    assert(kept("small > 30.00") === ((2, 15)))
    // DECIMAL(25,4) → FIXED_LEN_BYTE_ARRAY unscaled big-endian
    assert(kept("wide >= 30000000.0030") === ((1, 10)))
    assert(kept("wide < 0") === ((0, 0)))
  }

  test("z-ordered layout: selective probes on EITHER dimension skip most files") {
    spark.sql("CREATE TABLE graft_skip.lake.z (x BIGINT, y BIGINT, id BIGINT)")
    val grid = spark.range(10000).select(
      (col("id") % 100).as("x"), ((col("id") / 100) % 100).as("y"), col("id"))
    graft.operators.Layout.zorder(grid, Seq("x", "y"), files = 16)
      .writeTo("graft_skip.lake.z").append()
    val key = s"$warehouse/lake/z/data"
    def kept(cond: String): (Int, Int, Long) = {
      StatsPrunedFileIndex.lastListing.remove(key)
      val n = spark.sql(s"SELECT * FROM graft_skip.lake.z WHERE $cond").count()
      val (k, t) = StatsPrunedFileIndex.lastListing.get(key)
      (k, t, n)
    }
    // range file boundaries are sampled quantiles of the z-key, so a
    // probe slab can straddle one extra bit-quadrant — assert the
    // halving, not the geometric ideal
    val (kx, tx, nx) = kept("x BETWEEN 10 AND 15")
    assert(tx === 16 && nx === 600)
    assert(kx <= 8, s"x-probe kept $kx of 16 files — z-locality lost")
    val (ky, _, ny) = kept("y BETWEEN 80 AND 85")
    assert(ny === 600)
    assert(ky <= 8, s"y-probe kept $ky of 16 files — z-locality lost")
    // a conjunctive probe intersects both dimensions' file sets
    val (kxy, _, nxy) = kept("x BETWEEN 10 AND 15 AND y BETWEEN 80 AND 85")
    assert(nxy === 36 && kxy <= 4)

    // contrast: a single-column range layout serves only its own
    // column — the y-probe reads EVERY file, which is exactly the
    // failure mode z-ordering exists to fix
    spark.sql("CREATE TABLE graft_skip.lake.zlin (x BIGINT, y BIGINT, id BIGINT)")
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .writeTo("graft_skip.lake.zlin").append()
    val klin = s"$warehouse/lake/zlin/data"
    StatsPrunedFileIndex.lastListing.remove(klin)
    assert(spark.sql(
      "SELECT * FROM graft_skip.lake.zlin WHERE y BETWEEN 80 AND 85").count() === 600)
    assert(StatsPrunedFileIndex.lastListing.get(klin)._1 === 16)
  }

  test("bloom skip index: a point probe on a non-clustered key skips " +
      "files min/max cannot prune; false-positive-safe; incremental") {
    // every file's [min, max] on `h` spans the whole hex space — the
    // exact layout where range pruning is useless (the sha256sum
    // lookup pattern)
    spark.sql("CREATE TABLE graft_skip.lake.b (id BIGINT, h STRING)")
    (0 until 8).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), sha2(col("id").cast("string"), 256).as("h"))
        .repartition(1)
        .writeTo("graft_skip.lake.b").append()
    }
    val key = s"$warehouse/lake/b/data"
    def kept(cond: String): (Int, Int, Long) = {
      StatsPrunedFileIndex.lastListing.remove(key)
      val n = spark.sql(s"SELECT * FROM graft_skip.lake.b WHERE $cond").count()
      val (k, t) = StatsPrunedFileIndex.lastListing.get(key)
      (k, t, n)
    }
    val probe307 = // a value in file 3
      spark.range(307, 308).select(sha2(col("id").cast("string"), 256))
        .head.getString(0)
    // BEFORE the index: min/max prunes nothing on a uniform key
    val (k0, t0, n0) = kept(s"h = '$probe307'")
    assert(t0 === 8 && k0 === 8 && n0 === 1,
      s"uniform key must defeat range pruning: kept $k0 of $t0")
    // build the index; point probe now schedules ~1 file
    val row = spark.sql(
      "CALL graft_skip.system.build_bloom(table => 'lake.b', columns => 'h')").head
    assert(row.getLong(0) === 8 && row.getLong(1) === 8)
    val (k1, _, n1) = kept(s"h = '$probe307'")
    assert(n1 === 1, "the probe row itself must survive")
    assert(k1 <= 2, s"bloom must skip the definite misses: kept $k1 of 8")
    // absent value: zero rows, (almost) zero files — and NEVER wrong
    val (k2, _, n2) = kept("h = 'no-such-hash'")
    assert(n2 === 0 && k2 <= 1, s"absent probe kept $k2 files")
    // IN-list: union of member files
    val probe701 = spark.range(701, 702).select(sha2(col("id").cast("string"), 256))
      .head.getString(0)
    val (k3, _, n3) = kept(s"h IN ('$probe307', '$probe701')")
    assert(n3 === 2 && k3 <= 3, s"IN probe kept $k3 of 8")
    // a NEW file without a bloom entry is always kept — appends stay
    // correct between index builds
    spark.range(800, 900)
      .select(col("id"), sha2(col("id").cast("string"), 256).as("h"))
      .repartition(1).writeTo("graft_skip.lake.b").append()
    val probe850 = spark.range(850, 851).select(sha2(col("id").cast("string"), 256))
      .head.getString(0)
    val (k4, t4, n4) = kept(s"h = '$probe850'")
    assert(t4 === 9 && n4 === 1 && k4 <= 3,
      s"uncovered append must be kept (and old files still skip): kept $k4 of $t4")
    // the re-CALL is incremental: only the append is indexed
    val row2 = spark.sql(
      "CALL graft_skip.system.build_bloom(table => 'lake.b', columns => 'h')").head
    assert(row2.getLong(0) === 1 && row2.getLong(1) === 9,
      s"incremental rebuild must index only the new file: ${row2}")
    val (k5, _, n5) = kept(s"h = '$probe850'")
    assert(n5 === 1 && k5 <= 2)
    // integral probe column: same machinery on a scrambled BIGINT
    spark.sql("""CREATE TABLE graft_skip.lake.bi (id BIGINT, v BIGINT)""")
    (0 until 4).foreach { i =>
      spark.range(i * 100, i * 100 + 100)
        .select(col("id"), pmod(col("id") * 2654435761L, lit(1000000007L)).as("v"))
        .repartition(1).writeTo("graft_skip.lake.bi").append()
    }
    spark.sql("CALL graft_skip.system.build_bloom(table => 'lake.bi', columns => 'v')")
    val v42 = spark.sql("SELECT v FROM graft_skip.lake.bi WHERE id = 42").head.getLong(0)
    val keyI = s"$warehouse/lake/bi/data"
    StatsPrunedFileIndex.lastListing.remove(keyI)
    assert(spark.sql(s"SELECT * FROM graft_skip.lake.bi WHERE v = $v42").count() === 1)
    assert(StatsPrunedFileIndex.lastListing.get(keyI)._1 <= 2)
    // non-indexable column type is rejected loudly
    val e = intercept[Exception] { spark.sql(
      "CALL graft_skip.system.build_bloom(table => 'lake.t', columns => 'score')") }
    assert(e.getMessage.contains("string and integral"), e.getMessage)
  }

  test("pruning composes with column pruning and aggregation") {
    val df = spark.sql(
      s"SELECT count(*) AS n, sum(id) AS s FROM $table WHERE id BETWEEN 100 AND 199")
    StatsPrunedFileIndex.lastListing.remove(dataDirKey)
    val row = df.collect().head
    assert(StatsPrunedFileIndex.lastListing.get(dataDirKey) === ((1, 8)))
    assert(row.getLong(0) === 100 && row.getLong(1) === (100L to 199L).sum)
  }
}
