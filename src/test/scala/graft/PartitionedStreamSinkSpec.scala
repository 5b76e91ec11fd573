package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming writes into PARTITIONED catalog parquet tables
  * ([[PartitionedStreamingWrite]]): per-epoch partition routing, one
  * atomic ledger version per epoch, exactly-once across a checkpoint
  * restart with a replayed epoch, and partition pruning over the
  * streamed layout. */
class PartitionedStreamSinkSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_pstream_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_pstr", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_pstr.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_pstr.lake")
    s
  }

  private def partFiles(name: String): Seq[String] = {
    val data = new java.io.File(s"$warehouse/lake/$name/data")
    def walk(f: java.io.File, prefix: String): Seq[String] =
      if (f.isFile) {
        if (f.getName.endsWith(".parquet")) Seq(prefix + f.getName) else Seq.empty
      } else {
        Option(f.listFiles()).toSeq.flatten
          .flatMap(c => walk(c, s"$prefix${f.getName}/"))
      }
    Option(data.listFiles()).toSeq.flatten.flatMap(c => walk(c, "")).sorted
  }

  test("append stream routes rows into partition dirs, one version per epoch") {
    spark.sql("DROP TABLE IF EXISTS graft_pstr.lake.t1")
    spark.sql("""CREATE TABLE graft_pstr.lake.t1 (tier STRING, amount BIGINT)
                 PARTITIONED BY (tier)""")
    val t = "graft_pstr.lake.t1"
    val dir = s"$warehouse/lake/t1"
    val ck = Files.createTempDirectory("graft_pstream_ck1").toString
    import spark.implicits._
    val ingest = new graft.streaming.AsyncIngest[(String, Long)](spark.sqlContext)
    val q = ingest.toDS().toDF("tier", "amount").writeStream
      .option("checkpointLocation", ck).toTable(t)
    ingest.saveAllAsync(Seq(("bronze", 1L), ("silver", 10L), ("bronze", 2L)))
    q.processAllAvailable()
    ingest.saveAllAsync(Seq(("gold", 100L), ("silver", 20L)))
    q.processAllAvailable()
    q.stop()

    // rows routed to their partition dirs under deterministic names
    val files = partFiles("t1")
    assert(files.nonEmpty && files.forall(f =>
      f.contains("~") && f.substring(f.indexOf('/') + 1).startsWith("stream-")),
      files.mkString(","))
    assert(files.exists(_.startsWith("tier~bronze/")) &&
      files.exists(_.startsWith("tier~gold/")), files.mkString(","))
    assert(spark.table(t).count() === 5)
    assert(spark.sql(s"SELECT sum(amount) AS s FROM $t").head.getLong(0) === 133)
    // one ledger version per epoch (partitioned tables are versioned
    // from birth: v1 = empty table, then one commit per epoch)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t VERSION AS OF 2")
      .head.getLong(0) === 3, "first epoch snapshot")
    // partition pruning holds on the streamed layout: a tier probe
    // opens no footer of the excluded partitions
    spark.table(t).count() // warm the sidecar/plan path
    val before = ParquetFooterStats.footerReadsUnder(dir)
    val n = spark.sql(s"SELECT count(amount) AS c FROM $t WHERE tier = 'gold'")
      .head.getLong(0)
    assert(n === 1)
    val opened = ParquetFooterStats.footerReadsUnder(dir) - before
    assert(opened <= 1, s"excluded partitions must not open footers ($opened)")
  }

  test("a partitioned table tails as a stream source (snapshot + catch-up)") {
    spark.sql("DROP TABLE IF EXISTS graft_pstr.lake.t3")
    spark.sql("""CREATE TABLE graft_pstr.lake.t3 (tier STRING, amount BIGINT)
                 PARTITIONED BY (tier)""")
    val t = "graft_pstr.lake.t3"
    spark.sql(s"INSERT INTO $t VALUES ('a', 1), ('b', 10), ('a', 2)")
    val ck = Files.createTempDirectory("graft_pstream_ck3").toString
    val outDir = Files.createTempDirectory("graft_pstream_out3").toString
    def run(): Unit = {
      val q = spark.readStream.table(t)
        .writeStream.option("checkpointLocation", ck)
        .format("parquet").option("path", outDir).start()
      q.processAllAvailable()
      q.stop()
    }
    run() // snapshot batch over the partition dirs
    spark.sql(s"INSERT INTO $t VALUES ('c', 100), ('b', 20)")
    run() // resumed tail picks up exactly the new commit
    val got = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got.toSeq === Seq(("a", 1L), ("a", 2L), ("b", 10L), ("b", 20L),
      ("c", 100L)), got.mkString(","))
  }

  test("checkpoint restart + replayed epoch land exactly once") {
    spark.sql("DROP TABLE IF EXISTS graft_pstr.lake.t2")
    spark.sql("""CREATE TABLE graft_pstr.lake.t2 (k BIGINT, amount BIGINT)
                 PARTITIONED BY (k)""")
    val t = "graft_pstr.lake.t2"
    val ck = Files.createTempDirectory("graft_pstream_ck2").toString
    val srcDir = Files.createTempDirectory("graft_pstream_src2").toString
    def feed(a: Long, b: Long): Unit =
      spark.range(a, b).select((col("id") % 3).as("k"), col("id").as("amount"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def start() = spark.readStream
      .schema("k BIGINT, amount BIGINT").parquet(srcDir)
      .writeStream.option("checkpointLocation", ck).toTable(t)

    feed(0L, 10L)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // crash after the sink commit, before the checkpoint commit log:
    // drop the last commit marker (and its hidden .crc sidecar) so the
    // restart replays the epoch — deterministic names must absorb it
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    assert(last.delete())

    feed(10L, 16L)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.table(t).count() === 16, "replayed epoch must not duplicate")
    assert(spark.sql(s"SELECT sum(amount) AS s FROM $t").head.getLong(0)
      === (0L until 16L).sum)
    assert(spark.sql(s"SELECT count(*) AS c FROM $t WHERE k = 1")
      .head.getLong(0) === 5)
  }
}
