package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming writes into catalog parquet tables
  * ([[ParquetStreamingWrite]]): epoch-versioned exactly-once appends,
  * checkpoint-restart without duplicates, bucket-layout preservation,
  * and complete-mode replacement — the log tier's sink contract proven
  * on the columnar tier. */
class ParquetStreamSinkSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_psink_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_ps", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_ps.warehouse", warehouse)
    s
  }

  private def mkTable(name: String, ddl: String = "(id BIGINT, score BIGINT)"): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ps.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_ps.lake.$name")
    spark.sql(s"CREATE TABLE graft_ps.lake.$name $ddl")
    s"graft_ps.lake.$name"
  }

  private def dataFiles(name: String): Seq[String] =
    new java.io.File(s"$warehouse/lake/$name/data").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet")).toSeq.sorted

  test("append stream lands epoch-versioned, readable alongside batch writes") {
    import spark.implicits._
    val t = mkTable("s1")
    spark.range(0, 5).select(col("id"), (col("id") * 2).as("score"))
      .writeTo(t).append() // pre-stream batch rows
    val ck = Files.createTempDirectory("graft_psink_ck1").toString
    val ingest = new graft.streaming.AsyncIngest[(Long, Long)](spark.sqlContext)
    val q = ingest.toDS().toDF("id", "score").writeStream
      .option("checkpointLocation", ck).toTable(t)
    ingest.saveAllAsync((5L until 25L).map(i => (i, i * 2)))
    q.processAllAvailable()
    ingest.saveAllAsync((25L until 40L).map(i => (i, i * 2)))
    q.processAllAvailable()
    q.stop()

    assert(spark.table(t).count() === 40)
    assert(spark.table(t).agg(sum(col("score"))).collect()(0).getLong(0)
      === (0L until 40L).map(_ * 2).sum)
    // streamed files carry the deterministic epoch names
    assert(dataFiles("s1").exists(_.startsWith("stream-")), dataFiles("s1").mkString(","))
    // one ledger version per epoch: history = enable(v1) + 2 epochs
    val hist = spark.sql("CALL graft_ps.system.history(table => 'lake.s1')").collect()
    assert(hist.length >= 3, hist.mkString(","))
    // the pre-stream snapshot is still pinned-readable
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0) === 5)
  }

  test("checkpoint restart + replayed epoch land exactly once") {
    val t = mkTable("s2")
    val ck = Files.createTempDirectory("graft_psink_ck2").toString
    val srcDir = Files.createTempDirectory("graft_psink_src2").toString
    def feed(a: Long, b: Long): Unit =
      spark.range(a, b).select(col("id"), col("id").as("score"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def start() = spark.readStream
      .schema("id BIGINT, score BIGINT").parquet(srcDir)
      .writeStream.option("checkpointLocation", ck).toTable(t)

    feed(0L, 10L)
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    // simulate a crash AFTER the sink committed epoch N but BEFORE the
    // checkpoint's commit log recorded it: the restart must REPLAY the
    // epoch, and the sink's deterministic names must absorb it
    val commits = new java.io.File(s"$ck/commits").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
    assert(commits.nonEmpty)
    val last = commits.last
    // the hidden Hadoop checksum sidecar must go too, or the replayed
    // commit write trips FileAlreadyExists and Spark misreads it as a
    // concurrent query on the checkpoint
    new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
    assert(last.delete())
    feed(10L, 15L)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val ids = spark.table(t).select("id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 15L).toSeq, s"duplicates or loss: ${ids.mkString(",")}")
  }

  test("bucketed table: streamed appends land fully tagged, layout survives") {
    import spark.implicits._
    val t = mkTable("s3", "(k STRING, v BIGINT)")
    spark.sql("CALL graft_ps.system.enable_versioning(table => 'lake.s3')")
    spark.sql("CALL graft_ps.system.set_bucket_spec(table => 'lake.s3', col => 'k', n => 4)")
    val ck = Files.createTempDirectory("graft_psink_ck3").toString
    val ingest = new graft.streaming.AsyncIngest[(String, Long)](spark.sqlContext)
    val q = ingest.toDS().toDF("k", "v").writeStream
      .option("checkpointLocation", ck).toTable(t)
    ingest.saveAllAsync((0 until 40).map(i => (s"k${i % 10}", i.toLong)))
    q.processAllAvailable()
    q.stop()
    assert(spark.table(t).count() === 40)
    val files = dataFiles("s3")
    assert(files.nonEmpty && files.forall(n => "-b\\d+\\.parquet$".r.findFirstIn(n).isDefined),
      s"streamed files must carry bucket tags: ${files.mkString(",")}")
    // tagged layout ⇒ the scan reports key-grouped partitioning and a
    // same-key group-by plans with no shuffle exchange
    val p = spark.table(t).groupBy("k").agg(sum("v"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"),
      s"bucketed group-by must not shuffle:\n$p")
  }

  test("complete mode replaces the table each epoch, history preserved") {
    import spark.implicits._
    val t = mkTable("s4", "(k STRING, n BIGINT)")
    val ck = Files.createTempDirectory("graft_psink_ck4").toString
    val ingest = new graft.streaming.AsyncIngest[(String, Long)](spark.sqlContext)
    val q = ingest.toDS().toDF("k", "v")
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ck).toTable(t)
    ingest.saveAllAsync(Seq(("a", 1L), ("b", 2L), ("a", 3L)))
    q.processAllAvailable()
    val first = spark.table(t).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(first === Map("a" -> 2L, "b" -> 1L))
    ingest.saveAllAsync(Seq(("b", 4L), ("c", 5L)))
    q.processAllAvailable()
    q.stop()
    val after = spark.table(t).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(after.length === 3, s"table must hold exactly the last epoch: ${after.mkString(",")}")
    assert(after.toMap === Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
    // the first epoch's aggregate is still one VERSION AS OF away
    val hist = spark.sql("CALL graft_ps.system.history(table => 'lake.s4')").collect()
    val firstEpochV = hist.map(_.getLong(0)).sorted.apply(1) // v1=enable, v2=epoch 0
    val back = spark.sql(s"SELECT * FROM $t VERSION AS OF $firstEpochV")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(back === first)
  }

  test("epoch files are ledger-gated: a crashed epoch is invisible and vacuumable") {
    val t = mkTable("s5")
    spark.range(0, 10).select(col("id"), (col("id") * 2).as("score"))
      .writeTo(t).append()
    val dir = s"$warehouse/lake/s5"
    graft.sources.ParquetVersions.enable(dir)
    val data = new org.apache.hadoop.fs.Path(s"$dir/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate an epoch that crashed between its renames and its
    // publish: a stream-named file no version references
    val donor = fs.listStatus(data)
      .filter(_.getPath.getName.endsWith(".parquet")).head
    val orphan = new org.apache.hadoop.fs.Path(data,
      "stream-deadqid-7-00000-0.parquet")
    org.apache.hadoop.fs.FileUtil.copy(fs, donor.getPath, fs, orphan, false,
      spark.sparkContext.hadoopConfiguration)
    assert(spark.table(t).count() === 10,
      "a crashed epoch's files must not surface (no torn epochs)")
    // fresh debris survives vacuum (a live epoch may be mid-publish)…
    assert(!graft.sources.ParquetVersions.vacuum(dir, retainLast = 2)
      .contains(orphan.getName))
    assert(fs.exists(orphan))
    // …old debris is reclaimed
    val old = System.currentTimeMillis() -
      graft.sources.ParquetVersions.InFlightGraceMs - 60000L
    fs.setTimes(orphan, old, old)
    assert(graft.sources.ParquetVersions.vacuum(dir, retainLast = 2)
      .contains(orphan.getName))
    assert(!fs.exists(orphan))
    assert(spark.table(t).count() === 10)
  }
}
