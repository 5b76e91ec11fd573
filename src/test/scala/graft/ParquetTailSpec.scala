package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plain streaming reads of catalog parquet tables
  * ([[ParquetTailMicroBatchStream]]): snapshot-then-tail over ledger
  * ordinals, catch-up folding of plain INSERTs, loud failure on
  * retiring commits, exact skip of maintenance commits, and
  * `startVersion` composition — plus the full table-to-table pipeline
  * with the streaming sink on the other end. */
class ParquetTailSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_ptail_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_pt", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_pt.warehouse", warehouse)
    s
  }

  private def mkTable(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pt.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_pt.lake.$name")
    spark.sql(s"CREATE TABLE graft_pt.lake.$name (id BIGINT, score BIGINT)")
    s"graft_pt.lake.$name"
  }

  private def feed(t: String, a: Long, b: Long): Unit =
    spark.range(a, b).select(col("id"), (col("id") * 2).as("score"))
      .coalesce(1).writeTo(t).append()

  /** All messages down the cause chain (streaming wraps deeply). */
  private def messages(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")

  test("table-to-table: snapshot, then tailed appends, through the streaming sink") {
    val a = mkTable("a1")
    val b = mkTable("b1")
    feed(a, 0L, 10L)
    spark.sql("CALL graft_pt.system.enable_versioning(table => 'lake.a1')")
    val ck = Files.createTempDirectory("graft_ptail_ck1").toString
    val q = spark.readStream.table(a).writeStream
      .option("checkpointLocation", ck).toTable(b)
    q.processAllAvailable()
    assert(spark.table(b).count() === 10, "first batch must be the full snapshot")
    feed(a, 10L, 15L) // plain INSERT — un-ledgered until the stream's catch-up
    q.processAllAvailable()
    q.stop()
    val got = spark.table(b).orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 15L).map(i => (i, i * 2)),
      s"tail must land exactly the appends: ${got.mkString(",")}")
  }

  test("a retiring commit fails the stream loudly by default") {
    val t = mkTable("c1")
    feed(t, 0L, 10L)
    spark.sql("CALL graft_pt.system.enable_versioning(table => 'lake.c1')")
    val ck = Files.createTempDirectory("graft_ptail_ck2").toString
    val seen = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.table(t).writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        seen.addAndGet(df.count()); () }
      .start()
    q.processAllAvailable()
    assert(seen.get() === 10)
    feed(t, 10L, 20L)
    spark.sql("CALL graft_pt.system.compact_table(table => 'lake.c1')")
    val e = intercept[Exception] { q.processAllAvailable() }
    assert(messages(e).contains("retires"), messages(e))
    q.stop()
  }

  test("skipNonAppends skips maintenance commits whole — no loss, no duplicates") {
    val t = mkTable("c2")
    feed(t, 0L, 10L)
    spark.sql("CALL graft_pt.system.enable_versioning(table => 'lake.c2')")
    val ck = Files.createTempDirectory("graft_ptail_ck3").toString
    val ids = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val dups = new java.util.concurrent.atomic.AtomicLong
    val q = spark.readStream.option("skipNonAppends", "true").table(t)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.select("id").collect().foreach { r =>
          if (!ids.add(r.getLong(0))) dups.incrementAndGet() }
        () }
      .start()
    q.processAllAvailable()
    feed(t, 10L, 20L)
    q.processAllAvailable()
    // compaction retires + rewrites: with skipNonAppends the commit is
    // skipped WHOLE — the rewritten files carry no rows the stream
    // hasn't already seen
    spark.sql("CALL graft_pt.system.compact_table(table => 'lake.c2')")
    q.processAllAvailable()
    feed(t, 20L, 25L)
    q.processAllAvailable()
    q.stop()
    assert(dups.get() === 0, s"${dups.get()} duplicate rows streamed")
    assert(ids.size() === 25, s"expected 25 distinct ids, got ${ids.size()}")
  }

  test("startVersion pins the snapshot; un-versioned tables fail loudly") {
    val t = mkTable("c3")
    feed(t, 0L, 5L)
    spark.sql("CALL graft_pt.system.enable_versioning(table => 'lake.c3')") // v1 = 5 rows
    feed(t, 5L, 12L)
    spark.sql("CALL graft_pt.system.compact_table(table => 'lake.c3')") // folds the append
    val ck = Files.createTempDirectory("graft_ptail_ck4").toString
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val q = spark.readStream.option("startVersion", "1")
      .option("skipNonAppends", "true").table(t)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.select("id").collect().foreach(r => seen.add(r.getLong(0))); () }
      .start()
    q.processAllAvailable()
    q.stop()
    // snapshot(v1) = ids 0-4; the catch-up commit appended 5-11; the
    // compaction commit is skipped whole
    assert(seen.size() === 12, s"got ${seen.size()}: ${seen}")

    val u = mkTable("c4")
    feed(u, 0L, 3L)
    val ck2 = Files.createTempDirectory("graft_ptail_ck5").toString
    val e = intercept[Exception] {
      val qq = spark.readStream.table(u).writeStream
        .option("checkpointLocation", ck2)
        .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) => () }
        .start()
      try qq.processAllAvailable() finally qq.stop()
    }
    assert(messages(e).contains("enable versioning"), messages(e))
  }

  test("masks: the snapshot filters lightweight-deleted rows; mask commits are loud") {
    val t = mkTable("m1")
    val out = mkTable("m2")
    feed(t, 0L, 20L)
    spark.sql("CALL graft_pt.system.enable_versioning(table => 'lake.m1')")
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE id < 5")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    // snapshot batch: masked rows must not leak into the stream
    val ck = Files.createTempDirectory("graft_ptail_ckm").toString
    val q = spark.readStream.table(t).writeStream
      .option("checkpointLocation", ck).toTable(out)
    q.processAllAvailable()
    q.stop()
    assert(spark.table(out).collect().map(_.getLong(0)).sorted.toSeq
      === (5L until 20L).toSeq, "masked rows leaked into the snapshot batch")
    // a mask-only commit mid-stream fails loudly (appends-only contract)
    val ck2 = Files.createTempDirectory("graft_ptail_ckm2").toString
    val out2 = mkTable("m3")
    val q2 = spark.readStream.table(t).writeStream
      .option("checkpointLocation", ck2).toTable(out2)
    q2.processAllAvailable()
    spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql(s"DELETE FROM $t WHERE id = 7")
    finally spark.conf.unset(DeleteMasks.MODE_KEY)
    val e = intercept[Exception] { q2.processAllAvailable() }
    assert(messages(e).contains("delete masks"), messages(e))
    q2.stop()
  }
}
