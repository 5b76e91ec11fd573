package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Change data feed ([[ChangeFeed]]) over the version ledger: per-commit
  * changelog blocks, net endpoint diffs that cancel copy-on-write
  * carry-over rows, the explicit-`segments` scan restriction it rides
  * on, and the parquet tier's equivalent. */
class ChangeFeedSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def write(dir: String, rows: Seq[(String, Long, String)]): Unit = {
    import spark.implicits._
    rows.toDF("user_id", "amount", "sha256sum")
      .select(col("user_id"), col("amount"),
        lit(null).cast("binary").as("msg"), col("sha256sum"))
      .repartition(1)
      .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    ()
  }

  private def changeRows(df: DataFrame): Set[(String, Long, String, Long)] =
    df.select("user_id", "amount", ChangeFeed.CHANGE_TYPE_COL,
        ChangeFeed.COMMIT_VERSION_COL)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet

  test("changelog mode: one tagged block per commit, appends and deletes") {
    val dir = Files.createTempDirectory("graft_cdc_log").toString
    write(dir, Seq(("u1", 10L, "h1"), ("u2", 20L, "h2")))
    assert(LogVersions.enable(dir) === 1L)
    write(dir, Seq(("u3", 30L, "h3")))                    // v2: insert
    write(dir, Seq(("u4", 40L, "h4"), ("u5", 50L, "h5"))) // v3: insert
    // v4: whole-segment DELETE (zone-provable: u3's segment only)
    LogDelete.deleteWhere(spark, dir,
      Array(org.apache.spark.sql.sources.EqualTo("user_id", "u3")))
    val vTo = LogVersions.latest(dir).get._1

    val feed = changeRows(ChangeFeed.logChanges(spark, dir, 1L, vTo))
    assert(feed === Set(
      ("u3", 30L, "insert", 2L),
      ("u4", 40L, "insert", 3L), ("u5", 50L, "insert", 3L),
      ("u3", 30L, "delete", vTo)))

    // sub-span: only the commits inside (from, to] appear
    val sub = changeRows(ChangeFeed.logChanges(spark, dir, 2L, 3L))
    assert(sub === Set(("u4", 40L, "insert", 3L), ("u5", 50L, "insert", 3L)))
    // empty span
    assert(ChangeFeed.logChanges(spark, dir, 3L, 3L).count() === 0L)
  }

  test("net mode cancels copy-on-write carry-over rows (UPDATE rewrite)") {
    val wh = Files.createTempDirectory("graft_cdc_wh").toString
    spark.conf.set("spark.sql.catalog.graft_cdc", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdc.ops")
    spark.sql("""CREATE TABLE graft_cdc.ops.t
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    import spark.implicits._
    // ONE segment holding 100 rows — the UPDATE rewrites the whole
    // segment but touches only 10 rows; net mode must report exactly
    // those 10, not the 90 carried-over copies
    (0L until 100L).map(i => (s"u${i % 7}", i, s"h$i")).toDF("user_id", "amount", "sha256sum")
      .select(col("user_id"), col("amount"),
        lit(null).cast("binary").as("msg"), col("sha256sum"))
      .repartition(1)
      .writeTo("graft_cdc.ops.t").append()
    val dir = s"$wh/ops/t"
    LogVersions.enable(dir)
    spark.sql("UPDATE graft_cdc.ops.t SET amount = amount + 1000 WHERE amount < 10")
    val vTo = LogVersions.latest(dir).get._1

    // changelog mode is segment-granular: the rewrite reports the whole
    // old segment deleted + whole new segment inserted (200 rows)
    assert(ChangeFeed.logChanges(spark, dir, 1L, vTo).count() === 200L)

    // net mode is row-exact
    val net = ChangeFeed.logChanges(spark, dir, 1L, vTo, net = true)
      .select("user_id", "amount", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val expected =
      (0L until 10L).map(i => (s"u${i % 7}", i + 1000L, "insert")).toSet ++
        (0L until 10L).map(i => (s"u${i % 7}", i, "delete")).toSet
    assert(net === expected)
  }

  test("net mode preserves row MULTIPLICITY (r20 single-aggregate netOf)") {
    // exceptAll semantics are multiset: a row appearing 3× in the TO
    // pool and 1× in the FROM pool must net to exactly 2 insert COPIES
    // (and the reverse to delete copies). The r20 netOf rewrite (one
    // signed-count aggregate + ReplicateRows) must reproduce that —
    // a set-compare cannot see a lost or doubled copy, so this test
    // counts them.
    val dir = Files.createTempDirectory("graft_cdc_multi").toString
    // v1 baseline: one segment with the SAME row twice + a singleton
    write(dir, Seq(("dup", 1L, "h"), ("dup", 1L, "h"), ("solo", 2L, "s")))
    assert(LogVersions.enable(dir) === 1L)
    // v2: rewrite-shaped change — whole-segment delete + re-insert with
    // the dup row now 5× and solo gone (net: +3 dup copies, −1 solo).
    // deleteWhere(amount >= 0) retires the segment; the fresh append
    // lands the new content.
    LogDelete.deleteWhere(spark, dir, Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("amount", 0L)))
    write(dir, Seq.fill(5)(("dup", 1L, "h")))
    val vTo = LogVersions.latest(dir).get._1
    val net = ChangeFeed.logChanges(spark, dir, 1L, vTo, net = true)
      .groupBy("user_id", ChangeFeed.CHANGE_TYPE_COL).count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(net === Set(("dup", "insert", 3L), ("solo", "delete", 1L)))
  }

  test("segments option: planning restricted to the allowlist; unknown names fail") {
    val dir = Files.createTempDirectory("graft_cdc_seg").toString
    write(dir, Seq(("u1", 10L, "h1")))
    write(dir, Seq(("u2", 20L, "h2")))
    write(dir, Seq(("u3", 30L, "h3")))
    val names = LimitHashLog.segments(dir).map(p => new Path(p._1).getName)
    assert(names.size === 3)
    // expected content of the named segment, via the _segment metadata
    // column on an unrestricted read
    val expectedUsers = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .select(col("user_id"), col("_segment"))
      .collect().filter(_.getString(1) == names.head).map(_.getString(0)).toSeq
    assert(expectedUsers.size === 1)
    val one = spark.read.format(LimitHashLog.FORMAT)
      .option("segments", names.head).load(dir)
    assert(one.select("user_id").collect().map(_.getString(0)).toSeq === expectedUsers)
    // the restriction happens at PLANNING: the scan builds splits for
    // exactly one segment
    assert(one.rdd.getNumPartitions === 1)
    val err = intercept[Exception] {
      spark.read.format(LimitHashLog.FORMAT)
        .option("segments", "segment-nonexistent").load(dir).count()
    }
    assert(err.getMessage.contains("not in the scanned snapshot") ||
      Option(err.getCause).exists(_.getMessage.contains("not in the scanned snapshot")))
    // metadata-served COUNT honors the allowlist (no overcount from
    // the full snapshot's stats)
    val two = spark.read.format(LimitHashLog.FORMAT)
      .option("segments", names.take(2).mkString(",")).load(dir)
    assert(two.count() === 2L)
  }

  test("streaming changelog: deletes flow as retractions; checkpoint restart resumes") {
    val dir = Files.createTempDirectory("graft_cdc_stream").toString
    val ck = Files.createTempDirectory("graft_cdc_stream_ck").toString
    write(dir, Seq(("u1", 10L, "h1"), ("u2", 20L, "h2")))
    LogVersions.enable(dir) // v1
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, String, Long)]()
    def start() = spark.readStream.format(LimitHashLog.FORMAT)
      .option("changeFeed", "true").option("startVersion", "1").load(dir)
      .select("user_id", "amount", ChangeFeed.CHANGE_TYPE_COL,
        ChangeFeed.COMMIT_VERSION_COL)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(
          (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))): Unit)
      .start()
    write(dir, Seq(("u3", 30L, "h3"))) // v2
    LogDelete.deleteWhere(spark, dir,
      Array(org.apache.spark.sql.sources.EqualTo("user_id", "u3"))) // v3
    val q = start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(seen.asScala.toSet === Set(
      ("u3", 30L, "insert", 2L),
      ("u3", 30L, "delete", 3L)))
    // restart: only changes after the committed ordinal flow
    seen.clear()
    write(dir, Seq(("u4", 40L, "h4"))) // v4
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.asScala.toSet === Set(("u4", 40L, "insert", 4L)))
    // an un-versioned log fails loudly
    val plain = Files.createTempDirectory("graft_cdc_plain").toString
    write(plain, Seq(("u1", 1L, "h")))
    val err = intercept[Exception] {
      val bad = spark.readStream.format(LimitHashLog.FORMAT)
        .option("changeFeed", "true").load(plain)
        .writeStream.format("noop").start()
      try bad.processAllAvailable() finally bad.stop()
    }
    assert(err.getMessage.contains("versioned") ||
      Option(err.getCause).exists(_.getMessage.contains("versioned")))
  }

  test("admission control: changelog catch-up drains in bounded commit " +
      "batches on both tiers; exact union") {
    // log tier: 6 pending commits, maxCommitsPerTrigger=2 -> 3 batches
    val dir = Files.createTempDirectory("graft_cdc_admit").toString
    write(dir, Seq(("u0", 0L, "h0")))
    LogVersions.enable(dir) // v1
    (1 to 6).foreach(i => write(dir, Seq((s"u$i", i.toLong, s"h$i")))) // v2..v7
    val ck = Files.createTempDirectory("graft_cdc_admit_ck").toString
    val batchCount = new java.util.concurrent.atomic.AtomicInteger
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long)]()
    val q = spark.readStream.format(LimitHashLog.FORMAT)
      .option("changeFeed", "true").option("startVersion", "1")
      .option("maxCommitsPerTrigger", "2").load(dir)
      .select("user_id", ChangeFeed.COMMIT_VERSION_COL)
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.collect()
        if (rows.nonEmpty) {
          batchCount.incrementAndGet()
          rows.foreach(r => seen.add((r.getString(0), r.getLong(1))))
          // a 2-commit batch never carries more than 2 distinct commits
          assert(rows.map(_.getLong(1)).distinct.length <= 2)
        }
        () }
      .start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    assert(batchCount.get() === 3,
      s"6 commits under maxCommitsPerTrigger=2 must drain in 3 batches, got ${batchCount.get()}")
    assert(seen.asScala.toSet === (1 to 6).map(i => (s"u$i", (i + 1).toLong)).toSet)

    // parquet tier: same shape through the stream object (offset math)
    val wh = Files.createTempDirectory("graft_cdc_admit_pwh").toString
    spark.conf.set("spark.sql.catalog.graft_cdca", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdca.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdca.lake")
    spark.sql("CREATE TABLE graft_cdca.lake.t (id BIGINT)")
    import spark.implicits._
    Seq(0L).toDF("id").writeTo("graft_cdca.lake.t").append()
    val pdir = s"$wh/lake/t"
    ParquetVersions.enable(pdir) // v1
    (1 to 5).foreach { i =>
      Seq(i.toLong).toDF("id").repartition(1).writeTo("graft_cdca.lake.t").append()
      ParquetVersions.catchUp(pdir) // v2..v6
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType)))
    val stream = new ParquetChangesMicroBatchStream(pdir, schema, Some(1L),
      maxCommitsPerTrigger = Some(2))
    var off = stream.initialOffset()
    val steps = Iterator.continually {
      val next = stream.latestOffset(off, stream.getDefaultReadLimit)
      val advanced = next.json() != off.json()
      if (advanced) {
        val parts = stream.planInputPartitions(off, next)
        assert(parts.length <= 2, s"batch spans >2 commits: ${parts.length}")
        off = next
      }
      advanced
    }.takeWhile(identity).size
    assert(steps === 3, s"5 commits under maxCommitsPerTrigger=2 must take 3 steps, got $steps")
    assert(off.asInstanceOf[LogVersionOffset].ordinal === 6L)

    // byte budget: 1 byte still admits one commit per step (progress)
    val bstream = new ParquetChangesMicroBatchStream(pdir, schema, Some(1L),
      maxBytesPerTrigger = Some(1L))
    var boff = bstream.initialOffset()
    var bsteps = 0
    var moved = true
    while (moved) {
      val next = bstream.latestOffset(boff, bstream.getDefaultReadLimit)
      moved = next.json() != boff.json()
      if (moved) { bsteps += 1; boff = next }
    }
    assert(bsteps === 5, s"1-byte budget must admit exactly one commit per step, got $bsteps")
  }

  test("CdcMatView: replayed batches fold exactly once; retraction empties a key") {
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft_cdcmv").toString + "/v"
    val view = new graft.streaming.CdcMatView(viewDir)
    view.seed(Seq(("u1", 10L), ("u1", 30L), ("u2", 5L)).toDF("user_id", "amount"))
    def batch(rows: Seq[(String, Long, String)]) =
      rows.toDF("user_id", "amount", "_change_type")
    view.maintain(batch(Seq(("u1", 100L, "insert"), ("u2", 5L, "delete"))), 0L)
    // replay of batch 0 with DIFFERENT content must be a no-op (the
    // guard is the batchId, not the rows)
    view.maintain(batch(Seq(("u9", 1L, "insert"))), 0L)
    val got = view.read(spark).select("user_id", "n", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // u2 retracted to zero → gone; u1 = 2 seed rows + 1 insert
    assert(got === Set(("u1", 3L, 140L)))
    view.maintain(batch(Seq(("u3", 7L, "insert"))), 1L)
    assert(view.read(spark).count() === 2)
  }

  test("CdcMatView maintenance is O(delta): untouched buckets carry by name") {
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft_cdcmv_b").toString + "/v"
    val view = new graft.streaming.CdcMatView(viewDir)
    // force the ADAPTIVE count to its maximum for this toy view (the
    // default thresholds would give it one bucket — see the 1-bucket
    // test below), so the per-bucket carry-over machinery is exercised
    spark.conf.set("spark.graft.cdcview.bucket.rows", "4")
    spark.conf.set("spark.graft.cdcview.bucket.bytes", "64")
    try {
    // many keys spread across the hash buckets
    view.seed((0 until 200).map(i => (s"user$i", i.toLong))
      .toDF("user_id", "amount"))
    val fs = new Path(viewDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def bucketFiles(): Map[String, Long] =
      fs.listStatus(new Path(viewDir)).filter(s => s.isFile &&
        s.getPath.getName.endsWith(".parquet"))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = bucketFiles()
    assert(before.size > 4, s"seed should spread buckets: ${before.keySet}")
    // a delta touching ONE key rewrites only that key's bucket
    view.maintain(Seq(("user7", 1000L, "insert"))
      .toDF("user_id", "amount", "_change_type"), 0L)
    val after = bucketFiles()
    val touchedBucket = graft.streaming.CdcMatView.bucketOfName(
      after.keys.find(n => !before.contains(n)).getOrElse(fail("no new file")))
    val carried = before.keySet intersect after.keySet
    assert(carried.size === before.size - 1,
      s"exactly one bucket rewritten; before=${before.keySet} after=${after.keySet}")
    // carried files keep name AND bytes (hardlink/copy of the original)
    assert(carried.forall(n =>
      graft.streaming.CdcMatView.bucketOfName(n) != touchedBucket))
    // and the view is still exact
    val u7 = view.read(spark).filter(col("user_id") === "user7")
      .select("n", "cents").head
    assert(u7.getLong(0) === 2L && u7.getLong(1) === 1007L)
    assert(view.read(spark).count() === 200)
    } finally {
      spark.conf.unset("spark.graft.cdcview.bucket.rows")
      spark.conf.unset("spark.graft.cdcview.bucket.bytes")
    }
  }

  test("CdcMatView: a toy view stays at ONE bucket; growth migrates the layout") {
    // VERDICT r11 #4: the fixed 32-bucket layout made tiny views pay 32
    // files of generation orchestration per trigger. Adaptive count:
    // a small view seeds and maintains at one bucket...
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft_cdcmv_a").toString + "/v"
    val view = new graft.streaming.CdcMatView(viewDir)
    view.seed((0 until 50).map(i => (s"u$i", i.toLong)).toDF("user_id", "amount"))
    val fs = new Path(viewDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def files(): Seq[String] = fs.listStatus(new Path(viewDir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.getName).toSeq
    assert(files().forall(_.startsWith("b0-")), s"one bucket expected: ${files()}")
    assert(files().size === 1)
    view.maintain(Seq(("u7", 5L, "insert")).toDF("user_id", "amount", "_change_type"), 0L)
    assert(files().forall(_.startsWith("b0-")), s"still one bucket: ${files()}")
    assert(view.read(spark).count() === 50)
    // ...and once the view outgrows the per-bucket threshold, the next
    // maintenance migrates the whole layout to a larger count in one
    // full merge (grow-only; ids re-derived, view stays exact)
    spark.conf.set("spark.graft.cdcview.bucket.bytes", "64")
    try {
      view.maintain(Seq(("u1", 1L, "insert")).toDF("user_id", "amount", "_change_type"), 1L)
      val buckets = files().flatMap(graft.streaming.CdcMatView.bucketOfName).distinct
      assert(buckets.size > 1, s"layout must have grown: ${files()}")
      assert(view.read(spark).count() === 50)
      val u1 = view.read(spark).filter(col("user_id") === "u1")
        .select("n", "cents").head
      assert(u1.getLong(0) === 2L && u1.getLong(1) === 2L)
    } finally spark.conf.unset("spark.graft.cdcview.bucket.bytes")
  }

  test("CdcMatView: a batch retracting the view to EMPTY still blocks its replay") {
    // Regression: the batchId high-water mark lived only in data rows,
    // so an empty generation erased it and a crash-replay of that batch
    // re-applied its deletes — retracted keys resurrected with n = -1.
    // The `_b-<id>` marker file now carries the watermark through empty
    // generations.
    import spark.implicits._
    val viewDir = Files.createTempDirectory("graft_cdcmv_e").toString + "/v"
    val view = new graft.streaming.CdcMatView(viewDir)
    view.seed(Seq(("u1", 10L)).toDF("user_id", "amount"))
    def batch(rows: Seq[(String, Long, String)]) =
      rows.toDF("user_id", "amount", "_change_type")
    // batch 0 retracts the only key: the view becomes empty
    view.maintain(batch(Seq(("u1", 10L, "delete"))), 0L)
    assert(view.read(spark).count() === 0)
    // crash-replay of batch 0: must be a no-op, NOT a double-delete
    view.maintain(batch(Seq(("u1", 10L, "delete"))), 0L)
    assert(view.read(spark).count() === 0,
      "replaying the retraction batch must not resurrect negative counts")
    // the view keeps folding afterwards
    view.maintain(batch(Seq(("u5", 3L, "insert"))), 1L)
    val after = view.read(spark).select("user_id", "n", "cents")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(after === Set(("u5", 1L, 3L)))
  }

  test("maintenance is invisible to the net feed; the changelog nets it to zero") {
    val dir = Files.createTempDirectory("graft_cdc_maint").toString
    write(dir, Seq(("u1", 10L, "h1"), ("u2", 20L, "h2")))
    LogVersions.enable(dir) // v1
    write(dir, Seq(("u3", 30L, "h3")))                    // v2: real change
    // maintenance: compaction rewrites the physical layout (remove all
    // three segments, add the packed one) without changing a row
    Compaction.compactLog(spark, dir, "cdcpack", 64L << 20)
    val vTo = LogVersions.latest(dir).get._1
    assert(vTo >= 3L)
    // net mode: the only reported change is the real append
    val net = ChangeFeed.logChanges(spark, dir, 1L, vTo, net = true)
      .select("user_id", "amount", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(net === Set(("u3", 30L, "insert")))
    // changelog mode reports the physical blocks faithfully — and
    // NETTING them per row (+insert/−delete) also yields only the
    // real change: maintenance contributes balanced pairs
    val signed = ChangeFeed.logChanges(spark, dir, 1L, vTo)
      .select("user_id", "amount", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val balance = signed.groupBy(r => (r._1, r._2)).view.mapValues(rs =>
      rs.count(_._3 == "insert") - rs.count(_._3 == "delete")).toMap
    assert(balance.filter(_._2 != 0).keySet === Set(("u3", 30L)))
  }

  test("parquet streaming changelog: retractions + checkpoint resume") {
    val wh = Files.createTempDirectory("graft_cdc_pswh").toString
    spark.conf.set("spark.sql.catalog.graft_cdcs", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdcs.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdcs.lake")
    spark.sql("CREATE TABLE graft_cdcs.lake.t (id BIGINT, score BIGINT)")
    import spark.implicits._
    (0L until 20L).map(i => (i, i * 2)).toDF("id", "score")
      .repartition(1).writeTo("graft_cdcs.lake.t").append()
    val dir = s"$wh/lake/t"
    ParquetVersions.enable(dir) // v1
    val ck = Files.createTempDirectory("graft_cdc_ps_ck").toString
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, String, Long)]()
    def start() = spark.readStream.format("graft.sources.ParquetChanges")
      .option("path", dir).option("startVersion", "1").load()
      .writeStream.option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(
          (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))): Unit)
      .start()
    // v2+: append 5 more rows; then delete id >= 20 (drops only the new file)
    (20L until 25L).map(i => (i, i * 2)).toDF("id", "score")
      .repartition(1).writeTo("graft_cdcs.lake.t").append()
    ParquetVersions.catchUp(dir)
    spark.sql("DELETE FROM graft_cdcs.lake.t WHERE id >= 20")
    val q = start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    val byKind = seen.asScala.toSeq.groupBy(_._3)
    assert(byKind("insert").map(_._1).toSet === (20L until 25L).toSet)
    assert(byKind("delete").map(_._1).toSet === (20L until 25L).toSet)
    assert(byKind("insert").forall(r => r._2 === r._1 * 2))
    // restart resumes: a fresh append flows alone
    seen.clear()
    (100L until 103L).map(i => (i, i * 2)).toDF("id", "score")
      .repartition(1).writeTo("graft_cdcs.lake.t").append()
    ParquetVersions.catchUp(dir)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(seen.asScala.toSeq.map(r => (r._1, r._3)).toSet ===
      (100L until 103L).map((_, "insert")).toSet)
  }

  test("parquet tier: changelog and net modes over the generation ledger") {
    val wh = Files.createTempDirectory("graft_cdc_pwh").toString
    spark.conf.set("spark.sql.catalog.graft_cdcp", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdcp.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdcp.lake")
    spark.sql("CREATE TABLE graft_cdcp.lake.t (id BIGINT, score BIGINT)")
    import spark.implicits._
    (0L until 50L).map(i => (i, i * 2)).toDF("id", "score")
      .repartition(1).writeTo("graft_cdcp.lake.t").append()
    val dir = s"$wh/lake/t"
    ParquetVersions.enable(dir)
    spark.sql("DELETE FROM graft_cdcp.lake.t WHERE id >= 40") // v2 (after catch-up)
    (100L until 110L).map(i => (i, i * 2)).toDF("id", "score")
      .repartition(1).writeTo("graft_cdcp.lake.t").append()
    ParquetVersions.catchUp(dir)
    val vTo = ParquetVersions.latest(dir).get._1

    val net = ChangeFeed.parquetChanges(spark, dir, 1L, vTo, net = true)
      .select("id", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (40L until 50L).map((_, "delete")).toSet ++
      (100L until 110L).map((_, "insert")).toSet
    assert(net === expected)

    // changelog mode: every change is tagged with a commit ordinal in
    // the span and the multiset of (row, type) nets to the same diff
    val log = ChangeFeed.parquetChanges(spark, dir, 1L, vTo)
      .select("id", ChangeFeed.CHANGE_TYPE_COL, ChangeFeed.COMMIT_VERSION_COL)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(log.forall { case (_, _, v) => v > 1L && v <= vTo })
    val balance = log.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
    val netFromLog = balance.collect {
      case ((id, "insert"), n) if n > balance.getOrElse((id, "delete"), 0) => (id, "insert")
      case ((id, "delete"), n) if n > balance.getOrElse((id, "insert"), 0) => (id, "delete")
    }.toSet
    assert(netFromLog === expected)
  }

  test("partitioned table: a wide span's one-listing fast path resolves rel paths") {
    // regression: the >8-distinct-files path once keyed the single
    // listing by BARE file name, which can never match a partitioned
    // table's 'col~val/...' ledger names — every wide changelog read of
    // a partitioned table failed with 'file is gone ... vacuumed'
    val wh = Files.createTempDirectory("graft_cdc_ptwh").toString
    spark.conf.set("spark.sql.catalog.graft_cdcpt", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdcpt.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdcpt.lake")
    spark.sql("""CREATE TABLE graft_cdcpt.lake.t (k BIGINT, v BIGINT)
                 PARTITIONED BY (k)""")
    // 12 single-partition inserts -> 12 distinct diff files (> 8)
    (0 until 12).foreach { i =>
      spark.sql(s"INSERT INTO graft_cdcpt.lake.t VALUES ($i, ${i * 10})")
    }
    val dir = s"$wh/lake/t"
    val vTo = ParquetVersions.latest(dir).get._1
    val log = ChangeFeed.parquetChanges(spark, dir, 1L, vTo)
      .select("k", "v", ChangeFeed.CHANGE_TYPE_COL)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(log === (0L until 12L).map(i => (i, i * 10, "insert")).toSet, log)
  }

  test("batch changelog over a 50-commit span plans ONE scan node") {
    // VERDICT r10 #4: the old shape unioned a DataFrame pair per commit
    // — O(versions) scan nodes, superlinear analysis. The new batch
    // changelog rides the streaming readers' partition-per-diff-file
    // scan: one node regardless of span length, same rows.
    val wh = Files.createTempDirectory("graft_cdc_span").toString
    spark.conf.set("spark.sql.catalog.graft_cdcl", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_cdcl.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_cdcl.lake")
    spark.sql("CREATE TABLE graft_cdcl.lake.t AS SELECT id, id * 2 AS v FROM range(10)")
    val dir = s"$wh/lake/t"
    ParquetVersions.enable(dir)
    (0 until 50).foreach { i =>
      ParquetVersions.commit(dir) { live => live } // empty commits bump ordinals
    }
    spark.range(100, 105).selectExpr("id", "id * 2 AS v")
      .repartition(1).writeTo("graft_cdcl.lake.t").append()
    ParquetVersions.catchUp(dir)
    val vTo = ParquetVersions.latest(dir).get._1
    assert(vTo >= 51L)
    val log = ChangeFeed.parquetChanges(spark, dir, 1L, vTo)
    val scans = log.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.length === 1, s"expected one scan node, got ${scans.length}")
    assert(log.select("id").collect().map(_.getLong(0)).sorted.toSeq
      === (100L until 105L).toSeq)
    // the log tier's batch changelog takes the same single-scan shape
    val lwh = Files.createTempDirectory("graft_cdc_span_log").toString
    val ldir = s"$lwh/log"
    new Path(ldir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      .mkdirs(new Path(ldir))
    (0 until 3).foreach { i =>
      spark.range(i * 5, i * 5 + 5).selectExpr(
          "concat('u', CAST(id AS STRING)) AS user_id", "id AS amount",
          "CAST(NULL AS BINARY) AS msg",
          "sha2(CAST(id AS STRING), 256) AS sha256sum")
        .repartition(1).write.format(LimitHashLog.FORMAT).mode("append").save(ldir)
    }
    LogVersions.enable(ldir)
    spark.range(100, 103).selectExpr(
        "concat('u', CAST(id AS STRING)) AS user_id", "id AS amount",
        "CAST(NULL AS BINARY) AS msg",
        "sha2(CAST(id AS STRING), 256) AS sha256sum")
      .repartition(1).write.format(LimitHashLog.FORMAT).mode("append").save(ldir)
    val lvTo = LogVersions.latest(ldir).get._1
    val llog = ChangeFeed.logChanges(spark, ldir, 1L, lvTo)
    val lscans = llog.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(lscans.length === 1)
    assert(llog.select("amount").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(100L, 101L, 102L))
  }
}
