package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.LimitHashLog

/** The custom DataSource V2 must prune, push, split, and report stats —
  * each assertion reads the EXECUTED plan, not just the results. */
class DsV2SourceSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  private def b64(s: String): String =
    Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** 3 segment files, 6 rows total. */
  private lazy val logDir: String = {
    val dir: Path = Files.createTempDirectory("graft_lhlog")
    val rows = Seq(
      Seq(s"u1\t10\t${b64("m1")}\th1", s"u2\t20\t\th2"),
      Seq(s"u1\t30\t${b64("m3")}\th3", s"u3\t40\t${b64("m4")}\th4"),
      Seq(s"u2\t50\t${b64("m5")}\th5", s"u1\t60\t${b64("m6")}\th1"))
    rows.zipWithIndex.foreach { case (lines, i) =>
      Files.write(dir.resolve(f"seg-$i%03d.log"), lines.mkString("\n").getBytes(StandardCharsets.UTF_8))
    }
    dir.toString
  }

  private def read(): DataFrame =
    spark.read.format(LimitHashLog.FORMAT).load(logDir)

  private def scanOf(df: DataFrame): BatchScanExec = {
    val plan = df.queryExecution.executedPlan
    // AQE wraps multi-stage plans; the scan lives in the adaptive subtree
    val expanded = plan.collectFirst {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    expanded.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))
  }

  test("full read: schema, rows, null msg, base64 payloads") {
    val df = read()
    assert(df.schema === LimitHashLog.SCHEMA)
    val rows = df.orderBy("amount").collect()
    assert(rows.length === 6)
    assert(rows.head.getString(0) === "u1")
    assert(new String(rows.head.getAs[Array[Byte]]("msg"), StandardCharsets.UTF_8) === "m1")
    assert(rows(1).isNullAt(2)) // empty msg field → null payload
  }

  test("split planning: tiny segments bin-pack into one split; a byte target re-splits them") {
    // 3 tiny segments fit one 128MB-default split — a task per tiny
    // segment is the scheduler anti-pattern the packing exists for
    assert(read().rdd.getNumPartitions === 1)
    // with a target smaller than any segment, each gets its own split
    val fine = spark.read.format(LimitHashLog.FORMAT)
      .option("maxPartitionBytes", "1").load(logDir)
    assert(fine.rdd.getNumPartitions === 3)
    assert(fine.count() === read().count())
  }

  test("column pruning reaches the scan (ReadSchema is the projection)") {
    val df = read().select("user_id")
    assert(scanOf(df).scan.readSchema().fieldNames.toSeq === Seq("user_id"))
    assert(df.distinct().count() === 3)
  }

  test("equality filters push into the scan; others stay residual but correct") {
    val probe = read().filter(col("user_id") === "u1" && col("sha256sum") === "h1")
    val desc = scanOf(probe).scan.description()
    assert(desc.contains("EqualTo(user_id,u1)") && desc.contains("EqualTo(sha256sum,h1)"),
      s"pushed filters missing from scan: $desc")
    assert(probe.select("amount").orderBy("amount").collect().map(_.getLong(0)).toSeq === Seq(10L, 60L))
    // range predicate is NOT pushed (residual) and still filters correctly
    val range = read().filter(col("amount") > 35)
    assert(!scanOf(range).scan.description().contains("GreaterThan"))
    assert(range.count() === 3)
  }

  test("IN-set filters push to the parse stage and prune correctly") {
    val probe = read().filter(col("user_id").isin("u1", "u3"))
    val desc = scanOf(probe).scan.description()
    assert(desc.contains("In(user_id"), s"IN must push into the scan: $desc")
    assert(probe.select("amount").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(10L, 30L, 40L, 60L))
    // IN over amount (long values as raw-field strings)
    val amounts = read().filter(col("amount").isin(20L, 50L))
    assert(amounts.count() === 2)
  }

  test("reported statistics let a small log broadcast-join without a hint") {
    import spark.implicits._
    val facts = (1 to 10000).map(i => (s"u${i % 5}", i.toLong)).toDF("user_id", "x")
    val joined = facts.join(read().select("user_id", "amount"), "user_id")
    assert(joined.count() > 0)
    // executedPlan is the AQE wrapper; its string renders the final plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  private def readDir(dir: String): DataFrame =
    spark.read.format(LimitHashLog.FORMAT).load(dir)

  private def writeDir(df: DataFrame, dir: String, mode: String): Unit =
    df.write.format(LimitHashLog.FORMAT).mode(mode).save(dir)

  private def sampleDf(tag: String, n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i =>
        (s"$tag$i", i.toLong,
          if (i % 3 == 0) null else s"payload-$tag-$i".getBytes(StandardCharsets.UTF_8),
          s"sha-$tag-$i"))
      .toDF("user_id", "amount", "msg", "sha256sum")
  }

  test("write path: append round-trips rows, binary payloads and nulls intact") {
    val dir = Files.createTempDirectory("graft_lhlog_w").toString
    writeDir(sampleDf("a", 7), dir, "append")
    val got = readDir(dir).orderBy("amount").collect()
    assert(got.length === 7)
    assert(got.map(_.getString(0)).toSeq === (1 to 7).map(i => s"a$i"))
    assert(got(2).isNullAt(2)) // i=3 null payload survives
    assert(new String(got(0).getAs[Array[Byte]]("msg"), StandardCharsets.UTF_8) === "payload-a-1")
    // append again: both batches visible
    writeDir(sampleDf("b", 3), dir, "append")
    assert(readDir(dir).count() === 10)
  }

  test("write path: overwrite replaces all prior segments") {
    val dir = Files.createTempDirectory("graft_lhlog_w2").toString
    writeDir(sampleDf("a", 7), dir, "append")
    writeDir(sampleDf("c", 4), dir, "overwrite")
    val got = readDir(dir).collect()
    assert(got.length === 4)
    assert(got.map(_.getString(0)).forall(_.startsWith("c")))
  }

  test("write path: a failed job aborts cleanly — no segments, no staged leftovers") {
    val dir = Files.createTempDirectory("graft_lhlog_w4").toString
    val poison = org.apache.spark.sql.functions.udf((amount: Long) =>
      if (amount == 5L) throw new RuntimeException("poisoned row") else amount)
    val df = sampleDf("a", 7)
      .withColumn("amount", poison(col("amount")))
    intercept[Exception] { writeDir(df, dir, "append") }
    val leftover = Option(new java.io.File(dir).listFiles()).map(_.map(_.getName))
      .getOrElse(Array.empty[String])
    assert(leftover.isEmpty,
      s"failed write must leave nothing visible or staged: ${leftover.mkString(",")}")
    // and the failure must not poison later writes to the same dir
    writeDir(sampleDf("b", 3), dir, "append")
    assert(readDir(dir).count() === 3)
  }

  test("catalog: CREATE / INSERT / SELECT / pushdown / DROP through SQL identifiers") {
    val wh = Files.createTempDirectory("graft_lhcat").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.sources.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE graft.ingest")
      spark.sql("CREATE TABLE graft.ingest.limits " +
        "(user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)")
      assert(spark.sql("SHOW TABLES IN graft.ingest").collect()
        .map(_.getString(1)).contains("limits"))
      spark.sql("INSERT INTO graft.ingest.limits " +
        "SELECT CONCAT('u', id % 3), id, CAST(NULL AS BINARY), CONCAT('h', id) " +
        "FROM RANGE(30)")
      // read back with a pushed filter through the catalog identifier
      val probe = spark.sql(
        "SELECT amount FROM graft.ingest.limits WHERE user_id = 'u1' ORDER BY amount")
      assert(probe.collect().map(_.getLong(0)).toSeq ===
        (0L until 30L).filter(_ % 3 == 1))
      val scanDesc = probe.queryExecution.executedPlan.toString
      assert(scanDesc.contains("EqualTo(user_id,u1)"),
        s"filter must push through the catalog path:\n$scanDesc")
      // a non-entity schema is NOT a log table — it becomes a
      // catalog-managed parquet table (round-tripped in its own test)
      spark.sql("CREATE TABLE graft.ingest.other (x INT)")
      assert(new java.io.File(s"$wh/ingest/other/_schema.json").exists(),
        "non-entity schema must create a schema-manifested parquet table")
      spark.sql("DROP TABLE graft.ingest.other")
      assert(spark.sql("SELECT COUNT(*) FROM graft.ingest.limits").head().getLong(0) === 30L)
      spark.sql("DROP TABLE graft.ingest.limits")
      intercept[Exception] { spark.sql("SELECT * FROM graft.ingest.limits").collect() }
    } finally {
      spark.conf.unset("spark.sql.catalog.graft.warehouse")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("streaming write: the reference's job end-to-end through the connector") {
    // async ingest -> micro-batched, effectively-once segments in the
    // entity log -> verification read with pushdown: connect.go:75 +
    // hashes.go:35 + hashes_test.go:191, all on this engine's stack
    import graft.LimitHash
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_s").toString
    val ck = Files.createTempDirectory("graft_lhlog_s_ck").toString
    val ingest = new graft.streaming.AsyncIngest[LimitHash](spark.sqlContext)
    val q = ingest.toDS().writeStream
      .format(LimitHashLog.FORMAT)
      .option("path", dir)
      .option("checkpointLocation", ck)
      .start()
    def rows(a: Int, b: Int) = (a until b).map(i =>
      LimitHash(s"u${i % 4}", i.toLong,
        if (i % 3 == 0) null else s"m$i".getBytes(StandardCharsets.UTF_8), s"h$i"))
    ingest.saveAllAsync(rows(0, 40))
    q.processAllAvailable()
    ingest.saveAllAsync(rows(40, 60))
    q.processAllAvailable()
    q.stop()
    val back = readDir(dir)
    assert(back.count() === 60)
    // epoch-stamped segment names, nothing staged (hidden .crc sidecars
    // are Hadoop checksum files the reader ignores)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(names.nonEmpty && names.forall(_.startsWith("segment-")), names.mkString(","))
    // the reference's verification probe, pushdown and all
    assert(back.filter(col("user_id") === "u1" && col("sha256sum") === "h13").count() === 1)
  }

  test("streaming read: tailing the log picks up exactly the new segments per trigger") {
    val dir = Files.createTempDirectory("graft_lhlog_sr").toString
    val ck = Files.createTempDirectory("graft_lhlog_sr_ck").toString
    writeDir(sampleDf("a", 5), dir, "append")
    // foreachBatch sink: supports checkpoint RECOVERY (memory does not)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def start() = spark.readStream.format(LimitHashLog.FORMAT).load(dir)
      .select("user_id")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(0))): Unit)
      .start()
    val q = start()
    q.processAllAvailable()
    assert(seen.size === 5)
    // new segments land while the stream runs — only they are read next
    writeDir(sampleDf("b", 3), dir, "append")
    q.processAllAvailable()
    assert(seen.size === 8)
    q.stop()
    // restart from the checkpoint: already-seen segments are NOT re-read
    seen.clear()
    writeDir(sampleDf("c", 2), dir, "append")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    import scala.jdk.CollectionConverters._
    val afterRestart = seen.asScala.toSeq
    assert(afterRestart.length === 2 && afterRestart.forall(_.startsWith("c")),
      s"restart must read only unseen segments: ${afterRestart.mkString(",")}")
  }

  test("streaming read pinned to a version: startVersion replays changes since the snapshot") {
    val dir = Files.createTempDirectory("graft_lhlog_sv").toString
    val ck = Files.createTempDirectory("graft_lhlog_sv_ck").toString
    writeDir(sampleDf("a", 5), dir, "append")
    graft.sources.LogVersions.enable(dir) // v1 = the 'a' segment
    writeDir(sampleDf("b", 3), dir, "append") // v2
    writeDir(sampleDf("c", 2), dir, "append") // v3
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    def start() = spark.readStream.format(LimitHashLog.FORMAT)
      .option("startVersion", "1").load(dir)
      .select("user_id")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(0))): Unit)
      .start()
    val q = start()
    q.processAllAvailable()
    q.stop()
    import scala.jdk.CollectionConverters._
    // v1's rows are NOT replayed; everything after the snapshot is
    val got = seen.asScala.toSeq
    assert(got.length === 5 && got.forall(u => u.startsWith("b") || u.startsWith("c")),
      s"startVersion=1 must replay only post-snapshot segments: ${got.mkString(",")}")
    // a checkpoint restart keeps its offset: startVersion seeds only a
    // FRESH stream; new appends still flow
    seen.clear()
    writeDir(sampleDf("d", 2), dir, "append")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val after = seen.asScala.toSeq
    assert(after.length === 2 && after.forall(_.startsWith("d")),
      s"restart must read only unseen segments: ${after.mkString(",")}")
    // a version that never existed fails loudly
    val err = intercept[Exception] {
      val bad = spark.readStream.format(LimitHashLog.FORMAT)
        .option("startVersion", "99").load(dir)
        .writeStream.format("noop").start()
      try bad.processAllAvailable() finally bad.stop()
    }
    assert(err.getMessage.contains("startVersion") ||
      Option(err.getCause).exists(_.getMessage.contains("startVersion")))
  }

  test("streaming read admission control: maxFilesPerTrigger bounds every micro-batch") {
    val dir = Files.createTempDirectory("graft_lhlog_adm").toString
    val ck = Files.createTempDirectory("graft_lhlog_adm_ck").toString
    // 6 separate single-partition appends -> exactly 6 segments (empty
    // partitions stage nothing, so coalesce(1) pins one segment each)
    (1 to 6).foreach(i => writeDir(sampleDf(s"g$i-", 2).coalesce(1), dir, "append"))
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format(LimitHashLog.FORMAT)
      .option("maxFilesPerTrigger", "2")
      .load(dir)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += b.count() }: Unit)
      .start()
    q.processAllAvailable(); q.stop()
    assert(batchSizes.sum === 12, batchSizes.mkString(","))
    // 2 segments x 2 rows per trigger -> 3 batches of 4 (a trailing
    // empty batch from the final no-data poll is fine)
    assert(batchSizes.filter(_ > 0).toSeq === Seq(4L, 4L, 4L), batchSizes.mkString(","))
  }

  test("streaming read admission: maxBytesPerTrigger bounds batches by size, always progresses") {
    val dir = Files.createTempDirectory("graft_lhlog_adb").toString
    val ck = Files.createTempDirectory("graft_lhlog_adb_ck").toString
    // 6 segments of 2 rows each (~60 bytes per segment)
    (1 to 6).foreach(i => writeDir(sampleDf(s"b$i-", 2).coalesce(1), dir, "append"))
    val segBytes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("segment-")).map(_.length()).max
    val batchSizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format(LimitHashLog.FORMAT)
      .option("maxBytesPerTrigger", (segBytes + 1).toString) // fits ONE segment per trigger
      .load(dir)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batchSizes.synchronized { batchSizes += b.count() }: Unit)
      .start()
    q.processAllAvailable(); q.stop()
    assert(batchSizes.sum === 12, batchSizes.mkString(","))
    // one ~segBytes segment admitted per trigger -> 6 batches of 2
    assert(batchSizes.filter(_ > 0).toSeq === Seq.fill(6)(2L), batchSizes.mkString(","))
    // a limit SMALLER than any segment still progresses (one at a time)
    val ck2 = Files.createTempDirectory("graft_lhlog_adb_ck2").toString
    val sizes2 = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q2 = spark.readStream.format(LimitHashLog.FORMAT)
      .option("maxBytesPerTrigger", "1")
      .load(dir)
      .writeStream
      .option("checkpointLocation", ck2)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        sizes2.synchronized { sizes2 += b.count() }: Unit)
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(sizes2.sum === 12, "oversized-segment progress guarantee")
  }

  test("log-to-log streaming pipeline: the connector on both ends") {
    val src = Files.createTempDirectory("graft_lhlog_p_src").toString
    val dst = Files.createTempDirectory("graft_lhlog_p_dst").toString
    val ck = Files.createTempDirectory("graft_lhlog_p_ck").toString
    writeDir(sampleDf("a", 4).coalesce(1), src, "append")
    val q = spark.readStream.format(LimitHashLog.FORMAT).load(src)
      .withColumn("user_id", upper(col("user_id")))
      .writeStream.format(LimitHashLog.FORMAT)
      .option("path", dst)
      .option("checkpointLocation", ck)
      .start()
    q.processAllAvailable()
    // more source segments mid-flight propagate incrementally
    writeDir(sampleDf("b", 2).coalesce(1), src, "append")
    q.processAllAvailable()
    q.stop()
    val out = readDir(dst).collect()
    assert(out.length === 6)
    assert(out.map(_.getString(0)).forall(u => u.startsWith("A") || u.startsWith("B")))
  }

  test("catalog: parquet-managed tables — CREATE / INSERT / SELECT / pushdown / DROP") {
    val wh = Files.createTempDirectory("graft_pqcat").toString
    spark.conf.set("spark.sql.catalog.graft_pq", classOf[graft.sources.LogCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_pq.warehouse", wh)
    try {
      spark.sql("CREATE NAMESPACE graft_pq.marts")
      spark.sql("CREATE TABLE graft_pq.marts.sales (region STRING, qty BIGINT, price DOUBLE)")
      // an EMPTY parquet table is readable (schema from the manifest)
      assert(spark.sql("SELECT * FROM graft_pq.marts.sales").count() === 0L)
      spark.sql("INSERT INTO graft_pq.marts.sales " +
        "SELECT CONCAT('r', id % 4), id, id * 1.5 FROM RANGE(40)")
      assert(spark.sql("SELECT SUM(qty) FROM graft_pq.marts.sales").head().getLong(0) ===
        (0L until 40L).sum)
      // predicate pushdown + column pruning reach the parquet scan
      val probe = spark.sql(
        "SELECT qty FROM graft_pq.marts.sales WHERE region = 'r2' ORDER BY qty")
      assert(probe.collect().map(_.getLong(0)).toSeq === (0L until 40L).filter(_ % 4 == 2))
      val plan = probe.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("region"),
        s"parquet pushdown must survive the catalog identifier:\n$plan")
      assert(plan.contains("ReadSchema") && !plan.contains("price"),
        s"unprojected columns must prune out of the parquet scan:\n$plan")
      // INSERT OVERWRITE replaces content through the same identifier
      spark.sql("INSERT OVERWRITE graft_pq.marts.sales " +
        "SELECT 'rX', id, 0.0 FROM RANGE(3)")
      assert(spark.sql("SELECT COUNT(*) FROM graft_pq.marts.sales").head().getLong(0) === 3L)
      // the schema manifest survives a session-cache roundtrip: drop and
      // recreate the catalog's view of the table via a fresh load
      assert(spark.sql("SHOW TABLES IN graft_pq.marts").collect()
        .map(_.getString(1)).contains("sales"))
      spark.sql("DROP TABLE graft_pq.marts.sales")
      intercept[Exception] { spark.sql("SELECT * FROM graft_pq.marts.sales").collect() }
      // a log table and a parquet table coexist in one namespace
      spark.sql("CREATE TABLE graft_pq.marts.hashes " +
        "(user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)")
      spark.sql("INSERT INTO graft_pq.marts.hashes " +
        "SELECT 'u1', 7, CAST(NULL AS BINARY), 'h7'")
      assert(new java.io.File(s"$wh/marts/hashes").listFiles()
        .exists(_.getName.startsWith("segment-")), "entity schema must stay a log table")
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_pq.warehouse")
      spark.conf.unset("spark.sql.catalog.graft_pq")
    }
  }

  test("columnar read: vectorized batches, identical results, pruning and pushdown intact") {
    // default scan is COLUMNAR: the executed plan must convert batches
    // (ColumnarToRow), not iterate rows out of the source
    val df = read()
    val plan = { df.collect(); df.queryExecution.executedPlan.toString }
    assert(plan.contains("ColumnarToRow"), s"expected a columnar scan:\n$plan")

    // row-for-row identical to the row-based reader (columnar=false)
    val rowDf = spark.read.format(LimitHashLog.FORMAT)
      .option("columnar", "false").load(logDir)
    val rowPlan = { rowDf.collect(); rowDf.queryExecution.executedPlan.toString }
    assert(!rowPlan.contains("ColumnarToRow"), s"columnar=false must read rows:\n$rowPlan")
    def render(d: DataFrame): Seq[String] =
      d.select(col("user_id"), col("amount"), hex(col("msg")).as("msg_hex"), col("sha256sum"))
        .orderBy("amount").collect().map(_.toString).toSeq
    assert(render(df) === render(rowDf))

    // binary payloads and nulls survive vectorization
    val rows = df.orderBy("amount").collect()
    assert(new String(rows.head.getAs[Array[Byte]]("msg"), StandardCharsets.UTF_8) === "m1")
    assert(rows(1).isNullAt(2))

    // pruning + pushdown behave identically through the columnar path
    val probe = df.filter(col("user_id") === "u1").select("amount")
    assert(scanOf(probe).toString.contains("user_id"))
    assert(probe.collect().map(_.getLong(0)).sorted.toSeq === Seq(10L, 30L, 60L))
  }

  test("columnar read: batches span multiple bin-packed segments correctly") {
    // all 3 segments pack into one split — the columnar reader must
    // stream across file boundaries within one batch
    val one = read().coalesce(1).collect()
    assert(one.length === 6)
  }

  test("aggregate pushdown: COUNT/MIN/MAX answered from stats sidecars, zero rows parsed") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_agg").toString
    writeDir(sampleDf("a", 9), dir, "append")   // amounts 1..9
    writeDir(sampleDf("z", 4), dir, "append")   // user_ids z1..z4

    val df = readDir(dir).selectExpr("count(*) as n", "min(amount) as lo",
      "max(amount) as hi", "min(user_id) as u0", "max(user_id) as u1")
    val r = df.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)) ===
      ((13L, 1L, 9L, "a1", "z4")))
    val desc = scanOf(df).scan.description()
    assert(desc.contains("PushedAggregates"), s"aggregation must reach the scan: $desc")

    // the proof it never parses a row: corrupt every segment's BYTES
    // (keeping the sidecars) — a parsed read would throw/misbehave, the
    // metadata path cannot notice
    val d = new java.io.File(dir)
    d.listFiles().filter(f => f.isFile && f.getName.startsWith("segment-")).foreach { f =>
      Files.write(f.toPath, "u\tNOT_A_NUMBER\tx\ty".getBytes(StandardCharsets.UTF_8))
    }
    assert(readDir(dir).count() === 13L)
    // a non-pushable aggregate over the corrupted bytes DOES parse (and
    // the poisoned amount field throws) — the pushdown is what saved us
    intercept[Exception] { readDir(dir).agg(sum(col("amount"))).head() }
  }

  test("aggregate pushdown declines when it cannot be exact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_aggno").toString
    writeDir(sampleDf("a", 5), dir, "append")
    // (1) a pushed filter makes metadata counts wrong -> full scan path
    val filtered = readDir(dir).filter(col("user_id") === "a1")
      .selectExpr("count(*) as n")
    assert(!scanOf(filtered).scan.description().contains("PushedAggregates"))
    assert(filtered.head().getLong(0) === 1L)
    // (2) a foreign segment without a sidecar -> full scan path
    Files.write(java.nio.file.Path.of(dir, "segment-foreign-0"),
      "f1\t77\t\thf".getBytes(StandardCharsets.UTF_8))
    val mixed = readDir(dir).selectExpr("count(*) as n")
    assert(!scanOf(mixed).scan.description().contains("PushedAggregates"))
    assert(mixed.head().getLong(0) === 6L)
    // (3) grouped aggregation is never pushed
    val grouped = readDir(dir).groupBy("user_id").count()
    assert(!scanOf(grouped).scan.description().contains("PushedAggregates"))
  }

  test("an IN filter containing null stays residual; NULL members match nothing") {
    // ADVICE r7: String.valueOf(null) = "null" made a row whose field is
    // LITERALLY the text "null" match `col IN (NULL, ...)` when the In
    // was fully source-evaluated. Such an In now stays residual.
    val dir = Files.createTempDirectory("graft_lhlog_nullin").toString
    Files.write(java.nio.file.Path.of(dir, "seg-000.log"),
      "null\t5\t\thx\nu1\t10\t\th1".getBytes(StandardCharsets.UTF_8))
    val df = spark.read.format(LimitHashLog.FORMAT).load(dir)
    val probe = df.filter(col("user_id").isin("u1", null))
    assert(!scanOf(probe).scan.description().contains("In(user_id"),
      "an In with a null member must not be fully pushed")
    assert(probe.select("amount").collect().map(_.getLong(0)).toSeq === Seq(10L),
      "the literal text 'null' must not match a NULL IN-list member")
    // null-free IN still pushes and still excludes the literal-"null" row
    val clean = df.filter(col("user_id").isin("u1"))
    assert(scanOf(clean).scan.description().contains("In(user_id") ||
      scanOf(clean).scan.description().contains("EqualTo(user_id"))
    assert(clean.select("amount").collect().map(_.getLong(0)).toSeq === Seq(10L))
  }

  test("aggregate pushdown answers from the acceptance-time stats snapshot, not a re-listing") {
    // ADVICE r7: planInputPartitions re-listed the directory and silently
    // dropped stats-less segments that appeared AFTER pushdown was proven
    // exact — the count must come from the snapshot captured at acceptance.
    import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
    val dir = Files.createTempDirectory("graft_lhlog_snap").toString
    writeDir(sampleDf("a", 7), dir, "append")
    writeDir(sampleDf("b", 6), dir, "append")

    val builder = new graft.sources.LimitHashLogScanBuilder(dir)
    val agg = new Aggregation(Array(new CountStar), Array.empty)
    assert(builder.pushAggregation(agg), "full-stats log must accept COUNT(*) pushdown")

    // a stats-less foreign segment lands between acceptance and planning
    Files.write(java.nio.file.Path.of(dir, "segment-foreign-0"),
      "f1\t77\t\thf".getBytes(StandardCharsets.UTF_8))

    val parts = builder.build().toBatch.planInputPartitions()
    assert(parts.length === 1)
    val value = parts.head.asInstanceOf[graft.sources.LogAggPartition].values.head
    assert(value === 13L,
      "pushed COUNT must equal the snapshot proven at acceptance time")
  }

  test("zone maps: a selective probe plans only the segments whose range can match") {
    val dir = Files.createTempDirectory("graft_lhlog_zm").toString
    // 4 range-disjoint segments on amount (1..25, 26..50, 51..75, 76..100)
    sampleDf("u", 100).repartitionByRange(4, col("amount"))
      .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    assert(new java.io.File(dir).listFiles().count(f => f.getName.startsWith("segment-")) === 4)
    def probeParts(c: org.apache.spark.sql.Column): (Long, Int) = {
      val df = spark.read.format(LimitHashLog.FORMAT)
        .option("maxPartitionBytes", "1") // one split per surviving segment
        .load(dir).filter(c)
      (df.count(), df.rdd.getNumPartitions)
    }
    // equality probe on amount: exactly one segment's range contains 42
    assert(probeParts(col("amount") === 42L) === ((1L, 1)))
    // user_id probe: u42 lives in one segment's [min,max] string range...
    val (uRows, uParts) = probeParts(col("user_id") === "u42")
    assert(uRows === 1L && uParts <= 4)
    // value outside every range: planned to ZERO partitions
    assert(probeParts(col("amount") === 999L) === ((0L, 0)))
    // conjunctive probe intersects the per-column prunes
    assert(probeParts(col("amount") === 42L && col("sha256sum") === "sha-u-42") === ((1L, 1)))
    // correctness net: an unfiltered read still sees everything
    assert(spark.read.format(LimitHashLog.FORMAT).load(dir).count() === 100L)
  }

  test("p07: the catalog count probe is answered by pushed aggregation") {
    val df = graft.operators.Pipeline.p07_log_count_pushdown(spark, "/root/testdata/sf0.001")
    assert(scanOf(df).scan.description().contains("PushedAggregates"),
      "the count probe must be answered from segment metadata")
    assert(df.count() === 1L)
  }

  test("bloom skip index: hash-equality probes skip segments that cannot contain the value") {
    val dir = Files.createTempDirectory("graft_lhlog_bloom").toString
    // 4 separate appends -> 4 segments with DISJOINT sha/user sets
    (0 until 4).foreach { g =>
      sampleDf(s"g$g-", 50).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    }
    assert(new java.io.File(dir).listFiles().count(_.getName.startsWith("segment-")) === 4)
    // stats travel as ONE manifest per COMMIT (the Delta/Iceberg shape:
    // planning I/O is O(commits), not O(segments))
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.startsWith(".stats-manifest-")) === 4)
    def probeParts(c: org.apache.spark.sql.Column): (Long, Int) = {
      val df = spark.read.format(LimitHashLog.FORMAT)
        .option("maxPartitionBytes", "1").load(dir).filter(c)
      (df.count(), df.rdd.getNumPartitions)
    }
    // sha equality: a [min,max] range can never prune uniform hashes —
    // only the bloom can. One segment holds sha-g2--17.
    val (shaRows, shaParts) = probeParts(col("sha256sum") === "sha-g2--17")
    assert(shaRows === 1L)
    assert(shaParts <= 1, s"bloom must skip the 3 foreign segments, planned $shaParts")
    // absent sha: every segment's bloom rejects -> zero partitions
    assert(probeParts(col("sha256sum") === "sha-none") === ((0L, 0)))
    // user_id probes combine range AND bloom
    val (uRows, uParts) = probeParts(col("user_id") === "g3-7")
    assert(uRows === 1L && uParts <= 1)
    // correctness net: unfiltered read sees all four segments
    assert(spark.read.format(LimitHashLog.FORMAT).load(dir).count() === 200L)
  }

  test("runtime filtering: join keys dynamically prune segments via SupportsRuntimeFiltering") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_rf").toString
    (0 until 4).foreach { g =>
      sampleDf(s"r$g-", 50).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    }
    // unit surface first (deterministic): the scan re-plans after filter()
    val scan = new graft.sources.LimitHashLogScan(dir, LimitHashLog.SCHEMA,
      Array.empty, maxPartitionBytes = 1)
    assert(scan.planInputPartitions().length === 4)
    assert(scan.filterAttributes().map(_.describe()).toSet ===
      Set("user_id", "amount", "sha256sum"))
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("user_id", Array("r2-10", "r2-33"))))
    assert(scan.planInputPartitions().length === 1,
      "runtime In on user_id must keep only r2's segment")
    scan.filter(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("sha256sum", Array("sha-nope-1"))))
    assert(scan.planInputPartitions().length === 0,
      "a key set no bloom contains must prune everything")
    // e2e: a selective broadcast join over the source still returns
    // exactly the matching rows with pruning active
    val probe = spark.read.format(LimitHashLog.FORMAT)
      .option("maxPartitionBytes", "1").load(dir)
    val dim = Seq(("r1-5", 1), ("r1-9", 1), ("r9-1", 0)).toDF("user_id", "flag")
      .filter(col("flag") === 1)
    assert(probe.join(broadcast(dim), "user_id").count() === 2L)
  }

  test("streaming read applies zone-map/bloom pruning to fresh segments") {
    import graft.sources.{LogMicroBatchStream, LogOffset}
    val dir = Files.createTempDirectory("graft_lhlog_szm").toString
    (0 until 3).foreach { g =>
      sampleDf(s"z$g-", 20).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    }
    val filtered = new LogMicroBatchStream(dir, LimitHashLog.SCHEMA,
      Array(org.apache.spark.sql.sources.EqualTo("user_id", "z1-7")))
    val end = filtered.latestOffset()
    assert(filtered.planInputPartitions(LogOffset(Seq.empty), end).length === 1,
      "a streaming probe must open only the segment that can match")
    // no pushed filters -> every fresh segment planned
    val all = new LogMicroBatchStream(dir, LimitHashLog.SCHEMA, Array.empty)
    assert(all.planInputPartitions(LogOffset(Seq.empty), end).length === 3)
  }

  test("log compaction: segments merge byte-exactly, stats/bloom manifests merge without rescan") {
    val dir = Files.createTempDirectory("graft_lhlog_cp").toString
    (0 until 5).foreach { g =>
      sampleDf(s"c$g-", 20).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
    }
    def render(): Seq[String] = readDir(dir)
      .select(col("user_id"), col("amount"), hex(col("msg")).as("m"), col("sha256sum"))
      .orderBy("user_id").collect().map(_.toString).toSeq
    val before = render()
    val st = graft.sources.Compaction.compactLog(spark, dir, "cmp1")
    assert(st.segmentsBefore === 5 && st.segmentsAfter === 1)
    val d = new java.io.File(dir)
    assert(d.listFiles().count(_.getName.startsWith("segment-")) === 1)
    assert(d.listFiles().count(_.getName.startsWith(".stats-manifest-")) === 1,
      "compaction must leave exactly one manifest")
    assert(d.listFiles().count(_.getName.startsWith("_")) === 0, "no staged leftovers")
    // rows byte-identical
    assert(render() === before)
    // merged stats still serve the aggregate pushdown exactly
    val agg = readDir(dir).selectExpr("count(*) as n", "min(amount) as lo", "max(amount) as hi")
    assert(scanOf(agg).scan.description().contains("PushedAggregates"))
    val r = agg.head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((100L, 1L, 20L)))
    // the unioned bloom still answers probes (present found, absent pruned)
    val miss = spark.read.format(LimitHashLog.FORMAT)
      .option("maxPartitionBytes", "1").load(dir)
      .filter(col("sha256sum") === "sha-none")
    assert(miss.rdd.getNumPartitions === 0 && miss.count() === 0L)
    assert(readDir(dir).filter(col("sha256sum") === "sha-c3--7").count() === 1L)
  }

  test("commit manifests fold past the threshold; zone maps and pushdown survive (r17)") {
    val prev = sys.props.put("graft.sidecar.fold.threshold", "4")
    try {
      val dir = Files.createTempDirectory("graft_lhlog_mf").toString
      (0 until 10).foreach { g =>
        sampleDf(s"f$g-", 10).coalesce(1)
          .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
      }
      val d = new java.io.File(dir)
      val manifests = d.listFiles().count(_.getName.startsWith(".stats-manifest-"))
      assert(manifests <= 4,
        s"write-side fold must bound the manifest count, got $manifests")
      assert(d.listFiles().count(_.getName.startsWith("segment-")) === 10,
        "folding manifests must never touch segments")
      // the folded stats still serve planning exactly: metadata-served
      // aggregates and zone-map pruning both intact
      val agg = readDir(dir)
        .selectExpr("count(*) AS n", "min(amount) AS lo", "max(amount) AS hi")
      assert(scanOf(agg).scan.description().contains("PushedAggregates"))
      val r = agg.head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((100L, 1L, 10L)))
      val probe = spark.read.format(LimitHashLog.FORMAT)
        .option("maxPartitionBytes", "1").load(dir)
        .filter(col("user_id") === "f3-7")
      assert(probe.rdd.getNumPartitions <= 1,
        "folded zone maps must still prune the probe to one segment")
      assert(probe.count() === 1L)
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("log compaction retry: same-id re-run and crash states never lose or duplicate rows") {
    def segFiles(dir: String): Seq[java.io.File] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("segment-")).sortBy(_.getName).toSeq
    def rows(dir: String): Seq[String] = readDir(dir)
      .select(col("user_id"), col("amount"), hex(col("msg")).as("m"), col("sha256sum"))
      .orderBy("user_id", "sha256sum").collect().map(_.toString).toSeq

    // (1) the ADVICE r7 scenario: calling compactLog twice with the SAME
    // id must be an idempotent no-op, not a log wipe (the second run's
    // listing contains the very segment-<id>-<i> names the first run
    // renamed into place).
    val dir1 = Files.createTempDirectory("graft_lhlog_cr1").toString
    (0 until 5).foreach { g =>
      sampleDf(s"r$g-", 20).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir1)
    }
    val before1 = rows(dir1)
    graft.sources.Compaction.compactLog(spark, dir1, "cmpA")
    val again = graft.sources.Compaction.compactLog(spark, dir1, "cmpA")
    assert(again.segmentsBefore === 0, "second same-id run must be a no-op")
    assert(segFiles(dir1).length === 1 && rows(dir1) === before1,
      "same-id retry must not wipe or duplicate the log")

    // (2) crash AFTER the rename phase, BEFORE the delete marker:
    // a merged segment-<id>-0 coexists with all its members. A same-id
    // retry must re-pack the originals only (no duplication from
    // treating the half-finished output as input).
    val dir2 = Files.createTempDirectory("graft_lhlog_cr2").toString
    (0 until 4).foreach { g =>
      sampleDf(s"s$g-", 15).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir2)
    }
    val before2 = rows(dir2)
    val members = segFiles(dir2)
    val merged = new java.io.File(dir2, "segment-cmpB-0")
    val out = new java.io.FileOutputStream(merged)
    try members.foreach(f => out.write(java.nio.file.Files.readAllBytes(f.toPath)))
    finally out.close()
    assert(rows(dir2).length === 2 * before2.length, "crash state visibly duplicates (documented transient)")
    val st2 = graft.sources.Compaction.compactLog(spark, dir2, "cmpB")
    assert(st2.segmentsBefore === 4 && st2.segmentsAfter === 1)
    assert(segFiles(dir2).length === 1 && rows(dir2) === before2,
      "retry after rename-phase crash must converge to exactly the original rows")

    // (3) crash MID-DELETE (marker committed, some inputs already gone):
    // retry must resume the deletes from the marker, not re-pack.
    val dir3 = Files.createTempDirectory("graft_lhlog_cr3").toString
    (0 until 3).foreach { g =>
      sampleDf(s"t$g-", 10).coalesce(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir3)
    }
    val before3 = rows(dir3)
    val members3 = segFiles(dir3)
    val merged3 = new java.io.File(dir3, "segment-cmpC-0")
    val out3 = new java.io.FileOutputStream(merged3)
    try members3.foreach(f => out3.write(java.nio.file.Files.readAllBytes(f.toPath)))
    finally out3.close()
    // marker records the inputs; one input already deleted (crash mid-loop)
    val markerTxt = members3.map(_.getName).mkString("\n")
    java.nio.file.Files.write(
      new java.io.File(dir3, "_compact-cmpC.committed").toPath,
      markerTxt.getBytes(StandardCharsets.UTF_8))
    assert(members3.head.delete())
    val st3 = graft.sources.Compaction.compactLog(spark, dir3, "cmpC")
    assert(st3.segmentsBefore === 3 && st3.segmentsAfter === 1)
    assert(segFiles(dir3).map(_.getName) === Seq("segment-cmpC-0"))
    assert(rows(dir3) === before3, "resume must finish deletes and keep the merged rows")
    assert(!new java.io.File(dir3, "_compact-cmpC.committed").exists())
  }

  test("streaming write truncate: complete-mode output replaces the log each epoch") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_tr").toString
    val ck = Files.createTempDirectory("graft_lhlog_tr_ck").toString
    val ingest = new graft.streaming.AsyncIngest[(String, Long)](spark.sqlContext)
    // complete mode re-emits the FULL aggregate every trigger — without
    // truncate-aware commits the log would grow by one copy per epoch
    val q = ingest.toDS().toDF("u", "a")
      .groupBy(col("u")).agg(count(lit(1)).as("n"))
      .select(col("u").as("user_id"), col("n").as("amount"),
        lit(null).cast("binary").as("msg"), lit("agg").as("sha256sum"))
      .writeStream
      .outputMode("complete")
      .format(LimitHashLog.FORMAT)
      .option("path", dir)
      .option("checkpointLocation", ck)
      .start()
    ingest.saveAllAsync(Seq(("u0", 1L), ("u1", 2L), ("u0", 3L)))
    q.processAllAvailable()
    val first = readDir(dir).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(first === Map("u0" -> 2L, "u1" -> 1L))
    ingest.saveAllAsync(Seq(("u1", 4L), ("u2", 5L)))
    q.processAllAvailable()
    q.stop()
    val after = readDir(dir).collect().map(r => (r.getString(0), r.getLong(1)))
    // REPLACED, not appended: one row per user, full-history counts
    assert(after.length === 3, s"log must hold exactly the last epoch: ${after.mkString(",")}")
    assert(after.toMap === Map("u0" -> 2L, "u1" -> 2L, "u2" -> 1L))
  }

  test("write path: a tab/newline inside a string field fails loudly, never corrupts the layout") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_lhlog_esc").toString
    val bad = Seq(("u\t1", 1L, null: Array[Byte], "h1"))
      .toDF("user_id", "amount", "msg", "sha256sum")
    intercept[Exception] { writeDir(bad, dir, "append") }
    assert(readDir(dir).count() === 0, "aborted write must leave nothing visible")
    val newline = Seq(("u1", 1L, null: Array[Byte], "h\n1"))
      .toDF("user_id", "amount", "msg", "sha256sum")
    intercept[Exception] { writeDir(newline, dir, "append") }
    assert(readDir(dir).count() === 0)
    // binary payloads with tabs/newlines are base64-armored — they PASS
    val binOk = Seq(("u1", 1L, "tab\tand\nnewline".getBytes(StandardCharsets.UTF_8), "h1"))
      .toDF("user_id", "amount", "msg", "sha256sum")
    writeDir(binOk, dir, "append")
    val got = readDir(dir).collect()
    assert(got.length === 1)
    assert(new String(got(0).getAs[Array[Byte]]("msg"), StandardCharsets.UTF_8) === "tab\tand\nnewline")
  }

  test("write path: no staged files remain after commit (readers never see them)") {
    val dir = Files.createTempDirectory("graft_lhlog_w3").toString
    writeDir(sampleDf("a", 5), dir, "append")
    val leftovers = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("_"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
  }

  test("scan metrics report segment pruning and metadata-served aggregates") {
    val dir = Files.createTempDirectory("graft_lhlog_met").toString
    // three stats-covered single-segment commits with disjoint user zones
    Seq("a", "b", "c").foreach { u =>
      writeDir(sampleDf(u, 4).repartition(1), dir, "append")
    }
    // one execution per frame: driver metrics are reported when the
    // scan PLANS, and a re-collect reuses the cached partitions
    def metrics(df: DataFrame): Map[String, Long] = {
      df.collect()
      scanOf(df).metrics.map { case (k, m) => (k, m.value) }
    }
    val probed = metrics(spark.read.format(LimitHashLog.FORMAT).load(dir)
      .filter(col("user_id") === "b2") // present in the b segment only
      .select("user_id", "amount"))
    assert(probed("segmentsTotal") == 3L)
    assert(probed("segmentsPruned") == 2L)
    assert(probed("splitsPlanned") == 1L)
    // task side: only the surviving 4-line segment is parsed, and the
    // pushed equality keeps exactly the one matching row
    assert(probed("linesParsed") == 4L)
    assert(probed("rowsEmittedAtParse") == 1L)

    val counted = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .agg(count(lit(1)).as("n"))
    assert(counted.collect().head.getLong(0) == 12L)
    assert(scanOf(counted).metrics("metadataAggServed").value == 1L)
  }

  test("LIMIT pushdown plans only the proven-covered prefix and caps parsing") {
    val dir = Files.createTempDirectory("graft_lhlog_lim").toString
    (1 to 6).foreach { i =>
      writeDir(sampleDf(s"u$i-", 4).repartition(1), dir, "append")
    }
    val limited = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .select("user_id", "amount").limit(3)
    val rows = limited.collect()
    assert(rows.length == 3)
    val scan = scanOf(limited)
    assert(scan.scan.description().contains("PushedLimit: 3"))
    val m = scan.metrics.map { case (k, v) => (k, v.value) }
    // 24 rows in 6 segments; the manifests prove the first segment
    // already covers 3 rows — one split, nothing else opened, and the
    // reader stops at the limit
    assert(m("splitsPlanned") == 1L)
    assert(m("linesParsed") <= 3L)
    // LIMIT truncation is NOT pruning: the zone machinery skipped
    // nothing here, and the SQL UI must not claim it did (ADVICE r8)
    assert(m("segmentsPruned") == 0L)
    assert(m("segmentsTruncatedByLimit") == 5L)

    // with a pushed filter, stats can't prove coverage: splits stay,
    // but the result is still correct
    val filtered = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .filter(col("user_id") === "u3-2").select("user_id").limit(1)
    assert(filtered.collect().map(_.getString(0)).toSeq == Seq("u3-2"))
  }

  test("streaming tail fails LOUDLY when a rewrite retires segments it " +
      "already emitted (compaction outputs must not double-emit)") {
    val dir = Files.createTempDirectory("graft_lhlog_ret").toString
    val ck = Files.createTempDirectory("graft_lhlog_ret_ck").toString
    writeDir(sampleDf("a", 5), dir, "append")
    writeDir(sampleDf("b", 3), dir, "append")
    graft.sources.LogVersions.enable(dir)
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val q = spark.readStream.format(LimitHashLog.FORMAT).load(dir)
      .select("user_id")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.collect().foreach(r => seen.add(r.getString(0))): Unit)
      .start()
    try {
      q.processAllAvailable()
      assert(seen.size === 8)
      // compaction packs the two emitted segments into one NEW segment —
      // an unseen name carrying only already-emitted rows
      graft.sources.Compaction.compactLog(spark, dir, "cmpRet")
      writeDir(sampleDf("c", 2), dir, "append")
      val e = intercept[Exception] { q.processAllAvailable() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("retired by a rewrite")),
        s"tail must fail loudly on retirement, got: ${messages(e).mkString(" | ")}")
      // and it must NOT have double-emitted the packed rows
      assert(seen.size === 8, s"no duplicates through the failure: ${seen.size}")
    } finally q.stop()
  }
}
