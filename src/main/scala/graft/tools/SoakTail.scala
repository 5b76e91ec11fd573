package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions.{col, input_file_name, sum}

/** STREAMING-ADMISSION SCALE SOAK (VERDICT r16 #4): a FRESH tail of a
  * grown catalog parquet table under `maxBytesPerTrigger` must catch
  * up in BOUNDED micro-batches — per-batch admitted bytes never exceed
  * the cap (plus at most one file, the always-admit-one progress
  * rule), batch count grows with table bytes / cap, per-batch wall
  * stays ~FLAT as the table grows (exponent ≈ 0 — the batch is the
  * unit of work, not the backlog), and a checkpoint restart
  * mid-catch-up resumes exactly (no lost or duplicated rows under an
  * idempotent per-batchId sink).
  *
  * This is the missing scale EVIDENCE for the r16 admission-control
  * work (s22 proves the mechanism at 6-file shape; SOAK scales it):
  * at scale 100 the table is the soak suite's 5M-row / 400-file shape
  * and the tail replays it in ~hundreds of capped batches.
  *
  * Usage: runMain graft.tools.SoakTail [baseRows] [scales]
  * (defaults 50000 and 1,10,100). One JSON line per (leg, scale), then
  * a summary with log-log growth exponents: gate
  * sec_per_batch ≈ 0, batches ≈ 1 (the backlog splits, the batch
  * doesn't grow). Violations of the hard gates (byte cap, exactness)
  * FAIL the run loudly. */
object SoakTail {

  def main(args: Array[String]): Unit = {
    val baseRows = if (args.nonEmpty) args(0).toLong else 50000L
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_soaktail_wh").toString
    spark.conf.set("spark.sql.catalog.graft_st", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_st.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_st.lake")
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val secPerBatch = scala.collection.mutable.Map[Int, Double]()
    val batchCounts = scala.collection.mutable.Map[Int, Double]()
    val logSecPerBatch = scala.collection.mutable.Map[Int, Double]()
    val logBatchCounts = scala.collection.mutable.Map[Int, Double]()
    // the byte cap is FIXED across scales (sized off the base table) —
    // the claim under test is that a 100× backlog splits into 100×
    // batches of the same size, not 1 batch of 100× the size
    var capBytes = 0L
    var logCapBytes = 0L

    for (scale <- scales) {
      val n = baseRows * scale
      spark.sql("DROP TABLE IF EXISTS graft_st.lake.t")
      spark.sql("CREATE TABLE graft_st.lake.t (k BIGINT, v BIGINT, pad STRING)")
      spark.range(n).selectExpr("id AS k", "id AS v", "repeat(uuid(), 2) AS pad")
        .repartitionByRange(4 * scale, col("k"))
        .writeTo("graft_st.lake.t").append()
      spark.sql("CALL graft_st.system.enable_versioning(table => 'lake.t')")
      val dir = s"$wh/lake/t"
      val dataDir = new Path(dir, "data")
      val files = fs.listStatus(dataDir).filter(s =>
        s.isFile && s.getPath.getName.endsWith(".parquet"))
      val totalBytes = files.map(_.getLen).sum
      val maxFileBytes = files.map(_.getLen).max
      val sizeByPath: Map[String, Long] =
        files.map(s => s.getPath.toUri.getPath -> s.getLen).toMap
      if (capBytes == 0L) capBytes = math.max(1L, totalBytes / 4)
      println(s"""{"setup":"tail","scale":$scale,"rows":$n,"files":${files.length},"bytes":$totalBytes,"cap":$capBytes}""")

      // idempotent per-batchId sink: a replayed batch overwrites its
      // own slot, so totals stay exact across stop/restart
      val perBatch = new ConcurrentHashMap[Long, (Long, Long, Long)]() // id -> (rows, sum, bytes)
      val walls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val lastEnd = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
      def handle(df: Dataset[Row], id: Long): Unit = {
        val agg = df.groupBy(input_file_name().as("f"))
          .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("c"),
            sum(col("k")).as("s")).collect()
        val rows = agg.map(_.getLong(1)).sum
        val ksum = agg.map(r => Option(r.get(2)).fold(0L)(_.asInstanceOf[Long])).sum
        val bytes = agg.map(r => sizeByPath.getOrElse(
          new java.net.URI(r.getString(0)).getPath, 0L)).sum
        if (rows > 0) {
          perBatch.put(id, (rows, ksum, bytes))
          val now = System.nanoTime()
          walls.add((now - lastEnd.getAndSet(now)) / 1e9)
        }
        ()
      }

      val ck = java.nio.file.Files.createTempDirectory(s"graft_st_ck$scale").toString
      val t0 = System.nanoTime()
      // leg 1: tail fresh, STOP mid-catch-up after ~1/3 of the
      // expected batches, then resume from the checkpoint
      val stopAt = math.max(1, (totalBytes / capBytes / 3).toInt)
      val q1 = spark.readStream
        .option("maxBytesPerTrigger", capBytes.toString)
        .table("graft_st.lake.t")
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch(handle _)
        .start()
      while (q1.isActive && perBatch.size < stopAt) Thread.sleep(20)
      q1.stop()
      q1.awaitTermination()
      val resumedFrom = perBatch.size
      val q2 = spark.readStream
        .option("maxBytesPerTrigger", capBytes.toString)
        .table("graft_st.lake.t")
        .writeStream.option("checkpointLocation", ck)
        .foreachBatch(handle _)
        .start()
      q2.processAllAvailable()
      q2.stop()
      val wallSec = (System.nanoTime() - t0) / 1e9

      import scala.jdk.CollectionConverters._
      val snap = perBatch.values.asScala.toSeq
      val batches = snap.size
      val rowsSeen = snap.map(_._1).sum
      val sumSeen = snap.map(_._2).sum
      val maxBatchBytes = (0L +: snap.map(_._3)).max
      val wallList = walls.asScala.toList
      val medWall = if (wallList.isEmpty) 0.0 else {
        val s = wallList.sorted; s(s.length / 2)
      }
      // ---- hard gates ----
      val allowed = math.max(capBytes, maxFileBytes) + maxFileBytes
      require(maxBatchBytes <= allowed,
        s"ADMISSION GATE FAILED at scale $scale: batch of $maxBatchBytes bytes " +
          s"exceeds cap $capBytes (+1-file allowance $allowed)")
      require(rowsSeen == n && sumSeen == n * (n - 1) / 2,
        s"EXACTNESS GATE FAILED at scale $scale after mid-catch-up restart: " +
          s"rows $rowsSeen/$n sum $sumSeen/${n * (n - 1) / 2}")
      val expected = (totalBytes.toDouble / capBytes).ceil
      require(batches >= expected.toInt / 2 && batches <= 2 * expected.toInt + 4,
        s"BATCH-COUNT GATE FAILED at scale $scale: $batches batches for " +
          s"expected ≈ $expected")
      secPerBatch(scale) = medWall
      batchCounts(scale) = batches.toDouble
      println(f"""{"op":"tail_catchup","scale":$scale,"batches":$batches,"resumed_after":$resumedFrom,"max_batch_bytes":$maxBatchBytes,"cap":$capBytes,"rows":$rowsSeen,"sec":$wallSec%.3f,"sec_per_batch_med":$medWall%.4f,"exact":true}""")
      spark.catalog.clearCache()

      // ---- LOG-tier twin: the entity log's tail under the same fixed
      // byte cap (LogMicroBatchStream's admission is a byte-budgeted
      // segment prefix, at least one per trigger) — same gates, so
      // both tiers carry the same admission-scale evidence
      val ldir = s"$wh/logtail$scale"
      spark.range(n).selectExpr(
          "concat('u', id % 9973) AS user_id", "id AS amount",
          "CAST(NULL AS BINARY) AS msg", "CAST(id AS STRING) AS sha256sum")
        .repartitionByRange(4 * scale, col("amount"))
        .write.format(graft.sources.LimitHashLog.FORMAT)
        .mode("append").save(ldir)
      val segs = fs.listStatus(new Path(ldir)).filter(s => s.isFile &&
        !s.getPath.getName.startsWith(".") && !s.getPath.getName.startsWith("_"))
      val logBytes = segs.map(_.getLen).sum
      val rowsPerSeg = math.max(1L, n / (4L * scale))
      if (logCapBytes == 0L) logCapBytes = math.max(1L, logBytes / 4)
      val segsPerBatchCap =
        math.max(1L, logCapBytes / math.max(1L, segs.map(_.getLen).max)) + 1L
      println(s"""{"setup":"log_tail","scale":$scale,"rows":$n,"segments":${segs.length},"bytes":$logBytes,"cap":$logCapBytes}""")
      val lPerBatch = new ConcurrentHashMap[Long, (Long, Long)]() // id -> (rows, sum)
      val lWalls = new java.util.concurrent.ConcurrentLinkedQueue[Double]()
      val lLastEnd = new java.util.concurrent.atomic.AtomicLong(System.nanoTime())
      def lHandle(df: Dataset[Row], id: Long): Unit = {
        val agg = df.agg(
          org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
          sum(col("amount"))).head
        val rows = agg.getLong(0)
        if (rows > 0) {
          lPerBatch.put(id, (rows, agg.getLong(1)))
          val now = System.nanoTime()
          lWalls.add((now - lLastEnd.getAndSet(now)) / 1e9)
        }
        ()
      }
      val lck = java.nio.file.Files.createTempDirectory(s"graft_st_lck$scale").toString
      val lt0 = System.nanoTime()
      val lStopAt = math.max(1, (logBytes / logCapBytes / 3).toInt)
      val lq1 = spark.readStream.format(graft.sources.LimitHashLog.FORMAT)
        .option("maxBytesPerTrigger", logCapBytes.toString).load(ldir)
        .writeStream.option("checkpointLocation", lck)
        .foreachBatch(lHandle _).start()
      while (lq1.isActive && lPerBatch.size < lStopAt) Thread.sleep(20)
      lq1.stop(); lq1.awaitTermination()
      val lResumedFrom = lPerBatch.size
      val lq2 = spark.readStream.format(graft.sources.LimitHashLog.FORMAT)
        .option("maxBytesPerTrigger", logCapBytes.toString).load(ldir)
        .writeStream.option("checkpointLocation", lck)
        .foreachBatch(lHandle _).start()
      lq2.processAllAvailable(); lq2.stop()
      val lWallSec = (System.nanoTime() - lt0) / 1e9
      val lSnap = lPerBatch.values.asScala.toSeq
      val lBatches = lSnap.size
      val lRows = lSnap.map(_._1).sum
      val lSum = lSnap.map(_._2).sum
      val lMaxRows = (0L +: lSnap.map(_._1)).max
      val lWallList = lWalls.asScala.toList
      val lMedWall = if (lWallList.isEmpty) 0.0 else {
        val s = lWallList.sorted; s(s.length / 2)
      }
      require(lRows == n && lSum == n * (n - 1) / 2,
        s"LOG EXACTNESS GATE FAILED at scale $scale after restart: " +
          s"rows $lRows/$n sum $lSum/${n * (n - 1) / 2}")
      require(lMaxRows <= segsPerBatchCap * rowsPerSeg,
        s"LOG ADMISSION GATE FAILED at scale $scale: batch of $lMaxRows rows " +
          s"exceeds ${segsPerBatchCap * rowsPerSeg} (cap $logCapBytes)")
      val lExpected = (logBytes.toDouble / logCapBytes).ceil
      require(lBatches >= lExpected.toInt / 2 && lBatches <= 2 * lExpected.toInt + 4,
        s"LOG BATCH-COUNT GATE FAILED at scale $scale: $lBatches for ≈ $lExpected")
      logSecPerBatch(scale) = lMedWall
      logBatchCounts(scale) = lBatches.toDouble
      println(f"""{"op":"log_tail_catchup","scale":$scale,"batches":$lBatches,"resumed_after":$lResumedFrom,"max_batch_rows":$lMaxRows,"cap":$logCapBytes,"rows":$lRows,"sec":$lWallSec%.3f,"sec_per_batch_med":$lMedWall%.4f,"exact":true}""")
      spark.catalog.clearCache()
    }

    val lo = scales.min
    val hi = scales.max
    def exp(m: Map[Int, Double]): String =
      if (scales.size < 2 || lo == hi || !m.contains(lo) || !m.contains(hi)) "null"
      else {
        val e = math.log(m(hi) / math.max(m(lo), 1e-9)) / math.log(hi.toDouble / lo)
        if (e.isNaN || e.isInfinite) "null" else f"$e%.2f"
      }
    println(s"""{"soak":"tail_admission_batch_is_the_unit_of_work","base_rows":$baseRows,""" +
      s""""scales":[${scales.mkString(",")}],""" +
      s""""sec_per_batch":${exp(secPerBatch.toMap)},"batches":${exp(batchCounts.toMap)},""" +
      s""""log_sec_per_batch":${exp(logSecPerBatch.toMap)},"log_batches":${exp(logBatchCounts.toMap)}}""")
    spark.stop()
  }
}
