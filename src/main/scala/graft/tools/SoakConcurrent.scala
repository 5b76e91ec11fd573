package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** CONCURRENT MULTI-WRITER DML SOAK (VERDICT r15 #5): the one-shot race
  * specs (AdviceR11/R12/R13) pin each conflict window once; this
  * measures SUSTAINED two-writer MERGE churn with concurrent mask
  * maintenance — the steady state of a shared 100 TB upsert table:
  *
  *   - two writer threads each run `rounds` merge-on-read MERGEs that
  *     INCREMENT v on DISJOINT scattered key sets (adjacent keys, so
  *     both writers mask the SAME files every round — maximum
  *     MaskGuard contention);
  *   - a maintenance thread folds mask stacks (`compact_masks`)
  *     continuously while they run;
  *   - correctness gate: after the dust settles every touched key must
  *     read v = k + rounds EXACTLY — an under-increment is a LOST
  *     update (a publish that overwrote a concurrent mask), an
  *     over-increment a double-applied retry — and untouched rows must
  *     be bit-identical in aggregate.
  *
  * Reported per scale: per-writer wall seconds, MaskConflict retries
  * ([[graft.sources.ParquetVersions.maskConflictRetries]]), compaction
  * folds, lost/over updates (must be 0). Two scales give a wall-time
  * growth exponent — contention cost must not super-scale with table
  * size (the conflict window is per-FILE mask drift, not table scan).
  *
  * The LOG-tier leg runs the same two-writer/maintenance shape against
  * an entity-log table (fixed schema, MERGE on sha256sum) — the r16
  * line-ordinal DV machinery under the same contention.
  *
  * Usage: runMain graft.tools.SoakConcurrent [baseRows] [scales] [rounds]
  * (defaults 50000, "1,10", 6). */
object SoakConcurrent {

  def main(args: Array[String]): Unit = {
    val baseRows = if (args.nonEmpty) args(0).toLong else 50000L
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10)
    val rounds = if (args.length > 2) args(2).toInt else 6
    val nKeys = 500
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")
    // sustained contention needs a deeper retry budget than
    // interactive DML's 3 attempts
    sys.props("graft.mor.retry.attempts") = "64"
    val wh = java.nio.file.Files.createTempDirectory("graft_soakcc_wh").toString
    spark.conf.set("spark.sql.catalog.graft_sc", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_sc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sc.lake")

    val wall = scala.collection.mutable.Map[(Int, Int), Double]() // (writer, scale)

    try for (scale <- scales) {
      val n = baseRows * scale
      spark.sql("DROP TABLE IF EXISTS graft_sc.lake.t")
      spark.sql("CREATE TABLE graft_sc.lake.t (k BIGINT, v BIGINT, pad STRING)")
      spark.range(n).selectExpr("id AS k", "id AS v", "repeat(uuid(), 2) AS pad")
        .repartitionByRange(4 * scale, org.apache.spark.sql.functions.col("k"))
        .writeTo("graft_sc.lake.t").append()
      val dir = s"$wh/lake/t"
      spark.sql("CALL graft_sc.system.enable_versioning(table => 'lake.t')")
      // writer w updates keys id*stride + w: adjacent to the other
      // writer's keys, so every round both writers mask the same files
      val stride = n / nKeys
      (0 to 1).foreach { w =>
        spark.range(nKeys).selectExpr(s"id * $stride + $w AS k")
          .createOrReplaceTempView(s"sc_src_$w")
      }
      spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
      val retries0 = graft.sources.ParquetVersions.maskConflictRetries.get()
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writersDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      var folds = 0L
      def writer(w: Int): Thread = new Thread(() => {
        try {
          val t0 = System.nanoTime()
          (1 to rounds).foreach { _ =>
            spark.sql(s"""MERGE INTO graft_sc.lake.t t USING sc_src_$w s
                          ON t.k = s.k
                          WHEN MATCHED THEN UPDATE SET v = t.v + 1""")
          }
          wall.synchronized { wall((w, scale)) = (System.nanoTime() - t0) / 1e9 }
        } catch { case t: Throwable => errors.add(t) }
      }, s"soak-writer-$w")
      val maint = new Thread(() => {
        try while (!writersDone.get()) {
          val row = spark.sql(
            "CALL graft_sc.system.compact_masks(table => 'lake.t', min_preds => 2)")
            .head
          folds += row.getLong(1)
          Thread.sleep(100L)
        } catch { case t: Throwable => errors.add(t) }
      }, "soak-maint")
      val ws = Seq(writer(0), writer(1))
      maint.start(); ws.foreach(_.start())
      ws.foreach(_.join())
      writersDone.set(true)
      maint.join()
      spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
      if (!errors.isEmpty) {
        errors.forEach(_.printStackTrace())
        throw new IllegalStateException(
          s"concurrent soak leg scale=$scale had ${errors.size} writer/maint failures")
      }
      val retries = graft.sources.ParquetVersions.maskConflictRetries.get() - retries0
      // correctness gate: every touched key incremented EXACTLY rounds
      // times; everything else untouched (count + sum fingerprint)
      val bad = spark.sql(
        s"""SELECT count(*) FROM graft_sc.lake.t
            WHERE (k % $stride) IN (0, 1) AND k < ${stride * nKeys}
              AND v != k + $rounds""").head.getLong(0)
      val untouchedBad = spark.sql(
        s"""SELECT count(*) FROM graft_sc.lake.t
            WHERE NOT ((k % $stride) IN (0, 1) AND k < ${stride * nKeys})
              AND v != k""").head.getLong(0)
      val total = spark.table("graft_sc.lake.t").count()
      println(s"""{"op":"concurrent_merge","scale":$scale,"rows":$n,""" +
        f""""writer0_sec":${wall.getOrElse((0, scale), -1.0)}%.3f,""" +
        f""""writer1_sec":${wall.getOrElse((1, scale), -1.0)}%.3f,""" +
        s""""retries":$retries,"folds":$folds,"lost_or_double":${bad + untouchedBad},""" +
        s""""row_count_ok":${total == n}}""")
      require(bad == 0L && untouchedBad == 0L && total == n,
        s"LOST UPDATES at scale=$scale: touched=$bad untouched=$untouchedBad total=$total/$n")
      spark.catalog.clearCache()

      // ---- LOG-tier leg: same contention shape on the entity log ----
      spark.sql("DROP TABLE IF EXISTS graft_sc.lake.lg")
      spark.sql("""CREATE TABLE graft_sc.lake.lg
                   (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
      spark.range(n).selectExpr("concat('u', id % 97) AS user_id",
          "id AS amount", "CAST(NULL AS BINARY) AS msg",
          "CAST(id AS STRING) AS sha256sum")
        .repartitionByRange(4 * scale, org.apache.spark.sql.functions.col("amount"))
        .writeTo("graft_sc.lake.lg").append()
      val ldir = s"$wh/lake/lg"
      graft.sources.LogVersions.enable(ldir)
      (0 to 1).foreach { w =>
        spark.range(nKeys).selectExpr(s"CAST(id * $stride + $w AS STRING) AS k")
          .createOrReplaceTempView(s"sc_lsrc_$w")
      }
      spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
      val lRetries0 = graft.sources.ParquetVersions.maskConflictRetries.get()
      val lErrors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val lDone = new java.util.concurrent.atomic.AtomicBoolean(false)
      val lWall = scala.collection.mutable.Map[Int, Double]()
      var lPurges = 0L
      def lWriter(w: Int): Thread = new Thread(() => {
        try {
          val t0 = System.nanoTime()
          (1 to rounds).foreach { _ =>
            spark.sql(s"""MERGE INTO graft_sc.lake.lg t USING sc_lsrc_$w s
                          ON t.sha256sum = s.k
                          WHEN MATCHED THEN UPDATE SET amount = t.amount + 1""")
          }
          lWall.synchronized { lWall(w) = (System.nanoTime() - t0) / 1e9 }
        } catch { case t: Throwable => lErrors.add(t) }
      }, s"soak-lwriter-$w")
      val lMaint = new Thread(() => {
        try while (!lDone.get()) {
          spark.sql(
            "CALL graft_sc.system.purge_masks(table => 'lake.lg', min_preds => 3)")
          lPurges += 1
          Thread.sleep(150L)
        } catch { case t: Throwable => lErrors.add(t) }
      }, "soak-lmaint")
      val lws = Seq(lWriter(0), lWriter(1))
      lMaint.start(); lws.foreach(_.start())
      lws.foreach(_.join())
      lDone.set(true)
      lMaint.join()
      spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
      if (!lErrors.isEmpty) {
        lErrors.forEach(_.printStackTrace())
        throw new IllegalStateException(
          s"log concurrent soak leg scale=$scale had ${lErrors.size} failures")
      }
      val lRetries =
        graft.sources.ParquetVersions.maskConflictRetries.get() - lRetries0
      val lBad = spark.sql(
        s"""SELECT count(*) FROM graft_sc.lake.lg
            WHERE (CAST(sha256sum AS BIGINT) % $stride) IN (0, 1)
              AND CAST(sha256sum AS BIGINT) < ${stride * nKeys}
              AND amount != CAST(sha256sum AS BIGINT) + $rounds""").head.getLong(0)
      val lUntouchedBad = spark.sql(
        s"""SELECT count(*) FROM graft_sc.lake.lg
            WHERE NOT ((CAST(sha256sum AS BIGINT) % $stride) IN (0, 1)
                       AND CAST(sha256sum AS BIGINT) < ${stride * nKeys})
              AND amount != CAST(sha256sum AS BIGINT)""").head.getLong(0)
      val lTotal = spark.table("graft_sc.lake.lg").count()
      println(s"""{"op":"log_concurrent_merge","scale":$scale,"rows":$n,""" +
        f""""writer0_sec":${lWall.getOrElse(0, -1.0)}%.3f,""" +
        f""""writer1_sec":${lWall.getOrElse(1, -1.0)}%.3f,""" +
        s""""retries":$lRetries,"purges":$lPurges,""" +
        s""""lost_or_double":${lBad + lUntouchedBad},"row_count_ok":${lTotal == n}}""")
      require(lBad == 0L && lUntouchedBad == 0L && lTotal == n,
        s"LOG LOST UPDATES at scale=$scale: touched=$lBad untouched=$lUntouchedBad total=$lTotal/$n")
      spark.catalog.clearCache()
    } finally sys.props.remove("graft.mor.retry.attempts")

    val lo = scales.min; val hi = scales.max
    def exp(w: Int): String =
      if (scales.size < 2 || lo == hi ||
          !wall.contains((w, lo)) || !wall.contains((w, hi))) "null"
      else {
        val e = math.log(wall((w, hi)) / math.max(wall((w, lo)), 1e-9)) /
          math.log(hi.toDouble / lo)
        if (e.isNaN || e.isInfinite) "null" else f"$e%.2f"
      }
    println(s"""{"soak":"concurrent_two_writer_merge","base_rows":$baseRows,""" +
      s""""scales":[${scales.mkString(",")}],"rounds":$rounds,""" +
      s""""writer0_wall_exp":${exp(0)},"writer1_wall_exp":${exp(1)}}""")
    spark.stop()
  }
}
