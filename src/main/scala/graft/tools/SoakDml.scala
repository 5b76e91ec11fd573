package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** MoR DML SCALE SOAK (VERDICT r13 #5 / r14 #7): runs the production
  * merge-on-read DML paths against tables of growing size with a
  * FIXED-size matched delta, and reports wall seconds and BYTES
  * WRITTEN per (op, scale). The lightweight-DML claim is
  * O(matched + inserted) write amplification — bytes must stay ~flat
  * as the table grows 1×/10×/100× (growth exponent ≈ 0), while wall
  * time may grow sublinearly with the file count (footer
  * classification is O(files)). The purge leg is the deliberate
  * exception: it IS the deferred rewrite, so its cost tracks the
  * masked-file count by design and is reported for the churn budget,
  * not for an exponent claim.
  *
  * Ops per scale, on a fresh versioned range-clustered table:
  *   - merge_mask:  1 000 scattered keys, UPDATE arm → per-file key masks
  *   - update_mask: predicate UPDATE on a clustered 1 000-key range
  *   - merge_dv:    5 000 scattered keys with maxMaskKeys=100 → DV regime
  *   - purge:       CALL purge_masks (the deferred rewrite, measured)
  *
  * Usage: runMain graft.tools.SoakDml [baseRows] [scales]
  * (defaults 50000 and 1,10,100). One JSON line per (op, scale), then
  * a summary with log-log growth exponents for sec and bytes. */
object SoakDml {

  private def bytesOf(fs: org.apache.hadoop.fs.FileSystem, dir: String,
      names: Set[String]): Long =
    names.toSeq.map { n =>
      try fs.getFileStatus(new Path(s"$dir/data", n)).getLen
      catch { case _: java.io.FileNotFoundException => 0L }
    }.sum

  private def dvBytes(fs: org.apache.hadoop.fs.FileSystem, dir: String): Long = {
    val d = new Path(dir, graft.sources.DeletionVectors.DIR)
    if (!fs.exists(d)) 0L
    else fs.listStatus(d).filter(_.isFile).map(_.getLen).sum
  }

  def main(args: Array[String]): Unit = {
    val baseRows = if (args.nonEmpty) args(0).toLong else 50000L
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_soakdml_wh").toString
    spark.conf.set("spark.sql.catalog.graft_sd", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_sd.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sd.lake")
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val secs = scala.collection.mutable.Map[(String, Int), Double]()
    val bytes = scala.collection.mutable.Map[(String, Int), Long]()

    def timed[A](op: String, scale: Int, dir: String)(body: => A): A = {
      val before = graft.sources.ParquetVersions.latest(dir).get._2.toSet
      val dvBefore = dvBytes(fs, dir)
      val t0 = System.nanoTime()
      val out = body
      val sec = (System.nanoTime() - t0) / 1e9
      val after = graft.sources.ParquetVersions.latest(dir).get._2.toSet
      val written = bytesOf(fs, dir, after -- before) +
        math.max(0L, dvBytes(fs, dir) - dvBefore)
      secs((op, scale)) = sec
      bytes((op, scale)) = written
      val masks = graft.sources.ParquetVersions.masksFor(dir, None)
      val dvMasks = masks.valuesIterator.flatten
        .count(graft.sources.DeletionVectors.isDv)
      println(f"""{"op":"$op","scale":$scale,"sec":$sec%.3f,"bytes_written":$written,"masked_files":${masks.size},"dv_entries":$dvMasks}""")
      out
    }

    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try for (scale <- scales) {
      val n = baseRows * scale
      spark.sql("DROP TABLE IF EXISTS graft_sd.lake.t")
      spark.sql("CREATE TABLE graft_sd.lake.t (k BIGINT, v BIGINT, pad STRING)")
      // range-clustered, file count grows with the table (100 MB-file
      // posture scaled down); pad makes bytes-written visible
      spark.range(n).selectExpr("id AS k", "id AS v",
          "repeat(uuid(), 2) AS pad")
        .repartitionByRange(4 * scale, org.apache.spark.sql.functions.col("k"))
        .writeTo("graft_sd.lake.t").append()
      val dir = s"$wh/lake/t"
      spark.sql("CALL graft_sd.system.enable_versioning(table => 'lake.t')")
      println(s"""{"setup":"table","scale":$scale,"rows":$n,"files":${
        graft.sources.ParquetVersions.latest(dir).get._2.size}}""")

      // 1000 matched keys SCATTERED across the whole key range — the
      // CDC trickle shape; every file is a candidate
      val stride = n / 1000L
      spark.range(1000).selectExpr(s"id * $stride AS k", "id AS nv")
        .createOrReplaceTempView("sd_src")
      timed("merge_mask", scale, dir) {
        spark.sql("""MERGE INTO graft_sd.lake.t t USING sd_src s ON t.k = s.k
                     WHEN MATCHED THEN UPDATE SET v = s.nv""")
      }

      // clustered predicate UPDATE: fixed 1000-key range
      timed("update_mask", scale, dir) {
        spark.sql("UPDATE graft_sd.lake.t SET v = v + 1 WHERE k >= 100 AND k < 1100")
      }

      // DV regime: 5000 scattered keys past a 100-key mask cap
      val stride5 = n / 5000L
      spark.range(5000).selectExpr(s"id * $stride5 + 7 AS k")
        .createOrReplaceTempView("sd_dv_src")
      spark.conf.set(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY, "100")
      try timed("merge_dv", scale, dir) {
        spark.sql("""MERGE INTO graft_sd.lake.t t USING sd_dv_src s ON t.k = s.k
                     WHEN MATCHED THEN DELETE""")
      } finally spark.conf.unset(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY)

      // the cheap middle gear: fold every file's stack into ONE DV on
      // a hardlink — bytes written = the sidecar bits (the links share
      // their data bytes, so the ledger-diff accounting of `timed`
      // would lie; the CALL reports its own sidecar_bytes)
      locally {
        val t0 = System.nanoTime()
        val row = spark.sql(
          "CALL graft_sd.system.compact_masks(table => 'lake.t', min_preds => 1)").head
        val sec = (System.nanoTime() - t0) / 1e9
        secs(("dv_fold", scale)) = sec
        bytes(("dv_fold", scale)) = row.getLong(4)
        println(f"""{"op":"dv_fold","scale":$scale,"sec":$sec%.3f,"bytes_written":${row.getLong(4)},"compacted":${row.getLong(1)},"unmasked":${row.getLong(2)}}""")
      }

      // the deferred rewrite: purge everything masked (churn budget leg)
      timed("purge", scale, dir) {
        spark.sql("CALL graft_sd.system.purge_masks(table => 'lake.t')")
      }
      spark.catalog.clearCache()

      // ---- LOG-tier twins (r16: line-ordinal DVs) — same claims on
      // the entity-log tier: key masks and positional DVs are
      // O(matched) bytes however large the log grows; purge is the
      // deferred rewrite
      spark.sql("DROP TABLE IF EXISTS graft_sd.lake.lg")
      spark.sql("""CREATE TABLE graft_sd.lake.lg
                   (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
      spark.range(n).selectExpr("concat('u', id % 9973) AS user_id",
          "id AS amount", "CAST(NULL AS BINARY) AS msg",
          "CAST(id AS STRING) AS sha256sum")
        .repartitionByRange(4 * scale, org.apache.spark.sql.functions.col("amount"))
        .writeTo("graft_sd.lake.lg").append()
      val ldir = s"$wh/lake/lg"
      graft.sources.LogVersions.enable(ldir)
      def timedLog[A](op: String)(body: => A): A = {
        val before = graft.sources.LogVersions.latest(ldir).get._2.toSet
        val dvBefore = dvBytes(fs, ldir)
        val t0 = System.nanoTime()
        val out = body
        val sec = (System.nanoTime() - t0) / 1e9
        val after = graft.sources.LogVersions.latest(ldir).get._2.toSet
        val written = (after -- before).toSeq.map { nm =>
          try fs.getFileStatus(new Path(ldir, nm)).getLen
          catch { case _: java.io.FileNotFoundException => 0L }
        }.sum + math.max(0L, dvBytes(fs, ldir) - dvBefore)
        secs((op, scale)) = sec
        bytes((op, scale)) = written
        val masks = graft.sources.LogVersions.masksFor(ldir, None)
          .filter(_._2.nonEmpty)
        val dvMasks = masks.valuesIterator.flatten
          .count(graft.sources.DeletionVectors.isDv)
        println(f"""{"op":"$op","scale":$scale,"sec":$sec%.3f,"bytes_written":$written,"masked_files":${masks.size},"dv_entries":$dvMasks}""")
        out
      }
      spark.range(1000).selectExpr(s"CAST(id * $stride AS STRING) AS k", "id AS nv")
        .createOrReplaceTempView("sd_lsrc")
      timedLog("log_merge_mask") {
        spark.sql("""MERGE INTO graft_sd.lake.lg t USING sd_lsrc s
                     ON t.sha256sum = s.k
                     WHEN MATCHED THEN UPDATE SET amount = s.nv""")
      }
      spark.range(5000).selectExpr(s"CAST(id * $stride5 + 7 AS STRING) AS k")
        .createOrReplaceTempView("sd_ldv_src")
      spark.conf.set(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY, "100")
      try timedLog("log_merge_dv") {
        spark.sql("""MERGE INTO graft_sd.lake.lg t USING sd_ldv_src s
                     ON t.sha256sum = s.k
                     WHEN MATCHED THEN DELETE""")
      } finally spark.conf.unset(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY)
      timedLog("log_purge") {
        spark.sql("CALL graft_sd.system.purge_masks(table => 'lake.lg')")
      }
      spark.catalog.clearCache()
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)

    val lo = scales.min
    val hi = scales.max
    def exp(m: Map[(String, Int), Double], op: String): String = {
      // single-scale invocations (log(1)=0) and legs that errored
      // mid-run must not produce Infinity/NaN or throw away the whole
      // summary — emit null for exponents that cannot be computed
      // (ADVICE r15)
      if (scales.size < 2 || lo == hi ||
          !m.contains((op, lo)) || !m.contains((op, hi))) "null"
      else {
        val e = math.log(m((op, hi)) / math.max(m((op, lo)), 1e-9)) /
          math.log(hi.toDouble / lo)
        if (e.isNaN || e.isInfinite) "null" else f"$e%.2f"
      }
    }
    val ops = Seq("merge_mask", "update_mask", "merge_dv", "dv_fold", "purge",
      "log_merge_mask", "log_merge_dv", "log_purge")
    val secExps = ops.map(o => s""""${o}_sec":${exp(secs.toMap, o)}""")
    val byteExps = ops.map(o =>
      s""""${o}_bytes":${exp(bytes.toMap.map { case (k, v) => k -> v.toDouble }, o)}""")
    println(s"""{"soak":"dml_growth_exponent_0_is_O(matched)","base_rows":$baseRows,""" +
      s""""scales":[${scales.mkString(",")}],${(secExps ++ byteExps).mkString(",")}}""")
    spark.stop()
  }
}
