package graft.tools

/** CORE-SCALING EVIDENCE LEG (VERDICT r20 next #2): the driver's
  * low-core/high-core bench ratios are ≈ 1 at sf0.1 because 11 MB of
  * data leaves every declared query FIXED-COST-BOUND (driver
  * orchestration, commit protocol, codegen) — core count cannot show.
  * This soak runs a genuinely DATA-BOUND workload — the engine's own
  * query shapes over generated inputs big enough that task compute
  * dominates — once per requested core count (one SparkSession per
  * leg, sequential; local[N] exactly like Sessions.base), and prints
  * per-leg walls plus the speedup ratio, so "the engine parallelizes"
  * is demonstrated by a committed artifact instead of inferred from a
  * probe that cannot fire.
  *
  * Workloads (all compute from `spark.range` — nothing read from or
  * persisted to /root/testdata; fresh lineage per run):
  *   - `agg`: 200M-row hash aggregate with expression-heavy projection
  *     (q01's shape: per-row arithmetic + group-by reduction);
  *   - `join`: 20M × 20M shuffle join on a synthetic key with a
  *     per-row payload reduction (q06's shape);
  *   - `sort`: 50M-row global sort (exchange + external sort).
  *
  * Usage: runMain graft.tools.SoakScale [cores,cores,...] [reps]
  * (defaults "8,32" and 3; each leg reports its min wall). */
object SoakScale {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val coreLegs = (if (args.nonEmpty) args(0) else "8,32")
      .split(",").map(_.trim.toInt).toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)

    val walls = scala.collection.mutable.Map[(String, Int), Double]()
    for (cores <- coreLegs) {
      val spark = graft.Sessions.base(master = s"local[$cores]",
        shufflePartitions = cores)
      import spark.implicits._
      // warm-up: JVM/codegen startup paid outside the timed region
      spark.range(5000000L).selectExpr("sum(id * 2) AS s")
        .write.format("noop").mode("overwrite").save()
      val work: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
        "agg" -> (() => spark.range(200000000L)
          .selectExpr("id % 1000 AS k",
            "sin(cast(id AS DOUBLE)) * cos(cast(id AS DOUBLE)) AS x",
            "id % 7 AS f")
          .groupBy($"k")
          .agg(org.apache.spark.sql.functions.sum($"x").as("sx"),
            org.apache.spark.sql.functions.avg($"f").as("af"),
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)).as("n"))),
        "join" -> (() => {
          val a = spark.range(20000000L)
            .selectExpr("pmod(xxhash64(id), 5000000) AS k", "id AS va")
          val b = spark.range(20000000L)
            .selectExpr("pmod(xxhash64(id + 77), 5000000) AS k", "id AS vb")
          a.join(b, "k").groupBy($"k" % 101)
            .agg(org.apache.spark.sql.functions.sum($"va" + $"vb").as("s"))
        }),
        "sort" -> (() => spark.range(50000000L)
          .selectExpr("xxhash64(id) AS k", "id AS v")
          .orderBy($"k")))
      for ((name, mk) <- work) {
        var best = Double.MaxValue
        for (_ <- 0 until reps) {
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        }
        walls((name, cores)) = best
        println(s"""{"soak":"core_scaling","leg":"$name","cores":$cores,"wall_sec":${f3(best)}}""")
      }
      spark.stop()
    }
    val lo = coreLegs.min
    val hi = coreLegs.max
    val parts = Seq("agg", "join", "sort").map { n =>
      val r = walls((n, lo)) / walls((n, hi))
      s""""${n}_speedup_${lo}to$hi":${f3(r)}"""
    }
    println(s"""{"soak":"core_scaling_summary","cores_lo":$lo,"cores_hi":$hi,${parts.mkString(",")}}""")
  }
}
