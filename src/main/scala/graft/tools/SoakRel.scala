package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** RELATIONAL-SURFACE SCALE SOAK (VERDICT r19 next #6): every prior
  * soak targets the connector/ANN/DML paths; this one measures the
  * HEADLINE RELATIONAL PLANS — aggregation (q01), the multi-star join
  * chain (q06), approx-distinct sketching (q29), the salted skew join
  * (q35), the TPC-H-shaped ship-priority join-agg-topk (q38) and the
  * nation-volume join tree (q39) — across the three driver-generated
  * scale factors (sf0.001 / sf0.01 / sf0.1 = 1×/10×/100× data) and
  * GATES their growth:
  *
  *   - shuffle-bytes exponent ≤ 1.15 per query (linear at worst —
  *     a super-linear exponent means a join started producing
  *     intermediate blow-up, the exact regression a 1000× production
  *     scale-up would amplify into a cluster-killer);
  *   - wall exponent ≤ 1.1 per query (at these sizes fixed job costs
  *     dominate, so honest values sit well below 1 — the gate is the
  *     tripwire, not the claim);
  *   - rows returned must be STABLE per query across runs at a given
  *     SF (same input → same answer; the correctness oracle proper is
  *     the driver's DuckDB compare, not this soak).
  *
  * Exponents are denominated in the LINEITEM row count at each SF (all
  * generated tables scale together), between the smallest and largest
  * SF. Per (query, sf) the JSON row also records which join strategy
  * the plan picked (broadcast / sort-merge / none) — the evidence trail
  * for plan flips as data grows (a healthy flip is expected once a side
  * outgrows the broadcast threshold; the exponent gates say whether the
  * flipped plan still scales).
  *
  * Usage: runMain graft.tools.SoakRel [sfs] [root]
  * (defaults sf0.001,sf0.01,sf0.1 and /root/testdata). One JSON line
  * per (query, sf), then a summary with exponents. */
object SoakRel {

  private val Queries = Seq(
    "q01_pricing_summary", "q06_join_multi_star", "q29_agg_approx_distinct",
    "q35_skew_salted_join", "q38_shipping_priority", "q39_nation_volume")

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfs = if (args.nonEmpty) args(0).split(",").map(_.trim).toSeq
      else Seq("sf0.001", "sf0.01", "sf0.1")
    val root = if (args.length > 1) args(1) else "/root/testdata"
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")

    // per-stage shuffle-write accounting; reset around each timed run
    // (queries run serially; the listener bus drains on a short wait)
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val registry = graft.SparkEntry.queries
    val wall = scala.collection.mutable.Map[(String, String), Double]()
    val bytes = scala.collection.mutable.Map[(String, String), Double]()
    val denom = scala.collection.mutable.Map[String, Double]()

    for (sf <- sfs) {
      val dir = s"$root/$sf"
      val lineitemRows = spark.read.parquet(s"$dir/lineitem.parquet").count()
      denom(sf) = lineitemRows.toDouble
      for (name <- Queries) {
        val q = registry(name)
        // plan evidence: which join strategy did Catalyst pick here?
        val plan = q(spark, dir).queryExecution.executedPlan.toString
        val joins =
          (if (plan.contains("BroadcastHashJoin")) Seq("broadcast") else Nil) ++
            (if (plan.contains("SortMergeJoin")) Seq("sort-merge") else Nil) ++
            (if (plan.contains("ShuffledHashJoin")) Seq("shuffled-hash") else Nil)
        val joinKinds = if (joins.isEmpty) "none" else joins.mkString("+")
        q(spark, dir).collect() // warm-up (codegen, file listings)
        var rowsSeen = -1L
        val runs = (1 to 3).map { _ =>
          spark.catalog.clearCache()
          shuffleBytes.set(0L)
          shuffleRecords.set(0L)
          val t0 = System.nanoTime()
          val rows = q(spark, dir).collect().length.toLong
          val w = (System.nanoTime() - t0) / 1e9
          require(rowsSeen < 0 || rowsSeen == rows,
            s"STABILITY GATE FAILED: $name at $sf returned $rows rows " +
              s"after $rowsSeen on the same input")
          rowsSeen = rows
          Thread.sleep(500) // drain the async listener bus
          (w, shuffleBytes.get(), shuffleRecords.get())
        }.sortBy(_._1)
        val (w, sb, sr) = runs(1) // median-wall run carries the metrics
        wall((name, sf)) = w
        bytes((name, sf)) = sb.toDouble
        println(f"""{"op":"$name","sf":"$sf","lineitem_rows":$lineitemRows,"wall_sec":$w%.3f,"shuffle_bytes":$sb,"shuffle_records":$sr,"rows":$rowsSeen,"joins":"$joinKinds"}""")
      }
    }

    val lo = sfs.head
    val hi = sfs.last
    val dataRatio = denom(hi) / denom(lo)
    def expOpt(m: scala.collection.mutable.Map[(String, String), Double],
        name: String): Option[Double] =
      if (sfs.size < 2 || !m.contains((name, lo)) || !m.contains((name, hi)))
        None
      else {
        val e = math.log(m((name, hi)) / math.max(m((name, lo)), 1e-9)) /
          math.log(dataRatio)
        if (e.isNaN || e.isInfinite) None else Some(e)
      }
    def jn(o: Option[Double]): String = o.fold("null")(e =>
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(e)))
    val parts = Queries.map { name =>
      val wExp = expOpt(wall, name)
      val bExp = expOpt(bytes, name)
      require(bExp.forall(_ <= 1.15),
        s"SCALING GATE FAILED: $name shuffle-bytes exponent ${jn(bExp)} " +
          "(want ≤ 1 — linear at worst); an intermediate result is " +
          "growing faster than the data")
      require(wExp.forall(_ <= 1.1),
        s"SCALING GATE FAILED: $name wall exponent ${jn(wExp)} " +
          "(want well below 1 at these sizes)")
      s""""${name}_wall_exp":${jn(wExp)},"${name}_shuffle_bytes_exp":${jn(bExp)}"""
    }
    println(s"""{"soak":"relational_headline_plans","sfs":[${
      sfs.map(s => s""""$s"""").mkString(",")}],"data_ratio":${
      String.format(java.util.Locale.ROOT, "%.1f", Double.box(dataRatio))},${
      parts.mkString(",")}}""")
    spark.stop()
  }
}
