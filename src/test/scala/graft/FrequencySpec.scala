package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FreqAggs
import graft.operators.Frequency

/** Bounded-cardinality aggregates: uniqUpTo must be exact below the cap
  * and saturate above it REGARDLESS of partitioning (merge can't
  * un-saturate or double-count), and SpaceSaving topK must be exact in
  * the under-capacity regime and keep its frequent-item guarantee when
  * forced to evict. */
class FrequencySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val SF = "/root/testdata/sf0.001"

  private def uniq(vals: Seq[Int], n: Int, parts: Int): Long = {
    import spark.implicits._
    vals.toDF("v").repartition(parts)
      .agg(FreqAggs.uniqUpTo(col("v"), n).as("u"))
      .head().getLong(0)
  }

  test("uniqUpTo: exact below cap, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      assert(uniq(Seq(1, 2, 3, 2, 1), 4, parts) === 3L)
    }
  }

  test("uniqUpTo: saturates at n+1 above cap, any partitioning") {
    for (parts <- Seq(1, 3, 7)) {
      assert(uniq((1 to 50).map(_ % 10), 4, parts) === 5L)
      assert(uniq(1 to 100, 8, parts) === 9L)
    }
  }

  test("uniqUpTo: exactly n distinct is reported exactly (boundary)") {
    for (parts <- Seq(1, 5)) {
      assert(uniq((1 to 4) ++ (1 to 4), 4, parts) === 4L)
    }
  }

  test("uniqUpTo: nulls don't count") {
    import spark.implicits._
    val u = Seq(Some(1), None, Some(2), None).toDF("v")
      .agg(FreqAggs.uniqUpTo(col("v"), 5).as("u")).head().getLong(0)
    assert(u === 2L)
  }

  private def topk(vals: Seq[String], k: Int, cap: Int, parts: Int): Seq[(String, Long)] = {
    import spark.implicits._
    vals.toDF("v").repartition(parts)
      .agg(FreqAggs.approxTopK(col("v"), k, cap).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.v"), col("e.cnt"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
  }

  test("topK: exact counts and order in the under-capacity regime") {
    val data = Seq.fill(7)("a") ++ Seq.fill(5)("b") ++ Seq.fill(5)("c") ++ Seq("d")
    for (parts <- Seq(1, 4)) {
      // tie between b and c broken by value asc — deterministic
      assert(topk(data, 3, 16, parts) === Seq(("a", 7L), ("b", 5L), ("c", 5L)))
    }
  }

  test("topK: dominant heavy hitter survives forced evictions") {
    // 60% of the stream is "hot"; 40 singleton keys churn the other
    // 8 counters. SpaceSaving guarantees any item with frequency
    // > n/capacity is in the summary — the hot key must be rank 1.
    val noise = (1 to 40).map(i => s"n$i")
    val data = scala.util.Random.shuffle(
      Seq.fill(60)("hot") ++ noise: Seq[String])
    val top = topk(data, 1, 8, 1)
    assert(top.head._1 === "hot")
    // SpaceSaving counts over-estimate, never under-estimate
    assert(top.head._2 >= 60L)
  }

  test("topK: count over-estimate is bounded by n/capacity") {
    val noise = (1 to 40).map(i => s"n$i")
    val data = Seq.fill(60)("hot") ++ noise
    val top = topk(data, 1, 8, 1)
    // classic SpaceSaving bound: err <= n / capacity
    assert(top.head._2 - 60L <= data.size / 8)
  }

  private def run(name: String): DataFrame =
    Frequency.queries(name)(spark, SF)

  test("topKWeighted: exact weighted sums and order in the under-capacity regime") {
    import spark.implicits._
    val data = Seq(("a", 10L), ("b", 100L), ("a", 5L), ("c", 1L), ("b", 2L))
    for (parts <- Seq(1, 3)) {
      val got = data.toDF("v", "w").repartition(parts)
        .agg(FreqAggs.approxTopKWeighted(col("v"), col("w"), 2, 8).as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.v"), col("e.cnt"))
        .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      assert(got === Seq(("b", 102L), ("a", 15L)))
    }
  }

  test("uniqUpTo + topK equal their exact definitions on 20 random datasets") {
    import spark.implicits._
    val rnd = new scala.util.Random(97531)
    for (trial <- 1 to 20) {
      val nRows = 1 + rnd.nextInt(500)
      val card = 1 + rnd.nextInt(12)
      val n = 1 + rnd.nextInt(8)
      val parts = 1 + rnd.nextInt(6)
      val vals = Seq.fill(nRows)(s"v${rnd.nextInt(card)}")
      val df = vals.toDF("v").repartition(parts)
      val gotUniq = df.agg(FreqAggs.uniqUpTo(col("v"), n)).head().getLong(0)
      val wantUniq = math.min(vals.distinct.size, n + 1).toLong
      assert(gotUniq === wantUniq, s"uniqUpTo trial=$trial card=$card n=$n parts=$parts")
      // capacity ≥ cardinality ⇒ exact regime: top-3 must be the true
      // frequency top-3 under (count desc, value asc)
      val gotTop = df.agg(FreqAggs.approxTopK(col("v"), 3, 16).as("tk"))
        .select(explode(col("tk")).as("e")).select(col("e.v"), col("e.cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val wantTop = vals.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (v, c) => (-c, v) }.take(3)
      assert(gotTop === wantTop, s"topK trial=$trial card=$card parts=$parts")
    }
  }

  test("q65: agrees with exact distinct counts, saturated to the cap") {
    val got = run("q65_uniq_upto").collect()
    val want = spark.read.parquet(s"$SF/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(least(countDistinct(col("l_suppkey")), lit(5)).cast("long").as("u_supp"),
        least(countDistinct(col("l_partkey")), lit(3)).cast("long").as("u_part"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_orderkey")).collect()
    assert(got.toSeq === want.toSeq)
  }

  test("q66: sketch top-3 equals exact frequency top-3 (exact regime)") {
    val got = run("q66_topk_freq").collect()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderstatus"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    val want = spark.read.parquet(s"$SF/orders.parquet")
      .groupBy(col("o_orderstatus"), col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("o_orderstatus"), col("rank"), col("o_orderpriority").as("priority"), col("n"))
      .orderBy(col("o_orderstatus"), col("rank")).collect()
    assert(got.toSeq === want.toSeq)
  }

  test("q68: sample is 3 docs per language, stable across runs") {
    val a = run("q68_group_sample").collect()
    val b = run("q68_group_sample").collect()
    assert(a.toSeq === b.toSeq) // deterministic ⇒ replayable under retry
    val perLang = a.groupBy(_.getString(0)).view.mapValues(_.length)
    assert(perLang.values.forall(_ <= 3))
  }

  test("s13: streaming topK agrees with the exact batch top-3") {
    val got = graft.operators.StreamingQueries.queries("s13_stream_topk")(spark, SF)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("event_type"))
    val want = spark.read.parquet(s"$SF/events.parquet")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("rank"), col("event_type"), col("n"))
      .orderBy(col("rank"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
  }

  test("q71: merged daily sketch states equal the direct one-pass estimate, within 5% of exact") {
    // q71's registered form sketches the bounded user_id % 100 (exact
    // SET mode — oracle-checked); its merged-vs-direct identity must
    // hold there too
    val got = graft.operators.Aggregates.queries("q71_sketch_state")(spark, SF)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val evB = Tables.events(spark, SF)
      .select(weekofyear(to_date(col("ts"))).as("week"),
        pmod(col("user_id"), lit(100)).as("k"))
    val directB = evB.groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("k"), 12)).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.foreach { case (week, est, _) =>
      assert(est === directB(week), s"merged-state route diverges for week $week")
    }
    // the genuinely-APPROXIMATE regime (raw user_ids, unbounded): the
    // register-max merge must still make staged and one-pass routes
    // identical, and the estimate must land within 5% of exact
    val ev = Tables.events(spark, SF)
      .select(to_date(col("ts")).as("day"), col("user_id"))
    val staged = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id"), 12).as("st"))
      .groupBy(weekofyear(col("day")).as("week"))
      .agg(hll_sketch_estimate(hll_union_agg(col("st"), lit(true))).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val direct = ev.select(weekofyear(col("day")).as("week"), col("user_id"))
      .groupBy(col("week"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("e"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val exact = ev.select(weekofyear(col("day")).as("week"), col("user_id"))
      .distinct().groupBy(col("week")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    direct.foreach { case (week, est) =>
      assert(est === staged(week), s"raw-domain staged route diverges for week $week")
      assert(math.abs(est - exact(week)).toDouble / exact(week) <= 0.05)
    }
  }

  test("q29's unbounded regime: raw-domain HLL++ estimates land within 5% of exact") {
    val li = spark.read.parquet(s"$SF/lineitem.parquet")
    // rsd 0.02 (the default 0.05 legitimately misses a 5% band)
    val got = li.groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), rsd = 0.02).as("ap"),
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("ao"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("ep"),
        countDistinct(col("l_orderkey")).as("eo"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (k, (ep, eo)) =>
      val (ap, ao) = got(k)
      assert(math.abs(ap - ep).toDouble / ep <= 0.05, s"$k parts: $ap vs $ep")
      assert(math.abs(ao - eo).toDouble / eo <= 0.05, s"$k orders: $ao vs $eo")
    }
  }

  test("streaming SpaceSaving state survives a checkpointed restart") {
    import spark.implicits._
    import graft.streaming.AsyncIngest
    val ck = java.nio.file.Files.createTempDirectory("freq_ck").toString
    val ingest = new AsyncIngest[(Long, String)](spark.sqlContext)
    def start(name: String) = ingest.toDS().toDF("id", "v")
      .groupBy()
      .agg(FreqAggs.approxTopK(col("v"), 2, 8).as("tk"))
      .writeStream.outputMode("complete")
      .option("checkpointLocation", ck)
      .format("memory").queryName(name).start()

    // batch 1: "a" dominates; stop the query entirely
    val q1 = start("freq_restart_1")
    ingest.saveAllAsync((1L to 10L).map(i => (i, "a")) ++ Seq((11L, "b")))
    q1.processAllAvailable(); q1.stop()
    // batch 2 arrives while no query runs; restart from the checkpoint
    ingest.saveAllAsync((20L to 25L).map(i => (i, "b")) ++ Seq((26L, "c")))
    val q2 = start("freq_restart_2")
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("freq_restart_2")
      .select(explode(col("tk")).as("e")).select(col("e.v"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // counts must include BOTH halves — batch 1 only via recovered state
    assert(got === Seq(("a", 10L), ("b", 7L)))
  }

  test("streaming aggregation state runs on the RocksDB provider (large-state posture)") {
    import spark.implicits._
    import graft.streaming.AsyncIngest
    // providerClass is read at query start — scope it to this test
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ingest = new AsyncIngest[(Long, String)](spark.sqlContext)
      val q = ingest.toDS().toDF("id", "v")
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"))
        .writeStream.outputMode("complete")
        .format("memory").queryName("freq_rocksdb").start()
      ingest.saveAllAsync((1L to 50L).map(i => (i, s"k${i % 5}")))
      q.processAllAvailable(); q.stop()
      val got = spark.table("freq_rocksdb").collect()
        .map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === (0 until 5).map(i => s"k$i" -> 10L).toMap)
    } finally {
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("q67 runs and averages are consistent with min/max bounds") {
    val rows = run("q67_min_max_map").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mins = r.getAs[String]("min_csv").split(",").map(_.toLong)
      val maxs = r.getAs[String]("max_csv").split(",").map(_.toLong)
      val avg = r.getAs[Double]("avg_value") * 100
      assert(avg >= mins.min - 1e-6 && avg <= maxs.max + 1e-6)
    }
  }

  test("topK saturating regime: high-cardinality churn keeps SpaceSaving guarantees") {
    // 5,000 distinct keys through 16 counters — every arrival past the
    // first 16 evicts (the regime the heap-backed min tracking exists
    // for). The frequent-item guarantee (freq > n/capacity ⇒ present,
    // counts never under-estimate) must hold throughout.
    val rnd = new scala.util.Random(8642)
    val noise = Seq.fill(5000)(s"x${rnd.nextInt(5000)}")
    val data = rnd.shuffle(Seq.fill(2000)("hot") ++ Seq.fill(1200)("warm") ++ noise)
    for (parts <- Seq(1, 4)) {
      val top = topk(data, 2, 16, parts)
      assert(top.map(_._1) === Seq("hot", "warm"))
      assert(top.head._2 >= 2000L, "SpaceSaving never under-estimates")
      assert(top(1)._2 >= 1200L)
      // over-estimate bound: err ≤ n/capacity (per-partition bounds sum)
      assert(top.head._2 - 2000L <= data.size / 16 * parts)
    }
  }

  test("topKWeighted: a mistyped weight fails at analysis, not as a runtime CCE") {
    import spark.implicits._
    import graft.functions.SpaceSavingTopK
    import org.apache.spark.sql.GraftShims.{column, expression}
    // bypass the public API's coercing cast: a string weight must be
    // rejected by checkInputDataTypes when the plan is analyzed
    val df = Seq(("a", "not-a-number")).toDF("v", "w")
    val raw = column(SpaceSavingTopK(expression(col("v")), 1, 8,
      weight = Some(expression(col("w")))).toAggregateExpression())
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      df.agg(raw.as("tk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"))
    // while the public API coerces: int weights just work
    val ok = Seq(("a", 3), ("a", 4), ("b", 5)).toDF("v", "w")
      .agg(FreqAggs.approxTopKWeighted(col("v"), col("w"), 1, 8).as("tk"))
      .select(explode(col("tk")).as("e")).select(col("e.v"), col("e.cnt"))
      .head()
    assert(ok.getString(0) === "a" && ok.getLong(1) === 7L)
  }

  test("topKWeighted: negative weights are rejected explicitly") {
    import spark.implicits._
    val ex = intercept[Exception] {
      Seq(("a", -5L)).toDF("v", "w")
        .agg(FreqAggs.approxTopKWeighted(col("v"), col("w"), 1, 8).as("tk"))
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(ex).exists(_.getMessage != null) &&
      causes(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("negative weights are not supported")))
  }
}
