package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopKPerGroup

/** The native TopKPerGroup operator (custom logical node + strategy +
  * physical exec): result equivalence vs the window-function form, edge
  * cases (ties, k ≥ group size, single group), and the physical-plan
  * invariants the operator exists for — two heap phases around one
  * exchange, no sort, no window. */
class PlansSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val sfDir = "/root/testdata/sf0.001"

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  private def nativeTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopKPerGroup.topKPerGroup(df,
      Seq(col("c_nationkey")), Seq(col("c_acctbal").desc, col("c_custkey").asc), k)

  test("native top-k matches row_number window form on the corpus") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    for (k <- Seq(1, 3, 10)) {
      val expected = windowTopK(cust, k).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      val got = nativeTopK(cust, k).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
      assert(got === expected, s"k=$k")
    }
  }

  test("ties break deterministically and k >= group size returns whole group") {
    import spark.implicits._
    val df = Seq(
      (0, 1L, 5.0), (0, 2L, 5.0), (0, 3L, 5.0), (0, 4L, 1.0),
      (1, 9L, 2.0)).toDF("c_nationkey", "c_custkey", "c_acctbal")
    val got = nativeTopK(df, 2).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    // group 0: three tied 5.0s → lowest custkeys 1,2 win; group 1 has
    // fewer rows than k → everything survives
    assert(got === Set((0, 1L), (0, 2L), (1, 9L)))
  }

  test("plan is partial heap -> exchange -> final heap, with no sort or window") {
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    val plan = nativeTopK(cust.repartition(4), 3).queryExecution.executedPlan
    val s = plan.toString
    assert(s.contains("TopKPerGroupPartial"), s)
    assert(s.contains("TopKPerGroupFinal"), s)
    assert(s.contains("Exchange"), s)
    assert(!s.contains("WindowExec") && !s.contains("Window ("), s)
    assert(!s.toLowerCase.contains("sort ("), s)
    // the partial phase must run BELOW the exchange (map-side reduction):
    // walking down from the final node we meet Exchange before Partial
    val finalIdx = s.indexOf("TopKPerGroupFinal")
    val exchangeIdx = s.indexOf("Exchange")
    val partialIdx = s.indexOf("TopKPerGroupPartial")
    assert(finalIdx < exchangeIdx && exchangeIdx < partialIdx, s)
  }

  test("optimizer rule swaps WindowGroupLimit for the heap operator on row_number <= k") {
    // the standard user pattern — NOT the explicit topKPerGroup API
    val cust = Tables.customer(spark, sfDir)
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
    val windowed = windowTopK(cust, 3)
    val s = windowed.queryExecution.executedPlan.toString
    assert(s.contains("TopKPerGroupPartial") && s.contains("TopKPerGroupFinal"),
      s"rule did not fire:\n$s")
    assert(!s.contains("WindowGroupLimit"), "sort-based limiter should be replaced")
    assert(s.contains("Window"), "the Window stays (it ranks the reduced rows)")
    // and the rewritten plan still gives the row_number answer
    val viaRule = windowed.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val viaApi = nativeTopK(cust, 3).collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(viaRule === viaApi)
  }

  test("rank() <= k plans on the ties-aware heap and agrees with the window form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    val df = Tables.customer(spark, sfDir)
      .withColumn("rk", rank().over(w)).filter(col("rk") <= 3)
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TopKRankPerGroupPartial") && s.contains("TopKRankPerGroupFinal"),
      s"rank rule did not fire:\n$s")
    assert(!s.contains("WindowGroupLimit"), "sort-based limiter should be replaced")
    // correctness incl. boundary ties: compare against a plan with the
    // native rule disabled (plain window over the full input)
    val want = Tables.customer(spark, sfDir)
      .groupBy(col("c_nationkey"), col("c_acctbal")).count() // pre-agg breaks the limiter pattern
      .withColumn("rk", rank().over(
        Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)))
      .filter(col("rk") <= 3)
    // counts per nation must match exactly (ties expand both the same way)
    val gotN = df.groupBy("c_nationkey").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val wantRows = Tables.customer(spark, sfDir).collect()
      .map(r => (r.getInt(r.fieldIndex("c_nationkey")), r.getDouble(r.fieldIndex("c_acctbal"))))
    val wantN = wantRows.groupBy(_._1).map { case (nk, rows) =>
      val sorted = rows.map(_._2).sorted(Ordering[Double].reverse)
      val boundary = sorted(math.min(2, sorted.length - 1))
      nk -> sorted.count(_ >= boundary).toLong
    }
    assert(gotN === wantN)
    assert(want.count() > 0) // sanity: the comparison plan runs
  }

  test("dense_rank() <= k plans on the value-bucket retainer and agrees with the window form") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey")).orderBy(col("c_acctbal").desc)
    val df = Tables.customer(spark, sfDir)
      .withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 3)
    val got = df.collect()
      .map(r => (r.getInt(r.fieldIndex("c_nationkey")), r.getLong(r.fieldIndex("c_custkey"))))
      .toSet
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TopKDenseRankPerGroupPartial") && s.contains("TopKDenseRankPerGroupFinal"),
      s"dense_rank rule did not fire:\n$s")
    // driver-side dense-rank evaluation: rows of the 3 largest distinct
    // balances per nation
    val rows = Tables.customer(spark, sfDir).collect()
      .map(r => (r.getInt(r.fieldIndex("c_nationkey")),
        r.getLong(r.fieldIndex("c_custkey")),
        r.getDouble(r.fieldIndex("c_acctbal"))))
    val want = rows.toSeq.groupBy(_._1).toSeq.flatMap { case (_, grp) =>
      val top3 = grp.map(_._3).distinct.sorted(Ordering[Double].reverse).take(3).toSet
      grp.filter(r => top3.contains(r._3))
    }.map(r => (r._1, r._2)).toSet
    assert(got === want)
  }

  test("column pruning pushes below the custom node: unused columns never leave the scan") {
    // wide input, narrow consumption: only 2 of 5 customer columns are
    // needed (group key + order key + projected custkey)
    val wide = Tables.customer(spark, sfDir) // 5 columns
    val narrow = TopKPerGroup.topKPerGroup(wide,
        Seq(col("c_nationkey")), Seq(col("c_acctbal").desc, col("c_custkey")), 2)
      .select(col("c_nationkey"), col("c_custkey"))
    val scan = narrow.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(scan.contains("c_nationkey") && scan.contains("c_acctbal") &&
      scan.contains("c_custkey"), scan)
    assert(!scan.contains("c_name") && !scan.contains("c_mktsegment"),
      s"unused columns must be pruned from the scan: $scan")
    assert(narrow.count() === 25 * 2 || narrow.count() > 0)
  }

  test("native as-of join agrees with the union+window composition on the corpus") {
    val native = SparkEntry.queries("q55_asof_native")(spark, sfDir).collect()
    val composed = SparkEntry.queries("q33_join_asof")(spark, sfDir).collect()
    assert(native.map(_.toSeq).toSeq === composed.map(_.toSeq).toSeq)
    assert(native.nonEmpty)
  }

  test("native as-of join: merge plan shape, null fill before first match, exact ties") {
    import spark.implicits._
    import graft.plans.AsOfJoin
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L), (3L, 7L))
      .toDF("k", "t") // user 3 has no right rows at all
    val r = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 6L, "c"))
      .toDF("rk", "rt", "v")
    val out = AsOfJoin.asOfJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .select(col("k"), col("t"), col("v"))
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getString(2))).toSet
    // t=10 matches rt=10 (inclusive); t=20 takes the newest (rt=15);
    // user 2's t=5 precedes rt=6 -> null; user 3 -> null
    assert(out === Set((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, null), (3L, 7L, null)))
    val plan = AsOfJoin.asOfJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Union"),
      "the native operator must not fall back to the composition shape")
  }

  test("partial phase bounds shuffled rows to k per group per partition") {
    import spark.implicits._
    // 4 partitions x 1 group x 1000 rows: the exchange must carry at
    // most 4 * k rows, not 4000 — observable via the partial phase's
    // own output count
    val df = spark.range(0, 4000).select(
        lit(0).as("g"), col("id"), rand(7).as("v"))
      .repartition(4)
    val topk = TopKPerGroup.topKPerGroup(df,
      Seq(col("g")), Seq(col("v").desc, col("id").asc), 5)
    assert(topk.count() === 5)
    // AQE wraps the physical plan; collect from the materialized inner plan
    val exec = topk.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val partial = exec.collect {
      case e: TopKPerGroup.TopKPerGroupExec if e.partial => e
    }
    assert(partial.nonEmpty)
    // run just the partial subplan: ≤ k rows per input partition
    val partialCounts = partial.head.execute()
      .mapPartitions(it => Iterator.single(it.size)).collect()
    assert(partialCounts.forall(_ <= 5), partialCounts.mkString(","))
  }
}
