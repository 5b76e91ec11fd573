package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Machine-enforced plan hygiene: the 100 TB invariants the Scaladocs
  * claim (pushdown reaches the scan, small sides broadcast, top-k never
  * global-sorts, scan-stage ops don't shuffle) asserted on the actual
  * physical plans, so a regression in plan shape fails CI rather than
  * waiting for a bench diff. Complements tools/ExplainAudit (the
  * interactive version of the same checks). */
class PlanAuditSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  /** Detail-section headers "(N) Exchange" — one per shuffle, broadcasts
    * not counted ("(N) BroadcastExchange" does not match). */
  private def shuffles(p: String): Int =
    "\\(\\d+\\) Exchange".r.findAllIn(p).size

  test("q03: conjunctive filter is pushed to the parquet scan") {
    val p = plan("q03_filter_conjunctive")
    assert(p.contains("PushedFilters: ["), p.linesIterator.take(30).mkString("\n"))
    assert("PushedFilters: \\[[^\\]]*EqualTo".r.findFirstIn(p).isDefined,
      "equality predicates must reach the scan")
  }

  test("q01: date filter pushed; partial+final agg = exactly one data shuffle plus result sort") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: ["))
    assert(shuffles(p) <= 2, s"q01 shuffle count grew:\n${shuffles(p)}")
  }

  test("q05: dimension joins broadcast, never shuffle the fact side per-join") {
    val p = plan("q05_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), "small dims must broadcast")
  }

  test("q69: shredded read prunes the raw column and pushes the typed predicate") {
    val p = plan("q69_variant_shred")
    // the aggregation's scan (second scan in the plan — the first is the
    // shred write) must not read `raw` and must push k >= 50
    assert(!p.contains("raw"), "raw column must be pruned from the shredded read")
    assert("PushedFilters: \\[[^\\]]*GreaterThanOrEqual\\(k,50\\)".r.findFirstIn(p).isDefined,
      "typed predicate must reach the shredded parquet scan:\n" +
        p.linesIterator.filter(_.contains("PushedFilters")).mkString("\n"))
  }

  test("q65/q66: bounded-cardinality aggregates keep partial aggregation (one data shuffle)") {
    // ObjectHashAggregate partial → exchange → final: the capped buffers
    // must not force a sort-based or single-stage plan
    val p65 = plan("q65_uniq_upto")
    assert(p65.contains("ObjectHashAggregate"), p65.linesIterator.take(12).mkString("\n"))
    assert(shuffles(p65) <= 2) // agg shuffle + result range-sort
    val p66 = plan("q66_topk_freq")
    assert(p66.contains("ObjectHashAggregate"))
    assert(shuffles(p66) <= 2)
  }

  test("v07: centroid set broadcasts; assignment needs no corpus shuffle before the heap") {
    val p = plan("v07_cluster_assign")
    assert(p.contains("BroadcastExchange"), "centroids must broadcast")
  }

  test("q81/q82: interval overlap plans with NO join at all (sweep line / running max)") {
    for (name <- Seq("q81_max_intersections", "q82_interval_union")) {
      val p = plan(name)
      assert(!p.toLowerCase.contains("join"), s"$name must not self-join intervals")
      assert(shuffles(p) <= 2, s"$name: window shuffle + result sort only")
    }
  }

  test("q78: quantile-state rollup runs on the native heap, no window, no full sort") {
    val p = plan("q78_quantile_state")
    assert(p.contains("TopKPerGroupPartial"), "weekly trim must use the native heap")
    assert(!p.contains("Window ("), "no window operator in the rollup")
  }

  test("q80: delta sum is one window shuffle over user partitions") {
    val p = plan("q80_delta_sum")
    assert(!p.toLowerCase.contains("join"))
    assert(shuffles(p) <= 2) // window shuffle + result sort
  }

  test("q79: changeset apply broadcasts the changes, never shuffles the snapshot") {
    val p = plan("q79_apply_changeset")
    assert(p.contains("BroadcastExchange"), "changeset must broadcast")
    assert(!p.contains("SortMergeJoin"), "snapshot must not shuffle for the apply")
  }

  test("q17: top-k plans as TakeOrdered (per-partition heap), not a global sort") {
    val p = plan("q17_sort_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(shuffles(p) <= 1)
  }

  test("t07: corpus ngram top-k = one count shuffle + TakeOrdered") {
    val p = plan("t07_ngram_topk")
    assert(p.contains("TakeOrderedAndProject"))
    assert(shuffles(p) === 1, "partial-agg count must be the only shuffle")
  }

  test("scan-stage ops (t01, t02, t06, p02, m03) shuffle at most for the oracle orderBy") {
    Seq("t01_text_tokens", "t02_text_quality", "t06_text_scrub",
        "p02_split_assign", "m03_frame_sample").foreach { n =>
      val s = shuffles(plan(n))
      assert(s <= 1, s"$n: expected scan-stage-only (+result sort), got $s shuffles")
    }
  }

  test("d01: exact dedup = one hash-agg shuffle (+ result sort)") {
    assert(shuffles(plan("d01_dedup_exact")) <= 2)
  }

  test("q39: 6-table star keeps every dimension broadcast — only the fact pair shuffles") {
    val p = plan("q39_nation_volume")
    val bcast = "\\(\\d+\\) BroadcastHashJoin".r.findAllIn(p).size
    assert(bcast >= 4, s"star dims must broadcast, saw $bcast broadcast joins")
    assert(shuffles(p) <= 3, s"q39 shuffle count grew to ${shuffles(p)}")
  }

  test("q48: bucketed range join plans as a hash equi-join, never a nested loop") {
    val p = plan("q48_range_bucket_join")
    assert(!p.contains("NestedLoop"),
      "the bucket rewrite exists to avoid BroadcastNestedLoopJoin")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), "expected an equi-join on the bucket key")
  }

  test("q47: native top-k shuffles once and never sorts the input") {
    val p = plan("q47_topk_native")
    assert(p.contains("TopKPerGroupPartial") && p.contains("TopKPerGroupFinal"), p)
    assert(shuffles(p) <= 2, s"partial/final heap + result sort only, got ${shuffles(p)}")
  }

  test("d07: benchmark gram set broadcasts; corpus grams never shuffle for the match") {
    val p = plan("d07_decontaminate")
    assert(p.contains("BroadcastHashJoin"), "benchmark grams must broadcast")
  }

  test("v01: query set broadcasts against the corpus scan") {
    val p = plan("v01_sim_bruteforce_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the small query set must broadcast")
  }
}
