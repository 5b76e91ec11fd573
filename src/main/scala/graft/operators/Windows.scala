package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** Window-function surface: ranking, running frames, lag/lead, and
  * global top-k.
  *
  * Determinism rule: every ORDER BY inside a window is a total order
  * (ties broken by primary-key columns), otherwise rank/lag values are
  * engine-dependent.
  *
  * Scale posture: a window = one shuffle on partitionBy keys + per-key
  * sort. partitionBy keys here (returnflag, suppkey, custkey) have enough
  * cardinality to spread; the one global pattern (top-k) deliberately
  * avoids `Window.partitionBy()` (single-partition trap) and uses
  * orderBy+limit, which Spark executes as per-partition top-k + driver
  * merge (TakeOrderedAndProject) — O(k) memory, no global sort.
  */
object Windows {

  /** row_number / rank / dense_rank: top-3 lines per return flag. */
  def q14_window_rank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("l_returnflag"), col("rn"), col("rnk"), col("drnk"),
        col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_returnflag"), col("rn"))
  }

  /** Running (cumulative) sum over an explicit ROWS frame, per supplier. */
  def q15_window_running(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 3)
      .withColumn("running_qty", sum(m(col("l_quantity"))).over(w).cast(DoubleType))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("running_qty"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** lag/lead across a customer's order history. */
  def q16_window_lag_lead(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 20)
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("prev_price"), col("next_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Global top-k: TakeOrderedAndProject, not a global sort. */
  def q17_sort_topk(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Time-based sliding RANGE frame: per-user trailing-hour event count
    * and value sum — the frame mode ROWS offsets (q15) cannot express
    * (peers join the frame by VALUE distance, not row position). The
    * ordering column is epoch SECONDS so the 3600 bound is an exact
    * integer in both engines; the value sum goes through the Exact
    * decimal cast so the frame aggregation is order-independent. */
  def q46_window_range(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch_s"))
      .rangeBetween(-3600, 0)
    Tables.events(spark, dir)
      .filter(col("user_id") <= 20)
      .withColumn("epoch_s", unix_timestamp(col("ts")))
      .withColumn("n_last_hour", count(lit(1)).over(w))
      .withColumn("sum_last_hour", sum(m(col("value"))).over(w).cast(DoubleType))
      .select(col("user_id"), col("event_id"), col("epoch_s"),
        col("n_last_hour"), col("sum_last_hour"))
      .orderBy(col("user_id"), col("epoch_s"), col("event_id"))
  }

  /** Top-k per group via the engine's NATIVE operator
    * ([[graft.plans.TopKPerGroup]]): custom logical node + strategy +
    * two-phase bounded-heap physical exec — ClickHouse's `LIMIT k BY`
    * re-expressed as a Catalyst extension. Same semantics as q14's
    * row_number form, but the shuffle carries at most k rows per group
    * per input partition and nothing is ever sorted (the trailing
    * orderBy here is presentation/oracle-compare only — it runs on the
    * already-reduced k×groups rows, not the input). */
  def q47_topk_native(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup.topKPerGroup(
        Tables.customer(spark, dir)
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal")),
        groupCols = Seq(col("c_nationkey")),
        orderCols = Seq(col("c_acctbal").desc, col("c_custkey").asc),
        k = 3)
      .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))

  /** Distribution-rank window family: ntile buckets, percent_rank,
    * cume_dist — per-customer order-history position. Same shuffle
    * shape as q14 (one window partition pass); the rank math is exact
    * int/int double division, so it hash-matches cross-engine. */
  def q50_window_distribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 20)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** first/last_value with IGNORE NULLS over a sparse (mostly-null)
    * derived column — the gap-fill primitive behind
    * last-observation-carried-forward. The last_value frame must be
    * the full partition (default frames stop at CURRENT ROW). */
  def q51_window_ignore_nulls(spark: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    val wf = Window.partitionBy(col("l_suppkey")).orderBy(ord: _*)
    val wAll = wf.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .withColumn("disc_price",
        when(col("l_discount") > 0.05, col("l_extendedprice")))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        first(col("disc_price"), ignoreNulls = true).over(wAll).as("first_disc"),
        last(col("disc_price"), ignoreNulls = true).over(wAll).as("last_disc"))
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Time-grid resample + gap fill — ClickHouse's `ORDER BY ... WITH
    * FILL` re-expressed: each user's event span explodes into an hourly
    * grid (sequence over timestamps), per-hour aggregates left-join
    * onto it, and missing hours carry the last observation forward
    * (q51's IGNORE NULLS primitive). The in-hour "last" is a
    * lexicographic struct max (q49's argMax form) so ties are
    * deterministic. Scale: the grid explode is per-user in the scan
    * stage; the only shuffles are the hourly agg and the LOCF window,
    * both partitioned by user. */
  def q52_resample_fill(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .filter(col("user_id") <= 10)
      .withColumn("hour", date_trunc("hour", col("ts")))
    val hourly = ev.groupBy(col("user_id"), col("hour"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("hour_last"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
      .select(col("user_id"),
        explode(expr("sequence(lo, hi, interval 1 hour)")).as("hour"))
    val wLocf = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"),
        col("hour").cast(TimestampNTZType).as("hour"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("hour_last"), ignoreNulls = true).over(wLocf).as("locf_value"))
      .orderBy(col("user_id"), col("hour"))
  }

  /** rank() <= k WITH TIES through the native heap — the user writes
    * the standard window pattern; `NativeWindowGroupLimitRule` plans it
    * on the ties-aware TopKRankPerGroup operator (PlansSpec asserts the
    * swap), so the shuffle carries ≤ (k + boundary ties) rows per group
    * per partition instead of every row. Latest order dates share days
    * across orders — real ties the output must keep beyond k. */
  def q74_rank_topk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_orderdate").desc)
    Tables.orders(spark, dir)
      .withColumn("rk", rank().over(w))
      .filter(col("rk") <= 2)
      .select(col("o_orderstatus"), col("rk").cast(LongType).as("rk"),
        col("o_orderdate").cast(TimestampNTZType).as("o_orderdate"),
        col("o_orderkey"))
      .orderBy(col("o_orderstatus"), col("rk"), col("o_orderkey"))
  }

  /** Sliding ROWS frame (ClickHouse `groupArrayMovingSum`/`MovingAvg`):
    * 3-row moving sum/average per supplier in ship order — the frame
    * type q15 (unbounded running) and q46 (RANGE) don't cover. The
    * ORDER BY is a total order (shipdate, orderkey, linenumber), so
    * frame contents are engine-deterministic; sums ride exact decimal
    * cents and the average divides them by the frame count in DOUBLE. */
  def q76_moving_frame(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(-2, 0)
    Tables.lineitem(spark, dir)
      .withColumn("mov_sum", sum(m(col("l_extendedprice"))).over(w).cast(DoubleType))
      .withColumn("mov_n", count(lit(1)).over(w))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate").cast(TimestampNTZType).as("l_shipdate"), col("mov_sum"),
        (col("mov_sum") / col("mov_n")).as("mov_avg"))
      // (orderkey, linenumber) is NOT unique in this corpus — shipdate
      // completes the total order (the unique 4-tuple, FIXTURES note)
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"))
  }

  /** dense_rank() <= k through the native rule — all lineitems at the
    * top-2 distinct quantity values per return flag (ClickHouse
    * `LIMIT k BY` on a value level). Plans on TopKDenseRankPerGroup:
    * k value-buckets per group on both sides of the exchange, so the
    * shuffle carries only rows at ≤ k distinct values per group per
    * partition. ORDER BY is the unique 4-tuple (FIXTURES: (orderkey,
    * linenumber) alone is NOT unique in this corpus). */
  def q77_dense_rank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_quantity").desc)
    Tables.lineitem(spark, dir)
      .withColumn("rk", dense_rank().over(w))
      .filter(col("rk") <= 2)
      .select(col("l_returnflag"), col("rk").cast(LongType).as("rk"),
        col("l_quantity"), col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"),
        col("l_shipdate").cast(TimestampNTZType).as("l_shipdate"))
      .orderBy(col("l_returnflag"), col("rk"), col("l_suppkey"),
        col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q77_dense_rank" -> (q77_dense_rank _),
    "q76_moving_frame" -> (q76_moving_frame _),
    "q74_rank_topk" -> (q74_rank_topk _),
    "q14_window_rank" -> (q14_window_rank _),
    "q52_resample_fill" -> (q52_resample_fill _),
    "q50_window_distribution" -> (q50_window_distribution _),
    "q51_window_ignore_nulls" -> (q51_window_ignore_nulls _),
    "q47_topk_native" -> (q47_topk_native _),
    "q15_window_running" -> (q15_window_running _),
    "q16_window_lag_lead" -> (q16_window_lag_lead _),
    "q17_sort_topk" -> (q17_sort_topk _),
    "q46_window_range" -> (q46_window_range _))

  val oracle: Map[String, String] = Map(
    "q77_dense_rank" ->
      """SELECT l_returnflag, rk, l_quantity, l_suppkey, l_orderkey,
        |  l_linenumber, CAST(l_shipdate AS TIMESTAMP) AS l_shipdate FROM (
        |  SELECT l_returnflag, l_quantity, l_suppkey, l_orderkey,
        |    l_linenumber, l_shipdate,
        |    DENSE_RANK() OVER (PARTITION BY l_returnflag
        |                       ORDER BY l_quantity DESC) AS rk
        |  FROM lineitem)
        |WHERE rk <= 2
        |ORDER BY l_returnflag, rk, l_suppkey, l_orderkey, l_linenumber,
        |  l_shipdate""".stripMargin,
    "q76_moving_frame" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate, mov_sum,
        |  mov_sum / mov_n AS mov_avg FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) OVER w AS DOUBLE) AS mov_sum,
        |    COUNT(*) OVER w AS mov_n
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |               ORDER BY l_shipdate, l_orderkey, l_linenumber
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW))
        |ORDER BY l_suppkey, l_orderkey, l_linenumber, l_shipdate""".stripMargin,
    "q74_rank_topk" ->
      """SELECT o_orderstatus, rk, CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
        |  o_orderkey FROM (
        |  SELECT o_orderstatus, o_orderdate, o_orderkey,
        |    RANK() OVER (PARTITION BY o_orderstatus
        |                 ORDER BY o_orderdate DESC) AS rk
        |  FROM orders)
        |WHERE rk <= 2 ORDER BY o_orderstatus, rk, o_orderkey""".stripMargin,
    "q52_resample_fill" ->
      """WITH e AS (
        |  SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts,
        |    DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS hour
        |  FROM events WHERE user_id <= 10),
        |hourly AS (
        |  SELECT user_id, hour, COUNT(*) AS n_events,
        |    struct_extract(MAX(struct_pack(ts := ts, event_id := event_id,
        |      value := value)), 'value') AS hour_last
        |  FROM e GROUP BY user_id, hour),
        |bounds AS (SELECT user_id, MIN(hour) AS lo, MAX(hour) AS hi
        |           FROM e GROUP BY user_id),
        |grid AS (SELECT user_id,
        |         UNNEST(GENERATE_SERIES(lo, hi, INTERVAL 1 HOUR)) AS hour
        |         FROM bounds)
        |SELECT g.user_id, g.hour,
        |  COALESCE(h.n_events, 0) AS n_events,
        |  LAST_VALUE(h.hour_last IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.hour
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
        |FROM grid g LEFT JOIN hourly h
        |  ON g.user_id = h.user_id AND g.hour = h.hour
        |ORDER BY g.user_id, g.hour""".stripMargin,
    "q50_window_distribution" ->
      """SELECT o_custkey, o_orderkey,
        |  NTILE(4) OVER w AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q51_window_ignore_nulls" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  FIRST_VALUE(CASE WHEN l_discount > 0.05 THEN l_extendedprice END IGNORE NULLS)
        |    OVER w AS first_disc,
        |  LAST_VALUE(CASE WHEN l_discount > 0.05 THEN l_extendedprice END IGNORE NULLS)
        |    OVER w AS last_disc
        |FROM lineitem WHERE l_suppkey <= 5
        |WINDOW w AS (PARTITION BY l_suppkey
        |  ORDER BY l_shipdate, l_orderkey, l_linenumber
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q47_topk_native" ->
      """SELECT c_nationkey, c_custkey, c_acctbal
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |                       ORDER BY c_acctbal DESC, c_custkey) AS rn
        |  FROM customer)
        |WHERE rn <= 3
        |ORDER BY c_nationkey, c_acctbal DESC, c_custkey""".stripMargin,
    "q14_window_rank" ->
      """SELECT l_returnflag, rn, rnk, drnk, l_orderkey, l_linenumber, l_extendedprice
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 3 ORDER BY l_returnflag, rn""".stripMargin,
    "q15_window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q16_window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_totalprice, 1) OVER w AS next_price
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q17_sort_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q46_window_range" ->
      """WITH e AS (
        |  SELECT user_id, event_id,
        |    CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch_s,
        |    CAST(value AS DECIMAL(9,2)) AS v
        |  FROM events WHERE user_id <= 20)
        |SELECT user_id, event_id, epoch_s,
        |  COUNT(*) OVER w AS n_last_hour,
        |  CAST(SUM(v) OVER w AS DOUBLE) AS sum_last_hour
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
        |  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, epoch_s, event_id""".stripMargin)
}
