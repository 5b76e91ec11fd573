package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.FunnelExpr
import Exact._

/** Behavioral / product-analytics operators — the ClickHouse signature
  * family (`windowFunnel`, `retention`, `argMax`-style reports) plus the
  * statistical-aggregate and ordered-array-agg surface, all over the
  * `events` / TPC-H corpus and all DuckDB-oracle-checked.
  *
  * Scale stance shared by the family: per-ENTITY state (a user's funnel
  * events, a user's active-day set) is collected per group — bounded by
  * that entity's own activity, never by corpus size — and everything
  * else is plain partial-aggregatable hash aggregation. No windows, no
  * self-joins on the event table, no driver-side state.
  */
object Behavioral {

  private[operators] val FUNNEL_WINDOW_US = 3L * 24 * 3600 * 1000000L // 3 days
  private[operators] val FUNNEL_STEPS =
    Map("view" -> 1, "click" -> 2, "purchase" -> 3)

  /** Funnel analysis (ClickHouse `windowFunnel`): per user, the deepest
    * prefix of view → click → purchase completed in time order within a
    * 3-day window of the chain's first event. One groupBy shuffle of
    * (ts, step) pairs — the funnel fold itself is the native one-pass
    * [[graft.functions.FunnelExpr]] over each user's sorted events.
    * Users with no funnel events report level 0. */
  def q56_funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val step = when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)
    val levels = ev
      .select(col("user_id"), unix_micros(col("ts")).as("t"), step.as("step"))
      .filter(col("step").isNotNull)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t"), col("step")))).as("evs"))
      .select(col("user_id"),
        FunnelExpr.windowFunnel(col("evs"), FUNNEL_WINDOW_US, 3).as("funnel_level"))
    ev.select(col("user_id")).distinct()
      .join(levels, Seq("user_id"), "left")
      .select(col("user_id"),
        coalesce(col("funnel_level"), lit(0)).as("funnel_level"))
      .orderBy(col("user_id"))
  }

  /** Per-user funnel-step sequence string: events mapped to step digits
    * ('1'=view, '2'=click, '3'=purchase) concatenated in (ts, step)
    * order — (ts, step) is the deterministic tie-break both engines
    * share (equal-µs events sort by step; equal (ts, step) events are
    * identical characters). Users with no funnel events get "". The
    * string is bounded by the USER'S own activity — the same per-entity
    * state stance as q56 — and pattern matching over it is a per-row
    * codegen'd regex, so the whole family is one groupBy shuffle. */
  private def stepSequences(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val step = when(col("event_type") === "view", 1)
      .when(col("event_type") === "click", 2)
      .when(col("event_type") === "purchase", 3)
    val seqs = ev
      .select(col("user_id"), unix_micros(col("ts")).as("t"), step.as("step"))
      .filter(col("step").isNotNull)
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(sort_array(collect_list(struct(col("t"), col("step")))),
          e => e.getField("step").cast(StringType)), "").as("seq"))
    ev.select(col("user_id")).distinct()
      .join(seqs, Seq("user_id"), "left")
      .select(col("user_id"), coalesce(col("seq"), lit("")).as("seq"))
  }

  /** Greedy-scan chain patterns as negated-class regexes: `1[^2]*2`
    * pins the match to (first step-1, first step-2 after it, …) — the
    * exact greedy scan — with NO backtracking ambiguity, so Java regex
    * (Spark) and RE2 (DuckDB) agree on both existence and the
    * non-overlapping match count. `.*?` would leave the divergent-
    * backtracking question open; negated classes close it. */
  private val CHAIN_12 = "1[^2]*2"
  private val CHAIN_123 = "1[^2]*2[^3]*3"
  private val CHAIN_31 = "3[^1]*1"

  /** Event-sequence pattern match (ClickHouse
    * `sequenceMatch('(?1).*(?2)')(ts, cond…)`): does the user's
    * time-ordered event sequence contain the step chain? Unwindowed
    * (the windowed form is q56's funnel); the reversed chain (purchase
    * before a later view — re-engagement) shows order sensitivity. */
  def q61_sequence_match(spark: SparkSession, dir: String): DataFrame =
    stepSequences(spark, dir)
      .select(col("user_id"),
        col("seq").rlike(CHAIN_12).as("m_view_click"),
        col("seq").rlike(CHAIN_123).as("m_view_click_purchase"),
        col("seq").rlike(CHAIN_31).as("m_purchase_then_view"))
      .orderBy(col("user_id"))

  /** Non-overlapping chain occurrences (ClickHouse `sequenceCount`):
    * the greedy restart-after-completion count — each completed chain
    * consumes its events, matching CH's "search for the next chain
    * after the current one ends". */
  def q62_sequence_count(spark: SparkSession, dir: String): DataFrame =
    stepSequences(spark, dir)
      .select(col("user_id"),
        regexp_count(col("seq"), lit(CHAIN_12)).as("c_view_click"),
        regexp_count(col("seq"), lit(CHAIN_123)).as("c_view_click_purchase"))
      .orderBy(col("user_id"))

  /** STRICT-ORDER sequence match (ClickHouse `sequenceMatch` with the
    * `(?1)(?2)` adjacent form / `windowFunnel('strict_order')`): the
    * chain must be CONSECUTIVE among the user's tracked events — any
    * other tracked event between the steps breaks it. On the step
    * string this is plain substring containment / literal
    * occurrence counting, the cheapest possible per-row check. */
  def q73_sequence_strict(spark: SparkSession, dir: String): DataFrame =
    stepSequences(spark, dir)
      .select(col("user_id"),
        col("seq").contains("12").as("m_adjacent_vc"),
        col("seq").contains("123").as("m_adjacent_vcp"),
        (size(split(col("seq"), "12", -1)) - 1).as("c_adjacent_vc"))
      .orderBy(col("user_id"))

  /** Cohort retention (ClickHouse `retention`): cohort = a user's first
    * active day; the per-user condition array [active d0, active d0+1,
    * active d0+7, active d0+14] is evaluated against the user's OWN
    * active-day set (collect_set per user — bounded by days, not
    * events), then summed per cohort day. */
  def q57_retention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    val flags = days.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), collect_set(col("d")).as("ds"))
      .select(col("d0"),
        array_contains(col("ds"), date_add(col("d0"), 1)).as("r1"),
        array_contains(col("ds"), date_add(col("d0"), 7)).as("r7"),
        array_contains(col("ds"), date_add(col("d0"), 14)).as("r14"))
    flags.groupBy(col("d0"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("r1").cast(LongType)).as("n_day1"),
        sum(col("r7").cast(LongType)).as("n_day7"),
        sum(col("r14").cast(LongType)).as("n_day14"))
      .select(col("d0").cast(TimestampNTZType).as("cohort_date"),
        col("n_users"), col("n_day1"), col("n_day7"), col("n_day14"))
      .orderBy(col("cohort_date"))
  }

  /** Statistical aggregates (stddev / variance / covariance / Pearson
    * correlation) in EXACT cross-engine form: the five moment sums are
    * accumulated as DECIMAL (associative — partial aggregation order
    * can't change them), and the statistics are derived from those sums
    * with an identical double-arithmetic expression tree in both engines
    * (IEEE ops are deterministic given operands, sqrt is correctly
    * rounded). Spark's built-in `stddev_samp`/`covar_samp`/`corr` stream
    * co-moments in double and are order-sensitive — right at 100 TB,
    * unverifiable bit-for-bit; BehavioralSpec pins this form to the
    * built-ins within 1e-9 relative. */
  def q58_stats_agg(spark: SparkSession, dir: String): DataFrame = {
    val q = m(col("l_quantity"))
    val p = m(col("l_extendedprice"))
    val n = col("n").cast(DoubleType)
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val varQ = (n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) / (n * (n - lit(1.0)))
    val varP = (n * d(col("syy")) - d(col("sy")) * d(col("sy"))) / (n * (n - lit(1.0)))
    val covQP = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) / (n * (n - lit(1.0)))
    val corrQP = (n * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
      (sqrt(n * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
        sqrt(n * d(col("syy")) - d(col("sy")) * d(col("sy"))))
    // Derived moments round to magnitude-tuned decimals on BOTH sides:
    // the sums are exact, but the double expression tree can disagree
    // with DuckDB's in the final ulp (measured at sf0.001: 1e-16
    // relative — likely FMA contraction on one side). Rounding far
    // coarser than the ulp gap and far finer than the data collapses
    // both to the same double; precision per column tracks magnitude
    // so the relative error stays below the spec's 1e-9 band.
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(q).as("sx"), sum(p).as("sy"),
        sum(q * q).as("sxx"), sum(p * p).as("syy"), sum(q * p).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        (d(col("sx")) / n).as("mean_qty"),
        round(varQ, 8).as("var_qty"), round(sqrt(varQ), 8).as("std_qty"),
        round(sqrt(varP), 6).as("std_price"),
        round(covQP, 8).as("covar_qp"), round(corrQP, 12).as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** Ordered array aggregation (ClickHouse `groupArray` / `groupUniqArray`
    * with deterministic order): per nation, its suppliers as a sorted
    * key list and a sorted name join. Rendered to strings because
    * ordered-string form is the cross-engine-stable output; the arrays
    * themselves exist mid-plan. */
  def q59_group_array(spark: SparkSession, dir: String): DataFrame =
    Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        array_join(transform(sort_array(collect_list(col("s_suppkey"))),
          k => k.cast(StringType)), ",").as("supp_keys"),
        concat_ws("|", sort_array(collect_list(col("s_name")))).as("supp_names"))
      .orderBy(col("n_name"))

  /** Equi-width histogram (ClickHouse `histogram` in its fixed-grid
    * form): order totals bucketed at 20k; one hash-agg shuffle keyed on
    * the bucket id — the 100 TB shape (no sort, no two-pass min/max). */
  def q60_histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(floor(col("o_totalprice") / 20000).as("bucket"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice")).as("price_sum"),
        min(col("o_totalprice")).as("price_min"),
        max(col("o_totalprice")).as("price_max"))
      .orderBy(col("bucket"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_funnel" -> (q56_funnel _),
    "q61_sequence_match" -> (q61_sequence_match _),
    "q62_sequence_count" -> (q62_sequence_count _),
    "q73_sequence_strict" -> (q73_sequence_strict _),
    "q57_retention" -> (q57_retention _),
    "q58_stats_agg" -> (q58_stats_agg _),
    "q59_group_array" -> (q59_group_array _),
    "q60_histogram" -> (q60_histogram _))

  /** q56 oracle: the exists-a-chain formulation (see [[FunnelExpr]] for
    * the greedy ≡ exists argument). `CAST(ts AS TIMESTAMP)` truncates
    * DuckDB's nanosecond timestamps to micros — the same truncation
    * Spark's reader applies — so window-boundary comparisons agree. */
  private val funnelOracleSql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |         WHEN 'purchase' THEN 3 END AS step
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |l1 AS (SELECT DISTINCT user_id FROM e WHERE step = 1),
      |l2 AS (SELECT DISTINCT e1.user_id
      |  FROM e e1 JOIN e e2 ON e2.user_id = e1.user_id
      |   AND e1.step = 1 AND e2.step = 2
      |   AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 3 DAY),
      |l3 AS (SELECT DISTINCT e1.user_id
      |  FROM e e1 JOIN e e2 ON e2.user_id = e1.user_id
      |   AND e1.step = 1 AND e2.step = 2
      |   AND e2.ts >= e1.ts AND e2.ts <= e1.ts + INTERVAL 3 DAY
      |  JOIN e e3 ON e3.user_id = e1.user_id AND e3.step = 3
      |   AND e3.ts >= e2.ts AND e3.ts <= e1.ts + INTERVAL 3 DAY)
      |SELECT u.user_id,
      |  CAST(CASE WHEN u.user_id IN (SELECT user_id FROM l3) THEN 3
      |            WHEN u.user_id IN (SELECT user_id FROM l2) THEN 2
      |            WHEN u.user_id IN (SELECT user_id FROM l1) THEN 1
      |            ELSE 0 END AS INT) AS funnel_level
      |FROM (SELECT DISTINCT user_id FROM events) u
      |ORDER BY user_id""".stripMargin

  private val retentionOracleSql: String =
    """WITH ev AS (SELECT DISTINCT user_id,
      |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |f AS (SELECT user_id, MIN(d) AS d0 FROM ev GROUP BY user_id),
      |r AS (SELECT f.user_id, f.d0,
      |  EXISTS(SELECT 1 FROM ev WHERE ev.user_id = f.user_id AND ev.d = f.d0 + 1) AS r1,
      |  EXISTS(SELECT 1 FROM ev WHERE ev.user_id = f.user_id AND ev.d = f.d0 + 7) AS r7,
      |  EXISTS(SELECT 1 FROM ev WHERE ev.user_id = f.user_id AND ev.d = f.d0 + 14) AS r14
      |  FROM f)
      |SELECT CAST(d0 AS TIMESTAMP) AS cohort_date, COUNT(*) AS n_users,
      |  CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS n_day1,
      |  CAST(SUM(CASE WHEN r7 THEN 1 ELSE 0 END) AS BIGINT) AS n_day7,
      |  CAST(SUM(CASE WHEN r14 THEN 1 ELSE 0 END) AS BIGINT) AS n_day14
      |FROM r GROUP BY d0 ORDER BY cohort_date""".stripMargin

  /** q58 oracle: the same moment sums in DECIMAL, the same derived
    * expression tree in DOUBLE — operand-for-operand. */
  private val statsOracleSql: String = {
    val sx = "CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)"
    val sy = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)"
    val sxx = "CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)"
    val syy = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)"
    val sxy = "CAST(SUM(CAST(l_quantity AS DECIMAL(9,2)) * CAST(l_extendedprice AS DECIMAL(9,2))) AS DOUBLE)"
    val n = "CAST(COUNT(*) AS DOUBLE)"
    val varQ = s"($n * $sxx - $sx * $sx) / ($n * ($n - 1.0))"
    val varP = s"($n * $syy - $sy * $sy) / ($n * ($n - 1.0))"
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  $sx / $n AS mean_qty,
       |  ROUND($varQ, 8) AS var_qty, ROUND(SQRT($varQ), 8) AS std_qty,
       |  ROUND(SQRT($varP), 6) AS std_price,
       |  ROUND(($n * $sxy - $sx * $sy) / ($n * ($n - 1.0)), 8) AS covar_qp,
       |  ROUND(($n * $sxy - $sx * $sy) /
       |    (SQRT($n * $sxx - $sx * $sx) * SQRT($n * $syy - $sy * $sy)), 12) AS corr_qp
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  /** Shared oracle CTE: the same per-user step string, DuckDB-side —
    * ORDER BY (ts, step) inside STRING_AGG is the shared tie-break;
    * CAST(ts AS TIMESTAMP) truncates ns → µs as Spark's reader does. */
  private val seqCte =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
      |         WHEN 'purchase' THEN 3 END AS step
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
      |s AS (SELECT user_id,
      |    STRING_AGG(CAST(step AS VARCHAR), '' ORDER BY ts, step) AS seq
      |  FROM e GROUP BY user_id),
      |u AS (SELECT DISTINCT user_id FROM events)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "q56_funnel" -> funnelOracleSql,
    "q61_sequence_match" -> (seqCte +
      """SELECT u.user_id,
        |  REGEXP_MATCHES(COALESCE(s.seq, ''), '1[^2]*2') AS m_view_click,
        |  REGEXP_MATCHES(COALESCE(s.seq, ''), '1[^2]*2[^3]*3') AS m_view_click_purchase,
        |  REGEXP_MATCHES(COALESCE(s.seq, ''), '3[^1]*1') AS m_purchase_then_view
        |FROM u LEFT JOIN s ON u.user_id = s.user_id
        |ORDER BY u.user_id""".stripMargin),
    // split-count mirrors Spark's size(split(seq, '12')) - 1: both count
    // non-overlapping literal occurrences
    "q73_sequence_strict" -> (seqCte +
      """SELECT u.user_id,
        |  CONTAINS(COALESCE(s.seq, ''), '12') AS m_adjacent_vc,
        |  CONTAINS(COALESCE(s.seq, ''), '123') AS m_adjacent_vcp,
        |  CAST(LEN(STRING_SPLIT(COALESCE(s.seq, ''), '12')) - 1 AS INT) AS c_adjacent_vc
        |FROM u LEFT JOIN s ON u.user_id = s.user_id
        |ORDER BY u.user_id""".stripMargin),
    "q62_sequence_count" -> (seqCte +
      """SELECT u.user_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(COALESCE(s.seq, ''), '1[^2]*2')) AS INT) AS c_view_click,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(COALESCE(s.seq, ''), '1[^2]*2[^3]*3')) AS INT) AS c_view_click_purchase
        |FROM u LEFT JOIN s ON u.user_id = s.user_id
        |ORDER BY u.user_id""".stripMargin),
    "q57_retention" -> retentionOracleSql,
    "q58_stats_agg" -> statsOracleSql,
    "q59_group_array" ->
      """SELECT n_name, COUNT(*) AS n_suppliers,
        |  ARRAY_TO_STRING(LIST(s_suppkey ORDER BY s_suppkey), ',') AS supp_keys,
        |  STRING_AGG(s_name, '|' ORDER BY s_name) AS supp_names
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q60_histogram" ->
      """SELECT CAST(FLOOR(o_totalprice / 20000) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) AS DOUBLE) AS price_sum,
        |  MIN(o_totalprice) AS price_min, MAX(o_totalprice) AS price_max
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin)
}
