package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** 2^50 as an exact decimal literal — the chunk radix for
    * [[splitDouble]]. */
  private val C50 = lit(new java.math.BigDecimal("1125899906842624"))

  /** Exact scale-0 DECIMAL integer → the double BOTH engines compute
    * bit-identically. A native wide-int→double cast is engine-specific
    * (DuckDB's is not correctly rounded above 2^53 — measured), so
    * instead the integer is split into three chunks < 2^50, each cast
    * exactly (both engines' casts are exact below 2^53 — verified
    * empirically for DuckDB HUGEINT), and the value rebuilt with a fixed
    * IEEE expression tree. Every product in the rebuild is exactly
    * representable (chunk < 2^50 times an exact power of two), so even
    * FMA contraction cannot change a bit: fma(a,b,c) ≡ round(a*b)+c
    * when a*b is exact. The two additions are the only roundings, and
    * IEEE addition is deterministic given operands. The oracle SQL's
    * `sqlSplit` is this expression operand-for-operand over HUGEINT. */
  private def splitDouble(num: Column): Column = {
    val sgn = when(num < 0, lit(-1.0d)).otherwise(lit(1.0d))
    val a = abs(num)
    val l0 = a % C50
    val r1 = ((a - l0) / C50).cast(DecimalType(38, 0)) // exact: divides evenly
    val h1 = r1 % C50
    val h2 = ((r1 - h1) / C50).cast(DecimalType(38, 0))
    sgn * ((h2.cast(DoubleType) * lit(1.2676506002282294e30) +
      h1.cast(DoubleType) * lit(1.125899906842624e15)) + l0.cast(DoubleType))
  }

  /** The same split, DuckDB-side, over HUGEINT (`//`/`%` are exact
    * truncating int128 ops; operands here are non-negative). */
  private def sqlSplit(x: String): String =
    s"(CASE WHEN $x < 0 THEN -1.0 ELSE 1.0 END * " +
      s"((CAST(ABS($x) // 1125899906842624 // 1125899906842624 AS DOUBLE) * 1.2676506002282294e+30 + " +
      s"CAST(ABS($x) // 1125899906842624 % 1125899906842624 AS DOUBLE) * 1125899906842624.0) + " +
      s"CAST(ABS($x) % 1125899906842624 AS DOUBLE)))"

  /** Statistical aggregates (stddev / variance / covariance / Pearson
    * correlation) in EXACT cross-engine form, no rounding calibration:
    * values become integer cents, the five moment sums and the textbook
    * numerators `n·Σx² − (Σx)²` are computed in exact integer arithmetic
    * (DECIMAL(38,0) here, HUGEINT in the oracle — both exact to 1e38,
    * bounded by ~4e35 even at the 100 TB row count), converted to double
    * via [[splitDouble]]'s engine-agnostic exact chunking, and only then
    * finished with a short fixed tree of individually-rounded IEEE ops
    * (divide, sqrt, multiply — no a·b+c shape anywhere, so FMA
    * contraction cannot bite). Spark's built-in `stddev_samp`/
    * `covar_samp`/`corr` stream co-moments in double and are
    * order-sensitive — at 100 TB, unverifiable bit-for-bit;
    * BehavioralSpec pins this form to the built-ins within 1e-9. */
  def q58_stats_agg(spark: SparkSession, dir: String): DataFrame = {
    // integer cents: DECIMAL(12,0) squares to (25,0), sums to (35,0) —
    // exact headroom past 6e11 rows per group
    val qc = (m(col("l_quantity")) * lit(100)).cast(DecimalType(12, 0))
    val pc = (m(col("l_extendedprice")) * lit(100)).cast(DecimalType(12, 0))
    val nDec = col("n").cast(DecimalType(20, 0))
    def num(spp: Column, s1: Column, s2: Column) =
      (nDec * spp - s1 * s2).cast(DecimalType(38, 0))
    val nd = col("nd")
    val denom = nd * (nd - lit(1.0d))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(qc).as("sx"), sum(pc).as("sy"),
        sum(qc * qc).as("sxx"), sum(pc * pc).as("syy"), sum(qc * pc).as("sxy"))
      .select(col("l_returnflag"), col("n"),
        col("n").cast(DoubleType).as("nd"),
        splitDouble(col("sx")).as("sxd"),
        splitDouble(num(col("sxx"), col("sx"), col("sx"))).as("nxxd"),
        splitDouble(num(col("syy"), col("sy"), col("sy"))).as("nyyd"),
        splitDouble(num(col("sxy"), col("sx"), col("sy"))).as("nxyd"))
      .select(col("l_returnflag"), col("n"),
        // cents scale-back divisors are exact powers-of-ten doubles;
        // each op below is one shared IEEE rounding
        (col("sxd") / nd / lit(100.0d)).as("mean_qty"),
        (col("nxxd") / denom / lit(10000.0d)).as("var_qty"),
        (sqrt(col("nxxd") / denom) / lit(100.0d)).as("std_qty"),
        (sqrt(col("nyyd") / denom) / lit(100.0d)).as("std_price"),
        (col("nxyd") / denom / lit(10000.0d)).as("covar_qp"),
        (col("nxyd") / (sqrt(col("nxxd")) * sqrt(col("nyyd")))).as("corr_qp"))
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

  /** q58 oracle: the same integer-cents moment sums and textbook
    * numerators in exact HUGEINT arithmetic, the same [[sqlSplit]] exact
    * int→double conversion, the same final IEEE tree —
    * operand-for-operand with [[q58_stats_agg]], no rounding anywhere. */
  private val statsOracleSql: String =
    s"""WITH c AS (
       |  SELECT l_returnflag,
       |    CAST(CAST(l_quantity AS DECIMAL(9,2)) * 100 AS HUGEINT) AS qc,
       |    CAST(CAST(l_extendedprice AS DECIMAL(9,2)) * 100 AS HUGEINT) AS pc
       |  FROM lineitem),
       |a AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    CAST(SUM(qc) AS HUGEINT) AS sx, CAST(SUM(pc) AS HUGEINT) AS sy,
       |    CAST(SUM(qc * qc) AS HUGEINT) AS sxx,
       |    CAST(SUM(pc * pc) AS HUGEINT) AS syy,
       |    CAST(SUM(qc * pc) AS HUGEINT) AS sxy
       |  FROM c GROUP BY l_returnflag),
       |d AS (
       |  SELECT l_returnflag, n, sx,
       |    CAST(n AS HUGEINT) * sxx - sx * sx AS nxx,
       |    CAST(n AS HUGEINT) * syy - sy * sy AS nyy,
       |    CAST(n AS HUGEINT) * sxy - sx * sy AS nxy
       |  FROM a),
       |e AS (
       |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
       |    ${sqlSplit("sx")} AS sxd, ${sqlSplit("nxx")} AS nxxd,
       |    ${sqlSplit("nyy")} AS nyyd, ${sqlSplit("nxy")} AS nxyd
       |  FROM d)
       |SELECT l_returnflag, n,
       |  sxd / nd / 100.0 AS mean_qty,
       |  nxxd / (nd * (nd - 1.0)) / 10000.0 AS var_qty,
       |  SQRT(nxxd / (nd * (nd - 1.0))) / 100.0 AS std_qty,
       |  SQRT(nyyd / (nd * (nd - 1.0))) / 100.0 AS std_price,
       |  nxyd / (nd * (nd - 1.0)) / 10000.0 AS covar_qp,
       |  nxyd / (SQRT(nxxd) * SQRT(nyyd)) AS corr_qp
       |FROM e ORDER BY l_returnflag""".stripMargin

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
