package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** Aggregation surface beyond plain GROUP BY: distinct aggregates,
  * ROLLUP / CUBE / GROUPING SETS, and the approximate-distinct scale path.
  *
  * Scale posture: COUNT(DISTINCT) expands to a two-phase aggregate in
  * Spark (distinct keys shuffled once, then counted) — fine at 100 TB when
  * the distinct key space fits a shuffle; when it doesn't, the HLL variant
  * ([[q29_agg_approx_distinct]]) is the intended tool and is why it ships
  * as a first-class query even though its exact values can't be
  * oracle-compared across engines (different HLL implementations).
  *
  * ROLLUP/CUBE subtotal rows carry NULL grouping keys; NULL ordering
  * differs between Spark (asc = nulls first) and DuckDB (asc = nulls
  * last), so the grouping keys are COALESCE'd to an 'ALL' sentinel in both
  * engines — deterministic ordering without engine-specific NULLS FIRST.
  */
object Aggregates {

  /** Exact distinct aggregates per group. */
  def q10_agg_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_part_supp"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** ROLLUP over (returnflag, linestatus): detail + per-flag + grand total. */
  def q11_agg_rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty_sum"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("qty_sum"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** GROUPING markers (SQL standard GROUPING() / GROUPING_ID()): the
    * disambiguation bits that tell a cube consumer whether NULL means
    * "the ALL level" or "data was null" — the machine-readable form of
    * q11's COALESCE('ALL') convention. Bit order is the standard's:
    * grouping_id = 2·grouping(first) + grouping(second). */
  def q83_grouping_id(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        // grouping markers must be computed INSIDE the cube aggregation
        // (the analyzer rejects them in any later projection)
        grouping_id().cast(LongType).as("gid"),
        grouping(col("o_orderstatus")).cast(LongType).as("g_status"),
        grouping(col("o_orderpriority")).cast(LongType).as("g_priority"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("gid"), col("g_status"), col("g_priority"), col("n"))
      .orderBy(col("gid"), col("status"), col("priority"))

  /** CUBE over (status, priority): all 4 grouping combinations. */
  def q12_agg_cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("price_sum"))
      .orderBy(col("status"), col("priority"))

  /** Explicit GROUPING SETS via SQL (the DataFrame API exposes only
    * rollup/cube; the SQL form covers arbitrary set lists). */
  def q13_agg_grouping_sets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("graft_gs_lineitem")
    spark.sql(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |       COALESCE(l_linestatus, 'ALL') AS linestatus,
         |       COUNT(*) AS n,
         |       CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS qty_sum
         |FROM graft_gs_lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY returnflag, linestatus""".stripMargin)
  }

  /** HLL approximate distinct — the 100 TB substitute for exact
    * distinct — made ORACLE-CHECKABLE (VERDICT r15 #7, the d10/v09
    * planted technique on the estimator): the probed domains are
    * BOUNDED (`l_partkey % 50` ≤ 50 values, `l_linestatus` 3 values),
    * far below the register count at rsd 0.01 (2^14), so HLL++ is in
    * its linear-counting range where the rounded estimate EQUALS the
    * exact count unless two planted values collide in one register —
    * and the inputs are fixed deterministic data under a constant
    * hash seed, so collision-freedom is a property of the corpus,
    * verified at sf 0.001/0.01/0.1. DuckDB recomputes the exact
    * distinct counts; the hash compare pins the estimator end to end.
    * The UNBOUNDED regime (genuinely approximate, no cross-engine
    * oracle possible — sketches differ by implementation) stays
    * spec-covered: FrequencySpec asserts raw-domain estimates land
    * within 5% of exact.
    *
    * DEPENDENCY-VERSION ASSUMPTION (ADVICE r16): this oracle's
    * bit-exactness rides Spark 4.1's HyperLogLogPlusPlus
    * linear-counting rounding (and q71's rides Datasketches' exact
    * SET-mode at lgK 12, see Frequency.q71). Both libraries ship
    * pinned in `/opt/spark/jars`; if a future Spark/Datasketches
    * upgrade flips this gate, triage as an estimator REGIME SHIFT
    * (re-verify the 5%-band specs still pass, then re-derive the
    * exactness argument or demote the query to rows-only), not as a
    * correctness bug. */
  def q29_agg_approx_distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(pmod(col("l_partkey"), lit(50)), rsd = 0.01)
          .as("approx_part_mod50"),
        approx_count_distinct(col("l_linestatus"), rsd = 0.01)
          .as("approx_status"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** Exact interpolated percentiles (sort-based). Cross-engine parity
    * holds here because l_quantity is integer-valued and quartile
    * interpolation weights are dyadic (k/4) — the interpolated values
    * are exactly representable, so formula-ordering differences between
    * engines cannot produce different doubles. Arbitrary p on arbitrary
    * doubles would NOT be parity-safe; use approx_percentile at scale. */
  def q37_percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"))
      .orderBy(col("l_returnflag"))

  /** Exact WEIGHTED quantiles (ClickHouse `quantileExactWeighted`):
    * the smallest value whose cumulative weight reaches p·W — here
    * revenue-weighted p50/p90 of quantity ("the quantity below which
    * half the money moves"). Everything stays INTEGER/decimal
    * arithmetic: weights are exact cents, the threshold test is
    * 2·cum ≥ W (resp. 10·cum ≥ 9·W) — no floating-point boundary for
    * engines to disagree on. Shape: pre-aggregate weight per distinct
    * value (one hash agg — the shuffle carries |distinct values| rows,
    * not the corpus), one bounded cumulative window per group, then a
    * plain min-if. l_quantity has ~50 distinct values, so the window
    * input is tiny however big the fact table — the 100 TB form of
    * exact weighted quantiles over low-cardinality measures. */
  def q72_weighted_quantile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perValue = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_quantity"))
      .agg((sum(m(col("l_extendedprice"))) * 100).cast(LongType).as("w"))
    val byVal = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val whole = Window.partitionBy(col("l_returnflag"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perValue
      .withColumn("cw", sum(col("w")).over(byVal))
      .withColumn("tw", sum(col("w")).over(whole))
      .groupBy(col("l_returnflag"))
      .agg(
        min(when(col("cw") * 2 >= col("tw"), col("l_quantity"))).as("w_p50"),
        min(when(col("cw") * 10 >= col("tw") * 9, col("l_quantity"))).as("w_p90"))
      .orderBy(col("l_returnflag"))
  }

  /** argMax / argMin aggregates (ClickHouse argMax(a, b)): the value of
    * one column at another column's extreme, per group — here each
    * customer's most recent order and its price. Implemented as
    * max/min over a (key, tiebreak, payload) struct: lexicographic
    * struct comparison makes the tie-break explicit and deterministic,
    * which Spark's `max_by`/DuckDB's `arg_max` do NOT guarantee on
    * ties — and it stays a plain partial-aggregatable max (one
    * reduction per group per partition, no window, no sort). */
  def q49_argmax(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        max(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k")))
          .as("_last"),
        min(struct(col("o_orderdate").as("d"), col("o_orderkey").as("k")))
          .as("_first"),
        count(lit(1)).as("n_orders"))
      .select(col("o_custkey"),
        col("_last.k").as("last_orderkey"),
        col("_last.d").cast(TimestampNTZType).as("last_orderdate"),
        col("_first.k").as("first_orderkey"),
        col("n_orders"))
      .orderBy(col("o_custkey"))

  /** ClickHouse `sumMap` — map-merge aggregation: per group, merge
    * per-row (key → value) entries summing values and counting
    * occurrences per key. The distributed shape is ONE partial-agg
    * shuffle keyed on (group, key) — map-side combine collapses
    * repeated keys before the exchange — then an in-group reassembly
    * into the canonical sorted-entries form. Sums ride the exact
    * decimal path (integer cents) so the oracle hash-matches; the
    * entry lists are CSV-flattened like every array output (nested
    * comparisons are engine-fragile, the CSV is canonical). */
  def q63_sum_map(spark: SparkSession, dir: String): DataFrame = {
    val kv = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg((sum(m(col("value"))) * 100).cast(LongType).as("cents"),
        count(lit(1)).as("n"))
    kv.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_keys"),
        // one sorted collect reused by all three projections: entries
        // sort by event_type, the struct's first field
        sort_array(collect_list(struct(col("event_type"), col("cents"), col("n"))))
          .as("_es"))
      .select(col("user_id"), col("n_keys"),
        concat_ws(",", transform(col("_es"), e => e.getField("event_type")))
          .as("keys_csv"),
        concat_ws(",", transform(col("_es"),
          e => e.getField("cents").cast(StringType))).as("cents_csv"),
        concat_ws(",", transform(col("_es"),
          e => e.getField("n").cast(StringType))).as("counts_csv"))
      .orderBy(col("user_id"))
  }

  /** ClickHouse `-If` combinators (countIf / sumIf / avgIf / maxIf /
    * uniqIf) — conditional aggregates in one pass over the fact table:
    * each is a plain aggregate over a guarded expression (nulls skipped
    * by SQL aggregation semantics), so everything stays inside a single
    * partial+final hash aggregation — no per-condition scans, no joins.
    * avgIf divides the exact decimal sum by the conditional count in
    * DOUBLE (IEEE division of identical inputs — oracle-stable). */
  def q64_conditional_aggs(spark: SparkSession, dir: String): DataFrame = {
    val big = col("l_quantity") > 25
    val nBig = count(when(big, lit(1)))
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        nBig.as("n_big"),
        sum(when(col("l_discount") > 0.05, m(col("l_extendedprice"))))
          .cast(DoubleType).as("disc_rev"),
        (sum(when(big, m(col("l_quantity")))).cast(DoubleType) /
          when(nBig === 0, lit(null)).otherwise(nBig)).as("avg_big_qty"),
        max(when(big, col("l_shipdate"))).as("last_big_ship"),
        countDistinct(when(big, col("l_partkey"))).as("n_big_parts"))
      .orderBy(col("l_returnflag"))
  }

  /** Bitwise aggregates (ClickHouse `groupBitAnd` / `groupBitOr` /
    * `groupBitXor`): commutative + associative reductions, so partial
    * aggregation holds and the whole query is one hash-agg shuffle —
    * the mask-accumulation idiom (permission sets, feature flags,
    * parity checks) at any scale. bit_count on the OR shows the scalar
    * side. */
  def q70_bit_aggs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        bit_and(col("o_orderkey")).as("keys_and"),
        bit_or(col("o_orderkey")).as("keys_or"),
        bit_xor(col("o_orderkey")).as("keys_xor"),
        bit_count(bit_or(col("o_orderkey"))).cast(LongType).as("or_bits"))
      .orderBy(col("o_orderstatus"))

  /** PERSISTED AGGREGATE STATE — the ClickHouse AggregatingMergeTree /
    * `AggregateFunction(uniq, ...)` column pattern: partial aggregate
    * states are materialized to storage at a fine grain (per day) and
    * later queries MERGE states instead of rescanning raw data. Here
    * the state is a Datasketches HLL sketch (binary column in
    * parquet): build once per day (one pass over events), answer any
    * coarser rollup (weekly distinct users below) from kilobytes of
    * state — at 100 TB that turns repeated corpus scans into reads of
    * a few KB per day per key. Sketch union is a register-wise max —
    * associative, commutative, order-independent — so the merged
    * estimate is deterministic and AggregatesSketchSpec asserts it
    * EQUALS the estimate of a direct one-pass sketch over the raw
    * rows (raw user_ids — the genuinely-approximate regime), plus a
    * ±5% accuracy band vs exact distinct.
    *
    * ORACLE-CHECKABLE end to end (VERDICT r15 #7): the sketched key
    * is the BOUNDED `user_id % 100` — a Datasketches HLL at lgK 12
    * holds up to ~3/4·2^12 coupons in exact SET mode before promoting
    * to estimating registers, so ≤ 100 distinct values stay EXACT
    * through any number of unions and the estimate IS the distinct
    * count, which DuckDB recomputes from first principles. Pins
    * sketch-agg → persist → re-read → union-agg → estimate.
    * Dependency-version assumption recorded on
    * [[q29_agg_approx_distinct]] (ADVICE r16): a Datasketches upgrade
    * that changes SET-mode promotion would be a regime shift, not a
    * correctness bug. */
  def q71_sketch_state(spark: SparkSession, dir: String): DataFrame = {
    val stateDir = java.nio.file.Files.createTempDirectory("graft_aggstate").toString
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(pmod(col("user_id"), lit(100)), 12).as("users_state"),
        count(lit(1)).as("n_events"))
      .write.mode("overwrite").parquet(stateDir)
    spark.read.parquet(stateDir)
      .groupBy(weekofyear(col("day")).as("week"))
      .agg(
        hll_sketch_estimate(hll_union_agg(col("users_state"), true))
          .as("approx_users"),
        sum(col("n_events")).as("n_events"))
      .orderBy(col("week"))
  }

  /** MERGEABLE QUANTILE STATE — q71's persisted-state pattern for
    * quantiles, with a sketch that is DETERMINISTIC and therefore
    * oracle-checkable end to end (t-digest/GK centroids are
    * merge-order-dependent; a bottom-k priority sample is not): each
    * day persists its 256 events with the smallest Knuth-hash
    * priorities (a fixed-size uniform row sample — built with the
    * native bounded-heap top-k, never a per-day sort), and any coarser
    * rollup re-trims the union of its days' samples to the global
    * bottom-256 — EXACTLY the sample a single pass over the raw week
    * would keep, because bottom-k is a semilattice merge (associative,
    * commutative, idempotent). The weekly median then comes off 256
    * integer-cents values (dyadic p ⇒ interpolation parity-safe,
    * q37's argument). At 100 TB: per-day state is KBs, weekly/monthly/
    * yearly quantiles never rescan raw data, and retries can't change
    * the answer. */
  def q78_quantile_state(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.TopKPerGroup.topKPerGroup
    val stateDir = java.nio.file.Files.createTempDirectory("graft_qstate").toString
    val tagged = Tables.events(spark, dir)
      .select(to_date(col("ts")).as("day"), col("event_id"),
        (m(col("value")) * 100).cast(LongType).as("cents"),
        pmod(col("event_id") * lit(2654435761L), lit(4294967296L)).as("prio"))
    topKPerGroup(tagged, Seq(col("day")),
        Seq(col("prio").asc, col("event_id").asc), 256)
      .write.mode("overwrite").parquet(stateDir)
    val weekly = spark.read.parquet(stateDir)
      .withColumn("week", weekofyear(col("day")))
    topKPerGroup(weekly, Seq(col("week")),
        Seq(col("prio").asc, col("event_id").asc), 256)
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_sample"),
        percentile(col("cents"), lit(0.5)).as("median_cents"),
        percentile(col("cents"), lit(0.25)).as("p25_cents"))
      .orderBy(col("week"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q71_sketch_state" -> (q71_sketch_state _),
    "q78_quantile_state" -> (q78_quantile_state _),
    "q72_weighted_quantile" -> (q72_weighted_quantile _),
    "q83_grouping_id" -> (q83_grouping_id _),
    "q70_bit_aggs" -> (q70_bit_aggs _),
    "q63_sum_map" -> (q63_sum_map _),
    "q64_conditional_aggs" -> (q64_conditional_aggs _),
    "q49_argmax" -> (q49_argmax _),
    "q37_percentiles" -> (q37_percentiles _),
    "q10_agg_distinct" -> (q10_agg_distinct _),
    "q11_agg_rollup" -> (q11_agg_rollup _),
    "q12_agg_cube" -> (q12_agg_cube _),
    "q13_agg_grouping_sets" -> (q13_agg_grouping_sets _),
    "q29_agg_approx_distinct" -> (q29_agg_approx_distinct _))

  val oracle: Map[String, String] = Map(
    "q29_agg_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey % 50) AS approx_part_mod50,
        |  COUNT(DISTINCT l_linestatus) AS approx_status,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q71_sketch_state" ->
      """SELECT WEEKOFYEAR(CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS week,
        |  COUNT(DISTINCT user_id % 100) AS approx_users,
        |  COUNT(*) AS n_events
        |FROM events GROUP BY 1 ORDER BY week""".stripMargin,
    // the oracle rebuilds the same two-level bottom-256 sample with
    // ROW_NUMBER (same (prio, event_id) total order) — merge-then-trim
    // must equal single-pass trim, so one flat weekly trim suffices
    "q78_quantile_state" ->
      """WITH tagged AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_id,
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents,
        |    (event_id * 2654435761) % 4294967296 AS prio
        |  FROM events),
        |daily AS (SELECT * FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY day
        |    ORDER BY prio, event_id) AS rn FROM tagged) WHERE rn <= 256),
        |weekly AS (SELECT * FROM (
        |  SELECT WEEKOFYEAR(day) AS week, prio, event_id, cents,
        |    ROW_NUMBER() OVER (PARTITION BY WEEKOFYEAR(day)
        |      ORDER BY prio, event_id) AS rn FROM daily) WHERE rn <= 256)
        |SELECT week, COUNT(*) AS n_sample,
        |  QUANTILE_CONT(cents, 0.5) AS median_cents,
        |  QUANTILE_CONT(cents, 0.25) AS p25_cents
        |FROM weekly GROUP BY week ORDER BY week""".stripMargin,
    "q72_weighted_quantile" ->
      """WITH pv AS (
        |  SELECT l_returnflag, l_quantity,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) * 100 AS BIGINT) AS w
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, l_quantity,
        |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cw,
        |    SUM(w) OVER (PARTITION BY l_returnflag) AS tw
        |  FROM pv)
        |SELECT l_returnflag,
        |  MIN(CASE WHEN cw * 2 >= tw THEN l_quantity END) AS w_p50,
        |  MIN(CASE WHEN cw * 10 >= tw * 9 THEN l_quantity END) AS w_p90
        |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q83_grouping_id" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
        |  COUNT(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "q70_bit_aggs" ->
      """SELECT o_orderstatus,
        |  BIT_AND(o_orderkey) AS keys_and,
        |  BIT_OR(o_orderkey) AS keys_or,
        |  BIT_XOR(o_orderkey) AS keys_xor,
        |  CAST(BIT_COUNT(BIT_OR(o_orderkey)) AS BIGINT) AS or_bits
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q63_sum_map" ->
      """WITH kv AS (
        |  SELECT user_id, event_type,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2))) * 100 AS BIGINT) AS cents,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  COUNT(*) AS n_keys,
        |  ARRAY_TO_STRING(LIST(event_type ORDER BY event_type), ',') AS keys_csv,
        |  ARRAY_TO_STRING(LIST(CAST(cents AS VARCHAR) ORDER BY event_type), ',') AS cents_csv,
        |  ARRAY_TO_STRING(LIST(CAST(n AS VARCHAR) ORDER BY event_type), ',') AS counts_csv
        |FROM kv GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q64_conditional_aggs" ->
      """SELECT l_returnflag,
        |  COUNT(*) FILTER (WHERE l_quantity > 25) AS n_big,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2))) FILTER (WHERE l_discount > 0.05)
        |    AS DOUBLE) AS disc_rev,
        |  CASE WHEN COUNT(*) FILTER (WHERE l_quantity > 25) = 0 THEN NULL
        |       ELSE CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) FILTER (WHERE l_quantity > 25)
        |              AS DOUBLE) / COUNT(*) FILTER (WHERE l_quantity > 25) END AS avg_big_qty,
        |  MAX(l_shipdate) FILTER (WHERE l_quantity > 25) AS last_big_ship,
        |  COUNT(DISTINCT l_partkey) FILTER (WHERE l_quantity > 25) AS n_big_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q49_argmax" ->
      """SELECT o_custkey,
        |  struct_extract(MAX(struct_pack(d := o_orderdate, k := o_orderkey)), 'k')
        |    AS last_orderkey,
        |  CAST(struct_extract(MAX(struct_pack(d := o_orderdate, k := o_orderkey)), 'd')
        |    AS TIMESTAMP) AS last_orderdate,
        |  struct_extract(MIN(struct_pack(d := o_orderdate, k := o_orderkey)), 'k')
        |    AS first_orderkey,
        |  COUNT(*) AS n_orders
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q37_percentiles" ->
      """SELECT l_returnflag,
        |  QUANTILE_CONT(l_quantity, 0.25) AS p25,
        |  QUANTILE_CONT(l_quantity, 0.5) AS p50,
        |  QUANTILE_CONT(l_quantity, 0.75) AS p75,
        |  MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q10_agg_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(DISTINCT (l_partkey, l_suppkey)) AS n_part_supp,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q11_agg_rollup" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty_sum
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,
    "q12_agg_cube" ->
      s"""SELECT COALESCE(o_orderstatus, 'ALL') AS status,
         |  COALESCE(o_orderpriority, 'ALL') AS priority,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS price_sum
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         |ORDER BY status, priority""".stripMargin,
    "q13_agg_grouping_sets" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  COUNT(*) AS n, ${sqlDsum("l_quantity")} AS qty_sum
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY returnflag, linestatus""".stripMargin)
}
