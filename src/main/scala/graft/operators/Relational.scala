package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** The relational operator sweep (SURVEY.md §2.2): every query category the
  * reference delegates to ClickHouse, expressed Spark-first and verified
  * against the driver's DuckDB oracle.
  *
  * Conventions:
  *   - Every aggregate / computed column is aliased identically in the
  *     DataFrame code and the oracle SQL (driver compares by column name).
  *   - Every query ends in a total ORDER BY so row order is deterministic
  *     on both engines.
  *   - Double sums go through [[Exact]] decimal casts for bit parity.
  *
  * Scale notes are per-query in the Scaladoc; the common posture: filters
  * and projections stay in the scan (PushedFilters/ReadSchema), small dims
  * are broadcast, and aggregates rely on partial (map-side) aggregation —
  * no collect(), no driver-side loops anywhere.
  */
object Relational {

  /** Flagship: TPC-H Q1-style pricing summary. Scan → partial agg →
    * 2-key final agg; at 100 TB this is one shuffle of ~6 grouping keys,
    * i.e. bytes, not data — the scan dominates and prunes to 7 columns
    * (reference capability: COUNT aggregation, `hashes_test.go:227-233`,
    * generalized). */
  def q01_pricing_summary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val discPrice = m(col("l_extendedprice")) * f(lit(1.0) - col("l_discount"))
    li.filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampNTZType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(m(col("l_quantity"))).cast(DoubleType).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(discPrice).cast(DoubleType).as("sum_disc_price"),
        sum(discPrice * f(lit(1.0) + col("l_tax"))).cast(DoubleType).as("sum_charge"),
        (sum(m(col("l_quantity"))).cast(DoubleType) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Row-count conservation over every table via UNION ALL — the Spark
    * analogue of the reference's verification scan
    * (`SELECT COUNT(*)`, `hashes_test.go:193,229`). */
  def q02_table_counts(spark: SparkSession, dir: String): DataFrame = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.map { t =>
      val df = if (t == "events") Tables.events(spark, dir) else Tables.read(spark, dir, t)
      df.agg(count(lit(1)).as("n")).select(lit(t).as("tbl"), col("n"))
    }.reduce(_.unionAll(_)).orderBy(col("tbl"))
  }

  /** Conjunctive equality filter — the reference's existence probe
    * (`hashes_test.go:191-203`) generalized. Predicates push to parquet. */
  def q03_filter_conjunctive(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") === "R" && col("l_linenumber") === 3 &&
        col("l_quantity") === 25.0)
      .agg(count(lit(1)).as("n"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))

  /** DELETE-by-predicate (`hashes_test.go:235-239`) re-expressed as the
    * scalable form: left_anti join against the doomed key set. At 100 TB
    * the delete-set is tiny relative to the fact table → Spark broadcasts
    * it and the anti join is map-side, no shuffle of the big side. */
  def q04_delete_antijoin(spark: SparkSession, dir: String): DataFrame = {
    val doomed = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    Tables.orders(spark, dir)
      .join(broadcast(doomed), col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
  }

  /** CDC changeset application — the MERGE / mutation surface
    * (ClickHouse `ALTER TABLE ... UPDATE/DELETE`, warehouse
    * MERGE INTO) as a snapshot transform: apply a (key, op, payload)
    * changeset of Updates, Deletes and Inserts to the customer
    * snapshot, producing the next snapshot. The changeset here is
    * derived deterministically from the snapshot itself (every 7th key
    * updated, every 21st deleted, inserts at key+10^6) so the oracle
    * can rebuild it. Shape for 100 TB: the changeset is tiny relative
    * to the snapshot → broadcast left join + filter (U/D applied
    * map-side, no snapshot shuffle), inserts unioned — the standard
    * copy-on-write CDC apply; only the result write repartitions. */
  def q79_apply_changeset(spark: SparkSession, dir: String): DataFrame = {
    val snap = Tables.customer(spark, dir)
    val changes = snap.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 21 === 0, lit("D")).otherwise(lit("U")).as("op"),
        (col("c_acctbal") + lit(1000.0)).as("new_bal"))
    val inserts = snap.filter(col("c_custkey") % 500 === 3)
      .select((col("c_custkey") + 1000000L).as("c_custkey"),
        concat(lit("Clone-"), col("c_name")).as("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
    snap.join(broadcast(changes), col("c_custkey") === col("k"), "left")
      .filter(coalesce(col("op"), lit("")) =!= "D")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        when(col("op") === "U", col("new_bal")).otherwise(col("c_acctbal"))
          .as("c_acctbal"),
        col("c_mktsegment"))
      .union(inserts)
      .orderBy(col("c_custkey"))
  }

  /** Broadcast hash join: fact × small dim. part is ~200k rows at sf=100
    * (≪ 10 MB threshold scaled up — still broadcastable with the default
    * 10–100 MB budget); the big lineitem side never shuffles. */
  def q05_join_broadcast(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val pt = Tables.part(spark, dir)
    li.join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(m(col("l_extendedprice")) * f(lit(1.0) - col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  /** Star join across 5 tables. orders⋈lineitem is the only real shuffle
    * (both sides large, co-partitioned on orderkey); customer/nation/region
    * broadcast. AQE re-plans if estimates are off. */
  def q06_join_multi_star(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(m(col("l_extendedprice")) * f(lit(1.0) - col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left-semi join (EXISTS): orders having a high-quantity line. The
    * filter lands on the build side before the join → small build set →
    * broadcast semi join, zero shuffle of orders. */
  def q07_join_semi(spark: SparkSession, dir: String): DataFrame = {
    val bigLines = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 45).select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
  }

  /** Left-anti join (NOT EXISTS): orders with no discounted line. */
  def q08_join_anti(spark: SparkSession, dir: String): DataFrame = {
    val discounted = Tables.lineitem(spark, dir)
      .filter(col("l_discount") > 0.08).select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(discounted, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
  }

  /** Theta (non-equi) join: suppliers × cheap filtered parts on an
    * inequality. Spark plans BroadcastNestedLoopJoin with the small side
    * broadcast; the p_size filter keeps the cross-product bounded. At
    * 100 TB a theta join must always have a selective pre-filter or a
    * banding rewrite (see Similarity's LSH path for the banding pattern). */
  def q09_join_theta(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.part(spark, dir).filter(col("p_size") === 1)
    val sup = Tables.supplier(spark, dir)
    sup.join(broadcast(pt), col("s_acctbal") < col("p_retailprice"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_parts"), dsum(col("p_retailprice")).as("price_sum"))
      .orderBy(col("s_name"))
  }

  /** Range join via BUCKETED EQUI-JOIN rewrite — the scale path for
    * interval joins. The naive form (q09's shape) is a broadcast
    * nested-loop over `epoch BETWEEN lo AND hi`: O(n·m) comparisons and
    * only possible while one side broadcasts. Here both sides map to
    * time buckets of width = the max interval width (1200 s), so an
    * interval overlaps ≤ 2 buckets: the interval side explodes into its
    * ≤ 2 bucket rows, the event side computes one bucket per row, and
    * the match becomes a hash equi-join on the bucket key with the
    * BETWEEN as residual filter — O(n + m) shuffle, no nested loop, no
    * broadcast requirement. This is the standard interval-bucketing
    * rewrite (cf. Databricks' range-join hint / interval joins in
    * Flink); at sf0.01 AQE may still choose to broadcast the small
    * exploded side — also correct, the rewrite is what makes the
    * shuffle plan AVAILABLE at 100 TB.
    *
    * Query: "incident windows" — each high-value event (value > 300)
    * opens a ±600 s window; count and sum the events inside each
    * window. */
  def q48_range_bucket_join(spark: SparkSession, dir: String): DataFrame = {
    val bucketW = 1200L
    val ev = Tables.events(spark, dir)
      .withColumn("epoch", unix_timestamp(col("ts")))
      .select(col("event_id"), col("epoch"), col("value"))
    val windows = ev.filter(col("value") > 300)
      .select(col("event_id").as("w_id"), col("epoch").as("w_epoch"),
        (col("epoch") - 600).as("lo"), (col("epoch") + 600).as("hi"))
      .withColumn("bucket",
        explode(expr(s"sequence(lo DIV $bucketW, hi DIV $bucketW)")))
    val evB = ev.withColumn("bucket", expr(s"epoch DIV $bucketW"))
    evB.join(windows, Seq("bucket"))
      .filter(col("epoch").between(col("lo"), col("hi")))
      .groupBy(col("w_id"), col("w_epoch"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("value_sum"))
      .orderBy(col("w_id"))
  }

  /** TPC-H Q3-shaped shipping priority: top-10 unshipped BUILDING orders
    * by revenue. Two selective filters push to the scans; the join is
    * orderkey-coensure; top-k via TakeOrdered with a total order. */
  def q38_shipping_priority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1998-06-01").cast(TimestampNTZType)
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > cutoff)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(m(col("l_extendedprice")) * f(lit(1.0) - col("l_discount")))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q7-shaped nation volume: supplier-nation × customer-nation
    * revenue per ship year. Demonstrates a 6-table plan where only
    * lineitem⋈orders shuffles; all dims broadcast. */
  def q39_nation_volume(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n1 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(sum(m(col("l_extendedprice")) * f(lit(1.0) - col("l_discount")))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("ship_year"))
  }

  private val discPriceSql =
    s"${sqlM("l_extendedprice")} * ${sqlF("1.0 - l_discount")}"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01_pricing_summary _),
    "q02_table_counts" -> (q02_table_counts _),
    "q03_filter_conjunctive" -> (q03_filter_conjunctive _),
    "q04_delete_antijoin" -> (q04_delete_antijoin _),
    "q79_apply_changeset" -> (q79_apply_changeset _),
    "q05_join_broadcast" -> (q05_join_broadcast _),
    "q06_join_multi_star" -> (q06_join_multi_star _),
    "q07_join_semi" -> (q07_join_semi _),
    "q08_join_anti" -> (q08_join_anti _),
    "q09_join_theta" -> (q09_join_theta _),
    "q48_range_bucket_join" -> (q48_range_bucket_join _),
    "q38_shipping_priority" -> (q38_shipping_priority _),
    "q39_nation_volume" -> (q39_nation_volume _))

  val oracle: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(SUM(${sqlM("l_quantity")}) AS DOUBLE) AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($discPriceSql * ${sqlF("1.0 + l_tax")}) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(${sqlM("l_quantity")}) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  ${sqlDsum("l_extendedprice")} / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_table_counts" ->
      """SELECT tbl, n FROM (
        |  SELECT 'region' AS tbl, COUNT(*) AS n FROM region UNION ALL
        |  SELECT 'nation', COUNT(*) FROM nation UNION ALL
        |  SELECT 'customer', COUNT(*) FROM customer UNION ALL
        |  SELECT 'supplier', COUNT(*) FROM supplier UNION ALL
        |  SELECT 'part', COUNT(*) FROM part UNION ALL
        |  SELECT 'orders', COUNT(*) FROM orders UNION ALL
        |  SELECT 'lineitem', COUNT(*) FROM lineitem UNION ALL
        |  SELECT 'events', COUNT(*) FROM events UNION ALL
        |  SELECT 'documents', COUNT(*) FROM documents UNION ALL
        |  SELECT 'embeddings', COUNT(*) FROM embeddings)
        |ORDER BY tbl""".stripMargin,
    "q03_filter_conjunctive" ->
      """SELECT COUNT(*) AS n, MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
        |FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linenumber = 3 AND l_quantity = 25.0""".stripMargin,
    "q79_apply_changeset" ->
      """WITH ch AS (
        |  SELECT c_custkey AS k,
        |    CASE WHEN c_custkey % 21 = 0 THEN 'D' ELSE 'U' END AS op,
        |    c_acctbal + 1000.0 AS new_bal
        |  FROM customer WHERE c_custkey % 7 = 0),
        |ins AS (
        |  SELECT c_custkey + 1000000 AS c_custkey,
        |    'Clone-' || c_name AS c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 500 = 3),
        |applied AS (
        |  SELECT s.c_custkey, s.c_name, s.c_nationkey,
        |    CASE WHEN ch.op = 'U' THEN ch.new_bal ELSE s.c_acctbal END AS c_acctbal,
        |    s.c_mktsegment
        |  FROM customer s LEFT JOIN ch ON s.c_custkey = ch.k
        |  WHERE COALESCE(ch.op, '') <> 'D')
        |SELECT * FROM applied UNION ALL SELECT * FROM ins
        |ORDER BY c_custkey""".stripMargin,
    "q04_delete_antijoin" ->
      """SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
        |FROM orders
        |WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q05_join_broadcast" ->
      s"""SELECT p_brand,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q06_join_multi_star" ->
      s"""SELECT r_name, n_name,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q07_join_semi" ->
      s"""SELECT COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS price_sum
         |FROM orders
         |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)""".stripMargin,
    "q08_join_anti" ->
      s"""SELECT COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS price_sum
         |FROM orders
         |WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_discount > 0.08)""".stripMargin,
    "q09_join_theta" ->
      s"""SELECT s_name, COUNT(*) AS n_parts, ${sqlDsum("p_retailprice")} AS price_sum
         |FROM supplier JOIN part ON s_acctbal < p_retailprice
         |WHERE p_size = 1
         |GROUP BY s_name ORDER BY s_name""".stripMargin,
    "q48_range_bucket_join" ->
      s"""WITH e AS (SELECT event_id, CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS epoch, value
         |  FROM events),
         |w AS (SELECT event_id AS w_id, epoch AS w_epoch,
         |    epoch - 600 AS lo, epoch + 600 AS hi
         |  FROM e WHERE value > 300)
         |SELECT w.w_id, w.w_epoch, COUNT(*) AS n_events,
         |  ${sqlDsum("e.value")} AS value_sum
         |FROM w JOIN e ON e.epoch BETWEEN w.lo AND w.hi
         |GROUP BY w.w_id, w.w_epoch ORDER BY w.w_id""".stripMargin,
    "q38_shipping_priority" ->
      s"""SELECT l_orderkey, o_orderdate, o_orderpriority,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q39_nation_volume" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  YEAR(l_shipdate) AS ship_year,
         |  CAST(SUM($discPriceSql) AS DOUBLE) AS revenue,
         |  COUNT(*) AS n_items
         |FROM lineitem
         |  JOIN orders ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |GROUP BY supp_nation, cust_nation, ship_year
         |ORDER BY supp_nation, cust_nation, ship_year""".stripMargin)
}
