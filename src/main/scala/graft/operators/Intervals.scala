package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** Interval / ordered-delta analytics — the ClickHouse `deltaSum`,
  * `maxIntersections` and `intervalLengthSum` family. Synthetic
  * intervals are derived deterministically from orders (start =
  * o_orderdate, length = o_orderkey % 30 days) so the DuckDB oracle
  * rebuilds them exactly.
  *
  * Scale stance: every query is one window over partition keys with
  * real cardinality (customer / order-month), never a global
  * single-partition window; the sweep-line trick turns interval
  * overlap — naively a self-join — into explode + ordered prefix sum,
  * which is one shuffle and linear work.
  */
object Intervals {

  /** ClickHouse `deltaSum`: the sum of POSITIVE steps of an ordered
    * series — total rise, ignoring drawdowns (sensor resets, counter
    * restarts). Per user over event values in time order; the order is
    * total ((ts, event_id) unique) so lag() is engine-deterministic.
    * Exact cents arithmetic end to end. */
  def q80_delta_sum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        (m(col("value")) * 100).cast(LongType).as("cents"))
      .withColumn("step", col("cents") - lag(col("cents"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("step") > 0, col("step"))).as("delta_sum_cents"),
        count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }

  /** Deterministic synthetic intervals: [start, end) per order. */
  private def intervals(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_custkey"),
      col("o_orderdate").cast(DateType).as("start"),
      date_add(col("o_orderdate").cast(DateType),
        (col("o_orderkey") % 30).cast(IntegerType)).as("end"))

  /** ClickHouse `maxIntersections`: the peak number of simultaneously
    * open intervals, per customer — sweep line: explode each interval
    * into (+1 at start, −1 at end), order by (day, delta) — the −1
    * BEFORE the +1 at equal days encodes half-open [start, end) — and
    * take the max prefix sum. One explode + one window shuffle; no
    * interval self-join exists in the plan. */
  def q81_max_intersections(spark: SparkSession, dir: String): DataFrame = {
    val marks = intervals(spark, dir)
      .select(col("o_custkey"), explode(array(
        struct(col("start").as("day"), lit(1).as("delta")),
        struct(col("end").as("day"), lit(-1).as("delta")))).as("m"))
      .select(col("o_custkey"), col("m.day"), col("m.delta"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"), col("delta")) // -1 sorts before +1: [start, end)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marks
      .withColumn("open", sum(col("delta")).over(w))
      .groupBy(col("o_custkey"))
      .agg(max(col("open")).cast(LongType).as("peak_open"))
      .orderBy(col("o_custkey"))
  }

  /** ClickHouse `intervalLengthSum`: total days covered by the UNION
    * of a customer's intervals (overlaps counted once). Classic merge
    * without a self-join: order intervals by start, track the running
    * max end seen BEFORE each row (lag of a running max), and sum each
    * row's contribution beyond it. Zero-length intervals (key % 30 ==
    * 0) contribute nothing — [d, d) is empty under half-open
    * semantics. */
  def q82_interval_union(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("start"), col("end"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    intervals(spark, dir)
      .withColumn("prev_max_end", max(col("end")).over(wPrev))
      .withColumn("covered_from",
        greatest(col("start"), coalesce(col("prev_max_end"), col("start"))))
      .withColumn("gain",
        greatest(datediff(col("end"), col("covered_from")), lit(0)))
      .groupBy(col("o_custkey"))
      .agg(sum(col("gain")).as("covered_days"), count(lit(1)).as("n_intervals"))
      .orderBy(col("o_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_delta_sum" -> (q80_delta_sum _),
    "q81_max_intersections" -> (q81_max_intersections _),
    "q82_interval_union" -> (q82_interval_union _))

  val oracle: Map[String, String] = Map(
    "q80_delta_sum" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents,
        |    LAG(CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT)) OVER
        |      (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id) AS prev
        |  FROM events)
        |SELECT user_id,
        |  CAST(SUM(CASE WHEN cents - prev > 0 THEN cents - prev END) AS BIGINT)
        |    AS delta_sum_cents,
        |  COUNT(*) AS n
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q81_max_intersections" ->
      """WITH iv AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INT) AS e
        |  FROM orders),
        |marks AS (
        |  SELECT o_custkey, s AS day, 1 AS delta FROM iv
        |  UNION ALL
        |  SELECT o_custkey, e AS day, -1 AS delta FROM iv),
        |run AS (
        |  SELECT o_custkey,
        |    SUM(delta) OVER (PARTITION BY o_custkey ORDER BY day, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        |  FROM marks)
        |SELECT o_custkey, CAST(MAX(open) AS BIGINT) AS peak_open
        |FROM run GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q82_interval_union" ->
      """WITH iv AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS s,
        |    CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 AS INT) AS e
        |  FROM orders),
        |x AS (
        |  SELECT o_custkey, s, e,
        |    MAX(e) OVER (PARTITION BY o_custkey ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_end
        |  FROM iv)
        |SELECT o_custkey,
        |  CAST(SUM(GREATEST(e - GREATEST(s, COALESCE(prev_max_end, s)), 0)) AS BIGINT)
        |    AS covered_days,
        |  COUNT(*) AS n_intervals
        |FROM x GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)
}
