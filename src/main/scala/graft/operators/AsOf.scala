package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (compose > custom
  * strategy): tag both sides, UNION, then a per-key time-ordered window
  * carries the latest right-side row forward onto each left row
  * (`last(..., ignoreNulls)` over an unbounded-preceding frame).
  *
  * Scale: one shuffle on the join key + per-key sort — the same cost
  * shape as a sort-merge join, with no range-explosion risk; this is the
  * standard distributed as-of pattern. Inclusive semantics (right.ts <=
  * left.ts), matching DuckDB's ASOF JOIN, which serves as the oracle.
  */
object AsOf {

  /** Left as-of join: for every left row, the most recent right row of
    * the same key with rightTime <= leftTime. `rightVals` are the
    * right-side columns to carry (they appear as `asof_<name>`). */
  def leftAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val lTagged = left.withColumn("_t", col(leftTime))
      .withColumn("_side", lit(1)) // left sorts after right at equal time → inclusive
    val rTagged = rightVals.foldLeft(
        right.select((key +: rightTime +: rightVals).map(col): _*)
          .withColumn("_t", col(rightTime)).withColumn("_side", lit(0))) {
      (df, c) => df.withColumnRenamed(c, s"_rv_$c")
    }.withColumnRenamed(rightTime, s"_rv_$rightTime")
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(col(key)).orderBy(col("_t"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (s"_rv_$rightTime" +: rightVals.map(c => s"_rv_$c"))
      .foldLeft(unioned) { (df, c) =>
        df.withColumn(c.stripPrefix("_rv_") match {
          case n => s"asof_$n"
        }, last(col(c), ignoreNulls = true).over(w))
      }
    carried.filter(col("_side") === 1)
      .drop((Seq("_t", "_side", s"_rv_$rightTime") ++ rightVals.map(c => s"_rv_$c")): _*)
  }

  /** q31: outer-join family — customers LEFT JOIN their 'P' orders
    * (most customers have none → null side preserved). */
  def q31_join_outer(spark: SparkSession, dir: String): DataFrame = {
    val pOrders = Tables.orders(spark, dir).filter(col("o_orderstatus") === "P")
    Tables.customer(spark, dir)
      .join(pOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_p_orders"),
        max(col("o_orderkey")).isNotNull.as("has_p_order"))
      .orderBy(col("c_custkey"))
  }

  /** q32: full outer join of two disjoint-ish keyed aggregates. */
  def q32_join_full_outer(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val f = o.filter(col("o_orderstatus") === "F").groupBy(col("o_custkey").as("fk"))
      .agg(count(lit(1)).as("n_f"))
    val p = o.filter(col("o_orderstatus") === "P").groupBy(col("o_custkey").as("pk"))
      .agg(count(lit(1)).as("n_p"))
    f.join(p, col("fk") === col("pk"), "full_outer")
      .select(coalesce(col("fk"), col("pk")).as("custkey"),
        coalesce(col("n_f"), lit(0L)).as("n_f"),
        coalesce(col("n_p"), lit(0L)).as("n_p"))
      .orderBy(col("custkey"))
  }

  /** q33: as-of join over events — for every 'error' event, the user's
    * most recent prior-or-simultaneous 'purchase'. */
  def q33_join_asof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    leftAsOf(errors, purchases, "user_id", "ts", "ts", Seq("value"))
      .select(col("event_id"), col("user_id"),
        col("ts").cast(TimestampNTZType).as("ts"),
        col("asof_ts").cast(TimestampNTZType).as("purchase_ts"),
        col("asof_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** q55: the SAME as-of semantics through the engine's NATIVE binary
    * operator ([[graft.plans.AsOfJoin]]) — co-partitioned hash
    * exchanges + per-partition (key, time) sorts + a streamed
    * two-pointer merge holding one candidate row, instead of q33's
    * union + carry-forward window over the combined stream. Same
    * oracle as q33: the two implementations must agree exactly. */
  def q55_asof_native(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    graft.plans.AsOfJoin.asOfJoin(errors, purchases,
        Seq(col("user_id")), Seq(col("p_user")), col("ts"), col("p_ts"))
      .select(col("event_id"), col("user_id"),
        col("ts").cast(TimestampNTZType).as("ts"),
        col("p_ts").cast(TimestampNTZType).as("purchase_ts"),
        col("p_value").as("purchase_value"))
      .orderBy(col("event_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_asof_native" -> (q55_asof_native _),
    "q31_join_outer" -> (q31_join_outer _),
    "q32_join_full_outer" -> (q32_join_full_outer _),
    "q33_join_asof" -> (q33_join_asof _))

  val oracle: Map[String, String] = Map(
    // identical semantics, identical oracle — native operator vs q33's
    // composition must both match DuckDB's ASOF LEFT JOIN
    "q55_asof_native" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q31_join_outer" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_p_orders,
        |  MAX(o_orderkey) IS NOT NULL AS has_p_order
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
        |  ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "q32_join_full_outer" ->
      """SELECT COALESCE(f.fk, p.pk) AS custkey,
        |  COALESCE(f.n_f, 0) AS n_f, COALESCE(p.n_p, 0) AS n_p
        |FROM (SELECT o_custkey AS fk, COUNT(*) AS n_f FROM orders
        |      WHERE o_orderstatus = 'F' GROUP BY o_custkey) f
        |FULL OUTER JOIN
        |     (SELECT o_custkey AS pk, COUNT(*) AS n_p FROM orders
        |      WHERE o_orderstatus = 'P' GROUP BY o_custkey) p
        |  ON f.fk = p.pk
        |ORDER BY custkey""".stripMargin,
    "q33_join_asof" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  p.ts AS purchase_ts, p.value AS purchase_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin)
}
