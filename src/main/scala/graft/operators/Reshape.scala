package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** Null semantics and table reshaping (pivot / unpivot) — the remaining
  * §2.2 predicate/projection surface. */
object Reshape {

  /** Null-handling semantics made explicit: a left join manufactures
    * nulls, then COUNT(col) vs COUNT(*), null-safe equality (<=> /
    * IS NOT DISTINCT FROM), coalesce, and isnull all get exercised. */
  def q40_null_semantics(spark: SparkSession, dir: String): DataFrame = {
    val pOrders = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "P")
      .select(col("o_custkey"), col("o_totalprice"))
    Tables.customer(spark, dir)
      .join(pOrders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("o_totalprice")).as("n_nonnull"),
        sum(col("o_totalprice").isNull.cast(LongType)).as("n_null"),
        sum((col("o_custkey") <=> lit(null)).cast(LongType)).as("n_nullsafe_eq_null"),
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("price_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** Pivot: per linestatus, quantity sums spread across return flags. */
  def q41_pivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(m(col("l_quantity"))).cast(DoubleType))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy(col("l_linestatus"))

  /** Unpivot (melt): wide per-flag sums back to long (flag, qty) rows. */
  def q42_unpivot(spark: SparkSession, dir: String): DataFrame =
    q41_pivot(spark, dir)
      .unpivot(Array(col("l_linestatus")),
        Array(col("qty_a"), col("qty_n"), col("qty_r")),
        "flag", "qty")
      .orderBy(col("l_linestatus"), col("flag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_null_semantics" -> (q40_null_semantics _),
    "q41_pivot" -> (q41_pivot _),
    "q42_unpivot" -> (q42_unpivot _))

  val oracle: Map[String, String] = Map(
    "q40_null_semantics" ->
      s"""SELECT c_mktsegment,
         |  COUNT(*) AS n_rows,
         |  COUNT(o_totalprice) AS n_nonnull,
         |  CAST(SUM(CAST(o_totalprice IS NULL AS BIGINT)) AS BIGINT) AS n_null,
         |  CAST(SUM(CAST(o_custkey IS NOT DISTINCT FROM NULL AS BIGINT)) AS BIGINT) AS n_nullsafe_eq_null,
         |  ${sqlDsum("COALESCE(o_totalprice, 0.0)")} AS price_sum
         |FROM customer LEFT JOIN
         |  (SELECT o_custkey, o_totalprice FROM orders WHERE o_orderstatus = 'P') o
         |  ON c_custkey = o_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q41_pivot" ->
      s"""SELECT l_linestatus,
         |  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_a,
         |  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_n,
         |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_r
         |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q42_unpivot" ->
      s"""WITH p AS (
         |  SELECT l_linestatus,
         |    CAST(SUM(CASE WHEN l_returnflag = 'A' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_a,
         |    CAST(SUM(CASE WHEN l_returnflag = 'N' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_n,
         |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN ${sqlM("l_quantity")} END) AS DOUBLE) AS qty_r
         |  FROM lineitem GROUP BY l_linestatus)
         |SELECT l_linestatus, flag, qty FROM (
         |  SELECT l_linestatus, 'qty_a' AS flag, qty_a AS qty FROM p UNION ALL
         |  SELECT l_linestatus, 'qty_n', qty_n FROM p UNION ALL
         |  SELECT l_linestatus, 'qty_r', qty_r FROM p)
         |ORDER BY l_linestatus, flag""".stripMargin)
}
