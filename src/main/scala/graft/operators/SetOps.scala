package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations: UNION (distinct), INTERSECT, EXCEPT — SQL bag/set
  * semantics exactly as Spark's `union().distinct()`, `intersect`,
  * `except` (which are distinct-set ops, matching DuckDB's defaults).
  *
  * Scale: each set op is one hash aggregate / hash semi-diff on the key —
  * a single shuffle; inputs are pre-projected to the key column so the
  * shuffle carries minimal bytes.
  */
object SetOps {

  private def custsWithStatus(spark: SparkSession, dir: String, status: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === status)
      .select(col("o_custkey"))

  /** Customers with an 'F' order ∪ customers with a 'P' order. */
  def q18_set_union(spark: SparkSession, dir: String): DataFrame =
    custsWithStatus(spark, dir, "F").union(custsWithStatus(spark, dir, "P"))
      .distinct()
      .orderBy(col("o_custkey"))

  /** Customers with both an 'F' and a 'P' order. */
  def q19_set_intersect(spark: SparkSession, dir: String): DataFrame =
    custsWithStatus(spark, dir, "F").intersect(custsWithStatus(spark, dir, "P"))
      .orderBy(col("o_custkey"))

  /** Customers with an 'F' order but no 'P' order. */
  def q20_set_except(spark: SparkSession, dir: String): DataFrame =
    custsWithStatus(spark, dir, "F").except(custsWithStatus(spark, dir, "P"))
      .orderBy(col("o_custkey"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_set_union" -> (q18_set_union _),
    "q19_set_intersect" -> (q19_set_intersect _),
    "q20_set_except" -> (q20_set_except _))

  val oracle: Map[String, String] = Map(
    "q18_set_union" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q19_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "q20_set_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin)
}
