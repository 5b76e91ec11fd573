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

  /** Multiset (ALL) variants: INTERSECT ALL keeps min(multiplicity),
    * EXCEPT ALL subtracts multiplicities — the bag semantics a
    * dedup-accounting pipeline needs when copies matter. Spark plans
    * both as count-compare aggregates (one shuffle), not joins. */
  def q53_set_ops_all(spark: SparkSession, dir: String): DataFrame = {
    val f = custsWithStatus(spark, dir, "F")
    val p = custsWithStatus(spark, dir, "P")
    f.intersectAll(p).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_both"))
      .join(
        f.exceptAll(p).groupBy(col("o_custkey")).agg(count(lit(1)).as("n_f_only")),
        Seq("o_custkey"), "full")
      .select(col("o_custkey"),
        coalesce(col("n_both"), lit(0L)).as("n_both"),
        coalesce(col("n_f_only"), lit(0L)).as("n_f_only"))
      .orderBy(col("o_custkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_set_ops_all" -> (q53_set_ops_all _),
    "q18_set_union" -> (q18_set_union _),
    "q19_set_intersect" -> (q19_set_intersect _),
    "q20_set_except" -> (q20_set_except _))

  val oracle: Map[String, String] = Map(
    "q53_set_ops_all" ->
      """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |p AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'),
        |ib AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_both
        |       FROM (SELECT * FROM f INTERSECT ALL SELECT * FROM p)
        |       GROUP BY o_custkey),
        |eo AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_f_only
        |       FROM (SELECT * FROM f EXCEPT ALL SELECT * FROM p)
        |       GROUP BY o_custkey)
        |SELECT COALESCE(ib.o_custkey, eo.o_custkey) AS o_custkey,
        |  COALESCE(n_both, 0) AS n_both,
        |  COALESCE(n_f_only, 0) AS n_f_only
        |FROM ib FULL JOIN eo ON ib.o_custkey = eo.o_custkey
        |ORDER BY o_custkey""".stripMargin,
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
