package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JDBC warehouse pushdown (j01/j02): every assertion reads the
  * EXECUTED plan — the point is what ships into the warehouse SQL,
  * not just what comes back. Embedded Derby is the live engine. */
class WarehouseSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Ground truth computed straight from the orders parquet. */
  private def ordersLocal(): DataFrame =
    Tables.orders(spark, dir).select(
      (col("o_custkey") % 97).cast(LongType).as("grp"),
      col("o_orderkey").cast(LongType).as("okey"),
      (col("o_totalprice").cast(DecimalType(9, 2)) * 100)
        .cast(LongType).as("cents"))

  test("j01: grouped COUNT/SUM/MIN/MAX ship into the warehouse SQL") {
    val df = operators.Warehouse.j01_jdbc_agg_pushdown(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("PushedAggregates"),
      s"aggregates must reach the JDBC scan: $plan")
    assert(plan.contains("PushedGroupByExpressions"),
      s"the group key must reach the JDBC scan: $plan")
    val local = ordersLocal().groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .orderBy(col("grp"))
    assert(df.collect().toSeq === local.collect().toSeq)
  }

  test("j02: filtered top-N pushes ORDER BY + FETCH FIRST and is actually bounded") {
    val df = operators.Warehouse.j02_jdbc_topn_pushdown(spark, dir)
    val plan = planOf(df)
    assert(plan.contains("PushedTopN"), s"top-N must reach the JDBC scan: $plan")
    // regression guard: Spark's builtin Derby dialect claims limit
    // support but emits NO limit clause — the pushed scan returned the
    // whole filtered table while the plan said LIMIT n
    val local = ordersLocal().filter(col("grp") === 42L)
      .orderBy(col("okey")).limit(20).select(col("okey"), col("cents"))
    assert(df.collect().toSeq === local.collect().toSeq)
  }

  test("patched Derby dialect emits FETCH FIRST and declines OFFSET") {
    sources.DerbyFetchFirstDialect.register()
    val d = org.apache.spark.sql.jdbc.JdbcDialects.get("jdbc:derby:memory:x")
    assert(d.getClass.getName.contains("DerbyFetchFirstDialect"),
      "the patched dialect must win Derby URL resolution")
    assert(d.getLimitClause(Int.box(20)) === "FETCH FIRST 20 ROWS ONLY")
    assert(d.getLimitClause(Int.box(0)) === "")
    assert(!d.supportsOffset,
      "OFFSET must stay Spark-side: the builder appends it after FETCH FIRST")
    // delegation stays faithful: Derby still has no real BLOB/byte mapping
    // change — spot-check a builtin-dialect decision through the wrapper
    assert(d.isSupportedFunction("SQRT") ===
      new sources.DerbyFetchFirstDialect(d).isSupportedFunction("SQRT"))
  }
}
