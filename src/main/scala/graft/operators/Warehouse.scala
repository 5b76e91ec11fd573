package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** The reference's warehouse-does-the-query posture, on Spark's JDBC
  * tier: every probe in `hashes_test.go:192-233` is SQL the WAREHOUSE
  * evaluates (COUNT over the delivered table, filtered existence
  * checks) — the Go side never pulls rows back to filter client-side.
  * The Spark analogue is DSv2 JDBC pushdown: with a
  * `JDBCTableCatalog` the optimizer ships aggregates
  * (`pushDownAggregate`), filters, and LIMIT/top-N (`pushDownLimit`)
  * into the warehouse's SQL, so the JDBC wire carries RESULT rows, not
  * table rows. At 100 TB-warehouse scale that is the difference between
  * a one-row answer and an unbounded table scan over JDBC.
  *
  * Embedded Derby is the live engine (no ClickHouse server in this
  * environment — same stand-in as JdbcBatcherSpec); the ClickHouse
  * dialect's emitted SQL is pinned by ClickHouseDialectSpec and the
  * golden contract spec. The warehouse table is all-BIGINT by design:
  * Derby maps StringType to CLOB, which is neither comparable nor
  * groupable — the numeric shape keeps every pushdown legal on the
  * stand-in while staying representative (the reference's probes
  * filter/aggregate on numeric `amount` too, `hashes_test.go:146`).
  */
object Warehouse {

  private val CATALOG = "graft_wh"
  private val TABLE = s"$CATALOG.APP.orders_wh"

  /** Idempotent per-session catalog registration (catalog instances are
    * cached by name — first conf wins, so the URL is session-stable). */
  private def ensureCatalog(spark: SparkSession): Unit = {
    graft.sources.ClickHouseDialect.register()
    graft.sources.DerbyFetchFirstDialect.register()
    if (spark.conf.getOption(s"spark.sql.catalog.$CATALOG").isEmpty) {
      spark.conf.set(s"spark.sql.catalog.$CATALOG",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
      spark.conf.set(s"spark.sql.catalog.$CATALOG.url",
        "jdbc:derby:memory:graft_wh;create=true")
      spark.conf.set(s"spark.sql.catalog.$CATALOG.driver",
        "org.apache.derby.jdbc.EmbeddedDriver")
      spark.conf.set(s"spark.sql.catalog.$CATALOG.pushDownAggregate", "true")
      spark.conf.set(s"spark.sql.catalog.$CATALOG.pushDownLimit", "true")
      spark.conf.set(s"spark.sql.catalog.$CATALOG.batchsize", "5000")
    }
  }

  /** (Re)load the warehouse table from orders at `dir` — the delivery
    * step the micro-batcher performs incrementally, done as one bulk
    * load here so the READ-side pushdown is what the query exercises.
    * DROP + CREATE + append keeps repeated calls (bench reps, cached
    * catalog URL) idempotent. */
  private def loadOrders(spark: SparkSession, dir: String): Unit = {
    ensureCatalog(spark)
    spark.sql(s"DROP TABLE IF EXISTS $TABLE")
    spark.sql(s"""CREATE TABLE $TABLE
      (grp BIGINT, okey BIGINT, cents BIGINT)""")
    Tables.orders(spark, dir)
      .select(
        (col("o_custkey") % 97).cast(LongType).as("grp"),
        col("o_orderkey").cast(LongType).as("okey"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100)
          .cast(LongType).as("cents"))
      .coalesce(4) // bound embedded-connection churn on the bulk load
      .writeTo(TABLE).append()
  }

  /** j01 — grouped COUNT/SUM/MIN/MAX evaluated BY the warehouse: the
    * scan's SQL carries the aggregation and the group key
    * (`PushedAggregates`/`PushedGroupByExpressions` in the plan,
    * asserted by WarehouseSpec); Spark only merges per-partition
    * results. Oracle computes the same report from the orders parquet
    * the table was loaded from — delivery + pushdown are hash-checked
    * end to end. */
  def j01_jdbc_agg_pushdown(spark: SparkSession, dir: String): DataFrame = {
    loadOrders(spark, dir)
    spark.table(TABLE)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .orderBy(col("grp"))
  }

  /** j02 — a filtered top-N evaluated BY the warehouse: predicate,
    * sort, and LIMIT all ship into the JDBC SQL (`PushedFilters` +
    * `PushedTopN`), so the wire carries ≤ N rows no matter the table
    * size — the `hashes_test.go:192` existence-probe shape generalized
    * to a page. Total order (okey is the orders primary key) keeps the
    * result deterministic for the oracle. */
  def j02_jdbc_topn_pushdown(spark: SparkSession, dir: String): DataFrame = {
    loadOrders(spark, dir)
    spark.table(TABLE)
      .filter(col("grp") === 42L)
      .orderBy(col("okey"))
      .limit(20)
      .select(col("okey"), col("cents"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j01_jdbc_agg_pushdown" -> (j01_jdbc_agg_pushdown _),
    "j02_jdbc_topn_pushdown" -> (j02_jdbc_topn_pushdown _))

  val oracle: Map[String, String] = Map(
    "j01_jdbc_agg_pushdown" ->
      """SELECT o_custkey % 97 AS grp, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_cents,
        |  MIN(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS lo,
        |  MAX(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS hi
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "j02_jdbc_topn_pushdown" ->
      """SELECT o_orderkey AS okey,
        |  CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |FROM orders WHERE o_custkey % 97 = 42
        |ORDER BY o_orderkey LIMIT 20""".stripMargin)
}
