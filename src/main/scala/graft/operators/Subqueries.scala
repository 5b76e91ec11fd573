package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Schemas

/** Correlated subqueries and lateral joins — Catalyst's subquery
  * decorrelation surface (rewritten to joins by the optimizer; at scale
  * these plan as the aggregate/join shapes of q05–q08). Each query text
  * is the shared ANSI subset and doubles as its own oracle. */
object Subqueries {

  val q43Sql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part p
      |WHERE p_retailprice = (SELECT MIN(p2.p_retailprice) FROM part p2
      |                       WHERE p2.p_brand = p.p_brand)
      |ORDER BY p_partkey""".stripMargin

  val q44Sql: String =
    """SELECT c_custkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o2
      |                  WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
      |ORDER BY c_custkey""".stripMargin

  val q45Sql: String =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
      |         WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 1) t
      |WHERE c.c_custkey < 100
      |ORDER BY c.c_custkey""".stripMargin

  private def run(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Schemas.registerCorpus(spark, dir)
    spark.sql(sql)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q43_correlated_scalar" -> (run(q43Sql) _),
    "q44_exists_subquery" -> (run(q44Sql) _),
    "q45_lateral_join" -> (run(q45Sql) _))

  val oracle: Map[String, String] = Map(
    "q43_correlated_scalar" -> q43Sql,
    "q44_exists_subquery" -> q44Sql,
    "q45_lateral_join" -> q45Sql)
}
