package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Explicit partitioning control — the knobs the 100 TB design bullets
  * lean on: hash repartitioning by key, range partitioning, coalesce,
  * and sortWithinPartitions (cluster-friendly writes). */
class PartitioningSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  test("repartition(n, key) yields n partitions with key-local rows") {
    val df = Tables.lineitem(spark, dir).repartition(8, col("l_orderkey"))
    assert(df.rdd.getNumPartitions === 8)
    // all rows of one key land in one partition (hash partitioning)
    val spread = df.select(col("l_orderkey"), spark_partition_id().as("pid"))
      .groupBy("l_orderkey").agg(countDistinct("pid").as("n_pids"))
      .agg(max("n_pids")).head().getLong(0)
    assert(spread === 1L)
  }

  test("repartitionByRange produces non-overlapping sorted ranges") {
    val df = Tables.orders(spark, dir)
      .repartitionByRange(4, col("o_totalprice"))
      .sortWithinPartitions(col("o_totalprice"))
    val ranges = df.select(spark_partition_id().as("pid"), col("o_totalprice"))
      .groupBy("pid")
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .orderBy("pid").collect()
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getDouble(2) <= b.getDouble(1), "ranges must not overlap")
      case _ => ()
    }
  }

  test("coalesce reduces partitions without a shuffle") {
    val df = Tables.lineitem(spark, dir).repartition(8).coalesce(2)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === Tables.lineitem(spark, dir).count())
  }
}
