package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter join pruning — the 100 TB feature that can't
  * fire at test scale with production thresholds (application-side
  * default is a 10 GB scan), demonstrated in its own session with the
  * size gates lowered: a selective filter on one join side must inject
  * a bloom filter into the OTHER side's scan stage, so the big side
  * drops non-joining rows before the shuffle. This spec pins (a) that
  * the engine's session config doesn't break the feature, and (b) the
  * expected plan shape, so the flag regression-fails loudly if a
  * future config change disables it. */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = Sessions.base("local[4]", 4).newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // injection requires the creation side to be under its threshold and
    // the application side to be over — zeroing the app gate suffices
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    s
  }

  test("selective dim filter injects a bloom filter into the fact scan") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT") // selective build side
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val n = joined.collect().map(r => r.getLong(1)).sum
    assert(n > 0)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
      s"runtime bloom filter did not inject:\n${plan.linesIterator.take(30).mkString("\n")}")
  }
}
