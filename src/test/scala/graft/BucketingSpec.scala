package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing — the 100 TB pattern for repeated
  * large×large joins on a stable key: pay the shuffle once at write
  * time (bucketBy), then every subsequent join on that key is
  * shuffle-free. The spec asserts the Exchange really disappears. */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any Exchange; results match unbucketed join") {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    // the in-memory catalog is fresh per JVM but the warehouse dir is
    // not — drop both the table entry and its leftover location
    Seq("li_bucketed", "o_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh, t))
    }
    li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n$plan")
      // correctness unchanged vs plain join
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }
}
