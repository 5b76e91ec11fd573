package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BoundedCollect.boundedCollectList

/** The size-capped collect must be indistinguishable from
  * collect_list + the same size filter for every surviving group, while
  * never letting any group's buffer grow past cap + 1 — the property
  * that makes dedup candidate generation one-pass and memory-bounded. */
class BoundedCollectSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 8)

  test("matches collect_list + size filter exactly on skewed multi-partition data") {
    import spark.implicits._
    // keys with cardinalities 1..60 (cap = 20 drops some, keeps others),
    // spread over 8 partitions so partial buffers and merges are real
    val rows = (1 to 60).flatMap(k => (1 to k).map(i => (k.toLong, k * 1000L + i)))
    val df = rows.toDF("k", "v").repartition(8).cache()
    val cap = 20
    val got = df.groupBy($"k")
      .agg(boundedCollectList($"v", cap).as("es"))
      .filter(size($"es").between(2, cap))
      .select($"k", sort_array($"es").as("es"))
    val want = df.groupBy($"k")
      .agg(collect_list($"v").as("es"))
      .filter(size($"es").between(2, cap))
      .select($"k", sort_array($"es").as("es"))
    assert(got.orderBy($"k").collect().toSeq === want.orderBy($"k").collect().toSeq)
    assert(got.count() === (2 to cap).size.toLong)
  }

  test("over-cap groups surface with exactly cap+1 elements (the overflow marker)") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (1L, i.toLong)).toDF("k", "v").repartition(8)
    val out = df.groupBy($"k").agg(boundedCollectList($"v", 100).as("es"))
      .select(size($"es").as("n")).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(101))
  }

  test("struct elements and null skipping behave like collect_list") {
    import spark.implicits._
    val df = Seq((1L, Some(10L), 100L), (1L, None, 200L), (1L, Some(30L), 300L))
      .toDF("k", "a", "b")
      .select($"k", when($"a".isNotNull, struct($"a", $"b")).as("e"))
      .repartition(3)
    val got = df.groupBy($"k").agg(sort_array(boundedCollectList($"e", 10)).as("es"))
      .select($"es").collect().head.getSeq[Any](0)
    assert(got.length === 2) // the null element row is skipped
  }
}
