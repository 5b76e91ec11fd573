package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: correctness invariants plus the plan shapes the
  * Scaladocs promise (native heap cut for quotas, TakeOrderedAndProject
  * for the fixed sample, no full-corpus window funnels). */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.explainString(FormattedMode)

  test("c01: threshold filter keeps ~50% of en / ~25% of rest, and is shuffle-free before the result sort") {
    // plan audited BEFORE cache() — a cached twin would otherwise print
    // its build plan's Exchange a second time in formatted mode
    val p = plan("c01_stratified_sample")
    assert("\\(\\d+\\) Exchange".r.findAllIn(p).size <= 1,
      "c01 must be filter-only plus the result sort's range exchange")
    val out = operators.Curation.c01_stratified_sample(spark, dir).cache()
    val total = Tables.documents(spark, dir)
      .groupBy(col("lang") === "en").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val kept = out.groupBy(col("lang") === "en").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val enRate = kept.getOrElse(true, 0L).toDouble / total(true)
    val otherRate = kept.getOrElse(false, 0L).toDouble / total(false)
    assert(math.abs(enRate - 0.5) < 0.15, s"en rate $enRate")
    assert(math.abs(otherRate - 0.25) < 0.15, s"other rate $otherRate")
    out.unpersist()
  }

  test("c02: equals the plain window-rank form; heavy cut runs on the native heap operator") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        substring(md5(concat(lit("mix:"), col("doc_id").cast("string"))), 1, 4).as("u_hex"))
    val n = docs.count()
    val nSrc = docs.select(col("source")).distinct().count()
    val cap = math.floor(n * 0.6 / nSrc).toLong
    val w = Window.partitionBy(col("source")).orderBy(col("u_hex"), col("doc_id"))
    val expected = docs.withColumn("rk", row_number().over(w))
      .where(col("rk") <= cap).select(col("doc_id")).orderBy(col("doc_id"))
      .collect().map(_.getLong(0)).toSeq
    val got = operators.Curation.c02_mixture_rebalance(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    assert(plan("c02_mixture_rebalance").contains("TopKPerGroup"),
      "the full-corpus cut must be the native heap operator")
  }

  test("c03: packing arithmetic is self-consistent per (lang, shard)") {
    val out = operators.Curation.c03_pack_sequences(spark, dir).cache()
    // bin_offset always within the window; spans_boundary iff the doc
    // tail crosses into a later window
    val bad = out.where(col("bin_offset") < 0 || col("bin_offset") >= 4096L ||
      (col("spans_boundary") =!= (col("bin_offset") + col("n_chars") > 4096L)))
    assert(bad.count() == 0, bad.limit(5).collect().mkString("\n"))
    // cumulative reconstruction: per group, sum of n_chars of docs up to
    // and including row i lands in bin (cum-1) DIV cap for the tail
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    val re = out.withColumn("cum2", sum(col("n_chars")).over(w))
      .where(expr("(cum2 - n_chars) DIV 4096") =!= col("bin"))
    assert(re.count() == 0)
    out.unpersist()
  }

  test("c04: exactly the window top-20 per source, with no Window or Sort in the plan") {
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(col("source")).orderBy(col("n_chars").desc, col("doc_id"))
    val expected = docs.withColumn("rk", row_number().over(w)).where(col("rk") <= 20)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val got = operators.Curation.c04_quota_topk(spark, dir)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    val p = plan("c04_quota_topk")
    assert(p.contains("TopKPerGroup"))
    assert(!p.contains("(Window"), "quota must not plan a window")
  }

  test("c05: plans as TakeOrderedAndProject, never a global sort of the corpus") {
    val p = plan("c05_fixed_sample")
    assert(p.contains("TakeOrderedAndProject"), p.linesIterator.take(20).mkString("\n"))
    assert(operators.Curation.c05_fixed_sample(spark, dir).count() == 100)
  }

  test("c06: contiguous global positions agreeing with the hash order") {
    val out = operators.Curation.c06_epoch_order(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.map(_._3).toSeq == out.indices.map(_.toLong).toSeq,
      "positions must be contiguous from 0")
    val resorted = out.sortBy(t => (t._2, t._1)).map(_._3).toSeq
    assert(resorted == out.indices.map(_.toLong).toSeq,
      "position order must equal (u_hex, doc_id) order")
  }
}
