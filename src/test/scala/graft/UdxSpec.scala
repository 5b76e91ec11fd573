package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Udx

/** User-extension tiers: the codegen Expression must agree with its
  * reference implementation (both interpreted and generated paths), and
  * the Aggregator must be merge-order-independent. */
class UdxSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  test("Fnv64Expr matches reference impl (codegen path)") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "graft", "é中文")
    val got = inputs.toDF("s").select(Udx.graft_fnv64(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val want = inputs.map(s => Udx.fnv64(s.getBytes("UTF-8")))
    assert(got.toSeq === want)
  }

  test("Fnv64Expr interpreted path (eval) agrees too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Udx.Fnv64Expr(Literal("hello world"))
    assert(e.eval(null) === Udx.fnv64("hello world".getBytes("UTF-8")))
  }

  test("WeightedMean is exact and merge-order-independent") {
    // associative fixed-point sums: any grouping of partials agrees
    val rows = Seq((10.00, 2.00), (20.00, 1.00), (0.50, 4.00))
    val whole = rows.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce)
    val (l, r) = rows.splitAt(1)
    val split = Udx.WeightedMean.merge(
      l.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce),
      r.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce))
    assert(whole === split)
    val mean = Udx.WeightedMean.finish(whole)
    assert(math.abs(mean - (10 * 2 + 20 * 1 + 0.5 * 4) / 7.0) < 1e-12)
  }

  test("WeightedMean zero weight yields 0") {
    assert(Udx.WeightedMean.finish(Udx.WeightedMean.zero) === 0.0)
  }
}
