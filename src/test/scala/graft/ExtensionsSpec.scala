package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end test of the `spark.sql.extensions=graft.GraftExtensions`
  * integration path — the way a user plugs the engine into a session
  * the library did NOT build (spark-submit --conf). Verifies all three
  * injection points: the SQL function, the planner strategy, and the
  * optimizer rule — on a session that never calls Sessions.base or
  * TopKPerGroup.register. */
class ExtensionsSpec extends AnyFunSuite with org.scalatest.BeforeAndAfterAll {

  private var priorDefault: Option[SparkSession] = None

  override protected def beforeAll(): Unit = {
    priorDefault = SparkSession.getDefaultSession
    super.beforeAll()
  }

  override protected def afterAll(): Unit = {
    // hand the JVM default back so later suites' Sessions.base
    // getOrCreate does not inherit this suite's extension session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    priorDefault.foreach(SparkSession.setDefaultSession)
    super.afterAll()
  }

  /** A fresh session created WITH the extensions class (shares the
    * JVM's SparkContext). `spark.sql.extensions` is STATIC conf — it
    * only applies when the SparkContext itself is created, which a
    * shared test JVM cannot redo — so this uses the public
    * `withExtensions(new GraftExtensions())` builder hook, which runs
    * the exact same injection code path. */
  private lazy val extSpark: SparkSession = {
    // make sure a context exists (other suites may not have run yet)
    Sessions.base("local[4]", 4)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions())
      .config("spark.sql.shuffle.partitions", "4")
      .getOrCreate()
    SparkSession.setDefaultSession(s)
    s
  }

  test("injected SQL function graft_fnv64 resolves and computes the reference hash") {
    val got = extSpark.sql("SELECT graft_fnv64('abc') AS h").collect().head.getLong(0)
    assert(got === functions.Udx.fnv64("abc".getBytes("UTF-8")))
  }

  test("injected optimizer rule + strategy execute row_number()<=k via the native operator") {
    import extSpark.implicits._
    val df = (1 to 100).map(i => (i % 5, i.toLong, i * 1.5)).toDF("g", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val topk = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2).drop("rn")
    val plan = topk.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial") && plan.contains("TopKPerGroupFinal"),
      s"extensions-injected rule/strategy did not fire:\n$plan")
    // and the answer matches the plain window semantics
    val got = topk.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val expected = (0 until 5).flatMap { g =>
      (1 to 100).filter(_ % 5 == g).sortBy(i => (-i * 1.5, i)).take(2)
        .map(i => (g, i.toLong))
    }.toSet
    assert(got === expected)
  }

  test("extensions path also claims rank() and dense_rank() in their tie-aware modes") {
    import extSpark.implicits._
    // 3 distinct v values, many rows each — ties everywhere
    val df = (1 to 90).map(i => (i % 3, i.toLong, (i % 3).toDouble)).toDF("g", "id", "v")
    val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
    val ranked = df.withColumn("rk", rank().over(w)).filter(col("rk") <= 1).drop("rk")
    val rGot = ranked.collect().map(_.getLong(1)).toSet
    assert(ranked.queryExecution.executedPlan.toString.contains("TopKRankPerGroup"))
    // per group all rows share one v → rank 1 for every row
    assert(rGot === (1 to 90).map(_.toLong).toSet)
    val dense = df.withColumn("rk", dense_rank().over(w)).filter(col("rk") <= 1).drop("rk")
    val dGot = dense.collect().map(_.getLong(1)).toSet
    assert(dense.queryExecution.executedPlan.toString.contains("TopKDenseRankPerGroup"))
    assert(dGot === rGot)
  }
}
