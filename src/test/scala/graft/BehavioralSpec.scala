package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FunnelExpr
import graft.operators.Behavioral

/** Behavioral-analytics family: the funnel fold's greedy algorithm must
  * agree with the exists-a-chain definition (what the DuckDB oracle
  * states), retention must flag planted comeback days, and the exact
  * decimal-moment statistics must agree with Spark's streaming built-ins.
  */
class BehavioralSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  private def lvl(window: Long, evs: (Long, Int)*): Int = {
    import spark.implicits._
    evs.toSeq.toDF("t", "step")
      .agg(sort_array(collect_list(struct(col("t"), col("step")))).as("evs"))
      .select(FunnelExpr.windowFunnel(col("evs"), window, 3).as("l"))
      .head().getInt(0)
  }

  test("funnel: full chain inside window") {
    assert(lvl(100L, (0L, 1), (10L, 2), (90L, 3)) === 3)
  }

  test("funnel: step 3 outside window of chain start") {
    assert(lvl(100L, (0L, 1), (10L, 2), (101L, 3)) === 2)
  }

  test("funnel: later restart re-opens the window (greedy keeps latest start)") {
    // first chain's window closes before the purchase; the second view
    // re-anchors the window and the full chain completes
    assert(lvl(100L, (0L, 1), (10L, 2), (150L, 1), (160L, 2), (240L, 3)) === 3)
  }

  test("funnel: steps out of order don't chain") {
    assert(lvl(100L, (0L, 2), (10L, 3), (20L, 1)) === 1)
  }

  test("funnel: same-timestamp events chain in step order") {
    assert(lvl(100L, (5L, 1), (5L, 2), (5L, 3)) === 3)
  }

  test("funnel: boundary — exactly window-wide chain counts") {
    assert(lvl(100L, (0L, 1), (50L, 2), (100L, 3)) === 3)
  }

  test("funnel: no step-1 event means level 0") {
    assert(lvl(100L, (0L, 2), (10L, 3)) === 0)
  }

  /** Independent exists-a-chain reference: any e1 ≤ e2 ≤ e3 with steps
    * 1,2,3 and t2,t3 within `window` of t1. Cubic, driver-side — the
    * definition, not the algorithm. */
  private def bruteLevel(window: Long, evs: Seq[(Long, Int)]): Int = {
    val s = evs.sorted
    val l1 = s.filter(_._2 == 1)
    def l2pairs = for {
      e1 <- l1; e2 <- s
      if e2._2 == 2 && e2._1 >= e1._1 && e2._1 <= e1._1 + window
    } yield (e1, e2)
    lazy val has3 = l2pairs.exists { case (e1, e2) =>
      s.exists(e3 => e3._2 == 3 && e3._1 >= e2._1 && e3._1 <= e1._1 + window)
    }
    if (has3) 3 else if (l2pairs.nonEmpty) 2 else if (l1.nonEmpty) 1 else 0
  }

  test("funnel: randomized greedy == exists-chain equivalence (500 cases)") {
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    val cases = (0 until 500).map { i =>
      val n = 1 + rnd.nextInt(12)
      val evs = Seq.fill(n)((rnd.nextInt(40).toLong, 1 + rnd.nextInt(3)))
      (i.toLong, evs)
    }
    val window = 15L
    val rows = cases.flatMap { case (u, evs) => evs.map(e => (u, e._1, e._2)) }
    val got = rows.toDF("user_id", "t", "step")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("t"), col("step")))).as("evs"))
      .select(col("user_id"), FunnelExpr.windowFunnel(col("evs"), window, 3).as("l"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    cases.foreach { case (u, evs) =>
      assert(got(u) === bruteLevel(window, evs),
        s"user $u events ${evs.sorted.mkString(",")}")
    }
  }

  /** Direct greedy chain scanner — the sequenceMatch/Count definition:
    * scan the step string left to right, advance on the next needed
    * step, count a match and restart when the chain completes. */
  private def greedyCount(s: String, chain: String): Int = {
    var pos = 0; var cnt = 0
    s.foreach { c =>
      if (c == chain(pos)) {
        pos += 1
        if (pos == chain.length) { cnt += 1; pos = 0 }
      }
    }
    cnt
  }

  test("sequence match/count: negated-class regex == greedy scan (1000 cases)") {
    val rnd = new scala.util.Random(7)
    import spark.implicits._
    val cases = (0 until 1000).map(i =>
      (i.toLong, Seq.fill(rnd.nextInt(15))(('1' + rnd.nextInt(3)).toChar).mkString))
    val got = cases.toDF("id", "seq")
      .select(col("id"),
        col("seq").rlike("1[^2]*2[^3]*3").as("m"),
        regexp_count(col("seq"), lit("1[^2]*2[^3]*3")).as("c"),
        regexp_count(col("seq"), lit("1[^2]*2")).as("c12"))
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(1), r.getInt(2), r.getInt(3)))).toMap
    cases.foreach { case (id, s) =>
      val (m, c, c12) = got(id)
      assert(c === greedyCount(s, "123"), s"count123 '$s'")
      assert(c12 === greedyCount(s, "12"), s"count12 '$s'")
      assert(m === (greedyCount(s, "123") > 0), s"match '$s'")
    }
  }

  test("retention flags planted comeback days") {
    import spark.implicits._
    // user 1: active d0, d0+1, d0+7; user 2: d0 only; user 3: d0, d0+14
    val rows = Seq(
      (1L, "2024-03-01"), (1L, "2024-03-02"), (1L, "2024-03-08"),
      (2L, "2024-03-01"),
      (3L, "2024-03-01"), (3L, "2024-03-15"))
    val ev = rows.toDF("user_id", "ds")
      .select(col("user_id"), to_date(col("ds")).as("d"))
    val flags = ev.groupBy(col("user_id"))
      .agg(min(col("d")).as("d0"), collect_set(col("d")).as("dset"))
      .select(col("user_id"),
        array_contains(col("dset"), date_add(col("d0"), 1)).as("r1"),
        array_contains(col("dset"), date_add(col("d0"), 7)).as("r7"),
        array_contains(col("dset"), date_add(col("d0"), 14)).as("r14"))
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(flags(1L) === ((true, true, false)))
    assert(flags(2L) === ((false, false, false)))
    assert(flags(3L) === ((false, false, true)))
  }

  test("exact-moment statistics agree with Spark's streaming built-ins") {
    val dir = "/root/testdata/sf0.001"
    val exact = Behavioral.q58_stats_agg(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(4), r.getDouble(6), r.getDouble(7))).toMap
    val builtin = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(stddev_samp(col("l_quantity")).as("sd"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        corr(col("l_quantity"), col("l_extendedprice")).as("cr"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (sd, cv, cr)) =>
      val (bsd, bcv, bcr) = builtin(flag)
      assert(math.abs(sd - bsd) / bsd < 1e-9, s"stddev $flag")
      assert(math.abs(cv - bcv) / math.abs(bcv) < 1e-9, s"covar $flag")
      assert(math.abs(cr - bcr) / math.abs(bcr) < 1e-9, s"corr $flag")
    }
  }

  test("group_array renders keys numerically sorted, names lexically sorted") {
    val row = Behavioral.q59_group_array(spark, "/root/testdata/sf0.001")
      .head()
    val keys = row.getAs[String]("supp_keys").split(",").map(_.toLong)
    assert(keys.sameElements(keys.sorted))
    val names = row.getAs[String]("supp_names").split("\\|")
    assert(names.sameElements(names.sorted))
  }

  test("histogram buckets partition the order count") {
    val dir = "/root/testdata/sf0.001"
    val total = Tables.orders(spark, dir).count()
    val rows = Behavioral.q60_histogram(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("n")).sum === total)
    // every order's price lies inside its bucket's [20000b, 20000(b+1))
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Double]("price_min") >= 20000.0 * b)
      assert(r.getAs[Double]("price_max") < 20000.0 * (b + 1))
    }
  }
}
