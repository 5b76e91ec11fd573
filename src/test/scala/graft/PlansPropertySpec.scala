package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.{AsOfJoin, TopKPerGroup}

import scala.util.Random

/** Randomized equivalence for the two native operators: whatever the
  * data shape (skewed groups, ties, empty sides, k beyond group size),
  * the custom physical operators must return exactly what the
  * reference compositions return. Seeded generators — failures
  * reproduce. */
class PlansPropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  test("TopKPerGroup equals the row_number window form on 20 random datasets") {
    import spark.implicits._
    val rnd = new Random(4242)
    for (trial <- 1 to 20) {
      val nGroups = 1 + rnd.nextInt(8)
      val nRows = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(6)
      // low-cardinality values force plenty of ties
      val rows = (0 until nRows).map { i =>
        (rnd.nextInt(nGroups), i.toLong, rnd.nextInt(5).toDouble)
      }
      val df = rows.toDF("g", "id", "v").repartition(1 + rnd.nextInt(5))
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))
      val expected = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(_.toSeq).toSet
      val got = TopKPerGroup.topKPerGroup(df,
          Seq(col("g")), Seq(col("v").desc, col("id").asc), k)
        .collect().map(_.toSeq).toSet
      assert(got === expected, s"trial=$trial groups=$nGroups rows=$nRows k=$k")
    }
  }

  test("rank-mode TopKPerGroup equals the rank() window form on 20 random datasets") {
    import spark.implicits._
    val rnd = new Random(2468)
    for (trial <- 1 to 20) {
      val nGroups = 1 + rnd.nextInt(8)
      val nRows = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(6)
      // 3-value order column ⇒ heavy boundary ties — the case rank mode
      // exists for (row_number mode would drop tied rows past k)
      val rows = (0 until nRows).map { i =>
        (rnd.nextInt(nGroups), i.toLong, rnd.nextInt(3).toDouble)
      }
      val df = rows.toDF("g", "id", "v").repartition(1 + rnd.nextInt(5))
      // expected = driver-side rank evaluation (ties share rank)
      val expected = rows.groupBy(_._1).flatMap { case (_, grp) =>
        grp.filter { r => grp.count(o => o._3 > r._3) < k }
      }.map(r => Seq(r._1, r._2, r._3)).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val q = df.withColumn("rk", rank().over(w)).filter(col("rk") <= k).drop("rk")
      val got = q.collect().map(_.toSeq).toSet
      // the point is the NATIVE path — fail loudly if the rule didn't
      // claim it (plan read AFTER collect: AQE finalizes on execution).
      // Spark skips WindowGroupLimit inference entirely when the child's
      // maxRows <= limit (the filter can't drop anything) — only assert
      // when the rewrite is applicable.
      if (nRows > k) {
        assert(q.queryExecution.executedPlan.toString.contains("TopKRankPerGroup"),
          s"rank rule must fire: trial=$trial groups=$nGroups rows=$nRows k=$k")
      }
      assert(got === expected, s"trial=$trial groups=$nGroups rows=$nRows k=$k")
    }
  }

  test("dense-mode TopKPerGroup equals the dense_rank() window form on 20 random datasets") {
    import spark.implicits._
    val rnd = new Random(13579)
    for (trial <- 1 to 20) {
      val nGroups = 1 + rnd.nextInt(8)
      val nRows = 1 + rnd.nextInt(400)
      val k = 1 + rnd.nextInt(4)
      // 6-value order column: more distinct values than k, plenty of
      // rows per value — both eviction and bucket growth exercised
      val rows = (0 until nRows).map { i =>
        (rnd.nextInt(nGroups), i.toLong, rnd.nextInt(6).toDouble)
      }
      val df = rows.toDF("g", "id", "v").repartition(1 + rnd.nextInt(5))
      val expected = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val topK = grp.map(_._3).distinct.sorted(Ordering[Double].reverse).take(k).toSet
        grp.filter(r => topK.contains(r._3))
      }.map(r => Seq(r._1, r._2, r._3)).toSet
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val q = df.withColumn("rk", dense_rank().over(w)).filter(col("rk") <= k).drop("rk")
      val got = q.collect().map(_.toSeq).toSet
      if (nRows > k) {
        assert(q.queryExecution.executedPlan.toString.contains("TopKDenseRankPerGroup"),
          s"dense_rank rule must fire: trial=$trial groups=$nGroups rows=$nRows k=$k")
      }
      assert(got === expected, s"trial=$trial groups=$nGroups rows=$nRows k=$k")
    }
  }

  test("native as-of join equals a per-row subquery evaluation on 20 random datasets") {
    import spark.implicits._
    val rnd = new Random(777)
    for (trial <- 1 to 20) {
      val nKeys = 1 + rnd.nextInt(5)
      val nL = rnd.nextInt(60)
      val nR = rnd.nextInt(60) // can be 0 → all-null fill
      // coarse times force equal-timestamp ties on both sides
      val lRows = (0 until nL).map(i => (rnd.nextInt(nKeys), rnd.nextInt(20).toLong, i.toLong))
      val rRows = (0 until nR).map(i => (rnd.nextInt(nKeys), rnd.nextInt(20).toLong, 1000L + i))
      val l = lRows.toDF("k", "t", "lid").repartition(1 + rnd.nextInt(4))
      val r = rRows.toDF("rk", "rt", "rid").repartition(1 + rnd.nextInt(4))
      val got = AsOfJoin.asOfJoin(l, r, Seq(col("k")), Seq(col("rk")), col("t"), col("rt"))
        .select(col("lid"), col("rt"))
        .collect().map(row => (row.getLong(0),
          if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
      // reference: newest right time per left row, computed driver-side.
      // (rt is deterministic under ties — equal rt values are equal; rid
      // would not be, which is why the assert reads rt.)
      val expected = lRows.map { case (k, t, lid) =>
        val cand = rRows.filter(rr => rr._1 == k && rr._2 <= t)
        lid -> (if (cand.isEmpty) -1L else cand.map(_._2).max)
      }.toMap
      assert(got === expected, s"trial=$trial keys=$nKeys nL=$nL nR=$nR")
    }
  }
}
