package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins on bucketed entity logs: two logs bucketed
  * on the same key join WITHOUT a shuffle exchange (the DSv2
  * KeyGroupedPartitioning path), a GROUP BY on the key aggregates
  * exchange-free, and the layout degrades safely — one unbucketed
  * segment downgrades the scan to shuffling, never to wrong
  * co-location. */
class LogBucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def ensureCatalog(): Unit = {
    if (spark.conf.getOption("spark.sql.catalog.graft_spj").isEmpty) {
      val wh = Files.createTempDirectory("graft_spj_wh").toString
      spark.conf.set("spark.sql.catalog.graft_spj", "graft.sources.LogCatalog")
      spark.conf.set("spark.sql.catalog.graft_spj.warehouse", wh)
    }
  }

  private def logDf(users: Int, rows: Int, tag: String): DataFrame =
    spark.range(rows).select(
      concat(lit("u"), col("id") % users).as("user_id"),
      (col("id") * 7).as("amount"),
      lit(null).cast("binary").as("msg"),
      sha2(concat(lit(tag), col("id").cast("string")), 256).as("sha256sum"))

  private def mkTable(name: String): String = {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_spj.ops")
    spark.sql(s"DROP TABLE IF EXISTS graft_spj.ops.$name")
    spark.sql(s"""CREATE TABLE graft_spj.ops.$name
      (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    s"graft_spj.ops.$name"
  }

  /** Run `body` with stable plan text: AQE off, broadcast joins off. */
  private def withPlainPlans[T](body: => T): T = {
    val conf = spark.conf
    val oldAqe = conf.get("spark.sql.adaptive.enabled")
    val oldBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally {
      conf.set("spark.sql.adaptive.enabled", oldAqe)
      conf.set("spark.sql.autoBroadcastJoinThreshold", oldBc)
    }
  }

  test("same-spec bucketed logs join with no Exchange; results match a plain join") {
    val t1 = mkTable("j1"); val t2 = mkTable("j2")
    val d1 = logDf(40, 400, "a"); val d2 = logDf(25, 60, "b")
    LogBucketing.writeBucketed(d1, t1, "user_id", 4)
    LogBucketing.writeBucketed(d2, t2, "user_id", 4)
    withPlainPlans {
      val joined = spark.table(t1).alias("l")
        .join(spark.table(t2).alias("r"), "user_id")
        .select(col("user_id"), col("l.amount"), col("r.amount"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"same-spec bucketed join must be shuffle-free, got:\n$plan")
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = d1.alias("l").join(d2.alias("r"), "user_id")
        .select(col("user_id"), col("l.amount"), col("r.amount"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
      assert(got.nonEmpty)
    }
  }

  test("the bucket claim survives a manifest FOLD: join stays shuffle-free past the threshold (r17)") {
    val prev = sys.props.put("graft.sidecar.fold.threshold", "3")
    try {
      val t1 = mkTable("jf1"); val t2 = mkTable("jf2")
      // enough same-spec bucketed commits to trigger the write-side
      // manifest fold several times — the folded manifest must keep
      // every segment's bucket tag or the layout silently downgrades
      (0 until 6).foreach { i =>
        LogBucketing.writeBucketed(logDf(40, 60, s"fa$i"), t1, "user_id", 4)
        LogBucketing.writeBucketed(logDf(25, 30, s"fb$i"), t2, "user_id", 4)
      }
      withPlainPlans {
        val joined = spark.table(t1).alias("l")
          .join(spark.table(t2).alias("r"), "user_id")
          .select(col("user_id"), col("l.amount"), col("r.amount"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join must stay shuffle-free after manifest folds, got:\n$plan")
        assert(joined.count() > 0)
      }
    } finally {
      prev match {
        case Some(v) => sys.props.put("graft.sidecar.fold.threshold", v)
        case None => sys.props.remove("graft.sidecar.fold.threshold")
      }
      ()
    }
  }

  test("GROUP BY the bucket key aggregates without an exchange") {
    val t = mkTable("agg1")
    LogBucketing.writeBucketed(logDf(30, 300, "g"), t, "user_id", 4)
    withPlainPlans {
      val agg = spark.table(t).groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("amount").as("total"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed GROUP BY must be exchange-free, got:\n$plan")
      val got = agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = logDf(30, 300, "g").groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("amount").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
    }
  }

  test("an unbucketed segment downgrades to a shuffling join, results stay exact") {
    val t1 = mkTable("mix1"); val t2 = mkTable("mix2")
    LogBucketing.writeBucketed(logDf(20, 200, "m"), t1, "user_id", 4)
    LogBucketing.writeBucketed(logDf(20, 50, "n"), t2, "user_id", 4)
    // a FOREIGN writer (legacy producer, pre-bucketing tooling) lands a
    // bucket-less segment: partitioning claim drops. (A catalog INSERT
    // no longer can — the write self-arranges into the pinned layout —
    // so this drives the task-level writer directly.)
    val wh = spark.conf.get("spark.sql.catalog.graft_spj.warehouse")
    val w = new LogDataWriter(s"$wh/ops/mix1", "legacy", 0, 0)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      org.apache.spark.unsafe.types.UTF8String.fromString("u3"), 777777L,
      null, org.apache.spark.unsafe.types.UTF8String.fromString("hx")))
    w.commit() match {
      case LogCommit(staged, _, _) =>
        val fs = new org.apache.hadoop.fs.Path(staged)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        assert(fs.rename(new org.apache.hadoop.fs.Path(staged),
          new org.apache.hadoop.fs.Path(s"$wh/ops/mix1", "segment-legacy-0")))
      case other => fail(s"unexpected commit message $other")
    }
    withPlainPlans {
      val joined = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"mixed-layout join must fall back to shuffling, got:\n$plan")
      // the appended row joins too (u3 exists on the right)
      assert(joined.filter(col("l.amount") === 777777).count() > 0)
    }
  }

  test("bucketed join stays correct (and the scan key-grouped) under AQE") {
    val t1 = mkTable("aqe1"); val t2 = mkTable("aqe2")
    val d1 = logDf(16, 160, "x"); val d2 = logDf(16, 32, "y")
    LogBucketing.writeBucketed(d1, t1, "user_id", 8)
    LogBucketing.writeBucketed(d2, t2, "user_id", 8)
    val joined = spark.table(t1).join(spark.table(t2), "user_id")
    assert(joined.count() === d1.join(d2, "user_id").count())
  }

  test("UPDATE preserves the bucketed layout: the join stays shuffle-free after it") {
    val t1 = mkTable("upd1"); val t2 = mkTable("upd2")
    LogBucketing.writeBucketed(logDf(12, 120, "p"), t1, "user_id", 4)
    LogBucketing.writeBucketed(logDf(12, 24, "q"), t2, "user_id", 4)
    spark.sql(s"UPDATE $t1 SET amount = amount + 5 WHERE user_id = 'u3'")
    withPlainPlans {
      val joined = spark.table(t1).join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"post-UPDATE bucketed join must stay shuffle-free, got:\n$plan")
      // and the update really landed
      assert(spark.table(t1)
        .filter(col("user_id") === "u3" && col("amount") % 7 === 5)
        .count() > 0)
    }
  }

  test("compaction and DELETE preserve the layout: the join stays shuffle-free") {
    ensureCatalog()
    val wh = spark.conf.get("spark.sql.catalog.graft_spj.warehouse")
    val t1 = mkTable("mnt1"); val t2 = mkTable("mnt2")
    val dir1 = s"$wh/ops/mnt1"
    // several small bucketed appends → many segments per bucket
    (0 until 3).foreach { i =>
      LogBucketing.writeBucketed(logDf(12, 60, s"w$i"), t1, "user_id", 4)
    }
    LogBucketing.writeBucketed(logDf(12, 24, "v"), t2, "user_id", 4)
    val before = spark.table(t1).count()
    // compact merges WITHIN buckets; merged segments keep their tag
    val st = Compaction.compactLog(spark, dir1, "spjc1")
    assert(st.segmentsAfter < st.segmentsBefore)
    assert(spark.table(t1).count() === before)
    // zone-classified DELETE rewrites carry the original tag through
    spark.sql(s"DELETE FROM $t1 WHERE user_id = 'u5'")
    withPlainPlans {
      val joined = spark.table(t1).join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"post-maintenance bucketed join must stay shuffle-free, got:\n$plan")
      assert(joined.filter(col("user_id") === "u5").count() === 0)
      assert(joined.count() > 0)
    }
  }

  test("conflicting bucket declarations are rejected") {
    val t = mkTable("conf1")
    LogBucketing.writeBucketed(logDf(10, 50, "c"), t, "user_id", 4)
    val e = intercept[Exception] {
      LogBucketing.writeBucketed(logDf(10, 50, "c"), t, "user_id", 8)
    }
    assert(e.getMessage.contains("bucket"))
    intercept[Exception] {
      LogBucketing.writeBucketed(logDf(10, 50, "c"), t, "sha256sum", 4)
    }
    ()
  }

  test("zone pruning still skips files inside a bucketed layout") {
    val t = mkTable("zone1")
    LogBucketing.writeBucketed(logDf(20, 200, "z"), t, "user_id", 4)
    val probe = spark.table(t).filter(col("user_id") === "u7")
      .select("user_id", "amount")
    val rows = probe.collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) == "u7"))
  }

  test("plain INSERT INTO a bucketed log keeps the layout (self-arranging write)") {
    val t1 = mkTable("auto1"); val t2 = mkTable("auto2")
    LogBucketing.writeBucketed(logDf(40, 200, "a"), t1, "user_id", 4)
    LogBucketing.writeBucketed(logDf(25, 60, "b"), t2, "user_id", 4)
    val before = segmentNames(t1).size
    // no pre-clustering, no bucketBy option — an arbitrarily-partitioned
    // INSERT must come back fully tagged: the write itself requires a
    // clustered distribution into exactly n partitions, and partition id
    // == bucket id because bucketOf IS Spark's hash partitioning bits
    logDf(40, 120, "x").repartition(13) // adversarial partitioning
      .writeTo(t1).append()
    val after = segmentNames(t1)
    assert(after.size === before + 4, s"expected one new segment per bucket, got $after")
    assert(after.forall(n => n.contains("-b")),
      s"every segment must carry its bucket tag, got $after")
    // the storage-partitioned join survives the plain insert
    withPlainPlans {
      val joined = spark.table(t1).alias("l")
        .join(spark.table(t2).alias("r"), "user_id")
        .select(col("user_id"), col("l.amount"), col("r.amount"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must stay shuffle-free after a plain insert:\n$plan")
      // and the rows are complete: 200 + 120 fact rows against 60 dims
      val want = logDf(40, 200, "a").unionByName(logDf(40, 120, "x")).alias("l")
        .join(logDf(25, 60, "b").alias("r"), "user_id")
        .select(col("user_id"), col("l.amount"), col("r.amount"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
    }
  }

  private def segmentNames(table: String): Seq[String] = {
    val wh = spark.conf.get("spark.sql.catalog.graft_spj.warehouse")
    val dir = s"$wh/ops/${table.split('.').last}"
    LimitHashLog.segments(dir).map(p => new org.apache.hadoop.fs.Path(p._1).getName)
  }
}
