package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned joins on bucketed catalog PARQUET tables
  * ([[ParquetBucketing]]): two tables bucketed on the same key join
  * WITHOUT a shuffle exchange, a GROUP BY on the key aggregates
  * exchange-free, and the layout degrades safely — one untagged file
  * (plain append, rewrite output) downgrades the scan to shuffling,
  * never to wrong co-location. */
class ParquetBucketedJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def ensureCatalog(): Unit = {
    if (spark.conf.getOption("spark.sql.catalog.graft_pqspj").isEmpty) {
      val wh = Files.createTempDirectory("graft_pqspj_wh").toString
      spark.conf.set("spark.sql.catalog.graft_pqspj", "graft.sources.LogCatalog")
      spark.conf.set("spark.sql.catalog.graft_pqspj.warehouse", wh)
    }
  }

  private def df(users: Int, rows: Int, mult: Int): DataFrame =
    spark.range(rows).select(
      concat(lit("u"), col("id") % users).as("user_id"),
      (col("id") * mult).as("amount"))

  private def mkTable(name: String): String = {
    ensureCatalog()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_pqspj.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_pqspj.lake.$name")
    spark.sql(s"""CREATE TABLE graft_pqspj.lake.$name
      (user_id STRING, amount BIGINT)""")
    s"graft_pqspj.lake.$name"
  }

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

  test("same-spec bucketed parquet join plans with no Exchange, results exact") {
    val t1 = mkTable("j1"); val t2 = mkTable("j2")
    val d1 = df(40, 400, 7); val d2 = df(25, 60, 11)
    ParquetBucketing.writeBucketed(spark, d1, t1, "user_id", 4)
    ParquetBucketing.writeBucketed(spark, d2, t2, "user_id", 4)
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

  test("GROUP BY the bucket key aggregates without an exchange") {
    val t = mkTable("agg1")
    ParquetBucketing.writeBucketed(spark, df(30, 300, 3), t, "user_id", 4)
    withPlainPlans {
      val agg = spark.table(t).groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("amount").as("total"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed GROUP BY must be exchange-free, got:\n$plan")
      val got = agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = df(30, 300, 3).groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("amount").as("total"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want)
    }
  }

  test("pushed filters still prune files inside a bucketed scan") {
    val t = mkTable("f1")
    ParquetBucketing.writeBucketed(spark, df(8, 160, 5), t, "user_id", 4)
    val probe = spark.table(t).filter(col("user_id") === "u3")
    val got = probe.agg(count(lit(1)), sum("amount")).collect()(0)
    val want = df(8, 160, 5).filter(col("user_id") === "u3")
      .agg(count(lit(1)), sum("amount")).collect()(0)
    assert(got.getLong(0) === want.getLong(0) && got.getLong(1) === want.getLong(1))
  }

  test("an untagged file downgrades to a shuffling join, results stay exact") {
    val t1 = mkTable("mix1"); val t2 = mkTable("mix2")
    ParquetBucketing.writeBucketed(spark, df(20, 200, 7), t1, "user_id", 4)
    ParquetBucketing.writeBucketed(spark, df(20, 50, 11), t2, "user_id", 4)
    // a FOREIGN writer (bypassing the catalog — catalog inserts now
    // self-arrange) lands an untagged part-* file
    val wh1 = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    spark.sql("SELECT 'u3' AS user_id, CAST(777777 AS BIGINT) AS amount")
      .write.mode("append").parquet(s"$wh1/lake/mix1/data")
    withPlainPlans {
      val joined = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"),
        s"mixed-layout join must fall back to shuffling, got:\n$plan")
      assert(joined.filter(col("l.amount") === 777777).count() > 0)
    }
  }

  test("plain INSERT INTO a bucketed table self-arranges: tagged files, no downgrade") {
    val t1 = mkTable("sa1"); val t2 = mkTable("sa2")
    ParquetBucketing.writeBucketed(spark, df(20, 200, 7), t1, "user_id", 4)
    ParquetBucketing.writeBucketed(spark, df(20, 50, 11), t2, "user_id", 4)
    // adversarially-partitioned inserts through BOTH SQL and writeTo —
    // the write's RequiresDistributionAndOrdering re-clusters them
    spark.sql(s"INSERT INTO $t1 VALUES ('u3', 777777), ('u7', 888888)")
    df(20, 30, 13).repartition(7, col("amount")).writeTo(t1).append()
    val wh = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    val data = new org.apache.hadoop.fs.Path(s"$wh/lake/sa1/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names = fs.listStatus(data).map(_.getPath.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
    assert(names.forall(n => ParquetBucketing.bucketOfName(n).isDefined),
      s"every file must carry a bucket tag: ${names.mkString(",")}")
    withPlainPlans {
      val joined = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"self-arranged inserts must keep the join shuffle-free, got:\n$plan")
      assert(joined.filter(col("l.amount") === 777777).count() > 0)
    }
    // rows landed in the CORRECT buckets: per-bucket scan of the tag
    // namespace agrees with the layout hash
    val expect = df(20, 200, 7).union(
        spark.sql("SELECT 'u3' AS user_id, CAST(777777 AS BIGINT) UNION ALL " +
          "SELECT 'u7', CAST(888888 AS BIGINT)"))
      .union(df(20, 30, 13))
      .groupBy("user_id").agg(sum("amount").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = spark.table(t1).groupBy("user_id").agg(sum("amount").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("REPLACE WHERE lands a tagged payload: the backfill never erodes the layout") {
    val t1 = mkTable("rw1"); val t2 = mkTable("rw2")
    ParquetBucketing.writeBucketed(spark, df(20, 200, 7), t1, "user_id", 4)
    ParquetBucketing.writeBucketed(spark, df(20, 50, 11), t2, "user_id", 4)
    // re-derive one user's slice with corrected amounts, land atomically
    df(20, 200, 7).filter(col("user_id") === "u3")
      .select(col("user_id"), (col("amount") * 2 + 1).as("amount"))
      .writeTo(t1).overwrite(col("user_id") === "u3")
    val wh = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    val data = new org.apache.hadoop.fs.Path(s"$wh/lake/rw1/data")
    val fs = data.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live: Set[String] = {
      val dir = s"$wh/lake/rw1"
      if (ParquetVersions.enabled(dir)) ParquetVersions.live(dir).toSet
      else fs.listStatus(data).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith(".") && !n.startsWith("_"))
        .toSet
    }
    assert(live.forall(n => ParquetBucketing.bucketOfName(n).isDefined),
      s"backfill must not erode the layout: ${live.mkString(",")}")
    withPlainPlans {
      val joined = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"post-backfill join must stay shuffle-free, got:\n$plan")
    }
    val expect = df(20, 200, 7).filter(col("user_id") =!= "u3")
      .union(df(20, 200, 7).filter(col("user_id") === "u3")
        .select(col("user_id"), (col("amount") * 2 + 1).as("amount")))
      .groupBy("user_id").agg(sum("amount").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = spark.table(t1).groupBy("user_id").agg(sum("amount").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("conflicting bucket re-declaration is rejected") {
    val t = mkTable("c1")
    ParquetBucketing.writeBucketed(spark, df(5, 50, 2), t, "user_id", 4)
    val err = intercept[IllegalArgumentException] {
      ParquetBucketing.writeBucketed(spark, df(5, 50, 2), t, "user_id", 8)
    }
    assert(err.getMessage.contains("already bucketed"))
  }

  test("compaction, DELETE and UPDATE all preserve the bucketed layout") {
    ensureCatalog()
    val wh = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    val t1 = mkTable("mnt1"); val t2 = mkTable("mnt2")
    // several small bucketed appends → many files per bucket
    (0 until 3).foreach { _ =>
      ParquetBucketing.writeBucketed(spark, df(12, 60, 7), t1, "user_id", 4)
    }
    ParquetBucketing.writeBucketed(spark, df(12, 24, 11), t2, "user_id", 4)
    val before = spark.table(t1).count()
    // compact merges WITHIN buckets; merged files keep their -b<k> tag
    val st = Compaction.compactTable(spark, s"$wh/lake/mnt1", targetBytes = 1L << 30)
    assert(st.filesAfter === 4L, s"expected one file per bucket, got ${st.filesAfter}")
    assert(spark.table(t1).count() === before)
    // footer-classified DELETE rewrites per bucket; survivors keep tags
    spark.sql(s"DELETE FROM $t1 WHERE amount > 1000")
    // row-level UPDATE rewrites come back tagged too (writer-computed)
    spark.sql(s"UPDATE $t1 SET amount = amount + 1 WHERE user_id = 'u3'")
    withPlainPlans {
      val joined = spark.table(t1).join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"post-maintenance bucketed join must stay shuffle-free, got:\n$plan")
      assert(joined.filter(col("user_id") === "u3").count() > 0)
    }
    // and the data is still right: mirror the maintenance on the raw df
    val raw = (0 until 3).map(_ => df(12, 60, 7)).reduce(_ union _)
      .filter(col("amount") <= 1000)
      .withColumn("amount", when(col("user_id") === "u3",
        col("amount") + 1).otherwise(col("amount")))
    val got = spark.table(t1).groupBy("user_id").agg(sum("amount").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = raw.groupBy("user_id").agg(sum("amount").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === want)
  }

  test("bucketed layout composes with versioning: time travel stays exact") {
    val t = mkTable("v1")
    ensureCatalog()
    val wh = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    val tableDir = s"$wh/lake/v1"
    ParquetBucketing.writeBucketed(spark, df(10, 100, 3), t, "user_id", 4)
    ParquetVersions.enable(tableDir)
    spark.sql(s"DELETE FROM $t WHERE amount % 2 = 1") // group rewrite, untagged outputs
    val v1 = spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0)
    assert(v1 === 100L)
    assert(spark.table(t).count() < 100L)
  }

  test("rebucket_table repairs a downgraded layout: joins go shuffle-free again") {
    val t1 = mkTable("fix1"); val t2 = mkTable("fix2")
    ParquetBucketing.writeBucketed(spark, df(20, 200, 7), t1, "user_id", 4)
    ParquetBucketing.writeBucketed(spark, df(20, 50, 11), t2, "user_id", 4)
    // two FOREIGN appends (bypassing the catalog — catalog inserts now
    // self-arrange into tagged files) → mixed layout
    val wh = spark.conf.get("spark.sql.catalog.graft_pqspj.warehouse")
    spark.sql("SELECT 'u3' AS user_id, CAST(777777 AS BIGINT) AS amount")
      .write.mode("append").parquet(s"$wh/lake/fix1/data")
    df(20, 30, 13).write.mode("append").parquet(s"$wh/lake/fix1/data")
    spark.sql("CALL graft_pqspj.system.enable_versioning(table => 'lake.fix1')")
    val expected = spark.table(t1).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    withPlainPlans {
      val before = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      assert(before.queryExecution.executedPlan.toString.contains("Exchange"))
    }
    val res = spark.sql("CALL graft_pqspj.system.rebucket_table(table => 'lake.fix1')")
      .collect()(0)
    assert(res.getLong(0) > 0L)  // files_retagged
    assert(res.getLong(1) === 31L) // rows rewritten = only the untagged ones
    // content identical, layout restored, join exchange-free
    val after = spark.table(t1).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted
    assert(after === expected)
    withPlainPlans {
      val joined = spark.table(t1).alias("l").join(spark.table(t2), "user_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"repaired layout must join shuffle-free, got:\n$plan")
      assert(joined.filter(col("l.amount") === 777777).count() > 0)
    }
    // idempotent: nothing left to retag
    val again = spark.sql("CALL graft_pqspj.system.rebucket_table(table => 'lake.fix1')")
      .collect()(0)
    assert(again.getLong(0) === 0L)
  }
}
