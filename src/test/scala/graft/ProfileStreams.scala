package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DecimalType, LongType, StringType}

/** Scratch phase profiler for the s19/s21 constant-factor work (VERDICT
  * r12 #7) — test scope only, never shipped. Reproduces each pipeline
  * with nanoTime around its phases so the per-trigger / per-epoch cost
  * split (setup vs stream startup vs maintain vs probe) is measured,
  * not guessed. Run: `sbt "Test/runMain graft.ProfileStreams"`. */
object ProfileStreams {

  private def catalogFor(spark: org.apache.spark.sql.SparkSession,
      tag: String, ns: String): Unit = {
    val cat = s"graft_$tag"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft_lhcat_$tag").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LogCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    ()
  }

  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.base()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // per-trigger duration breakdown (queryPlanning / addBatch / WAL /
    // offset polling), the numbers the optimization has to move
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        println(s"PROF-TRIG batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=${p.durationMs}")
      }
    })
    // per-stage wall/CPU split — driver gaps vs executor time
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val wall = for {
          a <- i.submissionTime; b <- i.completionTime
        } yield b - a
        println(s"PROF-STAGE id=${i.stageId} tasks=${i.numTasks} " +
          s"wall=${wall.getOrElse(-1L)}ms name=${i.name.takeWhile(_ != '\n').take(60)}")
      }
    })
    // warm-up: JVM + codegen + parquet reader paths
    spark.read.parquet(s"$dir/orders.parquet").count()

    val which = if (args.isEmpty) Set("s19", "s21") else args.toSet
    if (which("s19")) {
      println("=== s19 (CdcMatView) phases ===")
      profileS19(spark, dir)
    }
    if (which("s21")) {
      println("=== s21 (partitioned sink) phases ===")
      profileS21(spark, dir)
    }
    if (which("p32")) {
      println("=== p32 (MoR MERGE) phases ===")
      profileP32(spark, dir)
    }
    if (which("p38")) {
      println("=== p38 (log MoR MERGE) phases ===")
      profileP38(spark, dir)
    }
    spark.stop()
  }

  private def profileS19(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    import graft.sources.{LimitHashLog, LogDelete, LogVersions}
    val logDir = java.nio.file.Files.createTempDirectory("prof_s19").toString
    val ck = java.nio.file.Files.createTempDirectory("prof_s19_ck").toString
    val viewDir = java.nio.file.Files.createTempDirectory("prof_s19_v").toString + "/view"
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").cast(LongType).as("okey"),
      concat(lit("u"), col("o_custkey") % 97).as("user_id"),
      (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
      lit(null).cast(BinaryType).as("msg"),
      sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
    def writeThird(parity: Int): Unit =
      base.filter(col("okey") % 3 === parity).drop("okey")
        .repartition(4)
        .write.format(LimitHashLog.FORMAT).mode("append").save(logDir)
    t("write v0")(writeThird(0))
    t("enable")(LogVersions.enable(logDir))
    val view = new graft.streaming.CdcMatView(viewDir)
    t("seed")(view.seed(spark.read.format(LimitHashLog.FORMAT)
      .option("versionAsOf", "1").load(logDir)))
    def run(tag: String): Unit = t(s"stream run $tag") {
      val q = spark.readStream.format(LimitHashLog.FORMAT)
        .option("changeFeed", "true").option("startVersion", "1").load(logDir)
        .writeStream
        .option("checkpointLocation", ck)
        .foreachBatch((b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) => t(s"  maintain($id)")(view.maintain(b.toDF(), id)))
        .start()
      t(s"  processAll $tag")(q.processAllAvailable())
      q.stop()
    }
    t("write v2")(writeThird(1))
    run("1")
    t("write v3")(writeThird(2))
    t("delete u7")(LogDelete.deleteWhere(spark, logDir,
      Array(org.apache.spark.sql.sources.EqualTo("user_id", "u7"))))
    run("2")
    t("final read")(view.read(spark)
      .select(col("user_id"), col("n"), col("cents"))
      .orderBy(col("user_id")).collect())
    ()
  }

  private def profileP32(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    catalogFor(spark, "pp32", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_pp32.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("pp32_base")
    t("ctas")(spark.sql(
      "CREATE TABLE graft_pp32.lake.orders_pq AS SELECT * FROM pp32_base"))
    val tableDir = spark.conf.get("spark.sql.catalog.graft_pp32.warehouse") +
      "/lake/orders_pq"
    t("enable")(graft.sources.ParquetVersions.enable(tableDir))
    spark.sql("""SELECT o_orderkey AS k, bucket, cents FROM pp32_base
                 WHERE o_orderkey % 29 = 5
                 UNION ALL
                 SELECT o_orderkey + 100000000 AS k, bucket, cents
                 FROM pp32_base WHERE o_orderkey % 31 = 2""")
      .createOrReplaceTempView("pp32_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      t("merge")(spark.sql("""MERGE INTO graft_pp32.lake.orders_pq t USING pp32_cdc s
                   ON t.o_orderkey = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET cents = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (o_orderkey, bucket, cents)
                     VALUES (s.k, s.bucket, s.cents)"""))
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    t("probe straddle")(spark.sql(
      """SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
         FROM graft_pp32.lake.orders_pq VERSION AS OF 1
         UNION ALL
         SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
         FROM graft_pp32.lake.orders_pq
         ORDER BY snap""").collect())
    t("probe warm")(spark.sql(
      """SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
         FROM graft_pp32.lake.orders_pq VERSION AS OF 1
         UNION ALL
         SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
         FROM graft_pp32.lake.orders_pq
         ORDER BY snap""").collect())
    ()
  }

  private def profileP38(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    catalogFor(spark, "pp38", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_pp38.ops.limits")
    spark.sql("""CREATE TABLE graft_pp38.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"))
      .createOrReplaceTempView("pp38_base")
    t("load")(spark.sql("""INSERT INTO graft_pp38.ops.limits
                 SELECT user_id, amount, CAST(NULL AS BINARY),
                        sha2(CAST(okey AS STRING), 256)
                 FROM pp38_base"""))
    val tableDir = spark.conf.get("spark.sql.catalog.graft_pp38.warehouse") +
      "/ops/limits"
    t("enable")(graft.sources.LogVersions.enable(tableDir))
    spark.sql("""SELECT sha2(CAST(okey AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM pp38_base WHERE okey % 29 = 5
                 UNION ALL
                 SELECT sha2(CAST(okey + 100000000 AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM pp38_base WHERE okey % 31 = 2""")
      .createOrReplaceTempView("pp38_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      t("merge")(spark.sql("""MERGE INTO graft_pp38.ops.limits t USING pp38_cdc s
                   ON t.sha256sum = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET amount = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                     VALUES (s.u, s.cents, NULL, s.k)"""))
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    t("probe straddle")(spark.sql(
      """SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
         FROM graft_pp38.ops.limits VERSION AS OF 1
         UNION ALL
         SELECT 'b_cur' AS snap, count(*) AS n, sum(amount) AS cents
         FROM graft_pp38.ops.limits
         ORDER BY snap""").collect())
    t("probe warm")(spark.sql(
      """SELECT 'b_cur' AS snap, count(*) AS n, sum(amount) AS cents
         FROM graft_pp38.ops.limits""").collect())
    ()
  }

  private def profileS21(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    catalogFor(spark, "profs21", "lake")
    val ck = java.nio.file.Files.createTempDirectory("prof_s21_ck").toString
    spark.sql("DROP TABLE IF EXISTS graft_profs21.lake.src")
    spark.sql("DROP TABLE IF EXISTS graft_profs21.lake.dst")
    spark.sql("CREATE TABLE graft_profs21.lake.src (okey BIGINT, mday DATE, cents BIGINT)")
    spark.sql("""CREATE TABLE graft_profs21.lake.dst (okey BIGINT, mday DATE, cents BIGINT)
                 PARTITIONED BY (days(mday))""")
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").cast(LongType).as("okey"),
      date_trunc("month", col("o_orderdate"))
        .cast(org.apache.spark.sql.types.DateType).as("mday"),
      (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    def writeHalf(parity: Int): Unit =
      base.filter(col("okey") % 2 === parity)
        .repartition(2).writeTo("graft_profs21.lake.src").append()
    t("write src v0")(writeHalf(0))
    t("enable")(spark.sql(
      "CALL graft_profs21.system.enable_versioning(table => 'lake.src')").collect())
    // control: the SAME rows through the batch partitioned INSERT —
    // separates partitioned-write cost from streaming overhead
    spark.sql("DROP TABLE IF EXISTS graft_profs21.lake.ctl")
    spark.sql("""CREATE TABLE graft_profs21.lake.ctl (okey BIGINT, mday DATE, cents BIGINT)
                 PARTITIONED BY (days(mday))""")
    t("ctl batch insert")(spark.sql(
      """INSERT INTO graft_profs21.lake.ctl
         SELECT * FROM graft_profs21.lake.src WHERE cents % 3 = 0""").collect())
    t("ctl batch insert 2")(spark.sql(
      """INSERT INTO graft_profs21.lake.ctl
         SELECT * FROM graft_profs21.lake.src WHERE cents % 3 = 0""").collect())
    spark.sql("DROP TABLE IF EXISTS graft_profs21.lake.ctlflat")
    spark.sql("CREATE TABLE graft_profs21.lake.ctlflat (okey BIGINT, mday DATE, cents BIGINT)")
    t("ctl flat insert")(spark.sql(
      """INSERT INTO graft_profs21.lake.ctlflat
         SELECT * FROM graft_profs21.lake.src WHERE cents % 3 = 0""").collect())
    t("ctl scan+exchange only")(spark.sql(
      """SELECT * FROM graft_profs21.lake.src WHERE cents % 3 = 0
         DISTRIBUTE BY mday""").write.format("noop").mode("overwrite").save())
    // micro: raw ParquetOutputWriter open/write/close, one thread
    t("ctl 80 writers 1 thread") {
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("okey", LongType),
        org.apache.spark.sql.types.StructField("cents", LongType)))
      val job = org.apache.hadoop.mapreduce.Job.getInstance(
        classic.sessionState.newHadoopConf())
      val owf = new org.apache.spark.sql.execution.datasources.parquet
        .ParquetFileFormat().prepareWrite(classic, job, Map.empty, schema)
      val tmp = java.nio.file.Files.createTempDirectory("prof_w").toString
      import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
      import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
      val ctx = new TaskAttemptContextImpl(job.getConfiguration,
        new TaskAttemptID(new TaskID(new JobID("prof", 0), TaskType.MAP, 0), 0))
      val row = org.apache.spark.sql.catalyst.InternalRow(1L, 2L)
      var i = 0
      while (i < 80) {
        val w = owf.newInstance(s"$tmp/f$i.parquet", schema, ctx)
        var j = 0
        while (j < 300) { w.write(row); j += 1 }
        w.close()
        i += 1
      }
    }
    def run(tag: String): Unit = t(s"stream run $tag") {
      val q = spark.readStream.table("graft_profs21.lake.src")
        .filter(col("cents") % 3 === 0)
        .writeStream.option("checkpointLocation", ck)
        .toTable("graft_profs21.lake.dst")
      t(s"  processAll $tag")(q.processAllAvailable())
      q.stop()
    }
    run("1")
    t("write src v2")(writeHalf(1))
    run("2")
    t("final probe")(spark.sql(
      """SELECT mday, count(*) AS n, sum(cents) AS sum_cents
         FROM graft_profs21.lake.dst
         WHERE mday >= DATE'1993-01-01' AND mday <= DATE'1997-06-01'
         GROUP BY mday ORDER BY mday""").collect())
    t("probe warm")(spark.sql(
      """SELECT mday, count(*) AS n, sum(cents) AS sum_cents
         FROM graft_profs21.lake.dst
         WHERE mday >= DATE'1993-01-01' AND mday <= DATE'1997-06-01'
         GROUP BY mday ORDER BY mday""").collect())
    val wh = spark.conf.get("spark.sql.catalog.graft_profs21.warehouse")
    val n = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$wh/lake/dst/data"))
      .filter(p => p.toString.endsWith(".parquet")).count()
    println(s"PROF dst parquet files: $n")
    ()
  }
}
