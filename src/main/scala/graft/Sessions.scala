package graft

import org.apache.spark.sql.SparkSession

/** Single place all mains/tests get their SparkSession config, so the
  * oracle-parity knobs (UTC, nanos-as-long, AQE) are identical everywhere.
  *
  * Scale posture: `shuffle.partitions` defaults to the local core count;
  * on a real cluster this is overridden by AQE coalescing
  * (`spark.sql.adaptive.coalescePartitions.enabled` is on by default in
  * Spark 4) so the same code runs at 100 TB without retuning here.
  */
object Sessions {
  def base(master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
           shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt)
      : SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // explicit 100 TB posture (defaults drift across versions):
      // AQE splits skewed join partitions at runtime; runtime bloom
      // filters inject a semi-join reduction on the big side of a
      // shuffle join when the other side is selective — e.g. the
      // candidate-pair → signature attach joins in the dedup family
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // storage-partitioned joins: two logs bucketed on the same key
      // (sources/LogBucketing) join without a shuffle exchange;
      // pushPartValues keeps SPJ valid when one side is missing buckets
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      // InferFiltersFromGenerate duplicates the generator's child
      // expression into a pushed-down Filter (`size(expr) > 0`). For
      // STORED array columns that prunes empty rows cheaply; every
      // array this engine explodes is COMPUTED per row (shingles, gram
      // sets, LSH buckets, chunk windows), so the inferred filter
      // re-runs the whole producing chain — with HOF lambdas referencing
      // pre-materialization inputs, i.e. per-element re-evaluation:
      // measured 10x on word-5-gram explode at sf0.1 (NOTES_r4).
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      // ungrouped COUNT/MIN/MAX over parquet answered from row-group
      // footers instead of scanning pages — the file-source twin of the
      // log connector's sidecar-served aggregates
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // partition-dir listing: Spark launches a DISTRIBUTED listing job
      // once a level holds >32 dirs — a ~150 ms scheduling round-trip
      // paid on EVERY plan of a table with a few dozen partitions
      // (every month-partitioned table here). Driver-side listStatus
      // handles hundreds of dirs in single-digit ms on HDFS-likes;
      // beyond ~512 dirs the distributed listing genuinely wins
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      // fork-free local-FS permissions ([[graft.sources.NioLocalFileSystem]]):
      // without libhadoop, Hadoop FORKS a `chmod` process on every local
      // file create/mkdir — one fork per data file, ledger manifest,
      // checkpoint entry and state-store delta. These drop-in classes
      // apply the same bits via one NIO syscall; `file://` scheme only,
      // both API families (FileSystem and FileContext)
      .config("spark.hadoop.fs.file.impl",
        "graft.sources.NioLocalFileSystem")
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.sources.NioLocalFs")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // engine functions exposed on the SQL surface too
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnv64", exprs => graft.functions.Udx.Fnv64Expr(exprs.head), "scala_udf")
    // native operator strategies + optimizer rules: every engine
    // session executes row_number()<=k windows via the bounded-heap
    // operator and can plan the native as-of join
    graft.plans.TopKPerGroup.register(spark)
    graft.plans.AsOfJoin.register(spark)
    // merge-on-read UPDATE interception (mask+append instead of the
    // group rewrite when spark.graft.delete.mode opts in)
    graft.sources.ParquetMoRUpdate.register(spark)
    // merge-on-read MERGE INTO interception (p32)
    graft.sources.ParquetMoRMerge.register(spark)
    // log-tier merge-on-read UPDATE interception (p37)
    graft.sources.LogMoRUpdate.register(spark)
    // log-tier merge-on-read MERGE INTO interception (p38)
    graft.sources.LogMoRMerge.register(spark)
    // warehouse dialect: jdbc:clickhouse URLs get exact type widening,
    // backtick quoting, and ClickHouse DDL types (sources/ClickHouseDialect)
    graft.sources.ClickHouseDialect.register()
    spark
  }
}
