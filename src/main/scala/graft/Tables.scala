package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Central schema registry + table readers for the engine.
  *
  * Design notes (100 TB posture):
  *   - Parquet is self-describing, so batch reads use the footer schema
  *     directly (no `inferSchema` scans). The explicit [[StructType]]s
  *     below exist for (a) Structured Streaming sources, which require a
  *     user-supplied schema, (b) the `limits_hashes` ingest table whose
  *     DDL the reference never shipped (reference `migrations/embed.go:1`
  *     is empty; columns recovered from `hashes.go:25` and
  *     `hashes_test.go:192-196`), and (c) schema assertions in tests.
  *   - Every reader selects through the declared column set so that
  *     column pruning reaches the scan (`ReadSchema` in explain) even if
  *     a future producer widens the files.
  *   - No partitioning assumptions are baked in: at 100 TB these tables
  *     would be directory-partitioned (e.g. lineitem by ship month) and
  *     `spark.read.parquet(dir)` + partition pruning picks that up with
  *     zero code change here.
  */
object Tables {

  /** Spark schema of the reference's streamed entity.
    * `UInt32 amount` widened to LongType (Spark has no unsigned ints) —
    * reference fields recovered in SURVEY.md §1.1 / FIXTURES.md A.1. */
  val limitsHashes: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("amount", LongType, nullable = false),
    StructField("msg", BinaryType, nullable = true),
    StructField("sha256sum", StringType, nullable = false)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType), StructField("r_name", StringType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType), StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType), StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType), StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType), StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType), StructField("p_name", StringType),
    StructField("p_brand", StringType), StructField("p_type", StringType),
    StructField("p_size", IntegerType), StructField("p_retailprice", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType), StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType), StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType), StructField("o_orderpriority", StringType)))

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType), StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType), StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType), StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType), StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType), StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val all: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Batch read of one corpus table. Footer schema is authoritative. */
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** `events.ts` normalization — the generator has shipped it as
    * TIMESTAMP(NANOS) (which Spark's vectorized reader rejects; Sessions
    * set `spark.sql.legacy.parquet.nanosAsLong=true`, see
    * [[Sessions.base]], so it arrives as LongType nanos and we truncate
    * to micros — exactly DuckDB's ns→µs cast) and as TIMESTAMP_NTZ
    * micros. Either way the engine-facing column is a session-UTC
    * TIMESTAMP: the NTZ→LTZ cast interprets the naive value in the
    * session zone (UTC everywhere here), so `unix_micros(ts)` agrees
    * bit-for-bit with the oracle's `epoch_us(ts)` on the naive value. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = read(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
