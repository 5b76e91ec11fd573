package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import Exact._

/** Scalar-function surface: string, date, hash, JSON, conditional, math,
  * and array functions — all `org.apache.spark.sql.functions` built-ins
  * (codegen'd, no UDFs), each with a DuckDB oracle mirror.
  *
  * The sha256 query is the lineage of the reference's `sha256sum` column
  * (`hashes.go:25`, `hashes_test.go:196`): there the hash was computed
  * upstream in a private repo; here it is a first-class engine function.
  *
  * Cross-engine gotchas handled: DuckDB `floor` returns DOUBLE (Spark:
  * BIGINT) → explicit casts; DuckDB `date_trunc` on DATE returns DATE
  * (Spark: TIMESTAMP) → cast both to DATE; transcendental fns (exp/ln)
  * are libm-dependent and NOT cross-engine deterministic → only sqrt
  * (IEEE correctly-rounded) is used.
  */
object Scalars {

  /** String functions over customer. */
  def q21_string_fns(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_upper"),
        lower(col("c_mktsegment")).as("seg_lower"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 10, 9).as("name_num"),
        concat(col("c_mktsegment"), lit("-"), col("c_name")).as("seg_name"),
        regexp_replace(col("c_name"), "Customer#0*", "C").as("name_short"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
        lpad(col("c_mktsegment"), 12, "_").as("seg_pad"))
      .orderBy(col("c_custkey"))

  /** Date/time functions over orders. */
  def q22_date_fns(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") < 50)
      .select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("odate"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        dayofyear(col("o_orderdate")).as("doy"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month_start"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType)).as("days_since"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"))
      .orderBy(col("o_orderkey"))

  /** Cryptographic hashes — the `sha256sum` capability made native. */
  def q23_hash_fns(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        sha2(col("text"), 256).as("sha256sum"),
        md5(col("text")).as("md5sum"))
      .orderBy(col("doc_id"))

  /** JSON extraction from the events.props payload. */
  def q24_json_extract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  /** Spark 4 VARIANT type: parse once into the binary semi-structured
    * format, extract typed paths with variant_get — the open-schema
    * ingestion path (vs q24's per-access string parsing with
    * get_json_object). At scale the parse happens once in the scan
    * stage and the shuffle carries the compact binary variant, not
    * JSON text; typed extraction is codegen'd. Oracle: DuckDB JSON
    * extraction agrees on the typed values. */
  def q54_variant_type(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("v", parse_json(col("props")))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"),
        sum(col("k")).as("k_sum"),
        (sum(col("k")).cast(DoubleType) / count(col("k"))).as("k_avg"))
      .orderBy(col("event_type"))

  /** VARIANT SHREDDING into parquet — the ingestion-time dual of q54:
    * hot typed paths are extracted ONCE and persisted as real parquet
    * columns next to the raw payload, so every later read gets columnar
    * scans, min/max pruning, and predicate pushdown on the shredded
    * path with zero JSON parsing (q54 pays the parse per query; this
    * pays it once at write). The read side proves it: the aggregation
    * below reads only (event_type, k) — the raw column isn't in
    * ReadSchema and the k >= 50 predicate reaches PushedFilters
    * (ScalarsShredSpec asserts both). At 100 TB the shred pass is the
    * standard "promote hot JSON paths" compaction job, and the raw
    * column rides along for late re-shredding of new paths. */
  def q69_variant_shred(spark: SparkSession, dir: String): DataFrame = {
    val shredDir = java.nio.file.Files.createTempDirectory("graft_shred").toString
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "bigint").as("k"),
        col("props").as("raw"))
      .write.mode("overwrite").parquet(shredDir)
    spark.read.parquet(shredDir)
      .filter(col("k") >= 50)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
      .orderBy(col("event_type"))
  }

  /** Event-time tumbling windows (batch form; the streaming form with a
    * watermark lives in graft.streaming). Output timestamps are cast to
    * NTZ so both engines emit naive microsecond timestamps. */
  def q25_event_windows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).cast(TimestampNTZType).as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("value_sum"),
        (dsum(col("value")) / count(lit(1))).as("value_avg"))
      .orderBy(col("window_start"), col("event_type"))

  /** CASE WHEN bucketing + aggregation. */
  def q26_case_expr(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("bucket",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "mid")
          .otherwise("large"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("price_sum"))
      .orderBy(col("bucket"))

  /** Math functions (only cross-engine-deterministic ones: sqrt is IEEE
    * correctly-rounded; exp/ln/pow are libm-dependent and excluded). */
  def q27_math_fns(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") < 100)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        sqrt(col("l_quantity")).as("sqrt_qty"),
        floor(col("l_extendedprice") / 1000).as("price_k_floor"),
        ceil(col("l_extendedprice") / 1000).as("price_k_ceil"),
        (col("l_orderkey") % 7).as("key_mod"),
        (col("l_quantity") * col("l_quantity")).as("qty_sq"),
        abs(col("l_discount") - 0.05).as("abs_disc"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Array functions over the embedding column. The squared-norm is a
    * per-row sequential left fold in double (`aggregate` higher-order
    * function) — DuckDB's `list_reduce` folds in the same order, so the
    * doubles are bit-identical. No explode, no shuffle: at 100 TB this
    * stays embarrassingly parallel inside the scan stage. */
  def q28_array_fns(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast(DoubleType).as("e0"),
        size(col("embedding")).as("dim"),
        expr("aggregate(embedding, CAST(0 AS DOUBLE), " +
          "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("norm2"),
        array_min(col("embedding")).cast(DoubleType).as("emb_min"),
        array_max(col("embedding")).cast(DoubleType).as("emb_max"))
      .orderBy(col("vec_id"))

  /** The SQL surface itself: corpus tables registered as views, the
    * query text executed verbatim by `spark.sql` — and the oracle is the
    * very same string (both engines speak the shared ANSI subset). */
  val sqlPassthrough: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS qty_sum,
      |  MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
      |FROM lineitem
      |WHERE l_discount > 0.02
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def q30_sql_passthrough(spark: SparkSession, dir: String): DataFrame = {
    graft.sources.Schemas.registerCorpus(spark, dir)
    spark.sql(sqlPassthrough)
  }

  /** Map functions: construct, extract, enumerate keys. */
  def q36_map_fns(spark: SparkSession, dir: String): DataFrame = {
    val m = map(lit("lang"), col("lang"), lit("src"), col("source"))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(m, "lang").as("lang_val"),
        size(m).as("n_keys"),
        concat_ws(",", map_keys(m)).as("keys_csv"),
        concat_ws(",", map_values(m)).as("vals_csv"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_sql_passthrough" -> (q30_sql_passthrough _),
    "q36_map_fns" -> (q36_map_fns _),
    "q21_string_fns" -> (q21_string_fns _),
    "q22_date_fns" -> (q22_date_fns _),
    "q23_hash_fns" -> (q23_hash_fns _),
    "q24_json_extract" -> (q24_json_extract _),
    "q54_variant_type" -> (q54_variant_type _),
    "q69_variant_shred" -> (q69_variant_shred _),
    "q25_event_windows" -> (q25_event_windows _),
    "q26_case_expr" -> (q26_case_expr _),
    "q27_math_fns" -> (q27_math_fns _),
    "q28_array_fns" -> (q28_array_fns _))

  val oracle: Map[String, String] = Map(
    "q30_sql_passthrough" -> sqlPassthrough,
    "q36_map_fns" ->
      """SELECT doc_id,
        |  (MAP {'lang': lang, 'src': source}['lang'])[1] AS lang_val,
        |  CAST(CARDINALITY(MAP {'lang': lang, 'src': source}) AS INT) AS n_keys,
        |  ARRAY_TO_STRING(MAP_KEYS(MAP {'lang': lang, 'src': source}), ',') AS keys_csv,
        |  ARRAY_TO_STRING(MAP_VALUES(MAP {'lang': lang, 'src': source}), ',') AS vals_csv
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q21_string_fns" ->
      """SELECT c_custkey,
        |  UPPER(c_name) AS name_upper,
        |  LOWER(c_mktsegment) AS seg_lower,
        |  LENGTH(c_name) AS name_len,
        |  SUBSTRING(c_name, 10, 9) AS name_num,
        |  c_mktsegment || '-' || c_name AS seg_name,
        |  REGEXP_REPLACE(c_name, 'Customer#0*', 'C') AS name_short,
        |  REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
        |  LPAD(c_mktsegment, 12, '_') AS seg_pad
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q22_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS odate,
        |  YEAR(o_orderdate) AS y,
        |  MONTH(o_orderdate) AS mo,
        |  DAYOFMONTH(o_orderdate) AS d,
        |  QUARTER(o_orderdate) AS q,
        |  DAYOFYEAR(o_orderdate) AS doy,
        |  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
        |  LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end,
        |  DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30
        |FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""".stripMargin,
    "q23_hash_fns" ->
      """SELECT doc_id, SHA256(text) AS sha256sum, MD5(text) AS md5sum
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q69_variant_shred" ->
      """SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS k_sum
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |WHERE k >= 50
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q54_variant_type" ->
      """SELECT event_type,
        |  CAST(COUNT(k) AS BIGINT) AS n_k,
        |  CAST(SUM(k) AS BIGINT) AS k_sum,
        |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_avg
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q24_json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q25_event_windows" ->
      s"""SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
         |  COUNT(*) AS n, ${sqlDsum("value")} AS value_sum,
         |  ${sqlDsum("value")} / COUNT(*) AS value_avg
         |FROM events GROUP BY window_start, event_type
         |ORDER BY window_start, event_type""".stripMargin,
    "q26_case_expr" ->
      s"""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
         |            WHEN o_totalprice < 200000 THEN 'mid'
         |            ELSE 'large' END AS bucket,
         |  COUNT(*) AS n, ${sqlDsum("o_totalprice")} AS price_sum
         |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q27_math_fns" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  SQRT(l_quantity) AS sqrt_qty,
        |  CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  l_orderkey % 7 AS key_mod,
        |  l_quantity * l_quantity AS qty_sq,
        |  ABS(l_discount - 0.05) AS abs_disc
        |FROM lineitem WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q28_array_fns" ->
      """SELECT vec_id,
        |  CAST(embedding[1] AS DOUBLE) AS e0,
        |  CAST(LEN(embedding) AS INT) AS dim,
        |  LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE),
        |    LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
        |    (acc, x) -> acc + x) AS norm2,
        |  CAST(LIST_AGGREGATE(embedding, 'min') AS DOUBLE) AS emb_min,
        |  CAST(LIST_AGGREGATE(embedding, 'max') AS DOUBLE) AS emb_max
        |FROM embeddings WHERE vec_id < 100 ORDER BY vec_id""".stripMargin)
}
