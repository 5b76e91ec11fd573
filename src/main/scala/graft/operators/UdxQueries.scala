package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextFns, Udx}

/** Queries exercising the user-extension tiers (SURVEY.md §2.2 UDF/UDAF
  * row): typed Aggregator, codegen'd Catalyst Expression, plain udf. */
object UdxQueries {

  /** UDAF: quantity-weighted mean price per return flag via the
    * WeightedMean Aggregator (fixed-point exact, merge-order-free). */
  def u01_udaf_weighted_mean(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(Udx.WeightedMean.toColumn.name("wmean"))
      .toDF("l_returnflag", "wmean_price")
      .orderBy(col("l_returnflag"))
  }

  /** Custom codegen Expression: FNV-1a 64 content hash. Oracle-checked:
    * the normalized input is pure ASCII ([a-z0-9 ]), so DuckDB can fold
    * FNV-1a per character with HUGEINT mod-2^64 arithmetic and match the
    * JVM's wrapping long multiply bit-for-bit (UdxSpec additionally
    * checks the codegen path against the reference implementation). */
  def u02_custom_expr_fnv(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("_norm", TextFns.normalized(col("text")))
      .select(col("doc_id"), Udx.graft_fnv64(col("_norm")).as("fnv64"))
      .orderBy(col("doc_id"))

  /** Plain Scala udf: token count, oracle-checked against the regex
    * split both engines agree on. */
  def u03_scala_udf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), Udx.tokenCountUdf(col("text")).as("n_tokens"))
      .orderBy(col("doc_id"))

  /** Typed flatMap — the Scala analogue of a UDTF (one row in, many
    * typed rows out), here sentence-splitting with ordinals. At scale
    * this is per-row generation inside the scan stage; prefer built-in
    * explode/posexplode when the logic is expressible as arrays. */
  def u04_typed_flatmap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        text.split("\\. ").iterator.zipWithIndex.map {
          case (s, i) => (id, i + 1, s)
        }
      }
      .toDF("doc_id", "idx", "sentence")
      .orderBy(col("doc_id"), col("idx"))
  }

  /** Custom mergeable SKETCH as a typed Aggregator: KMV (k-minimum
    * values) of the per-doc FNV-1a content hash, per language. The
    * sketch state (k smallest distinct hashes) is a deterministic
    * function of the input SET — merge-order/partitioning independent —
    * so unlike HLL this custom aggregate is hash-checked against DuckDB
    * (per-group ORDER BY hash LIMIT k over the same FNV fold). The
    * output is exploded to (lang, rn, h) scalar rows. */
  def u05_kmv_sketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("_norm", TextFns.normalized(col("text")))
      .select(col("lang"), Udx.graft_fnv64(col("_norm")).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new Udx.KmvSketch(8).toColumn.name("kmv"))
      .toDF("lang", "kmv")
      .select(col("lang"), posexplode(col("kmv")).as(Seq("pos", "h")))
      .select(col("lang"), (col("pos") + 1).as("rn"), col("h"))
      .orderBy(col("lang"), col("rn"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u05_kmv_sketch" -> (u05_kmv_sketch _),
    "u01_udaf_weighted_mean" -> (u01_udaf_weighted_mean _),
    "u04_typed_flatmap" -> (u04_typed_flatmap _),
    "u02_custom_expr_fnv" -> (u02_custom_expr_fnv _),
    "u03_scala_udf" -> (u03_scala_udf _))

  val oracle: Map[String, String] = Map(
    "u05_kmv_sketch" ->
      """WITH d AS (SELECT lang, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
        |f AS (
        |  SELECT lang, LIST_REDUCE(
        |    LIST_PREPEND(14695981039346656037::HUGEINT,
        |      LIST_TRANSFORM(RANGE(1, LENGTH(norm) + 1),
        |        i -> CAST(ORD(SUBSTRING(norm, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (h, b) -> (xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT))::HUGEINT
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS v FROM d),
        |s AS (SELECT DISTINCT lang,
        |  CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
        |       THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT) AS h
        |  FROM f),
        |r AS (SELECT lang, h,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h) AS rn FROM s)
        |SELECT lang, rn, h FROM r WHERE rn <= 8 ORDER BY lang, rn""".stripMargin,
    "u02_custom_expr_fnv" ->
      """WITH d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
        |f AS (
        |  SELECT doc_id, LIST_REDUCE(
        |    LIST_PREPEND(14695981039346656037::HUGEINT,
        |      LIST_TRANSFORM(RANGE(1, LENGTH(norm) + 1),
        |        i -> CAST(ORD(SUBSTRING(norm, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (h, b) -> (xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT))::HUGEINT
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS v FROM d)
        |SELECT doc_id,
        |  CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
        |       THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT) AS fnv64
        |FROM f ORDER BY doc_id""".stripMargin,
    "u01_udaf_weighted_mean" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(9,2)) * CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS wmean_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "u03_scala_udf" ->
      """SELECT doc_id,
        |  LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS n_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "u04_typed_flatmap" ->
      """WITH d AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(text, '\. ') AS arr FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS idx, arr[i] AS sentence
        |FROM d, UNNEST(RANGE(1, LEN(arr) + 1)) AS t(i)
        |ORDER BY doc_id, idx""".stripMargin)
}
