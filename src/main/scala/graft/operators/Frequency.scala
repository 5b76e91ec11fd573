package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.FreqAggs
import Exact._

/** Bounded-cardinality / frequency / sampling operators — the
  * ClickHouse `uniqUpTo`, `topK`, `minMap`/`maxMap`/`avgMap` and
  * `groupArraySample` surface (reference behavior anchor: the corpus
  * count-verification reads, `hashes_test.go:141-150`, generalized to
  * the cardinality-report family a batch-analytics user runs on the
  * ingested table).
  *
  * Family-wide 100 TB stance: every query is ONE partial-aggregatable
  * hash aggregation (or one bounded per-group heap) — state per group
  * is capped by construction ([[graft.functions.UniqUpTo]] /
  * [[graft.functions.SpaceSavingTopK]] buffers, `topKPerGroup` heaps),
  * never proportional to group size, so a hot key costs a few KB per
  * task regardless of corpus scale.
  */
object Frequency {

  /** ClickHouse `uniqUpTo(N)`: exact distinct count saturating at
    * N + 1, per group — "does this order use more than 4 suppliers /
    * more than 2 ship modes?" without unbounded distinct state. The
    * whole query is one hash-agg shuffle; each group's buffer holds at
    * most N + 1 values however many rows the group has. */
  def q65_uniq_upto(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        FreqAggs.uniqUpTo(col("l_suppkey"), 4).as("u_supp"),
        FreqAggs.uniqUpTo(col("l_partkey"), 2).as("u_part"),
        count(lit(1)).as("n_items"))
      .orderBy(col("l_orderkey"))

  /** ClickHouse `topK(k)`: per order status, the 3 most frequent order
    * priorities by SpaceSaving with 16 counters. 5 true priorities < 16
    * ⇒ the sketch is in its exact regime and the output is
    * deterministic (the DuckDB oracle is the exact frequency top-3); at
    * higher cardinality the same plan degrades gracefully to
    * bounded-error estimates instead of unbounded state —
    * FrequencySpec pins the saturating regime's guarantees. */
  def q66_topk_freq(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus"))
      .agg(FreqAggs.approxTopK(col("o_orderpriority"), 3, 16).as("tk"))
      .select(col("o_orderstatus"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("o_orderstatus"),
        (col("pos") + 1).cast(LongType).as("rank"),
        col("e.v").as("priority"),
        col("e.cnt").as("n"))
      .orderBy(col("o_orderstatus"), col("rank"))

  /** ClickHouse `minMap` / `maxMap` / `avgMap` — the q63 `sumMap`
    * machinery extended to the full map-combinator family: per user,
    * per event type, min/max/avg of the value column, reassembled into
    * the canonical sorted-entries CSV form. Same distributed shape as
    * q63: one (user, type) partial agg collapses repeated keys
    * map-side, then one in-group reassembly; avg divides the exact
    * decimal sum by the count in DOUBLE (IEEE-deterministic). */
  def q67_min_max_map(spark: SparkSession, dir: String): DataFrame = {
    val kv = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        (min(m(col("value"))) * 100).cast(LongType).as("min_c"),
        (max(m(col("value"))) * 100).cast(LongType).as("max_c"),
        (sum(m(col("value"))) * 100).cast(LongType).as("sum_c"),
        count(lit(1)).as("n"))
    kv.groupBy(col("user_id"))
      .agg(
        sort_array(collect_list(struct(
          col("event_type"), col("min_c"), col("max_c")))).as("_es"),
        sum(col("sum_c")).as("_sum_c"), sum(col("n")).as("_n"))
      .select(col("user_id"),
        concat_ws(",", transform(col("_es"), e => e.getField("event_type")))
          .as("keys_csv"),
        concat_ws(",", transform(col("_es"),
          e => e.getField("min_c").cast(StringType))).as("min_csv"),
        concat_ws(",", transform(col("_es"),
          e => e.getField("max_c").cast(StringType))).as("max_csv"),
        // per-user average rides as a DOUBLE column, not a formatted
        // string: IEEE division of identical exact operands is
        // bit-deterministic cross-engine; double→string formatting is not
        (col("_sum_c").cast(DoubleType) / lit(100.0) / col("_n")).as("avg_value"))
      .orderBy(col("user_id"))
  }

  /** Deterministic per-group sampling (the distributed, replayable
    * form of ClickHouse `groupArraySample` / reservoir sampling): each
    * row gets a pseudo-random priority from a Knuth multiplicative
    * hash of its id, and the group's sample is the k smallest
    * priorities — computed by the native bounded-heap top-k operator,
    * so no group is ever materialized or sorted whole. Deterministic ⇒
    * oracle-checkable and replayable across retries/restarts (a real
    * `rand()` sample can't be verified and changes under task retry —
    * operationally worse at scale, not just untestable). */
  def q68_group_sample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("lang"), col("doc_id"),
        pmod(col("doc_id") * lit(2654435761L), lit(4294967296L)).as("prio"))
    graft.plans.TopKPerGroup.topKPerGroup(docs,
        Seq(col("lang")), Seq(col("prio").asc, col("doc_id").asc), 3)
      .select(col("lang"), col("doc_id"), col("prio"))
      .orderBy(col("lang"), col("prio"), col("doc_id"))
  }

  /** ClickHouse `topKWeighted`: top-3 order priorities by REVENUE (sum
    * of total price, exact cents) per order status — the
    * "which keys carry the money/bytes/traffic" form of heavy hitters.
    * Same exact-regime argument as q66 (5 priorities < 16 counters);
    * weights ride the proven decimal-cents path so the sums hash-match
    * the oracle. */
  def q75_topk_weighted(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("cents", (m(col("o_totalprice")) * 100).cast(LongType))
      .groupBy(col("o_orderstatus"))
      .agg(FreqAggs.approxTopKWeighted(col("o_orderpriority"), col("cents"), 3, 16).as("tk"))
      .select(col("o_orderstatus"), posexplode(col("tk")).as(Seq("pos", "e")))
      .select(col("o_orderstatus"),
        (col("pos") + 1).cast(LongType).as("rank"),
        col("e.v").as("priority"),
        col("e.cnt").as("cents"))
      .orderBy(col("o_orderstatus"), col("rank"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q75_topk_weighted" -> (q75_topk_weighted _),
    "q65_uniq_upto" -> (q65_uniq_upto _),
    "q66_topk_freq" -> (q66_topk_freq _),
    "q67_min_max_map" -> (q67_min_max_map _),
    "q68_group_sample" -> (q68_group_sample _))

  val oracle: Map[String, String] = Map(
    "q75_topk_weighted" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(9,2))) * 100 AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, rank, o_orderpriority AS priority, cents FROM (
        |  SELECT o_orderstatus, o_orderpriority, cents,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY cents DESC, o_orderpriority) AS rank
        |  FROM c)
        |WHERE rank <= 3 ORDER BY o_orderstatus, rank""".stripMargin,
    // uniqUpTo(N) ≡ LEAST(COUNT(DISTINCT x), N + 1) — the saturation
    // sentinel is exactly representable in plain SQL.
    "q65_uniq_upto" ->
      """SELECT l_orderkey,
        |  LEAST(COUNT(DISTINCT l_suppkey), 5) AS u_supp,
        |  LEAST(COUNT(DISTINCT l_partkey), 3) AS u_part,
        |  COUNT(*) AS n_items
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    // exact regime ⇒ the sketch's top-3 is the true frequency top-3
    // with the same (count desc, value asc) tie-break
    "q66_topk_freq" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_orderstatus, rank, o_orderpriority AS priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority, n,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY n DESC, o_orderpriority) AS rank
        |  FROM c)
        |WHERE rank <= 3 ORDER BY o_orderstatus, rank""".stripMargin,
    "q67_min_max_map" ->
      """WITH kv AS (
        |  SELECT user_id, event_type,
        |    CAST(MIN(CAST(value AS DECIMAL(9,2))) * 100 AS BIGINT) AS min_c,
        |    CAST(MAX(CAST(value AS DECIMAL(9,2))) * 100 AS BIGINT) AS max_c,
        |    CAST(SUM(CAST(value AS DECIMAL(9,2))) * 100 AS BIGINT) AS sum_c,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id,
        |  ARRAY_TO_STRING(LIST(event_type ORDER BY event_type), ',') AS keys_csv,
        |  ARRAY_TO_STRING(LIST(CAST(min_c AS VARCHAR) ORDER BY event_type), ',') AS min_csv,
        |  ARRAY_TO_STRING(LIST(CAST(max_c AS VARCHAR) ORDER BY event_type), ',') AS max_csv,
        |  CAST(SUM(sum_c) AS DOUBLE) / 100.0 / SUM(n) AS avg_value
        |FROM kv GROUP BY user_id ORDER BY user_id""".stripMargin,
    // same Knuth-hash priority arithmetic on both sides (BIGINT-safe:
    // doc_id * 2654435761 < 2^63 for any corpus id < 3.4e9; the mod
    // keeps the priority in [0, 2^32))
    "q68_group_sample" ->
      """SELECT lang, doc_id, prio FROM (
        |  SELECT lang, doc_id, prio,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |                       ORDER BY prio, doc_id) AS rn
        |  FROM (SELECT lang, doc_id,
        |          (doc_id * 2654435761) % 4294967296 AS prio
        |        FROM documents))
        |WHERE rn <= 3 ORDER BY lang, prio, doc_id""".stripMargin)
}
