package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Corpus curation: the selection / mixing / ordering stage of a
  * training-data pipeline — what runs AFTER hygiene (TextAnalysis) and
  * dedup (Dedup) to decide which documents a training run actually
  * sees, in what proportions, and in what order.
  *
  * Everything here is DETERMINISTIC: randomness is replaced by md5 of a
  * salted key, so reruns, retries and cross-engine oracles (DuckDB
  * computes the identical md5 hex) all agree bit-for-bit. That is not a
  * test convenience — reproducible sampling is a hard requirement for
  * training-data lineage (you must be able to state exactly which docs
  * entered a run, years later, from the recipe alone).
  *
  * Scale posture (100 TB):
  *   - c01 is a pure scan-stage filter — zero shuffles.
  *   - c02/c04 cut with the native [[graft.plans.TopKPerGroup]] heap
  *     operator (≤ k rows per group per partition cross the exchange;
  *     no sort, no full-group materialization) instead of a
  *     partition-all-rows window.
  *   - c03 packs within (lang, shard) so parallelism scales with the
  *     shard count, not the language count.
  *   - c05 is TakeOrderedAndProject (per-partition heaps, driver merge
  *     of k candidates) — never a global sort.
  *   - c06 assigns contiguous global positions with range-partition +
  *     per-partition offsets (zipWithIndex), the only scale-safe way to
  *     enumerate a sorted 100 TB corpus — a global-ORDER-BY row_number
  *     window would funnel every row through one reducer.
  *
  * Reference trigger: the reference delegates all corpus selection to
  * warehouse SQL (SURVEY §2.2 — sampling/ordering absent from its Go
  * code, `hashes.go:33-66` only batches); these are the Spark-native
  * equivalents of the SELECT ... WHERE hash < t / LIMIT k BY family a
  * ClickHouse-backed pipeline would run.
  */
object Curation {

  private val CAP = 4096L // c03 context-window size, in chars (cost proxy)

  /** Salted uniform key in [0,1) as 4 lowercase hex chars — md5 is
    * identical in Spark and DuckDB, so thresholds like `< "8000"`
    * (= rate 0.5) reproduce exactly in the oracle. */
  private def uhex(salt: String, id: Column): Column =
    substring(md5(concat(lit(salt), id.cast(StringType))), 1, 4)

  /** c01 — stratified rate sampling: per-language keep-rates applied as
    * a hash-threshold filter (en 50%, everything else 25%). Runs inside
    * the scan stage: no shuffle, no state, retry-idempotent. */
  def c01_stratified_sample(spark: SparkSession, dir: String): DataFrame = {
    val u = uhex("strat:", col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"), u.as("u_hex"))
      .where(when(col("lang") === "en", col("u_hex") < "8000")
        .otherwise(col("u_hex") < "4000"))
      .orderBy(col("doc_id"))
  }

  /** c02 — mixture rebalance to a uniform target over sources under a
    * global budget (60% of the corpus): each source contributes at most
    * floor(budget / n_sources) docs, chosen as its hash-smallest keys
    * (a deterministic uniform subsample).
    *
    * Exact-k per group with a DATA-DEPENDENT k, done scale-safe in two
    * stages: the native TopKPerGroup heap cuts every source to the
    * LARGEST cap (exact, no sort, bounded memory), then the per-source
    * caps — a handful of rows, collected as metadata — trim the ≤
    * maxCap × n_sources survivors with an exact window rank. The window
    * only ever sees the tiny residue, so the few-sources-many-rows skew
    * trap of `row_number() OVER (PARTITION BY source)` on the full
    * corpus never arises. */
  def c02_mixture_rebalance(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.TopKPerGroup.topKPerGroup
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), uhex("mix:", col("doc_id")).as("u_hex"))
    // ONE aggregate job for every cap input: per-source counts are one
    // row per source (metadata-scale), so the budget arithmetic runs on
    // the driver and re-enters the plan as a broadcast literal table
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    if (counts.isEmpty) { // empty corpus: nothing to rebalance
      return docs.select(col("doc_id"), col("source"), col("u_hex")).limit(0)
    }
    val cap = math.floor(counts.map(_._2).sum * 0.6 / counts.length).toLong
    val caps = counts.map { case (s, cnt) => (s, math.min(cap, cnt)) }.toSeq
      .toDF("source", "cap")
    // guard, don't truncate: at the 100 TB posture a per-source cap can
    // exceed Int.MaxValue and .toInt would wrap to a garbage k. The
    // heap pre-cut is an optimization — above the Int range it would be
    // an unbounded heap anyway, so skip it and let the (still exact)
    // window trim do the whole cut
    val kLong = counts.map { case (_, cnt) => math.min(cap, cnt) }.max
    val cut = if (kLong <= Int.MaxValue.toLong) {
      topKPerGroup(docs, Seq(col("source")),
        Seq(col("u_hex").asc, col("doc_id").asc), kLong.toInt)
    } else docs
    val w = Window.partitionBy(col("source")).orderBy(col("u_hex").asc, col("doc_id").asc)
    cut.withColumn("rk", row_number().over(w))
      .join(broadcast(caps), "source")
      .where(col("rk") <= col("cap"))
      .select(col("doc_id"), col("source"), col("u_hex"))
      .orderBy(col("doc_id"))
  }

  /** c03 — concat-and-split sequence packing: within (lang, shard),
    * documents are laid end-to-end in doc_id order and cut into
    * CAP-char context windows (the GPT-style pack: a doc whose span
    * crosses a window boundary is flagged, downstream splits or masks
    * it). Pure window arithmetic over a cumulative sum — one shuffle on
    * (lang, shard), and the 8-way shard keeps parallelism independent
    * of how few languages exist. */
  def c03_pack_sequences(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        pmod(col("doc_id"), lit(8L)).as("shard"))
    val w = Window.partitionBy(col("lang"), col("shard")).orderBy(col("doc_id"))
    docs.withColumn("cum", sum(col("n_chars")).over(w))
      .select(col("doc_id"), col("lang"), col("shard"), col("n_chars"),
        expr(s"(cum - n_chars) DIV $CAP").as("bin"),
        pmod(col("cum") - col("n_chars"), lit(CAP)).as("bin_offset"),
        (expr(s"(cum - 1) DIV $CAP") > expr(s"(cum - n_chars) DIV $CAP"))
          .as("spans_boundary"))
      .orderBy(col("doc_id"))
  }

  /** c04 — per-source quality quota: keep the top 20 docs per source by
    * length (quality proxy), via the NATIVE TopKPerGroup operator — the
    * `LIMIT 20 BY source` of a curation recipe. At scale the heap
    * operator ships ≤ 20 rows per source per partition through the
    * exchange; the window form would shuffle and sort every row. */
  def c04_quota_topk(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.TopKPerGroup.topKPerGroup
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"))
    topKPerGroup(docs, Seq(col("source")),
        Seq(col("n_chars").desc, col("doc_id").asc), 20)
      .orderBy(col("doc_id"))
  }

  /** c05 — fixed-size uniform sample without replacement: the 100
    * hash-smallest docs corpus-wide. Plans as TakeOrderedAndProject
    * (per-partition bounded heaps + driver merge), NOT a global sort —
    * the deterministic replacement for `ORDER BY random() LIMIT k`. */
  def c05_fixed_sample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), uhex("samp:", col("doc_id")).as("u_hex"))
      .orderBy(col("u_hex"), col("doc_id"))
      .limit(100)
      .orderBy(col("doc_id"))

  /** c06 — deterministic epoch ordering: every doc gets a contiguous
    * global position under a salted-hash shuffle order (the
    * reproducible "shuffle the corpus for epoch N" primitive).
    *
    * A `row_number() OVER (ORDER BY key)` window is a single-reducer
    * funnel; instead: range-partition on the key (so partition i holds
    * keys strictly below partition i+1), sort within partitions, then
    * zipWithIndex — which computes per-partition counts in one pass and
    * adds partition offsets in a second, both fully parallel. Exactness
    * does not depend on where the range boundaries fall. */
  def c06_epoch_order(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), uhex("epoch1:", col("doc_id")).as("u_hex"))
    val sorted = keyed
      .repartitionByRange(8, col("u_hex"), col("doc_id"))
      .sortWithinPartitions(col("u_hex"), col("doc_id"))
    sorted.select(col("doc_id"), col("u_hex")).as[(Long, String)].rdd
      .zipWithIndex
      .map { case ((id, u), pos) => (id, u, pos) }
      .toDF("doc_id", "u_hex", "pos")
      .orderBy(col("pos"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_stratified_sample" -> (c01_stratified_sample _),
    "c02_mixture_rebalance" -> (c02_mixture_rebalance _),
    "c03_pack_sequences" -> (c03_pack_sequences _),
    "c04_quota_topk" -> (c04_quota_topk _),
    "c05_fixed_sample" -> (c05_fixed_sample _),
    "c06_epoch_order" -> (c06_epoch_order _))

  val oracle: Map[String, String] = Map(
    "c01_stratified_sample" ->
      """SELECT doc_id, lang, source,
        |       substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) AS u_hex
        |FROM documents
        |WHERE CASE WHEN lang = 'en'
        |           THEN substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) < '8000'
        |           ELSE substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 4) < '4000' END
        |ORDER BY doc_id""".stripMargin,
    "c02_mixture_rebalance" ->
      """WITH keyed AS (
        |  SELECT doc_id, source,
        |         substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4) AS u_hex
        |  FROM documents),
        |caps AS (
        |  SELECT source,
        |         LEAST(CAST(FLOOR((SELECT COUNT(*) FROM documents) * 0.6 /
        |               (SELECT COUNT(DISTINCT source) FROM documents)) AS BIGINT),
        |               COUNT(*)) AS cap
        |  FROM keyed GROUP BY source),
        |ranked AS (
        |  SELECT doc_id, source, u_hex,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY u_hex, doc_id) AS rk
        |  FROM keyed)
        |SELECT r.doc_id, r.source, r.u_hex
        |FROM ranked r JOIN caps c ON r.source = c.source
        |WHERE r.rk <= c.cap
        |ORDER BY r.doc_id""".stripMargin,
    "c03_pack_sequences" ->
      s"""WITH sharded AS (
        |  SELECT doc_id, lang, n_chars, doc_id % 8 AS shard FROM documents),
        |cums AS (
        |  SELECT doc_id, lang, shard, n_chars,
        |         CAST(SUM(n_chars) OVER (PARTITION BY lang, shard ORDER BY doc_id)
        |              AS BIGINT) AS cum
        |  FROM sharded)
        |SELECT doc_id, lang, shard, n_chars,
        |       (cum - n_chars) // $CAP AS bin,
        |       (cum - n_chars) % $CAP AS bin_offset,
        |       ((cum - 1) // $CAP) > ((cum - n_chars) // $CAP) AS spans_boundary
        |FROM cums
        |ORDER BY doc_id""".stripMargin,
    "c04_quota_topk" ->
      """WITH ranked AS (
        |  SELECT doc_id, source, n_chars,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, source, n_chars FROM ranked WHERE rk <= 20
        |ORDER BY doc_id""".stripMargin,
    "c05_fixed_sample" ->
      """SELECT doc_id, lang, u_hex FROM (
        |  SELECT doc_id, lang,
        |         substr(md5('samp:' || CAST(doc_id AS VARCHAR)), 1, 4) AS u_hex
        |  FROM documents
        |  ORDER BY u_hex, doc_id
        |  LIMIT 100)
        |ORDER BY doc_id""".stripMargin,
    "c06_epoch_order" ->
      """SELECT doc_id,
        |       substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 4) AS u_hex,
        |       ROW_NUMBER() OVER (
        |         ORDER BY substr(md5('epoch1:' || CAST(doc_id AS VARCHAR)), 1, 4),
        |                  doc_id) - 1 AS pos
        |FROM documents
        |ORDER BY pos""".stripMargin)
}
