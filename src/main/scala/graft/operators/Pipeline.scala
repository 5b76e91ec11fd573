package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFns

/** End-to-end corpus-cleaning pipeline — the composed training-data
  * prep flow (quality gate → exact dedup keep-first → token accounting)
  * as ONE declarative plan, so Catalyst fuses the per-row stages into a
  * single scan pass and the only shuffles are the dedup groupBy and the
  * keep-join.
  *
  * This is the flagship "a user of the reference switches to this
  * library" demo: ingest-grade hygiene, oracle-checked.
  */
object Pipeline {

  /** One-time catalog bootstrap for the p-family queries: registers
    * `graft_<tag>` over a fresh temp warehouse on FIRST use (a repeat
    * invocation in the same session reuses the registered warehouse —
    * previously every call leaked a never-used temp dir) and ensures
    * the namespace. */
  private[operators] def catalogFor(spark: SparkSession, tag: String,
      ns: String): Unit = {
    val cat = s"graft_$tag"
    if (spark.conf.getOption(s"spark.sql.catalog.$cat").isEmpty) {
      val wh = java.nio.file.Files.createTempDirectory(s"graft_lhcat_$tag").toString
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.LogCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    }
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.$ns")
    ()
  }

  def p01_clean_corpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split(trim(col("text")), "\\s+")))
      .withColumn("letter_ratio",
        (length(col("text")) -
          length(regexp_replace(col("text"), "[a-zA-Z]", ""))).cast(DoubleType) /
          length(col("text")))
    val quality = docs.filter(col("letter_ratio") > 0.5 &&
      col("n_tokens") >= 10 && col("n_tokens") <= 1000)
    val keep = quality
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    quality.join(keep, "doc_id") // keep-first survivors
      .select(col("doc_id"), col("lang"), col("n_tokens"), col("letter_ratio"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test assignment — the split step of a
    * training-data pipeline. Keyed on the CONTENT fingerprint, not the
    * row id, for two scale-critical properties: (a) exact duplicates
    * land in the same split (no train/test contamination via dups) and
    * (b) assignment is stable across re-ingestion, repartitioning and
    * incremental appends. Bucket = first two sha256 hex nibbles
    * (0..255), thresholds 205/230 ≈ 80/10/10. Pure per-row expression:
    * zero shuffle at any corpus size (the orderBy exists only for the
    * oracle's row-order compare). */
  def p02_split_assign(spark: SparkSession, dir: String): DataFrame =
    splitAssign(Tables.documents(spark, dir))

  /** Core, corpus-independent: input needs (doc_id, text). */
  def splitAssign(docs: DataFrame): DataFrame =
    docs.withColumn("fp", sha2(col("text"), 256))
      // hex nibble → int via position in the hex alphabet: the one
      // construction that is bit-identical SQL in Spark and DuckDB
      // (conv() exists only in Spark; from_hex only in DuckDB)
      .withColumn("bucket",
        (expr("instr('0123456789abcdef', substring(fp, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(fp, 2, 1))") - 1)
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < 205, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test").as("split"))
      .orderBy(col("doc_id"))

  /** The full corpus-prep DAG as ONE declarative plan — scrub → quality
    * gate → exact dedup keep-first → content-keyed split → per-split
    * token accounting. This is the "switch to this library" demo at its
    * widest: five pipeline stages composing, everything still
    * hash-checked against DuckDB. Plan shape at 100 TB: scrub/quality/
    * fingerprint fuse into the scan stage; the only shuffles are the
    * dedup groupBy, its keep-join, and the final 3-group aggregate. */
  def p03_corpus_prep(spark: SparkSession, dir: String): DataFrame = {
    val scrubbed = TextAnalysis.scrubText(Tables.documents(spark, dir))
      .select(col("doc_id"), col("clean_text"))
    val gated = scrubbed
      .withColumn("n_tokens", size(split(trim(col("clean_text")), "\\s+")))
      .withColumn("letter_ratio",
        (length(col("clean_text")) -
          length(regexp_replace(col("clean_text"), "[a-zA-Z]", ""))).cast(DoubleType) /
          length(col("clean_text")))
      .filter(col("letter_ratio") > 0.5 &&
        col("n_tokens") >= 10 && col("n_tokens") <= 1000)
    val keep = gated
      .groupBy(sha2(col("clean_text"), 256).as("h"))
      .agg(min(col("doc_id")).as("keep_id"))
      .select(col("keep_id").as("doc_id"))
    splitAssign(gated.join(keep, "doc_id")
        .select(col("doc_id"), col("clean_text").as("text"), col("n_tokens")))
      .join(gated.select(col("doc_id"), col("n_tokens")), "doc_id")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens_sum"))
      .orderBy(col("split"))
  }

  /** Sequence packing — the "concat and chunk" batching step that turns
    * a cleaned corpus into fixed-budget training sequences: documents
    * are concatenated in a deterministic order and the token stream is
    * cut every `budget` tokens; a document spanning a cut appears in
    * both sequences with its token sub-range. Output: one row per
    * (sequence, contributing doc) with the doc-relative token span —
    * exactly what a loader needs to materialize packed sequences.
    *
    * Scale design: packing is sequential by nature, so it runs per
    * SHARD — content-keyed (sha256 high nibble, stable across
    * re-ingestion like p02's split) — and each shard packs
    * independently: one window cumsum per shard, parallelism = shard
    * count (set ≫ executor count in production), no global ordering
    * anywhere. The span arithmetic is pure integer math on the cumsum,
    * so the whole op is one shuffle (the window partitioning). */
  def p04_pack_sequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(Tables.documents(spark, dir), budget = 256)

  /** Core, corpus-independent: input needs (doc_id, text). */
  def packSequences(docs: DataFrame, budget: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .withColumn("n_tok", size(split(trim(col("text")), "\\s+")).cast(LongType))
      .withColumn("shard",
        expr("instr('0123456789abcdef', substring(sha2(text, 256), 1, 1)) - 1"))
      .withColumn("end_off", sum(col("n_tok")).over(w))
      .withColumn("start_off", col("end_off") - col("n_tok"))
      .withColumn("seq_id",
        explode(expr(s"sequence(start_off DIV $budget, (end_off - 1) DIV $budget)")))
      .select(col("shard"), col("seq_id"), col("doc_id"),
        (greatest(col("start_off"), col("seq_id") * budget) - col("start_off"))
          .as("tok_begin"),
        (least(col("end_off"), (col("seq_id") + 1) * budget) - col("start_off"))
          .as("tok_end"))
      .orderBy(col("shard"), col("seq_id"), col("doc_id"))
  }

  /** Data-mixture sampling — the pretraining mixing step: downsample
    * each language/source to its target rate (here en→50%, de→75%,
    * rest kept) DETERMINISTICALLY, keyed on the content fingerprint
    * (sha256 2-nibble bucket, the p02 construction) rather than rand():
    * exact duplicates co-sample, the decision is stable across
    * re-ingestion/repartitioning/incremental appends, and the op is a
    * pure per-row filter — zero shuffle at any corpus size. rand()-based
    * sampling has none of those properties and cannot be oracle-checked. */
  def p05_mixture_sample(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("fp", sha2(col("text"), 256))
      .withColumn("bucket",
        (expr("instr('0123456789abcdef', substring(fp, 1, 1))") - 1) * 16 +
          expr("instr('0123456789abcdef', substring(fp, 2, 1))") - 1)
      .filter(col("bucket") <
        when(col("lang") === "en", 128)
          .when(col("lang") === "de", 192)
          .otherwise(256))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy(col("doc_id"))

  /** End-to-end round trip through the custom DataSource V2 connector
    * (`sources.LimitHashLog`): derive a `limits_hashes`-shaped entity
    * log from orders, WRITE it via the staged-commit write path, READ
    * it back through the pruning/pushdown scan, and aggregate per user.
    * The oracle computes the same report straight from the orders
    * table — so the connector's encode → stage → commit → parse →
    * prune chain is hash-checked end to end, not just spec-checked.
    * Binary msg exercises the base64 path; every 5th row's NULL msg
    * the null path (neither is projected by the read, which is the
    * point — pruning means they're never decoded). */
  def p06_log_roundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.LimitHashLog
    val logDir = java.nio.file.Files.createTempDirectory("graft_lhlog_p06").toString
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        when(col("o_orderkey") % 5 === 0, lit(null).cast(BinaryType))
          .otherwise(col("o_orderstatus").cast(BinaryType)).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .write.format(LimitHashLog.FORMAT).mode("append").save(logDir)
    spark.read.format(LimitHashLog.FORMAT).load(logDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("cents"),
        countDistinct(col("sha256sum")).as("n_hashes"))
      .orderBy(col("user_id"))
  }

  /** The reference's PRIMARY verification probe — a bare `SELECT
    * COUNT(*)` over the delivered table (`hashes_test.go:227-233`) —
    * through the DSv2 catalog identifier, plus the min/max bounds the
    * stats sidecars serve. The write path records per-segment stats at
    * commit; the read path answers this whole query from METADATA
    * (`SupportsPushDownAggregates`, complete pushdown): zero segments
    * opened, zero lines parsed, at any log size. The oracle computes
    * the same numbers from the orders table the log was derived from,
    * so the metadata answer is hash-checked against ground truth. */
  def p07_log_count_pushdown(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.LimitHashLog
    // catalog instances are cached per session by name — the first
    // initialization pins the warehouse, so creation must be idempotent
    // (re-runs overwrite the table rather than colliding)
    catalogFor(spark, "p07", "ingest")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p07.ingest.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .writeTo("graft_p07.ingest.limits").overwrite(lit(true))
    spark.sql("""SELECT count(*) AS n, min(amount) AS lo, max(amount) AS hi,
                        min(user_id) AS u0, max(user_id) AS u1
                 FROM graft_p07.ingest.limits""")
  }

  /** A selective range probe through the catalog's PARQUET-managed
    * tables, which since r8 skip whole files from footer stats at
    * planning time ([[graft.sources.StatsPrunedFileIndex]]) — the
    * parquet-side analogue of the log source's zone-map pruning. The
    * table is written range-partitioned on the probe key (the layout
    * that makes skipping effective at 100 TB), and the oracle computes
    * the same report from the raw orders table, so the skipping scan
    * is hash-checked against ground truth: a file wrongly skipped or
    * wrongly kept shows up as a sum/count mismatch. */
  def p08_catalog_skip_scan(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p08", "lake")
    // parquet FileTable has no TRUNCATE capability → recreate, not overwrite
    spark.sql("DROP TABLE IF EXISTS graft_p08.lake.orders_rng")
    spark.sql("""CREATE TABLE graft_p08.lake.orders_rng
                 (o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT)""")
    Tables.orders(spark, dir)
      .select(col("o_orderkey").cast(LongType), col("o_custkey").cast(LongType),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p08.lake.orders_rng").append()
    spark.sql("""SELECT o_custkey % 10 AS bucket, count(*) AS n, sum(cents) AS total
                 FROM graft_p08.lake.orders_rng
                 WHERE o_orderkey BETWEEN 100 AND 2000
                 GROUP BY 1 ORDER BY 1""")
  }

  /** Z-order clustered write ([[Layout.zorder]]) + a conjunctive
    * two-dimensional probe through the skipping scan. The layout must
    * be RESULT-INVISIBLE (clustering only moves rows between files),
    * so the oracle computes the same aggregate from the raw orders
    * table — any row lost/duplicated by the quantile-bucket shuffle,
    * or a file wrongly skipped on either dimension, breaks the hash. */
  def p09_zorder_probe(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p09", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p09.lake.orders_z")
    spark.sql("""CREATE TABLE graft_p09.lake.orders_z
                 (o_orderkey BIGINT, o_custkey BIGINT, cents BIGINT)""")
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey").cast(LongType), col("o_custkey").cast(LongType),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    Layout.zorder(base, Seq("o_custkey", "cents"), files = 16)
      .writeTo("graft_p09.lake.orders_z").append()
    spark.sql("""SELECT count(*) AS n, sum(cents) AS total,
                        min(o_orderkey) AS k0, max(o_orderkey) AS k1
                 FROM graft_p09.lake.orders_z
                 WHERE o_custkey BETWEEN 10 AND 400
                   AND cents BETWEEN 2000000 AND 20000000""")
  }

  /** Row-level DELETE end-to-end: a log table through the catalog,
    * SQL `DELETE FROM ... WHERE` (disjunctive predicate spanning
    * metadata-dropped, rewritten, and untouched segments —
    * [[graft.sources.LogDelete]]'s three verdicts), then an aggregate
    * over the survivors. The oracle recomputes the survivors from the
    * raw orders table with the negated predicate, so a row the delete
    * missed, double-deleted, or corrupted in a rewrite breaks the
    * hash — the zone classification is verified, not trusted. */
  def p10_log_delete(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p10", "ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p10.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      // range-cluster on user_id so zone maps are selective: some
      // segments become single-user (metadata drops), most prune clean
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p10.ops.limits").overwrite(lit(true))
    spark.sql("""DELETE FROM graft_p10.ops.limits
                 WHERE user_id = 'u13' OR amount < 1000000""")
    spark.sql("""SELECT user_id, count(*) AS n, sum(amount) AS cents
                 FROM graft_p10.ops.limits GROUP BY 1 ORDER BY 1""")
  }

  /** Snapshot isolation + time travel end-to-end: a VERSIONED log table
    * ([[graft.sources.LogVersions]]), a row-level DELETE that publishes
    * a new commit ordinal instead of yanking files, and one result
    * straddling both worlds — the CURRENT view (survivors) unioned with
    * `VERSION AS OF 1` (the pre-delete snapshot, still hash-exact
    * because the delete left the pinned segments on disk). The oracle
    * recomputes both rows from the raw orders table, so a snapshot that
    * leaked the delete, or a current view that missed it, breaks the
    * hash. */
  def p11_time_travel(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p11", "ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p11.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p11.ops.limits").overwrite(lit(true))
    // v1 pins the freshly-loaded state; the DELETE publishes v2+ (on
    // re-runs in one session the ordinals keep climbing — VERSION AS OF
    // 1 stays the deterministic first load, same rows every run)
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p11.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir)
    spark.sql("DELETE FROM graft_p11.ops.limits WHERE amount < 1000000")
    spark.sql("""SELECT 'current' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p11.ops.limits
                 UNION ALL
                 SELECT 'v1' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p11.ops.limits VERSION AS OF 1
                 ORDER BY snap""")
  }

  /** MERGE-ON-READ (lightweight) DELETE on the LOG tier
    * ([[graft.sources.LogDelete]] masks + [[graft.sources.LogVersions]]
    * payload masks) — the p28 shape on the entity log, and the exact
    * ClickHouse statement the reference's tests run between cases
    * (`hashes_test.go:235-239`): two stacked DELETEs land as zone-proof
    * drops plus per-segment delete masks in one version publish each —
    * zero segment bytes rewritten — and the probe straddles them via
    * time travel. A mask that leaks rows at the wrong version,
    * over-deletes, fails to compose with the second DELETE, or a
    * metadata COUNT served from overcounting stats breaks the hash. */
  def p34_log_lightweight(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p34", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p34.ops.limits")
    spark.sql("""CREATE TABLE graft_p34.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p34.ops.limits").overwrite(lit(true))
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p34.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("DELETE FROM graft_p34.ops.limits WHERE user_id = 'u13'") // v2
      spark.sql("DELETE FROM graft_p34.ops.limits WHERE amount < 1000000") // v3
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p34.ops.limits VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_mid' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p34.ops.limits VERSION AS OF 2
                 UNION ALL
                 SELECT 'c_cur' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p34.ops.limits
                 ORDER BY snap""")
  }

  /** MERGE-ON-READ `UPDATE` on the LOG tier
    * ([[graft.sources.LogMoRUpdate]]) — the p30 shape on the entity
    * log, completing the lightweight-DML symmetry between the tiers:
    * two stacked UPDATEs each land as per-segment masks + appended
    * image segments in one publish (the second's predicate ranges over
    * the FIRST's image segment), the probe straddles both via time
    * travel. A mask that leaks old images, a lost update, or an update
    * applied to a deleted row breaks the hash. */
  def p37_log_lightweight_update(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p37", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p37.ops.limits")
    spark.sql("""CREATE TABLE graft_p37.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p37.ops.limits").overwrite(lit(true))
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p37.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("UPDATE graft_p37.ops.limits " +
        "SET amount = amount + 1000 WHERE user_id = 'u13'") // v2
      spark.sql("UPDATE graft_p37.ops.limits " +
        "SET amount = 0 WHERE amount >= 40000000") // v3 (sees v2's images)
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p37.ops.limits VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_mid' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p37.ops.limits VERSION AS OF 2
                 UNION ALL
                 SELECT 'c_cur' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p37.ops.limits
                 ORDER BY snap""")
  }

  /** MERGE-ON-READ `MERGE INTO` on the LOG tier
    * ([[graft.sources.LogMoRMerge]]) — the p32 shape on the entity
    * log, closing the lightweight-DML symmetry (both tiers now
    * decompose DELETE/UPDATE/MERGE into masks + appends): a CDC batch
    * deletes ~half its matched keys, updates the rest and inserts a
    * disjoint key range, all in ONE guarded publish of per-segment
    * `sha256sum IN (…)` masks + appended image/insert segments. The
    * probe straddles the MERGE via time travel; a resurrected deleted
    * row, a lost update, a double-applied insert or a mask hiding an
    * unmatched same-segment row breaks the hash. */
  def p38_log_lightweight_merge(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p38", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p38.ops.limits")
    spark.sql("""CREATE TABLE graft_p38.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"))
      .createOrReplaceTempView("p38_base")
    spark.sql("""INSERT INTO graft_p38.ops.limits
                 SELECT user_id, amount, CAST(NULL AS BINARY),
                        sha2(CAST(okey AS STRING), 256)
                 FROM p38_base""")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p38.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1
    spark.sql("""SELECT sha2(CAST(okey AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p38_base WHERE okey % 29 = 5
                 UNION ALL
                 SELECT sha2(CAST(okey + 100000000 AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p38_base WHERE okey % 31 = 2""")
      .createOrReplaceTempView("p38_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("""MERGE INTO graft_p38.ops.limits t USING p38_cdc s
                   ON t.sha256sum = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET amount = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                     VALUES (s.u, s.cents, NULL, s.k)""") // v2
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p38.ops.limits VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p38.ops.limits
                 ORDER BY snap""")
  }

  /** MERGE-ON-READ `REPLACE WHERE` — the lightweight BACKFILL
    * ([[graft.sources.ParquetDelete]] mask branch composed with the
    * payload publish): re-load one key range of a range-clustered fact
    * table without rewriting a byte of it. The range straddles file
    * boundaries, so the classification exercises all three verdicts at
    * once — interior files DROP whole (zone-proof), boundary files get
    * the predicate as a delete MASK, out-of-range files stay
    * untouched — and the recomputed payload rides the SAME version
    * publish (protected from its own mask). The probe straddles the
    * backfill via time travel; a leaked old row, a masked payload row,
    * or a torn two-version publish breaks the hash. */
  def p39_replace_where_lightweight(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p39", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p39.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p39_base")
    spark.sql("DROP TABLE IF EXISTS graft_p39.lake.orders_rw")
    spark.sql("""CREATE TABLE graft_p39.lake.orders_rw
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    spark.table("p39_base")
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p39.lake.orders_rw").append()
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p39.warehouse") +
      "/lake/orders_rw"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("""INSERT INTO graft_p39.lake.orders_rw
                   REPLACE WHERE o_orderkey >= 20000 AND o_orderkey < 90000
                   SELECT o_orderkey, bucket, cents * 3 AS cents
                   FROM p39_base
                   WHERE o_orderkey >= 20000 AND o_orderkey < 90000""") // v2
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p39.lake.orders_rw VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p39.lake.orders_rw
                 ORDER BY snap""")
  }

  /** Row-level DELETE on a catalog PARQUET table
    * ([[graft.sources.ParquetDelete]]): the p10 shape on the parquet
    * tier. The table is range-clustered on o_orderkey so the
    * disjunctive predicate exercises all three footer-stats verdicts —
    * low-key files drop whole without being read, high-key files
    * hardlink untouched, the boundary and the cents leg rewrite. The
    * oracle recomputes survivors from raw orders with the negated
    * predicate, so a missed, doubled, or corrupted row breaks the
    * hash. */
  def p12_parquet_delete(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p12", "lake")
    // fresh table every run (same-session re-runs must not accumulate)
    spark.sql("DROP TABLE IF EXISTS graft_p12.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p12.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p12.lake.orders_pq").append()
    spark.sql("""DELETE FROM graft_p12.lake.orders_pq
                 WHERE o_orderkey <= 12000 OR cents < 3000000""")
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS total,
                        min(o_orderkey) AS k0, max(o_orderkey) AS k1
                 FROM graft_p12.lake.orders_pq GROUP BY 1 ORDER BY 1""")
  }

  /** SQL UPDATE end-to-end ([[graft.sources.LogRowLevelOperation]]):
    * a log table through the catalog, `UPDATE ... SET ... WHERE` with a
    * disjunctive predicate spanning zone-droppable, rewritten, and
    * untouched segments, then an aggregate over the final state. The
    * oracle mirrors the update as `CASE WHEN pred THEN new ELSE old
    * END` over the raw orders table — a row the update missed,
    * double-applied, or lost in the copy-on-write swap breaks the
    * hash. Runtime group filtering keeps unaffected segments
    * byte-untouched (asserted in LogRowLevelSpec). */
  def p13_log_update(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p13", "ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p13.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p13.ops.limits").overwrite(lit(true))
    spark.sql("""UPDATE graft_p13.ops.limits SET amount = amount * 2 + 1
                 WHERE user_id = 'u13' OR amount < 1000000""")
    spark.sql("""SELECT user_id, count(*) AS n, sum(amount) AS cents
                 FROM graft_p13.ops.limits GROUP BY 1 ORDER BY 1""")
  }

  /** SQL MERGE INTO end-to-end: CDC-style upsert through the catalog —
    * matched rows take the source amount, unmatched source rows insert.
    * Target = orders with key % 3 ≠ 0, source = orders with key % 2 = 0
    * (doubled amounts), joined on the unique sha256sum, so the merge
    * exercises update-in-place, insert, and leave-alone on one table.
    * The oracle rebuilds the post-merge state as LEFT JOIN COALESCE ∪
    * anti-join inserts — a violated match, lost insert, or doubled row
    * breaks the hash. */
  def p14_merge_into(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p14", "ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p14.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    val base = Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
    base.filter(col("okey") % 3 =!= 0)
      .select(col("user_id"), col("amount"),
        lit(null).cast(BinaryType).as("msg"), col("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p14.ops.limits").overwrite(lit(true))
    base.filter(col("okey") % 2 === 0)
      .select(col("user_id"), (col("amount") * 2).as("amount"), col("sha256sum"))
      .createOrReplaceTempView("p14_source")
    spark.sql("""
      MERGE INTO graft_p14.ops.limits t
      USING p14_source s
      ON t.sha256sum = s.sha256sum
      WHEN MATCHED THEN UPDATE SET t.amount = s.amount
      WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
        VALUES (s.user_id, s.amount, CAST(NULL AS BINARY), s.sha256sum)
    """)
    spark.sql("""SELECT user_id, count(*) AS n, sum(amount) AS cents
                 FROM graft_p14.ops.limits GROUP BY 1 ORDER BY 1""")
  }

  /** Storage-partitioned join end-to-end ([[graft.sources.LogBucketing]]):
    * two log tables bucketed on user_id with the same spec — orders-
    * derived facts and customer-derived balances — joined and aggregated
    * per user. With both sides reporting `KeyGroupedPartitioning(
    * bucket(8, user_id))` the join AND the group-by plan without a
    * shuffle exchange (plan-asserted in LogBucketedJoinSpec; this query
    * is the oracle-checked correctness side). The customer side is
    * pre-aggregated per user first, which on a bucketed log is itself
    * exchange-free. */
  def p15_bucketed_join(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p15", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p15.ops.fact")
    spark.sql("DROP TABLE IF EXISTS graft_p15.ops.dim")
    spark.sql("""CREATE TABLE graft_p15.ops.fact
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    spark.sql("""CREATE TABLE graft_p15.ops.dim
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    graft.sources.LogBucketing.writeBucketed(
      Tables.orders(spark, dir).select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum")),
      "graft_p15.ops.fact", "user_id", 8)
    graft.sources.LogBucketing.writeBucketed(
      Tables.customer(spark, dir).select(
        concat(lit("u"), col("c_custkey") % 97).as("user_id"),
        (col("c_acctbal").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("c_custkey").cast(StringType), 256).as("sha256sum")),
      "graft_p15.ops.dim", "user_id", 8)
    spark.sql("""
      WITH bal AS (SELECT user_id, count(*) AS nc, sum(amount) AS bal
                   FROM graft_p15.ops.dim GROUP BY user_id)
      SELECT f.user_id, count(*) AS n, sum(f.amount) AS cents,
             max(bal.nc) AS nc, max(bal.bal) AS bal
      FROM graft_p15.ops.fact f JOIN bal ON f.user_id = bal.user_id
      GROUP BY f.user_id ORDER BY f.user_id""")
  }

  /** SQL UPDATE on a catalog PARQUET table
    * ([[graft.sources.ParquetRowLevelOperation]]): the p13 shape on the
    * parquet tier. Group-based copy-on-write — the runtime `_file`
    * subquery (planned against the PLAIN scan, so footer-stats pruning
    * applies) proves which files hold matching rows; only those
    * rewrite, the rest carry forward in the version set untouched
    * (asserted in ParquetRowLevelSpec). The oracle mirrors the update
    * as a CASE over raw orders — a row missed, double-applied, or lost
    * in the copy-on-write swap breaks the hash. */
  def p16_parquet_update(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p16", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p16.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p16.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p16.lake.orders_pq").append()
    spark.sql("""UPDATE graft_p16.lake.orders_pq SET cents = cents * 2 + 1
                 WHERE o_orderkey <= 12000 OR cents < 3000000""")
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS total
                 FROM graft_p16.lake.orders_pq GROUP BY 1 ORDER BY 1""")
  }

  /** SQL MERGE INTO a catalog PARQUET table: CDC-style upsert — matched
    * rows take the source cents, unmatched source rows insert. Target =
    * orders with key % 3 ≠ 0, source = key % 2 = 0 (doubled cents),
    * merged on the unique key, so one statement exercises
    * update-in-place, insert, and leave-alone. The oracle rebuilds the
    * post-merge state as LEFT JOIN COALESCE ∪ anti-join inserts. */
  def p17_parquet_merge(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p17", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p17.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p17.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    val base = Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    base.filter(col("o_orderkey") % 3 =!= 0)
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p17.lake.orders_pq").append()
    base.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("bucket"), (col("cents") * 2).as("cents"))
      .createOrReplaceTempView("p17_source")
    spark.sql("""
      MERGE INTO graft_p17.lake.orders_pq t
      USING p17_source s
      ON t.o_orderkey = s.o_orderkey
      WHEN MATCHED THEN UPDATE SET t.cents = s.cents
      WHEN NOT MATCHED THEN INSERT (o_orderkey, bucket, cents)
        VALUES (s.o_orderkey, s.bucket, s.cents)
    """)
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS total
                 FROM graft_p17.lake.orders_pq GROUP BY 1 ORDER BY 1""")
  }

  /** Snapshot isolation + time travel on the PARQUET tier
    * ([[graft.sources.ParquetVersions]]): the p11 shape on a
    * parquet-managed catalog table. v1 pins the fresh load; the
    * DELETE publishes a new commit instead of swapping generations
    * (pre-delete files stay on disk for the pinned read); the result
    * straddles the CURRENT view and `VERSION AS OF 1`. The oracle
    * recomputes both from raw orders — a snapshot that leaked the
    * delete, or a current view that missed it, breaks the hash. */
  def p18_parquet_time_travel(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p18", "lake")
    // fresh table every run: the commit ordinals restart at 1
    spark.sql("DROP TABLE IF EXISTS graft_p18.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p18.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p18.lake.orders_pq").append()
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p18.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1 = the fresh load
    spark.sql("DELETE FROM graft_p18.lake.orders_pq WHERE cents < 3000000")
    spark.sql("""SELECT 'current' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p18.lake.orders_pq
                 UNION ALL
                 SELECT 'v1' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p18.lake.orders_pq VERSION AS OF 1
                 ORDER BY snap""")
  }

  /** Storage-partitioned join on bucketed PARQUET tables
    * ([[graft.sources.ParquetBucketing]]): the p15 shape on the parquet
    * tier — orders-derived facts and customer-derived balances, both
    * bucketed on user_id with the same spec, joined and aggregated per
    * user. Both scans report `KeyGroupedPartitioning(bucket(8,
    * user_id))`, so the join AND the group-by plan without a shuffle
    * exchange (plan-asserted in ParquetBucketedJoinSpec; this query is
    * the oracle-checked correctness side). */
  def p19_parquet_bucketed_join(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p19", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p19.lake.fact")
    spark.sql("DROP TABLE IF EXISTS graft_p19.lake.dim")
    spark.sql("CREATE TABLE graft_p19.lake.fact (user_id STRING, amount BIGINT)")
    spark.sql("CREATE TABLE graft_p19.lake.dim (user_id STRING, amount BIGINT)")
    graft.sources.ParquetBucketing.writeBucketed(spark,
      Tables.orders(spark, dir).select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount")),
      "graft_p19.lake.fact", "user_id", 8)
    graft.sources.ParquetBucketing.writeBucketed(spark,
      Tables.customer(spark, dir).select(
        concat(lit("u"), col("c_custkey") % 97).as("user_id"),
        (col("c_acctbal").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount")),
      "graft_p19.lake.dim", "user_id", 8)
    spark.sql("""
      WITH bal AS (SELECT user_id, count(*) AS nc, sum(amount) AS bal
                   FROM graft_p19.lake.dim GROUP BY user_id)
      SELECT f.user_id, count(*) AS n, sum(f.amount) AS cents,
             max(bal.nc) AS nc, max(bal.bal) AS bal
      FROM graft_p19.lake.fact f JOIN bal ON f.user_id = bal.user_id
      GROUP BY f.user_id ORDER BY f.user_id""")
  }

  /** Change data feed on the LOG tier ([[graft.sources.ChangeFeed]]):
    * load orders into a fresh versioned log table (v1), DELETE one
    * user, UPDATE a value band, then read the NET change feed v1 →
    * latest and aggregate it per (change_type, user_id). The feed is
    * derived purely from ledger segment diffs + a row-level EXCEPT ALL
    * that cancels copy-on-write carry-over rows; the oracle rebuilds
    * the expected net diff from first principles (final-state EXCEPT
    * ALL initial-state over the same mutation arithmetic), so a
    * carried-over row misreported as a change, a lost delete, or a
    * wrong post-update value all break the hash. */
  def p20_log_cdc(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p20", "ops")
    // fresh table every run: the commit ordinals restart at 1
    spark.sql("DROP TABLE IF EXISTS graft_p20.ops.limits")
    spark.sql("""CREATE TABLE graft_p20.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
      .repartitionByRange(8, col("user_id"))
      .writeTo("graft_p20.ops.limits").append()
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p20.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1 = the fresh load
    spark.sql("DELETE FROM graft_p20.ops.limits WHERE user_id = 'u7'")
    spark.sql("""UPDATE graft_p20.ops.limits SET amount = amount * 2 + 1
                 WHERE amount < 1000000""")
    val vTo = graft.sources.LogVersions.latest(tableDir).get._1
    graft.sources.ChangeFeed.logChanges(spark, tableDir, 1L, vTo, net = true)
      .groupBy(col(graft.sources.ChangeFeed.CHANGE_TYPE_COL).as("change_type"),
        col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("amount")).as("cents"))
      .orderBy(col("change_type"), col("user_id"))
  }

  /** Change data feed on the PARQUET tier: same contract as p20 over a
    * catalog parquet table — DELETE drops/rewrites data files through
    * the footer-stats classify, a second append lands new files, and
    * the net feed v1 → latest must report exactly the deleted rows and
    * the appended rows (the catch-up fold makes the appends
    * ledger-visible). */
  def p21_parquet_cdc(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p21", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p21.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p21.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    val base = Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    base.filter(col("o_orderkey") % 2 === 0)
      .repartitionByRange(8, col("o_orderkey"))
      .writeTo("graft_p21.lake.orders_pq").append()
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p21.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1 = the even keys
    spark.sql("DELETE FROM graft_p21.lake.orders_pq WHERE cents < 3000000")
    base.filter(col("o_orderkey") % 2 === 1)
      .repartitionByRange(4, col("o_orderkey"))
      .writeTo("graft_p21.lake.orders_pq").append()
    graft.sources.ParquetVersions.catchUp(tableDir) // appends → ledger
    val vTo = graft.sources.ParquetVersions.latest(tableDir).get._1
    graft.sources.ChangeFeed.parquetChanges(spark, tableDir, 1L, vTo, net = true)
      .groupBy(col(graft.sources.ChangeFeed.CHANGE_TYPE_COL).as("change_type"),
        col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
      .orderBy(col("change_type"), col("bucket"))
  }

  /** REPLACE WHERE on the entity log (SQL `INSERT INTO ... REPLACE
    * WHERE`, [[graft.sources.LogWriteBuilder]] SupportsOverwrite): the
    * idempotent backfill — re-derive two users' slices with corrected
    * amounts and land them atomically in place of the old slices. The
    * oracle rebuilds the post-replace state as (NOT-matching rows ∪
    * payload); a row the replace missed, double-landed, or wrongly
    * retired breaks the hash. Zone classify keeps the untouched
    * users' segments unread — at 100 TB a one-day backfill touches
    * one day's segments. */
  def p22_log_replace_where(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p22", "ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_p22.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    val base = Tables.orders(spark, dir)
      .select(
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"),
        lit(null).cast(BinaryType).as("msg"),
        sha2(col("o_orderkey").cast(StringType), 256).as("sha256sum"))
    base.repartitionByRange(8, col("user_id"))
      .writeTo("graft_p22.ops.limits").overwrite(lit(true))
    base.filter(col("user_id").isin("u13", "u42")).createOrReplaceTempView("p22_payload")
    spark.sql("""INSERT INTO graft_p22.ops.limits
                 REPLACE WHERE user_id = 'u13' OR user_id = 'u42'
                 SELECT user_id, amount * 2 + 7 AS amount, msg, sha256sum
                 FROM p22_payload""")
    spark.sql("""SELECT user_id, count(*) AS n, sum(amount) AS cents
                 FROM graft_p22.ops.limits GROUP BY 1 ORDER BY 1""")
  }

  /** REPLACE WHERE on a VERSIONED catalog parquet table
    * ([[graft.sources.ParquetReplaceWriteBuilder]]): payload through
    * Spark's own parquet write, retirement through the footer-stats
    * classify, and ONE ledger publish for retire + rewrite + payload —
    * the backfill pattern a 100 TB parquet lake runs daily. */
  def p23_parquet_replace_where(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p23", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p23.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p23.lake.orders_pq
                 (o_orderkey BIGINT, bucket BIGINT, cents BIGINT)""")
    val base = Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    base.repartitionByRange(8, col("bucket"))
      .writeTo("graft_p23.lake.orders_pq").append()
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p23.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir)
    base.filter(col("bucket").isin(3L, 7L))
      .select(col("o_orderkey"), col("bucket"),
        (col("cents") * 3 + 11).as("cents"))
      .repartitionByRange(4, col("o_orderkey"))
      .writeTo("graft_p23.lake.orders_pq")
      .overwrite(col("bucket").isin(3L, 7L))
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS total
                 FROM graft_p23.lake.orders_pq GROUP BY 1 ORDER BY 1""")
  }

  /** Atomic CTAS through the catalog's StagingTableCatalog surface
    * ([[graft.sources.LogStaging]]): `CREATE TABLE … AS SELECT`
    * materializes the table in a hidden staging dir and renames it in
    * whole — the reference's migrations posture (tables appear fully
    * formed, `migrate.go:13-34`) on the DSv2 catalog. The oracle is the
    * same SELECT over raw orders: a CTAS that dropped, duplicated, or
    * reordered rows into the new table breaks the hash. */
  def p24_ctas(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p24", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p24.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p24_src")
    spark.sql("""CREATE TABLE graft_p24.lake.orders_pq AS
                 SELECT o_orderkey, bucket, cents FROM p24_src
                 WHERE o_orderkey % 5 <> 0""")
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS total
                 FROM graft_p24.lake.orders_pq GROUP BY 1 ORDER BY 1""")
  }

  /** Atomic RTAS ([[graft.sources.StagedReplaceParquetTable]]):
    * `REPLACE TABLE … AS SELECT` publishes ONE ledger version whose
    * membership is exactly the new files — readers see the old table or
    * the new, never a mix, and the un-versioned CTAS target
    * auto-upgrades (v1 = its pre-replace state). The result straddles
    * the replacement: current = the redefined table, `VERSION AS OF 1`
    * = the original load — a replace that leaked early, missed rows, or
    * destroyed history breaks the hash. */
  def p25_rtas(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p25", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p25.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p25_src")
    spark.sql("CREATE TABLE graft_p25.lake.orders_pq AS SELECT * FROM p25_src")
    spark.sql("""REPLACE TABLE graft_p25.lake.orders_pq AS
                 SELECT o_orderkey, bucket, cents * 3 + 7 AS cents
                 FROM p25_src WHERE bucket < 10""")
    spark.sql("""SELECT 'current' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p25.lake.orders_pq
                 UNION ALL
                 SELECT 'v1' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p25.lake.orders_pq VERSION AS OF 1
                 ORDER BY snap""")
  }

  /** Metadata tables ([[graft.sources.MetaTables]]):
    * `graft.<ns>.<t>.history` / `.files` as SQL relations — the
    * introspection surface composing with ordinary SQL (here: history
    * joined against the live-file count). The layout is pinned
    * (3 single-file range-disjoint appends; the DELETE's footer-stats
    * classify drops exactly one file whole), so every cell is
    * deterministic and the oracle is the literal expected relation: a
    * phantom version, a miscounted membership, or a file wrongly
    * marked live breaks the compare. */
  def p26_metadata_tables(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p26", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p26.lake.orders_pq")
    spark.sql("""CREATE TABLE graft_p26.lake.orders_pq
                 (o_orderkey BIGINT, cents BIGINT)""")
    val base = Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
    val maxKey = base.agg(max(col("o_orderkey"))).collect()(0).getLong(0)
    val (c1, c2) = (maxKey / 3, 2 * maxKey / 3)
    // three range-disjoint single-file appends → footer stats can prove
    // the first file whole-droppable
    Seq(base.filter(col("o_orderkey") <= c1),
        base.filter(col("o_orderkey") > c1 && col("o_orderkey") <= c2),
        base.filter(col("o_orderkey") > c2))
      .foreach(_.coalesce(1).writeTo("graft_p26.lake.orders_pq").append())
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p26.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1 = 3 files
    spark.sql(s"DELETE FROM graft_p26.lake.orders_pq WHERE o_orderkey <= $c1")
    spark.sql("""SELECT h.version, h.files, h.is_latest, f.n_live
                 FROM graft_p26.lake.orders_pq.history h
                 CROSS JOIN (SELECT count(*) AS n_live
                             FROM graft_p26.lake.orders_pq.files
                             WHERE live) f
                 ORDER BY h.version""")
  }

  /** `PARTITIONED BY` ([[graft.sources.PartitionSpecs]]): a
    * days()-partitioned catalog table — the standard date-laid lake
    * layout. The load routes rows into one directory per month, the
    * partition-aligned DELETE drops its whole partition from dir
    * values alone (zero data I/O), and the range probe prunes
    * partitions BEFORE footer stats. The result is the month-level
    * aggregate of the surviving window — a misrouted row, an
    * over-pruned partition, or a resurrected deleted month breaks the
    * hash against the plain-parquet oracle. */
  def p27_partitioned_table(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p27", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p27.lake.orders_bymonth")
    spark.sql("""CREATE TABLE graft_p27.lake.orders_bymonth
                 (o_orderkey BIGINT, mday DATE, cents BIGINT)
                 PARTITIONED BY (days(mday))""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mday"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .writeTo("graft_p27.lake.orders_bymonth").append()
    // partition-aligned delete: the whole month vanishes metadata-only
    spark.sql("DELETE FROM graft_p27.lake.orders_bymonth WHERE mday = DATE'1995-01-01'")
    spark.sql("""SELECT mday, count(*) AS n, sum(cents) AS cents
                 FROM graft_p27.lake.orders_bymonth
                 WHERE mday >= DATE'1994-07-01' AND mday <= DATE'1995-06-01'
                 GROUP BY mday ORDER BY mday""")
  }

  /** MERGE-ON-READ (lightweight) DELETE ([[graft.sources.DeleteMasks]])
    * — the ClickHouse `DELETE FROM` posture the reference's own tests
    * run (`hashes_test.go:235-239`): the predicate lands as a mask in
    * one version publish, every data file stays byte-identical, scans
    * filter masked rows. Two stacked masked deletes, then the result
    * straddles them via time travel: current state, the mid-state, and
    * the pre-delete snapshot — a mask that leaks rows, over-deletes, or
    * fails to compose breaks the hash. */
  def p28_lightweight_delete(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p28", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p28.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p28_src")
    spark.sql("CREATE TABLE graft_p28.lake.orders_pq AS SELECT * FROM p28_src")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p28.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("DELETE FROM graft_p28.lake.orders_pq WHERE bucket = 3") // v2
      spark.sql("DELETE FROM graft_p28.lake.orders_pq WHERE cents % 10 = 7") // v3
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p28.lake.orders_pq VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_mid' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p28.lake.orders_pq VERSION AS OF 2
                 UNION ALL
                 SELECT 'c_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p28.lake.orders_pq
                 ORDER BY snap""")
  }

  /** MERGE-ON-READ `UPDATE` ([[graft.sources.ParquetMoRUpdate]]) —
    * the other half of the lightweight-DML contract: the condition
    * lands as a delete mask on the candidate files and ONLY the
    * updated row images are appended, one atomic version publish per
    * statement, pre-existing files byte-identical. Two stacked
    * updates — the second's predicate ranges over the FIRST's output
    * (its candidate set includes the appended image file) — then the
    * result straddles both via time travel. A mask that leaks old
    * images, a lost update, or an update applied to a deleted row
    * breaks the hash. */
  def p30_lightweight_update(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p30", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p30.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p30_src")
    spark.sql("CREATE TABLE graft_p30.lake.orders_pq AS SELECT * FROM p30_src")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p30.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("UPDATE graft_p30.lake.orders_pq " +
        "SET cents = cents + 1000 WHERE bucket = 3") // v2
      spark.sql("UPDATE graft_p30.lake.orders_pq " +
        "SET cents = 0 WHERE cents >= 40000000") // v3 (sees v2's output)
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p30.lake.orders_pq VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_mid' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p30.lake.orders_pq VERSION AS OF 2
                 UNION ALL
                 SELECT 'c_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p30.lake.orders_pq
                 ORDER BY snap""")
  }

  /** PARTITION EVOLUTION ([[graft.sources.PartitionEvolution]]): a
    * flat table evolves to `days(mday)` — the even half lands flat,
    * the layout swaps, the odd half routes into day directories — and
    * the range probe runs BEFORE and AFTER `repartition_table`'s lazy
    * migration. The two probes must agree exactly (tagged UNION, the
    * oracle doubles itself): a row lost or duplicated in migration, a
    * mis-routed append, or a prune over the mixed layout that drops an
    * old-layout file breaks the hash. */
  def p31_partition_evolution(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p31", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p31.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("mday"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p31_src")
    spark.sql("CREATE TABLE graft_p31.lake.orders_pq AS " +
      "SELECT * FROM p31_src WHERE okey % 2 = 0")
    spark.sql("CALL graft_p31.system.set_partition_spec(" +
      "table => 'lake.orders_pq', spec => 'days(mday)')")
    spark.sql("INSERT INTO graft_p31.lake.orders_pq " +
      "SELECT * FROM p31_src WHERE okey % 2 = 1")
    def probe(tag: String): DataFrame =
      spark.sql(s"""SELECT '$tag' AS phase, mday, count(*) AS n,
                           sum(cents) AS cents
                    FROM graft_p31.lake.orders_pq
                    WHERE mday >= DATE'1995-02-01' AND mday <= DATE'1996-01-01'
                    GROUP BY mday""")
    // localCheckpoint materializes the mixed-layout probe NOW — a lazy
    // DataFrame would silently re-execute after the migration and both
    // phases would compare the same post-migration state
    val pre = probe("a_mixed_layout").localCheckpoint()
    spark.sql("CALL graft_p31.system.repartition_table(table => 'lake.orders_pq')")
    pre.unionAll(probe("b_migrated"))
      .orderBy(col("phase"), col("mday"))
  }

  /** `months(ts)` partition transform ([[graft.sources.PartitionSpecs]],
    * VERDICT r11 #5): the single most common retention layout — one
    * directory per month. The load routes timestamps into month dirs,
    * TWO partition-aligned retention DELETEs (the pre-1993-07 sweep and
    * one month inside the probe window) drop whole partitions from dir
    * values alone (zero data I/O — the synthesized month bounds prove
    * both the match and the no-partial-overlap), and the probe prunes
    * months BEFORE footer stats. A misrouted timestamp, an off-by-one
    * month boundary (leap February!), or a resurrected deleted month
    * breaks the hash against the plain-parquet oracle. */
  def p33_month_partitioned(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p33", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p33.lake.orders_ts")
    spark.sql("""CREATE TABLE graft_p33.lake.orders_ts
                 (okey BIGINT, ots TIMESTAMP, cents BIGINT)
                 PARTITIONED BY (months(ots))""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        col("o_orderdate").cast(TimestampType).as("ots"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .writeTo("graft_p33.lake.orders_ts").append()
    // month-aligned retention: whole partitions vanish metadata-only
    spark.sql("DELETE FROM graft_p33.lake.orders_ts " +
      "WHERE ots < TIMESTAMP'1993-07-01 00:00:00'")
    spark.sql("DELETE FROM graft_p33.lake.orders_ts " +
      "WHERE ots >= TIMESTAMP'1995-01-01 00:00:00' " +
      "AND ots < TIMESTAMP'1995-02-01 00:00:00'")
    spark.sql("""SELECT date_trunc('month', ots) AS m, count(*) AS n,
                        sum(cents) AS cents
                 FROM graft_p33.lake.orders_ts
                 WHERE ots >= TIMESTAMP'1994-07-01 00:00:00'
                   AND ots <  TIMESTAMP'1995-07-01 00:00:00'
                 GROUP BY date_trunc('month', ots) ORDER BY m""")
  }

  /** MERGE-ON-READ `MERGE INTO` ([[graft.sources.ParquetMoRMerge]]) —
    * the third leg of the lightweight-DML contract (the reference's
    * warehouse applies CDC upserts as lightweight mutations
    * server-side, `hashes_test.go:235-239`): one CDC batch carrying
    * matched DELETEs (odd-ish cents), matched UPDATEs, and brand-new
    * INSERT keys, applied in ONE atomic version publish — matched rows
    * hidden by per-file key masks, images and inserts appended as new
    * files, pre-existing files byte-identical. The probe straddles the
    * MERGE via time travel: a lost arm, a resurrected masked row, a
    * double-applied image, or an insert that leaked into the pre-state
    * breaks the hash. */
  def p32_merge_lightweight(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p32", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p32.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p32_base")
    spark.sql("CREATE TABLE graft_p32.lake.orders_pq AS SELECT * FROM p32_base")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p32.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    // the CDC batch: ~1/29 of the keys as upsert/delete candidates plus
    // a disjoint insert range (keys offset past the table's domain)
    spark.sql("""SELECT o_orderkey AS k, bucket, cents FROM p32_base
                 WHERE o_orderkey % 29 = 5
                 UNION ALL
                 SELECT o_orderkey + 100000000 AS k, bucket, cents
                 FROM p32_base WHERE o_orderkey % 31 = 2""")
      .createOrReplaceTempView("p32_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("""MERGE INTO graft_p32.lake.orders_pq t USING p32_cdc s
                   ON t.o_orderkey = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET cents = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (o_orderkey, bucket, cents)
                     VALUES (s.k, s.bucket, s.cents)""") // v2
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p32.lake.orders_pq VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p32.lake.orders_pq
                 ORDER BY snap""")
  }

  /** POSITIONAL DELETION VECTORS under merge-on-read MERGE
    * ([[graft.sources.DeletionVectors]], VERDICT r13/r14 #1): the p32
    * CDC-upsert shape with the key-mask cap forced BELOW the matched
    * key count, so the delta lands as per-file position bitmaps —
    * sidecars under `_dv/`, DV entries riding the ledger masks — and
    * the pre-existing data files stay byte-identical (the 100 TB
    * high-churn contract: a trickle MERGE past the mask cap must not
    * rewrite its candidate files forever). The result carries a
    * REGIME-EVIDENCE row the oracle pins to constants: dv_ok = every
    * published mask is a DV entry AND at least one sidecar exists;
    * files_ok = every pre-merge file kept its (length, head-bytes)
    * signature. A silent downgrade to the rewrite regime, a predicate
    * mask sneaking in, or a touched candidate file fails the hash
    * compare, not just a spec. */
  def p40_merge_deletion_vectors(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p40", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p40.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p40_base")
    spark.sql("CREATE TABLE graft_p40.lake.orders_pq AS SELECT * FROM p40_base")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p40.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    // pre-merge byte signature of every live file (length + head bytes)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sigs(): Map[String, (Long, Int)] =
      graft.sources.ParquetVersions.latest(tableDir).get._2.map { rel =>
        val p = new org.apache.hadoop.fs.Path(s"$tableDir/data", rel)
        val st = fs.getFileStatus(p)
        val in = fs.open(p)
        val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
          finally in.close()
        rel -> ((st.getLen, java.util.Arrays.hashCode(head)))
      }.toMap
    val before = sigs()
    spark.sql("""SELECT o_orderkey AS k, bucket, cents FROM p40_base
                 WHERE o_orderkey % 29 = 5
                 UNION ALL
                 SELECT o_orderkey + 100000000 AS k, bucket, cents
                 FROM p40_base WHERE o_orderkey % 31 = 2""")
      .createOrReplaceTempView("p40_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    // cap far below the matched-key count (sf0.001 already matches ~50)
    spark.conf.set(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY, "16")
    try {
      spark.sql("""MERGE INTO graft_p40.lake.orders_pq t USING p40_cdc s
                   ON t.o_orderkey = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET cents = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (o_orderkey, bucket, cents)
                     VALUES (s.k, s.bucket, s.cents)""") // v2
    } finally {
      spark.conf.unset(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY)
      spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    }
    val masks = graft.sources.ParquetVersions.masksFor(tableDir, None)
    val dvOk = masks.nonEmpty &&
      masks.valuesIterator.flatten.forall(graft.sources.DeletionVectors.isDv) && {
        val dvDir = new org.apache.hadoop.fs.Path(tableDir,
          graft.sources.DeletionVectors.DIR)
        fs.exists(dvDir) && fs.listStatus(dvDir).exists(_.isFile)
      }
    val after = sigs()
    val filesOk = before.forall { case (n, s) => after.get(n).contains(s) }
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p40.lake.orders_pq VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p40.lake.orders_pq""")
      .unionAll(spark.sql(
        s"""SELECT 'c_dv_regime' AS snap,
                   CAST(${if (dvOk) 1 else 0} AS BIGINT) AS n,
                   CAST(${if (filesOk) 1 else 0} AS BIGINT) AS cents"""))
      .orderBy("snap")
  }

  /** MERGE with ALL THREE ARM FAMILIES under merge-on-read
    * ([[graft.sources.ParquetMoRMerge]], VERDICT r13 #3): matched
    * DELETE/UPDATE, NOT MATCHED INSERT, and NOT MATCHED BY SOURCE
    * DELETE/UPDATE — the standard two-table-sync idiom — decomposed
    * into masks (key or DV, chosen from the delta size) + appends with
    * the pre-existing files byte-identical. The by-source arms act on
    * the source-UNMATCHED complement (buckets 7 and 11 here), which
    * the source-key prefilter could never reach. The regime-evidence
    * row pins lightweight-ness in the hash compare: n = masks
    * published (no rewrite), cents = every pre-merge file kept its
    * byte signature. */
  def p41_merge_by_source(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p41", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p41.lake.orders_pq")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("o_orderkey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p41_base")
    spark.sql("CREATE TABLE graft_p41.lake.orders_pq AS SELECT * FROM p41_base")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p41.warehouse") +
      "/lake/orders_pq"
    graft.sources.ParquetVersions.enable(tableDir) // v1
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sigs(): Map[String, (Long, Int)] =
      graft.sources.ParquetVersions.latest(tableDir).get._2.map { rel =>
        val p = new org.apache.hadoop.fs.Path(s"$tableDir/data", rel)
        val st = fs.getFileStatus(p)
        val in = fs.open(p)
        val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
          finally in.close()
        rel -> ((st.getLen, java.util.Arrays.hashCode(head)))
      }.toMap
    val before = sigs()
    spark.sql("""SELECT o_orderkey AS k, bucket, cents FROM p41_base
                 WHERE o_orderkey % 29 = 5
                 UNION ALL
                 SELECT o_orderkey + 100000000 AS k, bucket, cents
                 FROM p41_base WHERE o_orderkey % 31 = 2""")
      .createOrReplaceTempView("p41_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("""MERGE INTO graft_p41.lake.orders_pq t USING p41_cdc s
                   ON t.o_orderkey = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET cents = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (o_orderkey, bucket, cents)
                     VALUES (s.k, s.bucket, s.cents)
                   WHEN NOT MATCHED BY SOURCE AND t.bucket = 7 THEN DELETE
                   WHEN NOT MATCHED BY SOURCE AND t.bucket = 11
                     THEN UPDATE SET cents = 0""") // v2
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    val masksOk = graft.sources.ParquetVersions.masksFor(tableDir, None).nonEmpty
    val after = sigs()
    val filesOk = before.forall { case (n, s) => after.get(n).contains(s) }
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p41.lake.orders_pq VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(cents) AS cents
                 FROM graft_p41.lake.orders_pq""")
      .unionAll(spark.sql(
        s"""SELECT 'c_regime' AS snap,
                   CAST(${if (masksOk) 1 else 0} AS BIGINT) AS n,
                   CAST(${if (filesOk) 1 else 0} AS BIGINT) AS cents"""))
      .orderBy("snap")
  }

  /** The p41 arm-family-complete MERGE on the LOG tier
    * ([[graft.sources.LogMoRMerge]]): by-source DELETE sweeps one
    * user's stale unmatched rows, by-source UPDATE zeroes another's,
    * alongside the matched CDC arms and inserts — all per-segment key
    * masks + appended segments in one guarded publish, pre-existing
    * segments never retired. */
  def p42_log_merge_by_source(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p42", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p42.ops.limits")
    spark.sql("""CREATE TABLE graft_p42.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"))
      .createOrReplaceTempView("p42_base")
    spark.sql("""INSERT INTO graft_p42.ops.limits
                 SELECT user_id, amount, CAST(NULL AS BINARY),
                        sha2(CAST(okey AS STRING), 256)
                 FROM p42_base""")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p42.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1
    val segsBefore = graft.sources.LogVersions.latest(tableDir).get._2.toSet
    spark.sql("""SELECT sha2(CAST(okey AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p42_base WHERE okey % 29 = 5
                 UNION ALL
                 SELECT sha2(CAST(okey + 100000000 AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p42_base WHERE okey % 31 = 2""")
      .createOrReplaceTempView("p42_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try {
      spark.sql("""MERGE INTO graft_p42.ops.limits t USING p42_cdc s
                   ON t.sha256sum = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET amount = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                     VALUES (s.u, s.cents, NULL, s.k)
                   WHEN NOT MATCHED BY SOURCE AND t.user_id = 'u13' THEN DELETE
                   WHEN NOT MATCHED BY SOURCE AND t.user_id = 'u14'
                     THEN UPDATE SET amount = 0""") // v2
    } finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    val masksOk = graft.sources.ParquetVersions.masksFor(tableDir, None).nonEmpty
    val segsOk = segsBefore.subsetOf(
      graft.sources.LogVersions.latest(tableDir).get._2.toSet)
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p42.ops.limits VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p42.ops.limits""")
      .unionAll(spark.sql(
        s"""SELECT 'c_regime' AS snap,
                   CAST(${if (masksOk) 1 else 0} AS BIGINT) AS n,
                   CAST(${if (segsOk) 1 else 0} AS BIGINT) AS cents"""))
      .orderBy("snap")
  }

  /** ALTER COLUMN TYPE WIDENING without a rewrite
    * ([[graft.sources.LogCatalog.widens]], VERDICT r13 #2): the fact
    * column loads as INT32, widens to BIGINT by metadata only, and a
    * second slice lands 64-bit values the old type could not hold —
    * ONE scan then reads both physical vintages under the declared
    * BIGINT (Spark's native parquet type widening; footer pruning
    * shares the integral stats domain). A nulled-out old file, a
    * mis-decoded int32, or a dropped slice breaks the hash. */
  def p43_type_widening(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p43", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p43.lake.orders_w")
    spark.sql("""CREATE TABLE graft_p43.lake.orders_w
                 (okey BIGINT, bucket BIGINT, cents INT)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100)
          .cast(IntegerType).as("cents"))
      .createOrReplaceTempView("p43_base")
    spark.sql("INSERT INTO graft_p43.lake.orders_w SELECT * FROM p43_base")
    spark.sql("ALTER TABLE graft_p43.lake.orders_w ALTER COLUMN cents TYPE BIGINT")
    // the second slice needs 64 bits — unrepresentable pre-widening
    spark.sql("""INSERT INTO graft_p43.lake.orders_w
                 SELECT okey + 100000000, bucket,
                        CAST(cents AS BIGINT) * 100000
                 FROM p43_base WHERE okey % 31 = 2""")
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS cents
                 FROM graft_p43.lake.orders_w
                 GROUP BY bucket ORDER BY bucket""")
  }

  /** RENAME COLUMN without a rewrite ([[graft.sources.Renames]],
    * VERDICT r13 #2): the fact column renames by metadata only — the
    * pre-rename files keep their old parquet name, the post-rename
    * slice lands under the new one, and ONE scan serves both vintages
    * through per-file epoch resolution. The probe aggregates and
    * filters on the renamed column across both vintages — a silently
    * nulled old file (the by-name format's classic failure) or a
    * missed new file breaks the hash. */
  def p44_rename_column(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p44", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p44.lake.orders_rn")
    spark.sql("""CREATE TABLE graft_p44.lake.orders_rn
                 (okey BIGINT, bucket BIGINT, amt BIGINT)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        (col("o_custkey") % 19).cast(LongType).as("bucket"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amt"))
      .createOrReplaceTempView("p44_base")
    spark.sql("INSERT INTO graft_p44.lake.orders_rn SELECT * FROM p44_base")
    spark.sql("ALTER TABLE graft_p44.lake.orders_rn RENAME COLUMN amt TO cents")
    spark.sql("""INSERT INTO graft_p44.lake.orders_rn
                 SELECT okey + 100000000, bucket, amt * 3
                 FROM p44_base WHERE okey % 31 = 2""")
    spark.sql("""SELECT bucket, count(*) AS n, sum(cents) AS cents,
                        count(CASE WHEN cents IS NULL THEN 1 END) AS nulls
                 FROM graft_p44.lake.orders_rn
                 GROUP BY bucket ORDER BY bucket""")
  }

  /** Positional DELETION VECTORS on the LOG tier (VERDICT r15 #4 —
    * p40's log twin, [[graft.sources.LogMoRMergeCommand.buildDvMasks]]):
    * a MoR MERGE whose matched-key count exceeds `maxMaskKeys`
    * publishes per-SEGMENT line-position bitmaps instead of key masks
    * or segment rewrites. The oracle pins the REGIME, not just the
    * rows: the `c_dv_regime` evidence row folds (every mask entry is a
    * DV) ∧ (a sidecar exists under `_dv/`) ∧ (every pre-existing
    * segment is byte-identical) into the hash compare, alongside the
    * pre/post snapshot aggregates served through the DV-masked scan
    * and time travel. */
  def p45_log_deletion_vectors(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p45", "ops")
    spark.sql("DROP TABLE IF EXISTS graft_p45.ops.limits")
    spark.sql("""CREATE TABLE graft_p45.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        concat(lit("u"), col("o_custkey") % 97).as("user_id"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("amount"))
      .createOrReplaceTempView("p45_base")
    spark.sql("""INSERT INTO graft_p45.ops.limits
                 SELECT user_id, amount, CAST(NULL AS BINARY),
                        sha2(CAST(okey AS STRING), 256)
                 FROM p45_base""")
    val tableDir = spark.conf.get("spark.sql.catalog.graft_p45.warehouse") +
      "/ops/limits"
    graft.sources.LogVersions.enable(tableDir) // v1
    // pre-merge byte signature of every live segment
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def sigs(): Map[String, (Long, Int)] =
      graft.sources.LogVersions.latest(tableDir).get._2.map { name =>
        val p = new org.apache.hadoop.fs.Path(tableDir, name)
        val st = fs.getFileStatus(p)
        val in = fs.open(p)
        val head = try { val b = new Array[Byte](64); in.readFully(0, b); b }
          finally in.close()
        name -> ((st.getLen, java.util.Arrays.hashCode(head)))
      }.toMap
    val before = sigs()
    spark.sql("""SELECT sha2(CAST(okey AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p45_base WHERE okey % 29 = 5
                 UNION ALL
                 SELECT sha2(CAST(okey + 100000000 AS STRING), 256) AS k,
                        amount AS cents, user_id AS u
                 FROM p45_base WHERE okey % 31 = 2""")
      .createOrReplaceTempView("p45_cdc")
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    // cap far below the matched-key count (sf0.001 already matches ~50)
    spark.conf.set(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY, "16")
    try {
      spark.sql("""MERGE INTO graft_p45.ops.limits t USING p45_cdc s
                   ON t.sha256sum = s.k
                   WHEN MATCHED AND s.cents % 10 < 5 THEN DELETE
                   WHEN MATCHED THEN UPDATE SET amount = s.cents * 2 + 1
                   WHEN NOT MATCHED THEN INSERT (user_id, amount, msg, sha256sum)
                     VALUES (s.u, s.cents, NULL, s.k)""") // v2
    } finally {
      spark.conf.unset(graft.sources.ParquetMoRMerge.MAX_MASK_KEYS_KEY)
      spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    }
    val masks = graft.sources.LogVersions.masksFor(tableDir, None)
      .filter(_._2.nonEmpty)
    val dvOk = masks.nonEmpty &&
      masks.valuesIterator.flatten.forall(graft.sources.DeletionVectors.isDv) && {
        val dvDir = new org.apache.hadoop.fs.Path(tableDir,
          graft.sources.DeletionVectors.DIR)
        fs.exists(dvDir) && fs.listStatus(dvDir).exists(_.isFile)
      }
    val after = sigs()
    val filesOk = before.forall { case (n, s) => after.get(n).contains(s) }
    spark.sql("""SELECT 'a_pre' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p45.ops.limits VERSION AS OF 1
                 UNION ALL
                 SELECT 'b_cur' AS snap, count(*) AS n, sum(amount) AS cents
                 FROM graft_p45.ops.limits""")
      .unionAll(spark.sql(
        s"""SELECT 'c_dv_regime' AS snap,
                   CAST(${if (dvOk) 1 else 0} AS BIGINT) AS n,
                   CAST(${if (filesOk) 1 else 0} AS BIGINT) AS cents"""))
      .orderBy("snap")
  }

  /** PARQUET BLOOM SKIP INDEX oracle-checked (r16, VERDICT r15 #2
    * promoted into the correctness gate — the `sha256sum` point-probe
    * pattern, reference `hashes_test.go:191-203`): a catalog parquet
    * table keyed by a content hash is written so every file's [min,
    * max] on the hash spans the whole hex space (range pruning
    * useless), `CALL system.build_bloom` persists 8 KiB split-block
    * Bloom sidecars, and a 3-key point probe must (a) return exactly
    * the probed rows — DuckDB recomputes the SHA-256 from first
    * principles — and (b) SCHEDULE only the Bloom-positive files: the
    * kept/total counter folds into the hash compare as an evidence
    * row, so a regression to scan-everything flips the row even
    * though the returned rows would still match. */
  def p46_bloom_point_probe(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p46", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p46.lake.orders_h")
    spark.sql("CREATE TABLE graft_p46.lake.orders_h (okey BIGINT, h STRING)")
    val base = Tables.orders(spark, dir).select(
      col("o_orderkey").cast(LongType).as("okey"),
      sha2(col("o_orderkey").cast(StringType), 256).as("h"))
    base.createOrReplaceTempView("p46_base")
    // ONE 8-file append, not 8 single-file appends (r20): the probe's
    // contract needs ≥ 8 files whose h-column [min,max] spans the hex
    // space — true of ANY 8-way split of a sha256 column — not a
    // specific row-to-file routing. Deterministic round-robin
    // (sort-before-repartition is on by default, SPARK-23207) writes
    // the same rows as 8 files under ONE write job + ONE ledger
    // commit, where the loop paid 8 of each.
    spark.table("p46_base").repartition(8)
      .writeTo("graft_p46.lake.orders_h").append()
    spark.sql("CALL graft_p46.system.build_bloom(" +
      "table => 'lake.orders_h', columns => 'h')")
    // 3 probe keys, derived deterministically (bounded driver collect)
    val keys = spark.table("p46_base").orderBy(col("okey")).limit(3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val dataKey = spark.conf.get("spark.sql.catalog.graft_p46.warehouse") +
      "/lake/orders_h/data"
    graft.sources.StatsPrunedFileIndex.lastListing.remove(dataKey)
    val probed = spark.table("graft_p46.lake.orders_h")
      .filter(col("h").isin(keys.map(_._2).toSeq: _*))
      .select(col("okey"), col("h"))
    val rows = probed.collect() // forces the pruned scan
    val (kept, total) = Option(
      graft.sources.StatsPrunedFileIndex.lastListing.get(dataKey))
      .getOrElse((Int.MaxValue, 0))
    // ≤ 3 probed keys live in ≤ 3 files; Blooms are false-positive-
    // safe so allow one stray, but a scan-everything regression fails
    val prunedOk = total >= 8 && kept <= 4 && rows.length == 3
    probed
      .unionAll(spark.sql(
        s"""SELECT CAST(-1 AS BIGINT) AS okey,
                   'pruned:${if (prunedOk) 1 else 0}' AS h"""))
      .orderBy(col("okey"))
  }

  /** REPLACE TABLE AS SELECT on a PARTITIONED target
    * ([[graft.sources.LogStaging]], VERDICT r12 #4): a region-
    * partitioned load is REPLACED — new schema, new contents, new
    * `PARTITIONED BY (tier)` layout — in ONE version publish, the
    * replacement rows routed into the new partition dirs by the same
    * staging writers every INSERT uses. The probe straddles the
    * replacement via time travel (the pre-state read from the pinned
    * version's files). A torn replacement (old files under the new
    * spec, a lost partition dir, a double-published file) or a
    * mis-routed row breaks the hash. */
  def p35_rtas_partitioned(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p35", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p35.lake.orders_pt")
    spark.sql("""CREATE TABLE graft_p35.lake.orders_pt
                 (region STRING, okey BIGINT, cents BIGINT)
                 PARTITIONED BY (region)""")
    Tables.orders(spark, dir)
      .select(
        concat(lit("r"), col("o_custkey") % 5).as("region"),
        col("o_orderkey").cast(LongType).as("okey"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .createOrReplaceTempView("p35_src")
    spark.sql("INSERT INTO graft_p35.lake.orders_pt SELECT * FROM p35_src")
    // the pre-replace probe materializes NOW (localCheckpoint — the
    // p31 discipline: a lazy frame would re-execute after the replace
    // and read the replaced table); the pinned leg below additionally
    // proves time travel across the replacement (old FILES under the
    // new read schema — `tier` null there, `cents` the old values)
    val pre = spark.sql(
      """SELECT 'a_pre' AS snap, region AS part, count(*) AS n,
                sum(cents) AS cents
         FROM graft_p35.lake.orders_pt GROUP BY region""").localCheckpoint()
    // partitioned tables are versioned from birth: v1 = empty create,
    // v2 = the load, v3 = the replacement — deterministic on the fresh table
    spark.sql("""REPLACE TABLE graft_p35.lake.orders_pt PARTITIONED BY (tier) AS
                 SELECT concat('t', okey % 7) AS tier, okey, cents * 2 + 1 AS cents
                 FROM p35_src WHERE cents % 3 = 0""")
    pre.unionAll(spark.sql(
      """SELECT 'b_cur' AS snap, tier AS part, count(*) AS n,
                sum(cents) AS cents
         FROM graft_p35.lake.orders_pt GROUP BY tier"""))
      .unionAll(spark.sql(
        """SELECT 'c_pin' AS snap, 'all' AS part, count(*) AS n,
                  sum(cents) AS cents
           FROM graft_p35.lake.orders_pt VERSION AS OF 2"""))
      .orderBy(col("snap"), col("part"))
  }

  /** `bucket(n, col)` partition transform on a BIGINT key
    * ([[graft.sources.Partitions]], VERDICT r12 #5 — the common fact-
    * table layout: hash buckets over the surrogate key, typed murmur3
    * bit-identical to `functions.hash`): the load routes every row by
    * `pmod(hash(okey), 8)` into bucket dirs, then the probe set —
    * full-table totals, a point IN probe, a key range — must come back
    * hash-exact against the unpartitioned oracle. A row lost or
    * duplicated in routing, or a bucket dir wrongly treated as a value
    * bound, breaks the hash. */
  def p36_bucket_partitioned(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p36", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p36.lake.orders_bk")
    spark.sql("""CREATE TABLE graft_p36.lake.orders_bk
                 (okey BIGINT, cents BIGINT)
                 PARTITIONED BY (bucket(8, okey))""")
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").cast(LongType).as("okey"),
        (col("o_totalprice").cast(DecimalType(9, 2)) * 100).cast(LongType).as("cents"))
      .writeTo("graft_p36.lake.orders_bk").append()
    spark.sql("""SELECT 'a_total' AS tag, count(*) AS n, sum(cents) AS cents
                 FROM graft_p36.lake.orders_bk
                 UNION ALL
                 SELECT 'b_probe' AS tag, count(*) AS n, sum(cents) AS cents
                 FROM graft_p36.lake.orders_bk
                 WHERE okey IN (1, 7, 4242, 99999)
                 UNION ALL
                 SELECT 'c_range' AS tag, count(*) AS n, sum(cents) AS cents
                 FROM graft_p36.lake.orders_bk
                 WHERE okey BETWEEN 10000 AND 20000
                 ORDER BY tag""")
  }

  /** `.partitions` / extended `.files` metadata
    * ([[graft.sources.MetaTables]]): the per-partition summary relation
    * over a pinned layout — one file per partition (repartition(1)
    * routes every row through one task), one partition masked by a
    * lightweight DELETE. The oracle is the literal expected relation:
    * a miscounted partition, a mask on the wrong file, or a phantom
    * directory breaks the compare. */
  def p29_partitions_meta(spark: SparkSession, dir: String): DataFrame = {
    catalogFor(spark, "p29", "lake")
    spark.sql("DROP TABLE IF EXISTS graft_p29.lake.tiers")
    spark.sql("""CREATE TABLE graft_p29.lake.tiers (tier STRING, amount BIGINT)
                 PARTITIONED BY (tier)""")
    spark.createDataFrame(Seq(
        ("bronze", 1L), ("bronze", 2L), ("silver", 10L), ("silver", 20L),
        ("gold", 100L)))
      .toDF("tier", "amount")
      .repartition(1).writeTo("graft_p29.lake.tiers").append()
    spark.conf.set(graft.sources.DeleteMasks.MODE_KEY, "merge-on-read")
    try spark.sql("DELETE FROM graft_p29.lake.tiers WHERE amount = 2")
    finally spark.conf.unset(graft.sources.DeleteMasks.MODE_KEY)
    spark.sql("""SELECT p.partition, p.files, p.masked_files, f.n_masked_preds
                 FROM graft_p29.lake.tiers.partitions p
                 CROSS JOIN (SELECT sum(masks) AS n_masked_preds
                             FROM graft_p29.lake.tiers.files) f
                 ORDER BY p.partition""")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p27_partitioned_table" -> (p27_partitioned_table _),
    "p33_month_partitioned" -> (p33_month_partitioned _),
    "p28_lightweight_delete" -> (p28_lightweight_delete _),
    "p30_lightweight_update" -> (p30_lightweight_update _),
    "p32_merge_lightweight" -> (p32_merge_lightweight _),
    "p46_bloom_point_probe" -> (p46_bloom_point_probe _),
    "p45_log_deletion_vectors" -> (p45_log_deletion_vectors _),
    "p40_merge_deletion_vectors" -> (p40_merge_deletion_vectors _),
    "p41_merge_by_source" -> (p41_merge_by_source _),
    "p42_log_merge_by_source" -> (p42_log_merge_by_source _),
    "p43_type_widening" -> (p43_type_widening _),
    "p44_rename_column" -> (p44_rename_column _),
    "p34_log_lightweight" -> (p34_log_lightweight _),
    "p37_log_lightweight_update" -> (p37_log_lightweight_update _),
    "p38_log_lightweight_merge" -> (p38_log_lightweight_merge _),
    "p39_replace_where_lightweight" -> (p39_replace_where_lightweight _),
    "p35_rtas_partitioned" -> (p35_rtas_partitioned _),
    "p36_bucket_partitioned" -> (p36_bucket_partitioned _),
    "p31_partition_evolution" -> (p31_partition_evolution _),
    "p29_partitions_meta" -> (p29_partitions_meta _),
    "p26_metadata_tables" -> (p26_metadata_tables _),
    "p24_ctas" -> (p24_ctas _),
    "p25_rtas" -> (p25_rtas _),
    "p22_log_replace_where" -> (p22_log_replace_where _),
    "p23_parquet_replace_where" -> (p23_parquet_replace_where _),
    "p20_log_cdc" -> (p20_log_cdc _),
    "p21_parquet_cdc" -> (p21_parquet_cdc _),
    "p19_parquet_bucketed_join" -> (p19_parquet_bucketed_join _),
    "p16_parquet_update" -> (p16_parquet_update _),
    "p17_parquet_merge" -> (p17_parquet_merge _),
    "p18_parquet_time_travel" -> (p18_parquet_time_travel _),
    "p15_bucketed_join" -> (p15_bucketed_join _),
    "p14_merge_into" -> (p14_merge_into _),
    "p13_log_update" -> (p13_log_update _),
    "p12_parquet_delete" -> (p12_parquet_delete _),
    "p11_time_travel" -> (p11_time_travel _),
    "p10_log_delete" -> (p10_log_delete _),
    "p09_zorder_probe" -> (p09_zorder_probe _),
    "p08_catalog_skip_scan" -> (p08_catalog_skip_scan _),
    "p07_log_count_pushdown" -> (p07_log_count_pushdown _),
    "p06_log_roundtrip" -> (p06_log_roundtrip _),
    "p05_mixture_sample" -> (p05_mixture_sample _),
    "p04_pack_sequences" -> (p04_pack_sequences _),
    "p01_clean_corpus" -> (p01_clean_corpus _),
    "p02_split_assign" -> (p02_split_assign _),
    "p03_corpus_prep" -> (p03_corpus_prep _))

  val oracle: Map[String, String] = Map(
    "p33_month_partitioned" ->
      """WITH b AS (SELECT CAST(o_orderdate AS TIMESTAMP) AS ots,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT date_trunc('month', ots) AS m, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |WHERE ots >= TIMESTAMP '1994-07-01 00:00:00'
        |  AND ots <  TIMESTAMP '1995-07-01 00:00:00'
        |  AND NOT (ots >= TIMESTAMP '1995-01-01 00:00:00'
        |           AND ots < TIMESTAMP '1995-02-01 00:00:00')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p27_partitioned_table" ->
      """WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mday,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT mday, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |WHERE mday >= DATE '1994-07-01' AND mday <= DATE '1995-06-01'
        |  AND mday <> DATE '1995-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p28_lightweight_delete" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_mid' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b WHERE bucket <> 3
        |UNION ALL
        |SELECT 'c_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b WHERE bucket <> 3 AND cents % 10 <> 7
        |ORDER BY snap""".stripMargin,
    "p30_lightweight_update" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |mid AS (SELECT bucket,
        |    CASE WHEN bucket = 3 THEN cents + 1000 ELSE cents END AS cents
        |  FROM b),
        |cur AS (SELECT bucket,
        |    CASE WHEN cents >= 40000000 THEN 0 ELSE cents END AS cents
        |  FROM mid)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_mid' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM mid
        |UNION ALL
        |SELECT 'c_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM cur
        |ORDER BY snap""".stripMargin,
    "p36_bucket_partitioned" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'a_total' AS tag, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_probe' AS tag, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b WHERE okey IN (1, 7, 4242, 99999)
        |UNION ALL
        |SELECT 'c_range' AS tag, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b WHERE okey BETWEEN 10000 AND 20000
        |ORDER BY tag""".stripMargin,
    "p35_rtas_partitioned" ->
      """WITH b AS (SELECT 'r' || CAST(o_custkey % 5 AS VARCHAR) AS region,
        |    CAST(o_orderkey AS BIGINT) AS okey,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |r AS (SELECT 't' || CAST(okey % 7 AS VARCHAR) AS part,
        |    cents * 2 + 1 AS cents
        |  FROM b WHERE cents % 3 = 0)
        |SELECT 'a_pre' AS snap, region AS part, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b GROUP BY region
        |UNION ALL
        |SELECT 'b_cur' AS snap, part, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM r GROUP BY part
        |UNION ALL
        |SELECT 'c_pin' AS snap, 'all' AS part, COUNT(*) AS n,
        |       CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |ORDER BY snap, part""".stripMargin,
    "p37_log_lightweight_update" ->
      """WITH b AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |mid AS (SELECT CASE WHEN user_id = 'u13' THEN amount + 1000
        |                    ELSE amount END AS amount FROM b),
        |cur AS (SELECT CASE WHEN amount >= 40000000 THEN 0
        |                    ELSE amount END AS amount FROM mid)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_mid' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM mid
        |UNION ALL
        |SELECT 'c_cur' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM cur
        |ORDER BY snap""".stripMargin,
    "p39_replace_where_lightweight" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |cur AS (
        |  SELECT CASE WHEN k >= 20000 AND k < 90000 THEN cents * 3
        |              ELSE cents END AS cents
        |  FROM b
        |)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM cur
        |ORDER BY snap""".stripMargin,
    "p46_bloom_point_probe" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    SHA256(CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders),
        |k AS (SELECT okey, h FROM b ORDER BY okey LIMIT 3)
        |SELECT okey, h FROM k
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT) AS okey, 'pruned:1' AS h
        |ORDER BY okey""".stripMargin,
    "p45_log_deletion_vectors" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |cur AS (
        |  SELECT CASE WHEN k % 29 = 5 THEN amount * 2 + 1
        |              ELSE amount END AS amount
        |  FROM b WHERE NOT (k % 29 = 5 AND amount % 10 < 5)
        |  UNION ALL
        |  SELECT amount FROM b WHERE k % 31 = 2
        |)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM cur
        |UNION ALL
        |SELECT 'c_dv_regime' AS snap, CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS cents
        |ORDER BY snap""".stripMargin,
    "p38_log_lightweight_merge" ->
      """WITH b AS (SELECT o_orderkey AS k,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |cur AS (
        |  SELECT CASE WHEN k % 29 = 5 THEN amount * 2 + 1
        |              ELSE amount END AS amount
        |  FROM b WHERE NOT (k % 29 = 5 AND amount % 10 < 5)
        |  UNION ALL
        |  SELECT amount FROM b WHERE k % 31 = 2
        |)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM cur
        |ORDER BY snap""".stripMargin,
    "p34_log_lightweight" ->
      """WITH b AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_mid' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b WHERE user_id <> 'u13'
        |UNION ALL
        |SELECT 'c_cur' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b WHERE user_id <> 'u13' AND amount >= 1000000
        |ORDER BY snap""".stripMargin,
    "p32_merge_lightweight" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |s AS (SELECT o_orderkey AS k, bucket, cents FROM b
        |    WHERE o_orderkey % 29 = 5
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, bucket, cents
        |  FROM b WHERE o_orderkey % 31 = 2),
        |cur AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.k IS NOT NULL THEN s.cents * 2 + 1 ELSE t.cents END AS cents
        |  FROM b t LEFT JOIN s ON t.o_orderkey = s.k
        |  WHERE s.k IS NULL OR NOT (s.cents % 10 < 5)
        |  UNION ALL
        |  SELECT s.k AS o_orderkey, s.cents
        |  FROM s LEFT JOIN b t ON t.o_orderkey = s.k
        |  WHERE t.o_orderkey IS NULL)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM cur
        |ORDER BY snap""".stripMargin,
    "p40_merge_deletion_vectors" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |s AS (SELECT o_orderkey AS k, bucket, cents FROM b
        |    WHERE o_orderkey % 29 = 5
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, bucket, cents
        |  FROM b WHERE o_orderkey % 31 = 2),
        |cur AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.k IS NOT NULL THEN s.cents * 2 + 1 ELSE t.cents END AS cents
        |  FROM b t LEFT JOIN s ON t.o_orderkey = s.k
        |  WHERE s.k IS NULL OR NOT (s.cents % 10 < 5)
        |  UNION ALL
        |  SELECT s.k AS o_orderkey, s.cents
        |  FROM s LEFT JOIN b t ON t.o_orderkey = s.k
        |  WHERE t.o_orderkey IS NULL)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM cur
        |UNION ALL
        |SELECT 'c_dv_regime' AS snap, CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS cents
        |ORDER BY snap""".stripMargin,
    "p41_merge_by_source" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |s AS (SELECT o_orderkey AS k, bucket, cents FROM b
        |    WHERE o_orderkey % 29 = 5
        |  UNION ALL
        |  SELECT o_orderkey + 100000000 AS k, bucket, cents
        |  FROM b WHERE o_orderkey % 31 = 2),
        |cur AS (
        |  SELECT t.o_orderkey,
        |    CASE WHEN s.k IS NOT NULL THEN s.cents * 2 + 1
        |         WHEN t.bucket = 11 THEN 0
        |         ELSE t.cents END AS cents
        |  FROM b t LEFT JOIN s ON t.o_orderkey = s.k
        |  WHERE (s.k IS NOT NULL AND NOT (s.cents % 10 < 5))
        |     OR (s.k IS NULL AND t.bucket <> 7)
        |  UNION ALL
        |  SELECT s.k AS o_orderkey, s.cents
        |  FROM s LEFT JOIN b t ON t.o_orderkey = s.k
        |  WHERE t.o_orderkey IS NULL)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM cur
        |UNION ALL
        |SELECT 'c_regime' AS snap, CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS cents
        |ORDER BY snap""".stripMargin,
    "p42_log_merge_by_source" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |s AS (SELECT okey AS sk, amount AS cents, user_id AS u, 1 AS matched
        |    FROM b WHERE okey % 29 = 5
        |  UNION ALL
        |  SELECT okey + 100000000 AS sk, amount AS cents, user_id AS u, 0 AS matched
        |  FROM b WHERE okey % 31 = 2),
        |cur AS (
        |  SELECT CASE WHEN s.sk IS NOT NULL THEN s.cents * 2 + 1
        |              WHEN t.user_id = 'u14' THEN 0
        |              ELSE t.amount END AS amount
        |  FROM b t LEFT JOIN s ON t.okey = s.sk AND s.matched = 1
        |  WHERE (s.sk IS NOT NULL AND NOT (s.cents % 10 < 5))
        |     OR (s.sk IS NULL AND t.user_id <> 'u13')
        |  UNION ALL
        |  SELECT s.cents AS amount FROM s WHERE s.matched = 0)
        |SELECT 'a_pre' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM b
        |UNION ALL
        |SELECT 'b_cur' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM cur
        |UNION ALL
        |SELECT 'c_regime' AS snap, CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS cents
        |ORDER BY snap""".stripMargin,
    "p43_type_widening" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |t AS (SELECT bucket, cents FROM b
        |  UNION ALL
        |  SELECT bucket, cents * 100000 AS cents FROM b WHERE okey % 31 = 2)
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    "p44_rename_column" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS okey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amt
        |  FROM orders),
        |t AS (SELECT bucket, amt AS cents FROM b
        |  UNION ALL
        |  SELECT bucket, amt * 3 AS cents FROM b WHERE okey % 31 = 2)
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents,
        |       CAST(0 AS BIGINT) AS nulls
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin,
    "p31_partition_evolution" ->
      """WITH b AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mday,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |p AS (SELECT mday, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM b
        |  WHERE mday >= DATE '1995-02-01' AND mday <= DATE '1996-01-01'
        |  GROUP BY 1)
        |SELECT 'a_mixed_layout' AS phase, mday, n, cents FROM p
        |UNION ALL
        |SELECT 'b_migrated' AS phase, mday, n, cents FROM p
        |ORDER BY phase, mday""".stripMargin,
    "p29_partitions_meta" ->
      """SELECT * FROM (VALUES
        |  ('tier~bronze', 1, 1, CAST(1 AS BIGINT)),
        |  ('tier~gold',   1, 0, CAST(1 AS BIGINT)),
        |  ('tier~silver', 1, 0, CAST(1 AS BIGINT)))
        |AS t("partition", files, masked_files, n_masked_preds)
        |ORDER BY "partition"""".stripMargin,
    "p26_metadata_tables" ->
      """SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 3, false, CAST(2 AS BIGINT)),
        |  (CAST(2 AS BIGINT), 2, true,  CAST(2 AS BIGINT)))
        |AS t(version, files, is_latest, n_live)
        |ORDER BY version""".stripMargin,
    "p24_ctas" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total
        |FROM b WHERE o_orderkey % 5 <> 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "p25_rtas" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'current' AS snap, COUNT(*) AS n,
        |  CAST(SUM(cents * 3 + 7) AS BIGINT) AS cents
        |FROM b WHERE bucket < 10
        |UNION ALL
        |SELECT 'v1' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM b
        |ORDER BY snap""".stripMargin,
    "p22_log_replace_where" ->
      """WITH i AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount,
        |    SHA256(CAST(o_orderkey AS VARCHAR)) AS sha256sum
        |  FROM orders),
        |f AS (SELECT * FROM i WHERE user_id NOT IN ('u13', 'u42')
        |      UNION ALL
        |      SELECT user_id, amount * 2 + 7 AS amount, sha256sum
        |      FROM i WHERE user_id IN ('u13', 'u42'))
        |SELECT user_id, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "p23_parquet_replace_where" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |f AS (SELECT o_orderkey, bucket, cents FROM b WHERE bucket NOT IN (3, 7)
        |      UNION ALL
        |      SELECT o_orderkey, bucket, cents * 3 + 11 AS cents
        |      FROM b WHERE bucket IN (3, 7))
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "p20_log_cdc" ->
      """WITH i AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount,
        |    SHA256(CAST(o_orderkey AS VARCHAR)) AS sha256sum
        |  FROM orders),
        |f AS (SELECT user_id,
        |    CASE WHEN amount < 1000000 THEN amount * 2 + 1 ELSE amount END AS amount,
        |    sha256sum
        |  FROM i WHERE user_id <> 'u7'),
        |ins AS (SELECT * FROM f EXCEPT ALL SELECT * FROM i),
        |del AS (SELECT * FROM i EXCEPT ALL SELECT * FROM f)
        |SELECT change_type, user_id, n, cents FROM (
        |  SELECT 'insert' AS change_type, user_id, COUNT(*) AS n,
        |         CAST(SUM(amount) AS BIGINT) AS cents FROM ins GROUP BY 2
        |  UNION ALL
        |  SELECT 'delete' AS change_type, user_id, COUNT(*) AS n,
        |         CAST(SUM(amount) AS BIGINT) AS cents FROM del GROUP BY 2)
        |ORDER BY change_type, user_id""".stripMargin,
    "p21_parquet_cdc" ->
      """WITH b AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |i AS (SELECT * FROM b WHERE o_orderkey % 2 = 0),
        |f AS (SELECT * FROM i WHERE cents >= 3000000
        |      UNION ALL SELECT * FROM b WHERE o_orderkey % 2 = 1),
        |ins AS (SELECT * FROM f EXCEPT ALL SELECT * FROM i),
        |del AS (SELECT * FROM i EXCEPT ALL SELECT * FROM f)
        |SELECT change_type, bucket, n, total FROM (
        |  SELECT 'insert' AS change_type, bucket, COUNT(*) AS n,
        |         CAST(SUM(cents) AS BIGINT) AS total FROM ins GROUP BY 2
        |  UNION ALL
        |  SELECT 'delete' AS change_type, bucket, COUNT(*) AS n,
        |         CAST(SUM(cents) AS BIGINT) AS total FROM del GROUP BY 2)
        |ORDER BY change_type, bucket""".stripMargin,
    "p19_parquet_bucketed_join" ->
      """WITH f AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |d AS (SELECT 'u' || CAST(c_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(c_acctbal AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM customer),
        |bal AS (SELECT user_id, COUNT(*) AS nc, CAST(SUM(amount) AS BIGINT) AS bal
        |        FROM d GROUP BY user_id)
        |SELECT f.user_id, COUNT(*) AS n, CAST(SUM(f.amount) AS BIGINT) AS cents,
        |       MAX(bal.nc) AS nc, MAX(bal.bal) AS bal
        |FROM f JOIN bal ON f.user_id = bal.user_id
        |GROUP BY f.user_id ORDER BY f.user_id""".stripMargin,
    "p16_parquet_update" ->
      """WITH t AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN o_orderkey <= 12000 OR cents < 3000000
        |           THEN cents * 2 + 1 ELSE cents END) AS BIGINT) AS total
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "p17_parquet_merge" ->
      """WITH base AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |t AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
        |s AS (SELECT o_orderkey, bucket, CAST(cents * 2 AS BIGINT) AS cents
        |      FROM base WHERE o_orderkey % 2 = 0),
        |merged AS (
        |  SELECT t.bucket, COALESCE(s.cents, t.cents) AS cents
        |  FROM t LEFT JOIN s ON t.o_orderkey = s.o_orderkey
        |  UNION ALL
        |  SELECT s.bucket, s.cents FROM s
        |  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.o_orderkey = s.o_orderkey))
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "p18_parquet_time_travel" ->
      """WITH t AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT 'current' AS snap, COUNT(*) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents
        |FROM t WHERE NOT (cents < 3000000)
        |UNION ALL
        |SELECT 'v1' AS snap, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS cents
        |FROM t
        |ORDER BY snap""".stripMargin,
    "p15_bucketed_join" ->
      """WITH f AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders),
        |d AS (SELECT 'u' || CAST(c_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(c_acctbal AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM customer),
        |bal AS (SELECT user_id, COUNT(*) AS nc, CAST(SUM(amount) AS BIGINT) AS bal
        |        FROM d GROUP BY user_id)
        |SELECT f.user_id, COUNT(*) AS n, CAST(SUM(f.amount) AS BIGINT) AS cents,
        |       MAX(bal.nc) AS nc, MAX(bal.bal) AS bal
        |FROM f JOIN bal ON f.user_id = bal.user_id
        |GROUP BY f.user_id ORDER BY f.user_id""".stripMargin,
    "p14_merge_into" ->
      """WITH base AS (SELECT o_orderkey AS okey,
        |    'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount,
        |    o_orderkey AS k
        |  FROM orders),
        |t AS (SELECT user_id, amount, okey FROM base WHERE okey % 3 <> 0),
        |s AS (SELECT user_id, CAST(amount * 2 AS BIGINT) AS amount, okey
        |      FROM base WHERE okey % 2 = 0),
        |merged AS (
        |  SELECT t.user_id, COALESCE(s.amount, t.amount) AS amount
        |  FROM t LEFT JOIN s ON t.okey = s.okey
        |  UNION ALL
        |  SELECT s.user_id, s.amount FROM s
        |  WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.okey = s.okey))
        |SELECT user_id, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "p13_log_update" ->
      """WITH t AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders)
        |SELECT user_id, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN user_id = 'u13' OR amount < 1000000
        |           THEN amount * 2 + 1 ELSE amount END) AS BIGINT) AS cents
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin,
    "p12_parquet_delete" ->
      """WITH t AS (SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |    CAST(o_custkey % 19 AS BIGINT) AS bucket,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS total,
        |       MIN(o_orderkey) AS k0, MAX(o_orderkey) AS k1
        |FROM t WHERE NOT (o_orderkey <= 12000 OR cents < 3000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p11_time_travel" ->
      """WITH t AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders)
        |SELECT 'current' AS snap, COUNT(*) AS n,
        |  CAST(SUM(amount) AS BIGINT) AS cents
        |FROM t WHERE NOT (amount < 1000000)
        |UNION ALL
        |SELECT 'v1' AS snap, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM t
        |ORDER BY snap""".stripMargin,
    "p10_log_delete" ->
      """WITH t AS (SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |    CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT) AS amount
        |  FROM orders)
        |SELECT user_id, COUNT(*) AS n, CAST(SUM(amount) AS BIGINT) AS cents
        |FROM t WHERE NOT (user_id = 'u13' OR amount < 1000000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p09_zorder_probe" ->
      """SELECT COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS BIGINT) AS total,
        |  MIN(o_orderkey) AS k0, MAX(o_orderkey) AS k1
        |FROM orders
        |WHERE o_custkey BETWEEN 10 AND 400
        |  AND CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)
        |      BETWEEN 2000000 AND 20000000""".stripMargin,
    "p08_catalog_skip_scan" ->
      """SELECT o_custkey % 10 AS bucket, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS BIGINT) AS total
        |FROM orders WHERE o_orderkey BETWEEN 100 AND 2000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "p07_log_count_pushdown" ->
      """SELECT COUNT(*) AS n,
        |  MIN(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS lo,
        |  MAX(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS hi,
        |  MIN('u' || CAST(o_custkey % 97 AS VARCHAR)) AS u0,
        |  MAX('u' || CAST(o_custkey % 97 AS VARCHAR)) AS u1
        |FROM orders""".stripMargin,
    "p06_log_roundtrip" ->
      """SELECT 'u' || CAST(o_custkey % 97 AS VARCHAR) AS user_id,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(9,2)) * 100 AS BIGINT)) AS BIGINT) AS cents,
        |  COUNT(DISTINCT SHA256(CAST(o_orderkey AS VARCHAR))) AS n_hashes
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "p05_mixture_sample" ->
      """WITH b AS (SELECT doc_id, lang,
        |    (INSTR('0123456789abcdef', SUBSTRING(SHA256(text), 1, 1)) - 1) * 16 +
        |     INSTR('0123456789abcdef', SUBSTRING(SHA256(text), 2, 1)) - 1 AS bucket
        |  FROM documents)
        |SELECT doc_id, lang, bucket FROM b
        |WHERE bucket < CASE WHEN lang = 'en' THEN 128
        |                    WHEN lang = 'de' THEN 192 ELSE 256 END
        |ORDER BY doc_id""".stripMargin,
    "p04_pack_sequences" ->
      """WITH b AS (SELECT doc_id,
        |    CAST(LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS BIGINT) AS n_tok,
        |    INSTR('0123456789abcdef', SUBSTRING(SHA256(text), 1, 1)) - 1 AS shard
        |  FROM documents),
        |o AS (SELECT doc_id, shard, n_tok,
        |    CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS end_off
        |  FROM b),
        |e AS (SELECT doc_id, shard, end_off, end_off - n_tok AS start_off FROM o)
        |SELECT shard, c AS seq_id, doc_id,
        |  GREATEST(start_off, c * 256) - start_off AS tok_begin,
        |  LEAST(end_off, (c + 1) * 256) - start_off AS tok_end
        |FROM e, UNNEST(RANGE(start_off // 256, (end_off - 1) // 256 + 1)) AS u(c)
        |ORDER BY shard, seq_id, doc_id""".stripMargin,
    "p03_corpus_prep" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    REGEXP_REPLACE(REGEXP_REPLACE(text, 'https?://\S+', '<URL>', 'g'),
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS clean_text
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, clean_text,
        |    LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(clean_text), '\s+')) AS n_tokens,
        |    CAST(LENGTH(clean_text) - LENGTH(REGEXP_REPLACE(clean_text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / LENGTH(clean_text) AS letter_ratio
        |  FROM s),
        |f AS (SELECT * FROM g WHERE letter_ratio > 0.5 AND n_tokens BETWEEN 10 AND 1000),
        |k AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY SHA256(clean_text)),
        |sv AS (SELECT * FROM f WHERE doc_id IN (SELECT doc_id FROM k)),
        |b AS (SELECT doc_id, n_tokens,
        |  (INSTR('0123456789abcdef', SUBSTRING(SHA256(clean_text), 1, 1)) - 1) * 16 +
        |   INSTR('0123456789abcdef', SUBSTRING(SHA256(clean_text), 2, 1)) - 1 AS bucket
        |  FROM sv)
        |SELECT CASE WHEN bucket < 205 THEN 'train'
        |            WHEN bucket < 230 THEN 'val'
        |            ELSE 'test' END AS split,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens_sum
        |FROM b GROUP BY 1 ORDER BY split""".stripMargin,
    "p02_split_assign" ->
      """WITH f AS (SELECT doc_id, SHA256(text) AS fp FROM documents),
        |b AS (SELECT doc_id,
        |  (INSTR('0123456789abcdef', SUBSTRING(fp, 1, 1)) - 1) * 16 +
        |   INSTR('0123456789abcdef', SUBSTRING(fp, 2, 1)) - 1 AS bucket FROM f)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 205 THEN 'train'
        |       WHEN bucket < 230 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "p01_clean_corpus" ->
      """WITH q AS (
        |  SELECT doc_id, text, lang,
        |    LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS n_tokens,
        |    CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / LENGTH(text) AS letter_ratio
        |  FROM documents),
        |f AS (
        |  SELECT * FROM q
        |  WHERE letter_ratio > 0.5 AND n_tokens BETWEEN 10 AND 1000),
        |k AS (
        |  SELECT MIN(doc_id) AS keep_id FROM f GROUP BY SHA256(text))
        |SELECT doc_id, lang, n_tokens, letter_ratio
        |FROM f WHERE doc_id IN (SELECT keep_id FROM k)
        |ORDER BY doc_id""".stripMargin)
}
