package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.functions.HashFns

/** Streaming near-duplicate detection against a PERSISTED signature
  * store — the production ingest shape for a training-data pipeline:
  * documents arrive as a stream, each micro-batch is sketched per-row
  * (MinHash signature + LSH bands, same construction as the batch
  * [[graft.operators.Dedup]]), candidate-matched against everything
  * ingested before it, and only novel documents' signatures join the
  * store.
  *
  * Scale decisions:
  *   - Dedup state lives in STORAGE (a compact parquet table of
  *     (doc_id, sig, bands) — ~0.5 KB/doc), not in streaming state:
  *     a flatMapGroupsWithState formulation would pin the entire sketch
  *     corpus in executor state-store memory forever (near-dup state
  *     never expires — there is no watermark that retires an old
  *     document), which caps corpus size at cluster RAM. Storage-backed
  *     state is unbounded and survives restarts for free.
  *   - Effectively-once via the [[ParquetBatchSink]] recipe: both the
  *     verdicts and the store appends are written to `batch_id=N`
  *     directories with overwrite, and the store read for batch N uses
  *     only `batch_id < N` — a replayed batch sees exactly the history
  *     its first attempt saw.
  *   - Verification uses the signature-agreement estimator (matching
  *     components / 64 ≥ threshold, an unbiased Jaccard estimate)
  *     instead of re-shingling: the store then never holds raw shingle
  *     sets, only fixed-width sketches.
  *   - Degenerate docs (too short to shingle → all-null signature) are
  *     passed through as novel, never bucketed — the same
  *     degenerate-bucket guard as the batch paths' count pre-filter.
  *   - Keep-first is keyed by doc_id (the convention of the whole dedup
  *     family): a doc is a dup iff a SMALLER id — earlier batch or same
  *     batch — matches. With id-ordered ingestion (snapshot/append
  *     pipelines) this equals keep-earliest-arrival; if ids arrive out
  *     of order, the id, not arrival time, decides the survivor.
  */
final class DedupStream(storeDir: String, verdictDir: String,
    nHashes: Int = 64, bands: Int = 16, agreeThreshold: Double = 0.75)
    extends Serializable {

  private val rowsPerBand = nHashes / bands

  /** Per-row sketch columns for a (doc_id, text) frame — the EXACT
    * batch-dedup construction ([[graft.operators.Dedup]] minhashDocs):
    * fused normalize → 3-gram windows → per-gram FNV-1a 64 (r20, the
    * d02 graduation precedent — xxhash64 is engine-private, FNV is
    * recomputable by the DuckDB oracle) → mod-P → 64-hash MinHash.
    * Sharing the batch family also means a batch-built store and a
    * streaming store are interchangeable. NOTE: stores persisted by
    * the pre-r20 xxhash64 sketch are not comparable against this
    * family — rebuild them (backfill through [[processBatch]]). */
  private def sketch(docs: DataFrame): DataFrame =
    docs
      .withColumn("_shh", transform(graft.functions.TextExprs.wordGramHashes(
        graft.functions.TextFns.normalized(col("text")), 3,
        distinct = false, fnv = true), h => pmod(h, lit(HashFns.P))))
      .withColumn("sig", HashFns.minhashFromBases(col("_shh"), nHashes))
      .withColumn("bands", HashFns.lshBands(col("sig"), bands, rowsPerBand))
      .select(col("doc_id"), col("sig"), col("bands"))

  private def readStore(spark: SparkSession, beforeBatch: Long): DataFrame = {
    // Hadoop FS, not java.io.File: the store is a table path, which on a
    // real cluster is HDFS/S3 — the same code must list it there.
    val base = new org.apache.hadoop.fs.Path(storeDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts =
      if (!fs.exists(base)) Array.empty[org.apache.hadoop.fs.FileStatus]
      else fs.listStatus(base).filter(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    if (parts.isEmpty) {
      import org.apache.spark.sql.types._
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("doc_id", LongType),
          StructField("sig", ArrayType(LongType, containsNull = true)),
          StructField("bands", ArrayType(LongType, containsNull = false)),
          StructField("batch_id", IntegerType))))
    } else {
      spark.read.option("basePath", storeDir).parquet(storeDir)
    }
  }.filter(col("batch_id") < beforeBatch)
    .select(col("doc_id"), col("sig"), col("bands"))

  /** Process one micro-batch: verdicts to verdictDir/batch_id=N, novel
    * signatures to storeDir/batch_id=N (both overwrite → replay-safe).
    * Public so batch backfills can drive the same logic directly. */
  def processBatch(df: DataFrame, batchId: Long): Unit = {
    val spark = df.sparkSession
    val batch = sketch(df).withColumn("real", col("sig").getItem(0).isNotNull)
      .cache()
    val history = readStore(spark, batchId)
    // candidate generation: shared (band index, band hash) between a
    // batch doc and any EARLIER doc (history, or same batch with a
    // smaller id — keep-first within the batch)
    val earlier = history.unionByName(batch.filter(col("real")).drop("real"))
      .select(col("doc_id").as("a"), col("sig").as("sig_a"),
        posexplode(col("bands")).as(Seq("band_i", "band_h")))
    val fresh = batch.filter(col("real"))
      .select(col("doc_id").as("b"), col("sig").as("sig_b"),
        posexplode(col("bands")).as(Seq("band_i", "band_h")))
    // signature-agreement verify, in-row on the joined pair: matching
    // components / nHashes — zip_with + size(filter(...)) stays codegen
    val agree = size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
      m => m)).cast("double") / nHashes
    val dups = earlier.join(fresh,
        Seq("band_i", "band_h")).filter(col("a") < col("b"))
      // agree is per-row codegen — cheaper to evaluate per band-collision
      // than to shuffle 1 KB sig payloads through a pair-distinct first
      .filter(agree >= agreeThreshold)
      .select(col("b").as("doc_id")).distinct()
      .withColumn("flag", lit(true))
    val verdicts = batch.select(col("doc_id"))
      .join(dups, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("flag"), lit(false)).as("is_dup"))
    verdicts.write.mode("overwrite").parquet(s"$verdictDir/batch_id=$batchId")
    batch.join(dups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("sig"), col("bands"))
      .write.mode("overwrite").parquet(s"$storeDir/batch_id=$batchId")
    batch.unpersist()
  }

  /** Drive a streaming (doc_id, text) frame through the dedup-ingest
    * loop. AvailableNow drains what is queued and terminates; use a
    * ProcessingTime trigger for continuous ingest. */
  def start(docs: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docs.writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (df: DataFrame, batchId: Long) => processBatch(df, batchId) }
      .start()

  /** Everything flagged so far, one row per ingested doc. */
  def verdicts(spark: SparkSession): DataFrame =
    spark.read.option("basePath", verdictDir).parquet(verdictDir)
      .select(col("doc_id"), col("is_dup"), col("batch_id"))
}
