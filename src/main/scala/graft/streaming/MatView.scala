package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Incremental MATERIALIZED-VIEW maintenance — the streaming analogue
  * of ClickHouse's `AggregatingMergeTree` + materialized view: a
  * persisted per-key summary that every micro-batch folds its partial
  * aggregate into, so readers get an always-current aggregate without
  * ever scanning the raw stream's history.
  *
  * Effectively-once: merging counts is NOT naturally idempotent (a
  * replayed batch would double-count), so the view carries the last
  * applied batchId and [[maintain]] SKIPS any batch at or below it —
  * the same batchId-guard contract as the parquet sink (SURVEY §2.1
  * #3). Batches arrive in order within one streaming query, so a
  * single high-water mark suffices.
  *
  * Swap safety: the merged view is `localCheckpoint()`ed (materialized)
  * BEFORE the overwrite — otherwise the write plan would read the very
  * directory it is truncating. At 100 TB the view is keyed state
  * orders of magnitude smaller than the stream (per-key sums), and the
  * merge cost is O(|view| + |batch keys|) per trigger, independent of
  * stream history.
  */
class MatView(viewDir: String) extends Serializable {

  /** Fold one micro-batch's rows into the persisted summary.
    * Input needs (event_type, cents). */
  def maintain(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val existing = read(spark)
    val applied = existing.agg(max(col("_b"))).head()
    if (!applied.isNullAt(0) && applied.getLong(0) >= batchId) return // replay: no-op
    val part = batch.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"))
    val merged = existing.select(col("event_type"), col("n"), col("cents"))
      .union(part)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("cents")).as("cents"))
      .withColumn("_b", lit(batchId))
      .localCheckpoint() // materialize BEFORE overwriting our own input
    merged.write.mode("overwrite").parquet(viewDir)
  }

  def read(spark: SparkSession): DataFrame =
    try spark.read.parquet(viewDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        spark.range(0).select(
          lit("").as("event_type"), lit(0L).as("n"),
          lit(0L).cast(LongType).as("cents"), lit(-1L).as("_b"))
          .filter(lit(false))
    }
}
