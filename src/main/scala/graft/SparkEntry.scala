package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module query registries; every entry has a
  * same-named column-aligned DuckDB oracle unless the operator is not
  * SQL-expressible (those get the driver's rows-only check). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01_pricing_summary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.Aggregates.queries ++
      operators.Windows.queries ++ operators.SetOps.queries ++
      operators.Scalars.queries ++ operators.StreamingQueries.queries ++
      operators.Dedup.queries ++ operators.Similarity.queries ++
      operators.TextAnalysis.queries ++ operators.Multimodal.queries ++
      operators.AsOf.queries ++ operators.UdxQueries.queries ++
      operators.Skew.queries ++ operators.Pipeline.queries ++
      operators.Reshape.queries ++ operators.Subqueries.queries ++
      operators.Behavioral.queries ++ operators.Frequency.queries ++
      operators.Intervals.queries ++ operators.Warehouse.queries ++
      operators.Curation.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracle ++ operators.Aggregates.oracle ++
      operators.Windows.oracle ++ operators.SetOps.oracle ++
      operators.Scalars.oracle ++ operators.StreamingQueries.oracle ++
      operators.Dedup.oracle ++ operators.Similarity.oracle ++
      operators.TextAnalysis.oracle ++ operators.Multimodal.oracle ++
      operators.AsOf.oracle ++ operators.UdxQueries.oracle ++
      operators.Skew.oracle ++ operators.Pipeline.oracle ++
      operators.Reshape.oracle ++ operators.Subqueries.oracle ++
      operators.Behavioral.oracle ++ operators.Frequency.oracle ++
      operators.Intervals.oracle ++ operators.Warehouse.oracle ++
      operators.Curation.oracle
}
