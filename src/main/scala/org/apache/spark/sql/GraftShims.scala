package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Expression bridge. In Spark 4 the Column API is decoupled
  * from Catalyst (Spark Connect split) and the converters live behind
  * `private[sql]`; third-party engines that ship native Expressions
  * (this one, Sedona, frameless, …) expose them via a same-package shim.
  * Nothing else of Spark's internals is touched. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Eager Column → catalyst conversion. `expression(c)` returns a lazy
    * `ColumnNodeExpression` adapter that defers conversion to the
    * analyzer — fine inside a plan the analyzer walks, but NOT inside a
    * custom node's expression fields that ship to executors (the
    * adapter wraps the non-serializable internal ColumnNode, and a
    * `.desc` column's SortOrder would stay hidden inside it). This
    * converts through the classic ColumnNodeToExpressionConverter, so
    * sort columns come back as real catalyst SortOrder trees. */
  def catalystExpression(c: Column): catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  /** DataFrame from a raw logical plan (custom operators build their
    * own nodes; the public API has no constructor for that). */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** The exact column-list text Spark's JDBC writer puts inside
    * `CREATE TABLE <t> (...)` for a dialect — `JdbcUtils.schemaString`
    * is `private[sql]`; the golden contract spec pins its ClickHouse
    * output so dialect drift is caught without a live server. */
  def jdbcSchemaString(dialect: org.apache.spark.sql.jdbc.JdbcDialect,
      schema: org.apache.spark.sql.types.StructType,
      caseSensitive: Boolean): String =
    execution.datasources.jdbc.JdbcUtils.schemaString(dialect, schema, caseSensitive, None)
  /** Spark's own ALTER TABLE schema-change application (position
    * handling, nested fields, validation) — `CatalogV2Util` is
    * `private[sql]`; the catalog reuses it rather than re-deriving the
    * semantics. */
  def applySchemaChanges(schema: org.apache.spark.sql.types.StructType,
      changes: Seq[org.apache.spark.sql.connector.catalog.TableChange]):
      org.apache.spark.sql.types.StructType =
    connector.catalog.CatalogV2Util.applySchemaChanges(
      schema, changes, Some("parquet"), "ALTER TABLE")
  /** Spark's Murmur3 string hash with the engine-wide seed 42 — the
    * SAME bytes-level function `functions.hash(col)` evaluates, so a
    * write path that pre-clusters with `hash(col)` and a catalog
    * `bucket` ScalarFunction that recomputes it agree bit-for-bit
    * (`Murmur3HashFunction` is `private[sql]`). */
  def murmur3(s: org.apache.spark.unsafe.types.UTF8String): Int =
    catalyst.expressions.Murmur3HashFunction.hash(
      s, org.apache.spark.sql.types.StringType, 42).toInt
  /** A Hadoop Configuration that works on BOTH driver and executors:
    * built from the running SparkEnv's SparkConf (so `spark.hadoop.*`
    * credentials/settings apply — `SparkHadoopUtil` is
    * `private[spark]`), falling back to a bare Configuration outside
    * any Spark process (plain unit-test code paths). Executor-side
    * partition readers that must resolve a FileSystem (deletion-vector
    * sidecar loads) use this instead of `new Configuration()`, which
    * would drop every spark.hadoop.* setting on s3a/abfs/kerberized
    * clusters. */
  def hadoopConf(): org.apache.hadoop.conf.Configuration = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) new org.apache.hadoop.conf.Configuration()
    else {
      // Cache the parsed base and hand out copy-constructed instances:
      // the copy constructor clones the loaded property map WITHOUT
      // re-parsing the Hadoop default XML resources (the ~ms cost this
      // call used to pay every time), while callers keep a private
      // mutable Configuration exactly as before.
      var base = cachedEnvConf
      if (base == null) {
        base = org.apache.spark.deploy.SparkHadoopUtil.get.newConfiguration(env.conf)
        cachedEnvConf = base
      }
      new org.apache.hadoop.conf.Configuration(base)
    }
  }
  @volatile private var cachedEnvConf: org.apache.hadoop.conf.Configuration = null
  /** Typed twin for non-string bucket keys: hash the INTERNAL value
    * with its own Spark type (seed 42) — integral/date columns hash
    * through different byte paths than strings, and only hashing with
    * the column's declared type keeps the layout bit-identical to
    * `functions.hash(col)` on that column. */
  def murmur3Typed(v: Any, dt: org.apache.spark.sql.types.DataType): Int =
    catalyst.expressions.Murmur3HashFunction.hash(v, dt, 42).toInt
}
