package graft.sources

import org.apache.spark.sql.SparkSession

/** Idempotent DDL bootstrap — the Spark analogue of the reference's
  * goose migrations (`migrate.go:13-34`; the shipped migrations FS is
  * empty, `migrations/embed.go:1`, so the only real DDL is the
  * `limits_hashes` table implied by `hashes.go:25`).
  *
  * `CREATE TABLE IF NOT EXISTS` is safe to run on every startup, like
  * goose's `Up` tolerating ErrNoNextVersion (`migrate.go:29`).
  */
object Schemas {

  /** Ensure the ingest target exists as a parquet-backed table rooted at
    * `location`. Returns the table name. */
  def ensureLimitsHashes(spark: SparkSession, location: String): String = {
    val table = "limits_hashes"
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (
         |  user_id STRING,
         |  amount BIGINT,
         |  msg BINARY,
         |  sha256sum STRING)
         |USING parquet
         |LOCATION '$location'""".stripMargin)
    table
  }

  /** Register every corpus table as a temp view over its parquet file —
    * the engine's SQL surface (`spark.sql("SELECT ... FROM lineitem")`). */
  def registerCorpus(spark: SparkSession, dir: String): Unit =
    graft.Tables.all.keys.foreach { name =>
      val df = if (name == "events") graft.Tables.events(spark, dir)
               else graft.Tables.read(spark, dir, name)
      df.createOrReplaceTempView(name)
    }
}
