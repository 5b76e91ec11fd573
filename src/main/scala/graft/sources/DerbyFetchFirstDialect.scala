package graft.sources

import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types.{DataType, MetadataBuilder}

/** Correctness patch for Spark's Derby dialect under LIMIT/top-N
  * pushdown. Derby has no `LIMIT` keyword, so the builtin dialect's
  * `getLimitClause` returns an EMPTY string — but it still advertises
  * limit support (`supportsLimit` not overridden), so the optimizer
  * strips the global `Limit` node, reports `PushedTopN`/`PushedLimit`
  * in the plan, and ships SQL with no row bound at all: the scan
  * silently returns EVERY matching row (observed: a `.limit(20)`
  * probe returning 160 rows). This wrapper emits Derby's actual
  * bounding syntax, `FETCH FIRST n ROWS ONLY` (valid after ORDER BY,
  * exactly where Spark's SQL builder appends the clause), making the
  * pushdown both claimed AND true.
  *
  * The builtin `DerbyDialect` class is `private[jdbc]`, so the patch
  * DELEGATES to the instance the registry resolves for a `jdbc:derby:`
  * URL (captured before self-registration) and overrides only the
  * limit behavior. Every member the builtin is known to override
  * (javap'd against Spark 4.1.2) is forwarded — type mappings,
  * function-pushdown whitelist, error classification, DDL text — so
  * ClickHouse-independent Derby behavior is unchanged.
  *
  * OFFSET pushdown stays disabled: Derby's `OFFSET n ROWS` must
  * precede `FETCH FIRST`, but Spark's default SQL builder appends the
  * limit clause first — declining keeps the offset a Spark-side
  * operation rather than risking misordered SQL.
  *
  * Registration prepends, so this takes precedence over the builtin
  * for every `jdbc:derby:` URL in the session. */
class DerbyFetchFirstDialect(delegate: JdbcDialect) extends JdbcDialect {

  override def canHandle(url: String): Boolean = delegate.canHandle(url)

  // the fix
  override def getLimitClause(limit: Integer): String =
    if (limit > 0) s"FETCH FIRST $limit ROWS ONLY" else ""
  override def supportsOffset: Boolean = false

  // faithful forwarding of everything the builtin Derby dialect overrides
  override def isSupportedFunction(funcName: String): Boolean =
    delegate.isSupportedFunction(funcName)
  override def isObjectNotFoundException(e: java.sql.SQLException): Boolean =
    delegate.isObjectNotFoundException(e)
  override def isSyntaxErrorBestEffort(e: java.sql.SQLException): Boolean =
    delegate.isSyntaxErrorBestEffort(e)
  override def getCatalystType(sqlType: Int, typeName: String, size: Int,
      md: MetadataBuilder): Option[DataType] =
    delegate.getCatalystType(sqlType, typeName, size, md)
  override def getJDBCType(dt: DataType): Option[JdbcType] =
    delegate.getJDBCType(dt)
  override def isCascadingTruncateTable(): Option[Boolean] =
    delegate.isCascadingTruncateTable()
  override def renameTable(oldTable: Identifier, newTable: Identifier): String =
    delegate.renameTable(oldTable, newTable)
  override def getTableCommentQuery(table: String, comment: String): String =
    delegate.getTableCommentQuery(table, comment)
  override def getUpdateColumnNullabilityQuery(tableName: String,
      columnName: String, isNullable: Boolean): String =
    delegate.getUpdateColumnNullabilityQuery(tableName, columnName, isNullable)
  override def classifyException(e: Throwable, condition: String,
      messageParameters: Map[String, String], description: String,
      isRuntime: Boolean): Throwable with org.apache.spark.SparkThrowable =
    delegate.classifyException(e, condition, messageParameters, description,
      isRuntime)
}

object DerbyFetchFirstDialect {
  @volatile private var registered = false
  def register(): Unit = synchronized {
    if (!registered) {
      // REPLACE the builtin, don't shadow it: two matching dialects make
      // the registry hand back an AggregatedDialect whose limit clause
      // falls through to the default `LIMIT n` — the exact bug again
      val builtin = JdbcDialects.get("jdbc:derby:memory:probe")
      JdbcDialects.unregisterDialect(builtin)
      JdbcDialects.registerDialect(new DerbyFetchFirstDialect(builtin))
      registered = true
    }
  }
}
