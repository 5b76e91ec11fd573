package graft.sources

import java.sql.{Connection, DriverManager}
import java.util.Properties

/** Versioned, ledgered schema migrations — the goose analog of the
  * reference's `migrate.go:13-34` (`goose.UpContext` over the
  * warehouse connection, tracking applied versions in a table). The
  * idempotent `CREATE IF NOT EXISTS` bootstrap ([[Schemas]]) covers
  * day one; this covers day two, when v2 adds a column and the DDL
  * must run EXACTLY ONCE across every deploy/restart of every node.
  *
  * Contract (goose's, re-stated):
  *   - migrations are (version, description, SQL statements), applied
  *     in ascending version order;
  *   - a `schema_migrations` ledger records each applied version; a
  *     replayed `up` skips every recorded version — restart-safe;
  *   - an UNRECORDED version at-or-below the ledger's high-water mark
  *     is rejected (out-of-order: it was authored after a later
  *     version already ran — applying it now would execute DDL against
  *     a schema shape it never targeted);
  *   - each migration's statements + its ledger row commit in ONE
  *     transaction where the engine allows (Derby DDL is
  *     transactional), so a crash mid-migration leaves either nothing
  *     or the recorded whole.
  *
  * Plain JDBC, no Spark session: migrations run against the WAREHOUSE
  * (the reference's posture — `migrate.go` talks straight to
  * ClickHouse), typically once from the driver before a job starts. */
object Migrations {

  final case class Migration(version: Long, description: String,
      statements: Seq[String]) {
    require(version > 0, s"migration versions start at 1: $version")
    require(statements.nonEmpty, s"migration $version has no statements")
  }

  val LedgerTable = "schema_migrations"

  final case class Applied(version: Long, description: String)

  private def withConnection[A](url: String, props: Properties)(f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  private def ledgerExists(conn: Connection): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
    try {
      var found = false
      while (!found && rs.next())
        found = rs.getString("TABLE_NAME").equalsIgnoreCase(LedgerTable)
      found
    } finally rs.close()
  }

  /** Ledger bootstrap DDL is PER-DIALECT — the ANSI inline-PRIMARY-KEY
    * form is Derby's (live-tested), but ClickHouse rejects it: its DDL
    * requires an ENGINE clause and takes ordering keys there, not as
    * column constraints (ADVICE r8). The ClickHouse text is pinned in
    * the golden contract spec alongside the table DDL. */
  val AnsiLedgerDdl: String =
    s"""CREATE TABLE $LedgerTable (
       |  version BIGINT NOT NULL PRIMARY KEY,
       |  description VARCHAR(256) NOT NULL,
       |  applied_at TIMESTAMP NOT NULL)""".stripMargin

  val ClickHouseLedgerDdl: String =
    s"""CREATE TABLE $LedgerTable (
       |  version Int64,
       |  description String,
       |  applied_at DateTime64(3))
       |ENGINE = MergeTree() ORDER BY version""".stripMargin

  private def ensureLedger(conn: Connection, ledgerDdl: String): Unit =
    if (!ledgerExists(conn)) {
      val st = conn.createStatement()
      try st.executeUpdate(ledgerDdl)
      finally st.close()
    }

  /** Versions already recorded, ascending. */
  def applied(url: String, props: Properties = new Properties): Seq[Applied] =
    withConnection(url, props) { conn =>
      if (!ledgerExists(conn)) Seq.empty
      else {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(
            s"SELECT version, description FROM $LedgerTable ORDER BY version")
          val buf = Seq.newBuilder[Applied]
          while (rs.next()) buf += Applied(rs.getLong(1), rs.getString(2))
          buf.result()
        } finally st.close()
      }
    }

  /** Apply every pending migration in version order; returns the
    * versions applied by THIS call. Recorded versions are skipped
    * (replay/restart-safe); an unrecorded version at-or-below the
    * ledger high-water mark throws. */
  def up(url: String, migrations: Seq[Migration],
      props: Properties = new Properties,
      ledgerDdl: String = AnsiLedgerDdl): Seq[Long] = {
    val sorted = migrations.sortBy(_.version)
    require(sorted.map(_.version).distinct.length == sorted.length,
      s"duplicate migration versions: ${sorted.map(_.version).mkString(",")}")
    withConnection(url, props) { conn =>
      ensureLedger(conn, ledgerDdl)
      val done = {
        val st = conn.createStatement()
        try {
          val rs = st.executeQuery(s"SELECT version FROM $LedgerTable")
          val buf = Set.newBuilder[Long]
          while (rs.next()) buf += rs.getLong(1)
          buf.result()
        } finally st.close()
      }
      val mark = if (done.isEmpty) 0L else done.max
      val pending = sorted.filterNot(m => done.contains(m.version))
      pending.find(_.version <= mark).foreach { m =>
        throw new IllegalStateException(
          s"out-of-order migration ${m.version} (${m.description}): ledger " +
            s"is at $mark — it was authored after a later version ran")
      }
      val auto = conn.getAutoCommit
      conn.setAutoCommit(false)
      try {
        pending.map { m =>
          try {
            val st = conn.createStatement()
            try m.statements.foreach(st.executeUpdate) finally st.close()
            val ins = conn.prepareStatement(
              s"INSERT INTO $LedgerTable (version, description, applied_at) VALUES (?, ?, ?)")
            try {
              ins.setLong(1, m.version)
              ins.setString(2, m.description.take(256))
              ins.setTimestamp(3, new java.sql.Timestamp(System.currentTimeMillis()))
              ins.executeUpdate()
            } finally ins.close()
            conn.commit() // DDL + ledger row land together (Derby: transactional DDL)
            m.version
          } catch { case e: Throwable =>
            try conn.rollback() catch { case _: Throwable => () }
            throw new IllegalStateException(
              s"migration ${m.version} (${m.description}) failed and was rolled back", e)
          }
        }
      } finally conn.setAutoCommit(auto)
    }
  }

  /** The reference's real schema as the standard migration chain:
    * v1 = the `limits_hashes` table implied by `hashes.go:25`
    * (goose's embedded FS ships empty — `migrations/embed.go:1` — so
    * v1 reconstructs the DDL the tests rely on); v2 is the canonical
    * day-two example: a nullable column add. ANSI text; a ClickHouse
    * deployment swaps in the engine clause via [[ClickHouseDialect]]
    * types (see the golden contract spec). */
  def limitsHashesChain(stringType: String = "VARCHAR(64)"): Seq[Migration] = Seq(
    Migration(1L, "create limits_hashes",
      Seq(s"""CREATE TABLE limits_hashes (
             |  user_id $stringType NOT NULL,
             |  amount BIGINT NOT NULL,
             |  msg $stringType,
             |  sha256sum $stringType NOT NULL)""".stripMargin)),
    Migration(2L, "add ingested_at to limits_hashes",
      Seq("ALTER TABLE limits_hashes ADD COLUMN ingested_at TIMESTAMP")))
}
