package graft

import org.apache.spark.sql.{Encoders, GraftShims}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ClickHouseDialect
import graft.streaming.{AnsiMergeIdiom, ClickHouseMergeIdiom}

/** Golden contract: with no live ClickHouse in the sandbox, the next
  * best guard is pinning the EXACT SQL text the dialect + merge idiom
  * emit for the reference's `limits_hashes` schema. Any drift —
  * a type-mapping change, quoting change, idiom rewrite — fails this
  * spec and forces a deliberate golden update. */
class ClickHouseContractSpec extends AnyFunSuite {

  private def norm(s: String): String =
    s.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n").trim

  private def golden: String = {
    val in = getClass.getResourceAsStream("/golden/clickhouse_limits_hashes.sql")
    assert(in != null, "golden file missing: src/test/resources/golden/clickhouse_limits_hashes.sql")
    try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Rebuild the contract text from the LIVE code paths: the same
    * schemaString Spark's JDBC writer uses (via GraftShims — it is
    * private[sql]), the same MergeIdiom methods the sink calls. */
  private def render(): String = {
    val schema = Encoders.product[LimitHash].schema
    val cols = Seq("user_id", "amount", "msg", "sha256sum")
    val create = "CREATE TABLE limits_hashes (" +
      GraftShims.jdbcSchemaString(ClickHouseDialect, schema, caseSensitive = false) +
      ") ENGINE = MergeTree() ORDER BY `sha256sum`"
    val merge = ClickHouseMergeIdiom.merge(
      "`limits_hashes`", "`limits_hashes_stage`", Seq("sha256sum"), cols)
    val gc = ClickHouseMergeIdiom.deleteStaged("`limits_hashes_stage`", 7L)
    val ansi = AnsiMergeIdiom.merge(
      "\"limits_hashes\"", "\"limits_hashes_stage\"", Seq("sha256sum"), cols)
    val ledger = graft.sources.Migrations.ClickHouseLedgerDdl
    val mutDel = ClickHouseMergeIdiom.deleteWhere("`limits_hashes`",
      "`user_id` = 'test_user_001'")
    val mutAlterDel = ClickHouseMergeIdiom.alterDelete("`limits_hashes`",
      "`user_id` = 'test_user_001'")
    val mutUpd = ClickHouseMergeIdiom.updateWhere("`limits_hashes`",
      Seq("amount" -> "0"), "`user_id` = 'test_user_001'")
    s"""-- Golden contract: the EXACT SQL graft's JDBC tier emits against
       |-- ClickHouse for the reference's limits_hashes schema (hashes.go:25,
       |-- types per hashes_test.go:146). Reviewed against ClickHouse 23.3
       |-- syntax. Regenerate only for a DELIBERATE dialect change.
       |
       |-- [create] DataFrameWriter JDBC path: dialect type mapping + the
       |-- deployment's createTableOptions (engine clause shown as a
       |-- representative MergeTree keyed like the reference's dedup key).
       |$create
       |
       |-- [merge] StagedJdbcBatchSink delivery: ClickHouse has no MERGE; the
       |-- insert-if-absent idiom is a server-side anti-join INSERT.
       |$merge
       |
       |-- [gc] stage cleanup per batch: lightweight DELETE (ClickHouse >= 22.8).
       |$gc
       |
       |-- [ansi-merge] the Derby-proven ANSI shape of the same delivery step,
       |-- pinned for contrast (JdbcBatcherSpec drives it live).
       |$ansi
       |
       |-- [migrations-ledger] Migrations.up bootstrap on ClickHouse: ENGINE
       |-- clause + ordering key (the ANSI inline-PRIMARY-KEY form is
       |-- Derby-only; ClickHouse rejects it).
       |$ledger
       |
       |-- [mutation-delete] warehouse row mutation, lightweight form — the
       |-- exact statement shape the reference runs (hashes_test.go:237).
       |$mutDel
       |
       |-- [mutation-alter-delete] the classic ALTER mutation for deployments
       |-- predating lightweight DELETE (< 22.8).
       |$mutAlterDel
       |
       |-- [mutation-update] ClickHouse has no UPDATE statement; the only row
       |-- update is the ALTER TABLE mutation.
       |$mutUpd""".stripMargin
  }

  test("dialect + merge idiom emit exactly the pinned ClickHouse SQL") {
    assert(norm(render()) === norm(golden),
      "\n--- emitted ---\n" + render() + "\n--- golden ---\n" + golden)
  }

  test("mutation SQL: ClickHouse forms pinned, ANSI forms Derby-executable") {
    // ClickHouse: lightweight DELETE, classic ALTER mutations
    assert(ClickHouseMergeIdiom.deleteWhere("t", "`u` = 'x'") ===
      "DELETE FROM t WHERE `u` = 'x'")
    assert(ClickHouseMergeIdiom.alterDelete("t", "`u` = 'x'") ===
      "ALTER TABLE t DELETE WHERE `u` = 'x'")
    assert(ClickHouseMergeIdiom.updateWhere("t",
      Seq("amount" -> "0", "msg" -> "NULL"), "`u` = 'x'") ===
      "ALTER TABLE t UPDATE `amount` = 0, `msg` = NULL WHERE `u` = 'x'")
    // ANSI twins execute for real on Derby — the generated text is
    // valid SQL, not just a pinned string
    val url = s"jdbc:derby:memory:chmut_${java.util.UUID.randomUUID().toString.take(8)};create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE mut_t (\"user_id\" VARCHAR(32), \"amount\" BIGINT)")
      st.executeUpdate("INSERT INTO mut_t VALUES ('a', 1), ('b', 2), ('a', 3)")
      val upd = AnsiMergeIdiom.updateWhere("mut_t",
        Seq("amount" -> "0"), "\"user_id\" = 'a'")
      assert(upd === "UPDATE mut_t SET \"amount\" = 0 WHERE \"user_id\" = 'a'")
      assert(st.executeUpdate(upd) === 2)
      val del = AnsiMergeIdiom.deleteWhere("mut_t", "\"user_id\" = 'b'")
      assert(del === "DELETE FROM mut_t WHERE \"user_id\" = 'b'")
      assert(st.executeUpdate(del) === 1)
      val rs = st.executeQuery("SELECT COUNT(*), SUM(\"amount\") FROM mut_t")
      rs.next()
      assert(rs.getLong(1) === 2 && rs.getLong(2) === 0)
    } finally conn.close()
  }
}
