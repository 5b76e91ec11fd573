package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Migrations
import graft.sources.Migrations.Migration

/** The goose contract (`migrate.go:13-34`) on embedded Derby: ordered
  * apply, ledger-tracked replay skip, out-of-order rejection, and
  * atomic (DDL + ledger row) failure rollback. */
class MigrationsSpec extends AnyFunSuite {

  private def freshUrl(): String =
    s"jdbc:derby:memory:mig_${java.util.UUID.randomUUID().toString.take(8)};create=true"

  private def columnsOf(url: String, table: String): Seq[String] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getColumns(null, null, table.toUpperCase, "%")
      val buf = Seq.newBuilder[String]
      while (rs.next()) buf += rs.getString("COLUMN_NAME").toLowerCase
      buf.result()
    } finally conn.close()
  }

  test("v1 bootstrap + v2 column-add apply exactly once across restarts") {
    val url = freshUrl()
    val chain = Migrations.limitsHashesChain()

    // first deploy: only v1 authored yet
    assert(Migrations.up(url, chain.take(1)) === Seq(1L))
    assert(columnsOf(url, "limits_hashes") ===
      Seq("user_id", "amount", "msg", "sha256sum"))

    // day two: v2 lands; a replayed `up` sees the full chain
    assert(Migrations.up(url, chain) === Seq(2L), "v1 must be skipped, v2 applied")
    assert(columnsOf(url, "limits_hashes") ===
      Seq("user_id", "amount", "msg", "sha256sum", "ingested_at"))

    // restart: the whole chain replays — nothing applies twice (a
    // re-run ALTER ADD COLUMN would throw 'column already exists')
    assert(Migrations.up(url, chain) === Seq.empty)
    assert(Migrations.applied(url).map(a => a.version) === Seq(1L, 2L))
  }

  test("an unrecorded version below the ledger high-water mark is rejected") {
    val url = freshUrl()
    val v1 = Migration(1L, "t1", Seq("CREATE TABLE t1 (x BIGINT)"))
    val v3 = Migration(3L, "t3", Seq("CREATE TABLE t3 (x BIGINT)"))
    assert(Migrations.up(url, Seq(v1, v3)) === Seq(1L, 3L))
    // v2 authored late, after v3 already ran
    val v2 = Migration(2L, "late t2", Seq("CREATE TABLE t2 (x BIGINT)"))
    val e = intercept[IllegalStateException] {
      Migrations.up(url, Seq(v1, v2, v3))
    }
    assert(e.getMessage.contains("out-of-order"))
    // nothing from the rejected run landed
    assert(Migrations.applied(url).map(_.version) === Seq(1L, 3L))
  }

  test("a failing migration rolls back atomically: no DDL, no ledger row") {
    val url = freshUrl()
    val good = Migration(1L, "ok", Seq("CREATE TABLE ok_t (x BIGINT)"))
    val bad = Migration(2L, "boom",
      Seq("CREATE TABLE half_t (x BIGINT)", "THIS IS NOT SQL"))
    val e = intercept[IllegalStateException] { Migrations.up(url, Seq(good, bad)) }
    assert(e.getMessage.contains("rolled back"))
    // v1 committed; v2's partial DDL and ledger row both rolled back
    assert(Migrations.applied(url).map(_.version) === Seq(1L))
    assert(columnsOf(url, "half_t").isEmpty, "rolled-back DDL must not persist")
    // the chain is re-runnable once the bad migration is fixed
    val fixed = Migration(2L, "boom", Seq("CREATE TABLE half_t (x BIGINT)"))
    assert(Migrations.up(url, Seq(good, fixed)) === Seq(2L))
  }

  test("duplicate versions are rejected up front") {
    val url = freshUrl()
    val a = Migration(1L, "a", Seq("CREATE TABLE a_t (x BIGINT)"))
    val b = Migration(1L, "b", Seq("CREATE TABLE b_t (x BIGINT)"))
    intercept[IllegalArgumentException] { Migrations.up(url, Seq(a, b)) }
    assert(Migrations.applied(url).isEmpty)
  }
}
