package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThan, Or}
import org.scalatest.funsuite.AnyFunSuite



/** Row-level DELETE on the entity log: zone-classified (untouched /
  * dropped-without-reading / rewritten), exact survivors, stats kept
  * exact, crash-fenced removal — plus the SQL path via the catalog. */
class LogDeleteSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  /** Fresh log with three single-segment commits of known shape:
    *   segment A: u1/u2, amounts 10..40
    *   segment B: every row user_id = "zz" (single-value zone)
    *   segment C: u7/u8, amounts 700..900 */
  private def freshLog(): String = {
    val dir = Files.createTempDirectory("graft_lhdel").toString
    def write(rows: Seq[(String, Long, String)], q: String): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "amount", "sha256sum")
        .select(col("user_id"), col("amount"),
          lit(null).cast("binary").as("msg"), col("sha256sum"))
        .repartition(1)
        .write.format(LimitHashLog.FORMAT).mode("append").save(dir)
      ()
    }
    write(Seq(("u1", 10L, "ha1"), ("u1", 20L, "ha2"), ("u2", 30L, "ha3"),
      ("u2", 40L, "ha4")), "a")
    write(Seq(("zz", 100L, "hb1"), ("zz", 200L, "hb2")), "b")
    write(Seq(("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")), "c")
    dir
  }

  private def names(dir: String): Set[String] =
    LimitHashLog.segments(dir).map(p => new Path(p._1).getName).toSet

  private def rows(dir: String): Set[(String, Long, String)] = {
    val df = spark.read.format(LimitHashLog.FORMAT).load(dir)
      .select("user_id", "amount", "sha256sum")
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
  }

  test("single-value zone segment is dropped without being read; others untouched") {
    val dir = freshLog()
    val before = names(dir)
    assert(before.size == 3)
    val table = new LimitHashLogTable(dir)
    assert(table.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("user_id", "zz"))))
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](EqualTo("user_id", "zz")))
    val after = names(dir)
    // metadata-only: the two clean segments keep their exact names (no
    // rewrite), the all-match segment is gone, nothing new appears
    assert(after.subsetOf(before) && (before -- after).size == 1)
    assert(rows(dir) == Set(("u1", 10L, "ha1"), ("u1", 20L, "ha2"),
      ("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
  }

  test("partial match rewrites only the affected segment, stats stay exact") {
    val dir = freshLog()
    val before = names(dir)
    val table = new LimitHashLogTable(dir)
    // matches half of segment A, all of nothing, none of B (amounts
    // 100/200 out of range? 15..35 excludes B and C zones entirely)
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      GreaterThanOrEqual("amount", 15L), LessThan("amount", 35L)))
    val after = names(dir)
    // B and C zones exclude [15,35) → untouched; A rewritten under a new name
    assert((before -- after).size == 1 && (after -- before).size == 1)
    assert((after -- before).head.startsWith("segment-del-"))
    assert(rows(dir) == Set(("u1", 10L, "ha1"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    // every surviving segment remains stats-covered (COUNT pushdown exact)
    val withStats = LimitHashLog.segmentsWithStats(dir)
    assert(withStats.nonEmpty && withStats.forall(_._3.isDefined))
    val rewritten = withStats.find(s => new Path(s._1).getName.startsWith("segment-del-")).get
    assert(rewritten._3.get.rows == 2L && rewritten._3.get.minAmount == 10L &&
      rewritten._3.get.maxAmount == 40L)
  }

  test("disjunctive predicate deletes across segments correctly") {
    val dir = freshLog()
    val table = new LimitHashLogTable(dir)
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      Or(EqualTo("user_id", "u8"), LessThan("amount", 15L))))
    assert(rows(dir) == Set(("u1", 20L, "ha2"), ("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"), ("u7", 700L, "hc1")))
  }

  test("unsupported filter is refused via canDeleteWhere") {
    val dir = freshLog()
    val table = new LimitHashLogTable(dir)
    assert(!table.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.StringContains("user_id", "u"))))
  }

  test("pre-removal crash resumes from the fence marker without loss or duplication") {
    val dir = freshLog()
    val filters = Array[org.apache.spark.sql.sources.Filter](EqualTo("user_id", "zz"))
    val expected = rows(dir).filterNot(_._1 == "zz")
    // simulate the crash window: replacements committed (none here — pure
    // drop), marker written, removals NOT executed
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = LimitHashLog.segmentsWithStats(dir)
      .find(_._3.exists(st => st.minUserId == "zz" && st.maxUserId == "zz")).get._1
    val delId = { // recompute the deterministic id the engine would use
      val repr = filters.map(_.toString).sorted.mkString("&")
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(repr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      "del-" + d.take(6).map(b => f"$b%02x").mkString
    }
    val marker = new Path(dir, s"_delete-$delId.committed")
    val out = fs.create(marker, true)
    out.write(new Path(victim).getName.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    // reader during the crash window sees old ∪ new — never a gap
    assert(rows(dir).filterNot(_._1 == "zz") == expected)
    // the retried DELETE resumes: finishes the removal, then is a no-op
    val table = new LimitHashLogTable(dir)
    table.deleteWhere(filters)
    assert(!fs.exists(marker))
    assert(rows(dir) == expected)
    table.deleteWhere(filters) // idempotent second run
    assert(rows(dir) == expected)
  }

  test("SQL DELETE FROM through the catalog, truncate via unconditional DELETE") {
    val wh = Files.createTempDirectory("graft_lhdel_cat").toString
    if (spark.conf.getOption("spark.sql.catalog.graft_del").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_del", "graft.sources.LogCatalog")
      spark.conf.set("spark.sql.catalog.graft_del.warehouse", wh)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_del.ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_del.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    import spark.implicits._
    Seq(("u1", 10L, "h1"), ("u2", 20L, "h2"), ("u3", 30L, "h3"), ("u3", 35L, "h4"))
      .toDF("user_id", "amount", "sha256sum")
      .select(col("user_id"), col("amount"),
        lit(null).cast("binary").as("msg"), col("sha256sum"))
      .writeTo("graft_del.ops.limits").overwrite(lit(true))
    spark.sql("DELETE FROM graft_del.ops.limits WHERE user_id = 'u3' OR amount < 15")
    val left = spark.table("graft_del.ops.limits")
      .select("user_id", "amount").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(left == Set(("u2", 20L)))
    spark.sql("DELETE FROM graft_del.ops.limits")
    assert(spark.table("graft_del.ops.limits").count() == 0L)
  }

  test("TRUNCATE TABLE statement empties the log and drops stale manifests") {
    val wh = Files.createTempDirectory("graft_lhdel_tr").toString
    if (spark.conf.getOption("spark.sql.catalog.graft_trunc").isEmpty) {
      spark.conf.set("spark.sql.catalog.graft_trunc", "graft.sources.LogCatalog")
      spark.conf.set("spark.sql.catalog.graft_trunc.warehouse", wh)
    }
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_trunc.ops")
    spark.sql("""CREATE TABLE IF NOT EXISTS graft_trunc.ops.limits
                 (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    import spark.implicits._
    Seq(("u1", 10L, "h1"), ("u2", 20L, "h2")).toDF("user_id", "amount", "sha256sum")
      .select(col("user_id"), col("amount"),
        lit(null).cast("binary").as("msg"), col("sha256sum"))
      .writeTo("graft_trunc.ops.limits").append()
    assert(spark.table("graft_trunc.ops.limits").count() == 2L)
    spark.sql("TRUNCATE TABLE graft_trunc.ops.limits")
    assert(spark.table("graft_trunc.ops.limits").count() == 0L)
    // manifests are gone too — a later write starts stats-clean
    val dir = new Path(s"$wh/ops/limits")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(dir).exists(_.getPath.getName.startsWith(".stats-manifest-")))
  }

  test("malformed lines pass through a rewrite unharmed and stay out of stats") {
    // ADVICE r8: the scans SKIP a line with the wrong field count; a
    // DELETE must neither crash on it nor destroy it
    val dir = freshLog()
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // plant foreign bytes inside segment A (the one the delete rewrites)
    val segA = LimitHashLog.segmentsWithStats(dir)
      .find(_._3.exists(_.minUserId == "u1")).get._1
    val garbled = "not\ta\tvalid-line\nu1\t999\n"
    val original = {
      val in = fs.open(new Path(segA))
      try in.readAllBytes() finally in.close()
    }
    val out = fs.create(new Path(segA), true) // local fs: append unsupported
    try {
      out.write(original)
      out.write(garbled.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    } finally out.close()
    val table = new LimitHashLogTable(dir)
    table.deleteWhere(Array[org.apache.spark.sql.sources.Filter](
      LessThan("amount", 25L))) // u1/10 and u1/20 go; u2 rows survive
    assert(rows(dir) == Set(("u2", 30L, "ha3"), ("u2", 40L, "ha4"),
      ("zz", 100L, "hb1"), ("zz", 200L, "hb2"),
      ("u7", 700L, "hc1"), ("u8", 800L, "hc2"), ("u8", 900L, "hc3")))
    // the malformed bytes are still in the rewritten segment, verbatim
    val rewrittenA = LimitHashLog.segments(dir)
      .map(_._1).find(new Path(_).getName.endsWith(new Path(segA).getName)).get
    val content = {
      val in = fs.open(new Path(rewrittenA))
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    assert(content.contains("not\ta\tvalid-line"))
    assert(content.contains("u1\t999"))
    // stats describe only what a scan sees: 2 surviving well-formed rows
    val st = LimitHashLog.segmentsWithStats(dir)
      .find(_._1 == rewrittenA).get._3
    assert(st.exists(_.rows == 2L))
  }

  test("null comparison values are rejected, not stringified to 'null'") {
    // ADVICE r8: EqualTo(a, null) matches nothing in SQL; evalRow's
    // String.valueOf would delete rows whose field is the TEXT "null"
    val table = new LimitHashLogTable(freshLog())
    assert(!table.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      EqualTo("user_id", null))))
    assert(!table.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      LessThan("amount", null))))
    // null IN-list MEMBERS stay supported (both evaluators drop them)
    assert(table.canDeleteWhere(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.In("user_id", Array("u1", null)))))
  }
}
