package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL-callable maintenance (`CALL graft.system.*`,
  * [[LogProcedures]]): round-trips for every verb on both storage
  * tiers, argument defaults, result rows, and the path-traversal guard
  * (ADVICE r9 — a CALL argument must reach no path the catalog
  * couldn't). */
class LogProceduresSpec extends AnyFunSuite {

  private val warehouse: String =
    Files.createTempDirectory("graft_proc_wh").toString

  lazy val spark: SparkSession = {
    val s = graft.Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_proc", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_proc.warehouse", warehouse)
    s
  }

  private def mkLog(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ops")
    spark.sql(s"DROP TABLE IF EXISTS graft_proc.ops.$name")
    spark.sql(s"""CREATE TABLE graft_proc.ops.$name
      (user_id STRING, amount BIGINT, msg BINARY, sha256sum STRING)""")
    (0 until 3).foreach { i =>
      spark.range(i * 10, i * 10 + 10).select(
        concat(lit("u"), col("id") % 5).as("user_id"),
        (col("id") * 3).as("amount"),
        lit(null).cast("binary").as("msg"),
        sha2(col("id").cast("string"), 256).as("sha256sum"))
        .repartition(1)
        .writeTo(s"graft_proc.ops.$name").append()
    }
    s"graft_proc.ops.$name"
  }

  private def mkParquet(name: String): String = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.lake")
    spark.sql(s"DROP TABLE IF EXISTS graft_proc.lake.$name")
    spark.sql(s"CREATE TABLE graft_proc.lake.$name (id BIGINT, score BIGINT)")
    (0 until 4).foreach { i =>
      spark.range(i * 25, i * 25 + 25)
        .select(col("id"), (col("id") * 2).as("score"))
        .repartition(1)
        .writeTo(s"graft_proc.lake.$name").append()
    }
    s"graft_proc.lake.$name"
  }

  test("enable_versioning → vacuum round-trip on a log table") {
    val t = mkLog("l1")
    val v = spark.sql(
      "CALL graft_proc.system.enable_versioning(table => 'ops.l1')")
      .collect()(0).getLong(0)
    assert(v === 1L)
    spark.sql(s"DELETE FROM $t WHERE amount < 30") // v2
    val deleted = spark.sql(
      "CALL graft_proc.system.vacuum(table => 'ops.l1', retain_last => 1)")
      .collect()(0).getLong(0)
    assert(deleted >= 1L)
    assert(spark.table(t).count() === 20L)
  }

  test("compact_log round-trip: fewer segments, same rows") {
    val t = mkLog("l2")
    val before = spark.table(t).collect().map(_.toString).sorted
    val row = spark.sql(
      """CALL graft_proc.system.compact_log(table => 'ops.l2',
        |compaction_id => 'proc1')""".stripMargin).collect()(0)
    assert(row.getLong(0) === 3L) // segments_before
    assert(row.getLong(2) === 1L) // segments_after
    assert(spark.table(t).collect().map(_.toString).sorted === before)
  }

  test("enable_versioning + compact_table dispatch to the parquet tier") {
    val t = mkParquet("p1")
    val v = spark.sql(
      "CALL graft_proc.system.enable_versioning(table => 'lake.p1')")
      .collect()(0).getLong(0)
    assert(v === 1L)
    val row = spark.sql(
      "CALL graft_proc.system.compact_table(table => 'lake.p1')").collect()(0)
    assert(row.getLong(0) === 4L && row.getLong(3) === 1L)
    // versioned compaction published a commit: v1 still readable
    assert(spark.sql(s"SELECT count(*) AS n FROM $t VERSION AS OF 1")
      .collect()(0).getLong(0) === 100L)
    val deleted = spark.sql(
      "CALL graft_proc.system.vacuum(table => 'lake.p1', retain_last => 1)")
      .collect()(0).getLong(0)
    assert(deleted === 4L)
    assert(spark.table(t).count() === 100L)
  }

  test("set_bucket_spec pins the layout on both tiers") {
    mkLog("l3"); mkParquet("p2")
    val r1 = spark.sql(
      "CALL graft_proc.system.set_bucket_spec(table => 'ops.l3', col => 'user_id', n => 4)")
      .collect()(0)
    assert(r1.getString(0) === "user_id" && r1.getInt(1) === 4)
    assert(LogBucketing.readSpec(s"$warehouse/ops/l3")
      .contains(LogBucketing.Spec("user_id", 4)))
    val err = intercept[Exception] {
      spark.sql(
        "CALL graft_proc.system.set_bucket_spec(table => 'ops.l3', col => 'user_id', n => 8)")
    }
    assert(err.getMessage.contains("already bucketed"))
    // parquet tier: col must exist and be a string
    val err2 = intercept[Exception] {
      spark.sql(
        "CALL graft_proc.system.set_bucket_spec(table => 'lake.p2', col => 'id', n => 4)")
    }
    assert(err2.getMessage.toLowerCase.contains("string"))
  }

  test("path traversal in CALL arguments is rejected") {
    mkLog("l4")
    val outside = Files.createTempDirectory("graft_proc_outside")
    Files.createFile(outside.resolve("victim.txt"))
    val err = intercept[Exception] {
      spark.sql(s"CALL graft_proc.system.vacuum(table => '../${outside.getFileName}')")
    }
    assert(err.getMessage.contains("bad table identifier") ||
      err.getMessage.contains("plain names"))
    assert(Files.exists(outside.resolve("victim.txt")))
  }

  test("procedures are listable and unknown names fail with the catalog's list") {
    val shown = spark.sql("SHOW PROCEDURES IN graft_proc.system")
    val nameIdx = shown.schema.fields.lastIndexWhere(f =>
      f.dataType == org.apache.spark.sql.types.StringType &&
        f.name.toLowerCase.contains("name"))
    val names = shown.collect().map(_.getString(nameIdx)).toSet
    assert(Set("enable_versioning", "vacuum", "compact_log", "compact_table",
      "set_bucket_spec", "rollback_to_version", "delete_where").subsetOf(names))
  }

  test("clean_staging reclaims idle CTAS orphans, spares fresh ones and real tables") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.lake")
    val ns = new org.apache.hadoop.fs.Path(s"$warehouse/lake")
    val fs = ns.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // an orphaned staging dir from a dead driver (old mtimes)...
    val orphan = new org.apache.hadoop.fs.Path(ns, ".ctas-dead-0123456789ab")
    fs.mkdirs(new org.apache.hadoop.fs.Path(orphan, "data"))
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(orphan, old, old)
    fs.setTimes(new org.apache.hadoop.fs.Path(orphan, "data"), old, old)
    // ...a FRESH staging dir (a live CTAS mid-write)...
    val live = new org.apache.hadoop.fs.Path(ns, ".ctas-live-0123456789ab")
    fs.mkdirs(live)
    // ...and a real table that must never be touched
    spark.sql("DROP TABLE IF EXISTS graft_proc.lake.keepme")
    spark.sql("CREATE TABLE graft_proc.lake.keepme (id BIGINT)")
    val removed = spark.sql(
      "CALL graft_proc.system.clean_staging(namespace => 'lake')")
      .collect()(0).getLong(0)
    assert(removed === 1L)
    assert(!fs.exists(orphan), "idle orphan must be reclaimed")
    assert(fs.exists(live), "a fresh staging dir may be a live CTAS")
    assert(fs.exists(new org.apache.hadoop.fs.Path(ns, "keepme")))
    // older_than_hours => 0 sweeps the fresh one too
    val removed2 = spark.sql(
      "CALL graft_proc.system.clean_staging(namespace => 'lake', older_than_hours => 0)")
      .collect()(0).getLong(0)
    assert(removed2 === 1L && !fs.exists(live))
  }

  test("rollback_to_version restores an old snapshot on the log tier (history kept)") {
    val t = mkLog("l5")
    spark.sql("CALL graft_proc.system.enable_versioning(table => 'ops.l5')")
    val before = spark.table(t).orderBy("amount", "sha256sum")
      .collect().map(_.toString).toSeq
    val v1 = spark.sql(s"SELECT COUNT(*) FROM $t").head.getLong(0)
    assert(v1 === 30L)
    // mutate CURRENT: delete a third of the rows
    spark.sql(s"DELETE FROM $t WHERE amount % 3 = 0 AND amount > 0")
    assert(spark.table(t).count() < 30L)
    val res = spark.sql(
      "CALL graft_proc.system.rollback_to_version(table => 'ops.l5', version => 1)")
      .collect()(0)
    assert(res.getLong(0) === 1L) // restored_version
    assert(res.getLong(1) >= 3L)  // new version published on top
    // CURRENT is bit-identical to the pre-delete state
    val after = spark.table(t).orderBy("amount", "sha256sum")
      .collect().map(_.toString).toSeq
    assert(after === before)
    // the rolled-back (deleted) state remains time-travelable
    val vDel = res.getLong(1) - 1
    assert(spark.sql(s"SELECT COUNT(*) FROM $t VERSION AS OF $vDel")
      .head.getLong(0) < 30L)
    // unknown ordinal fails cleanly
    val err = intercept[Exception] {
      spark.sql("CALL graft_proc.system.rollback_to_version(table => 'ops.l5', version => 99)")
    }
    assert(err.getMessage.contains("does not exist"))
  }

  test("rollback_to_version restores an old snapshot on the parquet tier") {
    val t = mkParquet("p5")
    spark.sql("CALL graft_proc.system.enable_versioning(table => 'lake.p5')")
    assert(spark.table(t).count() === 100L)
    spark.sql(s"DELETE FROM $t WHERE id >= 50")
    assert(spark.table(t).count() === 50L)
    val res = spark.sql(
      "CALL graft_proc.system.rollback_to_version(table => 'lake.p5', version => 1)")
      .collect()(0)
    assert(res.getLong(0) === 1L)
    assert(spark.table(t).count() === 100L)
    assert(spark.table(t).agg(sum("score")).head.getLong(0) === (0L until 100L).map(_ * 2).sum)
  }

  test("history lists every version with publish time and file count") {
    mkLog("l7")
    spark.sql("CALL graft_proc.system.enable_versioning(table => 'ops.l7')")
    spark.sql("DELETE FROM graft_proc.ops.l7 WHERE amount >= 60")
    val hist = spark.sql("CALL graft_proc.system.history(table => 'ops.l7')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(hist.map(_._1).toSeq === (1L to hist.length))
    assert(hist.forall(_._2 > 0L))
    assert(hist.head._3 === 3) // v1 = the three initial segments
    assert(hist.last._3 < 3)   // the delete dropped a whole segment
    // un-versioned table errors with guidance
    mkLog("l8")
    val err = intercept[Exception] {
      spark.sql("CALL graft_proc.system.history(table => 'ops.l8')")
    }
    assert(err.getMessage.contains("enable_versioning"))
  }

  test("delete_where deletes by predicate through the catalog on both tiers") {
    mkLog("l6")
    val r1 = spark.sql(
      "CALL graft_proc.system.delete_where(table => 'ops.l6', predicate => 'amount >= 60')")
      .collect()(0)
    assert(r1.getLong(0) === 10L) // amounts 60..87 step 3
    assert(spark.table("graft_proc.ops.l6").count() === 20L)
    mkParquet("p6")
    val r2 = spark.sql(
      "CALL graft_proc.system.delete_where(table => 'lake.p6', predicate => 'id % 2 = 0')")
      .collect()(0)
    assert(r2.getLong(0) === 50L)
    assert(spark.table("graft_proc.lake.p6").count() === 50L)
    // traversal guard applies to delete_where too
    val err = intercept[Exception] {
      spark.sql("CALL graft_proc.system.delete_where(table => '../x', predicate => 'true')")
    }
    assert(err.getMessage.contains("bad table identifier") ||
      err.getMessage.contains("plain names"))
  }

  test("ann_search serves the persisted IVF index from pure SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ann")
    import spark.implicits._
    // 4 well-separated archetypes (IvfIndexSpec's corpus shape): a
    // planted copy's unique top-1 is its original
    val dim = 16
    val corpus = (0 until 120).map { i =>
      val arch = i % 4
      (i.toLong, Array.tabulate(dim) { d =>
        (if (d % 4 == arch) 1.0f else 0.05f) +
          0.005f * (((i * 31 + d * 17) % 101) - 50)
      })
    }.toDF("vec_id", "embedding")
    graft.operators.IvfIndex.build(spark, corpus, "graft_proc.ann.e", k = 8)
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.q")
    corpus.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("qid"), col("embedding").as("qe"))
      .createOrReplaceTempView("proc_ann_q_in")
    spark.sql("CREATE TABLE graft_proc.ann.q AS SELECT * FROM proc_ann_q_in")
    val rows = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e',
        |  queries => 'ann.q', n_probe => 2, top_k => 2)""".stripMargin)
      .collect()
    assert(rows.length === 6, s"3 queries × top_k 2, got ${rows.length}")
    val top1 = rows.filter(_.getInt(1) === 1)
      .map(r => r.getLong(0) - 1000 -> r.getLong(2)).toMap
    assert(top1 === Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
    assert(rows.filter(_.getInt(1) === 1).forall(_.getDouble(3) > 0.999),
      "a planted copy's top-1 cosine must be ~1.0")
    // defaults apply (n_probe 2, top_k 10 — each probed pool is ~30
    // candidates, so every query fills its 10)
    val withDefaults = spark.sql(
      "CALL graft_proc.system.ann_search(index => 'ann.e', queries => 'ann.q')")
      .collect()
    assert(withDefaults.length === 30, s"got ${withDefaults.length}")
    // identifier sanitation
    val err = intercept[Exception] {
      spark.sql("CALL graft_proc.system.ann_search(index => '../x', queries => 'ann.q')")
    }
    assert(err.getMessage.contains("plain names"), err.getMessage)
  }

  test("the full IVF lifecycle is SQL-native: ann_build -> ann_stats -> ann_refresh -> ann_search") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ann")
    import spark.implicits._
    val dim = 16
    def vecs(from: Int, until: Int) = (from until until).map { i =>
      val arch = i % 4
      (i.toLong, Array.tabulate(dim) { d =>
        (if (d % 4 == arch) 1.0f else 0.05f) +
          0.005f * (((i * 31 + d * 17) % 101) - 50)
      })
    }.toDF("vec_id", "embedding")
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.c")
    vecs(0, 120).createOrReplaceTempView("proc_ann_c_in")
    spark.sql("CREATE TABLE graft_proc.ann.c AS SELECT * FROM proc_ann_c_in")
    spark.sql("CALL graft_proc.system.enable_versioning(table => 'ann.c')")
    // build from SQL: cells, vectors, version, baseline all reported
    val built = spark.sql(
      "CALL graft_proc.system.ann_build(index => 'ann.e2', corpus => 'ann.c', k => 8)").head
    assert(built.getLong(0) === 8L && built.getLong(1) === 120L)
    assert(built.getLong(2) >= 1L && built.getDouble(3) > 0.0)
    // the drift gauge from SQL: fresh index reads healthy
    val st0 = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.e2')").head
    assert(st0.getLong(0) === 8L && st0.getLong(1) === 120L)
    assert(!st0.getBoolean(8), s"fresh index must not want a rebuild: $st0")
    assert(st0.getDouble(7) < 1.5, s"drift ratio ~1 expected: $st0")
    // corpus grows; refresh from SQL folds the delta + runs hygiene
    vecs(120, 140).createOrReplaceTempView("proc_ann_c2_in")
    spark.sql("INSERT INTO graft_proc.ann.c SELECT * FROM proc_ann_c2_in")
    val rf = spark.sql(
      "CALL graft_proc.system.ann_refresh(index => 'ann.e2', corpus => 'ann.c')").head
    assert(rf.getLong(0) > built.getLong(2), s"refresh must advance the version: $rf")
    val st1 = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.e2')").head
    assert(st1.getLong(1) === 140L, s"refreshed index must carry the appends: $st1")
    // an appended vector's planted copy is served through the SQL verb
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.q2")
    vecs(0, 140).filter(col("vec_id") === 133L)
      .select((col("vec_id") + 1000).as("qid"), col("embedding").as("qe"))
      .createOrReplaceTempView("proc_ann_q2_in")
    spark.sql("CREATE TABLE graft_proc.ann.q2 AS SELECT * FROM proc_ann_q2_in")
    val hit = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e2',
        |  queries => 'ann.q2', n_probe => 2, top_k => 1)""".stripMargin).head
    assert(hit.getLong(2) === 133L, s"appended vector must be servable: $hit")

    // QUANTIZED build from SQL: code-only lists, and ann_search
    // auto-dispatches through the coarse+refine path
    spark.sql("""CALL graft_proc.system.ann_build(index => 'ann.eq',
      corpus => 'ann.c', k => 8, quantized => true)""")
    assert(spark.table("graft_proc.ann.eq_assign")
      .schema.fieldNames.contains("q8"))
    val qhit = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.eq',
        |  queries => 'ann.q2', n_probe => 2, top_k => 1)""".stripMargin).head
    assert(qhit.getLong(2) === 133L && qhit.getDouble(3) > 0.999,
      s"quantized index must serve the planted copy exactly: $qhit")
    // the drift gauge reads the dequantized sample on quantized indexes
    val qst = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.eq')").head
    assert(!qst.getBoolean(8) && qst.getDouble(7) < 1.5, s"$qst")
  }

  test("ann_search where: payload predicate pre-filters inside the scan from pure SQL") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ann")
    import spark.implicits._
    val dim = 16
    def emb(i: Int) = Array.tabulate(dim) { d =>
      (if (d % 4 == i % 4) 1.0f else 0.05f) +
        0.005f * (((i * 31 + d * 17) % 101) - 50)
    }
    // corpus with a `label` attribute + one in-slice planted copy of
    // vector 3 — the out-of-slice original wins the global tie, so a
    // post-filtered search would answer wrongly (v14's construction)
    val corpus = ((0 until 120).map(i => (i.toLong, emb(i), i % 5)) :+
      ((10003L, emb(3), 99))).toDF("vec_id", "embedding", "label")
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.c4")
    corpus.createOrReplaceTempView("proc_ann_c4_in")
    spark.sql("CREATE TABLE graft_proc.ann.c4 AS SELECT * FROM proc_ann_c4_in")
    spark.sql("""CALL graft_proc.system.ann_build(index => 'ann.e4',
      corpus => 'ann.c4', k => 8, payload => 'label')""")
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.q4")
    corpus.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 1000).as("qid"), col("embedding").as("qe"))
      .createOrReplaceTempView("proc_ann_q4_in")
    spark.sql("CREATE TABLE graft_proc.ann.q4 AS SELECT * FROM proc_ann_q4_in")
    val unfiltered = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e4',
        |  queries => 'ann.q4', n_probe => 2, top_k => 1)""".stripMargin).head
    assert(unfiltered.getLong(2) === 3L, s"global top-1 is the original: $unfiltered")
    val filtered = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e4',
        |  queries => 'ann.q4', n_probe => 2, top_k => 1,
        |  where => 'label = 99')""".stripMargin).head
    assert(filtered.getLong(2) === 10003L && filtered.getDouble(3) > 0.999,
      s"the where-predicate must pre-filter to the in-slice copy: $filtered")
  }

  test("ann_rebuild re-fits ONLINE: atomic generation swap, drift gauge reset, " +
      "search + refresh keep serving — raw and quantized layouts") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ann")
    import spark.implicits._
    val dim = 16
    def vecs(from: Int, until: Int, shifted: Boolean = false) =
      (from until until).map { i =>
        val arch = i % 4
        (i.toLong, Array.tabulate(dim) { d =>
          if (shifted) 5.0f + 0.05f * (((i * 13 + d * 7) % 101) - 50)
          else (if (d % 4 == arch) 1.0f else 0.05f) +
            0.005f * (((i * 31 + d * 17) % 101) - 50)
        })
      }.toDF("vec_id", "embedding")
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.c3")
    vecs(0, 150).createOrReplaceTempView("proc_ann_c3_in")
    spark.sql("CREATE TABLE graft_proc.ann.c3 AS SELECT * FROM proc_ann_c3_in")
    spark.sql("CALL graft_proc.system.enable_versioning(table => 'ann.c3')")
    spark.sql(
      "CALL graft_proc.system.ann_build(index => 'ann.e3', corpus => 'ann.c3', k => 8)")
    // the corpus walks away from the quantizer (full shift), refresh
    // folds it in, and the SQL gauge asks for a rebuild
    spark.sql("DELETE FROM graft_proc.ann.c3 WHERE vec_id >= 0")
    vecs(0, 150, shifted = true).createOrReplaceTempView("proc_ann_c3_shift")
    spark.sql("INSERT INTO graft_proc.ann.c3 SELECT * FROM proc_ann_c3_shift")
    spark.sql(
      "CALL graft_proc.system.ann_refresh(index => 'ann.e3', corpus => 'ann.c3')")
    val stBad = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.e3')").head
    assert(stBad.getBoolean(8), s"the shift must flag needs_rebuild: $stBad")
    // the ONLINE answer — no DROP-then-repersist outage (ann_build's
    // shape); one atomic meta swap, baseline reset, generation advanced
    val rb = spark.sql(
      "CALL graft_proc.system.ann_rebuild(index => 'ann.e3', corpus => 'ann.c3', k => 8)").head
    assert(rb.getLong(0) === 8L && rb.getLong(1) === 150L, s"$rb")
    assert(rb.getDouble(3) > 0.0 && rb.getLong(4) === 1L, s"$rb")
    val stGood = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.e3')").head
    assert(!stGood.getBoolean(8) && stGood.getDouble(7) < 1.5,
      s"rebuild must reset the gauge: $stGood")
    assert(stGood.getLong(9) === 1L,
      s"ann_stats must expose the advanced generation: $stGood")
    assert(stBad.getLong(9) === 0L, "pre-rebuild legacy generation reads 0")
    // post-swap search is exact on the shifted corpus
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.q3")
    spark.table("graft_proc.ann.c3").filter(col("vec_id") === 77L)
      .select((col("vec_id") + 1000).as("qid"), col("embedding").as("qe"))
      .createOrReplaceTempView("proc_ann_q3_in")
    spark.sql("CREATE TABLE graft_proc.ann.q3 AS SELECT * FROM proc_ann_q3_in")
    val hit = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e3',
        |  queries => 'ann.q3', n_probe => 2, top_k => 1)""".stripMargin).head
    assert(hit.getLong(2) === 77L && hit.getDouble(3) > 0.999, s"$hit")
    // refresh keeps working against the new generation
    vecs(150, 170, shifted = true).createOrReplaceTempView("proc_ann_c3_app")
    spark.sql("INSERT INTO graft_proc.ann.c3 SELECT * FROM proc_ann_c3_app")
    spark.sql(
      "CALL graft_proc.system.ann_refresh(index => 'ann.e3', corpus => 'ann.c3')")
    val stApp = spark.sql("CALL graft_proc.system.ann_stats(index => 'ann.e3')").head
    assert(stApp.getLong(1) === 170L, s"post-rebuild refresh must fold appends: $stApp")

    // QUANTIZED index: rebuild keeps the SQ8 layout and the corpus
    // pointer — ann_search still dispatches coarse+refine and answers
    // the planted copy exactly through the new generation
    spark.sql("""CALL graft_proc.system.ann_build(index => 'ann.eq3',
      corpus => 'ann.c3', k => 8, quantized => true)""")
    val rbq = spark.sql(
      "CALL graft_proc.system.ann_rebuild(index => 'ann.eq3', corpus => 'ann.c3', k => 8)").head
    assert(rbq.getLong(4) === 1L, s"$rbq")
    assert(spark.table(
      graft.operators.IvfIndex.assignTableName(spark, "graft_proc.ann.eq3"))
      .schema.fieldNames.contains("q8"),
      "rebuild must keep the quantized layout")
    val qhit = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.eq3',
        |  queries => 'ann.q3', n_probe => 2, top_k => 1)""".stripMargin).head
    assert(qhit.getLong(2) === 77L && qhit.getDouble(3) > 0.999, s"$qhit")
  }

  test("ann_rebuild(payload => ...): a live index gains a filter attribute " +
      "through a gap-free rebuild, and the default k auto-sizes from the corpus") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_proc.ann")
    import spark.implicits._
    val dim = 16
    def emb(i: Int) = Array.tabulate(dim) { d =>
      (if (d % 4 == i % 4) 1.0f else 0.05f) +
        0.005f * (((i * 31 + d * 17) % 101) - 50)
    }
    // v14's construction: one in-slice (label 99) planted copy of
    // vector 3 — the out-of-slice original wins the global tie, so only
    // true pre-filter semantics on the NEW column find the copy
    val corpus = ((0 until 120).map(i => (i.toLong, emb(i), i % 5)) :+
      ((10003L, emb(3), 99))).toDF("vec_id", "embedding", "label")
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.c5")
    corpus.createOrReplaceTempView("proc_ann_c5_in")
    spark.sql("CREATE TABLE graft_proc.ann.c5 AS SELECT * FROM proc_ann_c5_in")
    // built WITHOUT payload: adding the filter attribute must not need
    // ann_build's drop-then-repersist serving gap (VERDICT r18 missing #3)
    spark.sql(
      "CALL graft_proc.system.ann_build(index => 'ann.e5', corpus => 'ann.c5', k => 8)")
    assert(graft.operators.IvfIndex.payloadColumns(spark, "graft_proc.ann.e5").isEmpty)
    val rb = spark.sql(
      """CALL graft_proc.system.ann_rebuild(index => 'ann.e5',
        |  corpus => 'ann.c5', k => 8, payload => 'label')""".stripMargin).head
    assert(rb.getLong(4) === 1L, s"$rb")
    assert(graft.operators.IvfIndex.payloadColumns(spark, "graft_proc.ann.e5")
      === Seq("label"))
    spark.sql("DROP TABLE IF EXISTS graft_proc.ann.q5")
    corpus.filter(col("vec_id") === 3L)
      .select((col("vec_id") + 1000).as("qid"), col("embedding").as("qe"))
      .createOrReplaceTempView("proc_ann_q5_in")
    spark.sql("CREATE TABLE graft_proc.ann.q5 AS SELECT * FROM proc_ann_q5_in")
    val filtered = spark.sql(
      """CALL graft_proc.system.ann_search(index => 'ann.e5',
        |  queries => 'ann.q5', n_probe => 2, top_k => 1,
        |  where => 'label = 99')""".stripMargin).head
    assert(filtered.getLong(2) === 10003L && filtered.getDouble(3) > 0.999,
      s"filtered search on the rebuilt-in column must find the in-slice copy: $filtered")
    // default k: auto-sized from the corpus (121 rows clamps to KMin=16),
    // and an unspecified payload carries the current set forward
    val rb2 = spark.sql(
      "CALL graft_proc.system.ann_rebuild(index => 'ann.e5', corpus => 'ann.c5')").head
    assert(rb2.getLong(0) === 16L, s"auto-k on a 121-row corpus clamps to KMin: $rb2")
    assert(graft.operators.IvfIndex.payloadColumns(spark, "graft_proc.ann.e5")
      === Seq("label"),
      "an unspecified payload must carry the current set forward")
    // ADVICE r19: the 'none' sentinel CLEARS the payload set (the ''
    // carry-forward sentinel could never get back to empty), and an
    // explicit NULL fails with a named error instead of an NPE
    val eNull = intercept[Exception] {
      spark.sql(
        """CALL graft_proc.system.ann_rebuild(index => 'ann.e5',
          |  corpus => 'ann.c5', payload => NULL)""".stripMargin).head
    }
    val eNullMsg = Iterator.iterate(eNull: Throwable)(_.getCause)
      .takeWhile(_ != null).take(8)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(eNullMsg.contains("must not be NULL"), eNullMsg)
    spark.sql(
      """CALL graft_proc.system.ann_rebuild(index => 'ann.e5',
        |  corpus => 'ann.c5', k => 8, payload => 'none')""".stripMargin).head
    assert(graft.operators.IvfIndex.payloadColumns(spark, "graft_proc.ann.e5")
      .isEmpty, "payload => 'none' must clear the payload set")
  }
}
