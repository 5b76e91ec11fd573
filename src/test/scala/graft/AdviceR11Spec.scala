package graft.sources

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A mock object store: local disk behind a `mockstore://` scheme, so
  * the ledger's scheme-dispatched atomic-create guard can be exercised
  * without a real S3 endpoint. Registered via the FileSystem service
  * loader (src/test/resources/META-INF/services). */
class MockStoreFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mockstore"
  override def getUri: java.net.URI = java.net.URI.create("mockstore:///")
}

/** Regression pins for the round-11 ADVICE findings plus VERDICT r11
  * items #3 (object-store-safe ledger publish) and #6 (unparseable
  * lease payload reads as live):
  *
  *   1. high — delete-mask carry-forward conflict: a leased rewrite's
  *      publish aborts when a concurrent merge-on-read DELETE/UPDATE
  *      masked one of its inputs (the commit would silently un-do it);
  *   2. medium — lease re-validation before publish + renewal;
  *   3. low — a publish referencing vanished files fails loudly;
  *   4. low — a replayed streaming epoch retires its predecessor
  *      attempt's files for the same epoch;
  *   5. low — concurrent schema-manifest read-repairs tolerate each
  *      other's rename. */
class AdviceR11Spec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def newLogDir(prefix: String, names: Seq[String] = Seq.empty): String = {
    val dir = Files.createTempDirectory(prefix).toString
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    names.foreach(n => fs.create(new Path(dir, n), true).close())
    VersionLedger.enable(dir, names)
    dir
  }

  // ---- 1: mask-conflict guard ------------------------------------

  test("guarded publish aborts when a concurrent commit masked a rewrite input") {
    val dir = newLogDir("graft_maskguard", Seq("a.seg", "b.seg"))
    // the rewrite reads its inputs under NO masks...
    val observed = Map.empty[String, Seq[String]]
    // ...then a merge-on-read DELETE lands a mask on `a.seg`
    VersionLedger.commit(dir, None, Map("a.seg" -> Seq("""{"op":"true"}""")))(identity)
    // the rewrite's publish (retiring a.seg) must abort, not silently
    // drop the committed delete
    val e = intercept[VersionLedger.MaskConflictException] {
      VersionLedger.commit(dir, None, Map.empty,
        Some(VersionLedger.MaskGuard(Set("a.seg"), observed)))(
        names => names.filterNot(_ == "a.seg") :+ "b.seg")
    }
    assert(e.getMessage.contains("a.seg"), e.getMessage)
    // the mask survived
    assert(VersionLedger.latestPayload(dir).get._2.masks.contains("a.seg"))
    // a guard matching the CURRENT masks publishes fine
    val fresh = VersionLedger.latestPayload(dir).get._2.masks
    VersionLedger.commit(dir, None, Map.empty,
      Some(VersionLedger.MaskGuard(Set("a.seg"), fresh)))(
      names => names.filterNot(_ == "a.seg"))
    assert(!VersionLedger.latestPayload(dir).get._2.masks.contains("a.seg"))
  }

  test("retryOnMaskConflict re-runs the body and bounds the attempts") {
    var runs = 0
    val got = ParquetVersions.retryOnMaskConflict() {
      runs += 1
      if (runs < 2) throw new VersionLedger.MaskConflictException("again")
      "ok"
    }
    assert(got === "ok" && runs === 2)
    var all = 0
    intercept[VersionLedger.MaskConflictException] {
      ParquetVersions.retryOnMaskConflict() {
        all += 1
        throw new VersionLedger.MaskConflictException("forever")
      }
    }
    assert(all === 3, "bounded attempts, then surface the conflict")
  }

  // ---- 2: lease validation + renewal ------------------------------

  test("a publish under a lost or taken-over lease fails loudly") {
    val dir = newLogDir("graft_leaseval", Seq("s.seg"))
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    intercept[IllegalStateException] {
      MaintenanceLease.withLease(dir) {
        // the holder's lease file vanishes mid-operation (TTL lapsed and
        // a taker-over reclaimed it): the publish must abort
        fs.listStatus(new Path(dir))
          .filter(_.getPath.getName.startsWith(".maintenance-lease"))
          .foreach(s => fs.delete(s.getPath, false))
        LogVersions.commit(dir)(identity)
      }
    }
    // un-leased commits are unaffected
    LogVersions.commit(dir)(identity)
  }

  test("renewal extends a live lease; validate rejects expiry and takeover") {
    val dir = Files.createTempDirectory("graft_leaserenew").toString
    val t = MaintenanceLease.acquire(dir, ttlMs = 120000L)
    MaintenanceLease.validate(t) // live and ours
    MaintenanceLease.renew(t)
    MaintenanceLease.validate(t) // still ours after renewal
    // a taker-over rewrites the file under another id: validate throws
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    val p = fs.listStatus(new Path(dir))
      .map(_.getPath).find(_.getName.startsWith(".maintenance-lease")).get
    val out = fs.create(p, true)
    out.write(s"""{"id":"thief","expires":${System.currentTimeMillis() + 60000}}"""
      .getBytes)
    out.close()
    val e = intercept[IllegalStateException](MaintenanceLease.validate(t))
    assert(e.getMessage.contains("lease"), e.getMessage)
  }

  test("an unparseable lease payload reads as LIVE: acquire times out loudly") {
    val dir = Files.createTempDirectory("graft_leasetorn").toString
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    // a torn write: truncated JSON with no expires field
    val out = fs.create(new Path(dir, ".maintenance-lease-2"), true)
    out.write("""{"id":"half""".getBytes)
    out.close()
    val e = intercept[IllegalStateException] {
      MaintenanceLease.acquire(dir, waitMs = 400)
    }
    assert(e.getMessage.contains("lease"), e.getMessage)
    // the torn file was NOT taken over or deleted
    assert(fs.exists(new Path(dir, ".maintenance-lease-2")))
  }

  // ---- 3: publish-time existence check -----------------------------

  test("a commit adding names that do not exist on disk fails loudly") {
    val dir = newLogDir("graft_pubexist", Seq("s.seg"))
    val e = intercept[IllegalStateException] {
      LogVersions.commit(dir)(names => names :+ "vanished.seg")
    }
    assert(e.getMessage.contains("do not exist"), e.getMessage)
    // nothing was published
    assert(VersionLedger.latest(dir).get._2 === Seq("s.seg"))
    // adding a name that DOES exist publishes fine
    val fs = new Path(dir).getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.create(new Path(dir, "t.seg"), true).close()
    LogVersions.commit(dir)(names => (names :+ "t.seg").sorted)
    assert(VersionLedger.latest(dir).get._2 === Seq("s.seg", "t.seg"))
  }

  // ---- VERDICT #3: object-store scheme guard -----------------------

  test("ledger publish on an unregistered object-store scheme fails loudly; " +
      "a registered conditional-put implementation restores it") {
    val local = Files.createTempDirectory("graft_mockstore").toString
    val dir = s"mockstore://$local"
    val e = intercept[IllegalStateException] {
      VersionLedger.enable(dir, Seq.empty)
    }
    assert(e.getMessage.contains("mockstore") &&
      e.getMessage.contains("LedgerStores.register"), e.getMessage)
    // plug in a conditional-put implementation (the mock store is local
    // disk, where create-exclusive via O_EXCL IS atomic)
    LedgerStores.register("mockstore", new LedgerStores.AtomicCreate {
      override def tryCreateExclusive(fs: org.apache.hadoop.fs.FileSystem,
          p: Path, bytes: Array[Byte]): Boolean =
        try {
          val ch = java.nio.file.Files.newByteChannel(
            java.nio.file.Paths.get(p.toUri.getPath),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          try ch.write(java.nio.ByteBuffer.wrap(bytes)) finally ch.close()
          true
        } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    })
    assert(VersionLedger.enable(dir, Seq.empty) === 1L)
    VersionLedger.commit(dir)(identity)
    assert(VersionLedger.latest(dir).get._1 === 2L)
  }

  // ---- 4: replayed epoch retires its predecessor's files -----------

  test("a replayed streaming epoch with different routing retires the " +
      "predecessor attempt's files in the same publish") {
    val tableDir = Files.createTempDirectory("graft_epochreplay").toString
    val fs = new Path(tableDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    SchemaManifest.repair(tableDir, schema.json)
    val data = new Path(tableDir, "data")
    fs.mkdirs(data)
    // first attempt of epoch 5 landed one file under (pid=7, j=0) and
    // published it; an unrelated epoch-4 file must survive the replay
    def onePart(name: String): Unit = {
      val tmp = new Path(tableDir, ".tmp-gen")
      spark.range(1).coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .find(s => s.isFile && s.getPath.getName.endsWith(".parquet")).get
      assert(fs.rename(part.getPath, new Path(data, name)))
      fs.delete(tmp, true)
    }
    onePart("stream-q1-4-00000-0.parquet")
    onePart("stream-q1-5-00007-0.parquet")
    VersionLedger.enable(tableDir,
      Seq("stream-q1-4-00000-0.parquet", "stream-q1-5-00007-0.parquet"))
    // the replay of epoch 5 (restart with different parallelism) stages
    // the same rows under pid=0
    val staged = new Path(tableDir, ".stream-q1-5/staged.parquet")
    val tmp2 = new Path(tableDir, ".tmp-gen2")
    spark.range(1).coalesce(1).write.mode("overwrite").parquet(tmp2.toString)
    val part2 = fs.listStatus(tmp2)
      .find(s => s.isFile && s.getPath.getName.endsWith(".parquet")).get
    fs.mkdirs(staged.getParent)
    assert(fs.rename(part2.getPath, staged))
    fs.delete(tmp2, true)
    new ParquetStreamingWrite(tableDir, schema, "q1", truncate = false)
      .commit(5L, Array(ParquetStageCommit(Seq((staged.toString, None)), 0)))
    val live = VersionLedger.latest(tableDir).get._2
    assert(live.contains("stream-q1-4-00000-0.parquet"),
      "other epochs' files survive")
    assert(live.contains("stream-q1-5-00000-0.parquet"),
      "the replay's files are live")
    assert(!live.contains("stream-q1-5-00007-0.parquet"),
      s"the predecessor attempt's file must be retired, got $live")
  }

  // ---- 5: concurrent schema-manifest repairs tolerate each other ----

  test("concurrent identical read-repairs never throw and converge") {
    val tableDir = Files.createTempDirectory("graft_schrepair").toString
    val json = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("x",
        org.apache.spark.sql.types.LongType))).json
    SchemaManifest.repair(tableDir, json) // initial install
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val tasks = (1 to 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Unit] {
        override def call(): Unit =
          (1 to 50).foreach(_ => SchemaManifest.repair(tableDir, json))
      })
    }
    // both writers carry identical bytes: a lost rename race must be
    // tolerated, not surface as a spurious IOException (ADVICE r11)
    tasks.foreach(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(SchemaManifest.manifestJson(tableDir) === json)
  }
}
