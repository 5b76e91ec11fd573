package graft.sources

import java.net.InetSocketAddress
import java.nio.file.{Files, Paths, StandardOpenOption}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The `s3x://` EMULATED OBJECT STORE the production conditional-put
  * client is exercised against: the data plane is a RawLocalFileSystem
  * behind the scheme (standing in for S3A — listings, reads, segment
  * writes), while the ledger control plane goes over REAL HTTP to
  * [[S3xEmulator]], which models the store's documented semantics:
  * unconditional PUT is last-writer-wins; PUT with `If-None-Match: *`
  * is a SERVER-ARBITRATED create-if-absent that answers 412 when the
  * key exists — exactly S3's conditional-write contract. Registered via
  * the FileSystem service loader (src/test/resources/META-INF/services). */
class S3xFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "s3x"
  override def getUri: java.net.URI = java.net.URI.create("s3x:///")
}

/** Minimal in-process object store endpoint (JDK HttpServer over the
  * same local directory the `s3x://` data plane serves): PUT writes the
  * body to the URL path's file — overwrite by default (last-writer-wins,
  * the object-store hazard), kernel-atomic CREATE_NEW under
  * `If-None-Match: *` / `x-goog-if-generation-match: 0` with 412 on an
  * existing key (the server-side arbitration a real store does). */
object S3xEmulator {
  @volatile var conditionalPuts: Long = 0L
  @volatile var casLosses: Long = 0L

  private def handle(ex: HttpExchange): Unit = {
    val target = Paths.get(ex.getRequestURI.getPath)
    val body = ex.getRequestBody.readAllBytes()
    ex.getRequestMethod match {
      case "PUT" =>
        val conditional =
          "*" == ex.getRequestHeaders.getFirst("If-None-Match") ||
            "0" == ex.getRequestHeaders.getFirst("x-goog-if-generation-match")
        Files.createDirectories(target.getParent)
        if (conditional) {
          synchronized { conditionalPuts += 1 }
          try {
            Files.write(target, body, StandardOpenOption.CREATE_NEW,
              StandardOpenOption.WRITE)
            ex.sendResponseHeaders(200, -1)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              synchronized { casLosses += 1 }
              ex.sendResponseHeaders(412, -1) // the S3 answer; ABFS says 409
          }
        } else {
          Files.write(target, body) // last-writer-wins overwrite
          ex.sendResponseHeaders(200, -1)
        }
      case _ => ex.sendResponseHeaders(405, -1)
    }
    ex.close()
  }

  def start(): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", handle _)
    // concurrent committers must contend INSIDE the store, not queue
    // on a single-threaded endpoint
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server
  }
}

/** The PRODUCTION conditional-put leg (VERDICT r19 next #5): the
  * shipping [[ConditionalPutHttp]] client carries (a) the full
  * versioned write/read/DML/maintenance lifecycle and (b) the
  * 16-committer CAS convergence storm (LogVersionsSpec's gate), with
  * every ledger publish arbitrated by the emulated store's HTTP
  * conditional PUT — the exact wiring a real S3/GCS/ABFS deployment
  * registers, minus request signing. */
class ObjectStoreLedgerSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  test("the HTTP conditional-put client carries the whole lifecycle " +
      "and a 16-committer CAS storm against the emulated object store") {
    val server = S3xEmulator.start()
    try {
      val port = server.getAddress.getPort
      LedgerStores.register("s3x", new ConditionalPutHttp(p =>
        java.net.URI.create(s"http://127.0.0.1:$port${p.toUri.getPath}")))
      val local = Files.createTempDirectory("graft_s3x_wh").toString
      val warehouse = s"s3x://$local"
      spark.conf.set("spark.sql.catalog.graft_s3x", "graft.sources.LogCatalog")
      spark.conf.set("spark.sql.catalog.graft_s3x.warehouse", warehouse)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_s3x.lake")
      spark.sql("DROP TABLE IF EXISTS graft_s3x.lake.t")
      spark.sql("CREATE TABLE graft_s3x.lake.t (id BIGINT, v BIGINT)")
      spark.range(100).selectExpr("id", "id * 2 AS v")
        .coalesce(2).writeTo("graft_s3x.lake.t").append()
      val dir = s"$warehouse/lake/t"
      val before = S3xEmulator.conditionalPuts
      spark.sql("CALL graft_s3x.system.enable_versioning(table => 'lake.t')")
      assert(S3xEmulator.conditionalPuts > before,
        "the v1 publish must arbitrate through the store's conditional PUT")
      // merge-on-read DELETE: masks ride a ledger publish over HTTP
      spark.conf.set(DeleteMasks.MODE_KEY, "merge-on-read")
      try spark.sql("DELETE FROM graft_s3x.lake.t WHERE id < 10")
      finally spark.conf.unset(DeleteMasks.MODE_KEY)
      assert(ParquetVersions.masksFor(dir, None).nonEmpty)
      assert(spark.table("graft_s3x.lake.t").count() === 90)
      // UPDATE (copy-on-write) + compaction (leased, mask purge) + vacuum
      spark.sql("UPDATE graft_s3x.lake.t SET v = 0 WHERE id >= 95")
      spark.sql("CALL graft_s3x.system.compact_table(table => 'lake.t')")
      assert(ParquetVersions.masksFor(dir, None).isEmpty,
        "compaction purges the masks through the HTTP-published commits")
      assert(spark.sql("SELECT sum(v) AS s FROM graft_s3x.lake.t")
        .head.getLong(0) === (10L until 95L).map(_ * 2).sum)
      // time travel across the HTTP-published history
      val vCur = ParquetVersions.latest(dir).get._1
      assert(vCur >= 4L, s"enable + delete + update + compact publishes: $vCur")
      assert(spark.sql(
        "SELECT count(*) AS c FROM graft_s3x.lake.t VERSION AS OF 1")
        .head.getLong(0) === 100, "v1 pre-delete snapshot")
      spark.sql("CALL graft_s3x.system.vacuum(table => 'lake.t', " +
        "retain_last => 2)")
      assert(spark.table("graft_s3x.lake.t").count() === 90)
      // the 16-committer storm (LogVersionsSpec's convergence gate):
      // distinct ordinals, no transform lost, all arbitrated server-side
      val n = 16
      val fsDir = new Path(dir)
      val hfs = fsDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      (0 until n).foreach { i =>
        hfs.create(new Path(fsDir, s"racer-$i.parquet"), true).close()
      }
      val putsBefore = S3xEmulator.conditionalPuts
      val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
      try {
        val futures = (0 until n).map { i =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long =
              VersionLedger.commit(dir)(prev => prev :+ s"racer-$i.parquet")
          })
        }
        val ordinals = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
        assert(ordinals.toSet.size === n,
          s"every committer must win its own ordinal: $ordinals")
        val last = VersionLedger.latestPayload(dir).get._2.names
        (0 until n).foreach(i => assert(last.contains(s"racer-$i.parquet"),
          s"racer-$i's transform was lost"))
      } finally pool.shutdownNow()
      assert(S3xEmulator.conditionalPuts - putsBefore >= n.toLong,
        "every one of the 16 commits must publish through the conditional PUT")
      assert(spark.table("graft_s3x.lake.t").count() === 90,
        "the storm's empty racer segments must not disturb the table reads" +
          " beyond their own rows")
    } finally server.stop(0)
  }
}
