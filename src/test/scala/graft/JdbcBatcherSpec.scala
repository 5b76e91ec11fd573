package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming._
import scala.concurrent.duration._

/** The north-star write path driven end-to-end: the micro-batcher
  * streaming into a real JDBC warehouse (embedded Derby standing in for
  * ClickHouse — same DataFrameWriter JDBC surface, same `batchsize`
  * semantics as the reference's prepared-batch INSERT,
  * `hashes.go:86-98`). */
class JdbcBatcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)
  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    // Derby's default StringType mapping is CLOB, which is not
    // comparable (breaks pushed-down equality filters) — pin VARCHAR
    p.setProperty("createTableColumnTypes",
      "user_id VARCHAR(64), sha256sum VARCHAR(64)")
    p
  }

  test("batcher streams rows into a JDBC table; conservation + golden rows hold") {
    import spark.implicits._
    val ingest = new AsyncIngest[LimitHash](spark.sqlContext)
    val batcher = new MicroBatcher(
      BatcherConfig(interval = 50.millis, maxBatchCap = 1000),
      new JdbcBatchSink(url, "limits_hashes", props))
    val q = batcher.start(ingest.toDS(),
      Files.createTempDirectory("jdbc_ck").toString)
    val rows = (0 until 5000).map(i =>
      LimitHash(s"user_${i % 97}", i.toLong, Array[Byte]((i % 127).toByte), f"hash_$i%05d"))
    rows.grouped(500).foreach(c => ingest.saveAllAsync(c))
    q.processAllAvailable()
    q.stop()

    val back = spark.read.jdbc(url, "limits_hashes", props)
    assert(back.count() === 5000L)
    assert(back.agg(sum(col("amount"))).head().getLong(0) === (0L until 5000L).sum)
    // golden row, full-field equality (hashes_test.go:191-203)
    assert(back.filter(col("user_id") === "user_42" && col("amount") === 42L &&
      col("sha256sum") === "hash_00042").count() === 1L)
  }
}
