package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{AsyncIngest, DedupStream}

/** Streaming near-dedup against the persisted signature store: planted
  * near-duplicates must be flagged across micro-batch boundaries (the
  * store path) and within a batch (keep-first), novel docs must reach
  * the store, and batch replay must be a no-op (effectively-once). */
class DedupStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden gate"
  private val nearDup = base + " at dusk"
  private val nearDup2 = base + " at dawn"
  private val unrelated =
    "completely different content about database engines and distributed query processing with columnar storage formats"
  private val fresh =
    "yet another topic entirely concerning mountain weather patterns and the hiking trails that cross the northern ridge"

  test("cross-batch + within-batch near-dups flagged; store holds only novel sigs; replay is a no-op") {
    import spark.implicits._
    val storeDir = Files.createTempDirectory("dds_store").toString
    val verdictDir = Files.createTempDirectory("dds_verdict").toString
    val ck = Files.createTempDirectory("dds_ck").toString
    val stream = new DedupStream(storeDir, verdictDir)
    val ingest = new AsyncIngest[(Long, String)](spark.sqlContext)

    ingest.saveAllAsync(Seq((1L, base), (3L, unrelated)))
    assert(stream.start(ingest.toDS().toDF("doc_id", "text"), ck).awaitTermination(120000))
    ingest.saveAllAsync(Seq((5L, nearDup), (6L, nearDup2), (7L, fresh)))
    assert(stream.start(ingest.toDS().toDF("doc_id", "text"), ck).awaitTermination(120000))

    def verdictMap = stream.verdicts(spark).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def storeIds = spark.read.option("basePath", storeDir).parquet(storeDir)
      .select("doc_id").as[Long].collect().toSet

    // 5 is a near-dup of 1 (cross-batch, via the store); 6 is a near-dup
    // of 1 and of 5 (within-batch earlier id also counts); 7 is novel
    assert(verdictMap === Map(1L -> false, 3L -> false, 5L -> true, 6L -> true, 7L -> false))
    assert(storeIds === Set(1L, 3L, 7L))

    // replay batch 0 directly (crash-recovery path): overwrite-per-batch
    // must leave both outputs unchanged
    stream.processBatch(Seq((1L, base), (3L, unrelated)).toDF("doc_id", "text"), 0L)
    assert(verdictMap === Map(1L -> false, 3L -> false, 5L -> true, 6L -> true, 7L -> false))
    assert(storeIds === Set(1L, 3L, 7L))
  }
}
