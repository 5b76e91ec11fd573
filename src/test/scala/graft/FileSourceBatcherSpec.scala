package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer

/** Source admission control — the Structured Streaming analogue of the
  * reference's bounded ingest channel (`connect.go:11`: producers block
  * at 10 000 rows). On a file source the same bound is
  * `maxFilesPerTrigger`: each micro-batch admits a capped amount of
  * input, so memory per batch is bounded no matter how much data is
  * queued. (SURVEY.md §2.1 #1 mapping.) */
class FileSourceBatcherSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  test("maxFilesPerTrigger paces admission into bounded micro-batches") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val total = ev.count()
    val srcDir = Files.createTempDirectory("fsrc").toString
    ev.repartition(5).write.mode("overwrite").parquet(srcDir)

    val sizes = ArrayBuffer[Long]()
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .trigger(Trigger.ProcessingTime(50))
      .option("checkpointLocation", Files.createTempDirectory("fsrc_ck").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        sizes.synchronized { sizes += df.count() }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()

    assert(sizes.sum === total, "conservation across paced batches")
    assert(sizes.count(_ > 0) >= 5,
      s"expected >=5 non-empty micro-batches (one per file), got $sizes")
    assert(sizes.max < total, "no single batch swallowed the whole input")
  }
}
