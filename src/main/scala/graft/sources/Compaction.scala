package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the operational counterpart of micro-batch
  * ingest. A tick-per-micro-batch sink ([[graft.streaming.ParquetBatchSink]]
  * writes one directory per batch) necessarily produces many small
  * files; at 100 TB that degrades every downstream scan (footer reads,
  * task-per-file scheduling, shuffle fan-in). Compaction bin-packs the
  * accumulated output into ~target-sized files.
  *
  * Scale notes: the rewrite is one distributed pass —
  * `repartition(ceil(bytes / target))` hash-distributes rows evenly
  * across exactly the number of output files needed (round-robin-ish;
  * no sort, no skew sensitivity); `maxRecordsPerFile` stays unset
  * because the partition count already fixes the file size. For a
  * live table the production recipe is compact-to-new-dir + atomic
  * swap, which is what the (inDir, outDir) signature expresses.
  */
object Compaction {

  final case class CompactionStats(filesBefore: Long, bytesBefore: Long,
      rowsBefore: Long, filesAfter: Long)

  private def parquetFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(new Path(dir), true)
    val buf = Seq.newBuilder[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        buf += ((f.getPath.toString, f.getLen))
      }
    }
    buf.result()
  }

  /** Rewrite the parquet dataset at `inDir` into `outDir` as
    * ~`targetBytes` files. Returns before/after stats. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20): CompactionStats = {
    val before = parquetFiles(spark, inDir)
    val totalBytes = before.map(_._2).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.option("basePath", inDir).parquet(inDir)
    val rows = df.count()
    df.repartition(n).write.mode("overwrite").parquet(outDir)
    CompactionStats(before.size.toLong, totalBytes, rows,
      parquetFiles(spark, outDir).size.toLong)
  }
}
