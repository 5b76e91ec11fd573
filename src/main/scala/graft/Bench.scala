package graft

/** Driver-run benchmark: executes every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query wall times.
  * Queries run against a noop-style full materialization (count of the
  * final result would let Spark skip result columns for some plans, so we
  * evaluate via write to a noop sink — every operator in the plan runs). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.base()
    // Uncounted warm-up: pay JVM/codegen/parquet-footer startup once so
    // per-query numbers measure the queries, not cold-start.
    spark.range(5000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    graft.Tables.all.keys.foreach { t =>
      graft.Tables.read(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // operators may cache intermediates; drop them so queries are
      // measured in isolation instead of under accumulated memory pressure
      spark.catalog.clearCache()
      name -> dt
    }
    // The driver captures only a bounded tail of the process output and
    // parses the JSON line out of it — keep this line SHORT (round-1's
    // full-name, full-precision line was ~2.7 KB and got truncated →
    // "parsed": null). Query keys shrink to their unique id prefix
    // (q01..q45, d01.., s01.., t01.., u01.., v01.., m01.., p01).
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sfName = new java.io.File(sfDir).getName
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfName"}"""
    println(line)
    spark.stop()
    // Re-print after session shutdown so the line sits as close to the end
    // of the output tail as possible (only sbt's [success] line follows).
    println(line)
  }
}
