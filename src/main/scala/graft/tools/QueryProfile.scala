package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Optimization-round measurement harness (guide §1): runs named
  * SparkEntry queries through the same noop-sink methodology as Bench,
  * with a SparkListener capturing per-query job/stage/task aggregates —
  * the local[N] stand-in for the Spark UI's stage table. Prints one line
  * per query: wall, #jobs, #stages, #tasks, task-time sum, shuffle
  * read/write bytes, input bytes, GC time. High job/stage counts at tiny
  * data = fixed-cost-bound; high shuffle bytes = a §2.3 target.
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> [reps] [q1,q2,...]
  */
object QueryProfile {
  final class Agg extends SparkListener {
    var jobs = 0
    var stages = 0
    var tasks = 0
    var taskTimeMs = 0L
    var gcMs = 0L
    var shufReadB = 0L
    var shufWriteB = 0L
    var inputB = 0L
    var outputB = 0L
    override def onJobStart(e: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      stages += 1
      tasks += e.stageInfo.numTasks
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        gcMs += m.jvmGCTime
        shufReadB += m.shuffleReadMetrics.totalBytesRead
        shufWriteB += m.shuffleWriteMetrics.bytesWritten
        inputB += m.inputMetrics.bytesRead
        outputB += m.outputMetrics.bytesWritten
      }
    }
    def reset(): Unit = {
      jobs = 0; stages = 0; tasks = 0; taskTimeMs = 0; gcMs = 0
      shufReadB = 0; shufWriteB = 0; inputB = 0; outputB = 0
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 1
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    val spark = graft.Sessions.base()
    val agg = new Agg
    spark.sparkContext.addSparkListener(agg)
    // warm-up (uncounted) — JVM/codegen/parquet-footer startup
    spark.range(5000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    graft.Tables.all.keys.foreach { t =>
      graft.Tables.read(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n.takeWhile(_ != '_'))) }
    def mb(b: Long): String = f"${b / 1024.0 / 1024.0}%.1f"
    println(f"${"query"}%-6s ${"wall_s"}%7s ${"jobs"}%5s ${"stages"}%6s ${"tasks"}%6s ${"ttime_s"}%8s ${"gc_s"}%6s ${"shR_MB"}%7s ${"shW_MB"}%7s ${"in_MB"}%7s")
    for (_ <- 0 until reps) {
      names.foreach { case (name, fn) =>
        val id = name.takeWhile(_ != '_')
        agg.reset()
        spark.sparkContext.setJobDescription(id)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          // listener events are async; give the bus a moment to drain
          // (listenerBus.waitUntilEmpty is private[spark]) — outside the
          // timed region, so it only affects counter completeness
          Thread.sleep(200)
          println(f"$id%-6s $dt%7.2f ${agg.jobs}%5d ${agg.stages}%6d ${agg.tasks}%6d ${agg.taskTimeMs / 1e3}%8.2f ${agg.gcMs / 1e3}%6.2f ${mb(agg.shufReadB)}%7s ${mb(agg.shufWriteB)}%7s ${mb(agg.inputB)}%7s")
        } catch { case e: Throwable =>
          println(s"$id FAILED: ${e.getMessage}")
        }
        spark.sparkContext.setJobDescription(null)
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
