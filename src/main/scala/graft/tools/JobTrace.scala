package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-JOB breakdown of one SparkEntry query (guide §1/§7): prints every
  * Spark job the query launches — wall, task count, first-stage name —
  * so high job counts can be attributed to specific engine round-trips.
  *
  * Usage: runMain graft.tools.JobTrace <sfDir> <query> [reps]
  */
object JobTrace {
  final case class J(id: Int, var desc: String, var t0: Long = 0L,
    var t1: Long = 0L, var tasks: Int = 0, var stages: Int = 0,
    var site: String = "")

  final class Tracer extends SparkListener {
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    // stageId → jobId from SparkListenerJobStart.stageInfos (ADVICE r20:
    // attributing completed stages to jobs.values.lastOption
    // misattributes task counts under concurrent jobs — AQE broadcast
    // jobs, parallel actions)
    private val stageJob = mutable.Map.empty[Int, Int]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      val j = J(e.jobId, Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse(""))
      j.t0 = e.time
      j.site = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
      j.stages = e.stageInfos.size
      e.stageInfos.foreach(si => stageJob(si.stageId) = e.jobId)
      jobs(e.jobId) = j
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.t1 = e.time)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      // attach task counts to the job that owns the stage
      stageJob.get(e.stageInfo.stageId).flatMap(jobs.get)
        .foreach(_.tasks += e.stageInfo.numTasks)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val qname = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = graft.Sessions.base()
    spark.range(5000000L).selectExpr("sum(id * 2) AS s")
      .write.format("noop").mode("overwrite").save()
    graft.Tables.all.keys.foreach { t =>
      graft.Tables.read(spark, sfDir, t).write.format("noop").mode("overwrite").save()
    }
    val (name, fn) = graft.SparkEntry.queries.toSeq
      .find(_._1.startsWith(qname)).getOrElse(sys.error(s"no query $qname"))
    var tracer: Tracer = null
    for (r <- 0 until reps) {
      tracer = new Tracer
      spark.sparkContext.addSparkListener(tracer)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      spark.sparkContext.removeSparkListener(tracer)
      println(f"=== $name rep $r wall $dt%.2f s, ${tracer.jobs.size} jobs ===")
      if (r == reps - 1) {
        var prevEnd = 0L
        tracer.jobs.values.foreach { j =>
          val gap = if (prevEnd == 0) 0.0 else (j.t0 - prevEnd) / 1e3
          prevEnd = j.t1
          println(f"  job ${j.id}%3d ${(j.t1 - j.t0) / 1e3}%6.2fs gap=$gap%5.2fs stages=${j.stages}%2d tasks=${j.tasks}%4d  ${j.site}%-40s ${j.desc.take(80)}")
        }
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
