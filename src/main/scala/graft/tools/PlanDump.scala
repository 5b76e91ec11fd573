package graft.tools

/** Optimization-round evidence tool: writes `.explain("formatted")` for
  * each named SparkEntry query to `<outDir>/<id>_<suffix>.txt`.
  *
  * Usage: runMain graft.tools.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * With no query list, dumps every declared query. The query function
  * runs its side-effect pipeline (CTAS/DML for the p-family) exactly as
  * the bench does; the captured plan is the FINAL returned DataFrame's —
  * the artifact the judge checks plan claims against.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    new java.io.File(outDir).mkdirs()
    val spark = graft.Sessions.base()
    val names = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_(n.takeWhile(_ != '_'))) }
    names.foreach { case (name, fn) =>
      val id = name.takeWhile(_ != '_')
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$outDir/${id}_$suffix.txt"),
          plan.getBytes("UTF-8"))
        println(s"[plandump] $id ok (${plan.length} bytes)")
      } catch { case e: Throwable =>
        println(s"[plandump] $id FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
