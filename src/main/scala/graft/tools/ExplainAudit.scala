package graft.tools

import graft.{Sessions, SparkEntry}

/** Plan-hygiene audit: prints the formatted physical plan of selected
  * queries and greps for the properties that matter at 100 TB —
  * PushedFilters reaching the scan, pruned ReadSchema, broadcast joins
  * where intended, WholeStageCodegen coverage. Run:
  * `sbt "runMain graft.tools.ExplainAudit q01_pricing_summary ..."` */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.base()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_pricing_summary", "q03_filter_conjunctive", "q05_join_broadcast",
        "q06_join_multi_star", "q07_join_semi", "q14_window_rank", "q17_sort_topk",
        "d01_dedup_exact", "v01_sim_bruteforce_topk")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      val plan = SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(plan)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan).toList
      val schemas = "ReadSchema: [^\n]+".r.findAllIn(plan).toList
      val bcast = plan.split("\n").count(_.contains("BroadcastHashJoin"))
      // detail-section headers "(N) Exchange" — one per operator, so
      // tree indentation never double-counts; broadcasts excluded
      val shuffles = "\\(\\d+\\) Exchange".r.findAllIn(plan).size
      // FormattedMode marks codegen membership as "[codegen id : N]"
      val codegen = "codegen id : (\\d+)".r.findAllMatchIn(plan).map(_.group(1)).toSet.size
      println(s"== audit: pushedFilters=${pushed.size} broadcastJoins=$bcast " +
        s"shuffleExchanges=$shuffles codegenSpans=$codegen\n   readSchemas=${schemas.mkString(" | ")}")
    }
    spark.stop()
  }
}
