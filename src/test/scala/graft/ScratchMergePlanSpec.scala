package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, ReplaceData}
import org.apache.spark.sql.catalyst.rules.Rule
import org.scalatest.funsuite.AnyFunSuite

/** TEMPORARY scaffolding: dump the analyzed MERGE plan shape. */
class ScratchMergePlanSpec extends AnyFunSuite {

  object Dumper extends Rule[LogicalPlan] {
    @volatile var captured: Option[ReplaceData] = None
    override def apply(plan: LogicalPlan): LogicalPlan = {
      plan match {
        case rd: ReplaceData if captured.isEmpty =>
          captured = Some(rd)
          // scalastyle:off println
          println("==== ReplaceData ====")
          println("condition: " + rd.condition)
          println("operation: " + rd.operation)
          println(rd.treeString(true))
          println("==== query ====")
          rd.query.foreach {
            case m: org.apache.spark.sql.catalyst.plans.logical.MergeRows =>
              println("MergeRows:")
              println("  isSourceRowPresent=" + m.isSourceRowPresent)
              println("  isTargetRowPresent=" + m.isTargetRowPresent)
              println("  checkCardinality=" + m.checkCardinality)
              m.matchedInstructions.foreach(i => println("  matched: " + i))
              m.notMatchedInstructions.foreach(i => println("  notMatched: " + i))
              m.notMatchedBySourceInstructions.foreach(i => println("  nmbs: " + i))
              println("  child:\n" + m.child.treeString(true))
            case _ =>
          }
          // scalastyle:on println
        case _ =>
      }
      plan
    }
  }

  test("dump MERGE plan") {
    val warehouse = Files.createTempDirectory("graft_scratch_wh").toString
    val spark: SparkSession = {
      val s = graft.Sessions.base("local[4]", 4)
      s.conf.set("spark.sql.catalog.graft_scr", "graft.sources.LogCatalog")
      s.conf.set("spark.sql.catalog.graft_scr.warehouse", warehouse)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_scr.lake")
      s
    }
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ Dumper
    spark.sql("DROP TABLE IF EXISTS graft_scr.lake.t")
    spark.sql("CREATE TABLE graft_scr.lake.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_scr.lake.t SELECT id, id*10 FROM range(10)")
    val dir = s"$warehouse/lake/t"
    ParquetVersions.enable(dir)
    spark.range(5, 15).selectExpr("id AS k", "id*100 AS v")
      .createOrReplaceTempView("scr_src")
    spark.sql("""MERGE INTO graft_scr.lake.t t USING scr_src s ON t.k = s.k
                 WHEN MATCHED AND s.v > 700 THEN DELETE
                 WHEN MATCHED THEN UPDATE SET v = s.v
                 WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""")
    assert(Dumper.captured.isDefined)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == Dumper)
  }
}
