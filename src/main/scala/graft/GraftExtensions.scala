package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library integration point for sessions the engine does not itself
  * create: `--conf spark.sql.extensions=graft.GraftExtensions` injects
  * the engine's native expressions into any session at build time
  * (the standard third-party-engine mechanism; [[Sessions.base]] does
  * the same registration imperatively for sessions we build). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      FunctionIdentifier("graft_fnv64"),
      new ExpressionInfo(classOf[functions.Udx.Fnv64Expr].getName, "graft_fnv64"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        functions.Udx.Fnv64Expr(exprs.head)))
    // native whole-operator extension (custom logical node + exec), plus
    // the optimizer rule that swaps Spark's sort-based WindowGroupLimit
    // for it on row_number()<=k patterns
    extensions.injectPlannerStrategy(_ => plans.TopKPerGroup.Strategy)
    extensions.injectPlannerStrategy(_ => plans.AsOfJoin.Strategy)
    extensions.injectOptimizerRule(_ => plans.TopKPerGroup.NativeWindowGroupLimitRule)
    extensions.injectOptimizerRule(_ => plans.TopKPerGroup.PruneTopKColumnsRule)
    // merge-on-read UPDATE: swap the group-based ReplaceData rewrite
    // for the mask+append decomposition when the mode opts in
    extensions.injectOptimizerRule(_ => sources.ParquetMoRUpdate.InterceptRule)
    // merge-on-read MERGE INTO: masks + routed appends (or a candidate
    // group rewrite) instead of rewriting every candidate file
    extensions.injectOptimizerRule(_ => sources.ParquetMoRMerge.InterceptRule)
    // log-tier merge-on-read UPDATE (masks + appended image segments)
    extensions.injectOptimizerRule(_ => sources.LogMoRUpdate.InterceptRule)
    // log-tier merge-on-read MERGE INTO (masks + routed appends)
    extensions.injectOptimizerRule(_ => sources.LogMoRMerge.InterceptRule)
  }
}
