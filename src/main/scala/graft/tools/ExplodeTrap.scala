package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: measure the explode-over-expensive-expression trap on
  * the operators that explode computed arrays (t07, v02). */
object ExplodeTrap {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.base()
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000000L).selectExpr("sum(id)").collect()
    t("t07 as-is") {
      graft.operators.TextAnalysis.t07_ngram_topk(spark, dir).collect()
    }
    t("t07 cached boundary") {
      val toks = graft.Tables.documents(spark, dir)
        .select(graft.functions.TextFns.tokens(col("text")).as("_toks"))
        .select(graft.functions.TextFns
          .shinglesFromTokens(col("_toks"), 3).as("sh")).cache()
      val r = toks.select(explode(col("sh")).as("gram"))
        .groupBy(col("gram")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("gram")).limit(100).collect()
      toks.unpersist(); r
    }
    t("v02 as-is") {
      graft.operators.Similarity.v02_sim_lsh_topk(spark, dir).collect()
    }
    spark.stop()
  }
}
