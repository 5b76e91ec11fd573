package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: where does the optimizer place the gram projection
  * relative to the exchange and the Generate? (NOTES_r4 explode trap) */
object GeneratePlan {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.base()
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val grams = graft.operators.Dedup.wordGramSets(docs)
    println("=== explode directly ===")
    grams.select(col("doc_id"), explode(col("grams")).as("g"))
      .groupBy("doc_id").count().explain("formatted")
    println("=== explode after repartition ===")
    grams.repartition(8)
      .select(col("doc_id"), explode(col("grams")).as("g"))
      .groupBy("doc_id").count().explain("formatted")
    spark.stop()
  }
}
