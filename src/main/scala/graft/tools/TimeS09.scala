package graft.tools

import org.apache.spark.sql.functions._

/** Dev scratch: section timings for s09's pipeline at a given sf dir. */
object TimeS09 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.base()
    import spark.implicits._
    def t[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[time] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.Tables.documents(spark, dir)
    // warm-up
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val store = java.nio.file.Files.createTempDirectory("ts09_store").toString
    val verdictDir = java.nio.file.Files.createTempDirectory("ts09_v").toString
    val dcs = new graft.streaming.DecontaminateStream(store, verdictDir)
    t("buildStore") {
      dcs.buildStore(docs.filter(col("doc_id") % 97 === 0).select(col("doc_id"), col("text")))
    }
    val train = t("collect train") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().sortBy(_._1)
    }
    val ingest = t("addData") {
      val i = new graft.streaming.AsyncIngest[(Long, String)](spark.sqlContext)
      i.saveAllAsync(train.toSeq); i
    }
    val ck = java.nio.file.Files.createTempDirectory("ts09_ck").toString
    t("stream drain") {
      val q = dcs.start(ingest.toDS().toDF("doc_id", "text"), ck)
      q.awaitTermination(120000)
    }
    t("read verdicts") { dcs.verdicts(spark).orderBy("doc_id").collect() }
    // batch comparison: the same gram pass outside streaming
    val train2 = docs.filter(col("doc_id") % 97 =!= 0).select(col("doc_id"), col("text"))
    t("gram pass, no explode") {
      graft.operators.Dedup.wordGramSets(train2)
        .select(sum(size(col("grams")))).collect()
    }
    t("gram pass + explode") {
      graft.operators.Dedup.wordGramSets(train2)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .groupBy("doc_id").count().count()
    }
    t("gram pass cached + explode") {
      val g = graft.operators.Dedup.wordGramSets(train2).cache()
      val n = g.select(col("doc_id"), explode(col("grams")).as("g"))
        .groupBy("doc_id").count().count()
      g.unpersist(); n
    }
    t("gram pass + repart + explode") {
      graft.operators.Dedup.wordGramSets(train2)
        .repartition(32)
        .select(col("doc_id"), explode(col("grams")).as("g"))
        .groupBy("doc_id").count().count()
    }
    // emulate the foreachBatch body on a 1-partition batch
    val onePart = spark.createDataFrame(
      train2.rdd.coalesce(1), train2.schema)
    t("emulated foreachBatch body") {
      val bench = spark.read.parquet(store)
      val nPar = spark.sparkContext.defaultParallelism
      val spread = graft.operators.Dedup.wordGramSets(onePart.repartition(nPar))
        .repartition(nPar)
      val postings = spread.select(col("doc_id"), explode(col("grams")).as("gram_h"))
      val hits = postings.join(broadcast(bench), Seq("gram_h"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit_grams"))
      onePart.select(col("doc_id")).join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
          col("n_hit_grams").isNotNull.as("is_contaminated"))
        .write.mode("overwrite")
        .parquet(java.nio.file.Files.createTempDirectory("ts09_emul").toString)
    }
    spark.stop()
  }
}
