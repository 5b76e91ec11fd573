package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
import graft.functions.{HashFns, TextFns}

/** Scratch stage-level profiler for the dedup hot paths (not part of the
  * driver contract — kept for perf work; run with
  * `sbt "runMain graft.tools.ProfileDedup"`). */
object ProfileDedup {
  def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.base()
    spark.range(5000000L).selectExpr("sum(id*2) s")
      .write.format("noop").mode("overwrite").save()

    val docsRaw = Tables.documents(spark, dir)
    println(s"[profile] documents rows = ${docsRaw.count()}")

    val toks = docsRaw.select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    time("tokens")(toks)
    val sh = toks.select(col("doc_id"),
      TextFns.shinglesFromTokens(col("toks"), 3).as("sh"))
    time("shingles")(sh)
    val shh = sh.select(col("doc_id"), HashFns.baseHashes(col("sh")).as("sh_h"))
    time("baseHashes")(shh)
    val sig = shh.withColumn("sig", HashFns.minhashFromBases(col("sh_h"), 64))
    time("minhash sig (64)")(sig)
    val bands = sig.withColumn("bands", HashFns.lshBands(col("sig"), 16, 4))
    time("lsh bands")(bands)

    val docs = bands.cache()
    docs.write.format("noop").mode("overwrite").save()
    val bandRows = docs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_i", "band_h")))
    val smallBuckets = bandRows.groupBy(col("band_i"), col("band_h"))
      .agg(count(lit(1)).as("bucket_n")).filter(col("bucket_n") <= 1000)
      .select(col("band_i"), col("band_h"))
    val capped = bandRows.join(smallBuckets, Seq("band_i", "band_h"))
    val cand = capped.as("l").join(capped.as("r"),
        col("l.band_i") === col("r.band_i") &&
          col("l.band_h") === col("r.band_h") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
    time("lsh candidates")(cand)
    println(s"[profile] n candidates = ${cand.count()}")
    val verified = cand
      .join(docs.select(col("doc_id").as("a"), col("sh_h").as("sh_a")), "a")
      .join(docs.select(col("doc_id").as("b"), col("sh_h").as("sh_b")), "b")
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))) >= 0.8)
    time("verify jaccard")(verified)
    docs.unpersist()

    // simhash stages
    val tokh = toks.select(col("doc_id"), HashFns.baseHashes(col("toks")).as("tok_h"))
    time("d03 tok hashes")(tokh)
    val sh64 = tokh.select(col("doc_id"), HashFns.simhashFromHashes(col("tok_h")).as("sh64"))
    time("d03 simhash64")(sh64)

    // ngram stages
    val norm = docsRaw.select(col("doc_id"), TextFns.normalized(col("text")).as("norm"))
    val postings = norm.select(col("doc_id"),
        explode(TextFns.charNgramsFromNormalized(col("norm"), 3)).as("gram"))
      .groupBy(col("doc_id"), xxhash64(col("gram")).as("gram_h"))
      .agg(count(lit(1)).as("_d")).drop("_d")
    time("d04 postings")(postings)
    spark.stop()
  }
}
