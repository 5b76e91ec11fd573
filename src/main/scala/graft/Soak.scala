package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the superlinear-RISK families (d02 MinHash-LSH, d04
  * n-gram Jaccard, d08 connected components, v02 LSH ANN, v03 IVF ANN):
  * runs the EXACT production query functions over deterministically
  * scaled copies of the sf0.1 corpus and reports wall time per scale,
  * so the capped-bucket design's near-linear scaling is demonstrated
  * empirically rather than argued.
  *
  * Corpus construction (the one place a soak must extrapolate beyond
  * the driver-generated testdata — derived from it, never replacing it
  * for correctness runs): copy k of a document rewrites every token
  * with a per-copy prefix, so copies are DISSIMILAR across k (no
  * artificial quadratic near-dup blowup) while each copy reproduces
  * the original's internal near-dup pair structure — total true pairs
  * scale linearly, which is what "linear in rows" must mean for dedup.
  * Embedding copy k is a k-step circular rotation: orthogonal, so
  * within-copy neighbor geometry is EXACTLY preserved while cross-copy
  * cosine decorrelates.
  *
  * Usage: runMain graft.Soak [sfDir] [scales] — defaults sf0.1 and
  * 1,3,10 (5k→50k docs, 2k→20k vectors). Prints one JSON line per
  * (query, scale) and a final `{"soak": ...}` summary with the log-log
  * growth exponent per query (1.0 = linear). */
object Soak {

  private val soakQueries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "d02" -> operators.Dedup.d02_dedup_minhash_lsh _,
    "d04" -> operators.Dedup.d04_dedup_ngram_jaccard _,
    "d05" -> operators.Dedup.d05_dedup_embedding _,
    "d08" -> operators.Dedup.d08_dedup_clusters _,
    "v02" -> operators.Similarity.v02_sim_lsh_topk _,
    "v03" -> operators.Similarity.v03_sim_ivf_topk _)

  private def scaledDir(spark: SparkSession, base: String, scale: Int): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_soak_x$scale").toString
    val docs = Tables.documents(spark, base)
    val docSpan = docs.agg(max("doc_id")).head.getLong(0) + 1
    (0 until scale).map { k =>
      docs.select(
        (col("doc_id") + lit(k * docSpan)).as("doc_id"),
        (if (k == 0) col("text")
         else regexp_replace(col("text"), "(\\S+)", s"c${k}q$$1")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = Tables.embeddings(spark, base)
    val vecSpan = emb.agg(max("vec_id")).head.getLong(0) + 1
    (0 until scale).map { k =>
      val dim = 64
      val shifted =
        if (k == 0) col("embedding")
        else concat(slice(col("embedding"), k % dim + 1, dim - k % dim),
          slice(col("embedding"), 1, k % dim))
      // copy 0 keeps vec_id so the fixed probe set (vec_id < 10) stays
      // identical across scales — the query cost varies only with the
      // corpus side, which is the quantity under test
      emb.select((col("vec_id") + lit(k * vecSpan)).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ union _)
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val base = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val scales = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(1, 3, 10)
    val spark = Sessions.base()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up so scale-1 numbers aren't first-job-inflated
    operators.Dedup.d02_dedup_minhash_lsh(spark, base).count()
    spark.catalog.clearCache()

    val times = scala.collection.mutable.Map[(String, Int), Double]()
    val rowsAt = scala.collection.mutable.Map[Int, Long]()
    for (scale <- scales) {
      val dir = scaledDir(spark, base, scale)
      rowsAt(scale) = Tables.documents(spark, dir).count()
      for ((name, fn) <- soakQueries) {
        val t0 = System.nanoTime()
        val n = fn(spark, dir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        times((name, scale)) = sec
        println(f"""{"query":"$name","scale":$scale,"docs":${rowsAt(scale)},"rows":$n,"sec":$sec%.3f}""")
        spark.catalog.clearCache()
      }
    }
    val lo = scales.min
    val hi = scales.max
    val exps = soakQueries.map { case (name, _) =>
      val e = math.log(times((name, hi)) / times((name, lo))) /
        math.log(hi.toDouble / lo)
      f""""$name":$e%.2f"""
    }
    println(s"""{"soak":"growth_exponent_1.0_is_linear","sf_base":"$base",""" +
      s""""scales":[${scales.mkString(",")}],${exps.mkString(",")}}""")
    spark.stop()
  }
}
