package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Unit-level correctness for the non-SQL-expressible operators: planted
  * near-duplicates must be found (and non-dups must not be), LSH recall
  * must approach brute force, language ID must recognize planted
  * languages, multimodal features must be deterministic. */
class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  private def docsDf(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // ~96 tokens: long enough that SimHash's per-bit vote margins are
  // mostly > 2, so a 2-token tail append can only flip the few
  // near-tied bits (measured: Hamming 2 under the FNV family, vs 26
  // for the unrelated doc) — the 20-token original made every verdict
  // a hash-family coin flip (the r19 FNV switch flipped it to 5).
  private val base =
    "the quick brown fox jumps over the lazy dog while the cat watches from the warm windowsill near the garden gate " +
      "as evening settles across the quiet village and lanterns begin to glow along the cobbled street where children " +
      "carry baskets of ripe apples toward the old market square and fishermen mend their nets beside the slow river " +
      "under willows that lean over the water while distant bells ring softly from the chapel on the hill and farmers " +
      "drive their carts home through fields of barley that sway gently in the cooling wind of early autumn"
  // tail append: shingle Jaccard ≈ 93/95 ≈ 0.98, above the 0.8 dedup bar
  private val nearDup = base + " at dusk"
  private val unrelated =
    "completely different content about database engines and distributed query processing with columnar storage formats"

  test("minhash LSH finds planted near-duplicate, not unrelated doc") {
    val got = Dedup.minhashDedup(docsDf(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("simhash finds planted near-duplicate, not unrelated doc") {
    val got = Dedup.simhashDedup(docsDf(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(2L) === true)
    assert(got(3L) === false)
  }

  test("ngram jaccard finds planted near-duplicate, not unrelated doc") {
    val got = Dedup.ngramJaccardDedup(docsDf(1L -> base, 2L -> nearDup, 3L -> unrelated))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> false))
  }

  test("simhash LSH bands are all live over the corpus (no constant band)") {
    import graft.functions.{HashFns, TextFns}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val total = docs.count()
    // same sketch construction as Dedup.simhashDedup: full-width FNV-1a
    // token hashes (the r19 oracle-mirrorable family) → simhash →
    // 4 × 16-bit bands (the r2 bug fed mod-P 31-bit hashes here, which
    // made bands 2-3 the constant bucket 0 — this leg also guards the
    // FNV family against any such upper-bit degeneration)
    val bands = docs
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), transform(col("toks"),
        t => graft.functions.Udx.graft_fnv64(t)).as("h"))
      .select(col("doc_id"), HashFns.simhashFromHashes(col("h")).as("sh64"))
      .select(posexplode(array((0 until 4).map(j =>
        shiftrightunsigned(col("sh64"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band_i", "band_h")))
    val biggest = bands.groupBy("band_i", "band_h").count()
      .groupBy("band_i").agg(max("count").as("biggest"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(biggest.keySet === Set(0, 1, 2, 3))
    biggest.foreach { case (bi, n) =>
      assert(n <= total / 2, s"band $bi degenerate: biggest bucket $n of $total docs")
    }
  }

  test("minhash + ngram dedup complete on a degenerate all-identical corpus") {
    // 1500 identical docs: every band/gram bucket holds the whole
    // corpus, exceeding the caps — the count pre-filter must drop the
    // buckets BEFORE any posting list materializes, and the run must
    // complete without the 1500²/2 pair expansion. (Exact duplicates
    // are d01's job; the near-dup paths guarantee bounded memory first.)
    val docs = docsDf((1L to 1500L).map(i => i -> base): _*)
    val mh = Dedup.minhashDedup(docs).collect()
    assert(mh.length === 1500 && mh.forall(!_.getBoolean(1)))
    val ng = Dedup.ngramJaccardDedup(docs).collect()
    assert(ng.length === 1500 && ng.forall(!_.getBoolean(1)))
  }

  test("embedding dedup completes on a degenerate all-same-bucket corpus") {
    import spark.implicits._
    val v = Array.fill(64)(0.5f)
    val emb = (1L to 1500L).map(i => (i, v)).toDF("vec_id", "embedding")
    val got = Dedup.embeddingDedup(emb)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got.size === 1500)
    // the 1500-member bucket exceeds the 1000 cap and is dropped whole:
    // bounded memory wins over recall on pathological buckets (and no
    // quadratic 1500²/2 pair expansion ever runs)
    assert(got.values.forall(_ == false))
  }

  test("embedding dedup finds planted near-identical vector") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    val v1 = vec()
    val v2 = v1.clone(); v2(0) = v1(0) + 0.001f // near-identical
    val others = (3L to 20L).map(i => (i, vec()))
    val emb = ((1L, v1) +: (2L, v2) +: others).toDF("vec_id", "embedding")
    val got = Dedup.embeddingDedup(emb)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(2L) === true, "near-identical vector flagged")
    assert(got.count(_._2) === 1, "only the planted dup flagged")
  }

  test("LSH top-k recall vs brute force >= 0.6 at corpus scale") {
    val dir = "/root/testdata/sf0.001"
    val bf = Similarity.v01_sim_bruteforce_topk(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.v02_sim_lsh_topk(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.6, s"recall $recall")
  }

  test("IVF top-k returns well-formed neighbors with positive overlap vs brute force") {
    val dir = "/root/testdata/sf0.001"
    val bf = Similarity.v01_sim_bruteforce_topk(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.v03_sim_ivf_topk(spark, dir)
      .select("qid", "nid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // random (unclustered) vectors are IVF's worst case — 3/16 cells
    // probed bounds attainable recall; assert sanity, not LSH-level recall
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(ivf.nonEmpty && recall >= 0.2, s"ivf recall $recall")
  }

  test("decontamination flags a doc sharing a 5-gram with the benchmark, not others") {
    val benchDoc = "the quick brown fox jumps over the lazy dog near the river"
    // copies a 5-token span ("quick brown fox jumps over") → contaminated
    val leaked = "students wrote that the quick brown fox jumps over fences daily"
    // shares words but never 5 consecutive tokens → clean
    val clean = "a brown dog jumps while the fox is lazy near a quick river"
    val df = docsDf(100L -> benchDoc, 2L -> leaked, 3L -> clean)
    val got = Dedup.decontaminate(df, col("doc_id") === 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(2L -> true, 3L -> false))
    // benchmark rows themselves are excluded from the training verdict
    assert(!got.contains(100L))
  }

  test("chunking covers every token: stride steps, full last window, short-doc single chunk") {
    val doc20 = (1 to 20).map(i => s"w$i").mkString(" ") // < window → 1 chunk
    val doc150 = (1 to 150).map(i => s"w$i").mkString(" ")
    val got = TextAnalysis.chunkText(docsDf(1L -> doc20, 2L -> doc150), 64, 48)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byDoc = got.groupBy(_._1)
    assert(byDoc(1L).length === 1 && byDoc(1L).head._3 === 20)
    // 150 tokens, W=64 S=48 → chunks at 0,48,96: ceil((150-64)/48)+1 = 3
    assert(byDoc(2L).map(_._2).toSeq.sorted === Seq(0L, 1L, 2L))
    // every token position covered; last chunk reaches the end
    assert(byDoc(2L).find(_._2 == 2L).get._4.endsWith("w150"))
    assert(byDoc(2L).find(_._2 == 1L).get._4.startsWith("w49")) // 48+1
  }

  test("sequence packing: spans partition each doc and fill each non-final sequence to budget") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Pipeline.packSequences(docs, budget = 256).cache()
    import spark.implicits._
    // per-doc: spans sum to the doc's token count
    val docTok = docs.select(col("doc_id"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n")).as[(Long, Long)]
      .collect().toMap
    val spanSums = packed.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_begin")).as("s")).as[(Long, Long)]
      .collect().toMap
    assert(spanSums === docTok.filter { case (_, n) => n > 0 })
    // per (shard, seq): non-final sequences carry exactly `budget` tokens
    val seqFill = packed.groupBy("shard", "seq_id")
      .agg(sum(col("tok_end") - col("tok_begin")).as("fill"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
    val lastSeq = seqFill.map(_._1).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    seqFill.foreach { case ((shard, seq), fill) =>
      if (seq < lastSeq(shard)) assert(fill === 256L, s"shard=$shard seq=$seq")
      else assert(fill <= 256L)
    }
    packed.unpersist()
  }

  test("streaming decontamination reproduces the batch verdicts on planted data") {
    import spark.implicits._
    val benchDoc = "the quick brown fox jumps over the lazy dog near the river"
    val leaked = "students wrote that the quick brown fox jumps over fences daily"
    val clean = "a brown dog jumps while the fox is lazy near a quick river"
    val df = docsDf(100L -> benchDoc, 2L -> leaked, 3L -> clean)
    val batchVerdicts = operators.Dedup.decontaminate(df, col("doc_id") === 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val stream = new graft.streaming.DecontaminateStream(
      java.nio.file.Files.createTempDirectory("dcs_store").toString,
      java.nio.file.Files.createTempDirectory("dcs_verdict").toString)
    stream.buildStore(df.filter(col("doc_id") === 100).select(col("doc_id"), col("text")))
    val ingest = new graft.streaming.AsyncIngest[(Long, String)](spark.sqlContext)
    val ck = java.nio.file.Files.createTempDirectory("dcs_ck").toString
    // two micro-batches, one doc each
    Seq(2L -> leaked, 3L -> clean).foreach { row =>
      ingest.saveAllAsync(Seq(row))
      val q = stream.start(ingest.toDS().toDF("doc_id", "text"), ck)
      q.awaitTermination(60000)
    }
    val streamVerdicts = stream.verdicts(spark)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(streamVerdicts === batchVerdicts)
    assert(streamVerdicts.exists(v => v._1 == 2L && v._3) &&
      streamVerdicts.exists(v => v._1 == 3L && !v._3))
  }

  test("cluster closure converges in O(log n) rounds on a 64-node chain (pointer halving)") {
    import spark.implicits._
    val n = 64
    val docs = (0L until n).toDF("doc_id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("a", "b")
    val (out, iters) = Dedup.dedupClustersIter(docs, pairs)
    val got = out.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.values.toSet === Set(0L), "one chain component labeled by its min")
    // pure neighbor-min propagation needs ~63 rounds on a 64-chain;
    // halving must get there in O(log n)
    assert(iters <= 10, s"expected logarithmic convergence, took $iters rounds")
  }

  test("dedup clusters: transitive closure merges chained pairs, keep-first per component") {
    import spark.implicits._
    val docs = (1L to 6L).toDF("doc_id")
    // chain 1-2-3 (1 and 3 never pairwise verified) + isolated pair 5-6
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.dedupClusters(docs, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got === Set(
      (1L, 1L, false), (2L, 1L, true), (3L, 1L, true),
      (4L, 4L, false), (5L, 5L, false), (6L, 5L, true)))
  }

  test("keep-best canonical selection keeps the longest doc per cluster") {
    val got = Dedup.d09_dedup_keep_best(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // exactly one kept doc per cluster, and it's the member with max n_chars
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (_, members) =>
      assert(members.count(_._4) === 1)
      assert(members.forall(m => m._3 === members.find(_._4).get._1))
    }
    val nChars = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (_, members) =>
      val kept = members.find(_._4).get._1
      assert(nChars(kept) === members.map(m => nChars(m._1)).max)
    }
  }

  test("centroid assignment picks the true cosine argmax") {
    import org.apache.spark.sql.expressions.Window
    val dir = "/root/testdata/sf0.001"
    val got = Similarity.v07_cluster_assign(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // every non-centroid vector assigned exactly once, to a centroid id
    assert(got.values.forall(c => c >= 0 && c < 8))
    // full argmax cross-check via an independent window-based plan
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cid"))
    val want = emb.filter(col("vec_id") >= 8).crossJoin(cents)
      .select(col("vec_id"), col("cid"),
        graft.functions.VectorFns.cosine(col("ce"), col("embedding")).as("cos"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("quantization round-trips within half a scale step") {
    val rows = Similarity.v08_embed_quantize(spark, "/root/testdata/sf0.001").collect()
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.take(50).foreach { r =>
      val (vmin, vmax) = (r.getDouble(1), r.getDouble(2))
      val scale = (vmax - vmin) / 255.0
      val qs = r.getString(3).split(",").map(_.toLong)
      val xs = emb(r.getLong(0))
      assert(qs.length === xs.length)
      qs.zip(xs).foreach { case (q, x) =>
        assert(q >= 0 && q <= 255)
        if (scale > 0) assert(math.abs(vmin + q * scale - x) <= scale / 2 + 1e-9)
      }
    }
  }

  test("language ID recognizes planted languages") {
    val got = TextAnalysis.t03_text_langid(spark, "/root/testdata/sf0.001") // smoke on corpus
    assert(got.count() > 0)
    // planted fixtures through the same scoring path
    import spark.implicits._
    val planted = Seq(
      (1L, "der hund und die katze sind nicht ein problem", "de"),
      (2L, "the cat and the dog it is in that house", "en"),
      (3L, "le chat est un animal et la maison est grande", "fr"),
      (4L, "el perro y el gato es un animal que come", "es"))
      .toDF("doc_id", "text", "lang")
    planted.createOrReplaceTempView("graft_langid_test")
    // reuse operator internals by mapping over the planted frame
    val toks = graft.functions.TextFns.tokens(col("text"))
    val res = TextAnalysis.predictLang(planted).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[String]("pred_lang"))
    res.foreach { case (expected, pred) => assert(expected === pred) }
  }

  test("text scrub redacts planted emails and URLs, counts them once each") {
    val d = docsDf(
      1L -> "contact alice@example.com or see https://example.com/x?y=1 for info",
      2L -> "no pii in this one at all")
    val got = TextAnalysis.scrubText(d).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    val (urls1, emails1, clean1) = got(1L)
    assert(urls1 === 1 && emails1 === 1)
    assert(clean1.contains("<EMAIL>") && clean1.contains("<URL>"))
    assert(!clean1.contains("alice@") && !clean1.contains("https://"))
    assert(got(2L) === ((0, 0, "no pii in this one at all")))
  }

  test("split assignment is content-keyed: dups co-assign, proportions ~80/10/10") {
    // exact duplicates must land in the same split (contamination guard)
    val dup = Pipeline.splitAssign(docsDf(1L -> base, 2L -> base, 3L -> unrelated))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(dup(1L) === dup(2L), "identical text, identical split")
    // corpus proportions within loose binomial bounds (205/230 of 256)
    val frac = Pipeline.p02_split_assign(spark, "/root/testdata/sf0.001")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = frac.values.sum.toDouble
    assert(frac("train") / total > 0.7 && frac("train") / total < 0.9, frac.toString)
    assert(frac("val") / total > 0.04 && frac("val") / total < 0.17, frac.toString)
    assert(frac("test") / total > 0.04 && frac("test") / total < 0.17, frac.toString)
  }

  test("corpus ngram top-k finds the planted dominant trigram") {
    val d = docsDf(
      1L -> "alpha beta gamma delta", // alpha beta gamma, beta gamma delta
      2L -> "alpha beta gamma",       // alpha beta gamma
      3L -> "zeta eta theta")
    // route the planted frame through the same shape the operator uses
    val grams = d
      .withColumn("_toks", graft.functions.TextFns.tokens(col("text")))
      .select(explode(graft.functions.TextFns.shinglesFromTokens(col("_toks"), 3)).as("gram"))
      .groupBy("gram").count().orderBy(col("count").desc, col("gram")).collect()
    assert(grams.head.getString(0) === "alpha beta gamma")
    assert(grams.head.getLong(1) === 2L)
  }

  test("multimodal features are deterministic and well-shaped") {
    val dir = "/root/testdata/sf0.001"
    val a = Multimodal.m02_multimodal_features(spark, dir).collect()
    val b = Multimodal.m02_multimodal_features(spark, dir).collect()
    assert(a.sameElements(b), "deterministic across runs")
    assert(a.forall(_.getAs[Int]("feature_dim") == 16))
    assert(a.length == 500)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query name has either an oracle or is documented rows-only") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert(os.subsetOf(qs), s"orphan oracles: ${os diff qs}")
  }
}
