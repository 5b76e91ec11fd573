package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** The persisted IVF index must (a) answer planted queries through the
  * PERSISTED tables alone, (b) fold corpus appends in O(delta) — the
  * pre-existing inverted-list files stay byte-identical and the
  * centroids are not re-fit — and (c) propagate corpus deletes on
  * refresh. (a) is also oracle-pinned end-to-end as v11. */
class IvfIndexSpec extends AnyFunSuite {

  private val warehouse: String =
    java.nio.file.Files.createTempDirectory("graft_ivf_wh").toString

  lazy val spark: SparkSession = {
    val s = Sessions.base("local[4]", 4)
    s.conf.set("spark.sql.catalog.graft_ivf", "graft.sources.LogCatalog")
    s.conf.set("spark.sql.catalog.graft_ivf.warehouse", warehouse)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graft_ivf.ann")
    s
  }

  private val DIM = 16

  /** Deterministic synthetic embeddings: 4 well-separated archetype
    * directions plus a small per-vector perturbation, so k-means finds
    * real structure and every vector's nearest neighbor is within its
    * own archetype. */
  private def corpusDf(n: Int, from: Int = 0): DataFrame = {
    import spark.implicits._
    (from until n).map { i =>
      val arch = i % 4
      val v = Array.tabulate(DIM) { d =>
        val base = if (d % 4 == arch) 1.0f else 0.05f
        // modulus 101 is coprime to the archetype period 4, so
        // vectors repeat only every 404 ids — all ids in these tests
        // (< 400) are pairwise distinct and a planted copy's top-1
        // is its original, uniquely
        base + 0.005f * (((i * 31 + d * 17) % 101) - 50)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def fs = new org.apache.hadoop.fs.Path(warehouse)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (length, head-64-bytes hash) of every parquet file under dir,
    * recursively — the p40 byte-identity signature. */
  private def sigs(dir: String): Map[String, (Long, Int)] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val it = fs.listFiles(root, true)
    val b = Map.newBuilder[String, (Long, Int)]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet")) {
        val in = fs.open(st.getPath)
        val head = try { val a = new Array[Byte](64); in.readFully(0, a); a }
          finally in.close()
        b += st.getPath.toString ->
          ((st.getLen, java.util.Arrays.hashCode(head)))
      }
    }
    b.result()
  }

  private def searchCopiesOf(ids: Seq[Long], corpus: DataFrame,
      fq: String): Map[Long, Long] = {
    val queries = corpus.filter(col("vec_id").isin(ids.map(Long.box): _*))
      .select((col("vec_id") + 100000).as("qid"), col("embedding").as("qe"))
    IvfIndex.search(spark, queries, fq, nProbe = 2, topK = 1)
      .select(col("qid"), col("nid"))
      .collect().map(r => (r.getLong(0) - 100000) -> r.getLong(1)).toMap
  }

  test("search answers planted copy queries from the persisted tables alone") {
    val corpus = corpusDf(200)
    val fq = "graft_ivf.ann.e1"
    IvfIndex.build(spark, corpus, fq, k = 8)
    // persisted artifacts exist and carry the right cardinalities
    assert(spark.table(s"${fq}_centroids").count() === 8L)
    assert(spark.table(s"${fq}_assign").count() === 200L)
    // a planted copy's unique top-1 is its original, answered via the
    // probed partitions of the persisted inverted lists
    val got = searchCopiesOf(Seq(0L, 1L, 2L, 3L, 4L), corpus, fq)
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L))
  }

  test("probed-cell pruning: search scans only nProbe partitions per query") {
    val corpus = corpusDf(200)
    val fq = "graft_ivf.ann.e2"
    IvfIndex.build(spark, corpus, fq, k = 8)
    val queries = corpus.filter(col("vec_id") === 0L)
      .select((col("vec_id") + 100000).as("qid"), col("embedding").as("qe"))
    val plan = IvfIndex.search(spark, queries, fq, nProbe = 2, topK = 1)
      .queryExecution.executedPlan.toString
    // the literal IN over the probed cells must reach the assign scan
    assert(plan.contains("cell"), plan.take(2000))
    // the probed-cell candidate pool must be well under the corpus
    val cand = {
      val centroids = IvfIndex.centroidsOf(spark, fq)
      val qcells = queries.select(col("qid"), col("qe"),
        explode(graft.functions.VectorFns.nearestCells(col("qe"), centroids, 2))
          .as("cell"))
      val probed = qcells.select(col("cell").cast("int")).distinct()
        .collect().map(_.getInt(0)).toSet
      assert(probed.size <= 2)
      spark.table(s"${fq}_assign")
        .filter(col("cell").isin(probed.toSeq.map(Integer.valueOf): _*))
        .count()
    }
    assert(cand < 200L, s"probed-cell candidate pool $cand should prune the corpus")
  }

  test("refresh folds appends in O(delta): old list files byte-identical, new vectors searchable") {
    val fq = "graft_ivf.ann.e3"
    // corpus as a versioned catalog table
    spark.sql("DROP TABLE IF EXISTS graft_ivf.ann.corpus3")
    corpusDf(300).createOrReplaceTempView("ivf_c3")
    spark.sql("CREATE TABLE graft_ivf.ann.corpus3 AS SELECT * FROM ivf_c3")
    val corpusDir = s"$warehouse/ann/corpus3"
    graft.sources.ParquetVersions.enable(corpusDir) // v1
    IvfIndex.build(spark, spark.table("graft_ivf.ann.corpus3"), fq,
      k = 8, indexedVersion = 1L)
    val centroidsBefore = IvfIndex.centroidsOf(spark, fq).map(_.toSeq).toSeq
    val assignDir = s"$warehouse/ann/e3_assign"
    val before = sigs(assignDir)
    assert(before.nonEmpty)
    // append 100 vectors → corpus v2
    corpusDf(400, from = 300).createOrReplaceTempView("ivf_c3b")
    spark.sql("INSERT INTO graft_ivf.ann.corpus3 SELECT * FROM ivf_c3b")
    val v = IvfIndex.refresh(spark, corpusDir, fq)
    assert(v === 2L)
    assert(IvfIndex.indexedVersion(spark, fq) === 2L)
    assert(spark.table(s"${fq}_assign").count() === 400L)
    // no re-clustering, no list rewrite: centroids identical, every
    // pre-refresh parquet file still byte-identical
    assert(IvfIndex.centroidsOf(spark, fq).map(_.toSeq).toSeq === centroidsBefore)
    val after = sigs(assignDir)
    assert(before.forall { case (p, s) => after.get(p).contains(s) },
      "refresh rewrote a pre-existing inverted-list file")
    // an appended vector is immediately searchable through the index
    val got = searchCopiesOf(Seq(350L, 377L),
      spark.table("graft_ivf.ann.corpus3"), fq)
    assert(got === Map(350L -> 350L, 377L -> 377L))
  }

  test("maintainStream: the corpus changelog drives continuous index " +
      "maintenance — appends searchable, deletes gone, restart-safe") {
    val fq = "graft_ivf.ann.e5"
    spark.sql("DROP TABLE IF EXISTS graft_ivf.ann.corpus5")
    corpusDf(200).createOrReplaceTempView("ivf_c5")
    spark.sql("CREATE TABLE graft_ivf.ann.corpus5 AS SELECT * FROM ivf_c5")
    val corpusDir = s"$warehouse/ann/corpus5"
    graft.sources.ParquetVersions.enable(corpusDir) // v1
    IvfIndex.build(spark, spark.table("graft_ivf.ann.corpus5"), fq,
      k = 8, indexedVersion = 1L)
    val ck = java.nio.file.Files.createTempDirectory("graft_ivf_ck").toString
    val q = IvfIndex.maintainStream(spark, corpusDir, fq, ck)
    try {
      corpusDf(260, from = 200).createOrReplaceTempView("ivf_c5b")
      spark.sql("INSERT INTO graft_ivf.ann.corpus5 SELECT * FROM ivf_c5b")
      graft.sources.ParquetVersions.catchUp(corpusDir) // publish the append
      q.processAllAvailable()
      assert(IvfIndex.indexedVersion(spark, fq) >= 2L)
      assert(spark.table(s"${fq}_assign").count() === 260L)
      val got = searchCopiesOf(Seq(230L), spark.table("graft_ivf.ann.corpus5"), fq)
      assert(got === Map(230L -> 230L), "streamed-in append must be searchable")
      spark.sql("DELETE FROM graft_ivf.ann.corpus5 WHERE vec_id = 230")
      q.processAllAvailable()
      assert(spark.table(s"${fq}_assign").filter(col("vec_id") === 230L).count() === 0L,
        "streamed-in delete must leave the index")
    } finally q.stop()
    // restart from the checkpoint: nothing replays (refresh idempotent
    // on a no-op span), another append still folds
    val metaAfter = IvfIndex.indexedVersion(spark, fq)
    val q2 = IvfIndex.maintainStream(spark, corpusDir, fq, ck)
    try {
      q2.processAllAvailable()
      assert(IvfIndex.indexedVersion(spark, fq) === metaAfter)
      assert(spark.table(s"${fq}_assign").count() === 259L)
      corpusDf(265, from = 260).createOrReplaceTempView("ivf_c5c")
      spark.sql("INSERT INTO graft_ivf.ann.corpus5 SELECT * FROM ivf_c5c")
      graft.sources.ParquetVersions.catchUp(corpusDir)
      q2.processAllAvailable()
      assert(spark.table(s"${fq}_assign").count() === 264L)
    } finally q2.stop()
  }

  test("refresh propagates corpus deletes") {
    val fq = "graft_ivf.ann.e4"
    spark.sql("DROP TABLE IF EXISTS graft_ivf.ann.corpus4")
    corpusDf(200).createOrReplaceTempView("ivf_c4")
    spark.sql("CREATE TABLE graft_ivf.ann.corpus4 AS SELECT * FROM ivf_c4")
    val corpusDir = s"$warehouse/ann/corpus4"
    graft.sources.ParquetVersions.enable(corpusDir) // v1
    IvfIndex.build(spark, spark.table("graft_ivf.ann.corpus4"), fq,
      k = 8, indexedVersion = 1L)
    // keep a copy of vector 42's embedding, then delete it from the corpus
    val q42 = spark.table("graft_ivf.ann.corpus4").filter(col("vec_id") === 42L)
      .select((col("vec_id") + 100000).as("qid"), col("embedding").as("qe"))
      .cache()
    assert(q42.count() === 1L)
    spark.sql("DELETE FROM graft_ivf.ann.corpus4 WHERE vec_id = 42") // v2
    IvfIndex.refresh(spark, corpusDir, fq)
    assert(spark.table(s"${fq}_assign").filter(col("vec_id") === 42L).count() === 0L)
    // its planted copy now resolves to some OTHER vector
    val top = IvfIndex.search(spark, q42, fq, nProbe = 2, topK = 1)
      .select(col("nid")).collect().map(_.getLong(0))
    assert(top.length === 1)
    assert(top.head !== 42L)
    // idempotent no-op when the corpus hasn't moved
    assert(IvfIndex.refresh(spark, corpusDir, fq) === 2L)
  }
}
