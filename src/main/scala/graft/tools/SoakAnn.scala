package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfIndex

/** PERSISTED-ANN SERVING-PATH SCALE SOAK (VERDICT r18 missing #1): the
  * IVF index claims (a) search cost is O(probed lists) — with the
  * adaptive `k ≈ sqrt(n)` sizing policy the probed rows grow ~sqrt(n),
  * NOT ~n — (b) per-batch maintenance (the maintainStream body:
  * refresh + deltaDrift + hygiene) is O(delta), flat in corpus size,
  * and (c) a full online rebuild stays O(n) — linear, never worse.
  * IvfIndexSpec proves the mechanisms at unit shape; this soak measures
  * them against 1/10/100× corpus growth and GATES on the exponents,
  * the way SoakSidecars gates the sidecar claim.
  *
  * Per scale (n = base × scale): a corpus of n vectors is
  * CTAS'd, versioned, and indexed at the POLICY cell count
  * ([[IvfIndex.adaptiveCellCount]]); a fixed-size delta (the same
  * `delta` rows at every scale — per-batch work must not depend on
  * corpus size) appends through the change feed and the full
  * maintenance batch body is timed; a cold planted-copy search is
  * timed (median of 3 after one warm-up) alongside the EXACT rows the
  * probed-cell scan reads (Σ probed-cell sizes — the work metric, free
  * of driver-job constant noise); then an AutoK online [[IvfIndex
  * .rebuild]] is timed and the new generation's cell count asserted at
  * the policy value. A FROZEN-k (16) twin index is measured at each
  * scale for the contrast: its probed rows grow ~n (exponent ≈ 1) —
  * exactly the degeneration the adaptive policy exists to prevent
  * (VERDICT r18 "What's wrong" #1).
  *
  * Gates (log-log exponents between the smallest and largest scale,
  * denominated in the corpus size AT MEASUREMENT time):
  *   - adaptive probed-rows exponent ≤ 0.7, raw and quantized (the
  *     sqrt-n path carries a size-biased sampling tax: a query probes
  *     its own neighborhood's cells, which are the above-average ones,
  *     and the fixture has 32 natural clusters for k-means to split —
  *     measured ≈ 0.63–0.66; brute force / frozen-k reads 1.0);
  *   - frozen-k probed-rows exponent ≥ 0.9 (the contrast: with 32
  *     uniform probes over 16 frozen cells EVERY cell is probed and
  *     the "index" degenerates to a full scan — measured exactly 1.0);
  *   - per-batch maintenance wall exponent ≤ 0.4 (O(delta) claim);
  *   - rebuild wall exponent ≤ 1.3 (linear, never worse);
  *   - correctness net at EVERY scale: planted-copy queries answer
  *     exactly (smallest id of the copy's residue class) both before
  *     and after the rebuild, on both layouts, and the rebuilt
  *     generation's cell count equals the policy value.
  *
  * The SQ8 and IVF-PQ legs run the same planted queries and work
  * metric over their code lists (gates: both coarse-scan exponents
  * ≤ 0.7), and the PQ leg adds the INDEX-SIZE evidence row — physical
  * list bytes per vector across raw/SQ8/PQ, gated at the largest scale
  * on PQ ≤ 0.7 × SQ8 (expected ≈ 0.4–0.6: 8 + 4 payload bytes per
  * vector vs 32 + 8 before the shared vec_id/cell overhead).
  *
  * Usage: runMain graft.tools.SoakAnn [base] [delta] [scales]
  * (defaults 2000, 2000, 1,10,100 → 2k/20k/200k vectors). One JSON
  * line per scale, then a summary with exponents. */
object SoakAnn {

  private val DIM = 32

  /** Deterministic synthetic embeddings, generated DISTRIBUTED (no
    * driver-side materialization): 32 archetype directions plus a
    * small hash perturbation — k-means finds real cluster structure,
    * and a planted copy's unique global top-1 is its original for ids
    * below the repeat period (lcm(32, 251) = 8032; ties break to the
    * smaller nid). */
  private def corpusDf(spark: SparkSession, from: Long, until: Long): DataFrame =
    spark.range(from, until).select(col("id").as("vec_id"),
      expr(s"""transform(sequence(0, ${DIM - 1}), d -> CAST(
                 (CASE WHEN d = id % $DIM THEN 1.0 ELSE 0.05 END)
                 + 0.005 * (((id * 31 + d * 17) % 251) - 125) AS FLOAT))""")
        .as("embedding"))

  private def nearestCellsLocal(q: Array[Float],
      centroids: Array[Array[Double]], nProbe: Int): Seq[Int] =
    centroids.indices.map { c =>
      var d = 0.0; var i = 0
      while (i < q.length) { val t = q(i) - centroids(c)(i); d += t * t; i += 1 }
      (d, c)
    }.sortBy(_._1).take(nProbe).map(_._2)

  def main(args: Array[String]): Unit = {
    // The f"" interpolators below emit JSON; pin the decimal separator.
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val base = if (args.nonEmpty) args(0).toInt else 2000
    val delta = if (args.length > 1) args(1).toInt else 2000
    val scales = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(1, 10, 100)
    val spark = graft.Sessions.base()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_soakann_wh").toString
    spark.conf.set("spark.sql.catalog.graft_ann", "graft.sources.LogCatalog")
    spark.conf.set("spark.sql.catalog.graft_ann.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft_ann.lake")
    import spark.implicits._

    // global warm-up so scale 1 doesn't carry the JVM/codegen tax that
    // would flatter every growth exponent
    {
      corpusDf(spark, 0, 500).createOrReplaceTempView("soakann_warm")
      spark.sql("CREATE TABLE graft_ann.lake.warm AS SELECT * FROM soakann_warm")
      IvfIndex.build(spark, spark.table("graft_ann.lake.warm"),
        "graft_ann.lake.iwarm", k = 8)
      val q = spark.table("graft_ann.lake.warm").filter(col("vec_id") === 7L)
        .select((col("vec_id") + 100000).as("qid"), col("embedding").as("qe"))
      IvfIndex.search(spark, q, "graft_ann.lake.iwarm", nProbe = 2, topK = 1)
        .collect()
      ()
    }

    val probedRows = scala.collection.mutable.Map[Int, Double]()
    val probedRowsFrozen = scala.collection.mutable.Map[Int, Double]()
    val probedRowsQ = scala.collection.mutable.Map[Int, Double]()
    val probedRowsP = scala.collection.mutable.Map[Int, Double]()
    val searchWall = scala.collection.mutable.Map[Int, Double]()
    val searchWallQ = scala.collection.mutable.Map[Int, Double]()
    val searchWallP = scala.collection.mutable.Map[Int, Double]()
    val maintWall = scala.collection.mutable.Map[Int, Double]()
    val rebuildWall = scala.collection.mutable.Map[Int, Double]()
    val corpusN = scala.collection.mutable.Map[Int, Double]()
    val pqBytesRatio = scala.collection.mutable.Map[Int, Double]()

    for (scale <- scales) {
      val n = base.toLong * scale
      val fq = s"graft_ann.lake.ix$scale"
      val fqF = s"graft_ann.lake.ixf$scale"
      val corpusTbl = s"graft_ann.lake.c$scale"
      val corpusDir = s"$wh/lake/c$scale"
      spark.sql(s"DROP TABLE IF EXISTS $corpusTbl")
      corpusDf(spark, 0, n).createOrReplaceTempView(s"soakann_c$scale")
      spark.sql(s"CREATE TABLE $corpusTbl AS SELECT * FROM soakann_c$scale")
      graft.sources.ParquetVersions.enable(corpusDir) // v1
      val kPolicy = IvfIndex.adaptiveCellCount(n)
      IvfIndex.build(spark, spark.table(corpusTbl), fq,
        k = kPolicy, indexedVersion = 1L)
      // the FROZEN-k contrast twin — the r18 failure mode made visible
      IvfIndex.build(spark, spark.table(corpusTbl), fqF,
        k = 16, indexedVersion = 1L)

      // --- (b) per-batch maintenance: the maintainStream batch body on
      // a FIXED-SIZE delta — O(delta) means this wall ignores n
      corpusDf(spark, n, n + delta).createOrReplaceTempView(s"soakann_d$scale")
      spark.sql(s"INSERT INTO $corpusTbl SELECT * FROM soakann_d$scale")
      graft.sources.ParquetVersions.catchUp(corpusDir)
      val v0 = IvfIndex.indexedVersion(spark, fq)
      val tM = System.nanoTime()
      val v1 = IvfIndex.refresh(spark, corpusDir, fq)
      IvfIndex.deltaDrift(spark, corpusDir, v0, v1, fq)
      IvfIndex.hygiene(spark, fq)
      val mWall = (System.nanoTime() - tM) / 1e9
      IvfIndex.refresh(spark, corpusDir, fqF) // keep the twin current too

      // --- (a) cold search: planted copies of 16 ids spread UNIFORMLY
      // across the whole id range, so the probed cells sample the
      // data-adaptive partition like real traffic would (a low-id-only
      // query set samples only the first archetypes' cells). The
      // synthetic repeats with period lcm(32, 251) = 8032, so a copy's
      // exact top-1 is the SMALLEST id in its residue class — id % 8032
      // — which the corpus always contains (ids are dense from 0).
      val qIds = (0 until 16).map(i => (i.toLong * (n / 17)) % n)
      val qVecs = spark.table(corpusTbl)
        .filter(col("vec_id").isin(qIds.map(Long.box): _*))
        .select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toMap
      val queries = qIds.distinct.map(id => (id + 1000000L, qVecs(id)))
        .toDF("qid", "qe")
      queries.cache().count()
      def runSearch(f: String): Map[Long, Long] =
        IvfIndex.search(spark, queries, f, nProbe = 2, topK = 1)
          .select(col("qid"), col("nid"))
          .collect().map(r => (r.getLong(0) - 1000000L) -> r.getLong(1)).toMap
      runSearch(fq) // warm-up
      val walls = (1 to 3).map { _ =>
        spark.catalog.clearCache(); queries.cache().count()
        val t = System.nanoTime()
        val got = runSearch(fq)
        val w = (System.nanoTime() - t) / 1e9
        require(qIds.distinct.forall(id => got.get(id).contains(id % 8032L)),
          s"CORRECTNESS GATE FAILED at scale $scale: planted copies " +
            s"must answer exactly, got ${got.toSeq.sorted.take(4)}…")
        w
      }.sorted
      val sWall = walls(1) // median of 3
      // the WORK metric, free of driver-job constants: exactly the rows
      // the probed-cell scan reads, re-derived from the probe rule
      def rowsProbed(f: String): Long = {
        val cs = IvfIndex.centroidsOf(spark, f)
        val cells = qVecs.values.toSeq
          .flatMap(q => nearestCellsLocal(q, cs, 2)).distinct
        spark.table(IvfIndex.assignTableName(spark, f))
          .filter(col("cell").isin(cells.map(Integer.valueOf): _*)).count()
      }
      val pRows = rowsProbed(fq)
      val pRowsF = rowsProbed(fqF)

      // --- (a') the QUANTIZED layout (SQ8 — the preferred shape at
      // 100 TB: ~4× leaner lists, coarse pass over codes, exact refine
      // against the corpus through InSet file skipping): same planted
      // queries, same work metric over the probed CODE rows
      val fqQ = s"graft_ann.lake.ixq$scale"
      IvfIndex.buildQuantized(spark, spark.table(corpusTbl), corpusTbl,
        fqQ, k = kPolicy)
      def runSearchQ(): Map[Long, Long] =
        IvfIndex.searchQuantized(spark, queries, fqQ, nProbe = 2, topK = 1)
          .select(col("qid"), col("nid"))
          .collect().map(r => (r.getLong(0) - 1000000L) -> r.getLong(1)).toMap
      runSearchQ() // warm-up
      val qWalls = (1 to 3).map { _ =>
        val t = System.nanoTime()
        val got = runSearchQ()
        val w = (System.nanoTime() - t) / 1e9
        require(qIds.distinct.forall(id => got.get(id).contains(id % 8032L)),
          s"CORRECTNESS GATE FAILED at scale $scale (quantized): " +
            s"${got.toSeq.sorted.take(4)}…")
        w
      }.sorted
      val qWall = qWalls(1)
      val pRowsQ = rowsProbed(fqQ)

      // --- (a'') the PRODUCT-QUANTIZED layout (IVF-PQ, m = 8 → 8 code
      // bytes + one norm per vector vs SQ8's 32 + 8 — the compression
      // step that keeps a 100 TB corpus's index in cluster memory):
      // same planted queries, same work metric, plus the INDEX-BYTES
      // evidence row comparing the three layouts' physical list sizes
      val fqP = s"graft_ann.lake.ixp$scale"
      IvfIndex.buildPq(spark, spark.table(corpusTbl), corpusTbl,
        fqP, k = kPolicy, m = 8)
      // refineFactor 16, not the default 4: PQ reconstructs from an
      // m-byte code against sample-fit codebooks, so a sparsely-sampled
      // pattern's own reconstruction can rank below other patterns'
      // coarse scores — the standard IVF-PQ serving posture is a WIDER
      // exact-refine pool than SQ8's (FAISS guidance; the refine is
      // cheap: 16 ids per query through the InSet ladder). At scale 100
      // this fixture fits 256-entry codebooks on a 7k-row sample of a
      // 202k corpus — exactly the sparse regime that needs the width.
      def runSearchP(): Map[Long, Long] =
        IvfIndex.searchPq(spark, queries, fqP, nProbe = 2, topK = 1,
            refineFactor = 16)
          .select(col("qid"), col("nid"))
          .collect().map(r => (r.getLong(0) - 1000000L) -> r.getLong(1)).toMap
      runSearchP() // warm-up
      val pWalls = (1 to 3).map { _ =>
        val t = System.nanoTime()
        val got = runSearchP()
        val w = (System.nanoTime() - t) / 1e9
        require(qIds.distinct.forall(id => got.get(id).contains(id % 8032L)),
          s"CORRECTNESS GATE FAILED at scale $scale (pq): " +
            s"${got.toSeq.sorted.take(4)}…")
        w
      }.sorted
      val pWall = pWalls(1)
      val pRowsP = rowsProbed(fqP)
      // per-vector storage evidence, ENCODING-NEUTRAL: this fixture's
      // vectors repeat every 8032 ids from a small per-dim value set,
      // so parquet's dictionary encoding compresses the RAW floats in a
      // way real (near-random-float) embeddings never enjoy — the live
      // index files' sizes would understate raw and flatter nothing.
      // Re-write each layout's list projection with dictionary OFF and
      // no codec and measure THAT: the honest physical width of what a
      // high-entropy corpus would store. (fqF is the raw baseline —
      // same full corpus, raw layout.)
      def evidenceBytes(f: String, tag: String): Long = {
        val out = s"$wh/evidence_${tag}_$scale"
        spark.table(IvfIndex.assignTableName(spark, f))
          .write.mode("overwrite")
          .option("compression", "uncompressed")
          .option("parquet.enable.dictionary", "false")
          .parquet(out)
        val dir = new org.apache.hadoop.fs.Path(out)
        val hfs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = hfs.listFiles(dir, true)
        var b = 0L
        while (it.hasNext) {
          val st = it.next()
          if (st.isFile && st.getPath.getName.endsWith(".parquet")) b += st.getLen
        }
        hfs.delete(dir, true)
        b
      }
      val bytesRaw = evidenceBytes(fqF, "raw")
      val bytesSq8 = evidenceBytes(fqQ, "sq8")
      val bytesPq = evidenceBytes(fqP, "pq")

      // --- (c) online rebuild at AutoK: wall bounded-linear, cell
      // count lands at the policy value, recall holds through the swap
      val tR = System.nanoTime()
      IvfIndex.rebuild(spark, spark.table(corpusTbl), corpusDir, fq)
      val rWall = (System.nanoTime() - tR) / 1e9
      val kAfter = spark.table(IvfIndex.centroidsTableName(spark, fq)).count()
      require(kAfter == IvfIndex.adaptiveCellCount(n + delta),
        s"SIZING GATE FAILED at scale $scale: rebuild landed $kAfter cells, " +
          s"policy wants ${IvfIndex.adaptiveCellCount(n + delta)}")
      val gotAfter = runSearch(fq)
      require(qIds.distinct.forall(id => gotAfter.get(id).contains(id % 8032L)),
        s"CORRECTNESS GATE FAILED at scale $scale post-rebuild")
      queries.unpersist()

      // exponents divide by the corpus size AT MEASUREMENT TIME — the
      // fixed delta doubles the smallest scale's corpus, so dividing by
      // n would overstate every growth ratio's denominator gap
      corpusN(scale) = (n + delta).toDouble
      probedRows(scale) = pRows.toDouble
      probedRowsFrozen(scale) = pRowsF.toDouble
      probedRowsQ(scale) = pRowsQ.toDouble
      probedRowsP(scale) = pRowsP.toDouble
      searchWall(scale) = sWall
      searchWallQ(scale) = qWall
      searchWallP(scale) = pWall
      maintWall(scale) = mWall
      rebuildWall(scale) = rWall
      pqBytesRatio(scale) = bytesPq.toDouble / math.max(bytesSq8, 1L)
      println(f"""{"op":"ann_scale","scale":$scale,"n":$n,"k":$kPolicy,"probed_rows":$pRows,"probed_rows_frozen_k16":$pRowsF,"probed_code_rows_quantized":$pRowsQ,"probed_code_rows_pq":$pRowsP,"search_wall_sec":$sWall%.3f,"search_wall_quantized_sec":$qWall%.3f,"search_wall_pq_sec":$pWall%.3f,"maint_batch_sec":$mWall%.3f,"rebuild_sec":$rWall%.3f,"delta_rows":$delta,"list_bytes_raw":$bytesRaw,"list_bytes_sq8":$bytesSq8,"list_bytes_pq":$bytesPq,"bytes_per_vec_raw":${bytesRaw / (n + delta)}%d,"bytes_per_vec_sq8":${bytesSq8 / (n + delta)}%d,"bytes_per_vec_pq":${bytesPq / (n + delta)}%d}""")
    }

    val lo = scales.min
    val hi = scales.max
    /** Exponents stay numeric (Option[Double]) for the gates — the f""
      * interpolator is locale-sensitive ("0,63" under de_DE), so
      * round-tripping through a string and .toDouble would crash the
      * soak instead of gating (ADVICE r19). Formatting to JSON pins
      * Locale.ROOT. */
    def expOpt(m: scala.collection.mutable.Map[Int, Double]): Option[Double] =
      if (scales.size < 2 || lo == hi || !m.contains(lo) || !m.contains(hi)) None
      else {
        val e = math.log(m(hi) / math.max(m(lo), 1e-9)) /
          math.log(corpusN(hi) / corpusN(lo))
        if (e.isNaN || e.isInfinite) None else Some(e)
      }
    def jn(o: Option[Double]): String = o.fold("null")(e =>
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(e)))
    val pExpO = expOpt(probedRows)
    val pfExpO = expOpt(probedRowsFrozen)
    val pqExpO = expOpt(probedRowsQ)
    val ppExpO = expOpt(probedRowsP)
    val mExpO = expOpt(maintWall)
    val rExpO = expOpt(rebuildWall)
    val (pExp, pfExp, pqExp, ppExp, mExp, rExp) =
      (jn(pExpO), jn(pfExpO), jn(pqExpO), jn(ppExpO), jn(mExpO), jn(rExpO))
    require(pExpO.forall(_ <= 0.7),
      s"SCALING GATE FAILED: adaptive probed-rows exponent $pExp " +
        "(want ≈ 0.5–0.65) — search work is growing faster than the " +
        "sqrt-n path plus its size-biased sampling tax allows")
    require(mExpO.forall(_ <= 0.4),
      s"SCALING GATE FAILED: per-batch maintenance exponent $mExp " +
        "(want ≈ 0) — the fixed-size delta's fold cost grows with the corpus")
    require(rExpO.forall(_ <= 1.3),
      s"SCALING GATE FAILED: rebuild wall exponent $rExp (want ≤ 1)")
    require(pfExpO.forall(_ >= 0.9),
      s"CONTRAST BROKEN: frozen-k probed rows exponent $pfExp should be ≈ 1 " +
        "(if this fails the soak is not measuring what it claims)")
    require(pqExpO.forall(_ <= 0.7),
      s"SCALING GATE FAILED: quantized probed CODE rows exponent $pqExp " +
        "(want ≈ 0.5–0.65) — the SQ8 coarse scan is growing faster than " +
        "the sqrt-n path plus its size-biased sampling tax allows")
    require(ppExpO.forall(_ <= 0.7),
      s"SCALING GATE FAILED: PQ probed CODE rows exponent $ppExp " +
        "(want ≈ 0.5–0.65) — the IVF-PQ coarse scan is growing faster " +
        "than the sqrt-n path plus its size-biased sampling tax allows")
    // index-size evidence gate, at the LARGEST scale where parquet
    // footers have amortized: the PQ lists must be materially leaner
    // than SQ8's (8 code bytes + 4 vs 32 + 8 per vector before the
    // shared vec_id/cell overhead → expect ≈ 0.4–0.6)
    require(pqBytesRatio.get(hi).forall(_ <= 0.7),
      f"STORAGE GATE FAILED: PQ lists are ${pqBytesRatio(hi)}%.2f of SQ8's " +
        "at the largest scale — want ≤ 0.7 (the layout exists to be smaller)")
    println(s"""{"soak":"ann_serving_path","base":$base,"delta":$delta,""" +
      s""""scales":[${scales.mkString(",")}],""" +
      s""""probed_rows_exp":$pExp,"probed_rows_frozen_k_exp":$pfExp,""" +
      s""""probed_code_rows_quantized_exp":$pqExp,""" +
      s""""probed_code_rows_pq_exp":$ppExp,""" +
      s""""search_wall_exp":${jn(expOpt(searchWall))},""" +
      s""""search_wall_quantized_exp":${jn(expOpt(searchWallQ))},""" +
      s""""search_wall_pq_exp":${jn(expOpt(searchWallP))},""" +
      s""""pq_to_sq8_bytes_ratio_at_max_scale":${jn(pqBytesRatio.get(hi))},""" +
      s""""maint_batch_exp":$mExp,"rebuild_wall_exp":$rExp}""")
    spark.stop()
  }
}
