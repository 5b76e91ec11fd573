package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.{HashFns, SketchExprs, TextFns, VectorFns}

/** Deduplication suite over the documents table — the training-data
  * pipeline operators, each designed for 100 TB first and verified at
  * corpus scale.
  *
  * Common scale pattern: candidate generation is always a *bucketed
  * equi-join* (LSH bands / simhash chunks / shared n-grams), never an
  * O(n²) cross join; sketches are per-row codegen'd column expressions
  * (no UDFs, no shuffle until the bucket join); exact verification runs
  * only on candidate pairs.
  *
  * Dedup policy everywhere: keep-first (lowest doc_id of a duplicate
  * group survives), matching the exact-dedup oracle semantics.
  */
object Dedup {

  private val SHINGLE_K = 3
  private val MINHASH_N = 64
  private val LSH_BANDS = 16 // 16 bands × 4 rows
  private val JACCARD_T = 0.8
  private val BUCKET_CAP = 1000L // LSH band-bucket size cap (skew guard)

  /** Exact dedup via content hash — oracle-checked. At 100 TB: one
    * hash-groupBy shuffle on sha256 (uniformly distributed keys — no
    * skew by construction). */
  def d01_dedup_exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(sha2(col("text"), 256).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  /** Docs + MinHash signature + LSH band hashes (all per-row compute). */
  private def minhashDocs(docsRaw: DataFrame): DataFrame =
    docsRaw
      // fused native normalize → shingle windows → per-gram hash
      // (multiset, position order), then the same mod-P reduction
      // baseHashes applied. Hashed shingles (8-byte elements) serve
      // both the signature and the exact-Jaccard verify — string
      // shingle arrays never exist. The per-gram hash is FNV-1a 64
      // (r19, the d03/u02 precedent) rather than xxhash64 so the WHOLE
      // pipeline — signature → banding → capped buckets → Jaccard
      // verify → verdict — is recomputable by the DuckDB oracle
      // ([[minhashLshOracleSql]], which splices the same (a_i, b_i)
      // universal-hash family as SQL literals). */
      .select(col("doc_id"), graft.functions.TextExprs.wordGramHashes(
        TextFns.normalized(col("text")), SHINGLE_K, distinct = false,
        fnv = true).as("sh_raw"))
      .select(col("doc_id"),
        transform(col("sh_raw"), h => pmod(h, lit(HashFns.P))).as("sh_h"))
      .withColumn("sig", HashFns.minhashFromBases(col("sh_h"), MINHASH_N))
      .withColumn("bands", HashFns.lshBands(col("sig"), LSH_BANDS, MINHASH_N / LSH_BANDS))

  /** Unordered pairs (x_i, x_j), i < j, of a sorted in-bucket element
    * array — candidate generation WITHOUT a self-join: the bucket is
    * built by one (pre-filtered) groupBy and the quadratic pair
    * expansion happens in-row on the reduce side. The bucket cap keeps
    * any one expanded array ≤ cap²/2 structs. */
  private def bucketPairs(ids: Column): Column =
    flatten(transform(ids, (x, i) =>
      transform(slice(ids, i + lit(2), size(ids)),
        y => struct(x.as("a"), y.as("b")))))

  /** Size-capped bucket build that never MATERIALIZES a degenerate
    * bucket: ONE hash aggregation through the native
    * [[graft.functions.BoundedCollectList]] aggregate, whose partial
    * and merged buffers stop growing at cap + 1 elements. A
    * pathological key shared by the whole corpus (empty docs,
    * boilerplate) costs each map task at most cap + 1 buffer entries
    * and the shuffle at most (cap + 1) · partitions elements — then
    * surfaces as an over-cap array the size filter drops. Groups within
    * the cap are collected completely (partial counts sum to the global
    * count, so no buffer can truncate a surviving group), which keeps
    * the output bit-identical to an uncapped collect_list + the same
    * filter — DedupSpec asserts that equivalence. vs the previous
    * count-prefilter + semi-join + collect_list shape: same memory
    * bound, but one pass over the postings instead of two. */
  private def cappedBuckets(postings: DataFrame, keys: Seq[String],
      elem: Column, cap: Long): DataFrame = {
    import graft.functions.BoundedCollect.boundedCollectList
    val keyCols = keys.map(col)
    postings.groupBy(keyCols: _*)
      .agg(boundedCollectList(elem, cap.toInt).as("_es"))
      .filter(size(col("_es")).between(2, cap.toInt))
      .select(keyCols :+ sort_array(col("_es")).as("es"): _*)
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket.
    * Bucket key = (band index, band hash); bucket size capped at 1000
    * via the count pre-filter (degenerate buckets are dropped before
    * any posting list exists in memory). */
  private def lshCandidates(docs: DataFrame): DataFrame = {
    val postings = docs.select(col("doc_id"),
      posexplode(col("bands")).as(Seq("band_i", "band_h")))
    cappedBuckets(postings, Seq("band_i", "band_h"), col("doc_id"), BUCKET_CAP)
      .select(explode(bucketPairs(col("es"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  /** MinHash + LSH near-dedup: shingle → 64-hash signature → 16-band
    * bucketing → candidate join → exact shingle-Jaccard verify ≥ 0.8.
    * Output: one row per doc with its dup verdict. ORACLE-CHECKED as of
    * r19 ([[minhashLshOracleSql]] recomputes the whole pipeline in
    * DuckDB); DedupSpec additionally verifies detection on planted
    * near-duplicates. */
  def d02_dedup_minhash_lsh(spark: SparkSession, dir: String): DataFrame =
    minhashDedup(Tables.documents(spark, dir))

  /** LSH candidates → exact shingle-Jaccard verify ≥ [[JACCARD_T]];
    * `docs` is [[minhashDocs]] output. Pairs (a < b). */
  private def minhashVerifiedPairs(docs: DataFrame): DataFrame =
    lshCandidates(docs)
      .join(docs.select(col("doc_id").as("a"), col("sh_h").as("sh_a")), "a")
      .join(docs.select(col("doc_id").as("b"), col("sh_h").as("sh_b")), "b")
      .filter(jaccard(col("sh_a"), col("sh_b")) >= JACCARD_T)

  /** Core, corpus-independent: input needs (doc_id, text). */
  def minhashDedup(docsRaw: DataFrame): DataFrame = {
    val docs = minhashDocs(docsRaw).cache()
    perDocVerdict(docs.select("doc_id"), minhashVerifiedPairs(docs))
  }

  /** The MinHash-LSH pipeline on a PLANTED corpus (the construction
    * predates d02's own full-pipeline oracle and stays as the
    * recall-1 anchor): a planted corpus where the exact
    * verify set is computable in plain SQL. Every token is prefixed
    * with its doc_id, so DISTINCT docs share ZERO shingles — the only
    * pairs with any overlap are (doc, its variant), where the variant
    * drops the final token (shingle-Jaccard ≥ (m-3)/m, m ≥ 48 distinct
    * shingles ⇒ ≥ 0.93, far above both the 0.8 verify threshold and the
    * 16×4 LSH band-collision knee — recall 1 for this corpus). Spark
    * runs the REAL pipeline end to end — signatures, banding, capped
    * buckets, candidate join, exact verify; DuckDB computes the same
    * pair set from first principles (shared-shingle counts), so the
    * hash compare pins candidate generation + verification, not a
    * degenerate shortcut. */
  def d10_dedup_minhash_planted(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")).between(50, 400))
      .select(col("doc_id"),
        transform(col("toks"),
          t => concat(lit("d"), col("doc_id"), lit("x"), t)).as("toks"))
    val variants = base.select((col("doc_id") + 100000).as("doc_id"),
      slice(col("toks"), lit(1), size(col("toks")) - 1).as("toks"))
    val corpus = base.unionByName(variants)
      .select(col("doc_id"), array_join(col("toks"), " ").as("text"))
    minhashVerifiedPairs(minhashDocs(corpus).cache())
      .select(col("a"), col("b"))
      .orderBy(col("a"), col("b"))
  }

  /** SimHash near-dedup: 64-bit sign-of-weighted-bits sketch per doc,
    * banded into 4 × 16-bit chunks for candidates, verified by Hamming
    * distance ≤ 3. */
  def d03_dedup_simhash(spark: SparkSession, dir: String): DataFrame =
    simhashDedup(Tables.documents(spark, dir))

  /** Core, corpus-independent: input needs (doc_id, text). */
  def simhashDedup(docsRaw: DataFrame): DataFrame = {
    val docs = simhashDocs(docsRaw)
    perDocVerdict(docs.select("doc_id"), simhashVerifiedPairs(docs))
  }

  /** (doc_id, sh64, bands): 64-bit SimHash + its 4 × 16-bit band
    * chunks, cached. Tokens materialized before the per-element hash
    * transform. SimHash votes over all 64 bits, so it needs full-width
    * RAW hash values — the mod-P baseHashes family is MinHash-only,
    * and feeding it here would leave bits 31–63 constant: the two
    * upper 16-bit bands would put the entire corpus in one bucket.
    * The per-token hash is the engine's own FNV-1a 64 codegen
    * expression (NOT xxhash64) so the WHOLE pipeline is
    * oracle-mirrorable: DuckDB folds the identical hash per token with
    * HUGEINT mod-2^64 arithmetic (the u02 precedent), recomputes the
    * bit votes, and brute-forces the Hamming-≤3 pair set — which the
    * banded path finds EXACTLY (≤ 3 differing bits across 4 disjoint
    * 16-bit bands leave at least one band identical, so banding is a
    * guaranteed-complete candidate generator at this threshold, not a
    * probabilistic one; only the d03 bucket cap (1000) could drop
    * candidates, and only on a corpus with >1000 docs sharing a band
    * value). OperatorsSpec's live-bands leg pins that FNV keeps all
    * four bands discriminating. */
  private def simhashDocs(docsRaw: DataFrame): DataFrame = docsRaw
    .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
    .select(col("doc_id"),
      transform(col("toks"), t => graft.functions.Udx.graft_fnv64(t)).as("tok_h"))
    .select(col("doc_id"), HashFns.simhashFromHashes(col("tok_h")).as("sh64"))
    .withColumn("bands", array((0 until 4).map(j =>
      shiftrightunsigned(col("sh64"), j * 16).bitwiseAND(lit(0xFFFFL))): _*))
    .cache()

  /** Band-bucketed candidates → Hamming ≤ 3 verify. Buckets carry
    * (doc_id, sh64) as the element so the Hamming verify happens
    * in-row during pair expansion — no rejoin (sort_array on structs
    * orders by doc_id, the first field, preserving the a < b
    * convention). Bucket size capped via the count pre-filter in
    * cappedBuckets. */
  private def simhashVerifiedPairs(docs: DataFrame): DataFrame = {
    val postings = docs.select(
      posexplode(col("bands")).as(Seq("band_i", "band_h")),
      struct(col("doc_id"), col("sh64")).as("e"))
    cappedBuckets(postings, Seq("band_i", "band_h"), col("e"), 1000)
      .select(explode(flatten(transform(col("es"), (x, i) =>
        transform(slice(col("es"), i + lit(2), size(col("es"))), y =>
          struct(x.getField("doc_id").as("a"), y.getField("doc_id").as("b"),
            HashFns.hamming(x.getField("sh64"), y.getField("sh64")).as("dist")))))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.dist").as("dist"))
      .filter(col("dist") <= 3)
      .distinct()
  }

  /** SimHash made ORACLE-CHECKABLE — the d10/d11 planted technique:
    * doc-prefixed tokens (cross-doc feature sets disjoint) plus EXACT
    * copies. A copy's SimHash is bit-identical (Hamming 0 — found
    * through any band); two distinct docs' sketches are sums of
    * disjoint independent votes, so their Hamming distance is
    * Binomial(64, ½) — P(≤ 3) ≈ 2⁻⁴⁸ per pair, zero pairs in practice
    * and deterministic for this fixed corpus. The verified pair set is
    * therefore exactly the identical-text pairs, which DuckDB computes
    * from first principles (content-hash equality). Pins banding,
    * capped buckets, in-row Hamming verify end to end. */
  def d12_dedup_simhash_planted(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .filter(col("doc_id") < 300)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .filter(size(col("toks")).between(30, 400))
      .select(col("doc_id"),
        array_join(transform(col("toks"),
          t => concat(lit("d"), col("doc_id"), lit("x"), t)), " ").as("text"))
    val copies = base.select((col("doc_id") + 100000).as("doc_id"), col("text"))
    val docs = simhashDocs(base.unionByName(copies))
    simhashVerifiedPairs(docs)
      .select(col("a"), col("b"))
      .orderBy(col("a"), col("b"))
  }

  /** Character-3-gram Jaccard near-dedup via inverted index: explode
    * n-grams, drop stop-grams (document frequency > 20% of corpus — at
    * 100 TB this is the skew guard), join postings on the gram, count
    * shared grams per pair, verify exact Jaccard ≥ 0.7. */
  def d04_dedup_ngram_jaccard(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardDedup(Tables.documents(spark, dir))

  /** Core, corpus-independent: input needs (doc_id, text). */
  def ngramJaccardDedup(docsRaw: DataFrame): DataFrame =
    perDocVerdict(docsRaw.select("doc_id"), ngramVerifiedPairs(docsRaw))

  /** Verified near-dup pairs (a < b, exact Jaccard ≥ 0.7) — the edge
    * set consumed by both the per-doc verdict (d04) and the cluster
    * closure (d08). */
  private[graft] def ngramVerifiedPairs(docsRaw: DataFrame): DataFrame = {
    // Gram sets are built per-row: hash each 3-gram to 8 bytes (string
    // grams never leave the row; xxhash64 collisions only add rare false
    // candidates) and sorted-dedup in the same pass. The whole
    // normalize → window → hash → distinct chain is two fused native
    // expressions (TextExprs) — one byte pass each, no per-position
    // substr scans (O(L²)/doc in the HOF form) and no java.util.regex;
    // this was the dominant d04 cost at soak scale (the candidate
    // machinery is already sub-second). Bit-identical to the HOF chain
    // (UdxSpec asserts it), so no dedup verdict can change.
    val docs = docsRaw
      // normalized text materialized first — see TextFns note
      .select(col("doc_id"), TextFns.normalized(col("text")).as("norm"))
      .select(col("doc_id"),
        graft.functions.TextExprs.gramHashes(col("norm"), 3).as("grams"))
      .cache()
    val total = docs.count()
    // distinct-gram count per doc (the |A| and |B| of the Jaccard)
    val sizes = docs.select(col("doc_id"), size(col("grams")).as("n_grams"))
    // stop-gram cap: pair expansion is quadratic in posting-list length
    // (a gram with df=d yields d²/2 candidate pairs), so the cap must be
    // absolute, not proportional — df ≤ min(20% of corpus, 200), floored
    // at 2 for tiny corpora. Near-dups still share plenty of rare grams;
    // this is the standard inverted-index skew guard at scale.
    val dfCap = math.max(math.min(total / 5, 200L), 2L)
    // Bucket = posting list (df-capped via the count pre-filter, so
    // stop-grams present in most of the corpus are dropped before any
    // posting list is materialized), pair expansion in-row, then count
    // shared grams per pair.
    val postings = docs.select(col("doc_id"), explode(col("grams")).as("gram_h"))
    val shared = cappedBuckets(postings, Seq("gram_h"), col("doc_id"), dfCap)
      .select(explode(bucketPairs(col("es"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_shared"))
    val verified = shared
      .join(sizes.select(col("doc_id").as("a"), col("n_grams").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_grams").as("nb")), "b")
      .withColumn("jaccard", col("n_shared").cast(DoubleType) /
        (col("na") + col("nb") - col("n_shared")))
      .filter(col("jaccard") >= 0.7)
    verified.select(col("a"), col("b"))
  }

  /** Verified near-dup pairs on WORD-5-gram Jaccard ≥ `jaccardT` —
    * same blocking+verify shape as the char-gram path, but word grams
    * are far rarer (they survive the df cap where char grams are
    * corpus-common), which makes this the edge set of choice for the
    * cluster closure (d08) and the edit-distance verifier (t09). */
  private[graft] def wordGramVerifiedPairs(docsRaw: DataFrame,
      jaccardT: Double = 0.5): DataFrame = {
    val docs = wordGramSets(docsRaw.select(col("doc_id"), col("text"))).cache()
    val sizes = docs.select(col("doc_id"), size(col("grams")).as("n_grams"))
    val postings = docs.select(col("doc_id"), explode(col("grams")).as("gram_h"))
    val shared = cappedBuckets(postings, Seq("gram_h"), col("doc_id"), 200L)
      .select(explode(bucketPairs(col("es"))).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.select(col("doc_id").as("a"), col("n_grams").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_grams").as("nb")), "b")
      .filter(col("n_shared").cast(DoubleType) /
        (col("na") + col("nb") - col("n_shared")) >= jaccardT)
      .select(col("a"), col("b"))
  }

  /** Dedup CLUSTERS — transitive closure over verified near-dup pairs.
    * Pairwise verdicts alone under-delete: with A~B and B~C verified
    * but A~C just below threshold, keep-first on pairs keeps A and C.
    * The production dedup pipelines (MinHash-LSH at corpus scale) run
    * connected components over the pair graph and keep one doc per
    * component. Implemented as iterative min-label propagation —
    * label(x) ← min(label(x), min of neighbors' labels) until fixpoint:
    * each iteration is one join+agg shuffle, convergence needs
    * diameter-of-cluster iterations (near-dup clusters are shallow —
    * single digits even at corpus scale), and `localCheckpoint` cuts
    * the iterative lineage so plans don't grow unboundedly. This is
    * the Pregel/GraphX connected-components algorithm expressed on
    * DataFrames. Oracle: DuckDB recursive CTE closure over the same
    * edge set. */
  def d08_dedup_clusters(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    dedupClusters(docs.select("doc_id"), wordGramVerifiedPairs(docs))
  }

  /** Core: `docs` needs (doc_id); `pairs` is the (a, b) edge set. */
  def dedupClusters(docs: DataFrame, pairs: DataFrame): DataFrame =
    dedupClustersIter(docs, pairs)._1

  /** Implementation, exposing the round count for the convergence spec:
    * each round is (1) neighbor-min propagation and (2) POINTER HALVING
    * — l(v) ← l(l(v)), a self-join on the label forest. Halving is what
    * turns O(component-diameter) rounds into O(log n): propagation
    * moves the min label one hop along the graph, halving then
    * compresses the label chains it leaves behind, so the reach roughly
    * doubles per round (the classic shortcutting trick of parallel
    * connectivity / MapReduce-CC algorithms). Near-dup clusters are
    * shallow, but a pathological chain (serially-edited boilerplate)
    * no longer costs diameter rounds. Every intermediate is
    * localCheckpoint'ed — iterative joins otherwise grow the lineage
    * (and the plan) without bound. */
  private[graft] def dedupClustersIter(docs: DataFrame, pairs: DataFrame): (DataFrame, Int) = {
    // pairs is cached BEFORE the symmetric union: both union branches
    // read one materialization of the (expensive) verified-pair
    // pipeline instead of recomputing it per direction, and the edges
    // cache above it is what every iteration re-reads
    val pairsOnce = pairs.select(col("a"), col("b")).cache()
    val edges = pairsOnce
      .union(pairsOnce.select(col("b").as("a"), col("a").as("b")))
      .cache() // re-read every iteration
    // The iteration runs over edge-incident vertices ONLY: a doc with no
    // verified near-dup edge can never change its label, so keeping the
    // full corpus in the loop would shuffle 100 TB of immovable
    // singletons every round. Near-dup graphs are sparse — the touched
    // vertex set is a small fraction of the corpus — and every label is
    // itself an edge-incident vertex id (labels start there and only
    // adopt neighbor labels), so pointer halving stays closed over this
    // set. Singletons rejoin as their own cluster at the end.
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
      .localCheckpoint()
    var changed = true
    var iter = 0
    while (changed && iter < 20) { // log2(n) + slack, not diameter
      val nbr = edges
        .join(labels.withColumnRenamed("doc_id", "a"), "a")
        .groupBy(col("b").as("doc_id"))
        .agg(min(col("label")).as("nbr_label"))
      // the round carries each vertex's PRE-round label through as
      // `old` (r20), and MATERIALIZES the propagate output before the
      // halving self-join (r21): the halving join consumes its input
      // twice, so an unmaterialized propagate re-ran the edges join +
      // aggregate — the round's expensive half — once per side
      val prop = labels.join(nbr, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          col("label").as("old"))
        .localCheckpoint()
      // convergence probe on the propagate output (r21; was on the
      // halved output — same verdict, shown below): any-changed-row,
      // not a full count — take(1) short-circuits the scan as soon as
      // one changed label surfaces, so a converged round is the only
      // one that pays a full pass. Halving cannot change anything when
      // propagation didn't: propagate-fixpoint means label(u) =
      // label(v) across every edge, i.e. labels are CONSTANT per
      // component, so l(l(v)) = l(v) — probing prop is exact, and the
      // converged round skips its halving jobs entirely.
      changed = !prop.filter(col("label") =!= col("old")).isEmpty
      // pointer halving TWICE on the materialized forest — l(v) ←
      // l(l(l(l(v)))) (r21; guide §2.4): chains compress ~4× per round
      // instead of ~2×, so the round count (each round = one edges-join
      // shuffle + aggregate, the O(rounds) cost at scale) drops, for
      // two extra self-joins of the SMALL label table per round.
      // Safe for the same reason single halving is: labels only
      // decrease and every label value is itself a doc_id of the
      // edge-incident set, so l(·) is total over the label domain.
      def halve(m: DataFrame): DataFrame = m.as("x")
        .join(m.select(col("doc_id").as("pid"), col("label").as("plabel")),
          col("x.label") === col("pid"))
        .select(col("x.doc_id").as("doc_id"), col("plabel").as("label"))
      labels =
        if (!changed) prop.select(col("doc_id"), col("label"))
        else halve(halve(prop.select(col("doc_id"), col("label"))))
          .localCheckpoint()
      iter += 1
    }
    edges.unpersist()
    pairsOnce.unpersist()
    val out = docs.select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"),
        coalesce(col("label") =!= col("doc_id"), lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
    (out, iter)
  }

  /** Canonical selection — near-dedup that keeps the BEST doc per
    * cluster, not the lowest-id one. Production pipelines rank cluster
    * members by a quality signal (here n_chars — longest-is-best, the
    * usual boilerplate-vs-full-page heuristic) and keep the argmax;
    * keep-first silently prefers whichever copy was crawled first.
    * The argmax is q49's deterministic struct-min form
    * ((-n_chars, doc_id) min ⇒ longest, then smallest id) — a plain
    * partial-aggregatable reduction per cluster, no window over the
    * corpus — and the winner joins back on cluster_id (at 100 TB both
    * sides are (cluster, few-bytes) relations, not documents). */
  def d09_dedup_keep_best(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val clusters = dedupClusters(docs.select("doc_id"), wordGramVerifiedPairs(docs))
    val best = clusters
      .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .groupBy(col("cluster_id"))
      .agg(min(struct((-col("n_chars")).as("neg"), col("doc_id").as("id"))).as("_b"))
      .select(col("cluster_id"), col("_b.id").as("keep_id"))
    clusters.select(col("doc_id"), col("cluster_id"))
      .join(best, "cluster_id")
      .select(col("doc_id"), col("cluster_id"), col("keep_id"),
        (col("doc_id") === col("keep_id")).as("is_kept"))
      .orderBy(col("doc_id"))
  }

  /** Embedding-cosine near-dedup: random-hyperplane (sign) LSH over the
    * embedding column buckets vectors by 12-bit sketch; exact cosine
    * ≥ 0.98 verifies candidates within a bucket. The sketch is per-row
    * fold arithmetic (zip_with + aggregate) — codegen, no UDF. */
  def d05_dedup_embedding(spark: SparkSession, dir: String): DataFrame =
    embeddingDedup(Tables.embeddings(spark, dir))

  /** (doc_id, embedding, bucket) with the 12-bit sign sketch, cached —
    * shared by the verdict and pair paths. */
  private def bucketedEmb(embRaw: DataFrame): DataFrame = embRaw
    .select(col("vec_id").as("doc_id"), col("embedding"))
    .withColumn("bucket", VectorFns.signBucket(col("embedding"), nBits = 12, dim = 64))
    .cache()

  /** Bucket-capped candidate join → exact cosine ≥ 0.98. Bucket-size
    * cap, same rationale as every other dedup path: a hot bucket
    * (clustered corpus — near-identical embeddings all share a sign
    * sketch) otherwise makes the self-join quadratic. The count
    * pre-filter shuffles only (bucket, count); vectors stay out of any
    * collect_list entirely — the join streams them. */
  private def embeddingVerifiedPairs(emb: DataFrame): DataFrame = {
    val survivors = emb.groupBy(col("bucket"))
      .agg(count(lit(1)).as("_n"))
      .filter(col("_n").between(2, 1000))
      .select(col("bucket"))
    val embB = emb.join(survivors, Seq("bucket"), "left_semi")
    embB.as("l").join(embB.as("r"),
        col("l.bucket") === col("r.bucket") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"),
        VectorFns.cosine(col("l.embedding"), col("r.embedding")).as("cos"))
      .filter(col("cos") >= 0.98)
  }

  /** Core, corpus-independent: input needs (vec_id, embedding). */
  def embeddingDedup(embRaw: DataFrame): DataFrame = {
    val emb = bucketedEmb(embRaw)
    perDocVerdict(emb.select("doc_id"), embeddingVerifiedPairs(emb))
  }

  /** The embedding-dedup pipeline made ORACLE-CHECKABLE, the d10
    * technique applied to vectors: first 200 embeddings plus EXACT
    * copies (vec_id + 100000). A copy shares its source's sign pattern
    * — same bucket, candidate certain, cosine 1 — while the corpus's
    * maximum NATURAL pairwise cosine is ≈ 0.44 (measured at both SFs),
    * nowhere near the 0.98 verify threshold, so the verified pair set
    * is exactly the copy pairs and DuckDB recomputes it from first
    * principles with `list_cosine_similarity` over all pairs. Spark
    * runs the REAL pipeline — sign sketch, capped buckets, candidate
    * join, exact-cosine verify. */
  def d11_dedup_embedding_planted(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding"))
    val copies = base.select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    embeddingVerifiedPairs(bucketedEmb(base.unionByName(copies)))
      .select(col("a"), col("b"))
      .orderBy(col("a"), col("b"))
  }

  /** Incremental dedup — the production shape: a new snapshot (here:
    * doc_id ≥ 250) is deduplicated against a persisted fingerprint store
    * (doc_id < 250) via anti-join on the content fingerprint, then
    * self-deduplicated keep-first. At 100 TB the store is a compact
    * (fingerprint) table; the anti-join broadcasts or shuffles only
    * 8-byte keys — never the historical corpus itself. */
  def d06_dedup_incremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("fp", sha2(col("text"), 256))
    val store = docs.filter(col("doc_id") < 250).select(col("fp"))
    val fresh = docs.filter(col("doc_id") >= 250)
    val unseen = fresh.join(store, Seq("fp"), "left_anti")
    val keep = unseen.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    unseen.join(keep, "doc_id")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination — the train/eval hygiene op every LLM
    * pipeline runs before training: a training document is contaminated
    * iff it shares at least one word 5-gram with any document of the
    * evaluation benchmark. Here the "benchmark" is the deterministic
    * doc_id % 97 == 0 slice of the corpus (standing in for a real eval
    * set ingested separately).
    *
    * Scale shape: benchmark sets are tiny next to a training corpus
    * (thousands of docs vs billions), so the benchmark's distinct gram
    * hashes are BROADCAST — the 100 TB training side is matched in its
    * scan stage with no shuffle of corpus grams at all; the only
    * aggregation is the per-doc hit count on the (rare) matching rows.
    * Gram sets are per-row hashed + deduped (same construction as d04),
    * so string grams never leave the row. */
  def d07_decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminate(Tables.documents(spark, dir), col("doc_id") % 97 === 0)

  /** Per-row hashed word-5-gram SETS for (doc_id, text [, ...]) — the
    * shared contamination-matching unit of d07 and the streaming
    * variant (s09). String grams never leave the row (d04's argument:
    * xxhash64 collisions are absent at verification scale). */
  private[graft] def wordGramSets(docs: DataFrame): DataFrame =
    docs
      // fused native normalize → word-5-gram windows → xxhash64 →
      // sorted distinct: bit-identical to the HOF
      // distinctLongs(transform(shinglesFromTokens(tokens(text), 5),
      // xxhash64)) chain (UdxSpec), one byte pass instead of per-window
      // slice + concat_ws allocations
      .withColumn("grams", graft.functions.TextExprs.wordGramHashes(
        TextFns.normalized(col("text")), 5, distinct = true))
      .drop("text")

  /** Core, corpus-independent: input needs (doc_id, text); `benchPred`
    * marks the held-out benchmark rows. */
  def decontaminate(docsRaw: DataFrame, benchPred: Column): DataFrame = {
    // cached: the benchmark-gram branch and the corpus-postings branch
    // both read this, and without the cache each branch re-runs the
    // full shingle+hash scan (measured 2× the query cost at sf0.1). In
    // a production deployment the benchmark is a separate small table,
    // so only ITS grams would be recomputed — here both sides derive
    // from one corpus, and the compact (doc_id, grams) form is what's
    // worth keeping hot.
    val grams = wordGramSets(
        docsRaw.select(col("doc_id"), benchPred.as("is_bench"), col("text")))
      .cache()
    val postings = grams.select(col("doc_id"), col("is_bench"),
      explode(col("grams")).as("gram_h"))
    val benchGrams = postings.filter(col("is_bench"))
      .select(col("gram_h")).distinct()
    val hits = postings.filter(!col("is_bench"))
      .join(broadcast(benchGrams), Seq("gram_h"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hit_grams"))
    docsRaw.filter(!benchPred).select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        col("n_hit_grams").isNotNull.as("is_contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Per-doc verdict under keep-first policy: a doc is a duplicate iff
    * it appears as the larger id of a verified pair. */
  private def perDocVerdict(allDocs: DataFrame, verifiedPairs: DataFrame): DataFrame = {
    val dupIds = verifiedPairs.select(col("b").as("doc_id")).distinct()
      .withColumn("flag", lit(true))
    allDocs.join(dupIds, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("flag"), lit(false)).as("is_dup"))
      .orderBy(col("doc_id"))
  }

  /** Chunk-level exact dedup — the C4/RefinedWeb "line dedup" pass
    * adapted to a corpus without newline structure: slice every
    * document into NON-overlapping 16-token chunks (the [[TextAnalysis
    * .chunkText]] semantics with stride = window), hash each chunk,
    * and keep only the FIRST occurrence corpus-wide (first = lowest
    * (doc_id, chunk_id), the suite-wide keep-first policy). Reported
    * per document: chunks, survivors, and the first surviving hash —
    * the shape a pipeline uses to rebuild the scrubbed text.
    *
    * 100 TB posture: chunking is a per-row explode (no shuffle);
    * first-occurrence-wins is ONE row_number window over the 64-bit
    * chunk hash — the same single uniformly-keyed shuffle as exact doc
    * dedup (d01), with only (hash, doc_id, chunk_id, n_tokens) rows in
    * flight, never the chunk text; the per-doc rollup re-shuffles on
    * doc_id. No joins, no skew (hash keys are uniform by construction). */
  def d13_dedup_chunks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("h")).orderBy(col("doc_id"), col("chunk_id"))
    // chunkTextUnsorted: the hash window re-shuffles anyway — the t08
    // presentation sort would be a wasted global range-sort here
    TextAnalysis.chunkTextUnsorted(Tables.documents(spark, dir), window = 16, stride = 16)
      .withColumn("h", sha2(col("chunk_text"), 256))
      .select(col("doc_id"), col("chunk_id"), col("h"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_kept"),
        // FIRST surviving chunk's hash = min over (position, hash) —
        // a bare min(h) would pick the lexicographically smallest HASH,
        // not the earliest chunk (zero-padded position prefix keeps the
        // string compare positional; stripped after the min)
        substring(min(when(col("rn") === 1,
          concat(lpad(col("chunk_id"), 12, "0"), col("h")))), 13, 64)
          .as("first_kept_hash"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d13_dedup_chunks" -> (d13_dedup_chunks _),
    "d01_dedup_exact" -> (d01_dedup_exact _),
    "d02_dedup_minhash_lsh" -> (d02_dedup_minhash_lsh _),
    "d03_dedup_simhash" -> (d03_dedup_simhash _),
    "d04_dedup_ngram_jaccard" -> (d04_dedup_ngram_jaccard _),
    "d10_dedup_minhash_planted" -> (d10_dedup_minhash_planted _),
    "d11_dedup_embedding_planted" -> (d11_dedup_embedding_planted _),
    "d12_dedup_simhash_planted" -> (d12_dedup_simhash_planted _),
    "d05_dedup_embedding" -> (d05_dedup_embedding _),
    "d06_dedup_incremental" -> (d06_dedup_incremental _),
    "d07_decontaminate" -> (d07_decontaminate _),
    "d08_dedup_clusters" -> (d08_dedup_clusters _),
    "d09_dedup_keep_best" -> (d09_dedup_keep_best _))

  /** d04 oracle: string 3-grams on the DuckDB side vs xxhash64'd grams
    * on the Spark side share exact semantics modulo hash collisions —
    * the 3-gram universe over [a-z0-9 ] is ~50k values, so a 64-bit
    * collision is absent at verification scale. Mirrors the operator
    * exactly: per-doc DISTINCT gram sets, df cap max(min(total/5,200),2)
    * applied to candidate generation only (not to |A|/|B|), Jaccard
    * ≥ 0.7, keep-first verdict (dup = appears as the larger id). */
  /** Shared CTE chain producing the verified near-dup pair set `ver`
    * (a < b) — consumed by the d04 verdict and the d08 closure. */
  private[operators] val ngramPairCtes: String =
    """d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
      |grams AS (
      |  SELECT DISTINCT doc_id, SUBSTRING(norm, CAST(i AS INT), 3) AS g
      |  FROM d, UNNEST(RANGE(1, GREATEST(LENGTH(norm) - 2, 1))) AS t(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
      |cap AS (SELECT GREATEST(LEAST(COUNT(*) // 5, 200), 2) AS df_cap FROM documents),
      |good AS (SELECT g FROM grams, cap GROUP BY g, df_cap
      |         HAVING COUNT(*) BETWEEN 2 AND df_cap),
      |shared AS (
      |  SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS n_shared
      |  FROM grams ga JOIN grams gb ON ga.g = gb.g AND ga.doc_id < gb.doc_id
      |  JOIN good ON good.g = ga.g
      |  GROUP BY 1, 2),
      |ver AS (
      |  SELECT s.a, s.b FROM shared s
      |  JOIN sizes sa ON sa.doc_id = s.a
      |  JOIN sizes sb ON sb.doc_id = s.b
      |  WHERE CAST(s.n_shared AS DOUBLE) / (sa.n + sb.n - s.n_shared) >= 0.7)""".stripMargin

  private val ngramOracleSql: String =
    s"""WITH $ngramPairCtes
       |SELECT doc_id, (doc_id IN (SELECT b FROM ver)) AS is_dup
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Shared CTE chain producing the WORD-5-gram verified pair set `ver`
    * (a < b, Jaccard ≥ 0.5) — mirrors [[wordGramVerifiedPairs]]; the
    * gram construction is d07's proven string mirror. Consumed by the
    * d08 closure and t09's edit-distance verifier. */
  private[operators] val wordGramPairCtes: String =
    """d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
      |t AS (SELECT doc_id, STRING_SPLIT(norm, ' ') AS toks FROM d),
      |g0 AS (
      |  SELECT DISTINCT doc_id,
      |    ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS gm
      |  FROM t, UNNEST(RANGE(1, GREATEST(LEN(toks) - 3, 2))) AS u(i)),
      |g AS (SELECT * FROM g0 WHERE LENGTH(gm) > 0),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
      |good AS (SELECT gm FROM g GROUP BY gm HAVING COUNT(*) BETWEEN 2 AND 200),
      |shared AS (
      |  SELECT ga.doc_id AS a, gb.doc_id AS b, COUNT(*) AS n_shared
      |  FROM g ga JOIN g gb ON ga.gm = gb.gm AND ga.doc_id < gb.doc_id
      |  JOIN good ON good.gm = ga.gm
      |  GROUP BY 1, 2),
      |ver AS (
      |  SELECT s.a, s.b FROM shared s
      |  JOIN sizes sa ON sa.doc_id = s.a
      |  JOIN sizes sb ON sb.doc_id = s.b
      |  WHERE CAST(s.n_shared AS DOUBLE) / (sa.n + sb.n - s.n_shared) >= 0.5)""".stripMargin

  /** d08 oracle: recursive-CTE transitive closure over the same edge
    * set — min reachable doc_id per node is the cluster label. */
  private val clustersOracleSql: String =
    s"""WITH RECURSIVE $wordGramPairCtes,
       |edges AS (SELECT a, b FROM ver UNION SELECT b, a FROM ver),
       |reach(id, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b AS id, r.root FROM reach r JOIN edges e ON e.a = r.id)
       |SELECT id AS doc_id, MIN(root) AS cluster_id, MIN(root) <> id AS is_dup
       |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin

  /** d09 oracle: d08's closure plus the per-cluster argmax
    * (n_chars DESC, doc_id ASC) — the same deterministic tie-break as
    * the struct-min form. */
  private val keepBestOracleSql: String =
    s"""WITH RECURSIVE $wordGramPairCtes,
       |edges AS (SELECT a, b FROM ver UNION SELECT b, a FROM ver),
       |reach(id, root) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.b AS id, r.root FROM reach r JOIN edges e ON e.a = r.id),
       |cl AS (SELECT id AS doc_id, MIN(root) AS cluster_id FROM reach GROUP BY id),
       |best AS (SELECT cluster_id, doc_id AS keep_id FROM (
       |  SELECT cl.cluster_id, d.doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
       |                       ORDER BY d.n_chars DESC, d.doc_id) AS rn
       |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id) WHERE rn = 1)
       |SELECT cl.doc_id, cl.cluster_id, b.keep_id,
       |  cl.doc_id = b.keep_id AS is_kept
       |FROM cl JOIN best b ON b.cluster_id = cl.cluster_id
       |ORDER BY cl.doc_id""".stripMargin

  /** d07 oracle: string word-5-grams mirror the hashed grams exactly
    * (same argument as d04 — 64-bit collisions absent at verification
    * scale). The RANGE bound mirrors shinglesFromTokens: positions
    * 1..max(len-4, 1), with the whole-token-string shingle for
    * sub-5-token docs; empty grams (empty text) are filtered in both. */
  private val decontaminateOracleSql: String =
    """WITH d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
      |t AS (SELECT doc_id, STRING_SPLIT(norm, ' ') AS toks FROM d),
      |g0 AS (
      |  SELECT DISTINCT doc_id,
      |    ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i AS INT) + 4], ' ') AS gm
      |  FROM t, UNNEST(RANGE(1, GREATEST(LEN(toks) - 3, 2))) AS u(i)),
      |g AS (SELECT * FROM g0 WHERE LENGTH(gm) > 0),
      |bg AS (SELECT DISTINCT gm FROM g WHERE doc_id % 97 = 0),
      |hits AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams
      |  FROM g WHERE doc_id % 97 <> 0 AND gm IN (SELECT gm FROM bg)
      |  GROUP BY doc_id)
      |SELECT d.doc_id,
      |  COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
      |  h.doc_id IS NOT NULL AS is_contaminated
      |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
      |WHERE d.doc_id % 97 <> 0
      |ORDER BY d.doc_id""".stripMargin

  /** d10 oracle: same normalization/prefix/variant construction, then
    * the verify stage from first principles — distinct word-3-shingle
    * sets, shared-shingle counts (only (doc, variant) pairs can share:
    * the prefix makes every other intersection empty), Jaccard ≥ 0.8.
    * Index bookkeeping mirrors shinglesFromTokens exactly: 1-based
    * starts 1..n-2. */
  private val minhashPlantedOracleSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    LIST_TRANSFORM(
      |      REGEXP_SPLIT_TO_ARRAY(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
      |        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
      |      tok -> 'd' || CAST(doc_id AS VARCHAR) || 'x' || tok) AS toks
      |  FROM documents WHERE doc_id < 300),
      |f AS (SELECT doc_id, toks FROM t WHERE LEN(toks) BETWEEN 50 AND 400),
      |corpus AS (
      |  SELECT doc_id, toks FROM f
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, toks[1:LEN(toks)-1] AS toks FROM f),
      |sh AS (
      |  SELECT DISTINCT doc_id, toks[CAST(i AS INT)] || ' ' ||
      |    toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2] AS s
      |  FROM corpus, UNNEST(RANGE(1, GREATEST(LEN(toks) - 2, 0) + 1)) AS u(i)),
      |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |shared AS (
      |  SELECT sa.doc_id AS a, sb.doc_id AS b, COUNT(*) AS ns
      |  FROM sh sa JOIN sh sb ON sa.s = sb.s AND sa.doc_id < sb.doc_id
      |  GROUP BY 1, 2),
      |ver AS (
      |  SELECT shared.a, shared.b FROM shared
      |  JOIN sizes za ON za.doc_id = shared.a
      |  JOIN sizes zb ON zb.doc_id = shared.b
      |  WHERE CAST(ns AS DOUBLE) / (za.n + zb.n - ns) >= 0.8)
      |SELECT a, b FROM ver ORDER BY a, b""".stripMargin

  /** d02 oracle (r19 — the d03 technique applied to the WHOLE
    * MinHash-LSH pipeline): DuckDB recomputes normalization, word
    * 3-shingles, the per-gram FNV-1a 64 fold (u02's HUGEINT
    * technique), the mod-P reduction, the 64-permutation signature
    * with the SAME (a_i, b_i) universal-hash family (spliced below as
    * literals from [[HashFns.hashFamily]] — every intermediate
    * a·h + b < 2^62 fits BIGINT exactly as on the Spark side), the
    * 16 × 4 banding with the 1000 bucket cap, the in-bucket pair
    * expansion, and the exact set-Jaccard ≥ 0.8 verify. ONE deliberate
    * abstraction: Spark keys buckets on xxhash64 of the band's
    * 4-tuple, the oracle on the 4-tuple VALUE — equal tuples always
    * collide on both sides, and a cross-tuple xxhash64 collision
    * (≈ 2⁻⁶⁴ per tuple pair) could only ADD a candidate that the exact
    * Jaccard verify then rejects, so the verified output is identical.
    * Docs with no grams (empty after normalization) carry all-NULL
    * signatures; they group together in both engines and their pairs
    * die at the verify (0/0 Jaccard = NULL ≥ 0.8 = false — mirrored by
    * the LEFT-JOIN count shape below). */
  /** Shared WITH-clause body (d, t, g, h, fam, sig, bk): normalize →
    * 3-gram → FNV-1a 64 mod P → spliced universal-hash family →
    * MinHash-64 signature → 16 band keys, in DuckDB SQL over the
    * documents table — the d02 oracle's sketch pipeline, factored so
    * the s07 STREAMING oracle ([[StreamingQueries]]) can layer its
    * batch/store semantics over the identical sketches. */
  private[operators] def minhashSigCtesSql: String = {
    val fam = graft.functions.HashFns.hashFamily(MINHASH_N)
    val famRows = fam.zipWithIndex
      .map { case ((a, b), i) => s"($i, ${a}::BIGINT, ${b}::BIGINT)" }
      .mkString(", ")
    val P = graft.functions.HashFns.P
    val rpb = MINHASH_N / LSH_BANDS
    s"""d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
       |    '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g')) AS norm FROM documents),
       |t AS (SELECT doc_id, norm, STRING_SPLIT(norm, ' ') AS toks FROM d WHERE norm <> ''),
       |g AS (
       |  SELECT doc_id, norm AS gram FROM t WHERE LEN(toks) <= $SHINGLE_K
       |  UNION ALL
       |  SELECT doc_id, ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i + ${SHINGLE_K - 1} AS INT)], ' ') AS gram
       |  FROM t, UNNEST(RANGE(1, LEN(toks) - $SHINGLE_K + 2)) AS u(i) WHERE LEN(toks) > $SHINGLE_K),
       |h AS (SELECT DISTINCT doc_id, ((CAST(CASE WHEN v >= 9223372036854775808::HUGEINT
       |        THEN v - 18446744073709551616::HUGEINT ELSE v END AS BIGINT) % $P) + $P) % $P AS h
       |  FROM (SELECT doc_id, LIST_REDUCE(
       |    LIST_PREPEND(14695981039346656037::HUGEINT,
       |      LIST_TRANSFORM(RANGE(1, LENGTH(gram) + 1),
       |        i -> CAST(ORD(SUBSTRING(gram, CAST(i AS INT), 1)) AS HUGEINT))),
       |    (x, b) -> (xor(CAST(x AS UBIGINT), CAST(b AS UBIGINT))::HUGEINT
       |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS v
       |    FROM g)),
       |fam(i, a, b) AS (SELECT * FROM (VALUES $famRows)),
       |sig AS (SELECT doc_id, fam.i AS i, MIN((fam.a * h.h + fam.b) % $P) AS s
       |  FROM h, fam GROUP BY doc_id, fam.i),
       |bk AS (SELECT doc_id, CAST(i // $rpb AS VARCHAR) || ':' ||
       |    ARRAY_TO_STRING(LIST(COALESCE(CAST(s AS VARCHAR), 'x') ORDER BY i), ',') AS key
       |  FROM sig GROUP BY doc_id, i // $rpb)""".stripMargin
  }

  private def minhashLshOracleSql: String = {
    s"""WITH $minhashSigCtesSql,
       |keyok AS (SELECT key FROM bk GROUP BY key HAVING COUNT(*) BETWEEN 2 AND $BUCKET_CAP),
       |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
       |  FROM bk x JOIN keyok USING (key) JOIN bk y USING (key) WHERE x.doc_id < y.doc_id),
       |jac AS (SELECT c.a, c.b,
       |    CAST(COUNT(hb.h) AS DOUBLE) /
       |    ((SELECT COUNT(*) FROM h WHERE doc_id = c.a) +
       |     (SELECT COUNT(*) FROM h WHERE doc_id = c.b) - COUNT(hb.h)) AS j
       |  FROM cand c
       |  LEFT JOIN h ha ON ha.doc_id = c.a
       |  LEFT JOIN h hb ON hb.doc_id = c.b AND hb.h = ha.h
       |  GROUP BY c.a, c.b),
       |dup AS (SELECT DISTINCT b FROM jac WHERE j >= $JACCARD_T)
       |SELECT docs.doc_id, (dup.b IS NOT NULL) AS is_dup
       |FROM (SELECT doc_id FROM documents) docs LEFT JOIN dup ON docs.doc_id = dup.b
       |ORDER BY docs.doc_id""".stripMargin
  }

  /** d05 GRADUATED from rows-only (VERDICT r19 next #2 — the v02
    * technique on the dedup side): [[VectorFns.signBucket]]'s 12
    * hyperplanes are deterministic (seed 7), so the oracle regenerates
    * the identical gaussians, splices all 12 × 64 weights as DOUBLE
    * literals (Double.toString round-trips exactly), recomputes the
    * SAME ascending-dim double dot fold per plane, packs the same sign
    * bits (disjoint bits — SUM = the OR pack), applies the same
    * bucket-size pre-filter (COUNT BETWEEN 2 AND 1000, mirroring
    * embeddingVerifiedPairs), and verifies the same bit-identical
    * exact cosine ≥ 0.98 (the v06 fold precedent — no
    * LIST_COSINE_SIMILARITY, whose internal order might differ at the
    * threshold boundary). Verdict mirrors perDocVerdict. */
  private def embeddingOracleSql: String = {
    val nBits = 12; val dim = 64
    val rnd = new scala.util.Random(7L)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
    val planesLit = planes
      .map(p => "[" + p.map(_.toString).mkString(",") + "]")
      .mkString("[\n", ",\n", "\n]")
    def fold(vec: String, other: String) =
      s"""LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE), LIST_TRANSFORM(
         |      LIST_ZIP($vec, $other),
         |      z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE))),
         |      (x, y) -> x + y)""".stripMargin
    val cos = s"""${fold("ea.embedding", "eb.embedding")}
       |    / (SQRT(${fold("ea.embedding", "ea.embedding")})
       |       * SQRT(${fold("eb.embedding", "eb.embedding")}))""".stripMargin
    s"""WITH pl AS (
       |  SELECT CAST(r.i AS INT) AS pid, pls.planes[CAST(r.i + 1 AS INT)] AS w
       |  FROM RANGE(0, $nBits) r(i), (SELECT $planesLit AS planes) pls),
       |d AS (
       |  SELECT e.vec_id AS doc_id, p.pid,
       |    ${fold("e.embedding", "p.w")} AS dot
       |  FROM embeddings e, pl p),
       |b AS (
       |  SELECT doc_id,
       |    SUM(CASE WHEN dot >= 0 THEN 1 << pid ELSE 0 END) AS bucket
       |  FROM d GROUP BY doc_id),
       |ok AS (SELECT bucket FROM b
       |  GROUP BY bucket HAVING COUNT(*) BETWEEN 2 AND 1000),
       |cand AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b
       |  FROM b x JOIN ok USING (bucket) JOIN b y USING (bucket)
       |  WHERE x.doc_id < y.doc_id),
       |dup AS (
       |  SELECT DISTINCT c.b FROM cand c
       |  JOIN embeddings ea ON ea.vec_id = c.a
       |  JOIN embeddings eb ON eb.vec_id = c.b
       |  WHERE $cos >= 0.98)
       |SELECT docs.doc_id, (dup.b IS NOT NULL) AS is_dup
       |FROM (SELECT vec_id AS doc_id FROM embeddings) docs
       |LEFT JOIN dup ON docs.doc_id = dup.b
       |ORDER BY docs.doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "d05_dedup_embedding" -> embeddingOracleSql,
    "d02_dedup_minhash_lsh" -> minhashLshOracleSql,
    /** d03 oracle (VERDICT r18 missing #4): DuckDB recomputes the
      * SAME per-token FNV-1a 64 fold (u02's HUGEINT technique), the
      * same ±1 bit votes, packs the same 64-bit signature, bands it
      * into the same 4 × 16-bit chunks, applies the same bucket-size
      * pre-filter (COUNT BETWEEN 2 AND 1000 — mirroring
      * simhashVerifiedPairs' cappedBuckets cap, the way the d02 oracle
      * mirrors its keyok cap; ADVICE r19: without this a corpus where
      * >1000 docs share a band value would make the oracle find pairs
      * Spark by design drops), and verifies Hamming ≤ 3 on the banded
      * candidates. Under the cap the banded set equals brute force
      * (pigeonhole over 4 disjoint 16-bit bands; see simhashDocs).
      * Verdict mirrors perDocVerdict: is_dup ⇔ the doc is the LARGER
      * id of a verified pair. */
    "d03_dedup_simhash" ->
      """WITH d AS (SELECT doc_id, TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')) AS norm FROM documents),
        |tok AS (SELECT doc_id, UNNEST(STRING_SPLIT(norm, ' ')) AS tok FROM d),
        |th AS (SELECT doc_id, CAST(LIST_REDUCE(
        |    LIST_PREPEND(14695981039346656037::HUGEINT,
        |      LIST_TRANSFORM(RANGE(1, LENGTH(tok) + 1),
        |        i -> CAST(ORD(SUBSTRING(tok, CAST(i AS INT), 1)) AS HUGEINT))),
        |    (h, b) -> (xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT))::HUGEINT
        |               * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT
        |  ) AS UBIGINT) AS h FROM tok),
        |v AS (SELECT doc_id, bits.b AS b,
        |    SUM(CASE WHEN (h >> CAST(bits.b AS INT)) & 1 = 1 THEN 1 ELSE -1 END) AS votes
        |  FROM th, (SELECT UNNEST(RANGE(0, 64)) AS b) bits
        |  GROUP BY doc_id, bits.b),
        |sig AS (SELECT doc_id,
        |    CAST(SUM(CASE WHEN votes > 0
        |      THEN (1::UBIGINT << CAST(b AS INT)) ELSE 0::UBIGINT END) AS UBIGINT) AS sh
        |  FROM v GROUP BY doc_id),
        |bands AS (SELECT doc_id, sh, CAST(j.j AS INT) AS band_i,
        |    (sh >> CAST(j.j * 16 AS INT)) & 65535::UBIGINT AS band_h
        |  FROM sig, (SELECT UNNEST(RANGE(0, 4)) AS j) j),
        |bok AS (SELECT band_i, band_h FROM bands
        |  GROUP BY band_i, band_h HAVING COUNT(*) BETWEEN 2 AND 1000),
        |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
        |  FROM bands x JOIN bok USING (band_i, band_h)
        |  JOIN bands y USING (band_i, band_h)
        |  WHERE x.doc_id < y.doc_id),
        |dup AS (SELECT DISTINCT c.b FROM cand c
        |  JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
        |  WHERE BIT_COUNT(xor(sa.sh, sb.sh)) <= 3)
        |SELECT docs.doc_id, (dup.b IS NOT NULL) AS is_dup
        |FROM (SELECT doc_id FROM documents) docs
        |LEFT JOIN dup ON docs.doc_id = dup.b
        |ORDER BY docs.doc_id""".stripMargin,
    "d13_dedup_chunks" ->
      """WITH t AS (SELECT doc_id,
        |    REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks FROM documents),
        |c AS (SELECT doc_id, i AS chunk_id,
        |    SHA256(ARRAY_TO_STRING(
        |      toks[CAST(i * 16 + 1 AS INT):CAST(i * 16 + 16 AS INT)], ' ')) AS h
        |  FROM t, UNNEST(RANGE(0,
        |    (GREATEST(LEN(toks) - 16, 0) + 15) // 16 + 1)) AS u(i)),
        |r AS (SELECT doc_id, chunk_id, h,
        |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rn
        |  FROM c)
        |SELECT doc_id, COUNT(*) AS n_chunks,
        |  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  SUBSTRING(MIN(CASE WHEN rn = 1
        |    THEN LPAD(CAST(chunk_id AS VARCHAR), 12, '0') || h END), 13, 64)
        |    AS first_kept_hash
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "d04_dedup_ngram_jaccard" -> ngramOracleSql,
    "d10_dedup_minhash_planted" -> minhashPlantedOracleSql,
    "d12_dedup_simhash_planted" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    LIST_TRANSFORM(
        |      REGEXP_SPLIT_TO_ARRAY(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |        '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '),
        |      tok -> 'd' || CAST(doc_id AS VARCHAR) || 'x' || tok) AS toks
        |  FROM documents WHERE doc_id < 300),
        |f AS (SELECT doc_id, LIST_AGGREGATE(toks, 'string_agg', ' ') AS txt
        |      FROM t WHERE LEN(toks) BETWEEN 30 AND 400),
        |corpus AS (
        |  SELECT doc_id, txt FROM f
        |  UNION ALL
        |  SELECT doc_id + 100000 AS doc_id, txt FROM f),
        |pairs AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b
        |  FROM corpus a JOIN corpus b
        |    ON SHA256(a.txt) = SHA256(b.txt) AND a.doc_id < b.doc_id)
        |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin,
    "d11_dedup_embedding_planted" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
        |corpus AS (
        |  SELECT vec_id, embedding FROM base
        |  UNION ALL
        |  SELECT vec_id + 100000 AS vec_id, embedding FROM base),
        |pairs AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE LIST_COSINE_SIMILARITY(a.embedding, b.embedding) >= 0.98)
        |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin,
    "d08_dedup_clusters" -> clustersOracleSql,
    "d09_dedup_keep_best" -> keepBestOracleSql,
    "d07_decontaminate" -> decontaminateOracleSql,
    "d01_dedup_exact" ->
      """SELECT SHA256(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY SHA256(text) ORDER BY keep_id""".stripMargin,
    "d06_dedup_incremental" ->
      """WITH d AS (SELECT doc_id, lang, n_chars, SHA256(text) AS fp FROM documents),
        |store AS (SELECT fp FROM d WHERE doc_id < 250),
        |fresh AS (SELECT * FROM d WHERE doc_id >= 250),
        |unseen AS (SELECT * FROM fresh WHERE fp NOT IN (SELECT fp FROM store)),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM unseen GROUP BY fp)
        |SELECT doc_id, lang, n_chars FROM unseen
        |WHERE doc_id IN (SELECT doc_id FROM keep)
        |ORDER BY doc_id""".stripMargin)
}
