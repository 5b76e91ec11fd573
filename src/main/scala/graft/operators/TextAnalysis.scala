package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables
import graft.functions.TextFns

/** Text-analysis operators over documents: token counting, quality
  * scoring, language identification, content fingerprinting — the
  * pre-training corpus hygiene stack.
  *
  * All per-row column expressions (codegen'd, no UDFs): at 100 TB these
  * run inside the scan stage with zero shuffles, which is exactly how a
  * corpus-wide quality pass must behave.
  */
object TextAnalysis {

  private val STOPWORDS = Seq("the", "a", "of", "and", "to", "in", "is")

  private def countMatches(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** Token / char counting (BPE-ish token estimate = words + punct). */
  def t01_text_tokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens"),
        length(col("text")).as("text_len"),
        col("n_chars"),
        (length(col("text")) - countMatches(col("text"), "[ ]")).as("n_nonspace"))
      .orderBy(col("doc_id"))

  /** Quality scoring: char-class ratios + stopword density — the usual
    * "is this natural language" heuristics. */
  def t02_text_quality(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      // tokenizer and letter-count materialized once — every later
      // reference would otherwise re-run the regex per row per reference
      .withColumn("_toks", split(lower(trim(col("text"))), "\\s+"))
      .withColumn("_letters", countMatches(col("text"), "[a-zA-Z]"))
      .withColumn("_nstop", size(filter(col("_toks"), t => t.isin(STOPWORDS: _*))))
      .select(col("doc_id"),
        length(col("text")).as("text_len"),
        col("_letters").as("n_letters"),
        countMatches(col("text"), "[0-9]").as("n_digits"),
        (col("_letters").cast(DoubleType) / length(col("text"))).as("letter_ratio"),
        size(col("_toks")).as("n_tokens"),
        col("_nstop").as("n_stopwords"),
        (col("_nstop").cast(DoubleType) / size(col("_toks"))).as("stopword_ratio"))
      .orderBy(col("doc_id"))

  /** Language ID by stopword-hit scoring against per-language function
    * word lists (the classic cheap heuristic; real systems use char
    * n-gram models — same shape, bigger tables). Pure column expr:
    * score per language, argmax via greatest + chained when. */
  def t03_text_langid(spark: SparkSession, dir: String): DataFrame =
    predictLang(Tables.documents(spark, dir))

  /** Core, corpus-independent: input needs (doc_id, text, lang). */
  def predictLang(docs: DataFrame): DataFrame = {
    val langStops: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
      "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "que"),
      "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "que"))
    // tokens and per-language scores materialized as real columns: the
    // argmax expression references each score several times, and inline
    // trees would re-run the tokenizer regexes for every reference
    val withToks = docs.withColumn("_toks", TextFns.tokens(col("text")))
    val withScores = langStops.foldLeft(withToks) { case (df, (lang, stops)) =>
      df.withColumn(s"_score_$lang",
        size(filter(col("_toks"), t => t.isin(stops: _*))).cast(DoubleType) /
          greatest(size(col("_toks")), lit(1)))
    }
    val scoreCols = langStops.map { case (lang, _) => lang -> col(s"_score_$lang") }
    val best = greatest(scoreCols.map(_._2): _*)
    // argmax: first language whose score equals the max and is > 0
    val pred = scoreCols.foldRight(lit("unknown")) { case ((lang, s), acc) =>
      when(s === best && s > 0.0, lang).otherwise(acc)
    }
    withScores
      .select(col("doc_id"), col("lang"), pred.as("pred_lang"),
        col("_score_en").as("score_en"))
      .orderBy(col("doc_id"))
  }

  /** Content fingerprint: 64-bit hex prefix of sha256 over the
    * normalized text — stable under whitespace/punctuation noise, the
    * key for cross-snapshot dedup joins. */
  def t04_text_fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(sha2(TextFns.normalized(col("text")), 256), 1, 16).as("fp64"),
        size(TextFns.tokens(col("text"))).as("n_tokens"))
      .orderBy(col("doc_id"))

  /** BPE-ish token estimate: word pieces / digit runs / punctuation each
    * count as a token (the cheap regex proxy for subword tokenizers used
    * to budget LLM training data), alongside the chars-per-token ratio. */
  def t05_token_estimate(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("_bpeish",
        regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")))
      .select(col("doc_id"),
        col("_bpeish").as("n_tokens_bpeish"),
        size(split(trim(col("text")), "\\s+")).as("n_tokens_ws"),
        (length(col("text")).cast(DoubleType) /
          greatest(col("_bpeish"), lit(1))).as("chars_per_token"))
      .orderBy(col("doc_id"))

  private val URL_PAT = "https?://\\S+"
  private val EMAIL_PAT = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII/URL scrubbing — the redaction pass of a corpus-cleaning
    * pipeline: URLs first (an email inside a URL must count once, as a
    * URL), then emails; counts alongside the scrubbed text. Per-row
    * regexp expressions in the scan stage, zero shuffle. */
  def t06_text_scrub(spark: SparkSession, dir: String): DataFrame =
    scrubText(Tables.documents(spark, dir))

  /** Core, corpus-independent: input needs (doc_id, text). */
  def scrubText(docs: DataFrame): DataFrame =
    docs
      // URL-scrubbed form materialized once: both the email count and
      // the final text derive from it (HOF/CSE note in TextFns)
      .withColumn("_nourl", regexp_replace(col("text"), URL_PAT, "<URL>"))
      .select(col("doc_id"),
        regexp_count(col("text"), lit(URL_PAT)).as("n_urls"),
        regexp_count(col("_nourl"), lit(EMAIL_PAT)).as("n_emails"),
        regexp_replace(col("_nourl"), EMAIL_PAT, "<EMAIL>").as("clean_text"))
      .orderBy(col("doc_id"))

  /** Corpus-wide token-3-gram frequency top-k — the n-gram statistics
    * pass behind contamination screening and boilerplate detection. At
    * 100 TB: per-row shingling in the scan stage, one partial-agg
    * count shuffle on the gram, then orderBy+limit plans as
    * TakeOrdered (per-partition top-k heap — no global sort ever
    * materializes the full gram distribution). */
  def t07_ngram_topk(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("_toks", TextFns.tokens(col("text")))
      .select(explode(TextFns.shinglesFromTokens(col("_toks"), 3)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram"))
      .limit(100)
  // NOTE on exploding computed arrays: Sessions.base excludes
  // InferFiltersFromGenerate — without that, the optimizer clones the
  // whole shingle chain into a pushed-down `size(...) > 0` filter whose
  // HOF lambdas then re-evaluate the tokenizer per element (NOTES_r4).

  /** Token-window chunking — the RAG/embedding prep op: each document
    * explodes into overlapping windows of `window` whitespace tokens
    * with stride `stride` (overlap = window - stride). Chunk count =
    * ceil((n - window)/stride) + 1, so the final window always reaches
    * the end of the doc; sub-window docs yield one (short) chunk.
    * Per-row compute + explode in the scan stage — the only data growth
    * is the intended ~window/stride duplication factor, no shuffle. */
  def t08_chunk_text(spark: SparkSession, dir: String): DataFrame =
    chunkText(Tables.documents(spark, dir), window = 64, stride = 48)

  /** Core, corpus-independent: input needs (doc_id, text). */
  def chunkText(docs: DataFrame, window: Int, stride: Int): DataFrame =
    // the trailing sort exists for t08's oracle row-order compare only —
    // composing operators (d13) use the unsorted core
    chunkTextUnsorted(docs, window, stride).orderBy(col("doc_id"), col("chunk_id"))

  /** [[chunkText]] without the presentation sort: a downstream shuffle
    * (d13's hash window) would destroy the ordering anyway, and a
    * global range-sort of every (doc, chunk) row is pure waste there. */
  def chunkTextUnsorted(docs: DataFrame, window: Int, stride: Int): DataFrame =
    docs
      .withColumn("_toks", split(trim(col("text")), "\\s+"))
      .withColumn("chunk_id", explode(expr(
        s"sequence(0L, (greatest(size(_toks) - $window, 0) + ${stride - 1}) DIV $stride)")))
      // chunk slice materialized once — text and token count both read it
      .withColumn("_chunk", slice(col("_toks"),
        col("chunk_id") * stride + 1, lit(window)))
      .select(col("doc_id"), col("chunk_id"),
        size(col("_chunk")).cast(LongType).as("n_chunk_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))

  /** Fuzzy matching by edit distance — the character-level verifier a
    * cleaning pipeline runs on candidate pairs (typo'd near-dups that
    * token-level Jaccard can miss or over-match). Exhaustive
    * levenshtein is O(n²·len²) and unrunnable at scale, so distance is
    * computed ONLY on pairs already blocked by the shared-rare-gram
    * index (d04's candidate generation — the standard blocking+verify
    * shape), and on a fixed 64-char normalized prefix so the DP cost
    * per pair is bounded. */
  def t09_edit_distance(spark: SparkSession, dir: String): DataFrame = {
    val norms = Tables.documents(spark, dir)
      .select(col("doc_id"),
        substring(TextFns.normalized(col("text")), 1, 64).as("prefix"))
    Dedup.wordGramVerifiedPairs(Tables.documents(spark, dir))
      .join(norms.select(col("doc_id").as("a"), col("prefix").as("pa")), "a")
      .join(norms.select(col("doc_id").as("b"), col("prefix").as("pb")), "b")
      .select(col("a"), col("b"),
        levenshtein(col("pa"), col("pb")).as("lev"),
        (lit(1.0) - levenshtein(col("pa"), col("pb")).cast(DoubleType) /
          greatest(length(col("pa")), length(col("pb")), lit(1)))
          .as("prefix_sim"))
      .orderBy(col("a"), col("b"))
  }

  /** Gopher-style repetition-quality gate (Rae et al. 2021 §A1.1):
    * per-doc top-word / top-bigram / duplicate-word fractions from the
    * one-pass native [[graft.functions.RepStatsExpr]] — the whole gate
    * runs inside the scan stage, zero shuffle, no sorts, no per-bigram
    * string allocation. Thresholds are corpus-tuned (the paper's 0.2
    * was tuned to MassiveWeb; this synthetic corpus needs 0.1 for the
    * gate to actually bisect it — the operator is the thresholded
    * filter, wherever the thresholds sit). */
  def t10_repetition_stats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("_toks", TextFns.tokens(col("text")))
      .withColumn("_st",
        graft.functions.RepStatsExpr.repetitionStats(col("_toks")))
      .select(col("doc_id"),
        col("_st.n_words").as("n_words"),
        col("_st.top_word_frac").as("top_word_frac"),
        col("_st.top_bigram_frac").as("top_bigram_frac"),
        col("_st.dup_word_frac").as("dup_word_frac"),
        (col("_st.top_word_frac") <= 0.1 &&
          col("_st.top_bigram_frac") <= 0.1).as("gopher_keep"))
      .orderBy(col("doc_id"))

  /** BPE merge-candidate mining — the distributed-heavy step of
    * tokenizer training: count adjacent SYMBOL pairs across every word
    * OCCURRENCE in the corpus (the statistic each BPE iteration
    * maximizes) and rank the top-10 merges (count desc, pair asc — the
    * deterministic tie-break real trainers pin down for
    * reproducibility). Shape: word frequencies first (one hash agg —
    * the corpus collapses to its vocabulary before any character work),
    * then per-VOCAB-WORD pair expansion weighted by the word's count,
    * then one more hash agg. At 100 TB the char-level explode touches
    * |vocab| rows, not |corpus| rows — the only corpus-sized pass is
    * the word count. Iterating = apply merge #1 to the vocab (a string
    * replace on the symbol sequence) and re-run — each iteration is two
    * small aggregations, which is exactly how map-reduce BPE trainers
    * (SentencePiece's Spark port, etc.) structure it. */
  def t11_bpe_candidates(spark: SparkSession, dir: String): DataFrame = {
    val vocab = Tables.documents(spark, dir)
      .select(explode(TextFns.tokens(col("text"))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    vocab
      .select(col("n"), explode(expr(
        "transform(sequence(1, length(w) - 1), " +
          "i -> struct(substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r))")).as("p"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("left"), col("right"))
      .limit(10)
      .withColumn("rank", row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("left"), col("right"))).cast("long"))
      .select(col("rank"), col("left"), col("right"), col("cnt"))
      .orderBy(col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t11_bpe_candidates" -> (t11_bpe_candidates _),
    "t09_edit_distance" -> (t09_edit_distance _),
    "t10_repetition_stats" -> (t10_repetition_stats _),
    "t08_chunk_text" -> (t08_chunk_text _),
    "t05_token_estimate" -> (t05_token_estimate _),
    "t01_text_tokens" -> (t01_text_tokens _),
    "t02_text_quality" -> (t02_text_quality _),
    "t03_text_langid" -> (t03_text_langid _),
    "t04_text_fingerprint" -> (t04_text_fingerprint _),
    "t06_text_scrub" -> (t06_text_scrub _),
    "t07_ngram_topk" -> (t07_ngram_topk _))

  private val normSql =
    "TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"

  /** t03 oracle: the langid scoring is a deterministic argmax over
    * stopword-hit ratios — int/int double division and GREATEST are
    * bit-identical across Spark and DuckDB, and the CASE order mirrors
    * the foldRight tie-break (en > de > fr > es). */
  private val langidSql: String = {
    val toks =
      """STRING_SPLIT(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')""".stripMargin
    def score(stops: Seq[String]): String = {
      val inList = stops.map(s => s"'$s'").mkString(",")
      s"CAST(LEN(LIST_FILTER(toks, t -> t IN ($inList))) AS DOUBLE) / GREATEST(LEN(toks), 1)"
    }
    val en = score(Seq("the", "and", "of", "to", "is", "in", "that", "it"))
    val de = score(Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"))
    val fr = score(Seq("le", "la", "les", "et", "est", "un", "une", "que"))
    val es = score(Seq("el", "la", "los", "y", "es", "un", "una", "que"))
    s"""WITH tok AS (SELECT doc_id, lang, $toks AS toks FROM documents),
       |sc AS (SELECT doc_id, lang,
       |  $en AS s_en, $de AS s_de, $fr AS s_fr, $es AS s_es FROM tok)
       |SELECT doc_id, lang,
       |  CASE WHEN s_en = GREATEST(s_en, s_de, s_fr, s_es) AND s_en > 0 THEN 'en'
       |       WHEN s_de = GREATEST(s_en, s_de, s_fr, s_es) AND s_de > 0 THEN 'de'
       |       WHEN s_fr = GREATEST(s_en, s_de, s_fr, s_es) AND s_fr > 0 THEN 'fr'
       |       WHEN s_es = GREATEST(s_en, s_de, s_fr, s_es) AND s_es > 0 THEN 'es'
       |       ELSE 'unknown' END AS pred_lang,
       |  s_en AS score_en
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "t11_bpe_candidates" ->
      """WITH w AS (
        |  SELECT UNNEST(STRING_SPLIT(TRIM(REGEXP_REPLACE(REGEXP_REPLACE(LOWER(text),
        |    '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' ')) AS w
        |  FROM documents),
        |vocab AS (
        |  SELECT w, COUNT(*) AS n FROM w WHERE LENGTH(w) >= 2 GROUP BY w),
        |pairs AS (
        |  SELECT SUBSTRING(w, CAST(i AS INT), 1) AS l,
        |         SUBSTRING(w, CAST(i AS INT) + 1, 1) AS r, n
        |  FROM vocab, UNNEST(RANGE(1, LENGTH(w))) AS t(i)),
        |ranked AS (
        |  SELECT l AS "left", r AS "right", CAST(SUM(n) AS BIGINT) AS cnt
        |  FROM pairs GROUP BY 1, 2
        |  ORDER BY cnt DESC, "left", "right" LIMIT 10)
        |SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, "left", "right") AS rank,
        |  "left", "right", cnt
        |FROM ranked ORDER BY rank""".stripMargin,
    // unnest + GROUP BY reproduces RepStatsExpr's one-pass counts; the
    // fractions are single exact-int divisions in double — bit-identical
    "t10_repetition_stats" ->
      s"""WITH t AS (SELECT doc_id, STRING_SPLIT($normSql, ' ') AS w FROM documents),
         |uni AS (SELECT doc_id, x AS word, COUNT(*) AS c
         |        FROM t, UNNEST(w) AS u(x) GROUP BY doc_id, x),
         |us AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, MAX(c) AS mx,
         |        CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup
         |       FROM uni GROUP BY doc_id),
         |bg AS (SELECT doc_id, w[g] || ' ' || w[g + 1] AS b
         |       FROM t, UNNEST(GENERATE_SERIES(1, LEN(w) - 1)) AS s(g)),
         |bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY doc_id, b),
         |bs AS (SELECT doc_id, MAX(c) AS mxb FROM bc GROUP BY doc_id),
         |r AS (SELECT us.doc_id, us.n AS n_words,
         |  CAST(us.mx AS DOUBLE) / us.n AS top_word_frac,
         |  CASE WHEN us.n > 1
         |       THEN CAST(COALESCE(bs.mxb, 0) AS DOUBLE) / (us.n - 1)
         |       ELSE 0.0 END AS top_bigram_frac,
         |  CAST(us.dup AS DOUBLE) / us.n AS dup_word_frac
         |  FROM us LEFT JOIN bs USING (doc_id))
         |SELECT doc_id, n_words, top_word_frac, top_bigram_frac, dup_word_frac,
         |  (top_word_frac <= 0.1 AND top_bigram_frac <= 0.1) AS gopher_keep
         |FROM r ORDER BY doc_id""".stripMargin,
    // same candidate CTE chain as d08 (shared rare-word-gram blocking);
    // levenshtein is exact DP in both engines, and the similarity is an
    // int/int double division — bit-identical
    "t09_edit_distance" ->
      s"""WITH ${Dedup.wordGramPairCtes},
         |n AS (SELECT doc_id, SUBSTRING(norm, 1, 64) AS prefix FROM d)
         |SELECT v.a, v.b,
         |  CAST(levenshtein(na.prefix, nb.prefix) AS INT) AS lev,
         |  1.0 - CAST(levenshtein(na.prefix, nb.prefix) AS DOUBLE)
         |    / GREATEST(LENGTH(na.prefix), LENGTH(nb.prefix), 1) AS prefix_sim
         |FROM ver v
         |JOIN n na ON na.doc_id = v.a
         |JOIN n nb ON nb.doc_id = v.b
         |ORDER BY v.a, v.b""".stripMargin,
    "t08_chunk_text" ->
      """WITH t AS (SELECT doc_id,
        |  REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+') AS toks FROM documents),
        |c AS (
        |  SELECT doc_id, toks, i AS chunk_id,
        |    toks[CAST(i * 48 + 1 AS INT):CAST(i * 48 + 64 AS INT)] AS chunk
        |  FROM t, UNNEST(RANGE(0, (GREATEST(LEN(toks) - 64, 0) + 47) // 48 + 1)) AS u(i))
        |SELECT doc_id, chunk_id,
        |  CAST(LEN(chunk) AS BIGINT) AS n_chunk_tokens,
        |  ARRAY_TO_STRING(chunk, ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "t06_text_scrub" ->
      """SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, 'https?://\S+')) AS INT) AS n_urls,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(REGEXP_REPLACE(text, 'https?://\S+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |  REGEXP_REPLACE(REGEXP_REPLACE(text, 'https?://\S+', '<URL>', 'g'),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS clean_text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t07_ngram_topk" ->
      s"""WITH tok AS (SELECT STRING_SPLIT($normSql, ' ') AS toks FROM documents),
         |g AS (SELECT ARRAY_TO_STRING(toks[CAST(i AS INT):CAST(i AS INT) + 2], ' ') AS gram
         |      FROM tok, UNNEST(RANGE(1, GREATEST(LEN(toks) - 1, 2))) t(i))
         |SELECT gram, COUNT(*) AS n FROM g WHERE LENGTH(gram) > 0
         |GROUP BY gram ORDER BY n DESC, gram LIMIT 100""".stripMargin,
    "t03_text_langid" -> langidSql,
    "t05_token_estimate" ->
      """SELECT doc_id,
        |  CAST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens_bpeish,
        |  LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS n_tokens_ws,
        |  CAST(LENGTH(text) AS DOUBLE)
        |    / GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')), 1) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t01_text_tokens" ->
      """SELECT doc_id,
        |  LEN(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\s+')) AS n_tokens,
        |  LENGTH(text) AS text_len,
        |  n_chars,
        |  LENGTH(text) - (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[ ]', '', 'g'))) AS n_nonspace
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t02_text_quality" ->
      """SELECT doc_id,
        |  LENGTH(text) AS text_len,
        |  LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')) AS n_letters,
        |  LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')) AS n_digits,
        |  CAST(LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[a-zA-Z]', '', 'g')) AS DOUBLE)
        |    / LENGTH(text) AS letter_ratio,
        |  LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) AS n_tokens,
        |  LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+'),
        |    t -> t IN ('the','a','of','and','to','in','is'))) AS n_stopwords,
        |  CAST(LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+'),
        |    t -> t IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |    / LEN(REGEXP_SPLIT_TO_ARRAY(LOWER(TRIM(text)), '\s+')) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t04_text_fingerprint" ->
      s"""SELECT doc_id,
         |  SUBSTRING(SHA256($normSql), 1, 16) AS fp64,
         |  LEN(REGEXP_SPLIT_TO_ARRAY($normSql, '\\s+')) AS n_tokens
         |FROM documents ORDER BY doc_id""".stripMargin)
}
