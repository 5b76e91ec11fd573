package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Udx

/** User-extension tiers: the codegen Expression must agree with its
  * reference implementation (both interpreted and generated paths), and
  * the Aggregator must be merge-order-independent. */
class UdxSpec extends AnyFunSuite {

  test("KMV sketch is partitioning- and merge-order-independent, dedups, caps at k") {
    val s = Sessions.base("local[4]", 4)
    import s.implicits._
    val values = Seq(50L, 10L, 40L, 10L, 30L, 20L, 60L, 20L, 70L)
    def kmv(parts: Int): Seq[Seq[Long]] =
      values.toDF("h").repartition(parts).as[Long]
        .groupByKey(_ => 1).mapValues(identity)
        .agg(new Udx.KmvSketch(4).toColumn.name("kmv"))
        .collect().map(_._2).toSeq
    val expected = Seq(Seq(10L, 20L, 30L, 40L)) // 4 smallest distinct
    (1 to 4).foreach(p => assert(kmv(p) === expected, s"parts=$p"))
    // k larger than the distinct universe → everything, ascending
    val all = Seq(3L, 1L, 2L, 1L).toDF("h").as[Long]
      .groupByKey(_ => 1).mapValues(identity)
      .agg(new Udx.KmvSketch(10).toColumn.name("kmv"))
      .collect().map(_._2).toSeq
    assert(all === Seq(Seq(1L, 2L, 3L)))
  }

  lazy val spark: SparkSession = Sessions.base("local[4]", 4)

  test("Fnv64Expr matches reference impl (codegen path)") {
    import spark.implicits._
    val inputs = Seq("", "a", "hello world", "graft", "é中文")
    val got = inputs.toDF("s").select(Udx.graft_fnv64(col("s")).as("h"))
      .collect().map(_.getLong(0))
    val want = inputs.map(s => Udx.fnv64(s.getBytes("UTF-8")))
    assert(got.toSeq === want)
  }

  test("Fnv64Expr interpreted path (eval) agrees too") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = Udx.Fnv64Expr(Literal("hello world"))
    assert(e.eval(null) === Udx.fnv64("hello world".getBytes("UTF-8")))
  }

  test("WeightedMean is exact and merge-order-independent") {
    // associative fixed-point sums: any grouping of partials agrees
    val rows = Seq((10.00, 2.00), (20.00, 1.00), (0.50, 4.00))
    val whole = rows.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce)
    val (l, r) = rows.splitAt(1)
    val split = Udx.WeightedMean.merge(
      l.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce),
      r.foldLeft(Udx.WeightedMean.zero)(Udx.WeightedMean.reduce))
    assert(whole === split)
    val mean = Udx.WeightedMean.finish(whole)
    assert(math.abs(mean - (10 * 2 + 20 * 1 + 0.5 * 4) / 7.0) < 1e-12)
  }

  test("WeightedMean zero weight yields 0") {
    assert(Udx.WeightedMean.finish(Udx.WeightedMean.zero) === 0.0)
  }

  test("DotExpr matches the HOF fold bit-for-bit on corpus vectors") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    val both = emb.crossJoin(emb.select(col("embedding").as("e2"), col("vec_id").as("v2")))
      .limit(500)
      .select(
        graft.functions.DotExpr(col("embedding"), col("e2")).as("native"),
        expr("aggregate(zip_with(embedding, e2, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
          "CAST(0 AS DOUBLE), (acc, p) -> acc + p)").as("fold"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("MinHashSigExpr / SimHashExpr match their HOF forms on corpus docs") {
    import graft.functions.{HashFns, TextFns}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
      .select(col("doc_id"), TextFns.tokens(col("text")).as("toks"))
      .select(col("doc_id"), HashFns.baseHashes(col("toks")).as("h"))
    val rows = docs.select(
        HashFns.minhashFromBases(col("h"), 16).as("sig_native"),
        HashFns.minhashFromBasesHof(col("h"), 16).as("sig_hof"),
        HashFns.simhashFromHashes(col("h")).as("sh_native"),
        HashFns.simhashFromHashesHof(col("h")).as("sh_hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1))
      assert(r.getLong(2) === r.getLong(3))
    }
  }

  test("LongsDistinctExpr is sorted-unique; empty and multiset inputs") {
    import spark.implicits._
    import graft.functions.SketchExprs
    val got = Seq(
        Seq(5L, 1L, 5L, 3L, 1L, 1L),
        Seq.empty[Long],
        Seq(7L, 7L, 7L))
      .toDF("a").select(SketchExprs.distinctLongs(col("a")).as("d"))
      .collect().map(_.getSeq[Long](0))
    assert(got(0) === Seq(1L, 3L, 5L))
    assert(got(1) === Seq.empty[Long])
    assert(got(2) === Seq(7L))
  }

  test("MinHashSigExpr empty input yields n nulls (array_min parity)") {
    import spark.implicits._
    import graft.functions.HashFns
    val r = Seq(Seq.empty[Long]).toDF("h")
      .select(HashFns.minhashFromBases(col("h"), 8).as("sig"),
        HashFns.minhashFromBasesHof(col("h"), 8).as("sig_hof"))
      .head()
    assert(r.getSeq[Any](0) === Seq.fill(8)(null))
    assert(r.getSeq[Any](0) === r.getSeq[Any](1))
  }

  test("MinHashSigExpr / SimHashExpr null-element handling matches the HOF forms") {
    import spark.implicits._
    import graft.functions.HashFns
    // null elements: minhash skips them (array_min semantics); simhash
    // votes -1 on every bit (when(...).otherwise(-1) semantics)
    val r = Seq(
        Seq[Option[Long]](Some(11L), None, Some(42L)),
        Seq[Option[Long]](None, None), // all-null → n nulls / 0L
        Seq[Option[Long]](Some(7L)))
      .toDF("h")
      .select(HashFns.minhashFromBases(col("h"), 8).as("sig"),
        HashFns.minhashFromBasesHof(col("h"), 8).as("sig_hof"),
        HashFns.simhashFromHashes(col("h")).as("sh"),
        HashFns.simhashFromHashesHof(col("h")).as("sh_hof"))
      .collect()
    r.foreach { row =>
      assert(row.getSeq[Any](0) === row.getSeq[Any](1))
      assert(row.getLong(2) === row.getLong(3))
    }
    assert(r(1).getSeq[Any](0) === Seq.fill(8)(null))
  }

  test("graft_fnv64 is callable from the SQL surface (Sessions registration)") {
    val got = spark.sql("SELECT graft_fnv64('hello world') AS h").head().getLong(0)
    assert(got === Udx.fnv64("hello world".getBytes("UTF-8")))
  }

  test("GraftExtensions injects the function into an independently built session") {
    val prevDefault = org.apache.spark.sql.SparkSession.getDefaultSession
    val prevActive = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    try {
      val s2 = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val got = s2.sql("SELECT graft_fnv64('abc') AS h").head().getLong(0)
      assert(got === Udx.fnv64("abc".getBytes("UTF-8")))
    } finally {
      prevDefault.foreach(org.apache.spark.sql.SparkSession.setDefaultSession)
      prevActive.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
    }
  }

  /** Driver-side reference for RepStatsExpr: plain Scala groupBy counts. */
  private def repRef(toks: Seq[String]): (Long, Double, Double, Double) = {
    val n = toks.size
    if (n == 0) return (0L, 0.0, 0.0, 0.0)
    val wc = toks.groupBy(identity).map(_._2.size)
    val dup = wc.filter(_ > 1).sum
    val bi = toks.zip(toks.tail)
    val topB = if (bi.isEmpty) 0.0
      else bi.groupBy(identity).map(_._2.size).max.toDouble / bi.size
    (n.toLong, wc.max.toDouble / n, topB, dup.toDouble / n)
  }

  test("RepStatsExpr matches a driver-side reference (codegen path)") {
    import spark.implicits._
    import graft.functions.RepStatsExpr
    val cases = Seq(
      Seq("a"),
      Seq("a", "a", "a"),
      Seq("a", "b", "a", "b", "c"),
      Seq("x", "y", "z"),
      Seq(""),
      (0 until 50).map(i => s"w${i % 7}"))
    val got = cases.zipWithIndex.map(_.swap).toDF("id", "toks")
      .select(col("id"), RepStatsExpr.repetitionStats(col("toks")).as("st"))
      .select(col("id"), col("st.n_words"), col("st.top_word_frac"),
        col("st.top_bigram_frac"), col("st.dup_word_frac"))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    cases.zipWithIndex.foreach { case (toks, i) =>
      assert(got(i) === repRef(toks), s"case $i: $toks")
    }
  }

  test("RepStatsExpr skips null elements and handles empty arrays") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.RepStatsExpr
    def run(elems: Array[Any]) = RepStatsExpr(Literal.create(
        new GenericArrayData(elems), ArrayType(StringType, containsNull = true)))
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    val u = (s: String) => UTF8String.fromString(s)
    // null breaks the bigram chain: pairs are (a,a) only — "a null a b"
    // contributes zero bigrams across the null
    val r = run(Array(u("a"), u("a"), null, u("a"), u("b")))
    assert(r.getLong(0) === 4L)            // null excluded from n
    assert(r.getDouble(1) === 0.75)        // 'a' ×3 of 4
    assert(r.getDouble(2) === 0.5)         // bigrams: (a,a), (a,b) → max 1/2
    assert(r.getDouble(3) === 0.75)        // dup words: the three 'a's
    val e = run(Array.empty[Any])
    assert(e.getLong(0) === 0L && e.getDouble(1) === 0.0 &&
      e.getDouble(2) === 0.0 && e.getDouble(3) === 0.0)
  }

  test("TextNormalizeExpr == reference regex pipeline (corpus + adversarial)") {
    import spark.implicits._
    import graft.functions.TextFns
    val adversarial = Seq(
      "", " ", "   ", "a", "A", "Hello, World!", "  lead and trail  ",
      "tabs\tand\nnewlines\rmixed", "under_score-dash.dot",
      "UPPER lower 0123456789", "!!!", "a!b", "!a!", "a  b\t\tc",
      "é accents ÉÀ", "中文 mixed ascii", "İstanbul KKelvin", // Unicode edge
      "emoji 🚀 test", "ﬀ ligature", "ＦＵＬＬＷＩＤＴＨ")
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    val rows = (adversarial ++ corpus).toDF("text")
      .select(TextFns.normalized(col("text")).as("fast"),
        TextFns.normalizedRef(col("text")).as("ref"))
      .collect()
    rows.foreach(r => assert(r.getString(0) === r.getString(1),
      s"native='${r.getString(0)}' ref='${r.getString(1)}'"))
  }

  test("TextNormalizeExpr interpreted eval agrees with codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.TextNormalizeExpr
    for (s <- Seq("Hello, World!", "  A  B  ", "é", "", "İKK"))
      assert(TextNormalizeExpr(Literal(s)).eval(null).toString ===
        TextNormalizeExpr.normalize(UTF8String.fromString(s)).toString)
  }

  test("GramHashesExpr == distinctLongs(transform(charNgrams, xxhash64))") {
    import spark.implicits._
    import graft.functions.{SketchExprs, TextExprs, TextFns}
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    val inputs = Seq("", "ab", "abc", "abcd", "aaaaaa", "a b c d") ++ corpus
    val rows = inputs.toDF("text")
      .select(TextFns.normalized(col("text")).as("norm"))
      .select(TextExprs.gramHashes(col("norm"), 3).as("fused"),
        SketchExprs.distinctLongs(
          transform(TextFns.charNgramsFromNormalized(col("norm"), 3),
            g => xxhash64(g))).as("ref"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("WordGramHashesExpr == transform(shinglesFromTokens, xxhash64) [k=3,5]") {
    import spark.implicits._
    import graft.functions.{SketchExprs, TextExprs, TextFns}
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    val inputs = Seq("", "one", "one two", "one two three four five six",
      "exactly five tokens right here",
      // all-empty-gram inputs: distinct=true must return [] — a
      // phantom [0L] here would spuriously match other empty docs
      "   ", " ", "  a  ") ++ corpus
    for (k <- Seq(3, 5)) {
      val rows = inputs.toDF("text")
        .select(TextFns.normalized(col("text")).as("norm"))
        .select(
          TextExprs.wordGramHashes(col("norm"), k, distinct = false).as("fused_raw"),
          TextExprs.wordGramHashes(col("norm"), k, distinct = true).as("fused_set"),
          transform(TextFns.shinglesFromTokens(split(col("norm"), " "), k),
            g => xxhash64(g)).as("ref_raw"),
          SketchExprs.distinctLongs(
            transform(TextFns.shinglesFromTokens(split(col("norm"), " "), k),
              g => xxhash64(g))).as("ref_set"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](2), s"k=$k raw")
        assert(r.getSeq[Long](1) === r.getSeq[Long](3), s"k=$k set")
      }
    }
  }

  test("WordGramHashesExpr(fnv) == transform(shinglesFromTokens, graft_fnv64) [k=3,5]") {
    // the r19 oracle-mirrorable mode (d02): the fused byte-range FNV
    // fold must equal FNV over the materialized shingle strings —
    // which is exactly what the DuckDB oracle recomputes per gram
    import spark.implicits._
    import graft.functions.{TextExprs, TextFns, Udx}
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("text").as[String].collect().toSeq
    val inputs = Seq("", "one", "one two", "one two three four five six",
      "exactly five tokens right here", "   ", " ", "  a  ") ++ corpus
    for (k <- Seq(3, 5)) {
      val rows = inputs.toDF("text")
        .select(TextFns.normalized(col("text")).as("norm"))
        .select(
          TextExprs.wordGramHashes(col("norm"), k, distinct = false,
            fnv = true).as("fused"),
          transform(TextFns.shinglesFromTokens(split(col("norm"), " "), k),
            g => Udx.graft_fnv64(g)).as("ref"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"k=$k"))
    }
  }
}
