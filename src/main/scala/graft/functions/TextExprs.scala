package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen text expressions for the normalize/gram hot path.
  *
  * [[TextFns.normalized]]'s reference form is
  * `trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\s]", " "),
  * "\s+", " "))` — two java.util.regex passes plus a lowercase copy per
  * row, measured as the single largest cost of the d02/d04 dedup family
  * at soak scale (4.2 s of the 11 s scale-10 d04 run just for the
  * regexes). [[TextNormalizeExpr]] computes the identical string in one
  * branch-free byte pass for ASCII input (the key observation: every
  * maximal run of characters outside `[a-z0-9]` — punctuation and
  * whitespace alike — maps to exactly one space under the two-regex
  * composition, and leading/trailing runs vanish under trim). Rows
  * containing any non-ASCII byte take a per-row fallback that runs the
  * EXACT reference pipeline (UTF8String.toLowerCase + the same two
  * java.util.regex patterns), so the expression is bit-identical to the
  * HOF form on every input, not just the ASCII corpus. UdxSpec asserts
  * native == reference on corpus rows plus adversarial strings.
  *
  * [[GramHashesExpr]] fuses the d04 gram-set build
  * (`distinctLongs(transform(charNgramsFromNormalized(norm, n),
  * xxhash64))`) into one pass: the normalized string is ASCII by
  * construction (the normalize output alphabet is `[a-z0-9 ]`), so
  * byte windows ARE character windows, and each window is hashed in
  * place with the same XXH64(seed 42) Spark's `xxhash64` applies to the
  * materialized substring — no per-position UTF8String.substr scan
  * (O(L) each, O(L²) per doc), no transient string array, no per-gram
  * allocation. Output: sorted distinct long array, exactly
  * [[SketchExprs.distinctLongs]]'s contract.
  */
object TextExprs {
  import org.apache.spark.sql.GraftShims.{column, expression}

  /** One-pass normalize — semantics of [[TextFns.normalized]] exactly. */
  def normalize(text: Column): Column =
    column(TextNormalizeExpr(expression(text)))

  /** Sorted-distinct XXH64 hashes of every n-char window of an ALREADY
    * NORMALIZED string ([[normalize]] output — ASCII by construction). */
  def gramHashes(norm: Column, n: Int): Column =
    column(GramHashesExpr(expression(norm), n))

  /** XXH64 hashes of every word k-gram of an already normalized string —
    * fused `transform(shinglesFromTokens(split(norm, " "), k), xxhash64)`
    * (`distinct = true` additionally applies [[SketchExprs.distinctLongs]]).
    * Bit-identical by the split/join inverse: the k tokens re-joined by
    * single spaces ARE the substring of `norm` from the first token's
    * start to the last one's end, so hashing that byte range in place
    * equals xxhash64 of the concat_ws materialization — without the
    * per-position slice() array, concat copy, and string allocation. */
  def wordGramHashes(norm: Column, k: Int, distinct: Boolean,
      fnv: Boolean = false): Column =
    column(WordGramHashesExpr(expression(norm), k, distinct, fnv))

  /** Analysis-time STRING check shared by the three expressions. */
  private[functions] def requireString(e: UnaryExpression): TypeCheckResult =
    if (e.child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${e.prettyName} requires a STRING input, got " +
        e.child.dataType.catalogString)
}

case class TextNormalizeExpr(child: Expression) extends UnaryExpression {
  // analysis-time type check: a non-string child previously surfaced as a
  // task-side ClassCastException instead of an AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = TextExprs.requireString(this)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_text_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextNormalizeExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizeExpr.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): TextNormalizeExpr =
    copy(child = newChild)
}

object TextNormalizeExpr {
  // the reference pipeline's two patterns, compiled once per JVM
  private val nonAlnum = java.util.regex.Pattern.compile("[^a-z0-9\\s]")
  private val wsRun = java.util.regex.Pattern.compile("\\s+")

  def normalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val in = s.getBytes // copies only when the string isn't array-backed at offset 0
    var i = 0
    while (i < n && in(i) >= 0) i += 1
    if (i < n) return fallback(s)
    // ASCII fast path: one pass, output ≤ input length
    val out = new Array[Byte](n)
    var w = 0
    var pendingSpace = false
    i = 0
    while (i < n) {
      var b = in(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && w > 0) { out(w) = ' '; w += 1 }
        pendingSpace = false
        out(w) = b
        w += 1
      } else {
        // punctuation and whitespace alike: one space per run, dropped
        // at the head (w == 0) and — by never flushing — at the tail
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, w)
  }

  /** Bit-exact reference pipeline for rows with non-ASCII bytes. */
  private def fallback(s: UTF8String): UTF8String = {
    val lowered = s.toLowerCase.toString
    val spaced = nonAlnum.matcher(lowered).replaceAll(" ")
    val collapsed = wsRun.matcher(spaced).replaceAll(" ")
    // trim(col) removes leading/trailing SPACES (0x20) only
    var from = 0
    var to = collapsed.length
    while (from < to && collapsed.charAt(from) == ' ') from += 1
    while (to > from && collapsed.charAt(to - 1) == ' ') to -= 1
    UTF8String.fromString(collapsed.substring(from, to))
  }
}

case class GramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = TextExprs.requireString(this)
  require(n > 0, "gram width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    GramHashesExpr.gramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHashesExpr.gramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): GramHashesExpr =
    copy(child = newChild)
}

case class WordGramHashesExpr(child: Expression, k: Int, distinct: Boolean,
    fnv: Boolean = false)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = TextExprs.requireString(this)
  require(k > 0, "gram width must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_gram_hashes"

  override protected def nullSafeEval(input: Any): Any =
    WordGramHashesExpr.wordGramHashes(input.asInstanceOf[UTF8String], k, distinct, fnv)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordGramHashesExpr.wordGramHashes($c, $k, $distinct, $fnv)")

  override protected def withNewChildInternal(newChild: Expression): WordGramHashesExpr =
    copy(child = newChild)
}

object WordGramHashesExpr {
  private val SEED = 42L // Spark's xxhash64 default seed

  /** FNV-1a 64 over a byte range — the per-gram hash of the `fnv = true`
    * mode, identical to [[Udx.fnv64]] over the gram's own bytes. The
    * ORACLE-MIRRORABLE family (r19, the d03/u02 precedent): DuckDB can
    * refold FNV per gram with HUGEINT mod-2^64 arithmetic, which
    * xxhash64 does not allow — this is what lets d02's whole
    * MinHash-LSH pipeline (signature → banding → capped buckets →
    * Jaccard verify) be recomputed exactly by the DuckDB oracle. */
  private def fnv64Range(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def wordGramHashes(s: UTF8String, k: Int, distinct: Boolean): GenericArrayData =
    wordGramHashes(s, k, distinct, fnv = false)

  /** Mirrors `filter(transform(sequence(0, greatest(size(toks)-k, 0)),
    * i => concat_ws(" ", slice(toks, i+1, k))), length(_) > 0)` over
    * `toks = split(norm, " ")`, hashed: split-on-space token windows
    * re-joined by spaces are byte ranges of `norm` (empty tokens from
    * repeated spaces included — split keeps them and concat_ws keeps
    * empty strings, so the identity is unconditional). A doc with
    * ≤ k tokens yields the whole string as its single gram; an empty
    * string yields none (the length filter). */
  def wordGramHashes(s: UTF8String, k: Int, distinct: Boolean,
      fnv: Boolean): GenericArrayData = {
    val len = s.numBytes()
    if (len == 0) return new GenericArrayData(Array.emptyLongArray)
    val bytes = s.getBytes
    // space positions → token boundaries
    var nsp = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nsp += 1; i += 1 }
    val nToks = nsp + 1
    if (nToks <= k)
      return dedup(Array(
        if (fnv) fnv64Range(bytes, 0, len)
        else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, len, SEED)),
        distinct)
    val sp = new Array[Int](nsp)
    var w = 0
    i = 0
    while (i < len) { if (bytes(i) == ' ') { sp(w) = i; w += 1 }; i += 1 }
    // gram i spans [start(i), end(i + k - 1)) where start(0) = 0,
    // start(j) = sp(j-1) + 1, end(j) = if (j == nsp) len else sp(j)
    val m = nToks - k + 1
    val hs = new Array[Long](m)
    var out = 0
    i = 0
    while (i < m) {
      val from = if (i == 0) 0 else sp(i - 1) + 1
      val until = if (i + k - 1 == nsp) len else sp(i + k - 1)
      if (until > from) { // the HOF's length(_) > 0 filter (k = 1 + empty token)
        hs(out) =
          if (fnv) fnv64Range(bytes, from, until)
          else XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + from,
            until - from, SEED)
        out += 1
      }
      i += 1
    }
    dedup(if (out == m) hs else java.util.Arrays.copyOf(hs, out), distinct)
  }

  private def dedup(hs: Array[Long], distinct: Boolean): GenericArrayData = {
    // hs.isEmpty guard: `w = 1` below would otherwise fabricate a
    // phantom [0L] gram for a document with no grams at all (e.g. an
    // all-spaces string), which could spuriously match any other such
    // document
    if (!distinct || hs.isEmpty) return new GenericArrayData(hs)
    java.util.Arrays.sort(hs)
    var w = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}

object GramHashesExpr {
  private val SEED = 42L // Spark's xxhash64 default seed

  def gramHashes(s: UTF8String, n: Int): GenericArrayData = {
    val len = s.numBytes()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val bytes = s.getBytes
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + i, n, SEED)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < m) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, w))
  }
}
