package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Repetition statistics for Gopher-style document-quality filtering
  * (Rae et al. 2021, "Scaling Language Models" §A1.1: drop documents
  * dominated by repeated words / n-grams) as ONE pass over the token
  * array — a codegen'd native expression, so the whole quality gate
  * stays in the parquet scan stage with zero shuffle and zero sorts.
  *
  * Returns `struct<n_words, top_word_frac, top_bigram_frac,
  * dup_word_frac>` where
  *   - `top_word_frac`   = count(most frequent word) / n_words,
  *   - `top_bigram_frac` = count(most frequent bigram) / (n_words − 1)
  *     (0.0 when fewer than 2 words),
  *   - `dup_word_frac`   = Σ count(word with count > 1) / n_words —
  *     the fraction of tokens belonging to repeated words.
  * All three are one exact int division in double — bit-reproducible
  * against any engine computing the same counts (the DuckDB oracle
  * does it with unnest + GROUP BY; same integers, same division).
  *
  * Single pass, one hash map probe per token: words intern to dense
  * ids as they are counted, and each bigram is the packed long
  * `prevId << 32 | curId` counted in a primitive-keyed map — no
  * per-bigram string allocation, no O(n²) array_distinct, no sort.
  * Null array elements are skipped (excluded from every count).
  */
case class RepStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepStatsExpr.schema
  override def prettyName: String = "graft_repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    RepStatsExpr.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepStatsExpr =
    copy(child = newChild)
}

object RepStatsExpr {
  import org.apache.spark.sql.GraftShims.{column, expression}

  val schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("top_word_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false),
    StructField("dup_word_frac", DoubleType, nullable = false)))

  /** `toks`: array<string>. See class doc for the three statistics. */
  def stats(toks: ArrayData): InternalRow = {
    val m = toks.numElements()
    // word → packed (id << 32 | count); UTF8String views are valid map
    // keys for the duration of this call
    val words = new java.util.HashMap[UTF8String, Long](Math.max(16, m * 2))
    val ids = new Array[Int](m)
    var n = 0
    var i = 0
    while (i < m) {
      ids(i) = -1
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        val packed = words.getOrDefault(w, 0L)
        if (packed == 0L) { // absent (count is always ≥ 1 once present)
          ids(i) = words.size()
          words.put(w, (ids(i).toLong << 32) | 1L)
        } else {
          ids(i) = (packed >>> 32).toInt
          words.put(w, packed + 1L)
        }
        n += 1
      }
      i += 1
    }
    var maxW = 0L
    var dup = 0L
    val it = words.values().iterator()
    while (it.hasNext) {
      val c = it.next() & 0xFFFFFFFFL
      if (c > maxW) maxW = c
      if (c > 1) dup += c
    }
    // bigrams over consecutive non-null tokens, as packed id pairs
    val bigrams = new java.util.HashMap[Long, Int](Math.max(16, m * 2))
    var maxB = 0
    var nBi = 0L
    i = 1
    while (i < m) {
      if (ids(i - 1) >= 0 && ids(i) >= 0) {
        val key = (ids(i - 1).toLong << 32) | ids(i).toLong
        val c = bigrams.merge(key, 1, (a, b) => a + b)
        if (c > maxB) maxB = c
        nBi += 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong,
      if (n > 0) maxW.toDouble / n else 0.0,
      if (nBi > 0) maxB.toDouble / nBi else 0.0,
      if (n > 0) dup.toDouble / n else 0.0))
  }

  /** Column wrapper over a materialized token-array column (same
    * re-evaluation caveat as [[TextFns.shinglesFromTokens]]). */
  def repetitionStats(toks: Column): Column =
    column(RepStatsExpr(expression(toks)))
}
