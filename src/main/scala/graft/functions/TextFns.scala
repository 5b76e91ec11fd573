package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by dedup / text-analysis /
  * similarity operators. Everything here is built from
  * `org.apache.spark.sql.functions` (codegen'd) — no UDFs, so the whole
  * pipeline stays inside whole-stage codegen and scales per-row with no
  * shuffle.
  */
object TextFns {

  /** Lowercased, punctuation-stripped, whitespace-normalized form —
    * the canonical text for near-dup comparisons. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** Distinct word k-shingles (k consecutive tokens joined by a space) —
    * the MinHash input unit. A document shorter than k tokens yields its
    * whole token string as the single shingle (standard practice). */
  def shingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))),
        s => length(s) > 0))
  }

  /** Distinct character n-grams of the normalized text. */
  def charNgrams(text: Column, n: Int): Column = {
    val t = normalized(text)
    array_distinct(
      filter(
        transform(sequence(lit(0), greatest(length(t) - n, lit(0))),
          i => t.substr(i + lit(1), lit(n))),
        s => length(s) === n))
  }
}
