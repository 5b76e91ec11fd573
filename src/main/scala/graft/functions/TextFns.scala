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
    * the canonical text for near-dup comparisons. Computed by the
    * native one-pass [[TextExprs.normalize]]; bit-identical to the
    * reference HOF form (kept runnable as [[normalizedRef]] and
    * asserted equal in UdxSpec), which paid two java.util.regex passes
    * per row — the measured top cost of the dedup family at soak
    * scale. */
  def normalized(text: Column): Column = TextExprs.normalize(text)

  /** Reference regex formulation of [[normalized]] — the oracle's SQL
    * mirror, retained for the equivalence spec. */
  def normalizedRef(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(text: Column): Column = split(normalized(text), " ")

  /** Word k-shingles (k consecutive tokens joined by a space) — the
    * MinHash input unit. A document shorter than k tokens yields its
    * whole token string as the single shingle (standard practice).
    *
    * Deliberately a multiset (no array_distinct): array_distinct is
    * O(n²) per row — measured as the dominant dedup cost at sf0.1 —
    * while MinHash (min over elements) and set-Jaccard via
    * array_intersect/array_union are both multiset-insensitive. */
  def shingles(text: Column, k: Int): Column = shinglesFromTokens(tokens(text), k)

  /** Shingles from an already-materialized token-array column.
    * IMPORTANT: pass a real column (withColumn), not the tokens(…)
    * expression — an outer expression referenced inside a higher-order
    * lambda is re-evaluated once per array element, so inline tokens()
    * would re-run its regexes ~n_positions times per row (measured 50 s
    * for 5 000 docs at sf0.1; materialized: sub-second). */
  def shinglesFromTokens(toks: Column, k: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(k)))),
      s => length(s) > 0)

  /** Character n-grams of the normalized text (multiset — consumers
    * needing set semantics dedupe at the postings level, where the
    * shuffle's partial aggregation does it in O(n)). */
  def charNgrams(text: Column, n: Int): Column =
    charNgramsFromNormalized(normalized(text), n)

  /** n-grams from an already-materialized normalized-text column (same
    * per-element re-evaluation caveat as [[shinglesFromTokens]]). */
  def charNgramsFromNormalized(t: Column, n: Int): Column =
    filter(
      transform(sequence(lit(0), greatest(length(t) - n, lit(0))),
        i => t.substr(i + lit(1), lit(n))),
      s => length(s) === n)
}
