package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hash families for sketch-based dedup (MinHash, SimHash) built on
  * Spark's codegen'd `xxhash64` — no UDFs.
  *
  * MinHash uses one strong base hash per shingle plus a family of
  * universal-hash permutations h_i(x) = (a_i·x + b_i) mod p, the standard
  * construction (Broder '97): computing 64 permutations of one 64-bit
  * base hash is far cheaper than 64 independent string hashes, and the
  * whole signature is per-row compute inside the scan stage.
  */
object HashFns {

  /** Mersenne prime 2^31 - 1: modulus for the universal hash family.
    * 31-bit so that a·h stays well inside a 64-bit long — Spark 4 runs
    * ANSI mode and hard-errors on long overflow, which rules out the
    * 2^61-prime construction without 128-bit math. */
  val P: Long = 2147483647L

  /** Deterministic (a_i, b_i) pairs, a_i ∈ [1, P), b_i ∈ [0, P). */
  def hashFamily(n: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((math.abs(rnd.nextLong()) % (P - 1) + 1, math.abs(rnd.nextLong()) % P))
  }

  /** Base hash of every element of a string array column, reduced into
    * the field [0, P). MinHash-only: the mod-P reduction exists for the
    * universal-hash family below — anything that consumes individual
    * BITS (SimHash) must use [[rawHashes]] instead. */
  def baseHashes(arr: Column): Column =
    transform(arr, s => pmod(xxhash64(s), lit(P)))

  /** Raw full-width xxhash64 of every element — the SimHash input.
    * Feeding the mod-P [[baseHashes]] to a 64-bit SimHash zeroes input
    * bits 31–63, making the upper LSH bands a constant bucket for every
    * document (a full-corpus degenerate bucket at scale). */
  def rawHashes(arr: Column): Column =
    transform(arr, s => xxhash64(s))

  /** MinHash signature from an already-materialized base-hash array
    * column: sig[i] = min over elements of ((a_i·h + b_i) mod P); every
    * intermediate < 2^62, no overflow under ANSI. Routed through the
    * native one-pass [[SketchExprs.minhashSig]] — the HOF form below is
    * n independent array_min(transform(...)) branches, i.e. n passes and
    * n transient arrays per row (UdxSpec asserts the two agree). */
  def minhashFromBases(bases: Column, n: Int, seed: Long = 42L): Column =
    SketchExprs.minhashSig(bases, n, seed)

  /** Reference HOF formulation of [[minhashFromBases]] (spec cross-check
    * for the native expression; do not use in hot paths). */
  def minhashFromBasesHof(bases: Column, n: Int, seed: Long = 42L): Column =
    array(hashFamily(n, seed).map { case (a, b) =>
      array_min(transform(bases, h => pmod(h * lit(a) + lit(b), lit(P))))
    }: _*)

  /** Convenience one-shot form (recomputes hashes n times — prefer
    * materializing [[baseHashes]] + [[minhashFromBases]] in hot paths). */
  def minhashSignature(arr: Column, n: Int, seed: Long = 42L): Column =
    minhashFromBases(baseHashes(arr), n, seed)

  /** LSH band hashes: split a signature into `bands` equal bands and
    * hash each band; docs sharing any (band index, band hash) are
    * candidate pairs. Returns an array of band hashes. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      xxhash64(concat_ws(",",
        transform(slice(sig, j * rowsPerBand + 1, rowsPerBand), x => x.cast(StringType))))
    }: _*)

  /** SimHash (64-bit) of a token-array column, computed per-row: for
    * each bit, sum +1/-1 weighted by whether the token hash has that bit
    * set, then take signs. Stays in codegen via nested higher-order
    * functions; no explode/shuffle. */
  def simhash(tokenArr: Column): Column = simhashFromHashes(baseHashes(tokenArr))

  /** SimHash from a materialized hash-array column. Routed through the
    * native one-pass [[SketchExprs.simhash]]; the 64-aggregate HOF form
    * below is kept as the spec cross-check. */
  def simhashFromHashes(hashes: Column): Column = SketchExprs.simhash(hashes)

  /** Reference HOF formulation of [[simhashFromHashes]] (spec cross-check
    * only — its 64-fold expression tree is JIT-hostile). */
  def simhashFromHashesHof(hashes: Column): Column = {
    val bitCols = (0 until 64).map { b =>
      val votes = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bitCols.reduce(_.bitwiseOR(_)).as("simhash")
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast(IntegerType)
}
