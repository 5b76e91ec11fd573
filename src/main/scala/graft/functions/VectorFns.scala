package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector math over ArrayType(FloatType) embedding columns, as pure
  * column expressions (zip_with / aggregate higher-order functions) —
  * codegen-friendly, per-row, no UDFs.
  *
  * Reductions fold left-to-right in double, which both Spark and DuckDB
  * (`list_reduce`) execute identically — see q28's oracle parity note.
  */
object VectorFns {

  /** Sequential-fold sum of a double-array column. */
  private def foldSum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two float-vector columns, in double. */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (NaN-safe: 0 when either norm is 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  /** Random-hyperplane sign sketch: nBits hyperplanes drawn from a
    * seeded RNG (deterministic literals baked into the plan), bucket =
    * the packed sign bits. Vectors with high cosine land in the same
    * bucket with probability (1 - θ/π)^nBits — the LSH primitive for
    * cosine candidate generation at scale. */
  def signBucket(vec: Column, nBits: Int, dim: Int, seed: Long = 7L): Column = {
    val rnd = new scala.util.Random(seed)
    val planes: Seq[Seq[Double]] =
      Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = typedlit(plane)
      when(dot(vec, planeCol) >= 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** Multi-table sign LSH: L independent sketch tables (different seeded
    * hyperplanes). A query probes all L buckets — the standard
    * recall/cost dial: P(candidate found) = 1-(1-p^nBits)^L. Returns an
    * array of L bucket ids with the table index folded in, ready to
    * posexplode into (table, bucket) join keys. */
  def signBuckets(vec: Column, nBits: Int, tables: Int, dim: Int): Column =
    array((0 until tables).map { t =>
      signBucket(vec, nBits, dim, seed = 7L + t) + lit(t.toLong << 48)
    }: _*)
}
