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

  /** Dot product via higher-order functions — kept for mixed element
    * types (float vector × double hyperplane literals). For the
    * float×float hot path use [[DotExpr]] (native codegen loop, same
    * numerics, no intermediate arrays). */
  def dot(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)))

  /** Euclidean norm of a float vector (native loop). */
  def norm(a: Column): Column = sqrt(DotExpr(a, a))

  /** Cosine similarity of float vectors (NaN-safe: 0 when either norm
    * is 0). Bit-identical to the fold form — see [[DotExpr]]. */
  def cosine(a: Column, b: Column): Column = {
    val d = DotExpr(a, b)
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
      when(PlaneDotExpr(vec, plane.toArray) >= 0.0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
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

  /** Mean Euclidean distance of each sample vector to its nearest
    * centroid — the quantizer-fit statistic behind the IVF index's
    * DRIFT gauge ([[graft.operators.IvfIndex.drift]]): computed over
    * the build sample at build time (the baseline) and over an
    * equally-bounded current sample later; the ratio of the two says
    * how far the corpus has walked away from the quantizer. */
  def meanNearestDist(sample: Array[Array[Float]],
      centroids: Array[Array[Double]]): Double = {
    require(sample.nonEmpty && centroids.nonEmpty)
    var sum = 0.0
    sample.foreach { v =>
      var best = Double.MaxValue
      var c = 0
      while (c < centroids.length) {
        var d = 0.0; var i = 0
        while (i < v.length) { val t = v(i) - centroids(c)(i); d += t * t; i += 1 }
        if (d < best) best = d
        c += 1
      }
      sum += math.sqrt(best)
    }
    sum / sample.length
  }

  /** Lloyd's k-means over a driver-held sample — the IVF coarse
    * quantizer. At 100 TB the sample (thousands of vectors) still fits
    * the driver; the resulting centroids ship to executors as plan
    * literals. Deterministic: init = first k sample points, fixed
    * iteration count. */
  def kmeans(sample: Array[Array[Float]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample.head.length
    var centroids = sample.take(k).map(_.map(_.toDouble))
    for (_ <- 0 until iters) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Long](centroids.length)
      sample.foreach { v =>
        val c = nearestIdx(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  private def nearestIdx(v: Array[Float], cs: Array[Array[Double]]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** The nProbe nearest centroid cells of a vector, as a column
    * expression: per-centroid squared distances (fold arithmetic),
    * packed into (dist, idx) structs, array_sort, take nProbe indices.
    * Data rows use nProbe=1 (their cell); queries probe several. */
  def nearestCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val structs = centroids.zipWithIndex.map { case (cent, i) =>
      // ||v - c||² = v·v - 2 v·c + c·c ; v·v and the native plane dot
      // keep the whole distance computation in primitive loops
      val cc = cent.map(x => x * x).sum
      val d2 = DotExpr(vec, vec) - lit(2.0) * PlaneDotExpr(vec, cent) + lit(cc)
      struct(d2.as("dist"), lit(i).as("idx"))
    }
    transform(slice(array_sort(array(structs: _*)), 1, nProbe), s => s.getField("idx"))
  }
}
