package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQ8 expressions behind the quantized IVF index
  * ([[QuantizeVecExpr]]/[[QuantizedCosineExpr]]): round-trip error
  * bounds, degenerate vectors, the identical-codes keystone the v13
  * oracle rests on, and interpreted ≡ codegen. */
class QuantizedVecSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.Sessions.base("local[4]", 4)

  private def quantDf(vecs: Seq[Array[Float]]) = {
    import spark.implicits._
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "embedding")
      .withColumn("vmin", array_min(col("embedding")).cast("float"))
      .withColumn("vscale",
        ((array_max(col("embedding")) - array_min(col("embedding"))) / 255.0)
          .cast("float"))
      .withColumn("q8",
        QuantizeVecExpr(col("embedding"), col("vmin"), col("vscale")))
  }

  test("round trip: every component reconstructs within half a quantization step") {
    val rnd = new scala.util.Random(42)
    val vecs = Seq.fill(50)(Array.fill(32)(rnd.nextFloat() * 10f - 5f))
    quantDf(vecs).select(col("embedding"), col("q8"), col("vmin"), col("vscale"))
      .collect().foreach { r =>
        val x = r.getSeq[Float](0)
        val codes = r.getAs[Array[Byte]](1)
        val vmin = r.getFloat(2)
        val vscale = r.getFloat(3)
        assert(codes.length === x.length)
        x.indices.foreach { i =>
          val back = vmin + vscale * (codes(i) & 0xFF)
          assert(math.abs(back - x(i)) <= vscale / 2 + 1e-4,
            s"component $i: ${x(i)} -> $back (step $vscale)")
        }
      }
  }

  test("extremes clamp to 0/255; a constant vector takes all-zero codes") {
    val vecs = Seq(
      Array(-5f, 0f, 5f), // min, mid, max
      Array(3f, 3f, 3f)) // constant: vscale 0
    val rows = quantDf(vecs).orderBy("id")
      .select(col("q8"), col("vscale")).collect()
    val spread = rows(0).getAs[Array[Byte]](0).map(_ & 0xFF)
    assert(spread(0) === 0 && spread(2) === 255, spread.mkString(","))
    val const = rows(1)
    assert(const.getFloat(1) === 0.0f)
    assert(const.getAs[Array[Byte]](0).forall(_ === 0))
  }

  test("identical vectors quantize to identical codes — the planted-copy keystone") {
    val v = Array.tabulate(16)(d => 0.05f + 0.1f * d)
    val rows = quantDf(Seq(v, v.clone())).select(col("q8")).collect()
    assert(java.util.Arrays.equals(rows(0).getAs[Array[Byte]](0),
      rows(1).getAs[Array[Byte]](0)))
  }

  test("quantized cosine: codegen (DataFrame) matches the interpreted helper; " +
      "copies score ~1 and beat unrelated vectors") {
    val rnd = new scala.util.Random(7)
    val base = Array.fill(24)(rnd.nextFloat() * 2f - 1f)
    val other = Array.fill(24)(rnd.nextFloat() * 2f - 1f)
    val df = quantDf(Seq(base, other))
      .withColumn("qe", typedLit(base))
      .withColumn("qcos",
        QuantizedCosineExpr(col("q8"), col("vmin"), col("vscale"), col("qe")))
    val got = df.orderBy("id")
      .select(col("qcos"), col("q8"), col("vmin"), col("vscale")).collect()
    // codegen == interpreted, bit-exact
    got.foreach { r =>
      val interp = QuantizedVec.cosine(r.getAs[Array[Byte]](1), r.getFloat(2),
        r.getFloat(3), org.apache.spark.sql.catalyst.util.ArrayData
          .toArrayData(base))
      assert(r.getDouble(0) === interp)
    }
    // a copy's quantized score is ~1 and above any unrelated vector's
    assert(got(0).getDouble(0) > 0.999, s"copy scored ${got(0).getDouble(0)}")
    assert(got(0).getDouble(0) > got(1).getDouble(0))
    // constant-vector degenerate: vscale 0 dequantizes to the constant,
    // cosine stays defined
    val const = quantDf(Seq(Array(2f, 2f, 2f)))
      .withColumn("qe", typedLit(Array(1f, 1f, 1f)))
      .withColumn("qcos",
        QuantizedCosineExpr(col("q8"), col("vmin"), col("vscale"), col("qe")))
      .select("qcos").head.getDouble(0)
    assert(math.abs(const - 1.0) < 1e-9) // same direction
  }
}
