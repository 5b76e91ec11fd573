package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 lesson: a query that crashes before writing output silently
  * VANISHED from the correctness artifact (the driver diffs keys) and its
  * elapsed-to-crash was recorded as a bench "speedup". Pins the two
  * hardening layers: Verify leaves an `_ERROR` marker dir, and Bench's
  * summary line reports never-succeeding queries under "errs"/"errors"
  * instead of a fabricated wall time. */
class ArtifactHardeningSpec extends AnyFunSuite {

  private lazy val spark = Sessions.base()

  test("Verify.dumpOne writes an _ERROR marker dir when the query throws") {
    val out = Files.createTempDirectory("verify-err").toString
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("deliberate test crash")
    assert(!Verify.dumpOne(spark, "/nonexistent", out, "x99_boom", boom))
    val marker = Paths.get(out, "x99_boom", "_ERROR")
    assert(Files.exists(marker))
    assert(Files.readString(marker).contains("deliberate test crash"))
    // no parquet output left behind — the compare must see err, not empty
    assert(!Files.list(Paths.get(out, "x99_boom")).iterator().asScala()
      .exists(_.toString.endsWith(".parquet")))
  }

  test("Verify.dumpOne replaces partial output with the marker") {
    val out = Files.createTempDirectory("verify-partial").toString
    val d = Paths.get(out, "x98_partial")
    Files.createDirectories(d)
    Files.writeString(d.resolve("part-0000.parquet"), "stale partial bytes")
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("late crash")
    assert(!Verify.dumpOne(spark, "/nonexistent", out, "x98_partial", boom))
    assert(Files.exists(d.resolve("_ERROR")))
    assert(!Files.exists(d.resolve("part-0000.parquet")),
      "stale partial parquet must not survive — it would compare as truncated data")
  }

  test("Verify.dumpOne succeeds normally and leaves no marker") {
    val out = Files.createTempDirectory("verify-ok").toString
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("id")
    assert(Verify.dumpOne(spark, "/nonexistent", out, "x97_ok", ok))
    assert(!Files.exists(Paths.get(out, "x97_ok", "_ERROR")))
    assert(spark.read.parquet(s"$out/x97_ok").count() === 3)
  }

  test("Bench.summaryLine reports crashed queries as errs, not times") {
    val line = Bench.summaryLine(
      Seq("q01_agg" -> Some(1.25), "s20_stream" -> None, "s21_sink" -> None),
      "sf0.1", 7.0)
    assert(line.contains(""""q01":1.250"""))
    assert(line.contains(""""errors":2"""))
    assert(line.contains(""""errs":["s20","s21"]"""))
    assert(!line.contains("s20\":"), "a crashed query must not carry a time")
    // total sums only genuine times
    assert(line.contains(""""value":1.250"""))
  }

  test("Bench.summaryLine with no errors keeps the compact shape") {
    val line = Bench.summaryLine(Seq("q01_agg" -> Some(0.5)), "sf0.1", 5.0)
    assert(line.contains(""""errors":0"""))
    assert(!line.contains("errs"))
  }

  private implicit class IterScala[T](it: java.util.Iterator[T]) {
    def asScala(): Iterator[T] = new Iterator[T] {
      def hasNext = it.hasNext; def next() = it.next()
    }
  }
}
