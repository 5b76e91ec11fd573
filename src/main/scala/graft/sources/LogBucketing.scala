package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Bucketed layout for the entity log → STORAGE-PARTITIONED JOINS.
  *
  * The reference's warehouse gets co-located joins from colocated
  * MergeTree tables; on Spark the equivalent is DSv2 key-grouped
  * partitioning: a log written bucketed on a key reports
  * `KeyGroupedPartitioning(bucket(n, key))`, and a join of two logs
  * bucketed the same way runs WITHOUT a shuffle exchange on either side
  * (`spark.sql.sources.v2.bucketing.enabled`) — at 100 TB that deletes
  * the single most expensive stage of a fact-to-fact join, and a
  * `GROUP BY key` over one bucketed log aggregates exchange-free for
  * the same reason.
  *
  * Layout contract:
  *   - `.bucketspec` in the log directory pins `{col, n}` — one spec
  *     per log, create-exclusive, conflicting re-declarations rejected;
  *   - every BUCKETED segment carries its bucket ordinal in its stats
  *     manifest entry ([[SegmentStats.bucket]]) and in its name
  *     (`...-b<k>`); the writer computes each ROW's bucket itself, so
  *     correctness never depends on how the incoming query was
  *     partitioned (a pre-clustered write just lands one file per task);
  *   - the scan claims key-grouped partitioning only when the spec
  *     exists AND every live segment is bucket-tagged; one foreign or
  *     pre-spec segment downgrades the scan to unknown partitioning —
  *     joins fall back to shuffling, never to wrong co-location.
  *
  * The bucket function is `pmod(murmur3(key, seed=42), n)` — exactly
  * Spark's own `hash()` ([[GraftShims.murmur3]]), so `repartition(n,
  * col)` pre-clusters writes perfectly (partition index == bucket), and
  * the catalog-registered [[LogBucketFunction]] lets Spark re-derive
  * the same value when a storage-partitioned plan needs it. */
object LogBucketing {

  case class Spec(col: String, n: Int)

  /** Columns a log can bucket on: the string key columns. (amount would
    * need long hashing; the entity's join identity is user_id.) */
  private val Bucketable = Set("user_id", "sha256sum")

  def bucketOf(key: UTF8String, n: Int): Int =
    math.floorMod(GraftShims.murmur3(key), n)

  private def specPath(dir: Path) = new Path(dir, ".bucketspec")

  def readSpec(dir: String): Option[Spec] = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    val p = specPath(new Path(dir))
    val fs = p.getFileSystem(FsConf.get)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    Some(Serialization.read[Spec](
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Pin the log's bucket spec. Idempotent for an identical spec;
    * a DIFFERENT spec on an already-bucketed log is rejected (two
    * layouts in one directory would poison co-location). */
  def writeSpec(dir: String, spec: Spec): Unit = {
    import org.json4s.jackson.Serialization
    implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
    require(Bucketable.contains(spec.col),
      s"log tables bucket on ${Bucketable.mkString("/")}, not ${spec.col}")
    require(spec.n > 0, s"bucket count must be positive: ${spec.n}")
    readSpec(dir) match {
      case Some(existing) =>
        require(existing == spec,
          s"log at $dir is already bucketed as $existing; cannot re-bucket as $spec")
      case None =>
        val p = specPath(new Path(dir))
        val fs = p.getFileSystem(FsConf.get)
        fs.mkdirs(p.getParent)
        val out = try fs.create(p, false) catch {
          case _: java.io.IOException if fs.exists(p) =>
            // concurrent declare: the winner's spec must match ours
            val cur = readSpec(dir)
            require(cur.contains(spec),
              s"concurrent bucket declaration mismatch at $dir: $cur vs $spec")
            return
        }
        try out.write(Serialization.write(spec)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
    }
  }

  /** Parse the writer option `bucketBy=col:n`. */
  private[sources] def parseOption(v: String): Spec = v.split(":", 2) match {
    case Array(c, n) if n.toIntOption.exists(_ > 0) => Spec(c, n.toInt)
    case _ => throw new IllegalArgumentException(
      s"bucketBy expects 'col:n', got '$v'")
  }

  /** Pre-cluster + bucketed append into a catalog log table: one
    * shuffle on the key (`repartition(n, col)` — partition index equals
    * bucket by construction), one segment per bucket. Every co-located
    * join against any same-spec log afterwards is shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, col: String, n: Int): Unit = {
    df.repartition(n, org.apache.spark.sql.functions.col(col))
      .writeTo(table).option("bucketBy", s"$col:$n").append()
  }
}

/** The catalog-scoped `bucket(n, key)` function — what lets Spark bind
  * a log scan's reported `bucket` transform to real, evaluable
  * semantics (storage-partitioned join compatibility checks compare
  * bound canonical names; partially-clustered plans may also evaluate
  * it). Same bits as the write path: murmur3(seed 42) pmod n. */
object LogBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, key): pmod(murmur3(key, 42), n) — the log layout's bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields(0).dataType == IntegerType,
      s"bucket(n int, key), got $inputType")
    inputType.fields(1).dataType match {
      case StringType => Bound
      // the TYPED partition-spec keys (p36): each hashes with its OWN
      // Spark type, bit-identical to functions.hash(col) — the same
      // contract PartitionSpecs.rowDirFn writes with, which is what
      // makes clustering a partitioned write on THIS function route
      // ~one file per touched bucket dir
      case dt @ (ByteType | ShortType | IntegerType | LongType | DateType) =>
        new BoundTyped(dt)
      case other => throw new IllegalArgumentException(
        s"bucket key type $other is not bucketable (string/integral/date)")
    }
  }

  /** Null keys produce null (isResultNullable): clustering and sorting
    * then group every null-key row together — the write-side analogue
    * of [[PartitionSpecs.rowDirFn]] routing them to the per-type
    * all-null domain dir. Reading the primitive slot of a null input
    * would silently hash the zero value into bucket-of-0 instead. */
  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer =
      if (input.isNullAt(1)) null
      else LogBucketing.bucketOf(input.getUTF8String(1), input.getInt(0))
  }

  class BoundTyped(dt: DataType) extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, dt)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = s"graft.bucket.${dt.typeName}"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true
    override def produceResult(input: InternalRow): Integer = {
      if (input.isNullAt(1)) return null
      val v: Any = dt match {
        case ByteType => input.getByte(1)
        case ShortType => input.getShort(1)
        case IntegerType | DateType => input.getInt(1)
        case LongType => input.getLong(1)
        case _ => throw new IllegalStateException("unreachable")
      }
      math.floorMod(
        org.apache.spark.sql.GraftShims.murmur3Typed(v, dt), input.getInt(0))
    }
  }
}
