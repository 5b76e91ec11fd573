package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._

/** V2 catalog functions for the TIME partition transforms (`days`,
  * `months`, `hours` — [[PartitionSpecs]]), the piece that lets a
  * partitioned write's required distribution and ordering be expressed
  * over the TRANSFORM VALUE instead of the raw source column.
  *
  * Why that matters: `Distributions.clustered(col("ts"))` hashes the
  * raw timestamp, so two rows of the SAME hour partition land in
  * different write tasks and the epoch writes (tasks × partitions)
  * files — the exact file explosion the clustered contract exists to
  * prevent; it only looked fine under AQE because coalescing collapsed
  * small exchanges to one task. Clustering on `hours(ts)` (resolved
  * against this function catalog by Spark's own
  * `DistributionAndOrderingUtils`) keys the exchange on the partition
  * value itself: ~one file per touched partition at ANY task count,
  * and the matching sort order makes each task's dirs contiguous so
  * the stage writer holds one open parquet writer at a time.
  *
  * Each function returns a LONG ordinal that is equal exactly when
  * [[PartitionSpecs.rowDirFn]] routes to the same directory (epoch
  * day / month index / epoch hour — cheaper to hash and sort than the
  * dir string, same equivalence classes). The `bucket` function lives
  * in [[LogBucketFunction]] (shared with storage-partitioned joins). */
object PartitionTransformFns {

  private val MicrosPerDay = 86400000000L
  private val MicrosPerHour = 3600000000L

  private def monthIndex(epochDay: Long): Long = {
    val ld = java.time.LocalDate.ofEpochDay(epochDay)
    ld.getYear * 12L + (ld.getMonthValue - 1)
  }

  private abstract class TimeBound(fnName: String, in: DataType)
      extends ScalarFunction[java.lang.Long] {
    override def inputTypes(): Array[DataType] = Array(in)
    override def resultType(): DataType = LongType
    override def name(): String = fnName
    override def canonicalName(): String = s"graft.$fnName.${in.typeName}"
    override def isDeterministic: Boolean = true
    override def isResultNullable: Boolean = true
  }

  private def timeFn(fnName: String)(
      ofDate: Option[Int => Long], ofMicros: Long => Long): UnboundFunction =
    new UnboundFunction {
      override def name(): String = fnName
      override def description(): String =
        s"$fnName(ts): the partition transform's $fnName ordinal"
      override def bind(inputType: StructType): BoundFunction = {
        require(inputType.fields.length == 1,
          s"$fnName takes one argument, got $inputType")
        inputType.fields(0).dataType match {
          case DateType if ofDate.isDefined => new TimeBound(fnName, DateType) {
            override def produceResult(input: InternalRow): java.lang.Long =
              if (input.isNullAt(0)) null else ofDate.get(input.getInt(0))
          }
          case dt @ (TimestampType | TimestampNTZType) => new TimeBound(fnName, dt) {
            override def produceResult(input: InternalRow): java.lang.Long =
              if (input.isNullAt(0)) null else ofMicros(input.getLong(0))
          }
          case other => throw new UnsupportedOperationException(
            s"$fnName over $other is not a supported partition transform")
        }
      }
    }

  /** days: DATE → epoch day; TIMESTAMP[_NTZ] → floorDiv(micros, day). */
  val Days: UnboundFunction = timeFn("days")(
    Some(d => d.toLong), m => Math.floorDiv(m, MicrosPerDay))

  /** months: the (year, month) ordinal of the covering day. */
  val Months: UnboundFunction = timeFn("months")(
    Some(d => monthIndex(d.toLong)),
    m => monthIndex(Math.floorDiv(m, MicrosPerDay)))

  /** hours: TIMESTAMP[_NTZ] → floorDiv(micros, hour); DATE is rejected
    * at BIND time, like the transform parser does. */
  val Hours: UnboundFunction = timeFn("hours")(
    None, m => Math.floorDiv(m, MicrosPerHour))

  /** The functions [[graft.sources.LogCatalog]] serves, by name. */
  val byName: Map[String, UnboundFunction] =
    Map("days" -> Days, "months" -> Months, "hours" -> Hours)
}
