package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** BLOOM SKIP INDEX for the parquet tier — the columnar twin of the
  * log tier's [[SegmentBloom]] sidecar (the ClickHouse `bloom_filter`
  * skip-index shape; the reference's primary verification probe is a
  * point lookup on a uniformly-distributed hash, `hashes_test.go:
  * 191-203`, which min/max ranges can never prune).
  *
  * A `[min, max]` zone map prunes nothing for a high-cardinality,
  * non-clustered key: every file's range spans the whole value space.
  * The `.fbloom` sidecar carries an 8 KiB Bloom filter per (file,
  * column) for OPERATOR-CONFIGURED probe columns; a definite miss
  * skips the whole file at PLANNING time ([[StatsPrunedFileIndex]]
  * consults it alongside the `.fstats` bounds), a false positive
  * merely schedules one extra file — correctness never depends on the
  * filter.
  *
  * Build is an explicit, DISTRIBUTED maintenance verb —
  * `CALL graft.system.build_bloom(table => 'lake.t',
  * columns => 'sha256sum')` — not a write-path hook: filters are
  * built executor-side (one pass over each uncovered file, partial
  * blooms union-reduced), the driver collects only the finished 8 KiB
  * filters, and re-running the CALL is INCREMENTAL — files whose
  * (length, mtime) entry already covers every requested column are
  * skipped, so steady-state maintenance touches only new appends.
  * Entries of vanished files drop on rewrite; a rewritten file's
  * stale entry fails its (length, mtime) check and simply never
  * prunes until the next build.
  *
  * 100 TB posture: the scan is one distributed pass over the
  * UNCOVERED files only; shuffle traffic is one 8 KiB partial per
  * (file, column) per executor — independent of row count. Driver
  * memory holds 8 KiB × files × columns (80 MB per column at 10k
  * files); the sidecar is one JSON object read once per plan, same
  * lifecycle as `.fstats`. */
object ParquetBloom {

  private def sidecarPath(dataDir: Path): Path =
    new Path(dataDir.getParent, ".fbloom")

  /** Bloom-indexable columns: strings and integrals — the types whose
    * probe-time literal and build-time value canonicalize identically.
    * (Floats, decimals, timestamps decline: equality probes on them
    * are rare and canonicalization is trap-laden.) */
  private[sources] def canonType(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private[sources] def canon(dt: DataType, v: Any): Option[String] = dt match {
    case StringType => Some(v.toString) // UTF8String and String agree
    case ByteType | ShortType | IntegerType | LongType =>
      Some(v.asInstanceOf[Number].longValue.toString)
    case _ => None
  }

  // --- sidecar ------------------------------------------------------

  import org.json4s._
  import org.json4s.JsonDSL._
  import org.json4s.jackson.JsonMethods
  private implicit val jsonFmt: Formats = DefaultFormats

  /** rel name → (len, mtime, col → base64 bloom). Empty on absence or
    * parse trouble — the sidecar is an accelerator, never the truth. */
  def readSidecar(conf: Configuration,
      dataDir: Path): Map[String, (Long, Long, Map[String, String])] = try {
    val p = sidecarPath(dataDir)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return Map.empty
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    JsonMethods.parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)) match {
      case JObject(files) => files.toMap.collect {
        case (name, o: JObject) =>
          val blooms = (o \ "b") match {
            case JObject(bs) => bs.toMap.collect { case (c, JString(b64)) => c -> b64 }
            case _ => Map.empty[String, String]
          }
          name -> (((o \ "len").extract[Long], (o \ "mt").extract[Long], blooms))
      }
      case _ => Map.empty
    }
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  def writeSidecar(conf: Configuration, dataDir: Path,
      entries: Map[String, (Long, Long, Map[String, String])]): Unit = try {
    val p = sidecarPath(dataDir)
    val fs = p.getFileSystem(conf)
    val json: JObject = JObject(entries.toList.sortBy(_._1).map {
      case (name, (len, mt, blooms)) =>
        name -> (("len" -> len) ~ ("mt" -> mt) ~
          ("b" -> JObject(blooms.toList.sortBy(_._1).map {
            case (c, b64) => c -> JString(b64)
          })))
    })
    val tmp = new Path(p.getParent,
      s".fbloom.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p)) fs.delete(tmp, false)
    ()
  } catch { case scala.util.control.NonFatal(_) => () } // best-effort cache

  // --- build --------------------------------------------------------

  /** Build (incrementally) the bloom sidecar for `columns` of the
    * catalog parquet table at `tableDir`. Returns
    * (files indexed this call, files covered total, bytes written). */
  def build(spark: SparkSession, tableDir: String,
      columns: Seq[String]): (Long, Long, Long) = {
    require(SchemaManifest.exists(tableDir),
      s"$tableDir has no _schema.json — not a catalog parquet table " +
        "(the entity log builds its blooms at commit time)")
    val declared = SchemaManifest.read(tableDir, "build_bloom")
    val cols = columns.map(_.trim).filter(_.nonEmpty)
    require(cols.nonEmpty, "build_bloom needs at least one column")
    val fields = cols.map { c =>
      val f = declared.fields.find(_.name.equalsIgnoreCase(c)).getOrElse(
        throw new IllegalArgumentException(
          s"build_bloom: no column '$c' in ${declared.fieldNames.mkString(", ")}"))
      require(canonType(f.dataType),
        s"build_bloom: column '$c' is ${f.dataType.simpleString} — bloom " +
          "probes index string and integral columns only")
      f
    }
    val dataDir = new Path(tableDir, "data")
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val fs = dataDir.getFileSystem(conf)
    // live membership: the versioned set when a ledger exists, the raw
    // committed listing otherwise — same dispatch as the scans
    val live: Seq[(String, Long, Long)] = {
      val statuses = ParquetVersions.walkData(fs, dataDir)
      val names: Option[Set[String]] =
        if (ParquetVersions.enabled(tableDir)) Some(ParquetVersions.live(tableDir).toSet)
        else None
      statuses.collect {
        case (rel, st) if names.forall(_.contains(rel)) =>
          (rel, st.getLen, st.getModificationTime)
      }
    }
    val existing = readSidecar(conf, dataDir)
    def covered(rel: String, len: Long, mt: Long): Boolean =
      existing.get(rel).exists { case (l, m, bs) =>
        l == len && m == mt && cols.forall(c => bs.contains(c.toLowerCase))
      }
    val todo = live.filterNot { case (r, l, m) => covered(r, l, m) }
    val fresh: Map[String, Map[String, String]] =
      if (todo.isEmpty) Map.empty
      else {
        val dataPrefix = fs.makeQualified(dataDir).toUri.getPath
        val converters: Seq[Any => Option[String]] =
          fields.map(f => (v: Any) => canon(f.dataType, v))
        val lowered = cols.map(_.toLowerCase)
        // rename-aware read: old-vintage files decode under their own
        // name vector; `_gfilefull` keys each row to its file
        val df = Renames.read(spark, declared, dataDir, todo.map(_._1))
          .select((col("_gfilefull") +: fields.map(f => col(f.name))): _*)
        val nCols = fields.length
        df.rdd.mapPartitions { it =>
          val acc = scala.collection.mutable.Map[(String, Int), Array[Long]]()
          it.foreach { r =>
            if (!r.isNullAt(0)) {
              val p = new java.net.URI(r.getString(0)).getPath
              val rel = if (p.startsWith(dataPrefix + "/"))
                p.substring(dataPrefix.length + 1) else p
              var i = 0
              while (i < nCols) {
                if (!r.isNullAt(i + 1)) converters(i)(r.get(i + 1)).foreach { s =>
                  val bits = acc.getOrElseUpdate((rel, i),
                    SegmentBloom.empty().bits)
                  new SegmentBloom(bits).add(s)
                }
                i += 1
              }
            }
          }
          acc.iterator.map { case ((rel, i), bits) => ((rel, i), bits) }
        }.reduceByKey { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        }.collect().groupBy(_._1._1).map { case (rel, parts) =>
          rel -> parts.map { case ((_, i), bits) =>
            lowered(i) -> new SegmentBloom(bits).toBase64
          }.toMap
        }
      }
    // merge: keep valid entries of live files (their existing columns
    // too), fold in the fresh blooms, drop vanished files
    val liveMap = live.map(e => e._1 -> ((e._2, e._3))).toMap
    val todoSet = todo.map(_._1).toSet
    val merged: Map[String, (Long, Long, Map[String, String])] =
      liveMap.map { case (rel, (len, mt)) =>
        val keep = existing.get(rel) match {
          case Some((l, m, bs)) if l == len && m == mt => bs
          case _ => Map.empty[String, String]
        }
        // an all-null / empty file builds no partial: record an EMPTY
        // bloom (excludes everything) rather than leaving it uncovered
        val built = fresh.getOrElse(rel, Map.empty)
        val blank: Map[String, String] =
          if (todoSet(rel))
            cols.map(c => c.toLowerCase -> SegmentBloom.empty().toBase64).toMap
          else Map.empty
        rel -> ((len, mt, blank ++ keep ++ built))
      }
    writeSidecar(conf, dataDir, merged)
    val bytes = try fs.getFileStatus(sidecarPath(dataDir)).getLen
      catch { case _: java.io.FileNotFoundException => 0L }
    (todo.size.toLong, merged.size.toLong, bytes)
  }
}

/** Decides, per file and pushed conjunct, whether the file's blooms
  * PROVE an equality/IN conjunct unsatisfiable. Strictly conservative:
  * no bloom for the column, unknown expression shape, or any
  * non-canonical probe keeps the file. */
object BloomPrune {

  /** True only when NO row of the file can satisfy `e`, judged on the
    * file's (col → base64 bloom) map. */
  def excludes(blooms: Map[String, String], e: Expression): Boolean = e match {
    case And(l, r) => excludes(blooms, l) || excludes(blooms, r)
    case Or(l, r) => excludes(blooms, l) && excludes(blooms, r)
    case EqualTo(a: AttributeReference, l: Literal) => miss(blooms, a, l)
    case EqualTo(l: Literal, a: AttributeReference) => miss(blooms, a, l)
    case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
      miss(blooms, a, l)
    case EqualNullSafe(l: Literal, a: AttributeReference) if l.value != null =>
      miss(blooms, a, l)
    case In(a: AttributeReference, members)
        if members.forall(_.isInstanceOf[Literal]) =>
      val nonNull = members.collect { case l: Literal if l.value != null => l }
      nonNull.nonEmpty && nonNull.forall(l => miss(blooms, a, l))
    case InSet(a: AttributeReference, hset) =>
      val nonNull = hset.asInstanceOf[Set[Any]].filter(_ != null)
      nonNull.nonEmpty && nonNull.forall(v =>
        miss(blooms, a, Literal.create(v, a.dataType)))
    case _ => false
  }

  private def miss(blooms: Map[String, String], a: AttributeReference,
      l: Literal): Boolean = {
    if (l.value == null) return true // x = NULL is TRUE for no row
    blooms.get(a.name.toLowerCase) match {
      case Some(b64) => ParquetBloom.canon(l.dataType, l.value) match {
        case Some(s) => !SegmentBloom.fromBase64(b64).mightContain(s)
        case None => false
      }
      case None => false
    }
  }
}
