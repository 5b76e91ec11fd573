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
  * The `_fbloom/` shard store carries an 8 KiB Bloom filter per (file,
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
  * memory during a build holds 8 KiB × NEW files × columns (coverage
  * of already-indexed files is judged from names alone,
  * [[parseCoverage]]); entries persist as per-build SHARDS
  * ([[SidecarShards]] — an incremental build appends, never rewrites,
  * the manifest), and planning reads back only the pass-1 survivors'
  * payloads when the query actually carries a bloom-judgeable
  * conjunct. */
object ParquetBloom {

  private val SIDECAR_KIND = "_fbloom"

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

  /** One shard's entries, restricted to `keep` names — planning
    * retains 8 KiB payloads only for the files it actually probes. */
  private def parseEntries(text: String, keep: String => Boolean)
      : Map[String, (Long, Long, Map[String, String])] = try {
    JsonMethods.parse(text) match {
      case JObject(files) => files.iterator.collect {
        case (name, o: JObject) if keep(name) =>
          val blooms = (o \ "b") match {
            case JObject(bs) => bs.toMap.collect { case (c, JString(b64)) => c -> b64 }
            case _ => Map.empty[String, String]
          }
          name -> (((o \ "len").extract[Long], (o \ "mt").extract[Long], blooms))
      }.toMap
      case _ => Map.empty
    }
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** [[parseEntries]] without the filter payloads — [[build]]'s
    * coverage probe needs (len, mtime, column names) only, so an
    * incremental build over a huge table never holds every 8 KiB
    * filter in driver memory just to decide what is already covered. */
  private def parseCoverage(text: String)
      : Map[String, (Long, Long, Set[String])] = try {
    JsonMethods.parse(text) match {
      case JObject(files) => files.iterator.collect {
        case (name, o: JObject) =>
          val cols = (o \ "b") match {
            case JObject(bs) => bs.iterator.map(_._1).toSet
            case _ => Set.empty[String]
          }
          name -> (((o \ "len").extract[Long], (o \ "mt").extract[Long], cols))
      }.toMap
      case _ => Map.empty
    }
  } catch { case scala.util.control.NonFatal(_) => Map.empty }

  private def renderEntries(
      entries: Map[String, (Long, Long, Map[String, String])]): String = {
    val json: JObject = JObject(entries.toList.sortBy(_._1).map {
      case (name, (len, mt, blooms)) =>
        name -> (("len" -> len) ~ ("mt" -> mt) ~
          ("b" -> JObject(blooms.toList.sortBy(_._1).map {
            case (c, b64) => c -> JString(b64)
          })))
    })
    JsonMethods.compact(JsonMethods.render(json))
  }

  /** rel name → (len, mtime, col → base64 bloom): union of every
    * RELEVANT shard (legacy single file included), later shards
    * winning name collisions. `candidates` bounds both retention and
    * I/O — bucketed fold shards holding none of the candidate names
    * are never read, so a point probe on a million-file table parses
    * kilobytes of bloom payloads, not gigabytes. Empty on absence or
    * parse trouble — the sidecar is an accelerator, never the truth. */
  def readSidecar(conf: Configuration, dataDir: Path,
      candidates: Option[Set[String]] = None)
      : Map[String, (Long, Long, Map[String, String])] = {
    val keep: String => Boolean = n => candidates.forall(_.contains(n))
    SidecarShards.readAll(conf, dataDir, SIDECAR_KIND, candidates)
      .foldLeft(Map.empty[String, (Long, Long, Map[String, String])]) {
        case (acc, (_, text)) => acc ++ parseEntries(text, keep)
      }
  }

  /** Fold the shards to one member once past the threshold, dropping
    * entries that no longer validate against `liveNow`. */
  def maybeFold(conf: Configuration, dataDir: Path,
      liveNow: => Map[String, (Long, Long)]): Unit = {
    if (SidecarShards.memberCount(conf, dataDir, SIDECAR_KIND) <
      SidecarShards.foldThreshold) return
    val live = liveNow
    val members = SidecarShards.readAll(conf, dataDir, SIDECAR_KIND)
    val merged = members
      .foldLeft(Map.empty[String, (Long, Long, Map[String, String])]) {
        case (acc, (_, text)) => acc ++ parseEntries(text, live.contains)
      }.filter { case (name, (len, mt, _)) => live.get(name).contains((len, mt)) }
    // 256 entries × 8 KiB payloads ≈ 2 MB per bucket shard
    SidecarShards.fold(conf, dataDir, SIDECAR_KIND,
      SidecarShards.bucketed(merged, SidecarShards.perBucket(256), renderEntries),
      members.map(_._1))
  }

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
    // coverage probe WITHOUT the 8 KiB payloads: an incremental build
    // over a huge table decides what to skip from (len, mtime, column
    // names) alone
    val existing = SidecarShards.readAll(conf, dataDir, SIDECAR_KIND)
      .foldLeft(Map.empty[String, (Long, Long, Set[String])]) {
        case (acc, (_, text)) => acc ++ parseCoverage(text)
      }
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
    // APPEND one shard carrying only THIS build's files — untouched
    // files' entries stay in their existing shards (no whole-manifest
    // rewrite, so an incremental build writes O(new files), and a
    // concurrent planner's learned-stats shard is never clobbered).
    // A todo file with a still-valid entry for OTHER columns merges
    // those in (the union is per-ENTRY, later shard wins wholesale).
    val todoSet = todo.map(_._1).toSet
    val existingPayloads = readSidecar(conf, dataDir, Some(todoSet))
    val todoEntries: Map[String, (Long, Long, Map[String, String])] =
      todo.map { case (rel, len, mt) =>
        val keep = existingPayloads.get(rel) match {
          case Some((l, m, bs)) if l == len && m == mt => bs
          case _ => Map.empty[String, String]
        }
        // an all-null / empty file builds no partial: record an EMPTY
        // bloom (excludes everything) rather than leaving it uncovered
        val blank: Map[String, String] =
          cols.map(c => c.toLowerCase -> SegmentBloom.empty().toBase64).toMap
        rel -> ((len, mt, blank ++ keep ++ fresh.getOrElse(rel, Map.empty)))
      }.toMap
    if (todoEntries.nonEmpty)
      SidecarShards.append(conf, dataDir, SIDECAR_KIND, renderEntries(todoEntries))
    // fold validates against the RAW on-disk walk, not the versioned
    // live set — retired-but-retained files are still listed by pinned
    // readers, whose bloom coverage a fold must not destroy
    maybeFold(conf, dataDir, ParquetVersions.walkData(fs, dataDir)
      .map { case (rel, st) => rel -> ((st.getLen, st.getModificationTime)) }
      .toMap)
    val bytes = SidecarShards.totalBytes(conf, dataDir, SIDECAR_KIND)
    (todo.size.toLong, live.size.toLong, bytes)
  }
}

/** Decides, per file and pushed conjunct, whether the file's blooms
  * PROVE an equality/IN conjunct unsatisfiable. Strictly conservative:
  * no bloom for the column, unknown expression shape, or any
  * non-canonical probe keeps the file. */
object BloomPrune {

  /** Whether `e` contains a shape [[excludes]] could ever judge — the
    * gate deciding if the 8 KiB-per-(file, column) shards are worth
    * reading for this plan at all. Mirrors [[excludes]]' structure:
    * under OR both branches must be judgeable for the bloom to prove
    * anything, under AND either suffices. */
  def relevant(e: Expression): Boolean = e match {
    case And(l, r) => relevant(l) || relevant(r)
    case Or(l, r) => relevant(l) && relevant(r)
    case EqualTo(_: AttributeReference, _: Literal) => true
    case EqualTo(_: Literal, _: AttributeReference) => true
    case EqualNullSafe(_: AttributeReference, _: Literal) => true
    case EqualNullSafe(_: Literal, _: AttributeReference) => true
    case In(_: AttributeReference, members) =>
      members.forall(_.isInstanceOf[Literal])
    case InSet(_: AttributeReference, _) => true
    case _ => false
  }

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
