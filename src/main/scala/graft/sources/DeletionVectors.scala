package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.roaringbitmap.RoaringBitmap

/** POSITIONAL DELETION VECTORS — the 100 TB form of the merge-on-read
  * delete state (VERDICT r13 #1; the Delta DV / Iceberg puffin shape).
  *
  * A key-based delete mask (`key IN (…)` per file, [[DeleteMasks]])
  * carries O(matched keys) ledger-payload bytes and requires every
  * masked (file, key) to be FULLY hidden; past
  * `spark.graft.merge.mor.maxMaskKeys` (or under mixed same-key
  * visibility) the MERGE used to downgrade to the rewrite regime — on
  * a high-churn 100 TB upsert table that cap is exceeded permanently
  * and every trickle MERGE rewrites its touched files forever. A
  * positional DV instead records the ROW POSITIONS of the hidden rows
  * of one immutable data file as a compressed bitmap SIDECAR
  * (`<table>/_dv/dv-….bin`, RoaringBitmap — the library Spark itself
  * bundles), referenced from the ledger payload by a mask entry of the
  * existing grammar:
  *
  *   `{"op":"dv","sidecar":"dv-<opId>-<n>.bin","card":<hidden rows>}`
  *
  * DeleteMasks.scala:18 already states the equivalence ("a predicate
  * pinned to a specific file is EXACTLY equivalent to a row-position
  * bitmap"); this IS that bitmap, for the deltas a predicate cannot
  * carry. Because a DV entry is just another mask STRING in the
  * payload's per-file list, the whole mask lifecycle composes
  * unchanged: carry-forward restricted to surviving names, stacked
  * entries OR at read, rewrites purge what they consume, time travel
  * serves the pinned payload's entries, MaskGuard detects drift, and
  * [[MaskPressure]] counts DV entries against the pressure cap.
  *
  * Row position = the row's 0-based ordinal within its data file as
  * written (what Spark's parquet readers serve as
  * `_metadata.row_index`, correct under predicate pushdown and
  * row-group skipping). Payload cost: O(deleted rows) BITS in a
  * sidecar, O(1) ledger bytes per (file, DV).
  *
  * Readers resolve the sidecar against the table's `_dv/` directory
  * and cache the decoded bitmap per (path, length) — sidecars are
  * immutable once published; a vacuum that drops the last referencing
  * version deletes them ([[ParquetVersions.vacuum]]). */
object DeletionVectors {

  /** Sidecar directory under the table root (next to the ledger and
    * stats manifests — NOT under data/, so data-file walks never see
    * it). */
  val DIR = "_dv"

  /** Write-side budget for one DML's collected bitmaps: past this the
    * command falls back to the rewrite regime (the driver gathers one
    * serialized bitmap per touched file — O(deleted rows) bits, and
    * this caps the constant). */
  val MAX_BYTES_KEY = "spark.graft.merge.mor.dv.maxBytes"
  val MAX_BYTES_DEFAULT: Long = 64L << 20

  /** Opt-out: `false` restores the pre-DV ladder (mask regime or
    * rewrite regime only). */
  val ENABLED_KEY = "spark.graft.merge.mor.dv.enabled"

  final case class DvRef(sidecar: String, card: Long)

  // --- the mask-grammar entry -------------------------------------

  import org.json4s._
  import org.json4s.jackson.JsonMethods
  private implicit val fmt: Formats = DefaultFormats

  /** Cheap pre-test so hot paths never JSON-parse predicate entries
    * twice: every serialized DV entry starts with this prefix (our own
    * compact rendering is deterministic). */
  private val PREFIX = "{\"op\":\"dv\""

  def isDv(maskJson: String): Boolean = maskJson.startsWith(PREFIX)

  def refJson(sidecar: String, card: Long): String = {
    import org.json4s.JsonDSL._
    JsonMethods.compact(JsonMethods.render(
      ("op" -> "dv") ~ ("sidecar" -> sidecar) ~ ("card" -> card)))
  }

  def parse(maskJson: String): Option[DvRef] =
    if (!isDv(maskJson)) None
    else {
      val j = JsonMethods.parse(maskJson)
      Some(DvRef((j \ "sidecar").extract[String], (j \ "card").extract[Long]))
    }

  /** Split a file's mask list into (DV refs, predicate JSONs). */
  def split(preds: Seq[String]): (Seq[DvRef], Seq[String]) = {
    val (dv, pred) = preds.partition(isDv)
    (dv.flatMap(parse), pred)
  }

  def anyDv(preds: Seq[String]): Boolean = preds.exists(isDv)

  // --- sidecar IO ----------------------------------------------------

  private val MAGIC = Array[Byte]('G', 'D', 'V', '1')

  def sidecarPath(tableDir: String, name: String): Path =
    new Path(new Path(tableDir, DIR), name)

  def serialize(bm: RoaringBitmap): Array[Byte] = {
    bm.runOptimize()
    val out = new java.io.ByteArrayOutputStream(bm.serializedSizeInBytes() + 4)
    out.write(MAGIC)
    bm.serialize(new java.io.DataOutputStream(out))
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): RoaringBitmap = {
    require(bytes.length > 4 && bytes(0) == 'G' && bytes(1) == 'D' &&
      bytes(2) == 'V' && bytes(3) == '1', "not a GDV1 deletion vector")
    val bm = new RoaringBitmap()
    bm.deserialize(java.nio.ByteBuffer.wrap(bytes, 4, bytes.length - 4))
    bm
  }

  /** Publish-side write (driver): the sidecar must exist before the
    * ledger commit references it. */
  def write(fs: FileSystem, tableDir: String, name: String,
      bm: RoaringBitmap): Unit = {
    val p = sidecarPath(tableDir, name)
    fs.mkdirs(p.getParent)
    val out = fs.create(p, true)
    try out.write(serialize(bm)) finally out.close()
  }

  def delete(fs: FileSystem, tableDir: String, name: String): Unit = {
    try fs.delete(sidecarPath(tableDir, name), false)
    catch { case scala.util.control.NonFatal(_) => () }
    ()
  }

  /** Deterministic sidecar name for (operation, data file): task
    * retries and speculative duplicates rewrite the SAME name with
    * identical bytes instead of leaking extra sidecars. The data-file
    * digest keys by its data/-relative path, unique within a table. */
  def sidecarName(opId: String, rel: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-1")
    val hex = md.digest(rel.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    s"dv-$opId-$hex.bin"
  }

  /** Aggregator: row positions of one data file → one serialized GDV1
    * bitmap. Bitmaps build and merge executor-side (the driver never
    * sees raw positions — O(touched files) result rows, not O(deleted
    * rows)); the buffer java-serializes only at partial/final
    * boundaries (RoaringBitmap is Externalizable). Positions outside
    * [0, 2^31) are SKIPPED, not clamped — the writer checks
    * `max(pos)` alongside and discards the whole DV batch when any
    * file overflows the 32-bit domain (falls back to the rewrite
    * regime), so a skipped add can never publish. */
  final class BitmapAgg
      extends org.apache.spark.sql.expressions.Aggregator[Long, RoaringBitmap, Array[Byte]] {
    override def zero: RoaringBitmap = new RoaringBitmap()
    override def reduce(b: RoaringBitmap, pos: Long): RoaringBitmap = {
      if (pos >= 0L && pos <= Int.MaxValue.toLong) b.add(pos.toInt)
      b
    }
    override def merge(a: RoaringBitmap, b: RoaringBitmap): RoaringBitmap = {
      a.or(b); a
    }
    override def finish(b: RoaringBitmap): Array[Byte] = serialize(b)
    override def bufferEncoder: org.apache.spark.sql.Encoder[RoaringBitmap] =
      org.apache.spark.sql.Encoders.javaSerialization[RoaringBitmap]
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  // --- read-side cache ----------------------------------------------

  /** Decoded-bitmap cache, executor-side (and driver-side for
    * maintenance reads): sidecars are immutable once published, so
    * (qualified path, file length) identifies content; entries are
    * soft-referenced so memory pressure can always reclaim them. */
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.lang.ref.SoftReference[RoaringBitmap]]

  /** One conf per JVM for sidecar loads — load() runs executor-side
    * inside partition readers, where a bare `new Configuration()`
    * drops every spark.hadoop.* setting (credentials on s3a/abfs;
    * ADVICE r14). Derived from the running SparkEnv's SparkConf. */
  @transient private lazy val loadConf =
    org.apache.spark.sql.GraftShims.hadoopConf()

  def load(tableDir: String, name: String): RoaringBitmap = {
    val p = sidecarPath(tableDir, name)
    val fs = p.getFileSystem(loadConf)
    val st = fs.getFileStatus(p)
    val key = fs.makeQualified(p).toString + "#" + st.getLen
    val hit = cache.get(key)
    val cached = if (hit == null) null else hit.get()
    if (cached != null) return cached
    val in = fs.open(st.getPath)
    val bytes = new Array[Byte](st.getLen.toInt)
    try in.readFully(0, bytes) finally in.close()
    val bm = deserialize(bytes)
    cache.put(key, new java.lang.ref.SoftReference(bm))
    bm
  }

  /** A row-DELETED test over the DV entries of one file: true when the
    * row's position is in ANY of the bitmaps (stacked DVs OR, same
    * composition as stacked predicates). Bitmaps load lazily ONCE per
    * instance (per partition reader / compiled filter). */
  final class PositionDeleted(tableDir: String, refs: Seq[DvRef])
      extends Serializable {
    @transient private lazy val bitmaps: Array[RoaringBitmap] =
      refs.map(r => load(tableDir, r.sidecar)).toArray
    def deleted(pos: Long): Boolean = {
      require(pos >= 0 && pos <= Int.MaxValue,
        s"row position $pos outside the DV domain (file over 2^31 rows?)")
      val p = pos.toInt
      var i = 0
      while (i < bitmaps.length) {
        if (bitmaps(i).contains(p)) return true
        i += 1
      }
      false
    }
  }

  /** `position ∈ (any DV bitmap)` as a Catalyst expression, for the
    * DataFrame-level maintenance reads ([[DeleteMasks.readVisible]],
    * ChangeFeed deltas). Eval-only with codegen fallback — these paths
    * are rewrite/CDC reads, never the hot scan (which tests membership
    * directly in its row reader). NULL position (shouldn't happen on a
    * file-sourced row) is NOT deleted, matching the predicate rule. */
  case class DvContainsExpr(tableDir: String, refs: Seq[DvRef],
      child: org.apache.spark.sql.catalyst.expressions.Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    import org.apache.spark.sql.types.{BooleanType, DataType}
    override def dataType: DataType = BooleanType
    override def nullable: Boolean = false
    @transient private lazy val pd = new PositionDeleted(tableDir, refs)
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) false else pd.deleted(v.asInstanceOf[Long])
    }
    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression)
        : org.apache.spark.sql.catalyst.expressions.Expression =
      copy(child = newChild)
    override def prettyName: String = "dv_contains"
  }
}
