package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{streaming => sread}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Change data feed between two snapshots of a versioned table — the
  * Delta CDF / Iceberg changelog shape, derived entirely from the
  * version ledger's SEGMENT diffs (and, on the parquet tier, its
  * DELETE-MASK diffs), never from row comparisons over the full table:
  *
  *   - a segment present in `to` but not `from` contributes its rows as
  *     `insert`s; present in `from` but not `to`, as `delete`s. Since
  *     every writer (append, compaction, DELETE, UPDATE, MERGE) commits
  *     whole segments, the diff is exact at segment granularity, and
  *     segments common to both versions — the overwhelming majority on
  *     a 100 TB table — are never read at all.
  *   - a MERGE-ON-READ delete ([[DeleteMasks]]) changes no names, only
  *     a file's mask set: the feed emits exactly the newly-masked rows
  *     as `delete`s (row filter: visible under the old masks AND
  *     deleted under the new), reading only the files whose masks
  *     changed. Mask-shrinking commits (rollback) mirror as `insert`s.
  *
  * Two output modes:
  *
  *   - **changelog** (`net = false`): one block per intermediate
  *     commit, tagged `_change_type` ∈ {insert, delete} and
  *     `_commit_version`. Served by the SAME partition-per-diff-file
  *     readers the streaming feed uses — the whole span is ONE scan
  *     node whose partition list grows with the diff, so a span of
  *     hundreds of versions plans in constant analysis time
  *     (VERDICT r10 #4; the old shape unioned one DataFrame pair per
  *     commit, O(versions) plan nodes).
  *   - **net** (`net = true`): the endpoint-to-endpoint row diff.
  *     Segment names common to both endpoints (with unchanged masks)
  *     cancel for free; carried-over rows inside rewritten segments are
  *     cancelled row-level with a multiset EXCEPT ALL between just the
  *     two diff row pools — mask-delta rows join the pools directly
  *     (they are exact deltas by construction).
  *
  * Both modes only need the ledger's payloads, so they work on any
  * span inside the vacuum retention window; a vacuumed segment fails
  * loudly through the pinned-read checks rather than under-reporting. */
object ChangeFeed {

  val CHANGE_TYPE_COL = "_change_type"
  val COMMIT_VERSION_COL = "_commit_version"

  /** Change feed of a LOG table directory between ledger ordinals
    * `fromVersion` (exclusive) and `toVersion` (inclusive). */
  def logChanges(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, net: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"change span is [from, to] with from <= to; got ($fromVersion, $toVersion)")
    def membership(v: Long): Seq[String] =
      LogVersions.get(dir, v).getOrElse(throw new IllegalArgumentException(
        s"version $v does not exist for $dir"))
    membership(fromVersion); membership(toVersion) // validate the span ends
    if (!net) {
      // bounded plan: ONE scan whose partitions are the span's diff
      // segments — the same shape the streaming changelog reader plans
      return spark.read.format(LimitHashLog.FORMAT)
        .option("changeFeed", "true")
        .option("fromVersion", fromVersion)
        .option("toVersion", toVersion)
        .load(dir)
    }
    val read = (names: Seq[String], pinned: Long) => spark.read
      .format(LimitHashLog.FORMAT)
      .option("versionAsOf", pinned)
      .option("segments", names.mkString(","))
      .load(dir)
    val emptyBlock = spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), LimitHashLog.SCHEMA)
      .withColumn(CHANGE_TYPE_COL, lit(""))
      .withColumn(COMMIT_VERSION_COL, lit(0L))
      .limit(0)
    val fromNames = membership(fromVersion).toSet
    val toNames = membership(toVersion).toSet
    val added = (toNames -- fromNames).toSeq.sorted
    val removed = (fromNames -- toNames).toSeq.sorted
    // the pinned reads apply their own version's masks automatically
    // (the scan's pinned state carries them), so added rows are visible
    // under the TO masks and removed rows under the FROM masks
    def block(names: Seq[String], pinned: Long, kind: String) =
      read(names, pinned)
        .withColumn(CHANGE_TYPE_COL, lit(kind))
        .withColumn(COMMIT_VERSION_COL, lit(toVersion))
    // MASK DELTAS on segments common to both endpoints (merge-on-read
    // log DELETEs change masks, not names): newly-masked rows — visible
    // under the FROM masks, deleted under the TO masks — net as
    // deletes; mask rollbacks mirror as inserts
    def masksOf(v: Long): Map[String, Seq[String]] =
      VersionLedger.getPayload(dir, v).map(_.masks).getOrElse(Map.empty)
    val fromMasks = masksOf(fromVersion)
    val toMasks = masksOf(toVersion)
    val maskChanged = (fromNames intersect toNames).toSeq.sorted.filter { n =>
      fromMasks.getOrElse(n, Seq.empty).toSet !=
        toMasks.getOrElse(n, Seq.empty).toSet
    }
    def deltaBlock(kind: String): Seq[DataFrame] = maskChanged.flatMap { n =>
      val (pinned, opposite) =
        if (kind == "delete") (fromVersion, toMasks.getOrElse(n, Seq.empty))
        else (toVersion, fromMasks.getOrElse(n, Seq.empty))
      if (opposite.isEmpty) None
      else {
        // DV entries in the opposite mask set test the row's line
        // ordinal (`_lpos`, projected off again below); predicate
        // entries evaluate on the data columns as before
        val dataCols = LimitHashLog.SCHEMA.fieldNames.toSeq.map(col)
        val base = read(Seq(n), pinned)
        val deltaed =
          if (!graft.sources.DeletionVectors.anyDv(opposite))
            base.filter(!DeleteMasks.visibleColumn(LimitHashLog.SCHEMA, opposite))
          else base
            .select(dataCols :+ col(LimitHashLog.LPOS_COL): _*)
            .filter(!DeleteMasks.visibleAllColumnAt(dir, LimitHashLog.SCHEMA,
              opposite, Seq(LimitHashLog.LPOS_COL)))
            .select(dataCols: _*)
        Some(deltaed
          .withColumn(CHANGE_TYPE_COL, lit(kind))
          .withColumn(COMMIT_VERSION_COL, lit(toVersion)))
      }
    }
    val ins = (Option.when(added.nonEmpty)(block(added, toVersion, "insert")).toSeq ++
      deltaBlock("insert")).reduceOption(_ unionByName _).getOrElse(emptyBlock)
    val del = (Option.when(removed.nonEmpty)(block(removed, fromVersion, "delete")).toSeq ++
      deltaBlock("delete")).reduceOption(_ unionByName _).getOrElse(emptyBlock)
    netOf(ins, del, LimitHashLog.SCHEMA.fieldNames.toSeq, toVersion)
  }

  /** Change feed of a catalog PARQUET table directory (same contract,
    * plus delete-mask diffs). */
  def parquetChanges(spark: SparkSession, dir: String, fromVersion: Long,
      toVersion: Long, net: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"change span is [from, to] with from <= to; got ($fromVersion, $toVersion)")
    require(SchemaManifest.exists(dir),
      s"$dir has no _schema.json — not a catalog parquet table")
    def payload(v: Long): VersionLedger.Payload =
      VersionLedger.getPayload(dir, v).getOrElse(
        throw new IllegalArgumentException(s"version $v does not exist for $dir"))
    payload(fromVersion); payload(toVersion) // validate the span ends
    if (!net) {
      // bounded plan: one scan, partition-per-diff-file (incl. the
      // mask-delta row filters), identical to the streaming readers
      return spark.read.format("graft.sources.ParquetChanges")
        .option("path", dir)
        .option("fromVersion", fromVersion)
        .option("toVersion", toVersion)
        .load()
    }
    val schema = SchemaManifest.read(dir, "change feed")
    val data = new Path(dir, "data")
    val fromP = payload(fromVersion)
    val toP = payload(toVersion)
    val fromNames = fromP.names.toSet
    val toNames = toP.names.toSet
    def tag(df: DataFrame, kind: String) = df
      .withColumn(CHANGE_TYPE_COL, lit(kind))
      .withColumn(COMMIT_VERSION_COL, lit(toVersion))
    // pools: endpoint-visible rows of name-diff files + exact mask-delta
    // rows of common files; EXCEPT ALL then cancels copy-on-write
    // carry-over between the pools
    val insParts = Seq.newBuilder[DataFrame]
    val delParts = Seq.newBuilder[DataFrame]
    val added = (toNames -- fromNames).toSeq.sorted
    val removed = (fromNames -- toNames).toSeq.sorted
    if (added.nonEmpty)
      insParts += DeleteMasks.readVisible(spark, schema, data, added, toP.masks)
    if (removed.nonEmpty)
      delParts += DeleteMasks.readVisible(spark, schema, data, removed, fromP.masks)
    // mask-delta files read in at most TWO scans regardless of how
    // many DISTINCT mask sets the span carries: the per-file dispatch
    // ([[DeleteMasks.FileDispatchVisible]]) binds each row to ITS
    // file's old/new mask lists — the former per-(old,new)-pair
    // grouping planned one scan per distinct pair, which after a
    // trickle MERGE (every file its own key mask) meant one scan per
    // FILE. DV entries test the `_gpos` column Renames.read
    // materializes (rename-aware; `_metadata` does not survive its
    // aliasing projection).
    val common = (fromNames intersect toNames).toSeq.sorted
    val delta = common.filter { n =>
      fromP.masks.getOrElse(n, Seq.empty).sorted !=
        toP.masks.getOrElse(n, Seq.empty).sorted
    }
    if (delta.nonEmpty) {
      val dataPrefix = data.getFileSystem(
        spark.sparkContext.hadoopConfiguration)
        .makeQualified(data).toUri.getPath
      def proj(df: DataFrame) =
        df.select(schema.fieldNames.toSeq.map(col): _*)
      def visDispatch(masks: Map[String, Seq[String]], ns: Seq[String]) = {
        val children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gfilefull")) +:
            org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq("_gpos")) +:
            schema.fieldNames.toSeq.map(n =>
              org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(n)))
        org.apache.spark.sql.GraftShims.column(
          DeleteMasks.FileDispatchVisible(dir, dataPrefix,
            masks.view.filterKeys(ns.toSet).toMap, schema, children))
      }
      // newly-DELETED rows: visible under the old masks, hidden under
      // the new — only files whose NEW list grew can contribute
      val delFiles = delta.filter { n =>
        val o = fromP.masks.getOrElse(n, Seq.empty)
        toP.masks.getOrElse(n, Seq.empty).exists(!o.contains(_))
      }
      if (delFiles.nonEmpty) {
        val df = Renames.read(spark, schema, data, delFiles)
        delParts += proj(df.filter(
          visDispatch(fromP.masks, delFiles) && !visDispatch(toP.masks, delFiles)))
      }
      // un-masked (resurfaced) rows: the reverse direction
      val insFiles = delta.filter { n =>
        val nw = toP.masks.getOrElse(n, Seq.empty)
        fromP.masks.getOrElse(n, Seq.empty).exists(!nw.contains(_))
      }
      if (insFiles.nonEmpty) {
        val df = Renames.read(spark, schema, data, insFiles)
        insParts += proj(df.filter(
          visDispatch(toP.masks, insFiles) && !visDispatch(fromP.masks, insFiles)))
      }
    }
    val emptyDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
    val ins = tag(insParts.result().reduceOption(_ unionByName _).getOrElse(emptyDf),
      "insert")
    val del = tag(delParts.result().reduceOption(_ unionByName _).getOrElse(emptyDf),
      "delete")
    netOf(ins, del, schema.fieldNames.toSeq, toVersion)
  }

  /** Multiset-cancel the two pools: `ins ∖∖ del` as inserts and the
    * reverse as deletes — exactly `snapshot(to) EXCEPT ALL
    * snapshot(from)`, computed without scanning either snapshot.
    *
    * ONE signed-count aggregate, not two `exceptAll`s (r20, guide
    * §2.3/§2.4): Spark rewrites each `exceptAll` into its own
    * union → count-aggregate → replicate subtree, and the two subtrees
    * differ in tag sign and child order, so nothing is reused — both
    * pools were scanned AND shuffled twice for what is one multiset
    * subtraction. Here the pools are scanned once, tagged ±1, and one
    * hash aggregate per distinct row yields both directions: net > 0 →
    * that many `insert`s, net < 0 → that many `delete`s — the same
    * arithmetic `RewriteExceptAll` plans, done once. Row multiplicity
    * is restored by Spark's own [[ReplicateRows]] generator (streams N
    * copies; never materializes an N-element array). Plan: 2 Exchange
    * (+2 pool-scan subtrees) → 1 Exchange (+1 pool-scan subtree). */
  private def netOf(ins: DataFrame, del: DataFrame, dataCols: Seq[String],
      toVersion: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.ReplicateRows
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Project}
    val spark = ins.sparkSession
    // the _g* temporaries must not collide with a data column —
    // withColumn would silently REPLACE it and corrupt the net
    // computation (ADVICE r20; same reserved-prefix convention as
    // _gfilefull/_gpos)
    Seq("_gsign", "_gnet", "_gcopies").foreach(t =>
      require(!dataCols.contains(t),
        s"column name '$t' is reserved by the change feed's net computation"))
    val netted = ins.select(dataCols.map(col): _*).withColumn("_gsign", lit(1L))
      .unionByName(
        del.select(dataCols.map(col): _*).withColumn("_gsign", lit(-1L)))
      .groupBy(dataCols.map(col): _*)
      .agg(sum(col("_gsign")).as("_gnet"))
      .filter(col("_gnet") =!= 0L)
      .withColumn(CHANGE_TYPE_COL,
        when(col("_gnet") > 0, lit("insert")).otherwise(lit("delete")))
      .withColumn(COMMIT_VERSION_COL, lit(toVersion))
      .withColumn("_gcopies", abs(col("_gnet")))
    val outCols = dataCols :+ CHANGE_TYPE_COL :+ COMMIT_VERSION_COL
    val child = netted.queryExecution.analyzed
    val byName = child.output.map(a => a.name -> a).toMap
    val keep = outCols.map(byName)
    val gen = Generate(
      ReplicateRows(byName("_gcopies") +: keep),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Nil, child = child)
    org.apache.spark.sql.GraftShims.ofRows(spark, Project(keep, gen))
  }

  /** The per-commit changelog blocks of span `(from, to]` on the
    * parquet tier: (name, kind, commit, visiblePreds, deletedPreds) —
    * name-diff blocks plus mask-delta blocks. `visiblePreds`: the row
    * must be VISIBLE under these masks (none evaluates TRUE);
    * `deletedPreds` non-empty: the row must be DELETED under them (at
    * least one TRUE) — the mask-delta filter. Shared by the batch scan
    * and the streaming micro-batch reader, so both plan exactly one
    * partition per changed file per commit. */
  private[sources] def parquetSpanBlocks(tableDir: String, from: Long,
      to: Long): Seq[(String, String, Long, Seq[String], Seq[String])] = {
    def payload(v: Long): VersionLedger.Payload =
      VersionLedger.getPayload(tableDir, v).getOrElse(
        throw new IllegalStateException(
          s"version $v of $tableDir was vacuumed under a running change feed"))
    ((from + 1) to to).flatMap { v =>
      val prevP = payload(v - 1)
      val curP = payload(v)
      val prev = prevP.names.toSet
      val cur = curP.names.toSet
      val added = (cur -- prev).toSeq.sorted.map(n =>
        (n, "insert", v, curP.masks.getOrElse(n, Seq.empty), Seq.empty[String]))
      val removed = (prev -- cur).toSeq.sorted.map(n =>
        (n, "delete", v, prevP.masks.getOrElse(n, Seq.empty), Seq.empty[String]))
      val maskDelta = (cur intersect prev).toSeq.sorted.flatMap { n =>
        val o = prevP.masks.getOrElse(n, Seq.empty)
        val nw = curP.masks.getOrElse(n, Seq.empty)
        if (o.toSet == nw.toSet) Seq.empty
        else {
          val dels = if (nw.exists(!o.contains(_)))
            Seq((n, "delete", v, o, nw)) else Seq.empty
          val inss = if (o.exists(!nw.contains(_)))
            Seq((n, "insert", v, nw, o)) else Seq.empty
          dels ++ inss
        }
      }
      added ++ removed ++ maskDelta
    }
  }

  /** A table's streaming changelog schema: its data columns plus the
    * two change-feed tags. */
  def streamSchemaOf(dataSchema: StructType): StructType = StructType(
    dataSchema.fields ++ Seq(
      StructField(CHANGE_TYPE_COL, StringType, nullable = false),
      StructField(COMMIT_VERSION_COL, LongType, nullable = false)))

  /** The log tier's streaming changelog schema. */
  val LOG_STREAM_SCHEMA: StructType = streamSchemaOf(LimitHashLog.SCHEMA)

  // --- streaming admission control (shared by both tiers) -----------

  /** Flatten a [[sread.ReadLimit]] to (maxFiles, maxBytes) caps — a
    * composite is the min over its parts; allAvailable/minRows and
    * other kinds impose no cap here. */
  private[sources] def limitParts(limit: sread.ReadLimit): (Option[Int], Option[Long]) =
    limit match {
      case m: sread.ReadMaxFiles => (Some(m.maxFiles()), None)
      case b: sread.ReadMaxBytes => (None, Some(b.maxBytes()))
      case c: sread.CompositeReadLimit =>
        val parts = c.getReadLimits.toSeq.map(limitParts)
        (parts.flatMap(_._1).reduceOption(_ min _),
          parts.flatMap(_._2).reduceOption(_ min _))
      case _ => (None, None)
    }

  /** The [[sread.ReadLimit]] a stream advertises for its
    * maxFilesPerTrigger / maxBytesPerTrigger options (both set → both
    * bind). `maxCommitsPerTrigger` has no ReadLimit kind — streams
    * apply it directly inside `latestOffset(start, limit)`. */
  private[sources] def readLimitOf(maxFiles: Option[Int],
      maxBytes: Option[Long]): sread.ReadLimit = {
    val limits = Seq(
      maxFiles.map(n => sread.ReadLimit.maxFiles(n)),
      maxBytes.map(b => sread.ReadLimit.maxBytes(b))).flatten
    limits match {
      case Seq() => sread.ReadLimit.allAvailable()
      case Seq(one) => one
      case many => sread.ReadLimit.compositeLimit(many.toArray)
    }
  }

  /** Admitted END ordinal of a version catch-up span: walk
    * `(from, latest]` admitting WHOLE commits (the commit is the
    * offset unit — a partial commit could not checkpoint) until the
    * commit / file / byte budget is spent, always admitting at least
    * one commit for progress (Spark's own file-source rule).
    * `diffOf(v)` = (diff-file count, diff bytes) of commit v —
    * consulted lazily, so a deep backlog only pays for the commits it
    * admits this trigger. */
  private[sources] def admitSpan(from: Long, latest: Long,
      maxCommits: Option[Int], maxFiles: Option[Int], maxBytes: Option[Long],
      diffOf: Long => (Int, Long)): Long = {
    if (latest <= from) return from
    if (maxCommits.isEmpty && maxFiles.isEmpty && maxBytes.isEmpty) return latest
    var end = from
    var files = 0
    var bytes = 0L
    var done = false
    while (!done && end < latest) {
      val (f, b) = diffOf(end + 1)
      val overF = maxFiles.exists(m => files + f > m)
      val overB = maxBytes.exists(m => bytes + b > m)
      if ((overF || overB) && end > from) done = true
      else {
        end += 1; files += f; bytes += b
        if (maxCommits.exists(c => end - from >= c) ||
            maxFiles.exists(m => files >= m) ||
            maxBytes.exists(m => bytes >= m)) done = true
      }
    }
    end
  }

  /** Admitted PREFIX length of `remaining` (name, size) files under
    * file/byte caps — the snapshot-chunking twin of [[admitSpan]];
    * at least one file always admits. */
  private[sources] def admitPrefix(remaining: Seq[(String, Long)],
      maxFiles: Option[Int], maxBytes: Option[Long]): Int = {
    var n = remaining.length
    maxFiles.foreach(m => n = math.min(n, math.max(1, m)))
    maxBytes.foreach { budget =>
      var tot = 0L
      var k = 0
      while (k < n && (k == 0 || tot + remaining(k)._2 <= budget)) {
        tot += remaining(k)._2; k += 1
      }
      n = k
    }
    n
  }
}

/** Changelog of a versioned log —
  * `spark.readStream.format(LimitHashLog.FORMAT)
  *   .option("changeFeed", "true").load(dir)`:
  * the Delta CDF streaming read. Offsets are LEDGER ORDINALS (not
  * segment sets): each micro-batch emits the per-commit changelog
  * blocks of `(startOrdinal, endOrdinal]` — inserts from segments a
  * commit added, DELETES from segments it removed — so a downstream
  * materialization can apply retractions, which the plain streaming
  * read (inserts only, no visibility into maintenance commits) cannot
  * express. `option("startVersion", n)` seeds a fresh stream at
  * ordinal n (changes SINCE snapshot n); default = the current latest
  * (changes from now on). Checkpoint restarts resume from the
  * committed ordinal; a restart whose next versions were vacuumed
  * fails loudly rather than under-reporting.
  *
  * With `option("fromVersion", a).option("toVersion", b)` the same
  * table serves the BATCH changelog of span `(a, b]` — one scan,
  * partition-per-diff-segment, constant-size plan on any span length. */
class LogChangesTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"limit_hash_log_changes(`$path`)"
  override def schema(): StructType = ChangeFeed.LOG_STREAM_SCHEMA
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability]()
    caps.add(TableCapability.MICRO_BATCH_READ)
    caps.add(TableCapability.BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = ChangeFeed.LOG_STREAM_SCHEMA
        override def toMicroBatchStream(checkpointLocation: String): sread.MicroBatchStream =
          new LogChangesMicroBatchStream(path,
            Option(options.get("startVersion")).map(_.toLong),
            Option(options.get("maxCommitsPerTrigger")).map(_.toInt),
            Option(options.get("maxFilesPerTrigger")).map(_.toInt),
            Option(options.get("maxBytesPerTrigger")).map(_.toLong))
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val from = Option(options.get("fromVersion")).map(_.toLong).getOrElse(
            throw new IllegalArgumentException(
              "batch changelog read needs fromVersion and toVersion"))
          val to = Option(options.get("toVersion")).map(_.toLong).getOrElse(
            throw new IllegalArgumentException(
              "batch changelog read needs fromVersion and toVersion"))
          LogChangesMicroBatchStream.spanPartitions(path, from, to)
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new CdcSegmentReaderFactory()
        override def description(): String = s"LogChangesScan path=$path"
      }
    }
}

/** Offset = the newest ledger ordinal whose changes have been emitted. */
case class LogVersionOffset(ordinal: Long) extends sread.Offset {
  override def json(): String = ordinal.toString
}

/** One changelog block: a segment's rows tagged (changeType, commit).
  * `visiblePreds`: serialized delete masks the row must be VISIBLE
  * under (none evaluates TRUE); `deletedPreds` non-empty: the row must
  * be DELETED under them (at least one TRUE) — the merge-on-read
  * mask-delta filter, same contract as the parquet tier's blocks. */
case class CdcSegmentPartition(file: String, changeType: String, commit: Long,
    visiblePreds: Seq[String] = Seq.empty,
    deletedPreds: Seq[String] = Seq.empty)
    extends InputPartition

object LogChangesMicroBatchStream {
  /** Diff partitions of span `(from, to]` — shared by the streaming
    * reader and the batch changelog scan: name diffs plus MASK DELTAS
    * (a merge-on-read log DELETE changes no names, only a segment's
    * mask set — the feed emits exactly the newly-masked rows as
    * `delete`s; mask-shrinking commits mirror as `insert`s). */
  private[sources] def spanPartitions(path: String, from: Long,
      to: Long): Array[InputPartition] = {
    if (to <= from) return Array.empty
    // qualified path per live NAME; a diff member missing from the
    // listing was vacuumed inside the retention window a reader still
    // needed — fail loudly, never silently under-report changes
    val listed = LimitHashLog.segments(path)
      .map { case (f, _) => (new Path(f).getName, f) }.toMap
    def resolve(n: String): String = listed.getOrElse(n,
      throw new IllegalStateException(
        s"change-feed segment $n is gone from $path — vacuumed inside " +
          "the retention window this stream still needed"))
    def payload(v: Long): VersionLedger.Payload =
      VersionLedger.getPayload(path, v).getOrElse(throw new IllegalStateException(
        s"version $v of $path was vacuumed under a running change feed"))
    ((from + 1) to to).flatMap { v =>
      val prevP = payload(v - 1)
      val curP = payload(v)
      val prev = prevP.names.toSet
      val cur = curP.names.toSet
      val added = (cur -- prev).toSeq.sorted.map(n =>
        CdcSegmentPartition(resolve(n), "insert", v,
          curP.masks.getOrElse(n, Seq.empty)))
      val removed = (prev -- cur).toSeq.sorted.map(n =>
        CdcSegmentPartition(resolve(n), "delete", v,
          prevP.masks.getOrElse(n, Seq.empty)))
      val maskDelta = (cur intersect prev).toSeq.sorted.flatMap { n =>
        val o = prevP.masks.getOrElse(n, Seq.empty)
        val nw = curP.masks.getOrElse(n, Seq.empty)
        if (o.toSet == nw.toSet) Seq.empty
        else {
          // newly masked rows: visible under the OLD masks, deleted
          // under the NEW — exactly the delta this commit deleted
          val dels = if (nw.exists(!o.contains(_)))
            Seq(CdcSegmentPartition(resolve(n), "delete", v, o, nw))
            else Seq.empty
          // mask rollback: deleted before, visible now
          val inss = if (o.exists(!nw.contains(_)))
            Seq(CdcSegmentPartition(resolve(n), "insert", v, nw, o))
            else Seq.empty
          dels ++ inss
        }
      }
      added ++ removed ++ maskDelta
    }.toArray
  }
}

class LogChangesMicroBatchStream(path: String, startVersion: Option[Long],
    maxCommitsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends sread.MicroBatchStream with sread.SupportsAdmissionControl {

  private def requireVersioned(): Unit =
    require(LogVersions.enabled(path),
      s"change feed needs a versioned log — enable versioning on $path first")

  /** Admission control: maxCommitsPerTrigger bounds each micro-batch
    * to that many ledger commits; maxFilesPerTrigger / maxBytesPerTrigger
    * to roughly that many diff segments / bytes — so a stream catching
    * up after downtime drains the backlog in bounded batches instead
    * of one batch spanning every pending commit. Commits admit WHOLE
    * (the ordinal is the offset unit); at least one always admits. */
  override def getDefaultReadLimit: sread.ReadLimit =
    ChangeFeed.readLimitOf(maxFilesPerTrigger, maxBytesPerTrigger)

  override def latestOffset(start: sread.Offset,
      limit: sread.ReadLimit): sread.Offset = {
    requireVersioned()
    val s = start.asInstanceOf[LogVersionOffset].ordinal
    val latest = LogVersions.latest(path).get._1
    val (maxF, maxB) = ChangeFeed.limitParts(limit)
    if (maxF.isEmpty && maxB.isEmpty && maxCommitsPerTrigger.isEmpty)
      return if (latest == s) start else LogVersionOffset(latest)
    // diff cost of one commit: segment-name diffs + mask-delta blocks;
    // sizes come from ONE listing per trigger, taken only under a
    // byte budget
    lazy val sizes: Map[String, Long] = LimitHashLog.segments(path)
      .map { case (f, len) => (new Path(f).getName, len) }.toMap
    def diffOf(v: Long): (Int, Long) = {
      def payload(o: Long): VersionLedger.Payload =
        VersionLedger.getPayload(path, o).getOrElse(
          throw new IllegalStateException(
            s"version $o of $path was vacuumed under a running change feed"))
      val prevP = payload(v - 1)
      val curP = payload(v)
      val prev = prevP.names.toSet
      val cur = curP.names.toSet
      val touched = ((cur -- prev) ++ (prev -- cur) ++
        (cur intersect prev).filter { n =>
          prevP.masks.getOrElse(n, Seq.empty).toSet !=
            curP.masks.getOrElse(n, Seq.empty).toSet
        }).toSeq
      val bytes = if (maxB.isEmpty) 0L
        else touched.map(n => sizes.getOrElse(n, 0L)).sum
      (touched.size, bytes)
    }
    val end = ChangeFeed.admitSpan(s, latest, maxCommitsPerTrigger,
      maxF, maxB, diffOf)
    if (end == s) start else LogVersionOffset(end)
  }

  override def initialOffset(): sread.Offset = {
    requireVersioned()
    startVersion match {
      case Some(v) =>
        require(LogVersions.get(path, v).isDefined,
          s"startVersion $v: no such version in $path (never committed, or vacuumed)")
        LogVersionOffset(v)
      case None => LogVersionOffset(LogVersions.latest(path).get._1)
    }
  }

  override def latestOffset(): sread.Offset = {
    requireVersioned()
    LogVersionOffset(LogVersions.latest(path).get._1)
  }

  override def planInputPartitions(start: sread.Offset,
      end: sread.Offset): Array[InputPartition] =
    LogChangesMicroBatchStream.spanPartitions(path,
      start.asInstanceOf[LogVersionOffset].ordinal,
      end.asInstanceOf[LogVersionOffset].ordinal)

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcSegmentReaderFactory()

  override def deserializeOffset(json: String): sread.Offset =
    LogVersionOffset(json.trim.toLong)

  override def commit(end: sread.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Delegates row parsing to the plain segment reader, appending the
  * constant (change_type, commit_version) tail per block. Mask-aware:
  * rows must be VISIBLE under `visiblePreds` (the masks of the block's
  * own version end), and a mask-DELTA block additionally keeps only
  * rows DELETED under `deletedPreds`. */
class CdcSegmentReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CdcSegmentPartition(f, kind, commit, visiblePreds, deletedPreds) =>
        val tableDir = new Path(f).getParent.toString
        // DV entries in either list need the row's line ordinal — the
        // inner reader widens with the `_lpos` metadata column, tested
        // against the sidecar bitmaps, then projected back off
        val needPos = DeletionVectors.anyDv(visiblePreds) ||
          DeletionVectors.anyDv(deletedPreds)
        val rowSchema =
          if (!needPos) LimitHashLog.SCHEMA
          else org.apache.spark.sql.types.StructType(
            LimitHashLog.SCHEMA.fields :+ org.apache.spark.sql.types.StructField(
              LimitHashLog.LPOS_COL, org.apache.spark.sql.types.LongType,
              nullable = false))
        val inner0 = new LogSegmentReader(f, rowSchema, Array.empty)
        val visible =
          if (visiblePreds.isEmpty) inner0
          else DeleteMasks.filteringReaderFn(inner0,
            DeleteMasks.compiledRowFilterAt(tableDir, rowSchema, visiblePreds,
              LimitHashLog.LPOS_COL))
        val inner =
          if (deletedPreds.isEmpty) visible
          else {
            // keep-if-deleted: the mask-delta rows
            val deleted = DeleteMasks.compiledRowFilterAt(
              tableDir, rowSchema, deletedPreds, LimitHashLog.LPOS_COL)
            new PartitionReader[InternalRow] {
              private var cur: InternalRow = _
              override def next(): Boolean = {
                while (visible.next()) {
                  val r = visible.get()
                  if (deleted(r)) { cur = r; return true }
                }
                false
              }
              override def get(): InternalRow = cur
              override def close(): Unit = visible.close()
            }
          }
        val nData = LimitHashLog.SCHEMA.length
        val tail = new GenericInternalRow(
          Array[Any](UTF8String.fromString(kind), commit))
        val joined = new JoinedRow()
        new PartitionReader[InternalRow] {
          override def next(): Boolean = inner.next()
          override def get(): InternalRow = {
            val r = inner.get()
            // drop the widened position column before the tail join
            val data = if (!needPos) r else {
              val vals = new Array[Any](nData)
              var i = 0
              while (i < nData) {
                vals(i) = r.get(i, LimitHashLog.SCHEMA(i).dataType)
                i += 1
              }
              new GenericInternalRow(vals)
            }
            joined(data, tail)
          }
          override def close(): Unit = inner.close()
        }
    }
}

/** Changelog of a versioned catalog PARQUET table — the parquet tier's
  * [[LogChangesTable]]:
  * `spark.readStream.format("graft.sources.ParquetChanges")
  *   .option("path", tableDir).load()` for the STREAMING feed, or the
  * same format with `fromVersion`/`toVersion` for the BATCH changelog
  * of a span (one scan node, partition-per-diff-file). Rows are decoded
  * by Spark's own parquet reader factory; mask-delta blocks carry their
  * row filters into the reader. */
class ParquetChanges extends org.apache.spark.sql.connector.catalog.TableProvider {
  private def dataSchema(tableDir: String): StructType = {
    require(SchemaManifest.exists(tableDir),
      s"$tableDir has no _schema.json — not a catalog parquet table")
    SchemaManifest.read(tableDir, "streaming changelog")
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeFeed.streamSchemaOf(dataSchema(options.get("path")))

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String]): Table = {
    val dir = properties.get("path")
    new ParquetChangesTable(dir, dataSchema(dir))
  }

  override def supportsExternalMetadata(): Boolean = false
}

class ParquetChangesTable(tableDir: String, dataSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"parquet_changes(`$tableDir`)"
  override def schema(): StructType = ChangeFeed.streamSchemaOf(dataSchema)
  override def capabilities(): java.util.Set[TableCapability] = {
    val caps = new java.util.HashSet[TableCapability]()
    caps.add(TableCapability.MICRO_BATCH_READ)
    caps.add(TableCapability.BATCH_READ)
    caps
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan with Batch {
        override def readSchema(): StructType = schema()
        override def toMicroBatchStream(checkpointLocation: String): sread.MicroBatchStream =
          new ParquetChangesMicroBatchStream(tableDir, dataSchema,
            Option(options.get("startVersion")).map(_.toLong),
            Option(options.get("maxCommitsPerTrigger")).map(_.toInt),
            Option(options.get("maxFilesPerTrigger")).map(_.toInt),
            Option(options.get("maxBytesPerTrigger")).map(_.toLong))
        override def toBatch: Batch = this
        override def planInputPartitions(): Array[InputPartition] = {
          val from = Option(options.get("fromVersion")).map(_.toLong).getOrElse(
            throw new IllegalArgumentException(
              "batch changelog read needs fromVersion and toVersion"))
          val to = Option(options.get("toVersion")).map(_.toLong).getOrElse(
            throw new IllegalArgumentException(
              "batch changelog read needs fromVersion and toVersion"))
          ParquetChangesMicroBatchStream.spanPartitions(tableDir, from, to)
        }
        override def createReaderFactory(): PartitionReaderFactory =
          ParquetChangesMicroBatchStream.rowReaderFactory(tableDir, dataSchema)
        override def description(): String = s"ParquetChangesScan dir=$tableDir"
      }
    }
}

object ParquetChangesMicroBatchStream {

  /** Diff partitions of span `(from, to]`: name diffs plus mask
    * deltas, one partition per (file, block). File statuses come from
    * ONE `listStatus` of the data dir when the diff spans many files
    * (the per-file `getFileStatus` probe was O(diff) namenode RPCs per
    * trigger — VERDICT r10), a single probe otherwise. */
  private[sources] def spanPartitions(tableDir: String, from: Long,
      to: Long): Array[InputPartition] = {
    if (to <= from) return Array.empty
    val blocks = ChangeFeed.parquetSpanBlocks(tableDir, from, to)
    if (blocks.isEmpty) return Array.empty
    val data = new Path(tableDir, "data")
    val fs = data.getFileSystem(FsConf.get)
    val distinct = blocks.map(_._1).distinct
    val statuses: Map[String, org.apache.hadoop.fs.FileStatus] =
      if (distinct.size > 8) {
        // one committed-file walk serves every block — keyed by
        // data/-relative path, because partitioned tables publish
        // names like `mday~…/ins-….parquet` that a flat listing keyed
        // on bare names could never match
        ParquetVersions.walkData(fs, data).toMap
      } else distinct.flatMap { n =>
        try Some(n -> fs.getFileStatus(new Path(data, n)))
        catch { case _: java.io.FileNotFoundException => None }
      }.toMap
    def pf(name: String): org.apache.spark.sql.execution.datasources.PartitionedFile = {
      val st = statuses.getOrElse(name, throw new IllegalStateException(
        s"change-feed file $name is gone from $tableDir — vacuumed inside " +
          "the retention window this stream still needed"))
      org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty, org.apache.spark.paths.SparkPath.fromPath(st.getPath),
        0L, st.getLen, Array.empty, st.getModificationTime, st.getLen,
        Map.empty)
    }
    blocks.map { case (name, kind, commit, vis, del) =>
      CdcParquetPartition(pf(name), kind, commit, vis, del): InputPartition
    }.toArray
  }

  /** ONE genuine parquet reader factory serves every diff file: the
    * per-file work is driven by the PartitionedFile in each partition,
    * and the factory carries only schema + conf — built once per
    * stream/scan over an EMPTY index (a data/ listing here would cost
    * O(files) per micro-batch for nothing). */
  private[sources] def rowReaderFactory(tableDir: String,
      dataSchema: StructType): PartitionReaderFactory = {
    val spark = org.apache.spark.sql.classic.SparkSession.active
    def factoryFor(schema: StructType): PartitionReaderFactory = {
      val index = new org.apache.spark.sql.execution.datasources.InMemoryFileIndex(
        spark, Seq.empty, Map.empty, Some(dataSchema))
      val builder = new org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder(
        spark, index, dataSchema, dataSchema,
        new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
      builder.pruneColumns(schema)
      builder.build().createReaderFactory()
    }
    val widenedSchema = StructType(dataSchema.fields :+
      org.apache.spark.sql.types.StructField(DeleteMasks.POS_COL,
        org.apache.spark.sql.types.LongType))
    new CdcParquetReaderFactory(
      EpochRouted.wrap(spark, dataSchema, dataSchema, factoryFor(dataSchema)),
      EpochRouted.wrap(spark, dataSchema, widenedSchema, factoryFor(widenedSchema)),
      dataSchema, widenedSchema, tableDir)
  }
}

class ParquetChangesMicroBatchStream(tableDir: String, dataSchema: StructType,
    startVersion: Option[Long],
    maxCommitsPerTrigger: Option[Int] = None,
    maxFilesPerTrigger: Option[Int] = None,
    maxBytesPerTrigger: Option[Long] = None)
    extends sread.MicroBatchStream with sread.SupportsAdmissionControl {

  private def requireVersioned(): Unit =
    require(ParquetVersions.enabled(tableDir),
      s"change feed needs a versioned table — enable versioning on $tableDir first")

  /** Admission control — the parquet tier's twin of
    * [[LogChangesMicroBatchStream]]'s: commit / file / byte budgets
    * bound every micro-batch; a catch-up after downtime drains in
    * bounded units. */
  override def getDefaultReadLimit: sread.ReadLimit =
    ChangeFeed.readLimitOf(maxFilesPerTrigger, maxBytesPerTrigger)

  override def latestOffset(start: sread.Offset,
      limit: sread.ReadLimit): sread.Offset = {
    requireVersioned()
    val s = start.asInstanceOf[LogVersionOffset].ordinal
    val latest = ParquetVersions.latest(tableDir).get._1
    val (maxF, maxB) = ChangeFeed.limitParts(limit)
    if (maxF.isEmpty && maxB.isEmpty && maxCommitsPerTrigger.isEmpty)
      return if (latest == s) start else LogVersionOffset(latest)
    lazy val sizes: Map[String, Long] = {
      val data = new Path(tableDir, "data")
      val fs = data.getFileSystem(org.apache.spark.sql.GraftShims.hadoopConf())
      ParquetVersions.walkData(fs, data)
        .map { case (n, st) => n -> st.getLen }.toMap
    }
    def diffOf(v: Long): (Int, Long) = {
      val blocks = ChangeFeed.parquetSpanBlocks(tableDir, v - 1, v)
      val names = blocks.map(_._1).distinct
      val bytes = if (maxB.isEmpty) 0L
        else names.map(n => sizes.getOrElse(n, 0L)).sum
      (blocks.size, bytes)
    }
    val end = ChangeFeed.admitSpan(s, latest, maxCommitsPerTrigger,
      maxF, maxB, diffOf)
    if (end == s) start else LogVersionOffset(end)
  }

  override def initialOffset(): sread.Offset = {
    requireVersioned()
    startVersion match {
      case Some(v) =>
        require(ParquetVersions.get(tableDir, v).isDefined,
          s"startVersion $v: no such version in $tableDir (never committed, or vacuumed)")
        LogVersionOffset(v)
      case None => LogVersionOffset(ParquetVersions.latest(tableDir).get._1)
    }
  }

  override def latestOffset(): sread.Offset = {
    requireVersioned()
    LogVersionOffset(ParquetVersions.latest(tableDir).get._1)
  }

  override def planInputPartitions(start: sread.Offset,
      end: sread.Offset): Array[InputPartition] =
    ParquetChangesMicroBatchStream.spanPartitions(tableDir,
      start.asInstanceOf[LogVersionOffset].ordinal,
      end.asInstanceOf[LogVersionOffset].ordinal)

  private lazy val readerFactory: PartitionReaderFactory =
    ParquetChangesMicroBatchStream.rowReaderFactory(tableDir, dataSchema)

  override def createReaderFactory(): PartitionReaderFactory = readerFactory

  override def deserializeOffset(json: String): sread.Offset =
    LogVersionOffset(json.trim.toLong)

  override def commit(end: sread.Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One changelog block of the parquet feed. `visPreds`: masks the row
  * must be visible under; `delPreds` (non-empty ⇒ mask-delta block):
  * masks the row must be deleted under. */
case class CdcParquetPartition(
    file: org.apache.spark.sql.execution.datasources.PartitionedFile,
    changeType: String, commit: Long,
    visPreds: Seq[String] = Seq.empty,
    delPreds: Seq[String] = Seq.empty) extends InputPartition

class CdcParquetReaderFactory(inner: PartitionReaderFactory,
    innerPos: PartitionReaderFactory, dataSchema: StructType,
    widenedSchema: StructType, tableDir: String)
    extends PartitionReaderFactory {
  override def supportColumnarReads(partition: InputPartition): Boolean = false

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CdcParquetPartition(f, kind, commit, vis, del) =>
        // DV entries in either mask list ([[DeletionVectors]]) switch
        // the block to the position-widened reader; survivors project
        // back to the data schema before the (change_type, commit) tail
        val dv = DeletionVectors.anyDv(vis) || DeletionVectors.anyDv(del)
        val rowSchema = if (dv) widenedSchema else dataSchema
        val delegate = (if (dv) innerPos else inner).createReader(
          org.apache.spark.sql.execution.datasources.FilePartition(0, Array(f)))
        val visTest: Option[InternalRow => Boolean] = if (vis.isEmpty) None
          else Some(DeleteMasks.compiledRowFilter(tableDir, rowSchema, vis))
        val delTest: Option[InternalRow => Boolean] = if (del.isEmpty) None
          else Some(DeleteMasks.compiledRowFilter(tableDir, rowSchema, del))
        val proj: InternalRow => InternalRow =
          if (dv) {
            val up = org.apache.spark.sql.catalyst.expressions
              .UnsafeProjection.create(dataSchema)
            r => up(r)
          } else identity
        val tail = new GenericInternalRow(
          Array[Any](UTF8String.fromString(kind), commit))
        val joined = new JoinedRow()
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (delegate.next()) {
              val r = delegate.get()
              if (visTest.forall(t => !t(r)) && delTest.forall(t => t(r))) {
                cur = proj(r); return true
              }
            }
            false
          }
          override def get(): InternalRow = joined(cur, tail)
          override def close(): Unit = delegate.close()
        }
    }
}
