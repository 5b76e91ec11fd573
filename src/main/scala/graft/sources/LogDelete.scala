package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources._
import org.apache.spark.unsafe.types.UTF8String

/** Row-level DELETE for the entity log — the reference's `DELETE FROM
  * limits_hashes WHERE ...` maintenance path (`hashes_test.go:236-240`
  * clears by predicate between cases; SURVEY §2.1 #10) as a first-class
  * DSv2 `SupportsDelete`, so `DELETE FROM graft.<ns>.<t> WHERE p`
  * works through the catalog and `table.deleteWhere(filters)` through
  * the API.
  *
  * Scale design — metadata first, I/O only where provably needed. Every
  * segment is classified with THREE-VALUED zone logic against its
  * commit-time stats (might-match / must-match, the Delta/Iceberg
  * data-skipping shape generalized to And/Or/Not):
  *
  *   - **Clean** (¬might): no row can match — the file is NOT TOUCHED.
  *     Zero I/O for the log's cold tail, which at 100 TB is almost all
  *     of it.
  *   - **Drop** (must): every row provably matches (e.g. equality on a
  *     column whose zone is a single value) — the file is deleted
  *     WITHOUT being read: a metadata-only delete.
  *   - **Rewrite** (the rest): survivors are rewritten distributed —
  *     one task per affected segment (the same parallelism shape as
  *     the scan), each task streaming its lines once and emitting a
  *     staged replacement plus fresh exact stats (rows/min/max/Bloom),
  *     so COUNT/MIN/MAX pushdown and zone pruning stay exact after the
  *     delete. Only (name, stats) tuples return to the driver —
  *     manifest-scale metadata, same as DSv2 commit messages.
  *
  * Visibility & crash contract (same as [[Compaction.compactLog]]):
  * staged files are `_`-prefixed (invisible to readers); replacements
  * are renamed in BEFORE originals are removed, so a concurrent reader
  * sees transient duplication, never loss; the delete phase is fenced
  * by a `_delete-<id>.committed` marker recording exactly what to
  * remove. The delete id derives from the FILTER SET alone, so
  * retrying the same logical DELETE resumes: post-marker it finishes
  * the removals; pre-marker it re-rewrites the (still intact)
  * originals onto the same deterministic target names. Replacement
  * names are `segment-<delId>-<originalName>` — collision-free and
  * idempotent across retries; [[Compaction.compactLog]] re-shortens
  * them at the next maintenance window. Not safe against CONCURRENT
  * writers — quiesced-log contract, like compaction.
  */
object LogDelete {

  import LimitHashLog.SCHEMA

  private val UID = 0; private val AMT = 1; private val MSG = 2; private val SHA = 3

  /** Filters this source can evaluate itself (so `canDeleteWhere` can
    * promise `deleteWhere` will be exact): boolean combinations of
    * equality / IN / range on the stats-covered columns, null tests on
    * any column. Anything else → Spark reports DELETE unsupported
    * rather than us guessing. A NULL comparison value is rejected too:
    * in SQL it matches nothing, but the raw-field evaluators would
    * stringify it to the text "null" and delete the wrong rows — Spark
    * falls back instead of us promising exactness we can't deliver
    * (ADVICE r8). Null IN-list MEMBERS stay supported: both evaluators
    * drop them (a null member matches nothing, the rest still apply). */
  def supported(f: Filter): Boolean = f match {
    case And(l, r) => supported(l) && supported(r)
    case Or(l, r) => supported(l) && supported(r)
    case Not(c) => supported(c)
    case AlwaysTrue() | AlwaysFalse() => true
    case IsNull(a) => SCHEMA.fieldNames.contains(a)
    case IsNotNull(a) => SCHEMA.fieldNames.contains(a)
    case EqualTo(a, v) => v != null && (a == "user_id" || a == "amount" || a == "sha256sum")
    case In(a, _) => a == "user_id" || a == "amount" || a == "sha256sum"
    case GreaterThan(a, v) => v != null && (a == "user_id" || a == "amount" || a == "sha256sum")
    case GreaterThanOrEqual(a, v) => v != null && (a == "user_id" || a == "amount" || a == "sha256sum")
    case LessThan(a, v) => v != null && (a == "user_id" || a == "amount" || a == "sha256sum")
    case LessThanOrEqual(a, v) => v != null && (a == "user_id" || a == "amount" || a == "sha256sum")
    case _ => false
  }

  private def long(v: Any): Long = v match {
    case n: Number => n.longValue()
    case other => throw new IllegalArgumentException(
      s"LogDelete: non-numeric comparison value for amount: $other")
  }

  /** Predicate over one raw TSV line's fields — the same
    * parse-without-materializing discipline as the scan's pushed
    * filters. String order is UTF8String (binary), matching both the
    * zone stats and Spark's own comparisons. An empty msg field IS the
    * null encoding (the writer emits "" for null). */
  private[sources] def evalRow(f: Filter, fields: Array[String]): Boolean = f match {
    case And(l, r) => evalRow(l, fields) && evalRow(r, fields)
    case Or(l, r) => evalRow(l, fields) || evalRow(r, fields)
    case Not(c) => !evalRow(c, fields)
    case AlwaysTrue() => true
    case AlwaysFalse() => false
    case IsNull(a) => a == "msg" && fields(MSG).isEmpty
    case IsNotNull(a) => a != "msg" || fields(MSG).nonEmpty
    case EqualTo("amount", v) => fields(AMT).toLong == long(v)
    case EqualTo(a, v) => fields(if (a == "user_id") UID else SHA) == String.valueOf(v)
    case In("amount", vs) =>
      val x = fields(AMT).toLong; vs.exists(v => v != null && long(v) == x)
    case In(a, vs) =>
      val x = fields(if (a == "user_id") UID else SHA)
      vs.exists(v => v != null && String.valueOf(v) == x)
    case GreaterThan("amount", v) => fields(AMT).toLong > long(v)
    case GreaterThanOrEqual("amount", v) => fields(AMT).toLong >= long(v)
    case LessThan("amount", v) => fields(AMT).toLong < long(v)
    case LessThanOrEqual("amount", v) => fields(AMT).toLong <= long(v)
    case GreaterThan(a, v) => cmp(fields, a, v) > 0
    case GreaterThanOrEqual(a, v) => cmp(fields, a, v) >= 0
    case LessThan(a, v) => cmp(fields, a, v) < 0
    case LessThanOrEqual(a, v) => cmp(fields, a, v) <= 0
    case other => throw new IllegalArgumentException(s"LogDelete: unsupported $other")
  }

  private def cmp(fields: Array[String], a: String, v: Any): Int =
    UTF8String.fromString(fields(if (a == "user_id") UID else SHA))
      .compareTo(UTF8String.fromString(String.valueOf(v)))

  /** Compile a filter into a per-row closure — built ONCE per reader /
    * rewrite task, where [[evalRow]] re-walks the tree per line. The
    * payoff is `In`: a merge-on-read MERGE's key mask carries thousands
    * of keys, and `vs.exists` evaluated them LINEARLY per row (p38's
    * masked scan measured seconds per task); here membership is one
    * hash-set probe. Leaf comparisons delegate to [[evalRow]] —
    * single-node, no recursion — so the two evaluators cannot drift. */
  private[sources] def compileRow(f: Filter): Array[String] => Boolean = f match {
    case And(l, r) =>
      val a = compileRow(l); val b = compileRow(r)
      fields => a(fields) && b(fields)
    case Or(l, r) =>
      val a = compileRow(l); val b = compileRow(r)
      fields => a(fields) || b(fields)
    case Not(c) =>
      val a = compileRow(c)
      fields => !a(fields)
    case In("amount", vs) =>
      val set = vs.iterator.filter(_ != null).map(long).toSet
      fields => set.contains(fields(AMT).toLong)
    case In(a, vs) =>
      val idx = if (a == "user_id") UID else SHA
      val set = vs.iterator.filter(_ != null).map(String.valueOf).toSet
      fields => set.contains(fields(idx))
    case leaf =>
      fields => evalRow(leaf, fields)
  }

  /** Three-valued zone evaluation: (mightMatch, mustMatch) for a whole
    * segment from its stats. `might=false` ⇒ no row matches (skip);
    * `must=true` ⇒ every row matches (drop without reading). Both are
    * conservative in the safe direction, and `Not` swaps them —
    * ¬must(p) ⇒ might(¬p), ¬might(p) ⇒ must(¬p). */
  private[sources] def zone(f: Filter, st: SegmentStats): (Boolean, Boolean) = f match {
    case And(l, r) =>
      val (lm, lM) = zone(l, st); val (rm, rM) = zone(r, st); (lm && rm, lM && rM)
    case Or(l, r) =>
      val (lm, lM) = zone(l, st); val (rm, rM) = zone(r, st); (lm || rm, lM || rM)
    case Not(c) => val (m, must) = zone(c, st); (!must, !m)
    case AlwaysTrue() => (true, true)
    case AlwaysFalse() => (false, false)
    case IsNull(a) => (a == "msg", false) // only msg is nullable; no null stats
    case IsNotNull(a) => (true, a != "msg")
    case EqualTo("amount", v) =>
      val x = long(v)
      (x >= st.minAmount && x <= st.maxAmount, st.minAmount == x && st.maxAmount == x)
    case EqualTo("user_id", v) =>
      val s = String.valueOf(v); val u = UTF8String.fromString(s)
      val inRange = u.compareTo(UTF8String.fromString(st.minUserId)) >= 0 &&
        u.compareTo(UTF8String.fromString(st.maxUserId)) <= 0
      val bloomHit = st.bloom.map(SegmentBloom.fromBase64)
        .forall(_.mightContain("u:" + s))
      (inRange && bloomHit, st.minUserId == s && st.maxUserId == s)
    case EqualTo("sha256sum", v) => // no range stats; Bloom only
      (st.bloom.map(SegmentBloom.fromBase64)
        .forall(_.mightContain("s:" + String.valueOf(v))), false)
    case In(a, vs) => // disjunction of equalities; null members match nothing
      vs.filter(_ != null).map(v => zone(EqualTo(a, v), st))
        .foldLeft((false, false)) { case ((m1, s1), (m2, s2)) => (m1 || m2, s1 || s2) }
    case GreaterThan("amount", v) =>
      val x = long(v); (st.maxAmount > x, st.minAmount > x)
    case GreaterThanOrEqual("amount", v) =>
      val x = long(v); (st.maxAmount >= x, st.minAmount >= x)
    case LessThan("amount", v) =>
      val x = long(v); (st.minAmount < x, st.maxAmount < x)
    case LessThanOrEqual("amount", v) =>
      val x = long(v); (st.minAmount <= x, st.maxAmount <= x)
    case GreaterThan("user_id", v) =>
      val (lo, hi) = uidBounds(st, v); (hi > 0, lo > 0)
    case GreaterThanOrEqual("user_id", v) =>
      val (lo, hi) = uidBounds(st, v); (hi >= 0, lo >= 0)
    case LessThan("user_id", v) =>
      val (lo, hi) = uidBounds(st, v); (lo < 0, hi < 0)
    case LessThanOrEqual("user_id", v) =>
      val (lo, hi) = uidBounds(st, v); (lo <= 0, hi <= 0)
    case _ => (true, false) // sha ranges etc.: never skip, never drop
  }

  /** (min cmp v, max cmp v) in UTF8String order. */
  private def uidBounds(st: SegmentStats, v: Any): (Int, Int) = {
    val x = UTF8String.fromString(String.valueOf(v))
    (UTF8String.fromString(st.minUserId).compareTo(x),
      UTF8String.fromString(st.maxUserId).compareTo(x))
  }

  private[sources] sealed trait Verdict
  private[sources] case object Clean extends Verdict
  private[sources] case object Drop extends Verdict
  private[sources] case object Rewrite extends Verdict

  private[sources] def classify(filters: Array[Filter],
      stats: Option[SegmentStats]): Verdict = {
    if (filters.isEmpty) return Drop // empty conjunction = TRUE
    stats match {
      case None => // stats-less fixture: only filter-structure facts apply
        if (filters.forall { case AlwaysTrue() => true; case _ => false }) Drop
        else Rewrite
      case Some(st) =>
        val evaluated = filters.map(zone(_, st))
        if (!evaluated.forall(_._1)) Clean
        else if (evaluated.forall(_._2)) Drop
        else Rewrite
    }
  }

  /** Deterministic id for one logical delete — the filter set, order-
    * insensitive — so a retry targets the same staged/committed names. */
  private def deleteId(filters: Array[Filter]): String = {
    val repr = filters.map(_.toString).sorted.mkString("&")
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(repr.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    "del-" + d.take(6).map(b => f"$b%02x").mkString
  }

  /** Executor-side rewrite of ONE segment: stream lines, keep rows NOT
    * matching the conjunction, stage survivors, return exact stats.
    * No survivors → nothing staged (the original is simply dropped).
    *
    * Malformed lines (field count ≠ 4) follow the READERS' parse
    * discipline (ADVICE r8): the scans skip them, so DELETE passes them
    * through as survivors untouched (a maintenance op must stay
    * runnable on a log with foreign bytes, and must not destroy them)
    * and excludes them from the stats — which therefore describe
    * exactly the rows a scan will see, same as the write path. A
    * staged file holding ONLY malformed lines gets no stats entry
    * (stats-less segments are never zone-skipped — correct, and the
    * scan reads them as zero rows anyway). */
  private[sources] def rewriteSegment(dir: String, delId: String, oldPath: String,
      filters: Array[Filter],
      priorMasks: Seq[Filter] = Seq.empty,
      priorDvs: Seq[DeletionVectors.DvRef] = Seq.empty)
      : (String, Option[(String, Option[SegmentStats])]) = {
    val old = new Path(oldPath)
    val fs = old.getFileSystem(FsConf.get)
    val staged = new Path(dir, s"_staged-$delId-${old.getName}")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(old), java.nio.charset.StandardCharsets.UTF_8))
    var out: java.io.BufferedWriter = null
    var nRows = 0L
    var minUid: String = null; var maxUid: String = null
    var minAmt = Long.MaxValue; var maxAmt = Long.MinValue
    val bloom = SegmentBloom.empty()
    def keepLine(line: String): Unit = {
      if (out == null) out = new java.io.BufferedWriter(
        new java.io.OutputStreamWriter(fs.create(staged, true),
          java.nio.charset.StandardCharsets.UTF_8))
      out.write(line); out.write('\n')
    }
    // compile both filter sets once per segment ([[compileRow]]): the
    // per-line tree walk — linear for a thousands-of-keys IN mask —
    // becomes hash-set probes; prior DV entries become one bitmap
    // probe over the line ordinal ([[LimitHashLog.LPOS_COL]] domain:
    // every physical line counts, malformed included)
    val priorC = priorMasks.map(compileRow)
    val priorDv = if (priorDvs.isEmpty) null
      else new DeletionVectors.PositionDeleted(dir, priorDvs)
    val filtersC = filters.map(compileRow)
    var lpos = -1L
    try {
      var line = in.readLine()
      while (line != null) {
        lpos += 1
        val fields = line.split("\t", -1)
        if (fields.length != 4) keepLine(line) // malformed: pass through, no stats
        // a line a PRIOR merge-on-read mask already deleted is dropped
        // too (never a survivor — the rewrite PURGES the masks it
        // consumes; resurrecting it would undo a committed DELETE)
        else if (priorC.exists(_(fields)) ||
            (priorDv != null && priorDv.deleted(lpos))) ()
        else if (!filtersC.forall(_(fields))) { // survivor
          keepLine(line)
          nRows += 1
          val uid = fields(UID); val amt = fields(AMT).toLong
          if (minUid == null || UTF8String.fromString(uid)
              .compareTo(UTF8String.fromString(minUid)) < 0) minUid = uid
          if (maxUid == null || UTF8String.fromString(uid)
              .compareTo(UTF8String.fromString(maxUid)) > 0) maxUid = uid
          if (amt < minAmt) minAmt = amt
          if (amt > maxAmt) maxAmt = amt
          bloom.add("s:" + fields(SHA)); bloom.add("u:" + uid)
        }
        line = in.readLine()
      }
    } finally { in.close(); if (out != null) out.close() }
    if (out == null) (oldPath, None)
    else (oldPath, Some((staged.toString,
      if (nRows == 0) None
      else Some(SegmentStats(nRows, minUid, maxUid, minAmt, maxAmt,
        Some(bloom.toBase64))))))
  }

  /** The delete. Classification on the driver (metadata only), rewrite
    * distributed, then the compaction-style fenced swap. */
  def deleteWhere(spark: SparkSession, dir: String, filters: Array[Filter]): Unit =
    // mask-conflict retry: each attempt re-classifies against the fresh
    // live set and re-reads masks (deterministic staged names make the
    // re-run replace-on-retry); steady conflicts surface to the caller
    ParquetVersions.retryOnMaskConflict() {
    require(filters.forall(supported), s"unsupported delete filters: ${filters.mkString(", ")}")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return
    val delId = deleteId(filters)

    // Resume path: renames + manifest committed, crash mid-removal —
    // finish exactly the recorded removals and stop.
    if (resumeMarker(fs, base, delId)) return

    val versioned = LogVersions.enabled(dir)

    // MERGE-ON-READ (lightweight) DELETE on the log tier — the same
    // ClickHouse posture as the parquet tier ([[DeleteMasks]],
    // `hashes_test.go:235-239` is the exact statement): zone-proof
    // Clean segments untouched, must-match segments retired
    // metadata-only, and the predicate lands as a DELETE MASK on every
    // might-match segment — zero data I/O, every segment byte-identical,
    // scans drop masked rows at parse until a rewrite purges them.
    if (versioned && DeleteMasks.mergeOnRead(spark)) {
      val whole: Filter = filters.reduceOption(And).getOrElse(AlwaysTrue())
      DeleteMasks.serialize(whole) match {
        case Some(maskJson) =>
          val verdicts = LimitHashLog.segmentsWithStats(dir).map {
            case (f, _, st) => (new Path(f).getName, classify(filters, st))
          }
          val drops = verdicts.collect { case (n, Drop) => n }.toSet
          val masked = verdicts.collect { case (n, Rewrite) => n }
          // classification proved no row can match → genuine no-op
          if (drops.isEmpty && masked.isEmpty) return
          // guard the DROPPED segments (ADVICE r13 follow-through): a
          // concurrent rewrite retiring a drop-whole candidate moved
          // its rows into unmasked outputs — `filterNot` would no-op
          // and the DELETE silently lose those rows. Mask-target
          // retirement already throws at the ledger (merged()).
          LogVersions.commitGuarded(dir,
            masked.map(_ -> Seq(maskJson)).toMap,
            ParquetVersions.guardFor(drops,
              LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2)) { prev =>
            prev.filterNot(drops)
          }
          MaskPressure.afterMaskPublish(spark, dir)
          return
        case None => () // value shape the mask codec refuses → copy-on-write
      }
    }

    // PRIOR masks on the inputs (earlier lightweight deletes): the
    // rewrite must not resurrect rows they deleted — and it PURGES them
    // (outputs are new names; retired inputs drop their masks).
    val priorMasks: Map[String, Seq[String]] =
      if (versioned) LimitHashLog.segmentsAndMasksAllowed(dir, None, None)._2
      else Map.empty

    val (toRemove, added) =
      applyDelete(spark, dir, filters, delId, Seq(s"segment-$delId-"), priorMasks)

    if (versioned) {
      if (toRemove.nonEmpty || added.nonEmpty) {
        val inputs = toRemove.toSet
        LogVersions.commitGuarded(dir, Map.empty,
          Some(VersionLedger.MaskGuard(inputs,
            priorMasks.view.filterKeys(inputs).toMap))) { prev =>
          (prev.toSet -- toRemove ++ added).toSeq
        }
      }
    } else if (toRemove.nonEmpty) {
      fencedRemove(fs, base, delId, toRemove)
    }
  }

  /** Finish an interrupted [[fencedRemove]]: the marker records exactly
    * which segment names the crashed attempt had left to delete. True
    * when a marker was found (and its removals completed) — the logical
    * delete is then already done. */
  private[sources] def resumeMarker(fs: org.apache.hadoop.fs.FileSystem,
      base: Path, delId: String): Boolean = {
    val marker = new Path(base, s"_delete-$delId.committed")
    if (!fs.exists(marker)) return false
    val in = fs.open(marker)
    val recorded = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8).split("\n").filter(_.nonEmpty)
    finally in.close()
    recorded.foreach(n => fs.delete(new Path(base, n), false))
    fs.delete(marker, false)
    true
  }

  /** Fenced physical removal for the UN-versioned tier: record the
    * names in a `_delete-<id>.committed` marker first, so a crash
    * mid-removal resumes to exactly this set ([[resumeMarker]]). */
  private[sources] def fencedRemove(fs: org.apache.hadoop.fs.FileSystem,
      base: Path, delId: String, toRemove: Seq[String]): Unit = {
    val marker = new Path(base, s"_delete-$delId.committed")
    val out = fs.create(marker, true)
    try out.write(toRemove.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    toRemove.foreach(n => fs.delete(new Path(base, n), false))
    fs.delete(marker, false)
  }

  /** Phases 1–3 of one predicate delete — driver-side zone
    * classification, distributed survivor rewrite, replacement rename +
    * stats manifest — WITHOUT the final removal / version publish, so a
    * caller can fold the retirement of the originals into a LARGER
    * atomic commit (REPLACE-WHERE folds it into the same version as its
    * appended payload, [[LogBatchWrite]]). Returns
    * `(removedNames, addedNames)`: originals to retire and the
    * replacement segments already renamed in (invisible on a versioned
    * log until published; transiently duplicated on an un-versioned one,
    * same visibility contract as [[deleteWhere]] always had).
    * `fence`: segment-NAME prefixes excluded from the inputs — this
    * operation's own outputs on a retry, and an overwrite's
    * freshly-committed payload segments, which must never be fed back
    * through the predicate. */
  private[sources] def applyDelete(spark: SparkSession, dir: String,
      filters: Array[Filter], delId: String,
      fence: Seq[String],
      priorMasks: Map[String, Seq[String]] = Map.empty): (Seq[String], Seq[String]) = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val segs = LimitHashLog.segmentsWithStats(dir)
      .filterNot { case (f, _, _) =>
        val n = new Path(f).getName
        fence.exists(n.startsWith)
      }
    val verdicts = segs.map { case (f, _, st) => (f, classify(filters, st)) }
    val drops = verdicts.collect { case (f, Drop) => f }
    // Clean-but-masked segments stay untouched: their masks remain
    // valid at read, and purging them is purge_masks'/compaction's job,
    // not an unrelated DELETE's write amplification
    val rewrites = verdicts.collect { case (f, Rewrite) => f }
    // compile each rewrite's prior masks once, driver-side (v1 Filters
    // and DvRefs are small and Serializable — they ship in the task
    // closure; the DV bitmaps themselves load executor-side)
    val maskFiltersOf: Map[String, (Seq[Filter], Seq[DeletionVectors.DvRef])] =
      rewrites.map { f =>
        val n = new Path(f).getName
        val (dvRefs, predJsons) =
          DeletionVectors.split(priorMasks.getOrElse(n, Seq.empty))
        f -> ((LimitHashLog.compileMasks(predJsons), dvRefs))
      }.toMap

    val rewritten: Seq[(String, Option[(String, Option[SegmentStats])])] =
      if (rewrites.isEmpty) Seq.empty
      else spark.sparkContext
        .parallelize(rewrites.map(f => (f, maskFiltersOf(f))),
          math.min(rewrites.size,
            math.max(1, spark.sparkContext.defaultParallelism)))
        .map { case (f, (ms, dvs)) =>
          LogDelete.rewriteSegment(dir, delId, f, filters, ms, dvs)
        }
        .collect().toSeq

    // Commit: rename replacements in (replace-on-retry), THEN manifest,
    // THEN the fenced removal of originals — readers see (old ∪ new)
    // transiently, never a gap. On a VERSIONED log the removal is a
    // version publish instead: originals stay on disk for pinned
    // readers and [[LogVersions.vacuum]] reclaims them later.
    val manifest = Map.newBuilder[String, SegmentStats]
    val added = Seq.newBuilder[String]
    // a rewrite keeps a SUBSET of one segment's rows, so the original's
    // bucket tag ([[LogBucketing]]) still describes every survivor —
    // carry it through, or a DELETE would silently downgrade a bucketed
    // log's key-grouped layout claim
    val origBucket: Map[String, Int] = segs.collect {
      case (f, _, Some(st)) if st.bucket.isDefined =>
        (f, st.bucket.get)
    }.toMap
    rewritten.foreach {
      case (old, Some((staged, st))) =>
        val to = new Path(base, s"segment-$delId-${new Path(old).getName}")
        if (fs.exists(to)) fs.delete(to, false) // same-delete retry: replace
        if (!fs.rename(new Path(staged), to))
          throw new java.io.IOException(s"LogDelete: rename $staged -> $to failed")
        st.foreach(s => manifest +=
          (to.getName -> s.copy(bucket = origBucket.get(old))))
        added += to.getName
      case _ => () // fully-deleted segment: nothing to rename
    }
    val entries = manifest.result()
    if (entries.nonEmpty) LimitHashLog.writeManifest(fs, base, delId, entries)

    val toRemove = (drops ++ rewritten.map(_._1)).map(new Path(_).getName)
    (toRemove, added.result())
  }

  /** SURGICAL mask purge on the LOG tier — the log analog of
    * [[Compaction.purgeMasks]]: rewrite ONLY the live segments carrying
    * at least `minPreds` stacked delete-mask predicates (line-filtered
    * through [[rewriteSegment]], which also rebuilds exact stats), and
    * retire them in one guarded publish — the version carry-forward
    * drops their masks with them, restoring zone-exact metadata counts.
    * Returns (maskedSegments, rewrittenSegments, remainingMasked).
    *
    * NO lease taken here: the `purge_masks` procedure wraps it in one,
    * and [[Compaction.compactLog]] calls it already leased (the lease
    * is not re-entrant). */
  private[sources] def purgeMasksInner(spark: SparkSession, dir: String,
      minPreds: Int = 1): (Long, Long, Long) = {
    require(minPreds >= 1, "minPreds must be at least 1")
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!LogVersions.enabled(dir)) return (0L, 0L, 0L)
    ParquetVersions.retryOnMaskConflict() {
      val (live, allMasks) = LimitHashLog.segmentsAndMasksAllowed(dir, None, None)
      val liveByName = live.map { case (f, len) => (new Path(f).getName, f) }.toMap
      val targets = allMasks.filter { case (n, preds) =>
        liveByName.contains(n) && preds.size >= minPreds
      }
      if (targets.isEmpty) {
        val stillMasked = allMasks.keySet.count(liveByName.contains).toLong
        return (stillMasked, 0L, stillMasked)
      }
      // deterministic purge id from the mask content: a retry targets
      // the same staged/committed names (replace-on-retry)
      val digest = java.security.MessageDigest.getInstance("SHA-256").digest(
        targets.toSeq.sortBy(_._1).toString
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val purgeId = "mp-" + digest.take(6).map(b => f"$b%02x").mkString
      val jobs = targets.toSeq.sortBy(_._1).map { case (n, preds) =>
        val (dvRefs, predJsons) = DeletionVectors.split(preds)
        (liveByName(n), LimitHashLog.compileMasks(predJsons), dvRefs)
      }
      // AlwaysFalse delete predicate: nothing deleted BY THIS PASS —
      // only the prior masks filter (an empty filter array would mean
      // the empty conjunction = TRUE = delete everything)
      val keepAll: Array[Filter] = Array(AlwaysFalse())
      val rewritten = spark.sparkContext
        .parallelize(jobs, math.min(jobs.size,
          math.max(1, spark.sparkContext.defaultParallelism)))
        .map { case (f, ms, dvs) => rewriteSegment(dir, purgeId, f, keepAll, ms, dvs) }
        .collect().toSeq
      val manifest = Map.newBuilder[String, SegmentStats]
      val added = Seq.newBuilder[String]
      val stats = LimitHashLog.loadStats(dir)
      rewritten.foreach {
        case (old, Some((staged, st))) =>
          val oldName = new Path(old).getName
          val to = new Path(base, s"segment-$purgeId-$oldName")
          if (fs.exists(to)) fs.delete(to, false)
          if (!fs.rename(new Path(staged), to))
            throw new java.io.IOException(s"purgeMasks: rename $staged -> $to failed")
          // survivors keep the original's bucket tag (a purge keeps a
          // SUBSET of one segment's rows — same carry as DELETE)
          st.foreach(s => manifest += (to.getName ->
            s.copy(bucket = stats.get(oldName).flatMap(_.bucket))))
          added += to.getName
        case _ => () // every row was masked: the segment simply retires
      }
      val entries = manifest.result()
      if (entries.nonEmpty) LimitHashLog.writeManifest(fs, base, purgeId, entries)
      val inputs = targets.keySet
      LogVersions.commitGuarded(dir, Map.empty,
        Some(VersionLedger.MaskGuard(inputs, targets))) { prev =>
        (prev.toSet -- inputs ++ added.result()).toSeq
      }
      val remaining = LimitHashLog.segmentsAndMasksAllowed(dir, None, None)
        ._2.size.toLong
      (targets.size.toLong, inputs.size.toLong, remaining)
    }
  }

  /** TRUNCATE: remove every segment and every stats manifest. On a
    * versioned log, publish an empty version instead — segments stay
    * on disk for pinned readers until vacuum. */
  def truncateAll(dir: String): Unit = {
    val base = new Path(dir)
    val fs = base.getFileSystem(FsConf.get)
    if (!fs.exists(base)) return
    if (LogVersions.enabled(dir)) {
      LogVersions.commit(dir)(_ => Seq.empty)
      return
    }
    LimitHashLog.segments(dir).foreach { case (f, _) => fs.delete(new Path(f), false) }
    fs.listStatus(base).foreach { s =>
      if (s.isFile && s.getPath.getName.startsWith(".stats-manifest-"))
        fs.delete(s.getPath, false)
    }
  }
}
