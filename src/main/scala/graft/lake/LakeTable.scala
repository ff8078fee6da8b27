package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal lakehouse table format: parquet data files + a versioned
  * JSON transaction log with atomic rename commits.
  *
  * The reference stores every silver/gold model as an Iceberg table
  * (ref: trino_iceberg_transform_component.py:116-123, defs.yaml
  * `iceberg_table:` per transform). Neither Delta nor Iceberg resolves
  * in this offline environment, so the table-format *semantics* are
  * implemented directly on Spark + Hadoop FileSystem primitives:
  *
  *  - ACID commits: a snapshot is one immutable JSON file in
  *    `_graft_log/` named by zero-padded version; publishing is an
  *    atomic put-if-absent (hard link on local POSIX filesystems,
  *    FileContext.rename(Rename.NONE) elsewhere — see publishIfAbsent),
  *    so concurrent writers serialize by optimistic retry and a taken
  *    version can never be silently clobbered. Readers always see a
  *    complete snapshot — never a half-written directory.
  *  - Snapshot isolation + time travel: each log entry carries the full
  *    file list and schema; `read(asOf = version)` reconstructs any
  *    retained version.
  *  - Schema evolution: `append` merges new columns into the snapshot
  *    schema; old files simply lack the column and read as nulls
  *    (parquet with user-specified schema), old versions keep theirs.
  *  - MERGE/upsert: file-granularity copy-on-write — only data files
  *    that contain a matched key are rewritten; untouched files carry
  *    over into the new snapshot by reference.
  *  - Partitioning: data files live in hive-style `col=value/` dirs
  *    under `data/`; reads pass the snapshot's file list with
  *    `basePath`, so Catalyst recovers partition values and
  *    partition-prunes filters on partition columns.
  *  - Vacuum: unreferenced files (crashed writes, overwritten
  *    versions beyond the retention window) are deleted.
  *
  * Scale notes: the log is SHARDED — each commit writes only a DELTA
  * ({adds, removes} plus the small schema/partition/txns metadata), so
  * commit cost is O(files touched), not O(table): appending one file
  * to a million-file table writes one small JSON, not a million-entry
  * manifest. Every `checkpointInterval`-th commit additionally writes
  * a full-state `<v>.checkpoint.json` (advisory), and readers
  * reconstruct a snapshot as nearest-base + ≤interval deltas, where a
  * base is a checkpoint, a legacy full-state entry, or a `reset` delta
  * (OVERWRITE carries its complete new file list and is therefore its
  * own base). This is the manifest / manifest-list discipline of
  * Iceberg (the reference's format, ref:
  * trino_iceberg_transform_component.py:116-123) and Delta's
  * delta-log + checkpoint. "What is the newest version" resolves
  * through the O(1) `_latest_hint` file (written post-commit, verified
  * + probed forward on read) instead of an O(commits) directory
  * listing. Data is never rewritten except the matched files of a
  * MERGE; overwrite is a metadata swap.
  *
  * Layout:
  * {{{
  * <table>/_graft_log/00000000000000000001.json              (delta, or legacy full-state)
  * <table>/_graft_log/00000000000000000010.checkpoint.json   (full-state, every 10th)
  * <table>/data/<part=val>/part-<uuid>.parquet
  * <table>/_staging/<uuid>/   (transient)
  * }}}
  */
object LakeTable extends org.apache.spark.internal.Logging {

  /** Min/max/null-count of one column within one data file, rendered in
    * the canonical string domain of [[ParquetStats]]/[[DataSkipping]].
    * Absent pieces mean "unknown" — never skipped on.
    */
  final case class ColStats(min: Option[String], max: Option[String],
                            nullCount: Option[Long])

  /** A positional deletion vector attached to one data file — the
    * merge-on-read delete analog of Iceberg v2's positional delete
    * files (the reference's tables are Iceberg-v2-on-Trino, ref:
    * trino_iceberg_transform_component.py:33,116-123). `path` is a
    * table-root-relative directory under `_deletes/` holding parquet
    * rows `(p: string, pos: long)` — the data-file-relative path and
    * 0-based physical row ordinal of each deleted row. One delete
    * commit writes ONE such directory shared by every file it touched;
    * each touched file's entry points at the directory that holds its
    * COMPLETE current deleted-position set (a later delete on the same
    * file folds the old positions into its new directory).
    * `cardinality` is this file's deleted-row count within that set.
    */
  final case class DeleteVector(path: String, cardinality: Long)

  /** One data file as the transaction log records it: table-relative
    * path plus the metadata a reader needs to PLAN a scan without
    * touching the file or its directory — size and mtime (to build a
    * `FileStatus` without a LIST), row count and per-column bounds (to
    * skip the file against pushed filters). This is the manifest-entry
    * role Iceberg plays for the reference (ref:
    * trino_iceberg_transform_component.py:116-123). `size < 0` marks a
    * legacy entry (pre-stats log) — readers fall back to listing, and
    * the entry upgrades on the next rewrite of the file's snapshot.
    *
    * `dv`: the file's outstanding [[DeleteVector]], if any — readers
    * must filter the file's rows by position against it. Logged
    * min/max/nullCount stats stay SOUND under a dv (they bound a
    * superset of the live rows — skipping can only under-prune, never
    * misprune), but `rowCount` alone over-counts: use [[liveRowCount]].
    *
    * `bloom`: table-relative path of the commit sidecar holding this
    * file's per-column bloom filters ([[BloomIndex]]) — ADVISORY
    * equality-skipping metadata; absent/unreadable degrades to "scan
    * the file", so no protocol gate guards it.
    */
  final case class FileEntry(path: String, size: Long, mtimeMs: Long,
                             rowCount: Long, stats: Map[String, ColStats],
                             dv: Option[DeleteVector] = None,
                             bloom: Option[String] = None) {
    /** Rows a scan of this file yields after dv filtering; -1 unknown. */
    def liveRowCount: Long =
      if (rowCount < 0) -1L else rowCount - dv.map(_.cardinality).getOrElse(0L)
  }

  /** The log's protocol stamp (Delta's protocol action / Iceberg's
    * format-version): `reader` names the capability a client needs to
    * READ the table correctly, `writer` the capability to WRITE it
    * without corrupting invariants newer clients rely on. Every commit
    * and checkpoint carries the stamp; entries written before the stamp
    * existed read as version 1. A client refuses — loudly, naming both
    * numbers — to read past [[LakeTable.MaxReaderVersion]] or commit
    * past [[LakeTable.MaxWriterVersion]], so a future format change
    * (manifest segments, column mapping) degrades to a clear "upgrade
    * the library" error instead of a silent misread.
    */
  final case class Protocol(reader: Int, writer: Int)

  /** Highest log protocol this library can read / write. Bump ONLY with
    * the feature that requires it, and stamp the bumped version only on
    * tables that actually use the feature — older tables stay readable
    * by older clients.
    *
    * Version 2 = column mapping ([[ColumnMapping]]): the schema's
    * logical names indirect to stable physical names in the data
    * files. A version-1 reader would match logical names against the
    * files and read every renamed column as null — exactly the silent
    * misread the gate prevents. Only tables that RENAME/DROP a column
    * (or enable mapping explicitly) get stamped 2.
    *
    * Version 3 = merge-on-read deletes ([[DeleteVector]]): file entries
    * may carry positional deletion vectors that a reader must apply. A
    * version-≤2 reader would scan the files raw and RESURRECT deleted
    * rows; a version-≤2 writer would rewrite entries without their dv
    * field on its next commit, silently undeleting. Only tables that
    * actually commit a dv ([[deleteMergeOnRead]]) get stamped 3.
    *
    * Writer version 4 = CHECK constraints ([[addConstraint]]): the log
    * carries invariant expressions every row-adding commit must have
    * validated. Reading is unaffected (reader stays ≤3), but a
    * version-≤3 writer would append unvalidated rows, silently breaking
    * the invariant readers rely on. Only tables that ADD a constraint
    * get stamped writer 4.
    *
    * Reader version 4 = metadata-only file drops (`removedFull` on a
    * DELETE entry): a file every live row of which provably matched the
    * predicate is removed from the snapshot WITHOUT being read, so its
    * delete rows are not in the commit's recorded change data — the
    * change feed synthesizes them lazily from the previous snapshot. A
    * version-≤3 reader reads SNAPSHOTS of such a table correctly (the
    * file list is complete), but would silently UNDER-REPORT the change
    * feed of the dropping commit; feed soundness wins over snapshot
    * availability for stale clients, so the whole table gates. Only
    * tables where a delete actually drops a file by metadata get
    * stamped reader 4.
    */
  val MaxReaderVersion = 4
  val MaxWriterVersion = 4

  final class ProtocolVersionException(msg: String) extends RuntimeException(msg)

  final case class Snapshot(version: Long, timestampMs: Long, operation: String,
                            schema: StructType, partitionColumns: Seq[String],
                            files: Seq[FileEntry],
                            txns: Map[String, Long] = Map.empty,
                            protocol: Protocol = Protocol(1, 1),
                            constraints: Map[String, String] = Map.empty) {
    def filePaths: Seq[String] = files.map(_.path)
  }

  /** One parsed log file. A legacy (pre-sharding) file carries the
    * complete file list in `full`; a delta commit carries only the
    * files it added/removed. `reset = true` marks a commit that
    * replaced the table contents (OVERWRITE): its `adds` ARE the full
    * new file list, making the entry a reconstruction base. `cdc`
    * names the commit's change-data files (table-root-relative, under
    * `_change_data/`) — row-level pre/post images a DML commit records
    * for the change feed.
    */
  private[graft] final case class LogEntry(
      version: Long, timestampMs: Long, operation: String,
      schema: StructType, partitionColumns: Seq[String],
      txns: Map[String, Long],
      full: Option[Seq[FileEntry]],
      adds: Seq[FileEntry], removes: Seq[String], reset: Boolean,
      cdc: Option[Seq[String]],
      protocol: Protocol,
      constraints: Map[String, String] = Map.empty,
      // removed with NO change-data coverage because every live row was
      // provably deleted (metadata-only retention drop): the change
      // feed synthesizes their rows as deletes lazily from the previous
      // snapshot. Always a subset of `removes`.
      removedFull: Seq[String] = Nil)

  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  private[lake] def logPath(table: String) = new Path(table, "_graft_log")
  private[lake] def dataPath(table: String) = new Path(table, "data")
  private[lake] def deletesPath(table: String) = new Path(table, "_deletes")
  private[lake] def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionFile(table: String, v: Long): Path =
    new Path(logPath(table), f"$v%020d.json")

  // ---------------------------------------------------------------- log I/O

  private def renderFile(e: FileEntry): JValue = JObject(List(
    "p" -> JString(e.path),
    "sz" -> JLong(e.size),
    "mt" -> JLong(e.mtimeMs),
    "rc" -> JLong(e.rowCount),
    "st" -> JObject(e.stats.toList.sortBy(_._1).map { case (c, s) =>
      c -> (JObject(List(
        s.min.map(m => "mn" -> JString(m)),
        s.max.map(m => "mx" -> JString(m)),
        s.nullCount.map(n => "nc" -> JLong(n))).flatten): JValue)
    })) ++
    e.dv.map(d => "dv" -> (JObject(List(
      "p" -> JString(d.path), "c" -> JLong(d.cardinality))): JValue)).toList ++
    e.bloom.map(b => "bf" -> (JString(b): JValue)).toList)

  private def commonFields(version: Long, timestampMs: Long, operation: String,
                           schema: StructType, partitionColumns: Seq[String],
                           txns: Map[String, Long],
                           protocol: Protocol,
                           constraints: Map[String, String]): List[(String, JValue)] = {
    val base = List(
      "version" -> JLong(version),
      "timestampMs" -> JLong(timestampMs),
      "rv" -> JLong(protocol.reader.toLong),
      "wv" -> JLong(protocol.writer.toLong),
      "operation" -> JString(operation),
      "schemaJson" -> JString(schema.json),
      "partitionColumns" -> JArray(partitionColumns.map(JString(_)).toList))
    // streaming-writer watermarks (queryId -> highest committed epoch),
    // the exactly-once ledger; omitted when no stream has ever written
    val withTxns = if (txns.isEmpty) base
    else base :+ ("txns" -> (JObject(txns.toList.sortBy(_._1).map {
      case (q, b) => q -> (JLong(b): JValue)
    }): JValue))
    // CHECK constraints (name -> SQL expression) ride along in full
    // like schema/txns — O(constraints), small
    if (constraints.isEmpty) withTxns
    else withTxns :+ ("cks" -> (JObject(constraints.toList.sortBy(_._1).map {
      case (n, e) => n -> (JString(e): JValue)
    }): JValue))
  }

  // (The legacy full-state RENDER is gone — checkpoints are segmented
  // now, see "manifest segments" below — but the full-state PARSE stays:
  // legacy version files and v1 checkpoints still read.)

  /** Delta render — what every commit writes: O(files touched), never
    * O(table). Schema/partition-columns/txns ride along in full (they
    * are O(columns + streams), small) so any single delta yields the
    * snapshot's non-file state without a walk.
    */
  private def renderDelta(s: Snapshot, adds: Seq[FileEntry],
                          removes: Seq[String], reset: Boolean,
                          cdc: Option[Seq[String]],
                          removedFull: Seq[String] = Nil): String = {
    val fields = commonFields(s.version, s.timestampMs, s.operation, s.schema,
      s.partitionColumns, s.txns, s.protocol, s.constraints) ++
      List("adds" -> JArray(adds.map(renderFile).toList)) ++
      (if (reset) List("reset" -> JBool(true))
       else if (removes.nonEmpty)
         List("removes" -> JArray(removes.map(JString(_)).toList))
       else Nil) ++
      // "cdc" present (possibly empty) ⇔ this commit RECORDED its
      // changes; absent ⇔ changes must be synthesized or are unknowable
      cdc.map(c => "cdc" -> (JArray(c.map(JString(_)).toList): JValue)).toList ++
      // metadata-only drops: removed files whose delete rows the feed
      // synthesizes lazily (reader ≥ 4 — see Protocol doc)
      (if (removedFull.isEmpty) Nil
       else List("rfull" -> JArray(removedFull.map(JString(_)).toList)))
    JsonMethods.compact(JsonMethods.render(JObject(fields)))
  }

  private def jLong(v: JValue): Long = v match {
    case JLong(x) => x
    case JInt(x)  => x.toLong
    case other    => throw new IllegalStateException(s"expected number, got $other")
  }
  private def jStr(v: JValue): String = v match {
    case JString(x) => x
    case other      => throw new IllegalStateException(s"expected string, got $other")
  }

  private def jLongOpt(v: JValue): Option[Long] = v match {
    case JLong(x) => Some(x)
    case JInt(x)  => Some(x.toLong)
    case _        => None
  }
  private def jStrOpt(v: JValue): Option[String] = v match {
    case JString(x) => Some(x)
    case _          => None
  }

  /** Back-compat: a pre-stats log records a file as its bare relative
    * path string; it parses to an entry with unknown size/rows/stats,
    * which readers treat as "go stat the filesystem".
    */
  private def parseFile(j: JValue): FileEntry = j match {
    case JString(p) => FileEntry(p, -1L, -1L, -1L, Map.empty)
    case o: JObject =>
      val stats = (o \ "st") match {
        case JObject(cols) => cols.map { case (c, v) =>
          c -> ColStats(jStrOpt(v \ "mn"), jStrOpt(v \ "mx"), jLongOpt(v \ "nc"))
        }.toMap
        case _ => Map.empty[String, ColStats]
      }
      val dv = (o \ "dv") match {
        case d: JObject => Some(DeleteVector(jStr(d \ "p"), jLong(d \ "c")))
        case _          => None
      }
      FileEntry(jStr(o \ "p"), jLong(o \ "sz"), jLong(o \ "mt"), jLong(o \ "rc"), stats,
        dv, jStrOpt(o \ "bf"))
    case other => throw new IllegalStateException(s"expected file entry, got $other")
  }

  /** Parse either format: `files` present ⇒ full-state (legacy version
    * file or checkpoint); otherwise a delta with `adds`/`removes`.
    */
  private def parseLogEntry(s: String): LogEntry = {
    val j = JsonMethods.parse(s)
    // protocol gate FIRST: refusing to read a future-reader entry must
    // not depend on the rest of the entry parsing (a future format may
    // not even carry today's fields)
    val rv = jLongOpt(j \ "rv").map(_.toInt).getOrElse(1)
    val wv = jLongOpt(j \ "wv").map(_.toInt).getOrElse(1)
    if (rv > MaxReaderVersion)
      throw new ProtocolVersionException(
        s"this table's log requires readerVersion $rv, but this library reads " +
          s"up to readerVersion $MaxReaderVersion — upgrade the library to read " +
          "this table")
    val full = (j \ "files") match {
      case JArray(entries) => Some(entries.map(parseFile))
      case _               => None
    }
    LogEntry(
      version = jLong(j \ "version"),
      timestampMs = jLong(j \ "timestampMs"),
      operation = jStr(j \ "operation"),
      schema = DataType.fromJson(jStr(j \ "schemaJson")).asInstanceOf[StructType],
      partitionColumns = (j \ "partitionColumns").asInstanceOf[JArray].arr.map(jStr),
      txns = (j \ "txns") match {
        case JObject(fields) => fields.map { case (q, b) => q -> jLong(b) }.toMap
        case _               => Map.empty
      },
      full = full,
      adds = (j \ "adds") match {
        case JArray(entries) => entries.map(parseFile)
        case _               => Seq.empty
      },
      removes = (j \ "removes") match {
        case JArray(entries) => entries.map(jStr)
        case _               => Seq.empty
      },
      reset = (j \ "reset") match {
        case JBool(b) => b
        case _        => false
      },
      cdc = (j \ "cdc") match {
        case JArray(entries) => Some(entries.map(jStr))
        case _               => None
      },
      protocol = Protocol(rv, wv),
      constraints = (j \ "cks") match {
        case JObject(fields) => fields.map { case (n, e) => n -> jStr(e) }.toMap
        case _               => Map.empty
      },
      removedFull = (j \ "rfull") match {
        case JArray(entries) => entries.map(jStr)
        case _               => Seq.empty
      })
  }

  private def readFileText(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try new String(in.readAllBytes(), "UTF-8")
    finally in.close()
  }

  /** The log entry of one committed version (delta or legacy full). */
  private[graft] def logEntryAt(spark: SparkSession, table: String, version: Long): LogEntry = {
    val f = fs(spark, table)
    val p = versionFile(table, version)
    if (!f.exists(p))
      throw new IllegalArgumentException(s"no version $version at $table")
    parseLogEntry(readFileText(f, p))
  }

  // a committed snapshot is exactly 20 digits + ".json"; anything else in
  // _graft_log/ (hint file, tmp files, foreign droppings) is not a version
  private val VersionFileName = """(\d{20})\.json""".r

  /** All committed versions, ascending. O(log-dir listing) — used by
    * history/time-travel/vacuum; the latest-snapshot hot path goes
    * through the hint file instead (see [[latestVersion]]).
    */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val lp = logPath(table)
    if (!f.exists(lp)) Seq.empty
    else f.listStatus(lp).toSeq
      .map(_.getPath.getName)
      .collect { case VersionFileName(digits) => digits.toLong }
      .sorted
  }

  // --------------------------------------------------- latest-version hint
  //
  // Resolving "latest" by listing _graft_log/ is O(commits) per read — at
  // daily-commit cadence over years that listing is the reader's metadata
  // bottleneck (the problem Delta solves with _last_checkpoint and Iceberg
  // with version-hint.text). Every graft snapshot is already full-state
  // (it carries the complete file list + schema), so no multi-file log
  // replay is needed — only "what is the newest version?". A best-effort
  // `_latest_hint` file answers that in O(1): written after every
  // successful commit, read + probed-forward on access. The hint is
  // advisory only — it can lag (writer crashed between commit and hint;
  // racing writers overwrite it out of order) but correctness never
  // depends on it: readers verify the hinted version exists, probe
  // forward past it, and fall back to the full listing when it is
  // missing or unparsable.

  private def hintFile(table: String) = new Path(logPath(table), "_latest_hint")

  private def writeLatestHint(f: FileSystem, table: String, v: Long): Unit =
    try {
      val out = f.create(hintFile(table), true)
      try out.write(v.toString.getBytes("UTF-8")) finally out.close()
    } catch { case _: java.io.IOException => () } // advisory — never fail a commit

  private def readHint(f: FileSystem, table: String): Option[Long] =
    try {
      val p = hintFile(table)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val s = try new String(in.readAllBytes(), "UTF-8").trim finally in.close()
        s.toLongOption.filter(_ > 0)
      }
    } catch { case _: java.io.IOException => None }

  /** Newest committed version: hint + forward probe (O(1) + O(commits
    * since the hint was written)), falling back to the O(commits)
    * directory listing when there is no usable hint.
    */
  private[lake] def latestVersion(spark: SparkSession, table: String): Option[Long] = {
    val f = fs(spark, table)
    readHint(f, table).filter(h => f.exists(versionFile(table, h))) match {
      case Some(h) =>
        var v = h
        while (f.exists(versionFile(table, v + 1))) v += 1
        Some(v)
      case None => versions(spark, table).lastOption
    }
  }

  def latestSnapshot(spark: SparkSession, table: String): Option[Snapshot] =
    latestVersion(spark, table).map(v => snapshotAt(spark, table, v))

  // ------------------------------------------------ snapshot checkpoints
  //
  // Every checkpointInterval-th commit also writes `<v>.checkpoint.json`
  // — the full file list as of v, in the legacy full-state format — so
  // reconstruction walks back at most ~interval deltas before hitting a
  // base. The checkpoint is ADVISORY (post-commit, best-effort): a
  // missing or torn one just lengthens the walk, which still terminates
  // at a legacy full-state entry, a `reset` delta (OVERWRITE), or the
  // table's first commit (whose delta applies to the empty base).

  private def snapshotCheckpointFile(table: String, v: Long): Path =
    new Path(logPath(table), f"$v%020d.checkpoint.json")

  // ------------------------------------------------- manifest segments
  //
  // A full-state checkpoint serialized as ONE file costs O(table) bytes
  // every checkpointInterval commits — at 1M files that is hundreds of
  // MB of JSON re-serialized thousands of times over a streaming
  // table's life, the last O(table) metadata WRITE in the format. The
  // file list is therefore SEGMENTED: immutable, content-addressed
  // manifest files of ~segmentTargetEntries entries each, sorted and
  // range-partitioned by data-file path, under `_graft_log/_manifests/`.
  // The checkpoint itself is just the ordered list of segment
  // references (name, entry count, path range). A later checkpoint
  // REUSES every segment whose membership did not change: removals
  // rewrite only the segment(s) whose path range covers them (located
  // by range — untouched segments are never even read), adds chunk into
  // fresh segments, and runt segments fold into the next chunking so
  // the segment count stays O(files / segmentSize), not O(checkpoints).
  // This is Iceberg's manifest / manifest-list reuse discipline (the
  // format behind every reference transform, ref:
  // trino_iceberg_transform_component.py:116-123); Delta's multi-part
  // checkpoints shard the same way. Content addressing (name = md5 of
  // content) makes segment publication idempotent across racing
  // checkpointers, and turns a rewrite that changed nothing into no
  // write at all.
  //
  // The v2 checkpoint file deliberately does NOT carry the legacy
  // `schemaJson` key: a pre-segment reader's checkpoint parse fails,
  // and it degrades to delta-chain reconstruction — correct, just
  // longer — instead of silently misreading a checkpoint format it
  // does not understand. (New READERS of old single-file checkpoints
  // still work: both formats parse below.)

  /** One immutable manifest segment, as the checkpoint references it:
    * content-addressed file name, entry count, and the sorted
    * data-file-path range it covers (how removals find their segment
    * without reading any).
    */
  private[lake] final case class SegmentRef(name: String, count: Long,
                                            minPath: String, maxPath: String)

  private[lake] def manifestsPath(table: String) = new Path(logPath(table), "_manifests")

  /** Target entries per manifest segment. ~300 bytes of JSON per entry
    * puts the default segment near the 8-16 MB manifest sweet spot;
    * specs shrink it to exercise multi-segment checkpoints on small
    * tables.
    */
  private[lake] def segmentTargetEntries(spark: SparkSession): Int =
    spark.sessionState.conf.getConfString(
      "spark.graft.checkpoint.segmentTargetEntries", "50000").toInt

  /** Write `entries` (sorted by path, non-empty) as a content-addressed
    * segment, unless that exact content is already published.
    */
  private def writeSegment(f: FileSystem, table: String,
                           entries: Seq[FileEntry]): SegmentRef = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("files" -> JArray(entries.map(renderFile).toList))))
    val bytes = body.getBytes("UTF-8")
    val name = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString + ".segment.json"
    val target = new Path(manifestsPath(table), name)
    if (!f.exists(target)) {
      f.mkdirs(manifestsPath(table))
      val tmp = new Path(logPath(table), s".seg-tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(bytes) finally out.close()
      publishIfAbsent(f, tmp, target) // same-content race: either write stands
    }
    SegmentRef(name, entries.size.toLong, entries.head.path, entries.last.path)
  }

  private def readSegment(f: FileSystem, table: String, name: String): Seq[FileEntry] =
    (JsonMethods.parse(readFileText(f, new Path(manifestsPath(table), name))) \ "files")
      .asInstanceOf[JArray].arr.map(parseFile)

  /** Segment references of a v2 checkpoint, without reading segments —
    * the writer-side handle for reuse. None for missing/legacy/torn.
    */
  private def readCheckpointRefs(f: FileSystem, table: String,
                                 v: Long): Option[Seq[SegmentRef]] =
    if (v <= 0) None
    else try {
      val p = snapshotCheckpointFile(table, v)
      if (!f.exists(p)) None
      else scala.util.Try {
        val j = JsonMethods.parse(readFileText(f, p))
        require(jLongOpt(j \ "checkpointV").contains(2L), "not a segmented checkpoint")
        (j \ "segments").asInstanceOf[JArray].arr.map(s =>
          SegmentRef(jStr(s \ "n"), jLong(s \ "c"), jStr(s \ "lo"), jStr(s \ "hi")))
      }.toOption
    } catch { case _: java.io.IOException => None }

  private def renderCheckpointV2(s: Snapshot, segs: Seq[SegmentRef]): String =
    JsonMethods.compact(JsonMethods.render(JObject(List(
      "checkpointV" -> JLong(2L),
      "version" -> JLong(s.version),
      "timestampMs" -> JLong(s.timestampMs),
      "rv" -> JLong(s.protocol.reader.toLong),
      "wv" -> JLong(s.protocol.writer.toLong),
      "operation" -> JString(s.operation),
      // "schema", NOT the legacy "schemaJson" — see the format note above
      "schema" -> JString(s.schema.json),
      "partitionColumns" -> JArray(s.partitionColumns.map(JString(_)).toList),
      "txns" -> JObject(s.txns.toList.sortBy(_._1).map { case (q, b) =>
        q -> (JLong(b): JValue) }),
      "cks" -> JObject(s.constraints.toList.sortBy(_._1).map { case (n, e) =>
        n -> (JString(e): JValue) }),
      "segments" -> JArray(segs.map(r => JObject(
        "n" -> JString(r.name), "c" -> JLong(r.count),
        "lo" -> JString(r.minPath), "hi" -> JString(r.maxPath))).toList)))))

  private def parseCheckpointV2(f: FileSystem, table: String, j: JValue): Snapshot = {
    val rv = jLongOpt(j \ "rv").map(_.toInt).getOrElse(1)
    if (rv > MaxReaderVersion)
      throw new ProtocolVersionException(
        s"this table's checkpoint requires readerVersion $rv, but this library " +
          s"reads up to readerVersion $MaxReaderVersion")
    val segs = (j \ "segments").asInstanceOf[JArray].arr.map(s => jStr(s \ "n"))
    Snapshot(
      jLong(j \ "version"), jLong(j \ "timestampMs"), jStr(j \ "operation"),
      DataType.fromJson(jStr(j \ "schema")).asInstanceOf[StructType],
      (j \ "partitionColumns").asInstanceOf[JArray].arr.map(jStr),
      segs.flatMap(readSegment(f, table, _)),
      (j \ "txns") match {
        case JObject(fields) => fields.map { case (q, b) => q -> jLong(b) }.toMap
        case _               => Map.empty
      },
      Protocol(rv, jLongOpt(j \ "wv").map(_.toInt).getOrElse(1)),
      constraints = (j \ "cks") match {
        case JObject(fields) => fields.map { case (n, e) => n -> jStr(e) }.toMap
        case _               => Map.empty
      })
  }

  /** Parse `<v>.checkpoint.json` if present and fully readable — either
    * a v2 segmented checkpoint or a legacy single-file full state. Any
    * missing segment or parse failure degrades to None (delta-walk
    * reconstruction); an entry with neither `checkpointV` nor `files`
    * is never read as an empty table.
    */
  private def readSnapshotCheckpoint(f: FileSystem, table: String,
                                     v: Long): Option[Snapshot] =
    try {
      val p = snapshotCheckpointFile(table, v)
      if (!f.exists(p)) None
      else scala.util.Try {
        val txt = readFileText(f, p)
        val j = JsonMethods.parse(txt)
        if (jLongOpt(j \ "checkpointV").isDefined) parseCheckpointV2(f, table, j)
        else {
          val e = parseLogEntry(txt)
          Snapshot(e.version, e.timestampMs, e.operation, e.schema,
            e.partitionColumns, e.full.get, e.txns, e.protocol, e.constraints)
        }
      }.toOption
    } catch { case _: java.io.IOException => None }

  /** Segments of the new checkpoint given the previous checkpoint's and
    * the plain deltas since it: reuse untouched segments, rewrite the
    * range-touched ones without their removed paths, and chunk the
    * window's adds — pooling runt segments into the chunking so they
    * fold forward instead of accumulating. O(segments touched + adds),
    * never O(table).
    */
  private def incrementalSegments(f: FileSystem, table: String,
                                  prev: Seq[SegmentRef], deltas: Seq[LogEntry],
                                  sortedNow: Seq[FileEntry],
                                  segTarget: Int): Seq[SegmentRef] = {
    val removed = deltas.flatMap(_.removes).toSet
    val addedPaths = deltas.flatMap(_.adds.map(_.path)).toSet
    val liveByPath = sortedNow.map(e => e.path -> e).toMap
    val added = sortedNow.filter(e => addedPaths(e.path)) // sorted already
    def touches(r: SegmentRef): Boolean =
      removed.exists(p => p >= r.minPath && p <= r.maxPath)
    val (touched, untouched) = prev.partition(touches)
    val rewritten = touched.flatMap { r =>
      // refresh surviving entries from the live snapshot (stats may have
      // upgraded); identical content re-publishes as itself — no write
      val entries = readSegment(f, table, r.name)
        .filterNot(e => removed(e.path))
        .map(e => liveByPath.getOrElse(e.path, e))
      if (entries.isEmpty) None else Some(writeSegment(f, table, entries))
    }
    // runts fold into this checkpoint's chunking (log-structured merge):
    // without this, streaming-cadence checkpoints leak one small segment
    // each and the manifest list grows O(checkpoints)
    val (runts, keep) = (untouched ++ rewritten).partition(_.count < segTarget / 2)
    val (pooledRunts, keptRunts) =
      if (added.nonEmpty || runts.size >= 2) (runts, Seq.empty[SegmentRef])
      else (Seq.empty[SegmentRef], runts)
    val pool = (added ++ pooledRunts.flatMap(r =>
      readSegment(f, table, r.name).map(e => liveByPath.getOrElse(e.path, e))))
      .sortBy(_.path)
    val pooled = pool.grouped(segTarget).filter(_.nonEmpty)
      .map(g => writeSegment(f, table, g)).toSeq
    val out = (keep ++ keptRunts ++ pooled).sortBy(_.minPath)
    // paranoia: the composed segments must account for exactly the live
    // set; any drift (however caused) falls back to a full re-chunk
    if (out.map(_.count).sum != sortedNow.size.toLong)
      chunkSegments(f, table, sortedNow, segTarget)
    else out
  }

  private def chunkSegments(f: FileSystem, table: String, sorted: Seq[FileEntry],
                            segTarget: Int): Seq[SegmentRef] =
    sorted.grouped(segTarget).filter(_.nonEmpty)
      .map(g => writeSegment(f, table, g)).toSeq

  private def writeSnapshotCheckpoint(spark: SparkSession, f: FileSystem,
                                      table: String, snap: Snapshot): Unit =
    try {
      val target = snapshotCheckpointFile(table, snap.version)
      if (f.exists(target)) return // deterministic content; first write stands
      val segTarget = math.max(1, segmentTargetEntries(spark))
      val sorted = snap.files.sortBy(_.path)
      val prevRefs = readCheckpointRefs(f, table, snap.version - checkpointInterval)
      // incremental only over a window of PLAIN deltas: a reset (its own
      // base) or legacy full-state entry in range means the previous
      // segments describe a dead lineage — re-chunk from the live list
      val window = prevRefs.flatMap { _ =>
        scala.util.Try {
          ((snap.version - checkpointInterval + 1) to snap.version)
            .map(v => parseLogEntry(readFileText(f, versionFile(table, v))))
        }.toOption.filter(_.forall(e => e.full.isEmpty && !e.reset))
      }
      val segs = (prevRefs, window) match {
        case (Some(refs), Some(deltas)) =>
          scala.util.Try(incrementalSegments(f, table, refs, deltas, sorted, segTarget))
            .getOrElse(chunkSegments(f, table, sorted, segTarget))
        case _ => chunkSegments(f, table, sorted, segTarget)
      }
      val tmp = new Path(logPath(table), s".cp-snap-tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(renderCheckpointV2(snap, segs).getBytes("UTF-8"))
      finally out.close()
      publishIfAbsent(f, tmp, target)
      ()
    } catch { case _: java.io.IOException => () } // advisory — never fail a commit

  /** Reconstruct the snapshot of `version`: nearest base at or below it
    * (snapshot checkpoint, legacy full-state entry, or `reset` delta),
    * then the deltas up to `version` applied in order. O(interval)
    * small metadata reads, independent of table size.
    */
  def snapshotAt(spark: SparkSession, table: String, version: Long): Snapshot =
    reconstruct(fs(spark, table), table, version)

  private def reconstruct(f: FileSystem, table: String, version: Long): Snapshot = {
    readSnapshotCheckpoint(f, table, version).getOrElse {
      val p = versionFile(table, version)
      if (!f.exists(p))
        throw new IllegalArgumentException(s"no version $version at $table")
      val head = parseLogEntry(readFileText(f, p))
      head.full match {
        case Some(files) =>
          Snapshot(version, head.timestampMs, head.operation, head.schema,
            head.partitionColumns, files, head.txns, head.protocol,
            head.constraints)
        case None =>
          // walk back to a base, collecting the delta chain (ascending)
          var chain: List[LogEntry] = List(head)
          var base: Seq[FileEntry] = if (head.reset) Seq.empty else null
          var cur = version
          while (base == null) {
            if (cur - 1 == 0) base = Seq.empty // first commit: empty base
            else readSnapshotCheckpoint(f, table, cur - 1) match {
              case Some(cp) => base = cp.files
              case None =>
                val q = versionFile(table, cur - 1)
                if (!f.exists(q))
                  throw new IllegalStateException(
                    s"cannot reconstruct version $version of $table: log entry " +
                      s"${cur - 1} is missing (foreign log deletion?)")
                val e = parseLogEntry(readFileText(f, q))
                e.full match {
                  case Some(files) => base = files
                  case None =>
                    chain ::= e
                    if (e.reset) base = Seq.empty
                    else cur -= 1
                }
            }
          }
          var files = base
          chain.foreach { d =>
            files =
              if (d.reset) d.adds
              else {
                val rm = d.removes.toSet
                (if (rm.isEmpty) files else files.filterNot(x => rm(x.path))) ++ d.adds
              }
          }
          Snapshot(version, head.timestampMs, head.operation, head.schema,
            head.partitionColumns, files, head.txns, head.protocol,
            head.constraints)
      }
    }
  }

  /** Commit `snap` as `snap.version` iff that version does not exist
    * yet, writing the DELTA (`adds`/`removes`/`reset`) — O(files
    * touched) JSON, never the full file list. `snap` is the full
    * post-commit state the caller derived; at every
    * `checkpointInterval`-th version the winner also rolls it into a
    * snapshot checkpoint (advisory). Returns false on a lost race
    * (version taken by another writer).
    */
  private[lake] def tryCommit(spark: SparkSession, table: String, snap: Snapshot,
                              adds: Seq[FileEntry], removes: Seq[String],
                              reset: Boolean = false,
                              cdc: Option[Seq[String]] = None,
                              prev: Option[Snapshot] = None,
                              constraintsUpdate: Option[Map[String, String]] = None,
                              removedFull: Seq[String] = Nil): Boolean = meteredCommit { meteredFileOps {
    // writer gate: refuse to commit over a log that demands a newer
    // writer (the invariants it encodes are unknown to this client);
    // the stamp is monotonic — a commit never downgrades the table's
    // protocol, so one upgraded writer doesn't strand later readers
    prev.map(_.protocol).foreach { p =>
      if (p.writer > MaxWriterVersion)
        throw new ProtocolVersionException(
          s"table $table requires writerVersion ${p.writer}, but this library " +
            s"writes up to writerVersion $MaxWriterVersion — upgrade the " +
            "library to write this table")
    }
    val stamped = snap.copy(
      protocol = Protocol(
        math.max(snap.protocol.reader, prev.map(_.protocol.reader).getOrElse(1)),
        math.max(snap.protocol.writer, prev.map(_.protocol.writer).getOrElse(1))),
      // CHECK constraints carry forward CENTRALLY (like the protocol
      // stamp): no DML path can silently drop them by forgetting to
      // thread the field; only an explicit ADD/DROP CONSTRAINT commit
      // replaces the set
      constraints = constraintsUpdate.getOrElse(
        prev.map(_.constraints).getOrElse(snap.constraints)))
    val f = fs(spark, table)
    f.mkdirs(logPath(table))
    val target = versionFile(table, stamped.version)
    if (f.exists(target)) return false // fast path only; atomicity is in the publish
    val tmp = new Path(logPath(table), s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(renderDelta(stamped, adds, removes, reset, cdc, removedFull)
      .getBytes("UTF-8"))
    finally out.close()
    val won = publishIfAbsent(f, tmp, target)
    if (won) {
      writeLatestHint(f, table, stamped.version)
      if (stamped.version % checkpointInterval == 0) {
        writeSnapshotCheckpoint(spark, f, table, stamped)
        writeHistoryCheckpoint(f, table, stamped.version)
      }
    }
    won
  }}

  // ------------------------------------------------------ commit publishing
  //
  // Publishing a version file is delegated to a per-scheme
  // CommitPublisher (the pluggable seam an object-store deployment
  // fills in). Only schemes with a KNOWN-atomic put-if-absent ship
  // built in; anything else is refused loudly at commit time — the
  // alternative is a commit protocol that silently degrades to
  // last-writer-wins under concurrency.

  private val commitPublishers =
    new java.util.concurrent.ConcurrentHashMap[String, CommitPublisher]()
  commitPublishers.put("file", HardLinkPublisher)
  // hdfs/viewfs: single-namespace-op no-overwrite rename; abfs(s): ADLS
  // Gen2 hierarchical namespace, true atomic rename; cfs: this repo's
  // counting test filesystem (a RawLocal delegate — same contract)
  Seq("hdfs", "viewfs", "abfs", "abfss", "cfs").foreach(
    commitPublishers.put(_, RenameNonePublisher))

  /** Register (or replace) the [[CommitPublisher]] for a URI scheme —
    * how an S3-family deployment supplies its conditional-PUT /
    * lock-table primitive. See [[CommitPublisher]] for the contract.
    */
  def registerCommitPublisher(scheme: String, p: CommitPublisher): Unit =
    commitPublishers.put(scheme.toLowerCase(java.util.Locale.ROOT), p)

  private def publisherFor(f: FileSystem): CommitPublisher = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
      .toLowerCase(java.util.Locale.ROOT)
    commitPublishers.get(scheme) match {
      case null => throw new UnsupportedOperationException(
        s"no atomic commit publisher is registered for filesystem scheme " +
          s"'$scheme' — the commit protocol requires an atomic put-if-absent " +
          "primitive, and this scheme has no known-safe rename/link (S3-family " +
          "stores notably lack one: without it, concurrent writers degrade to " +
          "last-writer-wins and lose snapshots). Register one with " +
          "LakeTable.registerCommitPublisher(scheme, publisher) backed by a " +
          "conditional PUT or an external lock service")
      case p => p
    }
  }

  /** Atomically publish the fully-written `tmp` as `target` iff `target`
    * does not exist, via the scheme's registered [[CommitPublisher]].
    */
  private[lake] def publishIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean = {
    val won = publisherFor(f).publishIfAbsent(f, tmp, target)
    // link path: tmp still exists either way; rename path: only on loss.
    try f.delete(tmp, false) catch { case _: java.io.IOException => () }
    won
  }

  // ------------------------------------------------------------- data files

  /** Write `df` to a transient staging dir, then move the part files
    * into the shared `data/` tree (preserving hive partition subdirs).
    * Part file names embed the write job's UUID, so moves never
    * collide. Returns the new files as log entries, with size/mtime and
    * footer stats collected while the just-written files are
    * page-cache-warm — the one moment metadata is cheap; every later
    * reader plans from the log alone.
    */
  private def stageFiles(spark: SparkSession, table: String, df: DataFrame,
                         partitionBy: Seq[String],
                         mapping: Map[String, String] = Map.empty,
                         checks: Map[String, String] = Map.empty,
                         replaceLayout: Boolean = false): Seq[FileEntry] = {
    val snapMeta = latestSnapshot(spark, table)
    // CHECK constraints evaluate over LOGICAL names, in-flight, before
    // any physical renaming — see withChecks
    val checked = withChecks(spark, table, df, checks)
    // column mapping: files (and therefore their footer stats, and the
    // stats recorded in the log) always carry PHYSICAL column names —
    // `mapping` is the caller's authoritative logical → physical map
    // for this commit's schema; identity (or empty) for unmapped tables
    val physDf = ColumnMapping.renameToPhysical(checked, mapping)
    val physParts = partitionBy.map(p => mapping.getOrElse(p, p))
    // generated partition columns: re-derive from the source on EVERY
    // write path (the transform is a pure function, so recomputation is
    // idempotent) — appends, streaming appends, CoW rewrites, dynamic
    // partition overwrite and compaction all preserve "stored value ==
    // transform(source)". A creation frame's own stamps win; a
    // layout-keeping write inherits the table's; a layout-replacing
    // overwrite without stamps de-generates, like de-bucketing.
    val genSpecs = {
      val own = GeneratedColumns.specs(df.schema)
      if (own.nonEmpty) own
      else if (replaceLayout) Nil
      else snapMeta.map(s => GeneratedColumns.specs(s.schema)).getOrElse(Nil)
    }
    val gened =
      if (genSpecs.isEmpty) physDf
      else {
        val snapMapping = snapMeta.map(s => ColumnMapping.mapping(s.schema))
          .getOrElse(Map.empty[String, String])
        GeneratedColumns.derive(physDf, genSpecs,
          n => mapping.getOrElse(n, snapMapping.getOrElse(n, n)))
      }
    // bucketed layout: the incoming frame's schema stamps win (a
    // bucketed (re)creation); otherwise a layout-keeping write (append,
    // CoW rewrite, compact) inherits the table's spec, so EVERY write
    // path preserves "all live data files are bucket files". A
    // layout-replacing write (overwrite) with an unstamped frame
    // de-buckets — overwrite replaces the schema wholesale, spec
    // included.
    val bucketing = Bucketing.spec(df.schema).orElse(
      if (replaceLayout) None
      else snapMeta.flatMap(s => Bucketing.spec(s.schema)))
    val routed = bucketing match {
      case Some(sp) =>
        val bcols = sp.bucketCols.map(c => col(mapping.getOrElse(c, c)))
        // HashPartitioning: partition id = pmod(murmur3(bucketCols), n)
        // — the exact function FileSourceScanExec assumes of bucket
        // files, so the staged task id IS the bucket id
        val rp = gened.repartition(sp.numBuckets, bcols: _*)
        if (sp.sortCols.isEmpty) rp
        else rp.sortWithinPartitions(
          (physParts ++ sp.sortCols.map(c => mapping.getOrElse(c, c))).map(col): _*)
      case None => gened
    }
    val f = fs(spark, table)
    val staging = new Path(new Path(table, "_staging"), java.util.UUID.randomUUID().toString)
    // no _SUCCESS marker: the log, not a marker file, defines commit
    // visibility — and the bulk-move publish would otherwise carry the
    // marker into data/ as litter
    val writer = routed.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    try meteredCommit((if (physParts.nonEmpty) writer.partitionBy(physParts: _*) else writer)
      .parquet(staging.toString))
    catch {
      case e: Throwable =>
        // a failed staging write (e.g. an in-flight CHECK-constraint
        // violation) must not leave partial files behind
        try f.delete(staging, true) catch { case _: java.io.IOException => () }
        throw e
    }

    // the staged listing's FileStatus stands for the published file:
    // rename preserves length and mtime, so no per-file re-stat after
    // the move (one round trip per file saved on an object store)
    val staged = meteredCommit { meteredFileOps {
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, Path, Long, Long)]
      val it = f.listFiles(staging, true)
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet")) {
          b += ((relativize(staging, st.getPath), st.getPath,
            st.getLen, st.getModificationTime))
        }
      }
      b
    }}
    // partition column values live in the dir path, not the file — only
    // data columns have footer stats (physical names: the files' own)
    val dataSchema = StructType(gened.schema.filterNot(fl => physParts.contains(fl.name)))
    val conf = spark.sessionState.newHadoopConf()
    // An unpartitioned, unbucketed commit (staged files all at the
    // staging root) publishes its data files with ONE directory rename
    // — data/<batch-uuid>/<part-file> — instead of a move per file:
    // the log's paths are opaque table-relative names, so the extra
    // level costs readers nothing (partition parsing is a no-op on an
    // empty partition schema), and the per-file rename+mkdirs round
    // trips vanish from the commit path (guide §6). Hive-partitioned
    // layouts keep per-file moves (their dir names ARE semantics);
    // bucketed commits keep them too (the move renames the file to
    // carry its bucket id).
    val bulkMove = bucketing.isEmpty && physParts.isEmpty &&
      staged.nonEmpty && staged.forall(s => !s._1.contains('/'))
    // move + stat + footer-read PER FILE, fanned out on a bounded pool:
    // serially this is the driver-side commit bottleneck once a write
    // stages thousands of files (each footer read is a GET on an object
    // store); the files are independent, so the wall cost drops to
    // ceil(files / threads) round trips
    val entries =
      try {
        if (bulkMove) {
          val batchDir = staging.getName // the write's UUID — unique
          val destDir = new Path(dataPath(table), batchDir)
          meteredCommit { meteredFileOps {
            f.mkdirs(dataPath(table))
            if (!f.rename(staging, destDir))
              throw new IllegalStateException(s"could not move $staging to $destDir")
          }}
          stageParallel(staged.toSeq) { case (rel0, _, len, mtime) =>
            val rel = s"$batchDir/$rel0"
            val (rows, stats) =
              ParquetStats.collect(conf, new Path(dataPath(table), rel), dataSchema)
            FileEntry(rel, len, mtime, rows, stats)
          }
        } else if (bucketing.isEmpty && physParts.nonEmpty) {
          // hive-partitioned, unbucketed: publish each staged leaf
          // partition directory with ONE rename —
          // <k=v dirs>/<batch-uuid>/<part-file> — instead of a move per
          // file (guide §6, the partitioned sibling of bulkMove above).
          // Partition identity is carried by the LEADING k=v segments,
          // which every consumer parses by name (PartitionPaths.valuesOf)
          // or by leading run (partitionDirOf), so the nested batch dir
          // is invisible to partition semantics. Single-file partitions
          // keep the flat per-file move (a dir rename would add nesting
          // for no round-trip win).
          val batchDir = staging.getName
          val byDir = staged.toSeq.groupBy { case (rel0, _, _, _) =>
            val i = rel0.lastIndexOf('/')
            if (i < 0) "" else rel0.substring(0, i)
          }.toSeq.sortBy(_._1)
          val moved = stageParallel(byDir) { case (pdir, files) =>
            val destParent =
              if (pdir.isEmpty) dataPath(table) else new Path(dataPath(table), pdir)
            f.mkdirs(destParent)
            if (files.size > 1 && pdir.nonEmpty) {
              val destDir = new Path(destParent, batchDir)
              if (!f.rename(new Path(staging, pdir), destDir))
                throw new IllegalStateException(
                  s"could not move ${new Path(staging, pdir)} to $destDir")
              files.map { case (rel0, _, len, mtime) =>
                (s"$pdir/$batchDir/${rel0.substring(pdir.length + 1)}", len, mtime)
              }
            } else files.map { case (rel0, src, len, mtime) =>
              val dest = new Path(dataPath(table), rel0)
              if (!f.rename(src, dest))
                throw new IllegalStateException(s"could not move $src to $dest")
              (rel0, len, mtime)
            }
          }
          stageParallel(moved.flatten) { case (rel, len, mtime) =>
            val (rows, stats) =
              ParquetStats.collect(conf, new Path(dataPath(table), rel), dataSchema)
            FileEntry(rel, len, mtime, rows, stats)
          }
        } else {
          // mkdirs once per distinct destination directory, not per file
          meteredCommit { meteredFileOps {
            staged.map { case (rel0, _, _, _) =>
              new Path(dataPath(table), rel0).getParent
            }.distinct.foreach(f.mkdirs)
          }}
          stageParallel(staged.toSeq) { case (rel0, src, len, mtime) =>
            // bucketed commit: the staged name's task id (= bucket id under
            // the repartition above) moves into Spark's bucket-file naming,
            // `_NNNNN` before the extension — what BucketingUtils parses
            val rel = bucketing match {
              case Some(_) =>
                val slash = rel0.lastIndexOf('/')
                val (dir, name) = rel0.splitAt(slash + 1)
                val tid = Bucketing.taskIdOf(name).getOrElse(
                  throw new IllegalStateException(
                    s"staged file $name carries no task id — cannot assign its bucket"))
                dir + Bucketing.bucketedName(name, tid)
              case None => rel0
            }
            val dest = new Path(dataPath(table), rel)
            if (!f.rename(src, dest))
              throw new IllegalStateException(s"could not move $src to $dest")
            val (rows, stats) = ParquetStats.collect(conf, dest, dataSchema)
            FileEntry(rel, len, mtime, rows, stats)
          }
        }
      }
      finally f.delete(staging, true)
    // bloom sidecar for flagged columns: the table's CURRENT schema
    // metadata names them (enableBloomFilter); the build reads the
    // just-moved, page-cache-warm files once, distributed. Flags are
    // logical names; the staged files (and the probe-side stats path)
    // carry physical names, so translate through this write's mapping.
    val flagged = snapMeta
      .map(s => BloomIndex.flaggedColumns(s.schema)).getOrElse(Nil)
    if (flagged.isEmpty || entries.isEmpty) entries
    else {
      val byPhys = flagged.flatMap { case (logical, fpp) =>
        val phys = mapping.getOrElse(logical, logical)
        dataSchema.fields.find(_.name == phys).map(fl => (phys, fl.dataType, fpp))
      }
      BloomIndex.buildSidecar(spark, table, entries.map(_.path), byPhys,
        entries.map(e => e.path -> e.rowCount).toMap) match {
        case Some(sidecar) => entries.map(_.copy(bloom = Some(sidecar)))
        case None => entries
      }
    }
  }

  // ------------------------------------------------------ commit-time meter
  //
  // Wall nanos spent inside the commit MACHINERY, accumulated JVM-wide
  // as TWO counters with different envelopes:
  //   - commitNanos: staged parquet write + per-file move/stat/footer
  //     fan-out + log write/publish. NOTE the staged write executes the
  //     entire upstream query plan (the joins/aggregations producing
  //     the rows), so for write-heavy keys this INCLUDES engine
  //     compute — it bounds "time under the write path", not pure FS
  //     machinery.
  //   - fileOpsNanos: ONLY the post-execution file operations —
  //     listing/moving/stat'ing staged files, footer-stats reads, log
  //     write + publish. This is the FS-latency-bound part that tracks
  //     the write canary's regime.
  // Bench samples deltas of both around each key (commit_s /
  // fileops_s in BENCH_DETAIL), so box-level write-path drift is
  // attributable without overstating it as the whole staged write.
  private val commitNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val meterDepth = new ThreadLocal[Integer] { override def initialValue = Integer.valueOf(0) }
  private val fileOpsNanosAcc = new java.util.concurrent.atomic.AtomicLong(0L)
  private val fileOpsDepth = new ThreadLocal[Integer] { override def initialValue = Integer.valueOf(0) }

  /** Cumulative commit-machinery wall nanos in this JVM (includes the
    * staged write's query execution — see the section comment).
    */
  def commitNanos: Long = commitNanosAcc.get()

  /** Cumulative post-execution commit file-operation wall nanos in
    * this JVM (move/stat/footer/log/publish only — no query compute).
    */
  def fileOpsNanos: Long = fileOpsNanosAcc.get()

  /** Meter `body` into [[commitNanos]]; nested spans on the same
    * thread count once (outermost wins).
    */
  @inline private def meteredCommit[T](body: => T): T = {
    val d = meterDepth.get.intValue
    meterDepth.set(Integer.valueOf(d + 1))
    val t0 = System.nanoTime()
    try body finally {
      meterDepth.set(Integer.valueOf(d))
      if (d == 0) commitNanosAcc.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Meter `body` into [[fileOpsNanos]] (outermost wins per thread);
    * composes with [[meteredCommit]] — the two counters are
    * independent.
    */
  @inline private def meteredFileOps[T](body: => T): T = {
    val d = fileOpsDepth.get.intValue
    fileOpsDepth.set(Integer.valueOf(d + 1))
    val t0 = System.nanoTime()
    try body finally {
      fileOpsDepth.set(Integer.valueOf(d))
      if (d == 0) fileOpsNanosAcc.addAndGet(System.nanoTime() - t0)
    }
  }

  /** Run two INDEPENDENT staged writes concurrently (guide §2.6/§5:
    * a DML commit's data-file, change-feed and deletion-vector writes
    * share no lineage beyond already-persisted inputs, so running them
    * serially leaves the cluster idle during each one's driver-side
    * planning). `b` runs on a helper thread with the commit/fileops
    * meters SUPPRESSED — the caller's wall clock already covers the
    * overlapped region once, and double-counting both threads would
    * inflate commit_s beyond wall time. Spark actions are thread-safe;
    * the helper thread inherits the caller's job group/description
    * (InheritableThreadLocal) so bench job labels stay attached.
    */
  private def stageConcurrently[A, B](a: => A)(b: => B): (A, B) = meteredCommit {
    // the whole overlapped region (including the join wait) meters as
    // the CALLER's commit wall, once — nested meters inside `a` are
    // depth-guarded, `b`'s thread is suppressed outright
    val rb = new java.util.concurrent.atomic.AtomicReference[Either[Throwable, B]]()
    val t = new Thread(() => {
      meterDepth.set(Integer.valueOf(1))
      fileOpsDepth.set(Integer.valueOf(1))
      rb.set(
        try Right(b)
        catch { case e: Throwable => Left(e) })
    }, "graft-staging")
    t.setDaemon(true)
    t.start()
    val ra =
      try a
      catch { case e: Throwable => t.join(); throw e }
    t.join()
    rb.get() match {
      case Right(v) => (ra, v)
      case Left(e)  => throw e
    }
  }

  /** Run `body` over the items on a bounded thread pool, preserving
    * order; the first failure propagates (remaining work is not
    * awaited beyond cancellation).
    */
  private def stageParallel[A, B](items: Seq[A])(body: A => B): Seq[B] = meteredCommit { meteredFileOps {
    if (items.size <= 1) return items.map(body)
    val threads = math.min(16, items.size)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    try {
      val futures = items.map(a => pool.submit(new java.util.concurrent.Callable[B] {
        def call(): B = body(a)
      }))
      futures.map { fu =>
        try fu.get()
        catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
      }
    } finally pool.shutdownNow()
  }}

  // ------------------------------------------------------ change data feed

  /** Column names of the change feed (Delta's public convention). */
  val ChangeTypeCol = "_change_type"
  val CommitVersionCol = "_commit_version"
  val CommitTimestampCol = "_commit_timestamp"

  private[lake] def changeDataPath(table: String) = new Path(table, "_change_data")

  /** Write `df` (already carrying `_change_type`) as this commit's
    * change-data files, returning their table-root-relative paths for
    * the log entry. Like [[stageFiles]] but into `_change_data/`, no
    * hive partitioning, no stats (the feed is read whole per commit).
    */
  private def stageChangeFiles(spark: SparkSession, table: String,
                               df: DataFrame): Seq[String] = {
    val f = fs(spark, table)
    val staging = new Path(new Path(table, "_staging"), java.util.UUID.randomUUID().toString)
    meteredCommit(df.write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(staging.toString))
    // change files are never partitioned: publish the whole staged dir
    // with ONE rename — _change_data/<batch-uuid>/<part-file> — the
    // feed reader takes the recorded paths verbatim, so the extra
    // level is free (see the bulk-move note in stageFiles)
    meteredCommit { meteredFileOps {
      val staged = scala.collection.mutable.ArrayBuffer.empty[String]
      val it = f.listFiles(staging, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(".parquet"))
          staged += relativize(staging, st.getPath)
      }
      try {
        if (staged.isEmpty) Nil
        else {
          val batchDir = staging.getName
          val destDir = new Path(changeDataPath(table), batchDir)
          f.mkdirs(changeDataPath(table))
          if (!f.rename(staging, destDir))
            throw new IllegalStateException(s"could not move $staging to $destDir")
          staged.toSeq.map(rel => s"_change_data/$batchDir/$rel")
        }
      } finally f.delete(staging, true)
    }}
  }

  /** Row-level changes of exactly version `v`: the table columns of
    * that commit's schema plus `_change_type` ('insert' | 'delete' |
    * 'update_preimage' | 'update_postimage'), `_commit_version`, and
    * `_commit_timestamp`. `None` for COMPACT (bytes moved, no rows
    * changed). DML commits read their recorded change files;
    * append-shaped commits synthesize inserts from their added files;
    * OVERWRITE synthesizes the previous snapshot as deletes plus the
    * new files as inserts. A legacy row-rewriting commit with no
    * recorded change data fails loudly — its row-level delta is
    * unknowable after the fact.
    */
  private[lake] def changesOf(spark: SparkSession, table: String,
                              v: Long): Option[DataFrame] =
    changesOfEntry(spark, table, logEntryAt(spark, table, v))

  private[lake] def changesOfEntry(spark: SparkSession, table: String,
                                   e: LogEntry): Option[DataFrame] = {
    val v = e.version
    def decorate(df: DataFrame, changeType: Option[String]): DataFrame = {
      val typed = changeType.map(t => df.withColumn(ChangeTypeCol, lit(t))).getOrElse(df)
      typed
        .withColumn(CommitVersionCol, lit(v))
        .withColumn(CommitTimestampCol, lit(e.timestampMs))
    }
    // entry-aware read: a snapshot / add-list may carry deletion
    // vectors (e.g. a RESTORE re-referencing dv'd entries) whose
    // deleted rows must not appear in synthesized change rows
    def readEntries(entries: Seq[FileEntry], schema: StructType): DataFrame =
      morScan(spark, table,
        Snapshot(v, e.timestampMs, e.operation, schema, e.partitionColumns, entries),
        entries, keepPos = false)
    def emptyChanges: DataFrame = decorate(
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        GraftDataSource.asNullable(e.schema)).withColumn(ChangeTypeCol, lit("insert"))
        .filter(lit(false)), None)
    // metadata-only drops (removedFull): the dropping commit recorded
    // no change rows for these files (reading them would defeat the
    // drop); synthesize their rows as deletes from the previous
    // snapshot's entries — dv state honored — and union with whatever
    // the commit DID record
    def removedFullDeletes: Option[DataFrame] =
      if (e.removedFull.isEmpty) None
      else {
        val rset = e.removedFull.toSet
        val prev = snapshotAt(spark, table, v - 1)
        val removed = prev.files.filter(f => rset.contains(f.path))
        if (removed.isEmpty) None
        else Some(decorate(readEntries(removed, prev.schema), Some("delete")))
      }
    if (e.operation == "COMPACT") None
    else if (e.cdc.exists(_.nonEmpty)) {
      // recorded change files carry the table columns + _change_type
      val recorded = decorate(spark.read.parquet(
        e.cdc.get.map(rel => new Path(table, rel).toString): _*), None)
      Some(removedFullDeletes.fold(recorded)(d =>
        recorded.unionByName(d, allowMissingColumns = true)))
    } else if (e.cdc.isDefined) {
      // recorded, and genuinely empty (e.g. a conditional merge where
      // no clause fired) — a real empty change set, not a legacy gap
      Some(removedFullDeletes.getOrElse(emptyChanges))
    } else e.full match {
      case Some(_) =>
        throw new UnsupportedOperationException(
          s"change feed of $table: version $v is a legacy full-state commit " +
            "(pre-change-feed) — its row-level changes were not recorded")
      case None if e.reset =>
        // overwrite: everything before is deleted, everything added
        // inserts. Version 1 has no previous snapshot — a table CREATED
        // by overwrite (the common case) starts from the empty base,
        // mirroring reconstruct's "first commit: empty base" rule.
        val deletes =
          if (v == 1) emptyChanges
          else {
            val prev = snapshotAt(spark, table, v - 1)
            if (prev.files.isEmpty) emptyChanges
            else decorate(readEntries(prev.files, prev.schema), Some("delete"))
          }
        val inserts =
          if (e.adds.isEmpty) emptyChanges
          else decorate(readEntries(e.adds, e.schema), Some("insert"))
        Some(deletes.unionByName(inserts, allowMissingColumns = true))
      case None if e.operation == "OVERWRITE PARTITIONS" || e.operation == "PUBLISH" =>
        // dynamic partition overwrite — and a WAP branch PUBLISH, which
        // has the same commit shape — synthesize like OVERWRITE, but
        // scoped: deletes are the rows of exactly the REPLACED files
        // (recovered from the previous snapshot so their dv state is
        // honored), inserts are the added files' rows
        val removedSet = e.removes.toSet
        val deletes =
          if (removedSet.isEmpty) emptyChanges
          else {
            val prev = snapshotAt(spark, table, v - 1)
            val removed = prev.files.filter(f => removedSet.contains(f.path))
            if (removed.isEmpty) emptyChanges
            else decorate(readEntries(removed, prev.schema), Some("delete"))
          }
        val inserts =
          if (e.adds.isEmpty) emptyChanges
          else decorate(readEntries(e.adds, e.schema), Some("insert"))
        Some(deletes.unionByName(inserts, allowMissingColumns = true))
      case None if e.removes.nonEmpty =>
        throw new UnsupportedOperationException(
          s"change feed of $table: version $v (${e.operation}) rewrote rows but " +
            "recorded no change data (written before the change feed existed?)")
      case None =>
        // append-shaped: added files ARE the inserted rows
        if (e.adds.isEmpty) Some(emptyChanges)
        else Some(decorate(readEntries(e.adds, e.schema), Some("insert")))
    }
  }

  /** The change feed over the inclusive version range — Delta's
    * `table_changes` analog: every row-level change each commit made,
    * typed and stamped with its commit version/timestamp. Reading a
    * graft table incrementally through this is what turns a 100 TB
    * dedup/update pipeline from recompute-the-world into
    * propagate-the-delta. Columns follow the latest schema in the
    * range (earlier commits' missing columns read null).
    */
  def changes(spark: SparkSession, table: String, startVersion: Long,
              endVersion: Long): DataFrame = {
    require(startVersion >= 1 && startVersion <= endVersion,
      s"invalid change range [$startVersion, $endVersion]")
    val frames = (startVersion to endVersion).flatMap(changesOf(spark, table, _))
    frames.reduceOption((a, b) => a.unionByName(b, allowMissingColumns = true))
      .getOrElse {
        // every commit in range was maintenance (COMPACT): a truthful
        // empty feed, typed to the range-end schema — callers like
        // Incremental fold it as "nothing changed", not an error
        val schema = GraftDataSource.asNullable(
          snapshotAt(spark, table, endVersion).schema)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
          .withColumn(ChangeTypeCol, lit("insert"))
          .withColumn(CommitVersionCol, lit(endVersion))
          .withColumn(CommitTimestampCol, lit(0L))
          .filter(lit(false))
      }
  }

  /** Decoded filesystem path of an `input_file_name()` value. */
  private def decodeFileUri(fileUri: String): String =
    try new Path(new java.net.URI(fileUri)).toUri.getPath
    catch { case _: java.net.URISyntaxException => new Path(fileUri).toUri.getPath }

  private[lake] def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/")
    val s = p.toUri.getPath
    require(s.startsWith(b + "/"), s"$p not under $base")
    s.drop(b.length + 1)
  }

  /** A FOREIGN entry is a zero-copy [[shallowClone]] reference: an
    * absolute URI into the SOURCE table's data root, vs the normal
    * data-root-relative path. (Local-FS qualified paths render as
    * `file:/x` — single slash — so test `:/`, not `://`.)
    */
  private[lake] def isForeignEntry(rel: String): Boolean =
    rel.startsWith("/") || rel.contains(":/")

  /** The exact string `_metadata.file_path` yields for a log path.
    * Spark publishes scan paths as RFC-2396-percent-encoded URIs
    * (SparkPath), while log entries store Hadoop `Path.toString`
    * (decoded) forms — a path with a space would compare unequal
    * verbatim. Building a `Path` and taking `toUri` applies the same
    * quoting the scan does, so every driver-side literal compared
    * against [[FilePathCol]] or a deletion-vector key must pass
    * through these. Paths without percent-encodable characters
    * round-trip unchanged, so this is a no-op on conventional layouts.
    */
  private[lake] def scanFormAbs(p: String): String = scanFormPath(new Path(p))

  /** [[scanFormAbs]] for a data-root-relative log path. */
  private[lake] def scanFormRel(rel: String): String = scanFormPath(new Path(rel))

  /** Render like Hadoop `Path.toString` (scheme:, `//authority` only
    * when non-empty — `makeQualified` on a local fs yields an EMPTY
    * authority while listed statuses carry none, and `URI.toString`
    * would print them differently) but with the RAW (encoded) path.
    */
  private[lake] def scanFormPath(p: Path): String = {
    val u = p.toUri
    val sb = new StringBuilder
    if (u.getScheme != null) sb.append(u.getScheme).append(':')
    if (u.getAuthority != null && u.getAuthority.nonEmpty)
      sb.append("//").append(u.getAuthority)
    sb.append(u.getRawPath)
    sb.toString
  }

  /** A log entry's deletion-vector key: scan-form relative for local
    * files, scan-form absolute for cloned (foreign) references — the
    * domain every stored dv `p` value lives in.
    */
  private[lake] def scanKey(e: FileEntry): String =
    if (isForeignEntry(e.path)) scanFormAbs(e.path) else scanFormRel(e.path)

  /** The physical location of a log entry's file. */
  private[lake] def entryPath(dataRoot: Path, rel: String): Path =
    if (isForeignEntry(rel)) new Path(rel) else new Path(dataRoot, rel)

  /** The source data root of a foreign file: strip the file name, any
    * nested batch dirs (bulk-move publishes nest an opaque uuid dir
    * inside the partition dir, so depth is NOT fixed) and one hive
    * `k=v` dir per partition column. Counting `k=v` segments is exact:
    * hive-escaped values cannot contain a literal `=`. This is what
    * `basePath` must be for Spark to parse the partition values from
    * the foreign dirs.
    */
  private def foreignBasePath(abs: String, numPartCols: Int): String = {
    var p = new Path(abs).getParent // the file name
    var remaining = numPartCols
    while (remaining > 0) {
      if (p.getName.contains('=')) remaining -= 1
      p = p.getParent
    }
    p.toString
  }

  /** Per-root parquet legs over a mixed local/foreign file list: all
    * local files read under the table's own data root, foreign
    * (cloned) files group by their SOURCE roots — `basePath` is
    * per-scan state, so one read cannot span roots. Callers apply
    * their own projections per leg (scan pseudo-columns like
    * `_metadata` do not survive a union) and union the results.
    */
  private[lake] def parquetLegs(spark: SparkSession, table: String,
                                physSchema: StructType, relPaths: Seq[String],
                                numPartCols: Int): Seq[DataFrame] = {
    val base = dataPath(table)
    val (foreign, local) = relPaths.partition(isForeignEntry)
    val legs =
      (if (local.isEmpty) Nil
       else Seq(base.toString -> local.map(r => new Path(base, r).toString))) ++
      foreign.groupBy(foreignBasePath(_, numPartCols)).toSeq.sortBy(_._1)
    legs.map { case (bp, files) =>
      spark.read.option("basePath", bp).schema(physSchema).parquet(files: _*)
    }
  }

  /** Read specific data files of a snapshot directly (the rewrite /
    * feed paths that bypass the registered source), translated for
    * column mapping: the parquet read requests the PHYSICAL schema
    * (deep-nullable — evolved columns are absent from old files) and
    * the result renames back to `schema`'s logical names, in schema
    * order. Identity rename for unmapped tables. Foreign (cloned)
    * entries read from their source roots ([[parquetLegs]]).
    */
  private[lake] def readDataFiles(spark: SparkSession, table: String,
                                  schema: StructType,
                                  relPaths: Seq[String],
                                  numPartCols: Int): DataFrame = {
    val nullable = GraftDataSource.asNullable(schema)
    val legs = parquetLegs(spark, table, ColumnMapping.physicalSchema(nullable),
      relPaths, numPartCols)
    legs.map(_.select(nullable.fields.map(f =>
      col(ColumnMapping.physicalName(f)).as(f.name)).toIndexedSeq: _*))
      .reduce(_ unionByName _)
  }

  // ------------------------------------------------- merge-on-read reads
  //
  // A snapshot whose entries carry deletion vectors cannot be served by
  // the plain HadoopFsRelation scan (it would read deleted rows back).
  // The MoR scan is a two-leg composition: dv-free files read exactly
  // as before; dv-bearing files read WITH the parquet reader's
  // per-file physical row index (`_metadata.row_index` — computed
  // correctly even under splits and row-group skipping) and are
  // LEFT-ANTI joined against the referenced deletion-vector rows on
  // (file, position). The dv side is bounded by deleted-row count (the
  // point-delete case this path exists for), so it broadcasts; user
  // filters sit above one logical plan and push into both legs' parquet
  // scans via Catalyst as usual.

  /** Column names the MoR scan uses for file identity + row position.
    * Underscored like Delta's internal columns; dropped before rows
    * reach a user unless the caller asks to keep them (detection
    * scans).
    */
  private[lake] val FilePathCol = "__graft_file_path"
  private[lake] val RowPosCol = "__graft_row_pos"

  private[lake] def hasDv(snap: Snapshot): Boolean = snap.files.exists(_.dv.isDefined)

  /** The absolute data-root prefix EXACTLY as the scan's
    * `_metadata.file_path` renders file paths (Hadoop's
    * `Path.toString` of the qualified path — `file:/x`, not the URI
    * form `file:///x`). Rows that violate the assumption fail loudly in
    * [[deleteMergeOnRead]]'s relativization rather than mis-joining.
    */
  private def qualifiedDataPrefix(spark: SparkSession, table: String): String =
    fs(spark, table).makeQualified(dataPath(table)).toString

  /** [[qualifiedDataPrefix]] in the scan form ([[scanFormAbs]]) — the
    * prefix `_metadata.file_path` values of local files start with.
    */
  private def scanDataPrefix(spark: SparkSession, table: String): String =
    scanFormPath(fs(spark, table).makeQualified(dataPath(table))) + "/"

  /** Threshold (rows) under which the dv side of the MoR anti-join is
    * broadcast. Above it the join falls back to a shuffle — correct but
    * a sign the table wants a [[compact]] to reconcile its vectors.
    */
  private def dvBroadcastRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.dv.broadcastRows").map(_.toLong).getOrElse(1000000L)

  /** All (file-relative-path, position) rows of the given entries'
    * deletion vectors. May contain rows for OTHER files sharing a dv
    * directory — callers join/filter by file, so extras are inert.
    */
  private def dvRows(spark: SparkSession, table: String, entries: Seq[FileEntry]): DataFrame = {
    val dirs = entries.flatMap(_.dv.map(_.path)).distinct
    val schema = StructType(Seq(StructField("p", org.apache.spark.sql.types.StringType),
      StructField("pos", org.apache.spark.sql.types.LongType)))
    spark.read.schema(schema).parquet(dirs.map(rel => new Path(table, rel).toString): _*)
  }

  /** [[readDataFiles]] plus the scan's file path and physical row
    * position as [[FilePathCol]]/[[RowPosCol]].
    */
  private def readDataFilesWithPos(spark: SparkSession, table: String,
                                   schema: StructType,
                                   relPaths: Seq[String],
                                   numPartCols: Int): DataFrame = {
    val nullable = GraftDataSource.asNullable(schema)
    val legs = parquetLegs(spark, table, ColumnMapping.physicalSchema(nullable),
      relPaths, numPartCols)
    // _metadata is a per-scan pseudo-column: select it per leg
    legs.map(_.select(nullable.fields.map(f =>
      col(ColumnMapping.physicalName(f)).as(f.name)).toIndexedSeq
      :+ col("_metadata.file_path").as(FilePathCol)
      :+ col("_metadata.row_index").as(RowPosCol): _*))
      .reduce(_ unionByName _)
  }

  /** Scan `entries` of `snap` with their deletion vectors applied.
    * Output columns are the snapshot's logical schema, plus
    * [[FilePathCol]]/[[RowPosCol]] when `keepPos` (the detection-scan
    * form — the DV-safe replacement for `input_file_name()`).
    */
  private[lake] def morScan(spark: SparkSession, table: String, snap: Snapshot,
                            entries: Seq[FileEntry], keepPos: Boolean): DataFrame = {
    val (dvd, plain) = entries.partition(_.dv.isDefined)
    val dvdLeg = if (dvd.isEmpty) None else Some {
      val df = readDataFilesWithPos(spark, table, snap.schema, dvd.map(_.path),
        snap.partitionColumns.size)
      val prefix = scanDataPrefix(spark, table)
      // a CLONED vector's rows key on the source files' ABSOLUTE URIs
      // (shallowClone re-keys them — foreign entries live outside this
      // table's data root); local rows stay data-root-relative
      val del = dvRows(spark, table, dvd)
        .select(when(col("p").startsWith("/") || col("p").contains(":/"), col("p"))
          .otherwise(concat(lit(prefix), col("p"))).as("__dv_file"),
          col("pos").as("__dv_pos"))
      val card = dvd.flatMap(_.dv).map(_.cardinality).sum
      val delHinted = if (card <= dvBroadcastRows(spark)) broadcast(del) else del
      val kept = df.join(delHinted,
        df(FilePathCol) === delHinted("__dv_file") &&
          df(RowPosCol) === delHinted("__dv_pos"), "left_anti")
      if (keepPos) kept else kept.drop(FilePathCol, RowPosCol)
    }
    val plainLeg =
      if (plain.isEmpty) None
      else if (keepPos) Some(readDataFilesWithPos(spark, table, snap.schema,
        plain.map(_.path), snap.partitionColumns.size))
      else Some(readDataFiles(spark, table, snap.schema, plain.map(_.path),
        snap.partitionColumns.size))
    (plainLeg, dvdLeg) match {
      case (Some(a), Some(b)) => a.unionByName(b)
      case (Some(a), None)    => a
      case (None, Some(b))    => b
      case (None, None) =>
        val base = GraftDataSource.asNullable(snap.schema)
        val shape =
          if (!keepPos) base
          else StructType(base.fields ++ Seq(
            StructField(FilePathCol, org.apache.spark.sql.types.StringType),
            StructField(RowPosCol, org.apache.spark.sql.types.LongType)))
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], shape)
    }
  }

  /** [[readDataFiles]] with the snapshot's deletion vectors applied —
    * what every rewrite/feed path that means LIVE rows must use.
    * Identical plan to [[readDataFiles]] when none of the requested
    * files carries a dv.
    */
  private[lake] def readDataFilesLive(spark: SparkSession, table: String,
                                      snap: Snapshot,
                                      relPaths: Seq[String]): DataFrame = {
    val byPath = snap.files.iterator.map(e => e.path -> e).toMap
    val entries = relPaths.map(p =>
      byPath.getOrElse(p, FileEntry(p, -1L, -1L, -1L, Map.empty)))
    if (entries.forall(_.dv.isEmpty))
      readDataFiles(spark, table, snap.schema, relPaths, snap.partitionColumns.size)
    else morScan(spark, table, snap, entries, keepPos = false)
  }

  /** Best-effort resolution of a user `Column` predicate against a
    * schema, split into conjuncts — feeds driver-side file pruning
    * ([[prunedEntries]]). Empty on any resolution failure: pruning is
    * an optimization, never a gate.
    */
  private[lake] def resolvedConjuncts(spark: SparkSession, schema: StructType,
                                      condition: Column): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{And => CAnd, Expression}
    def split(e: Expression): Seq[Expression] = e match {
      case CAnd(l, r) => split(l) ++ split(r)
      case other      => Seq(other)
    }
    try {
      val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        GraftDataSource.asNullable(schema))
      empty.filter(condition).queryExecution.analyzed.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => split(f.condition)
      }.flatten.map(foldConstants)
    } catch { case scala.util.control.NonFatal(_) => Nil }
  }

  /** Fold foldable subtrees to Literals — the analyzed plan (which
    * [[resolvedConjuncts]] reads; the OPTIMIZED plan of an empty
    * relation eliminates the filter altogether) leaves computed
    * constants like `timestamp_micros(1700000000L)` as calls, which no
    * bounds proof pattern-matches. Evaluation is safe: foldable implies
    * deterministic and input-free.
    */
  private def foldConstants(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transformUp {
      case f if f.foldable && !f.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Literal] =>
        org.apache.spark.sql.catalyst.expressions.Literal.create(f.eval(null), f.dataType)
    }

  /** The snapshot's entries pruned driver-side by the resolved
    * conjuncts: hive partition-value evaluation for conjuncts touching
    * only partition columns, [[DataSkipping]] bounds for the rest —
    * the same pruning [[GraftFileIndex.listFiles]] gives a relation
    * scan, for the MoR paths that plan their own file list. A point
    * delete on a clustered key reads ~1 file, not the table.
    */
  private[lake] def prunedEntries(spark: SparkSession, table: String, snap: Snapshot,
                                  conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[FileEntry] = {
    if (conds.isEmpty || snap.files.isEmpty) return snap.files
    val resolver = spark.sessionState.conf.resolver
    val pSchema = GraftDataSource.asNullable(
      StructType(snap.partitionColumns.map(snap.schema(_))))
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val (pConds0, rest) = conds.partition(c =>
      PartitionPaths.evaluableOnPartitions(Seq(c), pSchema, resolver))
    // hidden partitioning: data predicates on a generated column's
    // source imply partition predicates on the transform target
    val gens = GeneratedColumns.specs(snap.schema).filter(s =>
      snap.partitionColumns.contains(s.target) &&
        !snap.partitionColumns.contains(s.source))
    val pConds = pConds0 ++ GeneratedColumns.synthesize(rest, gens, pSchema, resolver)
    val pPred = if (pConds.isEmpty) None
      else Some(PartitionPaths.bind(pConds, pSchema, resolver))
    val nameMap = ColumnMapping.mapping(snap.schema)
    val dataSchema = ColumnMapping.physicalSchema(
      StructType(snap.schema.filterNot(f => snap.partitionColumns.contains(f.name))))
    val physConds =
      if (ColumnMapping.needsTranslation(snap.schema))
        rest.map(ColumnMapping.physicalizeExpr(_, nameMap))
      else rest
    val probes = BloomIndex.equalityProbes(physConds, dataSchema, resolver)
    val f = fs(spark, table)
    snap.files.filter { e =>
      val pOk = pPred.forall(_.eval(PartitionPaths.valuesOf(e.path, pSchema, tz)))
      pOk && !DataSkipping.skip(physConds, dataSchema, resolver, e) &&
        !BloomIndex.skip(f, table, e, probes)
    }
  }

  /** Detection scan pinned at `snap` with a `__file` column carrying
    * each row's absolute data-file path — the DV-safe generalization
    * of `read(...).withColumn("__file", input_file_name())` the DML
    * paths detect matched files with. On a dv-free snapshot it IS that
    * relation scan (full pushdown + skipping); with vectors present it
    * is the [[morScan]] composition over [[prunedEntries]] (Catalyst
    * still pushes the caller's filters into the legs; `conds` carries
    * the resolved conjuncts for driver-side file skipping).
    *
    * `scope` is the caller's selection predicate and MUST come in here
    * rather than as a `.filter` on the result: `input_file_name()` is
    * nondeterministic, so Catalyst refuses to push any later filter
    * through the project that computes `__file` — the predicate is
    * applied BELOW it (on the relation, where partition pruning and
    * file skipping see it). `alias` names the scan for predicates
    * written against an aliased side (mergeRows' `t`).
    */
  private def detectionScan(spark: SparkSession, table: String, snap: Snapshot,
                            conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression] = Nil,
                            alias: Option[String] = None,
                            scope: Option[Column] = None): DataFrame =
    if (!hasDv(snap)) {
      val r0 = read(spark, table, asOf = Some(snap.version))
      val r1 = alias.fold(r0)(r0.alias)
      scope.fold(r1)(r1.filter).withColumn("__file", input_file_name())
    } else {
      val m0 = morScan(spark, table, snap, prunedEntries(spark, table, snap, conds), keepPos = true)
        .withColumnRenamed(FilePathCol, "__file").drop(RowPosCol)
      val m1 = alias.fold(m0)(m0.alias)
      scope.fold(m1)(m1.filter)
    }

  /** Incoming write schema decorated for the target's column mapping:
    * fields whose name the snapshot knows take its physical name; new
    * fields get a fresh one when (and only when) the table is mapped.
    * Returns the decorated fields plus the logical → physical map to
    * stage this write's files with. Identity for unmapped tables.
    */
  private def mappedIncoming(prev: Option[Snapshot],
                             incoming: StructType): (StructType, Map[String, String]) =
    prev match {
      case Some(p) if ColumnMapping.isMapped(p.schema) =>
        val snapMap = ColumnMapping.mapping(p.schema)
        val fields = incoming.fields.map { f =>
          ColumnMapping.withPhysical(f,
            snapMap.getOrElse(f.name, ColumnMapping.freshPhysicalName()))
        }
        val st = StructType(fields)
        (st, ColumnMapping.mapping(st))
      case _ => (incoming, Map.empty)
    }

  /** Commit-time guard for writes that staged files BEFORE the commit
    * loop resolved the final snapshot: if a racing RENAME/DROP (or
    * mapping enable) changed any staged column's physical name since,
    * the staged files carry the wrong names — abort loudly rather than
    * commit unreadable bytes.
    */
  private def checkMappingStable(table: String, stagePrev: Option[Snapshot],
                                 prev: Option[Snapshot],
                                 incoming: StructType,
                                 staged: Map[String, String]): Unit = {
    val was = stagePrev.map(p => ColumnMapping.mapping(p.schema)).getOrElse(Map.empty)
    val cur = prev.map(p => ColumnMapping.mapping(p.schema)).getOrElse(Map.empty)
    val drift = incoming.fieldNames.filter(n =>
      // the column's physical name changed since staging, or a column
      // the stage-time snapshot knew has since been renamed/dropped —
      // committing would re-add its old logical name over bytes (or a
      // physical name) that now belong to something else
      cur.get(n).exists(_ != staged.getOrElse(n, n)) ||
        (was.contains(n) && !cur.contains(n)))
    if (drift.nonEmpty)
      throw new ConcurrentCommitException(
        s"write to $table raced a column-mapping change (RENAME/DROP COLUMN) on: " +
          s"${drift.mkString(", ")} — the staged files carry outdated physical " +
          "names; re-run the write")
  }

  /** In-flight CHECK-constraint enforcement (Delta invariants analog):
    * wraps the outgoing frame so that any row where a constraint
    * evaluates to exactly FALSE (SQL CHECK semantics — null PASSES)
    * raises an error naming the violated constraints DURING the write.
    * The guard rides the first column's write projection, so
    * enforcement costs zero extra passes over the data — the same
    * in-task check Delta's CheckInvariant performs, vs a separate
    * validation scan that would double the read cost of every append
    * at 100 TB.
    *
    * A constraint referencing a column the frame doesn't carry (schema
    * evolution: this append omits it, readers see null) evaluates over
    * nulls and therefore passes — skipped, matching SQL CHECK.
    */
  private def withChecks(spark: SparkSession, table: String, df: DataFrame,
                         checks: Map[String, String]): DataFrame = {
    if (checks.isEmpty || df.columns.isEmpty) return df
    val resolver = spark.sessionState.conf.resolver
    val applicable = checks.toSeq.sortBy(_._1).filter { case (_, sql) =>
      val refs = spark.sessionState.sqlParser.parseExpression(sql).collect {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute => a.name
      }
      refs.forall(r => df.columns.exists(c => resolver(c, r)))
    }
    if (applicable.isEmpty) return df
    val viols = applicable.map { case (n, sql) =>
      (n, coalesce(not(expr(sql)), lit(false)))
    }
    val anyViol = viols.map(_._2).reduce(_ || _)
    val first = df.columns.head
    val dt = df.schema.head.dataType
    val msg = concat(
      lit(s"CHECK constraint violated on write to $table: "),
      concat_ws(", ", viols.map { case (n, v) => when(v, lit(n)) }: _*))
    df.withColumn(first,
      when(anyViol, raise_error(msg).cast(dt)).otherwise(col(first)))
  }

  /** Commit-time guard for writes that validated their rows against the
    * constraint set of an earlier snapshot: if the snapshot this commit
    * lands on carries a constraint the stager never checked (added or
    * changed since), abort loudly — committing would put unvalidated
    * rows behind an invariant readers trust. Dropped constraints are
    * harmless (the write over-checked).
    */
  private def checkConstraintsStable(table: String, stagePrev: Option[Snapshot],
                                     prev: Option[Snapshot]): Unit = {
    val was = stagePrev.map(_.constraints).getOrElse(Map.empty)
    val cur = prev.map(_.constraints).getOrElse(Map.empty)
    val unchecked = cur.filter { case (n, e) => !was.get(n).contains(e) }
    if (unchecked.nonEmpty)
      throw new ConcurrentCommitException(
        s"write to $table raced ADD CONSTRAINT (${unchecked.keys.toSeq.sorted.mkString(", ")}) " +
          "committed after this write validated its rows — re-run the write")
  }

  // ---------------------------------------------------------------- writes

  private val maxRetries = 3

  /** Replace the table contents atomically. Previous versions stay
    * readable (time travel) until vacuumed. Schema may differ freely
    * from the previous version.
    */
  /** What one commit attempt writes: the full derived state (for the
    * in-memory snapshot + checkpoints) and the delta (what the log
    * file records).
    */
  private final case class CommitSpec(schema: StructType, partitionColumns: Seq[String],
                                      files: Seq[FileEntry], adds: Seq[FileEntry],
                                      removes: Seq[String], reset: Boolean,
                                      txnUpdate: Map[String, Long] = Map.empty,
                                      protocol: Protocol = Protocol(1, 1),
                                      constraintsUpdate: Option[Map[String, String]] = None)

  /** `txn = Some(appId -> version)` records an APPLICATION watermark in
    * the same commit (the txnAppId/txnVersion idiom): data and progress
    * marker land atomically, so an idempotent writer can check
    * `latestSnapshot.txns(appId)` and skip work it already committed —
    * the exactly-once primitive [[Incremental]] builds on.
    */
  def overwrite(spark: SparkSession, table: String, df0: DataFrame,
                partitionBy: Seq[String] = Nil,
                txn: Option[(String, Long)] = None,
                extraTxns: Map[String, Long] = Map.empty): Long = {
    // overwrite replaces the schema wholesale, so it replaces the
    // column mapping too: sanitize strips any metadata the frame
    // carried from a mapped source, and the files are written with the
    // logical names — the fresh-table state. (A renamed table's
    // protocol stays ≥2, which is harmless: the stamp is monotonic.)
    val df = ColumnMapping.sanitize(df0)
    // CHECK constraints SURVIVE an overwrite (they are governance
    // metadata, not data) — the replacement rows must satisfy them
    val prev0 = latestSnapshot(spark, table)
    val newFiles = stageFiles(spark, table, df, partitionBy,
      checks = prev0.map(_.constraints).getOrElse(Map.empty), replaceLayout = true)
    retryCommit(spark, table, "OVERWRITE") { prev =>
      checkConstraintsStable(table, prev0, prev)
      // reset delta: carries the complete new file list, so it is its
      // own reconstruction base — an overwrite's delta IS full-state
      CommitSpec(df.schema, partitionBy, newFiles, newFiles, Nil, reset = true,
        txnUpdate = txn.toMap ++ extraTxns)
    }
  }

  /** (Re)create the table hash-bucketed on `bucketCols` into
    * `numBuckets` buckets (optionally sorted by `sortCols` within each
    * bucket) — see [[Bucketing]]. Every later write preserves the
    * layout; a plain [[overwrite]] drops it.
    */
  def overwriteBucketed(spark: SparkSession, table: String, df0: DataFrame,
                        numBuckets: Int, bucketCols: Seq[String],
                        sortCols: Seq[String] = Nil,
                        partitionBy: Seq[String] = Nil,
                        txn: Option[(String, Long)] = None): Long = {
    val overlap = bucketCols.intersect(partitionBy)
    require(overlap.isEmpty,
      s"bucket column(s) ${overlap.mkString(", ")} are partition columns — a " +
        "partition value is constant per file; bucket on a non-partition key")
    val stamped = Bucketing.stampDf(ColumnMapping.sanitize(df0),
      numBuckets, bucketCols, sortCols)
    overwrite(spark, table, stamped, partitionBy, txn)
  }

  /** (Re)create the table hidden-partitioned by generated columns —
    * see [[GeneratedColumns]]. Each spec `(target, transform, source)`
    * adds a derived partition column (`p_day = day(event_ts)`, UTC
    * semantics) that every later write re-derives automatically and
    * every read prunes by from predicates on the RAW source column.
    * `partitionBy` names additional IDENTITY partition columns; the
    * generated targets are appended after them in the layout. A plain
    * [[overwrite]] drops the generated layout, like de-bucketing.
    */
  def overwriteGenerated(spark: SparkSession, table: String, df0: DataFrame,
                         gens: Seq[GeneratedColumns.Spec],
                         partitionBy: Seq[String] = Nil,
                         txn: Option[(String, Long)] = None): Long = {
    val clean = ColumnMapping.sanitize(df0)
    val stampedSchema = GeneratedColumns.stamp(clean.schema, gens)
    val withCols = GeneratedColumns.derive(clean, gens, identity)
    // re-alias so the frame's schema carries the stamps into the commit
    val stamped = withCols.select(stampedSchema.fields.map(f =>
      withCols(f.name).as(f.name, f.metadata)).toIndexedSeq: _*)
    overwrite(spark, table, stamped, partitionBy ++ gens.map(_.target), txn)
  }

  /** Dynamic partition overwrite — atomically REPLACE exactly the hive
    * partitions the incoming rows land in, carrying every other
    * partition's files untouched (Spark's
    * `partitionOverwriteMode=dynamic` / Delta partition-replaceWhere
    * analog; also reachable from SQL: `INSERT OVERWRITE` under the
    * dynamic conf routes here). THE idempotent daily reload at 100 TB:
    * re-running a day's load replaces that day's partitions and
    * nothing else — no read-modify-write, no full overwrite, commit
    * cost O(touched partitions), never O(table). The change feed
    * synthesizes delete-of-replaced + insert-of-new lazily from the
    * log (like OVERWRITE), so the write itself stages no change files.
    *
    * ref: the reference's scheduled silver/gold rebuilds re-materialize
    * the current slice per run (schedules/defs.yaml; silver defs.yaml
    * trino_sql) — this is that pattern without rewriting history.
    */
  def overwritePartitions(spark: SparkSession, table: String, df0: DataFrame,
                          txn: Option[(String, Long)] = None): Long = {
    val df = ColumnMapping.sanitize(df0)
    val prev0 = latestSnapshot(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"no committed version at $table — create it first " +
          "(overwrite with partitionBy)"))
    val parts = prev0.partitionColumns
    require(parts.nonEmpty,
      s"$table is unpartitioned — dynamic partition overwrite needs a hive " +
        "partition layout; use overwrite to replace the whole table")
    val (incoming, mapping) = mappedIncoming(Some(prev0), df.schema)
    val newFiles = stageFiles(spark, table, df, parts, mapping,
      checks = prev0.constraints)
    if (newFiles.isEmpty && txn.isEmpty) return prev0.version // empty load, no watermark
    // a file's partition is its LEADING run of k=v segments — written
    // by the same hive encoder on both sides, so string equality is the
    // partition identity. NOT the raw parent dir: per-partition
    // bulk-move publishes nest a batch dir inside the partition dir, so
    // the parent of a new file can differ from the parent of the old
    // file it replaces while both live in the same partition.
    val touched = newFiles.map(e => partitionDirOf(e.path)).toSet
    retryCommit(spark, table, "OVERWRITE PARTITIONS") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalStateException(
        s"$table lost its log while this write was staging"))
      checkMappingStable(table, Some(prev0), prevOpt, df.schema, mapping)
      checkConstraintsStable(table, Some(prev0), prevOpt)
      checkBucketingStable(table, Some(prev0), prevOpt)
      require(prev.partitionColumns == parts,
        s"partition layout of $table changed while this write was staging " +
          s"(${parts.mkString(",")} -> ${prev.partitionColumns.mkString(",")})")
      val (replaced, carried) =
        prev.files.partition(e => touched.contains(partitionDirOf(e.path)))
      CommitSpec(mergeSchemas(prev.schema, incoming), parts,
        carried ++ newFiles, newFiles, replaced.map(_.path), reset = false,
        txnUpdate = txn.toMap)
    }
  }

  /** Commit-loop guard: the bucket layout the staged files were
    * written under must still be the table's layout at commit time — a
    * racing bucketed/unbucketed overwrite otherwise slips differently-
    * partitioned files into a spec-carrying snapshot, silently
    * breaking the co-location the scan claims.
    */
  private def checkBucketingStable(table: String, stagePrev: Option[Snapshot],
                                   commitPrev: Option[Snapshot]): Unit = {
    val staged = stagePrev.flatMap(s => Bucketing.spec(s.schema))
    val now = commitPrev.flatMap(s => Bucketing.spec(s.schema))
    if (staged != now)
      throw new ConcurrentCommitException(
        s"bucket layout of $table changed while this write was staging " +
          s"($staged -> $now) — re-run so the files are routed under the " +
          "current layout")
  }

  /** Append rows; new columns merge into the snapshot schema (old files
    * read them as null). Partitioning is carried from the table.
    */
  def append(spark: SparkSession, table: String, df0: DataFrame): Long = {
    val df = ColumnMapping.sanitize(df0)
    val prev0 = latestSnapshot(spark, table)
    val parts = prev0.map(_.partitionColumns).getOrElse(Nil)
    // on a mapped table the files stage under the snapshot's physical
    // names (fresh names for evolution columns); the commit loop
    // re-verifies the mapping against the snapshot it actually lands on
    val (incoming, mapping) = mappedIncoming(prev0, df.schema)
    val newFiles = stageFiles(spark, table, df, parts, mapping,
      checks = prev0.map(_.constraints).getOrElse(Map.empty))
    retryCommit(spark, table, "APPEND") { prev =>
      checkMappingStable(table, prev0, prev, df.schema, mapping)
      checkConstraintsStable(table, prev0, prev)
      checkBucketingStable(table, prev0, prev)
      val schema = prev.map(p => mergeSchemas(p.schema, incoming)).getOrElse(incoming)
      CommitSpec(schema, prev.map(_.partitionColumns).getOrElse(parts),
        prev.map(_.files).getOrElse(Nil) ++ newFiles, newFiles, Nil, reset = false)
    }
  }

  /** Exactly-once streaming append: commit `df` as `(queryId, batchId)`
    * iff the log has not already recorded that batch (or a later one)
    * for this query. Structured Streaming replays the last micro-batch
    * after a restart from checkpoint; the `txns` watermark in the
    * snapshot turns that replay into a no-op instead of duplicate rows
    * — the transaction-log half of end-to-end exactly-once (the other
    * half is the source's replayable offsets). Returns the committed
    * version, or None when the batch was already in the log.
    *
    * The watermark check runs again inside the commit loop: two
    * instances of the same query racing (a zombie executor's driver
    * still flushing while its successor runs) resolve to one winner,
    * and the loser's staged files are dropped before they ever enter a
    * snapshot.
    */
  def appendStream(spark: SparkSession, table: String, df0: DataFrame,
                   queryId: String, batchId: Long,
                   partitionByIfNew: Seq[String] = Nil,
                   operation: String = "STREAMING APPEND"): Option[Long] = {
    val df = ColumnMapping.sanitize(df0)
    def alreadyCommitted(s: Option[Snapshot]): Boolean =
      s.exists(_.txns.get(queryId).exists(_ >= batchId))
    val prev0 = latestSnapshot(spark, table)
    if (alreadyCommitted(prev0)) return None // replay detected before any staging cost
    val parts = prev0.map(_.partitionColumns).getOrElse(partitionByIfNew)
    val (incoming, mapping) = mappedIncoming(prev0, df.schema)
    val newFiles = stageFiles(spark, table, df, parts, mapping,
      checks = prev0.map(_.constraints).getOrElse(Map.empty))
    val f = fs(spark, table)
    var attempt = 0
    while (attempt < maxRetries) {
      val prev = latestSnapshot(spark, table)
      if (alreadyCommitted(prev)) {
        newFiles.foreach(e =>
          try f.delete(new Path(dataPath(table), e.path), false)
          catch { case _: java.io.IOException => () }) // orphans; vacuum also reclaims
        return None
      }
      checkMappingStable(table, prev0, prev, df.schema, mapping)
      checkConstraintsStable(table, prev0, prev)
      checkBucketingStable(table, prev0, prev)
      val snap = Snapshot(prev.map(_.version).getOrElse(0L) + 1,
        System.currentTimeMillis(), operation,
        prev.map(p => mergeSchemas(p.schema, incoming)).getOrElse(incoming),
        prev.map(_.partitionColumns).getOrElse(parts),
        prev.map(_.files).getOrElse(Nil) ++ newFiles,
        txns = prev.map(_.txns).getOrElse(Map.empty) + (queryId -> batchId))
      if (tryCommit(spark, table, snap, newFiles, Nil, prev = prev))
        return Some(snap.version)
      attempt += 1
    }
    throw new ConcurrentCommitException(
      s"STREAMING APPEND on $table lost $maxRetries commit races")
  }

  /** Exactly-once Complete-mode streaming write: each batch replaces
    * the table contents (the snapshot carries only the new files), with
    * the same `(queryId, batchId)` replay protection as
    * [[appendStream]].
    */
  def overwriteStream(spark: SparkSession, table: String, df0: DataFrame,
                      queryId: String, batchId: Long,
                      partitionBy: Seq[String] = Nil,
                      operation: String = "STREAMING OVERWRITE"): Option[Long] = {
    val df = ColumnMapping.sanitize(df0) // replaces the mapping like overwrite
    def alreadyCommitted(s: Option[Snapshot]): Boolean =
      s.exists(_.txns.get(queryId).exists(_ >= batchId))
    val prev0 = latestSnapshot(spark, table)
    if (alreadyCommitted(prev0)) return None
    val parts =
      if (partitionBy.nonEmpty) partitionBy
      else prev0.map(_.partitionColumns).getOrElse(Nil)
    val newFiles = stageFiles(spark, table, df, parts,
      checks = prev0.map(_.constraints).getOrElse(Map.empty), replaceLayout = true)
    val f = fs(spark, table)
    var attempt = 0
    while (attempt < maxRetries) {
      val prev = latestSnapshot(spark, table)
      if (alreadyCommitted(prev)) {
        newFiles.foreach(e =>
          try f.delete(new Path(dataPath(table), e.path), false)
          catch { case _: java.io.IOException => () })
        return None
      }
      checkConstraintsStable(table, prev0, prev)
      val snap = Snapshot(prev.map(_.version).getOrElse(0L) + 1,
        System.currentTimeMillis(), operation,
        df.schema, parts, newFiles,
        txns = prev.map(_.txns).getOrElse(Map.empty) + (queryId -> batchId))
      if (tryCommit(spark, table, snap, newFiles, Nil, reset = true, prev = prev))
        return Some(snap.version)
      attempt += 1
    }
    throw new ConcurrentCommitException(
      s"STREAMING OVERWRITE on $table lost $maxRetries commit races")
  }

  private def retryCommit(spark: SparkSession, table: String, op: String)(
      derive: Option[Snapshot] => CommitSpec): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val prev = latestSnapshot(spark, table)
      val spec = derive(prev)
      // streaming watermarks survive every batch commit — dropping one
      // would make a restarted stream re-append its last batch
      val snap = Snapshot(prev.map(_.version).getOrElse(0L) + 1,
        System.currentTimeMillis(), op, spec.schema, spec.partitionColumns, spec.files,
        txns = prev.map(_.txns).getOrElse(Map.empty) ++ spec.txnUpdate,
        protocol = spec.protocol)
      if (tryCommit(spark, table, snap, spec.adds, spec.removes, spec.reset,
          prev = prev, constraintsUpdate = spec.constraintsUpdate))
        return snap.version
      attempt += 1
    }
    throw new ConcurrentCommitException(s"$op on $table lost $maxRetries commit races")
  }

  /** Fields of `existing` plus any new fields of `incoming`; a name
    * present in both must have the same type (no silent widening).
    * Nullability is ignored in the conflict check — read schemas are
    * deep-nullable anyway, and a SQL INSERT hands back the relation's
    * nullable variant of the table's own schema.
    */
  private def mergeSchemas(existing: StructType, incoming: StructType): StructType = {
    val byName = existing.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { e =>
        require(GraftDataSource.nullableType(e.dataType) ==
            GraftDataSource.nullableType(f.dataType),
          s"schema conflict on '${f.name}': ${e.dataType} vs ${f.dataType}")
      }
    }
    StructType(existing.fields ++ incoming.fields.filterNot(f => byName.contains(f.name)))
  }

  // ----------------------------------------------------------------- reads

  /** Read the latest (or `asOf`) snapshot, PINNED at call time — the
    * right semantics for a single job execution ([[readLive]]
    * re-resolves per query instead). Routed through the registered
    * `graft` source with an explicit `versionAsOf`, so a pinned read
    * gets the full metadata path: planning from logged stats (no
    * listings), partition pruning, AND file-level [[DataSkipping]]
    * against the logged bounds — a selective filter on a pinned read
    * prunes whole files exactly like a live read. Column order is the
    * snapshot schema's (partition columns overlap in place).
    */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table")))
    spark.read.format("graft").option("versionAsOf", v).load(table)
  }

  // ------------------------------------------------- history checkpoint
  //
  // history() needs (version, ts, operation, num_files) per commit; with
  // only the per-version JSONs that is O(commits) file reads per call —
  // fine at daily cadence, painful for a maintenance dashboard over a
  // streaming table with tens of thousands of commits. Every
  // checkpointInterval-th commit therefore rolls the summaries up into
  // one `_history_checkpoint` file (incrementally: previous checkpoint +
  // the ≤interval new snapshots), and history() reads checkpoint + tail.
  // Like the latest-hint, the checkpoint is ADVISORY: missing, stale,
  // torn or foreign content degrades to parsing the per-version JSONs;
  // correctness never depends on it.

  private[lake] val checkpointInterval = 10L

  private def checkpointFile(table: String) = new Path(logPath(table), "_history_checkpoint")

  private final case class HistEntry(version: Long, timestampMs: Long,
                                     operation: String, numFiles: Long)

  private def snapshotSummary(s: Snapshot): HistEntry =
    HistEntry(s.version, s.timestampMs, s.operation, s.files.size.toLong)

  private def readCheckpoint(f: FileSystem, table: String): Option[(Long, Seq[HistEntry])] =
    try {
      val p = checkpointFile(table)
      if (!f.exists(p)) None
      else {
        val in = f.open(p)
        val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
        scala.util.Try {
          val j = JsonMethods.parse(txt)
          val upTo = jLong(j \ "version")
          val entries = (j \ "entries").asInstanceOf[JArray].arr.map { e =>
            HistEntry(jLong(e \ "v"), jLong(e \ "ts"), jStr(e \ "op"), jLong(e \ "nf"))
          }
          (upTo, entries)
        }.toOption
      }
    } catch { case _: java.io.IOException => None }

  /** Committed versions without the O(commits) log listing: the history
    * checkpoint names the covered prefix, a forward existence-probe
    * finds the ≤interval tail — O(tail) metadata calls. Degrades to the
    * full listing when there is no usable checkpoint (the same advisory
    * discipline as the checkpoint itself). Used by history() and
    * vacuum(), the two O(commits) walkers.
    */
  private[lake] def versionsFast(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val computed = readCheckpoint(f, table) match {
      case Some((upTo, entries)) if f.exists(versionFile(table, upTo)) =>
        var v = upTo
        val tail = scala.collection.mutable.ArrayBuffer.empty[Long]
        while (f.exists(versionFile(table, v + 1))) { v += 1; tail += v }
        Some((entries.map(_.version).filter(_ <= upTo) ++ tail).distinct.sorted)
      case _ => None
    }
    // Gap guard: the forward probe stops at the first missing version
    // file, so a hole in the post-checkpoint tail (foreign log
    // deletion) would silently truncate the list — and vacuum would
    // then treat pre-gap versions as latest and delete files the TRUE
    // latest snapshots still reference. The latest-hint is written
    // post-commit and sees past such a hole; on disagreement, pay the
    // full listing.
    computed match {
      case Some(vs) if vs.nonEmpty &&
          !readHint(f, table).exists(h => h > vs.max && f.exists(versionFile(table, h))) =>
        vs
      case _ => versions(spark, table)
    }
  }

  private def writeHistoryCheckpoint(f: FileSystem, table: String, upTo: Long): Unit =
    try {
      val prev = readCheckpoint(f, table)
      val carried = prev.map(_._2.filter(_.version <= upTo)).getOrElse(Seq.empty)
      val from = prev.map(_._1 + 1).getOrElse(1L)
      // numFiles per fresh version is DELTA ARITHMETIC (prev count -
      // removes + adds), seeded from the carried prefix — no snapshot
      // reconstruction per version; a gap or unknown falls back to one
      // reconstruction (and a gap is skipped, not fatal — advisory file)
      var count: Option[Long] = carried.lastOption.map(_.numFiles)
      val fresh = (from to upTo).flatMap { v =>
        val p = versionFile(table, v)
        if (!f.exists(p)) { count = None; None }
        else scala.util.Try {
          val e = parseLogEntry(readFileText(f, p))
          val seed = if (v == 1L) Some(0L) else count
          val nf = e.full.map(_.size.toLong)
            .orElse(if (e.reset) Some(e.adds.size.toLong)
                    else seed.map(_ - e.removes.size + e.adds.size))
            .getOrElse(reconstruct(f, table, v).files.size.toLong)
          count = Some(nf)
          HistEntry(v, e.timestampMs, e.operation, nf)
        } match {
          case scala.util.Success(h) => Some(h)
          // an existing-but-unparsable entry must poison the running
          // count like a missing one, or every later version's delta
          // arithmetic compounds off a stale base
          case scala.util.Failure(_) => count = None; None
        }
      }
      val entries = carried ++ fresh
      val body = JsonMethods.compact(JsonMethods.render(JObject(
        "version" -> JLong(upTo),
        "entries" -> JArray(entries.map(e => JObject(
          "v" -> JLong(e.version), "ts" -> JLong(e.timestampMs),
          "op" -> JString(e.operation), "nf" -> JLong(e.numFiles))).toList))))
      // tmp + atomic replace so a concurrent history() never reads a torn
      // file (the Try parse would shrug it off, but then that call pays
      // the full O(commits) fallback for nothing)
      val tmp = new Path(logPath(table), s".cp-tmp-${java.util.UUID.randomUUID()}")
      val out = f.create(tmp, false)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      if (f.getUri.getScheme == "file")
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(checkpointFile(table).toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
        fc.rename(tmp, checkpointFile(table), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    } catch { case _: java.io.IOException => () } // advisory — never fail a commit

  /** Read the table through the registered `graft` data source
    * ([[GraftDataSource]]): the returned DataFrame re-resolves the
    * latest snapshot's file list at EVERY query planning, so a
    * long-lived handle (an SQL view, a cached-in-a-notebook DataFrame)
    * always reads the newest committed data. [[read]] pins the snapshot
    * at call time — right for a single job execution; this is right for
    * a registered surface. Column order matches the snapshot schema
    * (partition columns overlap in place in the relation — see
    * [[GraftDataSource]]), and the DataFrame is the BARE relation, no
    * projection on top, so a temp view over it is a valid
    * `INSERT INTO` target.
    */
  def readLive(spark: SparkSession, table: String): DataFrame = {
    if (latestSnapshot(spark, table).isEmpty)
      throw new IllegalArgumentException(s"no committed version at $table")
    spark.read.format("graft").load(table)
  }

  /** Commit history, latest first: (version, timestamp_ms, operation,
    * num_files). Reads the rolled-up `_history_checkpoint` for the
    * covered prefix and parses per-version JSONs only for the tail
    * since it (≤ checkpointInterval files), so the call is O(tail), not
    * O(commits); with no usable checkpoint it degrades to parsing
    * everything.
    */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    val f = fs(spark, table)
    val byVersion = readCheckpoint(f, table)
      .map(_._2.map(e => e.version -> e).toMap).getOrElse(Map.empty)
    versionsFast(spark, table)
      .map(v => byVersion.getOrElse(v, snapshotSummary(snapshotAt(spark, table, v))))
      .map(e => (e.version, e.timestampMs, e.operation, e.numFiles))
      .sortBy(-_._1)
      .toDF("version", "timestamp_ms", "operation", "num_files")
  }

  /** The newest version committed at or before `tsMs` — timestamp time
    * travel (`option("timestampAsOf", ...)`), resolved from the history
    * checkpoint + tail like [[history]] (O(tail), no full log parse).
    * Commit timestamps are the writers' wall clocks: monotonic per
    * table in practice (commits serialize through put-if-absent), but
    * clock skew between writers can reorder them — ties and inversions
    * resolve to the highest qualifying version, matching Delta.
    */
  def versionAtTimestamp(spark: SparkSession, table: String, tsMs: Long): Long = {
    val f = fs(spark, table)
    val byVersion = readCheckpoint(f, table)
      .map(_._2.map(e => e.version -> e).toMap).getOrElse(Map.empty)
    val qualifying = versionsFast(spark, table)
      .map(v => byVersion.getOrElse(v, snapshotSummary(snapshotAt(spark, table, v))))
      .filter(_.timestampMs <= tsMs)
    if (qualifying.isEmpty)
      throw new IllegalArgumentException(
        s"no version of $table committed at or before timestamp $tsMs " +
          "(the table's first commit is later)")
    qualifying.map(_.version).max
  }

  // ----------------------------------------------------------------- merge

  /** Upsert (MERGE): rows of `updates` replace current rows with the
    * same `keys` value; unmatched update rows insert. File-granularity
    * copy-on-write — only files containing a matched key are rewritten;
    * all other files carry over by reference. `updates` must be
    * key-unique. Schema evolves like [[append]]: new update columns
    * merge into the snapshot schema (reading as null from files not
    * rewritten), existing-name type conflicts are refused, and an
    * update set missing an existing column writes null there.
    *
    * A lost commit race is resolved the way Delta resolves it: the
    * winner's changes are re-examined, and when they are provably
    * DISJOINT from everything this merge read or rewrote — a scoped
    * merge whose scanned partitions share no directory with any file
    * the winner added or removed, same schema, same partition layout —
    * the merge rebases onto the winner's snapshot and retries (bounded).
    * Anything else aborts with ConcurrentCommitException: an unscoped
    * merge read the whole table, so ANY concurrent change could hide a
    * matched key the rewrite never saw.
    *
    * `scopeToUpdatePartitions` restricts the matched-file detection
    * scan to the partitions present in `updates` — the daily operating
    * mode for a date-partitioned 100 TB fact, where an unscoped
    * detection would scan the WHOLE table to refresh one day. Sound iff
    * the merge key determines the partition value (a matched key can
    * only live in its update row's partition — e.g. event_key →
    * event_date); with that contract broken, a matched row in an
    * unscanned partition would survive next to its replacement. This is
    * the same discipline Delta asks of users via partition predicates
    * in the MERGE condition.
    */
  def merge(spark: SparkSession, table: String, updates0: DataFrame,
            keys: Seq[String], scopeToUpdatePartitions: Boolean = false): Long = {
    // the updates and their key set are consumed by the detection join,
    // the rewrite union, and three change-feed projections — persist
    // both so a non-trivial update plan computes once and the key
    // distinct shuffles once (mergeRows stages its source the same way)
    val updates = ColumnMapping.sanitize(updates0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val keyCols = keys.map(col)
    val updKeys = updates.select(keyCols: _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeOn(spark, table, snap, updates, updKeys, keys, scopeToUpdatePartitions)
    finally {
      updKeys.unpersist(blocking = false)
      updates.unpersist(blocking = false)
    }
  }

  private def mergeOn(spark: SparkSession, table: String, snap: Snapshot,
                      updates: DataFrame, updKeys: DataFrame, keys: Seq[String],
                      scopeToUpdatePartitions: Boolean): Long = {
    val keyCols = keys.map(col)

    // Detection source: partition-prune to the updates' partitions when
    // scoped (Catalyst prunes at the file-index level, so only those
    // partitions' files are read), else the whole snapshot. Pinned to
    // this snapshot so the pushed predicate also file-skips on the
    // logged bounds.
    val detectionSource = detectionScan(spark, table, snap, scope =
      if (scopeToUpdatePartitions && snap.partitionColumns.nonEmpty)
        Some(partitionTuplePredicate(updates, snap.partitionColumns))
      else None)

    // which files contain a matched key? (file names only — bounded by
    // file count, not row count). The `__file` URIs are decoded +
    // qualified against the data root inside mapMatchedRel; an
    // unmappable matched file is a hard error.
    val base = dataPath(table).toString
    val affectedAbs = detectionSource
      .join(broadcast(updKeys), keys)
      .select("__file").distinct()
      .collect().map(_.getString(0))
    val affectedRel = mapMatchedRel(spark, table, affectedAbs, "MERGE", snap)

    // schema evolution, same rules as append: new update columns merge
    // into the snapshot schema (existing-name type conflicts refused);
    // files that are not rewritten simply lack the column and read as
    // null — including the matched-but-untouched rows carried into the
    // rewritten files via the union below
    val (incoming, _) = mappedIncoming(Some(snap), updates.schema)
    val schema = mergeSchemas(snap.schema, incoming)
    val stagingMap = ColumnMapping.mapping(schema)
    val ordered = schema.fieldNames.map(col).toIndexedSeq
    def padTo(df: DataFrame): DataFrame = df.select(schema.fields.toSeq.map { fld =>
      if (df.columns.contains(fld.name)) col(fld.name).cast(fld.dataType).as(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }: _*)
    // affected-file rows feed the rewrite union AND three change-feed
    // projections — persist for the duration of this merge so the files
    // decode once (spills past memory; bounded by the rewrite set,
    // which is materialized to parquet below anyway)
    val affectedRows =
      if (affectedRel.isEmpty) None
      else Some(readDataFilesLive(spark, table, snap, affectedRel)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    try {
      val rewritten = affectedRows match {
        case None => updates
        case Some(rows) =>
          rows.join(broadcast(updKeys), keys, "left_anti")
            .unionByName(updates, allowMissingColumns = true)
            .select(ordered: _*)
      }
      // change feed: replaced rows as pre/post images, fresh keys as
      // inserts — an upsert's row-level delta, knowable only now
      val cdcDf = affectedRows match {
        case None => padTo(updates).withColumn(ChangeTypeCol, lit("insert"))
        case Some(rows) =>
          val tableKeys = rows.select(keys.map(col): _*).distinct()
          padTo(rows.join(broadcast(updKeys), keys, "left_semi"))
            .withColumn(ChangeTypeCol, lit("update_preimage"))
            .unionByName(padTo(updates.join(tableKeys, keys, "left_semi"))
              .withColumn(ChangeTypeCol, lit("update_postimage")))
            .unionByName(padTo(updates.join(tableKeys, keys, "left_anti"))
              .withColumn(ChangeTypeCol, lit("insert")))
      }
      // no matched file ⇒ the commit is append-shaped (no removes) and
      // its change rows are exactly the added files' rows — skip the
      // CDC staged write and let [[changesOfEntry]] synthesize the
      // identical inserts from the adds (guide §5: one fewer full
      // execution of the update plan per no-match merge). When both
      // writes run, they are independent — overlapped (guide §2.6).
      val (newFiles, cdcFiles) = stageConcurrently(
        stageFiles(spark, table, rewritten, snap.partitionColumns,
          stagingMap, checks = snap.constraints))(
        affectedRows match {
          case None    => None
          case Some(_) => Some(stageChangeFiles(spark, table, cdcDf))
        })
      commitRewrite(spark, table, snap, "MERGE",
        cur => mergeSchemas(cur.schema, incoming),
        newFiles, affectedRel, scopeToUpdatePartitions, cdc = cdcFiles)
    } finally affectedRows.foreach(_.unpersist(blocking = false))
  }

  // ------------------------------------------------------------- mergeRows

  /** One `WHEN MATCHED` clause of a row-level merge. Conditions and
    * assignment values are Columns over the aliased sides `t` (target)
    * and `s` (source) — e.g. `col("s.v") > col("t.v")`. A `None`
    * condition always applies; a NULL condition result means "does not
    * apply" (SQL semantics). Clauses are evaluated IN ORDER per matched
    * row; the first whose condition holds wins.
    */
  sealed trait MatchedClause { def condition: Option[Column] }
  final case class MatchedUpdate(condition: Option[Column],
                                 set: Map[String, Column]) extends MatchedClause
  final case class MatchedDelete(condition: Option[Column]) extends MatchedClause

  /** Row-level MERGE: the general form of [[merge]], expressing the
    * full SQL `MERGE INTO` action surface — ordered `WHEN MATCHED`
    * clauses with per-clause conditions (UPDATE preserving unassigned
    * target columns per SQL, or DELETE), ordered condition-gated
    * `WHEN NOT MATCHED INSERT` clauses (first-true wins; unassigned
    * columns are null), and ordered `WHEN NOT MATCHED BY SOURCE`
    * clauses applying to target rows with no source key match (their
    * conditions/assignments may reference the target side only). Rows
    * claimed by no clause carry over unchanged.
    *
    * File-granularity copy-on-write like [[merge]]: the rewrite set is
    * the files containing a key match, plus — only when NOT MATCHED BY
    * SOURCE clauses exist — the files containing rows passing any such
    * clause's condition (that detection is a pushed-filter scan, so
    * DataSkipping bounds it by the files the conditions could match).
    * `scopeToUpdatePartitions` has [[merge]]'s contract and enables
    * the same disjoint-race rebase; it is ignored (full detection,
    * abort-on-race) when NOT MATCHED BY SOURCE clauses exist, since
    * those semantically concern the WHOLE table. The target schema is
    * FIXED here (assignments must name existing columns — schema
    * evolution stays on the unconditional [[merge]] path); assigned
    * values cast to the column's snapshot type.
    *
    * With ONLY insert clauses, nothing is rewritten: the anti-joined
    * insert rows are appended — but through a version-checked commit
    * that ABORTS on any concurrent commit rather than rebasing
    * blindly, because a racing writer could have inserted the same key
    * between the anti-join read and the commit.
    *
    * `source` must be key-unique; violations fail loudly (the SQL
    * cardinality error) instead of silently duplicating target rows.
    */
  def mergeRows(spark: SparkSession, table: String, source: DataFrame,
                keys: Seq[String], matched: Seq[MatchedClause],
                notMatchedInsert: Seq[(Option[Column], Map[String, Column])] = Nil,
                notMatchedBySource: Seq[MatchedClause] = Nil,
                scopeToUpdatePartitions: Boolean = false,
                txn: Option[(String, Long)] = None,
                extraTxns: Map[String, Long] = Map.empty): Long = {
    require(matched.nonEmpty || notMatchedInsert.nonEmpty || notMatchedBySource.nonEmpty,
      "mergeRows needs at least one matched, insert, or not-matched-by-source clause")
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    // application watermark(s) already at or past these versions: the
    // work was committed by a previous (possibly crashed-and-replayed)
    // run. With several watermarks (e.g. a two-source incremental
    // join), ALL must be current — one stale source means real work.
    val allTxns = txn.toMap ++ extraTxns
    if (allTxns.nonEmpty &&
        allTxns.forall { case (appId, v) => snap.txns.get(appId).exists(_ >= v) })
      return snap.version
    val assignedCols = (matched ++ notMatchedBySource)
      .collect { case MatchedUpdate(_, set) => set.keys }.flatten ++
      notMatchedInsert.flatMap(_._2.keys)
    val unknown = assignedCols.filterNot(snap.schema.fieldNames.contains).toSeq.distinct
    require(unknown.isEmpty,
      s"mergeRows on $table assigns unknown column(s): ${unknown.mkString(", ")} — " +
        "schema evolution is only supported by the unconditional merge/upsert path")
    require(keys.forall(snap.schema.fieldNames.contains),
      s"merge keys must be target columns: ${keys.mkString(", ")}")

    // The source is scanned several times below — cardinality check,
    // matched-file detection, rewrite join, insert anti-join, CDC
    // projection. Persist it once so every scan reads the same
    // materialization: a non-deterministic source (rand(), uuid(), a
    // re-shuffling subquery) could otherwise pass the cardinality check
    // yet yield DIFFERENT rewrite vs change-feed images per scan — the
    // reason Delta stages its MERGE source before acting on it.
    // MEMORY_AND_DISK spills instead of evicting, so each source row is
    // computed once barring executor loss.
    val src = source.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try mergeRowsOn(spark, table, snap, src, keys, matched, notMatchedInsert,
      notMatchedBySource, scopeToUpdatePartitions, txn.toMap ++ extraTxns)
    finally src.unpersist(blocking = false)
  }

  /** [[mergeRows]] after validation, acting on the persisted source. */
  private def mergeRowsOn(spark: SparkSession, table: String, snap: Snapshot,
                          source: DataFrame, keys: Seq[String],
                          matched: Seq[MatchedClause],
                          notMatchedInsert: Seq[(Option[Column], Map[String, Column])],
                          notMatchedBySource: Seq[MatchedClause],
                          scopeToUpdatePartitions: Boolean,
                          txnUpdate: Map[String, Long]): Long = {
    // SQL MERGE cardinality: a target row matching two source rows is
    // an error, never a silent duplicate — with equality keys that can
    // only come from duplicate source keys. On the rewrite paths the
    // check RIDES the detection job as a sentinel row (guide §1.2/§5:
    // one fewer driver action and planning round per merge) instead of
    // running as its own count; the insert-only path keeps a dedicated
    // preflight (it has no detection job to ride).
    val keyCols = keys.map(col)
    val updKeys = source.select(keyCols: _*).distinct()
    val dupMark = "\u0000__dup_key__" // impossible in a file URI
    def dupProbe: DataFrame = source.groupBy(keyCols: _*)
      .agg(count(lit(1)).as("__cnt")).filter(col("__cnt") > 1)
      .limit(1).select(lit(dupMark).as("__file"))
    def requireNoDupMark(all: Array[String]): Array[String] = {
      require(!all.contains(dupMark),
        s"MERGE source has duplicate values of key (${keys.mkString(", ")}) — " +
          "each target row may match at most one source row")
      all
    }
    val ordered = snap.schema.fields.toSeq

    def insertProjection(anti: DataFrame): DataFrame =
      insertProjectionOf(anti, notMatchedInsert, ordered)

    if (matched.isEmpty && notMatchedBySource.isEmpty) {
      // insert-only: no rewrite; anti-join against the PINNED snapshot,
      // then a commit that refuses to land over anyone else's
      val dupKeys = source.groupBy(keyCols: _*).count()
        .filter(col("count") > 1).limit(1).count()
      require(dupKeys == 0L,
        s"MERGE source has duplicate values of key (${keys.mkString(", ")}) — " +
          "each target row may match at most one source row")
      val insertRows = insertProjection(
        source.alias("s")
          .join(read(spark, table, asOf = Some(snap.version)).select(keyCols: _*),
            keys, "left_anti"))
      val newFiles = stageFiles(spark, table, insertRows, snap.partitionColumns,
        ColumnMapping.mapping(snap.schema), checks = snap.constraints)
      // no recorded change files: an insert-only merge is append-shaped
      // (no removes), so [[changesOfEntry]] synthesizes the identical
      // insert rows from the added files — the second full execution of
      // the anti-join (the CDC staged write) is pure overhead (guide §5)
      val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "MERGE",
        snap.schema, snap.partitionColumns, snap.files ++ newFiles,
        txns = snap.txns ++ txnUpdate)
      if (!tryCommit(spark, table, next, newFiles, Nil, cdc = None,
          prev = Some(snap))) {
        val f = fs(spark, table)
        newFiles.foreach(e =>
          try f.delete(new Path(dataPath(table), e.path), false)
          catch { case _: java.io.IOException => () })
        throw new ConcurrentCommitException(
          s"insert-only MERGE on $table lost the commit race — re-run (a concurrent " +
            "commit may have inserted keys this merge's anti-join never saw)")
      }
      return next.version
    }

    // ---- rewrite clauses present: copy-on-write over the affected files
    val scoped = scopeToUpdatePartitions && notMatchedBySource.isEmpty
    // dv-aware, `__file` column; the partition scope rides in as the
    // below-the-file-column predicate so pruning still fires
    val detectionSource = detectionScan(spark, table, snap, scope =
      if (scoped && snap.partitionColumns.nonEmpty)
        Some(partitionTuplePredicate(source, snap.partitionColumns))
      else None)
    // needed by matched clauses AND by the insert anti-join (whose
    // soundness requires every file containing a source key to be in
    // the affected set). The duplicate-source-key sentinel rides this
    // job (or the NMBS one when this tier is absent).
    val matchedFileAbs =
      if (matched.isEmpty && notMatchedInsert.isEmpty) Array.empty[String]
      else requireNoDupMark(detectionSource
        .join(broadcast(updKeys), keys)
        .select("__file").distinct()
        .unionByName(dupProbe)
        .collect().map(_.getString(0)))
    // NOT MATCHED BY SOURCE detection: any file holding a row that
    // passes some clause's condition may need rewriting (the row might
    // be unmatched — only the join can tell). Pushed-filter scan, so
    // the logged bounds skip files the conditions exclude; an
    // unconditional clause means every file.
    val nmbsFileAbs =
      if (notMatchedBySource.isEmpty) Array.empty[String]
      else {
        val pred = notMatchedBySource
          .map(_.condition.map(c => coalesce(c, lit(false))).getOrElse(lit(true)))
          .reduce(_ || _)
        val files = detectionScan(spark, table, snap, alias = Some("t"),
          scope = Some(pred)).select(col("__file")).distinct()
        val withProbe =
          if (matched.isEmpty && notMatchedInsert.isEmpty)
            files.unionByName(dupProbe)
          else files
        requireNoDupMark(withProbe.collect().map(_.getString(0)))
      }
    val affectedRel = mapMatchedRel(spark, table,
      (matchedFileAbs ++ nmbsFileAbs).distinct, "MERGE", snap)

    val base = dataPath(table).toString
    val sMarked = source.withColumn("__s_matched", lit(true))

    // NOTE on caching: the target⋈source join feeds the rewrite write
    // and the change-feed write, so persisting it looks attractive —
    // measured, it LOSES: the rewrite set is the bulk of the merge's
    // data, and writing it to the block store costs more than the
    // (columnar scan + one shuffle) recompute it saves. The SOURCE is
    // persisted (in mergeRows); the target side deliberately re-scans.
    val (rewritten, cdcRewrite) =
      if (affectedRel.isEmpty) (None, None)
      else {
        val t = readDataFilesLive(spark, table, snap, affectedRel).alias("t")
        val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
        val joined = t.join(sMarked.alias("s"), keyCond, "left_outer")
        val matchedMark = col("__s_matched").isNotNull
        val applied = appliedMarks(matchedMark, matched) ++
          appliedMarks(!matchedMark, notMatchedBySource)
        val deleted = applied.collect { case (a, _: MatchedDelete) => a }
          .reduceOption(_ || _).getOrElse(lit(false))
        val projected = ordered.map { fld =>
          val updates = applied.collect {
            case (a, MatchedUpdate(_, set)) if set.contains(fld.name) =>
              (a, set(fld.name).cast(fld.dataType))
          }
          updates.foldRight(col(s"t.${fld.name}")) { case ((a, v), acc) =>
            when(a, v).otherwise(acc)
          }.as(fld.name)
        }
        // change feed: pre/post of clause-updated rows, deletes of
        // clause-deleted rows — computed off the same join
        val tCols = ordered.map(fld => col(s"t.${fld.name}").as(fld.name))
        val updatedMark = applied.collect { case (a, _: MatchedUpdate) => a }
          .reduceOption(_ || _).getOrElse(lit(false))
        val cdcDf = joined.filter(updatedMark).select(tCols: _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(joined.filter(updatedMark).select(projected: _*)
            .withColumn(ChangeTypeCol, lit("update_postimage")))
          .unionByName(joined.filter(coalesce(deleted, lit(false))).select(tCols: _*)
            .withColumn(ChangeTypeCol, lit("delete")))
        (Some(joined.filter(!coalesce(deleted, lit(false))).select(projected: _*)),
          Some(cdcDf))
      }

    val insertRows =
      if (notMatchedInsert.isEmpty) None
      else Some {
        // every matched key's rows live in files the matched detection
        // saw; those files are all in affectedRel, so "key not in
        // affected rows" ⇔ "key not in the table"
        val existingKeys =
          if (affectedRel.isEmpty)
            spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
              StructType(keys.map(k => snap.schema(k))))
          else readDataFilesLive(spark, table, snap, affectedRel)
            .select(keyCols: _*)
        insertProjection(source.alias("s").join(existingKeys, keys, "left_anti"))
      }

    val toWrite = (rewritten, insertRows) match {
      case (Some(r), Some(i)) => r.unionByName(i)
      case (Some(r), None)    => r
      case (None, Some(i))    => i
      case (None, None)       =>
        // rewrite clauses but no affected file and no insert: no-op
        return snap.version
    }
    val cdcAll = (cdcRewrite.toSeq ++
      insertRows.map(_.withColumn(ChangeTypeCol, lit("insert"))).toSeq)
      .reduce(_ unionByName _)
    // independent staged writes — overlapped (guide §2.6)
    val (newFiles, cdcFiles) = stageConcurrently(
      stageFiles(spark, table, toWrite, snap.partitionColumns,
        ColumnMapping.mapping(snap.schema), checks = snap.constraints))(
      stageChangeFiles(spark, table, cdcAll))
    commitRewrite(spark, table, snap, "MERGE", _ => snap.schema,
      newFiles, affectedRel, scoped, cdc = Some(cdcFiles), txnUpdate = txnUpdate)
  }

  /** Ordered first-true-wins application marks: applied_i = gate ∧
    * ¬c₁ ∧ … ∧ ¬c_{i-1} ∧ c_i (NULL conditions do not apply). Shared by
    * the CoW ([[mergeRows]]) and MoR ([[mergeRowsMergeOnRead]]) clause
    * evaluators so both paths agree on SQL MERGE clause semantics.
    */
  private def appliedMarks(gate: Column, clauses: Seq[MatchedClause]): Seq[(Column, MatchedClause)] = {
    var notPrev: Column = lit(true)
    clauses.map { cl =>
      val c = cl.condition.map(x => coalesce(x, lit(false))).getOrElse(lit(true))
      val a = gate && notPrev && c
      notPrev = notPrev && !c
      (a, cl)
    }
  }

  /** Insert projection for anti-joined source rows under ordered insert
    * clauses; rows claimed by no clause are dropped.
    */
  private def insertProjectionOf(anti: DataFrame,
                                 notMatchedInsert: Seq[(Option[Column], Map[String, Column])],
                                 ordered: Seq[org.apache.spark.sql.types.StructField]): DataFrame = {
    var notPrev: Column = lit(true)
    val marks = notMatchedInsert.map { case (cond, image) =>
      val c = cond.map(x => coalesce(x, lit(false))).getOrElse(lit(true))
      val a = notPrev && c
      notPrev = notPrev && !c
      (a, image)
    }
    anti.filter(marks.map(_._1).reduce(_ || _))
      .select(ordered.map { fld =>
        marks.collect { case (a, image) if image.contains(fld.name) =>
          (a, image(fld.name).cast(fld.dataType))
        }.foldRight(lit(null).cast(fld.dataType): Column) { case ((a, v), acc) =>
          when(a, v).otherwise(acc)
        }.as(fld.name)
      }: _*)
  }

  /** A user partition predicate resolved against a snapshot's partition
    * schema, evaluable driver-side: per FILE path (exact, all columns
    * bound) and per DIRECTORY at any hive level (conjunct-wise — a
    * conjunct judges a dir only once every column it references is
    * bound by the path so far, so pruning is sound for arbitrary
    * predicates, not just leading-column ones).
    */
  private final class PartitionScope(
      conjuncts: Seq[(org.apache.spark.sql.catalyst.expressions.BasePredicate, Int)],
      pSchema: StructType, tz: Option[String]) {
    /** Exact membership of a table-relative FILE path. */
    def fileInScope(rel: String): Boolean = {
      val row = PartitionPaths.valuesOf(rel, pSchema, tz)
      conjuncts.forall(_._1.eval(row))
    }
    /** Can the dir binding columns [0, depth] still contain matches?
      * False only when some fully-bound conjunct refutes it.
      */
    def dirMayMatch(dirRel: String, depth: Int): Boolean = {
      val row = PartitionPaths.valuesOf(dirRel + "/_", pSchema, tz)
      !conjuncts.exists { case (p, maxIdx) => maxIdx <= depth && !p.eval(row) }
    }
    def numPartitionCols: Int = pSchema.size
  }

  /** Resolve a user `Column` against the PARTITION schema alone (an
    * empty frame): references to non-partition columns fail here, and
    * analysis applies the usual implicit casts. Shared by compact and
    * vacuum scoping.
    */
  private def resolvePartitionFilter(spark: SparkSession, snap: Snapshot,
                                     c: Column, what: String): PartitionScope = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression}
    val pSchema = GraftDataSource.asNullable(
      StructType(snap.partitionColumns.map(snap.schema(_))))
    val expr =
      try spark.createDataFrame(spark.sparkContext.emptyRDD[Row], pSchema)
        .filter(c).queryExecution.analyzed.collectFirst {
          case fl: org.apache.spark.sql.catalyst.plans.logical.Filter => fl.condition
        }.getOrElse(throw new IllegalArgumentException(
          s"could not resolve $what partitionFilter $c"))
      catch {
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"$what partitionFilter must reference only partition columns " +
              s"(${snap.partitionColumns.mkString(", ")}): ${e.getMessage}")
      }
    val resolver = spark.sessionState.conf.resolver
    require(PartitionPaths.evaluableOnPartitions(Seq(expr), pSchema, resolver),
      s"$what partitionFilter must reference only partition columns " +
        s"(${snap.partitionColumns.mkString(", ")}) deterministically")
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case other     => Seq(other)
    }
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val bound = split(expr).map { cj =>
      val maxIdx = cj.references.toSeq.map(a =>
        pSchema.fields.indexWhere(f => resolver(f.name, a.name))).foldLeft(0)(math.max)
      (PartitionPaths.bind(Seq(cj), pSchema, resolver), maxIdx)
    }
    new PartitionScope(bound, pSchema, tz)
  }

  /** Partition-tuple predicate of `updates`' distinct partition values
    * — bounded by partitions touched, not rows (the scoped-detection
    * pruner shared by [[merge]] and [[mergeRows]]).
    */
  private def partitionTuplePredicate(updates: DataFrame,
                                      pcols: Seq[String]): Column = {
    val tuples = updates.select(pcols.map(col): _*).distinct().collect()
    if (tuples.isEmpty) lit(false)
    else tuples.map { r =>
      pcols.zipWithIndex.map { case (c, i) =>
        if (r.isNullAt(i)) col(c).isNull else col(c) === lit(r.get(i))
      }.reduce(_ && _)
    }.reduce(_ || _)
  }

  /** Decode + qualify `input_file_name()` URIs into snapshot-relative
    * paths; a matched file that cannot be mapped under the data root
    * is a hard error (silently dropping it would commit duplicates).
    */
  private def mapMatchedRel(spark: SparkSession, table: String,
                            matchedAbs: Array[String], op: String,
                            snap: Snapshot): Seq[String] = {
    val f = fs(spark, table)
    val baseRaw = f.makeQualified(dataPath(table)).toUri.getPath.stripSuffix("/")
    // foreign (cloned) entries match by their own decoded absolute
    // path, not the clone's data root
    val foreignByRaw: Map[String, String] = snap.filePaths
      .filter(isForeignEntry).map(p => new Path(p).toUri.getPath -> p).toMap
    val matchedSet = matchedAbs.map { abs =>
      val p = decodeFileUri(abs)
      if (p.startsWith(baseRaw + "/")) p.drop(baseRaw.length + 1)
      else foreignByRaw.getOrElse(p,
        throw new IllegalArgumentException(
          s"$op matched file $p outside the table data root $baseRaw/ and not a " +
            "cloned reference of this snapshot — refusing to commit (the file " +
            "could not be marked for rewrite)"))
    }.toSet
    snap.filePaths.filter(matchedSet.contains)
  }

  /** The copy-on-write commit loop shared by [[merge]] and
    * [[mergeRows]]: replace `affectedRel` with `newFiles` on top of
    * the base snapshot; on a lost race, rebase iff the merge was
    * scoped and the winner's changes are provably disjoint from this
    * merge's footprint (read partitions + written files), else abort
    * loudly.
    */
  private def commitRewrite(spark: SparkSession, table: String, baseSnap: Snapshot,
                            op: String, schemaOf: Snapshot => StructType,
                            newFiles: Seq[FileEntry], affectedRel: Seq[String],
                            scoped: Boolean, cdc: Option[Seq[String]] = None,
                            txnUpdate: Map[String, Long] = Map.empty): Long = {
    val affectedPathSet = affectedRel.toSet
    // Disjointness keys on HIVE-PARTITION identity, not the parent dir:
    // bulk-move commits (r17) give every unpartitioned commit a distinct
    // batch dir, so a parent-dir check would judge any two of them
    // disjoint and silently rebase over rows the detection scan never
    // saw. partitionDirOf maps all unpartitioned files to "" — they
    // always conflict, matching the AddFile-vs-read-predicate rule.
    val footprintDirs = (newFiles.map(e => partitionDirOf(e.path)) ++
      affectedRel.map(partitionDirOf)).toSet
    var attempt = 0
    while (attempt < maxRetries) {
      val cur = if (attempt == 0) baseSnap
        else latestSnapshot(spark, table).getOrElse(baseSnap)
      if (cur.version != baseSnap.version) {
        val baseSet = baseSnap.filePaths.toSet
        val curSet = cur.filePaths.toSet
        val winnerChanged =
          cur.files.filterNot(e => baseSet(e.path)) ++
          baseSnap.files.filterNot(e => curSet(e.path))
        val disjoint = scoped &&
          cur.schema == baseSnap.schema &&
          cur.partitionColumns == baseSnap.partitionColumns &&
          // rows were validated against baseSnap's CHECK constraints;
          // a rebase over a changed set would commit unvalidated rows
          cur.constraints == baseSnap.constraints &&
          !winnerChanged.exists(e => footprintDirs(partitionDirOf(e.path)))
        if (!disjoint)
          throw new ConcurrentCommitException(
            s"$op on $table lost the commit race to v${cur.version} and the winning " +
              "commit overlaps this merge's scanned partitions (or changed the " +
              "schema/layout) — cannot rebase safely, re-run the merge")
      }
      val next = Snapshot(cur.version + 1, System.currentTimeMillis(), op,
        schemaOf(cur), cur.partitionColumns,
        cur.files.filterNot(e => affectedPathSet(e.path)) ++ newFiles,
        txns = cur.txns ++ txnUpdate)
      if (tryCommit(spark, table, next, newFiles, affectedRel, cdc = cdc,
          prev = Some(cur)))
        return next.version
      attempt += 1
    }
    throw new ConcurrentCommitException(s"$op on $table lost $maxRetries commit races")
  }

  // ---------------------------------------------------------------- delete

  /** Copy-on-write DELETE: remove the rows matching `condition`,
    * rewriting ONLY the files that contain at least one matching row —
    * every other file carries over by reference, so a selective delete
    * on a 100 TB table costs its matched files, not the table. Rows
    * where the condition is NULL are kept (SQL DELETE semantics).
    * Previous versions still time-travel. Returns the committed
    * version — the current one unchanged when nothing matched.
    *
    * Detection runs on the pinned snapshot and collects matched FILE
    * NAMES (bounded by file count, not rows); the rewrite reads just
    * those files and keeps their non-matching rows. A lost commit race
    * aborts with [[ConcurrentCommitException]] rather than rebasing:
    * any concurrent change could contain rows this delete's scan never
    * saw, and a silent rebase would resurrect or miss them.
    */
  /** Copy-on-write DELETE with a METADATA-ONLY fast path: a file every
    * live row of which provably matches the predicate is dropped from
    * the snapshot WITHOUT being read or rewritten
    * ([[DataSkipping.proveAllRows]] over the logged min/max bounds, the
    * hive partition values, and the source ranges generated-transform
    * partition values imply) — so a retention delete
    * (`ts < cutoff` on a day-partitioned 100 TB fact) costs O(boundary
    * partition): interior days leave by log edit, only the files
    * STRADDLING the cutoff are scanned and rewritten. The dropped
    * files' delete rows are not recorded as change data (that would
    * mean reading them); the commit marks them `removedFull` and the
    * change feed synthesizes their rows lazily from the previous
    * snapshot (reader protocol 4 — see [[Protocol]]).
    */
  def delete(spark: SparkSession, table: String, condition: Column): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val conds = resolvedConjuncts(spark, snap.schema, condition)

    // ---- metadata pass: whole-file drops, before ANY data I/O
    val dropped = provablyCoveredFiles(spark, snap, conds)
    val droppedSet = dropped.toSet

    // ---- detection over the REMAINING candidates only (driver-side
    // pruned by partitions + bounds + bloom) — the dropped files are
    // never opened; that is the point
    val remaining = snap.files.filterNot(e => droppedSet.contains(e.path))
    val cand = prunedEntries(spark, table, snap.copy(files = remaining), conds)
    val matchedAbs =
      if (cand.isEmpty) Array.empty[String]
      else morScan(spark, table, snap, cand, keepPos = true)
        .withColumnRenamed(FilePathCol, "__file").drop(RowPosCol)
        .filter(condition)
        .select(col("__file")).distinct()
        .collect().map(_.getString(0))
    if (matchedAbs.isEmpty && dropped.isEmpty) return snap.version

    // same URI-decode + qualify discipline as merge: a matched file
    // that cannot be mapped under the data root is a hard error
    val affectedRel =
      if (matchedAbs.isEmpty) Seq.empty[String]
      else mapMatchedRel(spark, table, matchedAbs, "DELETE", snap)
    val removedAll = affectedRel ++ dropped
    val removedSet = removedAll.toSet

    // CoW rewrite + recorded change rows for the PARTIALLY matched
    // files only; the dropped files' deletes ride as removedFull
    val (newFiles, cdcFiles) =
      if (affectedRel.isEmpty) (Seq.empty[FileEntry], Seq.empty[String])
      else {
        val affectedDf = readDataFilesLive(spark, table, snap, affectedRel)
        val kept = affectedDf.filter(!coalesce(condition, lit(false)))
        // independent staged writes — overlapped (guide §2.6)
        stageConcurrently(
          stageFiles(spark, table, kept, snap.partitionColumns,
            ColumnMapping.mapping(snap.schema)))(
          stageChangeFiles(spark, table,
            affectedDf.filter(coalesce(condition, lit(false)))
              .withColumn(ChangeTypeCol, lit("delete"))))
      }

    // Commit, rebasing onto concurrent commits when PROVABLY safe —
    // the continuous-ingest-vs-nightly-retention race. A rebase is
    // sound iff (a) schema/layout/constraints are unchanged, (b) every
    // file this delete removes is still present UNCHANGED in the new
    // head (FileEntry equality — a racing MoR delete's dv on one of
    // our files disqualifies: kept rows and change images were
    // computed under the old vector state), and (c) none of the
    // winners' ADDED files can contain a matching row — proven by the
    // same driver-side pruning a detection scan uses (partition
    // values, transform bounds, logged min/max, bloom); a fresh
    // append of ts >> cutoff proves disjoint by its stats, anything
    // unprovable refuses loudly (Delta's AddFile-vs-predicate
    // conflict rule).
    deleteBeforeCommitHook()
    commitPredicateRewrite(spark, table, snap, "DELETE", newFiles, removedAll,
      conds, cdcFiles, removedFull = dropped)
  }

  /** The metadata pass behind retention deletes: files of `snap` whose
    * every row PROVABLY satisfies the conjuncts
    * ([[DataSkipping.proveAllRows]]) given the logged footer stats,
    * the file's hive partition values (constant per file — partition
    * columns are never renamed, so logical == physical), and the
    * source intervals generated-transform partition values imply
    * ([[GeneratedColumns.sourceBounds]]). `conds`'s AND must equal the
    * caller's predicate exactly (resolvedConjuncts guarantees it when
    * non-empty; empty proves nothing).
    */
  private def provablyCoveredFiles(spark: SparkSession, snap: Snapshot,
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Seq[String] = {
    if (conds.isEmpty) return Nil
    val resolver = spark.sessionState.conf.resolver
    val pSchema = GraftDataSource.asNullable(
      StructType(snap.partitionColumns.map(snap.schema(_))))
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val nameMap = ColumnMapping.mapping(snap.schema)
    val physSchema = ColumnMapping.physicalSchema(snap.schema)
    val physConds =
      if (ColumnMapping.needsTranslation(snap.schema))
        conds.map(ColumnMapping.physicalizeExpr(_, nameMap))
      else conds
    val gens = GeneratedColumns.specs(snap.schema)
      .filter(s => snap.partitionColumns.contains(s.target))
    snap.files.filter { e =>
      val row = PartitionPaths.valuesOf(e.path, pSchema, tz)
      val known = scala.collection.mutable.Map.empty[String, DataSkipping.KnownBounds]
      pSchema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i))
          known(f.name) =
            DataSkipping.KnownBounds(f.dataType, row.get(i, f.dataType), row.get(i, f.dataType))
      }
      gens.foreach { sp =>
        val i = pSchema.fieldIndex(sp.target)
        if (!row.isNullAt(i)) {
          snap.schema.find(_.name == sp.source).foreach { sf =>
            GeneratedColumns.sourceBounds(sp.transform, sf.dataType,
                row.get(i, pSchema(sp.target).dataType)).foreach { case (lo, hi) =>
              known(nameMap.getOrElse(sp.source, sp.source)) =
                DataSkipping.KnownBounds(sf.dataType, lo, hi)
            }
          }
        }
      }
      DataSkipping.proveAllRows(physConds, physSchema, resolver, e, known.toMap)
    }.map(_.path)
  }

  /** Commit loop for predicate-scoped copy-on-write rewrites (DELETE /
    * UPDATE): replace `removedAll` with `newFiles` on top of the base
    * snapshot, REBASING onto concurrent commits when provably safe —
    * the continuous-ingest-vs-maintenance-DML race. A rebase is sound
    * iff (a) schema/layout/constraints are unchanged, (b) every file
    * this rewrite removes is still present UNCHANGED in the new head
    * (FileEntry equality — a racing MoR vector on one of our files
    * disqualifies: kept rows and change images were computed under the
    * old vector state), and (c) none of the winners' ADDED files can
    * contain a row matching `conds` — proven by the same driver-side
    * pruning a detection scan uses (partition values, transform
    * bounds, logged min/max, bloom); a fresh append of future data
    * proves disjoint by its stats, anything unprovable refuses loudly
    * (Delta's AddFile-vs-predicate conflict rule).
    */
  private def commitPredicateRewrite(spark: SparkSession, table: String,
      base: Snapshot, op: String, newFiles: Seq[FileEntry],
      removedAll: Seq[String],
      conds: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      cdcFiles: Seq[String], removedFull: Seq[String] = Nil): Long = {
    val removedSet = removedAll.toSet
    var cur = base
    var attempt = 0
    while (true) {
      val next = Snapshot(cur.version + 1, System.currentTimeMillis(), op,
        cur.schema, cur.partitionColumns,
        cur.files.filterNot(e => removedSet.contains(e.path)) ++ newFiles,
        txns = cur.txns,
        protocol = if (removedFull.nonEmpty) Protocol(4, 1) else Protocol(1, 1))
      if (tryCommit(spark, table, next, newFiles, removedAll, cdc = Some(cdcFiles),
          prev = Some(cur), removedFull = removedFull))
        return next.version
      attempt += 1
      if (attempt >= maxRetries)
        throw new ConcurrentCommitException(
          s"$op on $table lost $maxRetries commit races — re-run")
      val newest = latestSnapshot(spark, table).getOrElse(
        throw new IllegalStateException(s"log of $table disappeared mid-commit"))
      def refuse(why: String): Nothing = throw new ConcurrentCommitException(
        s"$op on $table lost the commit race to v${newest.version} and $why — " +
          "cannot rebase safely, re-run (a concurrent commit may contain rows " +
          s"this ${op.toLowerCase} never scanned)")
      if (newest.schema != cur.schema || newest.partitionColumns != cur.partitionColumns)
        refuse("the winner changed the schema or partition layout")
      if (newest.constraints != cur.constraints)
        refuse("the winner changed the CHECK constraints")
      val curByPath = cur.files.iterator.map(e => e.path -> e).toMap
      val newestByPath = newest.files.iterator.map(e => e.path -> e).toMap
      removedAll.foreach { p =>
        if (!newestByPath.get(p).contains(curByPath(p)))
          refuse(s"the winner rewrote, vectored or removed $p, a file this " +
            s"${op.toLowerCase} read")
      }
      val winnersAdds = newest.files.filterNot(e => curByPath.get(e.path).contains(e))
      if (conds.isEmpty && winnersAdds.nonEmpty)
        refuse("the predicate did not resolve for a disjointness proof")
      val mightMatch = prunedEntries(spark, table,
        newest.copy(files = winnersAdds), conds)
      if (mightMatch.nonEmpty)
        refuse(s"the winner added file(s) the predicate cannot be proven to miss " +
          s"(e.g. ${mightMatch.head.path})")
      cur = newest
    }
    throw new IllegalStateException("unreachable")
  }

  /** Vector-key column for the MoR position-delete paths: a matched
    * row in a LOCAL file keys on its data-root-relative path; a row in
    * a CLONED (foreign) file keys on the file's absolute URI verbatim —
    * the same key form [[shallowClone]] re-keys inherited vectors with,
    * and the form `_metadata.file_path` yields at scan time, so
    * [[morScan]]'s verbatim absolute-key resolution applies both
    * without caring who wrote them. `foreignAffected` is the matched
    * foreign entry set ([[mapMatchedRel]] already proved every matched
    * file is either local or a cloned reference of this snapshot);
    * anything else fails loudly IN THE PLAN rather than committing a
    * vector no scan would ever match.
    */
  private def morVectorKey(spark: SparkSession, table: String, op: String,
                           foreignAffected: Seq[String]): Column = {
    val prefix = scanDataPrefix(spark, table)
    val bad = raise_error(concat(
      lit(s"$op on $table matched a file outside the data root: "),
      col(FilePathCol)))
    // log-form foreign paths transcode to the scan form the column
    // carries ([[mapMatchedRel]] applies the inverse decode) — a
    // verbatim comparison would miss percent-encodable paths and raise
    // the misleading outside-the-data-root error for a legitimately
    // matched cloned file
    val foreignLeg =
      if (foreignAffected.isEmpty) bad
      else when(col(FilePathCol).isInCollection(foreignAffected.map(scanFormAbs)),
        col(FilePathCol)).otherwise(bad)
    when(col(FilePathCol).startsWith(prefix),
      col(FilePathCol).substr(lit(prefix.length + 1), lit(Int.MaxValue)))
      .otherwise(foreignLeg)
  }

  /** Stage `df` (columns `p` = data-file-relative path, `pos` = row
    * ordinal) as ONE new deletion-vector directory under `_deletes/`,
    * returning its table-relative path. Partitioned by file so a
    * reader's per-file rows cluster; `_SUCCESS` markers are hidden
    * files the parquet read ignores.
    */
  private def stageDeleteVector(spark: SparkSession, table: String,
                                df: DataFrame, parts: Int): String = {
    val f = fs(spark, table)
    val staging = new Path(new Path(table, "_staging"), java.util.UUID.randomUUID().toString)
    meteredCommit(df.repartition(parts, col("p")).write.mode("overwrite")
      .option("mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
      .parquet(staging.toString))
    val name = java.util.UUID.randomUUID().toString
    val dest = new Path(deletesPath(table), name)
    meteredCommit { meteredFileOps {
      f.mkdirs(deletesPath(table))
      if (!f.rename(staging, dest))
        throw new IllegalStateException(
          s"could not move staged deletion vector $staging to $dest")
    }}
    s"_deletes/$name"
  }

  /** Merge-on-read DELETE: instead of rewriting every data file that
    * contains a matching row (copy-on-write [[delete]] — O(bytes of
    * affected files)), commit a positional [[DeleteVector]] per
    * affected file and leave the data files untouched — O(deleted
    * rows) bytes written, the Iceberg-v2 positional-delete / Delta
    * deletion-vector discipline (ref:
    * trino_iceberg_transform_component.py:33,116-123). The canonical
    * 100 TB case is a trickle of GDPR-style point deletes against a
    * fact table: CoW rewrites the table; this writes kilobytes.
    *
    * Reads apply the vectors via [[morScan]]; [[compact]] reconciles
    * them back into clean files; the change feed records the deleted
    * rows at commit time exactly like CoW. A file whose every row is
    * deleted is simply REMOVED from the snapshot (no vector needed).
    * Repeat deletes on the same file fold the old vector into the new
    * one, so each entry references its complete deleted set. Commits
    * stamp protocol (3, 3): older readers/writers refuse loudly
    * instead of resurrecting rows. Returns the committed version —
    * unchanged when nothing matched.
    */
  def deleteMergeOnRead(spark: SparkSession, table: String, condition: Column): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val conds = resolvedConjuncts(spark, snap.schema, condition)
    // metadata pass, shared with CoW delete: a provably-covered file
    // needs no vector AND no read — it leaves by log edit, its delete
    // rows ride removedFull for lazy feed synthesis. A MoR retention
    // sweep therefore vectors only the boundary files.
    val dropped = provablyCoveredFiles(spark, snap, conds)
    val droppedSet = dropped.toSet
    val remaining = snap.files.filterNot(e => droppedSet.contains(e.path))
    val candidates = prunedEntries(spark, table, snap.copy(files = remaining), conds)
    if (candidates.isEmpty && dropped.isEmpty) return snap.version

    // one detection scan, three consumers (positions, per-file counts,
    // change-feed preimages): persist so they agree and the scan runs
    // once. Bounded by matched rows, not table size.
    val matched = morScan(spark, table, snap, candidates, keepPos = true)
      .filter(coalesce(condition, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE action yields both the matched file set and the per-file
      // new-position counts (guide §5: the old separate
      // allRows.groupBy("p").count() job is gone); the committed
      // cardinality adds the folded old vector's logged cardinality —
      // sound because morScan already excludes dv'd rows, so new
      // positions are disjoint from the old vector's by construction
      val newCounts: Map[String, Long] = matched.groupBy(col(FilePathCol))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val matchedAbs = newCounts.keys.toArray
      if (matchedAbs.isEmpty && dropped.isEmpty) return snap.version
      val affectedRel =
        if (matchedAbs.isEmpty) Seq.empty[String]
        else mapMatchedRel(spark, table, matchedAbs, "DELETE", snap)
      val affectedSet = affectedRel.toSet
      val prefix = scanDataPrefix(spark, table)
      def scanAbsOf(e: FileEntry): String =
        if (isForeignEntry(e.path)) scanFormAbs(e.path)
        else prefix + scanFormRel(e.path)

      // vectors + recorded change rows only for the PARTIALLY matched
      // files; a dropped file's deletes ride as removedFull
      val (updated, cdcFiles): (Seq[FileEntry], Seq[String]) =
        if (affectedRel.isEmpty) (Seq.empty, Seq.empty)
        else {
          // new positions, keyed IN the plan (no driver round-trip of
          // row-level data): local files relativize, cloned (foreign)
          // files keep their absolute URIs — the clone-vector key form
          val relCol = morVectorKey(spark, table, "DELETE",
            affectedRel.filter(isForeignEntry))
          val newRows = matched.select(relCol.as("p"), col(RowPosCol).as("pos"))

          // fold in the affected files' existing vectors, so each
          // rewritten entry's single dv reference is its COMPLETE
          // deleted set
          val withOldDv = candidates.filter(e => affectedSet(e.path) && e.dv.isDefined)
          val allRows =
            if (withOldDv.isEmpty) newRows
            else newRows.unionByName(dvRows(spark, table, withOldDv)
              .filter(col("p").isInCollection(withOldDv.map(scanKey))))
          // two independent staged writes off the one persisted
          // detection scan — overlapped (guide §2.6)
          val (dvDir, cdc) = stageConcurrently(
            stageDeleteVector(spark, table, allRows,
              math.max(1, math.min(32, affectedRel.size))))(
            stageChangeFiles(spark, table,
              matched.drop(FilePathCol, RowPosCol)
                .withColumn(ChangeTypeCol, lit("delete"))))

          val upd = remaining.filter(e => affectedSet.contains(e.path)).flatMap { e =>
            val newCard = newCounts.getOrElse(scanAbsOf(e), 0L)
            // every affected file has >=1 matched row, so a missing key
            // means the detection rows and the log disagree on path form
            require(newCard > 0, s"internal: no matched rows keyed as " +
              s"${e.path} — vector-key/entry-path form drift")
            val card = newCard + e.dv.map(_.cardinality).getOrElse(0L)
            // fully-deleted file: drop the entry outright (vacuum
            // reclaims the bytes once the version ages out)
            if (e.rowCount >= 0 && card >= e.rowCount) None
            else Some(e.copy(dv = Some(DeleteVector(dvDir, card))))
          }
          (upd, cdc)
        }

      val carried = remaining.filterNot(e => affectedSet.contains(e.path))
      val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "DELETE",
        snap.schema, snap.partitionColumns, carried ++ updated, txns = snap.txns,
        protocol = Protocol(if (dropped.nonEmpty) 4 else 3, 3))
      if (!tryCommit(spark, table, next, updated, affectedRel ++ dropped,
          cdc = Some(cdcFiles), prev = Some(snap), removedFull = dropped))
        throw new ConcurrentCommitException(
          s"merge-on-read DELETE on $table lost the commit race — re-run (a " +
            "concurrent commit may contain rows this delete never scanned)")
      next.version
    } finally matched.unpersist(blocking = false)
  }

  /** Merge-on-read UPDATE: express the update as a positional delete of
    * the old images plus an APPEND of the new ones — the Iceberg-v2
    * position-delete + data-file discipline — instead of rewriting every
    * file containing a match (copy-on-write [[update]]). A 1-row update
    * on a 100 TB fact therefore writes O(updated rows) bytes (one tiny
    * vector + one tiny data file), not O(bytes of affected files).
    * Matched files keep their data untouched and gain (or fold) a
    * [[DeleteVector]] hiding the pre-image rows; the post-image rows
    * stage through the ordinary append path, so partition routing
    * (including re-routing on a partition-column assignment), CHECK
    * constraints, column mapping and generated columns all hold.
    * The change feed records pre/post images exactly like CoW UPDATE.
    * Commits stamp protocol (3, 3); returns the committed version —
    * unchanged when nothing matched.
    */
  def updateMergeOnRead(spark: SparkSession, table: String,
                        set: Seq[(String, Column)], condition: Column): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    require(set.nonEmpty, s"UPDATE on $table assigns no columns")
    val unknown = set.map(_._1).filterNot(n => snap.schema.fieldNames.contains(n))
    require(unknown.isEmpty, s"UPDATE on $table assigns unknown column(s): " +
      unknown.mkString(", "))
    val setByName = set.toMap
    val conds = resolvedConjuncts(spark, snap.schema, condition)
    // file-level prune against the logged bounds: a selective predicate's
    // detection scan reads only the files it could possibly match
    val candidates = prunedEntries(spark, table, snap, conds)
    if (candidates.isEmpty) return snap.version

    // one dv-aware detection scan, three consumers (old positions,
    // post-image rows, change-feed images): persist so they agree and
    // the scan runs once. Bounded by matched rows, not table size.
    val matched = morScan(spark, table, snap, candidates, keepPos = true)
      .filter(coalesce(condition, lit(false)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one action for the matched file set AND per-file new-position
      // counts; committed cardinality = new + folded old vector's
      // logged cardinality (disjoint by construction — morScan already
      // excludes dv'd rows). See deleteMergeOnRead.
      val newCounts: Map[String, Long] = matched.groupBy(col(FilePathCol))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val matchedAbs = newCounts.keys.toArray
      if (matchedAbs.isEmpty) return snap.version
      val affectedRel = mapMatchedRel(spark, table, matchedAbs, "UPDATE", snap)
      val affectedSet = affectedRel.toSet
      val prefix = scanDataPrefix(spark, table)
      def scanAbsOf(e: FileEntry): String =
        if (isForeignEntry(e.path)) scanFormAbs(e.path)
        else prefix + scanFormRel(e.path)

      // position-delete the OLD images, folding the affected files'
      // existing vectors so each rewritten entry's single dv reference
      // is its complete deleted set (same discipline as MoR DELETE);
      // cloned (foreign) files key on their absolute URIs
      val relCol = morVectorKey(spark, table, "UPDATE",
        affectedRel.filter(isForeignEntry))
      val newRows = matched.select(relCol.as("p"), col(RowPosCol).as("pos"))
      val withOldDv = candidates.filter(e => affectedSet(e.path) && e.dv.isDefined)
      val allRows =
        if (withOldDv.isEmpty) newRows
        else newRows.unionByName(dvRows(spark, table, withOldDv)
          .filter(col("p").isInCollection(withOldDv.map(scanKey))))

      // append the POST images through the ordinary staging path
      // (partition routing, constraints, mapping, generated columns)
      val applied = snap.schema.fields.toSeq.map { fld =>
        setByName.get(fld.name) match {
          case Some(v) => v.cast(fld.dataType).as(fld.name)
          case None => col(fld.name)
        }
      }
      val postRows = matched.select(applied: _*)
      // three independent staged writes off the one persisted detection
      // scan — overlapped (guide §2.6)
      val (dvDir, (newFiles, cdcFiles)) = stageConcurrently(
        stageDeleteVector(spark, table, allRows,
          math.max(1, math.min(32, affectedRel.size))))(
        stageConcurrently(
          stageFiles(spark, table, postRows, snap.partitionColumns,
            ColumnMapping.mapping(snap.schema), checks = snap.constraints))(
          stageChangeFiles(spark, table,
            matched.select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
              .withColumn(ChangeTypeCol, lit("update_preimage"))
              .unionByName(postRows.withColumn(ChangeTypeCol,
                lit("update_postimage"))))))

      val updated = snap.files.filter(e => affectedSet.contains(e.path)).flatMap { e =>
        val newCard = newCounts.getOrElse(scanAbsOf(e), 0L)
        require(newCard > 0, s"internal: no matched rows keyed as " +
          s"${e.path} — vector-key/entry-path form drift")
        val card = newCard + e.dv.map(_.cardinality).getOrElse(0L)
        // every row updated: the old file leaves the snapshot outright
        // (its full content rides the feed as preimages already)
        if (e.rowCount >= 0 && card >= e.rowCount) None
        else Some(e.copy(dv = Some(DeleteVector(dvDir, card))))
      }
      val carried = snap.files.filterNot(e => affectedSet.contains(e.path))
      val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "UPDATE",
        snap.schema, snap.partitionColumns, carried ++ updated ++ newFiles,
        txns = snap.txns, protocol = Protocol(3, 3))
      if (!tryCommit(spark, table, next, updated ++ newFiles, affectedRel,
          cdc = Some(cdcFiles), prev = Some(snap)))
        throw new ConcurrentCommitException(
          s"merge-on-read UPDATE on $table lost the commit race — re-run (a " +
            "concurrent commit may contain rows this update never scanned)")
      next.version
    } finally matched.unpersist(blocking = false)
  }

  /** Merge-on-read MERGE (upsert): [[merge]]'s semantics — existing
    * keys take the source row, fresh keys insert — expressed as a
    * positional delete of the replaced target rows plus an APPEND of
    * the source rows, instead of rewriting every file containing a key
    * match. A trickle upsert against a 100 TB fact therefore writes
    * O(source rows) bytes. Detection prunes files against the logged
    * key bounds when the source's distinct keys are bounded (pushed
    * per-column IN, the [[graft.operators.Dedup.probeMinhashIndex]]
    * discipline); the change feed carries the same pre/post/insert
    * images as the CoW path (spec-pinned state-identical to [[merge]]).
    * Schema evolution stays on the CoW path: source columns must exist
    * in the snapshot schema (missing ones pad as null, like [[merge]]).
    * Returns the committed version.
    */
  def mergeMergeOnRead(spark: SparkSession, table: String, updates0: DataFrame,
                       keys: Seq[String], maxPushedKeys: Int = 10000): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    require(keys.nonEmpty && keys.forall(snap.schema.fieldNames.contains),
      s"merge keys must be target columns: ${keys.mkString(", ")}")
    val sane = ColumnMapping.sanitize(updates0)
    val newCols = sane.columns.filterNot(snap.schema.fieldNames.contains)
    require(newCols.isEmpty,
      s"merge-on-read MERGE on $table cannot add column(s) ${newCols.mkString(", ")} " +
        "— schema evolution is copy-on-write; use merge()")
    require(keys.forall(sane.columns.contains),
      s"source is missing merge key column(s): ${keys.filterNot(sane.columns.contains).mkString(", ")}")
    // pad + order to the snapshot schema (missing source columns → null)
    val updates = sane.select(snap.schema.fields.toSeq.map { fld =>
      if (sane.columns.contains(fld.name)) col(fld.name).cast(fld.dataType).as(fld.name)
      else lit(null).cast(fld.dataType).as(fld.name)
    }: _*).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val updKeys = updates.select(keys.map(col): _*).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // bounded-key file prune: per-column IN over the collected distinct
      // keys (a conjunctive superset for composite keys — sound for
      // skipping); an unbounded source degrades to scanning the
      // candidates the join needs anyway, never a corpus re-shuffle
      val keyRows = updKeys.limit(maxPushedKeys + 1).collect()
      // empty source: nothing to position-delete, nothing to append —
      // early-return instead of committing a pure version-churn snapshot
      // (same contract as updateMergeOnRead when nothing matches)
      if (keyRows.isEmpty) return snap.version
      val candidates =
        if (keyRows.length > maxPushedKeys) snap.files
        else {
          val pruneCond = keys.zipWithIndex.map { case (k, i) =>
            col(k).isInCollection(keyRows.map(_.get(i)).distinct.toSeq)
          }.reduce(_ && _)
          prunedEntries(spark, table, snap,
            resolvedConjuncts(spark, snap.schema, pruneCond))
        }
      val matched = morScan(spark, table, snap, candidates, keepPos = true)
        .join(broadcast(updKeys), keys, "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // one action for the matched file set AND per-file new-position
        // counts (see deleteMergeOnRead)
        val newCounts: Map[String, Long] = matched.groupBy(col(FilePathCol))
          .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val matchedAbs = newCounts.keys.toArray
        val affectedRel =
          if (matchedAbs.isEmpty) Seq.empty[String]
          else mapMatchedRel(spark, table, matchedAbs, "MERGE", snap)
        val affectedSet = affectedRel.toSet
        val prefix = scanDataPrefix(spark, table)
        def scanAbsOf(e: FileEntry): String =
          if (isForeignEntry(e.path)) scanFormAbs(e.path)
          else prefix + scanFormRel(e.path)

        // three independent staged writes: the position-delete vector +
        // change feed (both derived from the persisted detection scan)
        // overlap the source append (guide §2.6). No match ⇒ the commit
        // is append-shaped and the feed synthesizes the same inserts
        // from the added files: skip both the vector and the CDC write.
        val ((updated, cdcFiles), newFiles) = stageConcurrently({
          if (affectedRel.isEmpty)
            (Seq.empty[FileEntry], Option.empty[Seq[String]])
          else {
            // position-delete the replaced target rows (fold existing
            // vectors); cloned (foreign) files key on absolute URIs
            val relCol = morVectorKey(spark, table, "MERGE",
              affectedRel.filter(isForeignEntry))
            val newRows = matched.select(relCol.as("p"), col(RowPosCol).as("pos"))
            val withOldDv = candidates.filter(e => affectedSet(e.path) && e.dv.isDefined)
            val allRows =
              if (withOldDv.isEmpty) newRows
              else newRows.unionByName(dvRows(spark, table, withOldDv)
                .filter(col("p").isInCollection(withOldDv.map(scanKey))))
            val pre = matched.drop(FilePathCol, RowPosCol)
            // change feed: replaced rows as pre/post images, fresh keys
            // as inserts — identical kinds to the CoW upsert's
            val (dvDir, cdc) = stageConcurrently(
              stageDeleteVector(spark, table, allRows,
                math.max(1, math.min(32, affectedRel.size))))({
              val tableKeys = pre.select(keys.map(col): _*).distinct()
              stageChangeFiles(spark, table,
                pre.withColumn(ChangeTypeCol, lit("update_preimage"))
                  .unionByName(updates.join(broadcast(tableKeys), keys, "left_semi")
                    .withColumn(ChangeTypeCol, lit("update_postimage")))
                  .unionByName(updates.join(broadcast(tableKeys), keys, "left_anti")
                    .withColumn(ChangeTypeCol, lit("insert"))))
            })
            val upd = snap.files.filter(e => affectedSet.contains(e.path)).flatMap { e =>
              val newCard = newCounts.getOrElse(scanAbsOf(e), 0L)
              require(newCard > 0, s"internal: no matched rows keyed as " +
                s"${e.path} — vector-key/entry-path form drift")
              val card = newCard + e.dv.map(_.cardinality).getOrElse(0L)
              if (e.rowCount >= 0 && card >= e.rowCount) None
              else Some(e.copy(dv = Some(DeleteVector(dvDir, card))))
            }
            (upd, Some(cdc))
          }
        })(
          // append EVERY source row (replacement images + fresh inserts)
          stageFiles(spark, table, updates, snap.partitionColumns,
            ColumnMapping.mapping(snap.schema), checks = snap.constraints))

        val carried = snap.files.filterNot(e => affectedSet.contains(e.path))
        val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "MERGE",
          snap.schema, snap.partitionColumns, carried ++ updated ++ newFiles,
          txns = snap.txns, protocol = Protocol(3, 3))
        if (!tryCommit(spark, table, next, updated ++ newFiles, affectedRel,
            cdc = cdcFiles, prev = Some(snap)))
          throw new ConcurrentCommitException(
            s"merge-on-read MERGE on $table lost the commit race — re-run (a " +
              "concurrent commit may contain rows this merge never scanned)")
        next.version
      } finally matched.unpersist(blocking = false)
    } finally {
      updKeys.unpersist(blocking = false)
      updates.unpersist(blocking = false)
    }
  }

  /** Merge-on-read form of [[mergeRows]] for the MATCHED-clause surface:
    * ordered condition-gated `WHEN MATCHED` UPDATE / DELETE clauses plus
    * ordered `WHEN NOT MATCHED INSERT` clauses. The matched pre-images
    * CLAIMED by some clause are position-deleted (vectors folding with
    * the affected files' existing ones); update post-images and
    * anti-joined inserts land through the ordinary append path. A
    * matched row claimed by NO clause keeps its position in place —
    * zero bytes written for it, where the CoW [[mergeRows]] rewrites
    * its whole file. A conditional trickle-upsert or a
    * retention-delete-with-merge against a 100 TB fact therefore writes
    * O(claimed rows) bytes, not O(bytes of affected files).
    *
    * Clause semantics are [[mergeRows]]'s exactly (shared
    * [[appliedMarks]]/[[insertProjectionOf]] evaluators): conditions and
    * assignment values are Columns over the aliased sides `t`/`s`,
    * first-true wins, NULL conditions do not apply, unassigned columns
    * keep the target value, SQL cardinality violations fail loudly.
    * `WHEN NOT MATCHED BY SOURCE` (r14) also has an MoR expression: its
    * semantics concern the whole table, so the READ is only
    * condition-bounded (the CoW detection's pushed-filter scan — an
    * unconditional clause means every file), but the WRITE stays
    * O(claimed rows) — position-deletes + update post-images — where
    * CoW rewrites every file holding one claimed row (a sync-deletes
    * merge against a 100 TB fact rewrites the table under CoW and
    * writes only vectors here). Schema is FIXED (assignments must name
    * snapshot columns). Detection prunes files by pushed per-column IN
    * when the source's distinct keys are bounded, like
    * [[mergeMergeOnRead]]; the NMBS scan does not weaken the matched
    * tier's prune. The change feed carries the same
    * pre/post/delete/insert images as the CoW path. Returns the
    * committed version — unchanged when no clause claims anything.
    */
  def mergeRowsMergeOnRead(spark: SparkSession, table: String, source0: DataFrame,
                           keys: Seq[String], matched: Seq[MatchedClause],
                           notMatchedInsert: Seq[(Option[Column], Map[String, Column])] = Nil,
                           notMatchedBySource: Seq[MatchedClause] = Nil,
                           maxPushedKeys: Int = 10000,
                           txn: Option[(String, Long)] = None): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    require(matched.nonEmpty || notMatchedInsert.nonEmpty || notMatchedBySource.nonEmpty,
      "mergeRowsMergeOnRead needs at least one matched, insert or " +
        "not-matched-by-source clause")
    if (txn.exists { case (appId, v) => snap.txns.get(appId).exists(_ >= v) })
      return snap.version
    val assignedCols = (matched ++ notMatchedBySource)
      .collect { case MatchedUpdate(_, set) => set.keys }
      .flatten ++ notMatchedInsert.flatMap(_._2.keys)
    val unknown = assignedCols.filterNot(snap.schema.fieldNames.contains).toSeq.distinct
    require(unknown.isEmpty,
      s"mergeRowsMergeOnRead on $table assigns unknown column(s): " +
        s"${unknown.mkString(", ")} — schema evolution is copy-on-write; use mergeRows()")
    require(keys.forall(snap.schema.fieldNames.contains),
      s"merge keys must be target columns: ${keys.mkString(", ")}")
    val sane = ColumnMapping.sanitize(source0)
    require(keys.forall(sane.columns.contains),
      s"source is missing merge key column(s): ${keys.filterNot(sane.columns.contains).mkString(", ")}")

    val ordered = snap.schema.fields.toSeq
    // persisted once: cardinality check, key prune, row join and insert
    // anti-join must see the same materialization (Delta's staged-source
    // discipline — see mergeRows)
    val src = sane.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ONE action yields the bounded distinct-key sample AND the SQL
      // MERGE cardinality check (guide §5): when every distinct key fit
      // under the cap, duplicate detection is a local scan of the
      // collected counts; only an over-cap source (which degrades to
      // full-candidate detection anyway) pays a dedicated dup probe.
      val dupMsg = s"MERGE source has duplicate values of key " +
        s"(${keys.mkString(", ")}) — each target row may match at most one source row"
      val aggRows = src.groupBy(keys.map(col): _*)
        .agg(count(lit(1)).as("__cnt")).limit(maxPushedKeys + 1).collect()
      if (aggRows.length <= maxPushedKeys)
        require(!aggRows.exists(_.getLong(keys.length) > 1L), dupMsg)
      else
        require(src.groupBy(keys.map(col): _*).count()
          .filter(col("count") > 1).limit(1).count() == 0L, dupMsg)
      val keyRows = aggRows
      // an empty source is a no-op for the matched/insert tiers, but an
      // NMBS clause then claims (up to its condition) EVERY target row —
      // the sync-to-empty shape must fall through
      if (keyRows.isEmpty && notMatchedBySource.isEmpty) return snap.version
      // bounded-key file prune (sound conjunctive superset; an unbounded
      // source degrades to the full candidate set, never a re-shuffle)
      val candidates =
        if (keyRows.length > maxPushedKeys) snap.files
        else {
          val pruneCond = keys.zipWithIndex.map { case (k, i) =>
            col(k).isInCollection(keyRows.map(_.get(i)).distinct.toSeq)
          }.reduce(_ && _)
          prunedEntries(spark, table, snap,
            resolvedConjuncts(spark, snap.schema, pruneCond))
        }

      // every target row whose key the source names, with its source row
      // alongside and its (file, pos) riding — the clause evaluation,
      // position-delete and CDC all read this ONE persisted join
      val t = morScan(spark, table, snap, candidates, keepPos = true).alias("t")
      val keyCond = keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _)
      var joinedN: DataFrame = null
      val joined = t.join(src.alias("s"), keyCond, "inner")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val marks = appliedMarks(lit(true), matched)
        val claimed = marks.map(_._1).reduceOption(_ || _).getOrElse(lit(false))
        val updatedMark = marks.collect { case (a, _: MatchedUpdate) => a }
          .reduceOption(_ || _).getOrElse(lit(false))
        val deletedMark = marks.collect { case (a, _: MatchedDelete) => a }
          .reduceOption(_ || _).getOrElse(lit(false))
        val tCols = ordered.map(fld => col(s"t.${fld.name}").as(fld.name))
        val projected = ordered.map { fld =>
          val updates = marks.collect {
            case (a, MatchedUpdate(_, set)) if set.contains(fld.name) =>
              (a, set(fld.name).cast(fld.dataType))
          }
          updates.foldRight(col(s"t.${fld.name}")) { case ((a, v), acc) =>
            when(a, v).otherwise(acc)
          }.as(fld.name)
        }

        // NMBS tier: target rows with NO source match, detected via the
        // CoW condition-pruned detection (dv-aware), claimed via the
        // same ordered evaluators over a left-outer join whose source
        // columns are null — CoW semantics by construction. Yields
        // (claimed positions, update post-images, change rows).
        val nmbs: Option[(DataFrame, DataFrame, DataFrame)] =
          if (notMatchedBySource.isEmpty) None
          else {
            val pred = notMatchedBySource
              .map(_.condition.map(c => coalesce(c, lit(false))).getOrElse(lit(true)))
              .reduce(_ || _)
            val nmbsAbs = detectionScan(spark, table, snap, alias = Some("t"),
              scope = Some(pred)).select(col("__file")).distinct()
              .collect().map(_.getString(0))
            if (nmbsAbs.isEmpty) None
            else {
              val rel = mapMatchedRel(spark, table, nmbsAbs, "MERGE", snap).toSet
              val entries = snap.files.filter(e => rel(e.path))
              val tN = morScan(spark, table, snap, entries, keepPos = true).alias("t")
              val jN = tN.join(src.withColumn("__s_matched", lit(true)).alias("s"),
                  keyCond, "left_outer")
                .filter(col("__s_matched").isNull)
                .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
              joinedN = jN
              val marksN = appliedMarks(lit(true), notMatchedBySource)
              val claimedN = marksN.map(_._1).reduceOption(_ || _).getOrElse(lit(false))
              val updatedN = marksN.collect { case (a, _: MatchedUpdate) => a }
                .reduceOption(_ || _).getOrElse(lit(false))
              val deletedN = marksN.collect { case (a, _: MatchedDelete) => a }
                .reduceOption(_ || _).getOrElse(lit(false))
              val projectedN = ordered.map { fld =>
                val ups = marksN.collect {
                  case (a, MatchedUpdate(_, set)) if set.contains(fld.name) =>
                    (a, set(fld.name).cast(fld.dataType))
                }
                ups.foldRight(col(s"t.${fld.name}")) { case ((a, v), acc) =>
                  when(a, v).otherwise(acc)
                }.as(fld.name)
              }
              val cdcN = jN.filter(updatedN).select(tCols: _*)
                .withColumn(ChangeTypeCol, lit("update_preimage"))
                .unionByName(jN.filter(updatedN).select(projectedN: _*)
                  .withColumn(ChangeTypeCol, lit("update_postimage")))
                .unionByName(jN.filter(deletedN).select(tCols: _*)
                  .withColumn(ChangeTypeCol, lit("delete")))
              Some((jN.filter(claimedN).select(col(FilePathCol), col(RowPosCol)),
                jN.filter(updatedN).select(projectedN: _*), cdcN))
            }
          }

        val hit0 = joined.filter(claimed).select(col(FilePathCol), col(RowPosCol))
        val hit = nmbs.map { case (h, _, _) => hit0.unionByName(h) }.getOrElse(hit0)
        // one action for the claimed file set AND per-file new-position
        // counts (see deleteMergeOnRead)
        val newCounts: Map[String, Long] = hit.groupBy(col(FilePathCol))
          .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val matchedAbs = newCounts.keys.toArray
        val affectedRel =
          if (matchedAbs.isEmpty) Seq.empty[String]
          else mapMatchedRel(spark, table, matchedAbs, "MERGE", snap)
        val affectedSet = affectedRel.toSet
        val prefix = scanDataPrefix(spark, table)
        def scanAbsOf(e: FileEntry): String =
          if (isForeignEntry(e.path)) scanFormAbs(e.path)
          else prefix + scanFormRel(e.path)

        // append: update post-images (both tiers) + anti-joined inserts.
        // The inner join above saw EVERY key match (candidates cover all
        // files the pushed prune could not exclude), so "key absent from
        // the join" ⇔ "key absent from the table"
        val postRows0 = joined.filter(updatedMark).select(projected: _*)
        val postRows = nmbs.map { case (_, p, _) => postRows0.unionByName(p) }
          .getOrElse(postRows0)
        val insertRows =
          if (notMatchedInsert.isEmpty) None
          else {
            val existingKeys = joined.select(keys.map(k => col(s"t.$k").as(k)): _*)
              .distinct()
            Some(insertProjectionOf(
              src.alias("s").join(existingKeys, keys, "left_anti"),
              notMatchedInsert, ordered))
          }
        val toWrite = insertRows match {
          case Some(i) => postRows.unionByName(i)
          case None    => postRows
        }
        // no claimed pre-image and nothing to append: a true no-op —
        // skip the commit entirely (unless a watermark must advance)
        if (affectedRel.isEmpty && txn.isEmpty && toWrite.limit(1).isEmpty)
          return snap.version

        // three independent staged writes: the position-delete vector +
        // change feed (claimed pre-images, folding the affected files'
        // existing vectors — same discipline as MoR DELETE/UPDATE, with
        // cloned files keyed on absolute URIs) overlap the post-image/
        // insert append (guide §2.6). Nothing claimed ⇒ the commit is
        // append-shaped (inserts only, no removes): skip the vector and
        // CDC writes — the feed synthesizes the identical inserts from
        // the added files.
        val ((updated, cdcFiles), newFiles) = stageConcurrently({
          if (affectedRel.isEmpty)
            (Seq.empty[FileEntry], Option.empty[Seq[String]])
          else {
            val relCol = morVectorKey(spark, table, "MERGE",
              affectedRel.filter(isForeignEntry))
            val newRows = hit.select(relCol.as("p"), col(RowPosCol).as("pos"))
            // fold from the snapshot, not the matched-tier prune: NMBS
            // may claim rows in files that prune excluded
            val withOldDv = snap.files.filter(e => affectedSet(e.path) && e.dv.isDefined)
            val allRows =
              if (withOldDv.isEmpty) newRows
              else newRows.unionByName(dvRows(spark, table, withOldDv)
                .filter(col("p").isInCollection(withOldDv.map(scanKey))))
            val cdcDf0 = joined.filter(updatedMark).select(tCols: _*)
              .withColumn(ChangeTypeCol, lit("update_preimage"))
              .unionByName(joined.filter(updatedMark).select(projected: _*)
                .withColumn(ChangeTypeCol, lit("update_postimage")))
              .unionByName(joined.filter(deletedMark).select(tCols: _*)
                .withColumn(ChangeTypeCol, lit("delete")))
            val cdcDf = nmbs.map { case (_, _, c) => cdcDf0.unionByName(c) }
              .getOrElse(cdcDf0)
            val cdcAll = (Seq(cdcDf) ++ insertRows.map(
              _.withColumn(ChangeTypeCol, lit("insert"))).toSeq)
              .reduce(_ unionByName _)
            val (dvDir, cdc) = stageConcurrently(
              stageDeleteVector(spark, table, allRows,
                math.max(1, math.min(32, affectedRel.size))))(
              stageChangeFiles(spark, table, cdcAll))
            val upd = snap.files.filter(e => affectedSet.contains(e.path)).flatMap { e =>
              val newCard = newCounts.getOrElse(scanAbsOf(e), 0L)
              require(newCard > 0, s"internal: no matched rows keyed as " +
                s"${e.path} — vector-key/entry-path form drift")
              val card = newCard + e.dv.map(_.cardinality).getOrElse(0L)
              if (e.rowCount >= 0 && card >= e.rowCount) None
              else Some(e.copy(dv = Some(DeleteVector(dvDir, card))))
            }
            (upd, Some(cdc))
          }
        })(
          stageFiles(spark, table, toWrite, snap.partitionColumns,
            ColumnMapping.mapping(snap.schema), checks = snap.constraints))
        val carried = snap.files.filterNot(e => affectedSet.contains(e.path))
        val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "MERGE",
          snap.schema, snap.partitionColumns, carried ++ updated ++ newFiles,
          txns = snap.txns ++ txn.toMap, protocol = Protocol(3, 3))
        if (!tryCommit(spark, table, next, updated ++ newFiles, affectedRel,
            cdc = cdcFiles, prev = Some(snap)))
          throw new ConcurrentCommitException(
            s"merge-on-read MERGE on $table lost the commit race — re-run (a " +
              "concurrent commit may contain rows this merge never scanned)")
        next.version
      } finally {
        joined.unpersist(blocking = false)
        if (joinedN != null) joinedN.unpersist(blocking = false)
      }
    } finally src.unpersist(blocking = false)
  }

  /** Copy-on-write UPDATE: apply `set` to the rows matching `condition`
    * (NULL conditions leave rows untouched, SQL semantics), rewriting
    * only the files containing at least one match — the same
    * file-granularity discipline as [[delete]]. Assigned values are
    * cast to the column's snapshot type (no silent type drift in the
    * log); assigning a PARTITION column re-routes the updated rows to
    * their new hive directories (the whole matched file is rewritten,
    * so its unmatched rows stay in place). Returns the committed
    * version — unchanged when nothing matched.
    */
  def update(spark: SparkSession, table: String, set: Seq[(String, Column)],
             condition: Column): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val unknown = set.map(_._1).filterNot(n => snap.schema.fieldNames.contains(n))
    require(unknown.isEmpty, s"UPDATE on $table assigns unknown column(s): " +
      unknown.mkString(", "))

    // detection through the registered source, pinned to this snapshot:
    // the pushed predicate prunes at FILE level against the logged
    // bounds (DataSkipping), so a selective predicate's detection scan
    // reads only the files it could possibly match — not the table
    // (dv-aware via detectionScan)
    val matchedAbs = detectionScan(spark, table, snap,
      resolvedConjuncts(spark, snap.schema, condition), scope = Some(condition))
      .select(col("__file")).distinct()
      .collect().map(_.getString(0))
    if (matchedAbs.isEmpty) return snap.version

    val affectedRel = mapMatchedRel(spark, table, matchedAbs, "UPDATE", snap)
    val setByName = set.toMap
    val hit = coalesce(condition, lit(false))
    val affectedDf = readDataFilesLive(spark, table, snap, affectedRel)
    val applied = snap.schema.fields.toSeq.map { fld =>
      setByName.get(fld.name) match {
        case Some(v) => v.cast(fld.dataType).as(fld.name)
        case None => col(fld.name)
      }
    }
    val rewritten = affectedDf
      .select(snap.schema.fields.map { fld =>
        setByName.get(fld.name) match {
          case Some(v) => when(hit, v.cast(fld.dataType)).otherwise(col(fld.name)).as(fld.name)
          case None => col(fld.name)
        }
      }.toIndexedSeq: _*)
    // change feed: pre/post images of exactly the hit rows; independent
    // of the rewrite write — overlapped (guide §2.6)
    val hitRows = affectedDf.filter(hit)
    val (newFiles, cdcFiles) = stageConcurrently(
      stageFiles(spark, table, rewritten, snap.partitionColumns,
        ColumnMapping.mapping(snap.schema), checks = snap.constraints))(
      stageChangeFiles(spark, table,
        hitRows.select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
          .withColumn(ChangeTypeCol, lit("update_preimage"))
          .unionByName(hitRows.select(applied: _*)
            .withColumn(ChangeTypeCol, lit("update_postimage")))))

    updateBeforeCommitHook()
    commitPredicateRewrite(spark, table, snap, "UPDATE", newFiles, affectedRel,
      resolvedConjuncts(spark, snap.schema, condition), cdcFiles)
  }

  // --------------------------------------------------------------- compact

  /** Bin-pack small data files (streaming MERGE and frequent appends
    * accumulate them) into fewer, larger ones — the OPTIMIZE /
    * rewrite_data_files analog. Files already at or above
    * `smallFileBytes` carry over by reference; only the small ones are
    * read back and rewritten, partitioning preserved. Rows are
    * untouched, so every reader sees identical data before and after;
    * earlier versions still time-travel (vacuum reclaims the old small
    * files once they age out of retention). Returns the committed
    * version, or the current one if there was nothing to pack.
    *
    * `sortBy` RANGE-CLUSTERS the rewrite on the given columns: rows
    * range-partition across the output files and sort within each, so
    * the per-file min/max bounds recorded in the transaction log come
    * out narrow and pairwise disjoint — a selective filter on the
    * leading sort column then skips whole FILES from the log
    * ([[DataSkipping]]), and parquet row-group stats prune within the
    * file. At 100 TB that is the difference between reading a file
    * list and reading a partition.
    *
    * `zorderBy` (mutually exclusive with `sortBy`, ≥2 columns) maps
    * each row onto a Z-order curve over the given columns and
    * range-clusters on that — every participating column keeps
    * file-bound locality, so filters on ANY one of them skip files,
    * where a linear sort only serves its leading column ([[ZOrder]]).
    *
    * `targetFileBytes` sizes the rewritten files (~one task per that
    * many input bytes).
    *
    * `partitionFilter` scopes the rewrite to the matching partitions
    * (evaluated driver-side against each file's hive path — no scan):
    * a 100 TB streaming fact compacts one day at a time instead of
    * bin-packing the whole table in one job. Files outside the scope
    * carry over by reference. The predicate must reference only
    * partition columns.
    */
  /** `REORG TABLE … APPLY (PURGE)` (Delta's name): rewrite ONLY the
    * files carrying outstanding deletion vectors — no bin-packing of
    * small files, no clustering — so readers stop paying the MoR
    * anti-join and vacuum can reclaim the vectors, without touching
    * anything else. A zero-byte small-file threshold makes [[compact]]
    * select exactly the dv-carrying set (it always pulls those in).
    */
  def reorgPurge(spark: SparkSession, table: String,
                 partitionFilter: Option[Column] = None): Long =
    compact(spark, table, smallFileBytes = 0L, partitionFilter = partitionFilter)

  def compact(spark: SparkSession, table: String,
              smallFileBytes: Long = 32L << 20,
              sortBy: Seq[String] = Nil,
              partitionFilter: Option[Column] = None,
              zorderBy: Seq[String] = Nil,
              targetFileBytes: Long = 128L << 20,
              dirScope: Option[Set[String]] = None): Long = {
    require(sortBy.isEmpty || zorderBy.isEmpty,
      "pass sortBy OR zorderBy, not both")
    require(zorderBy.isEmpty || zorderBy.size >= 2,
      "zorderBy needs at least two columns — use sortBy to cluster on one")
    require(zorderBy.size <= 10,
      s"zorderBy supports at most 10 columns (${ZOrder.BitsPerDim} bits each " +
        "must fit one long) — and curve locality degrades past a few anyway")
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    // a bucketed table's clustering IS its bucket layout; a sort/Z-order
    // compact would be silently undone by the bucket re-routing in
    // stageFiles — refuse loudly (plain compact bin-packs per bucket)
    require(Bucketing.spec(snap.schema).isEmpty ||
        (sortBy.isEmpty && zorderBy.isEmpty),
      s"$table is hash-bucketed — sortBy/zorderBy clustering does not compose " +
        "with a bucket layout; use plain compact (per-bucket bin-packing), or " +
        "re-create the table unbucketed to cluster it")
    // validate cluster columns BEFORE any early return: a misspelled
    // column on an already-compacted scope must fail loudly, not no-op
    (sortBy ++ zorderBy).foreach { c =>
      require(snap.schema.fieldNames.contains(c),
        s"cluster column $c is not in the schema of $table")
      require(!snap.partitionColumns.contains(c),
        s"cluster column $c is a partition column — constant per file already")
    }
    val f = fs(spark, table)
    val base = dataPath(table)
    val inFilter: FileEntry => Boolean = partitionFilter match {
      case None => _ => true
      case Some(c) =>
        val scope = resolvePartitionFilter(spark, snap, c, "compact")
        e => scope.fileInScope(e.path)
    }
    // dirScope (autoCompact's touched-partition set) composes with the
    // predicate filter: both must admit the file
    val inScope: FileEntry => Boolean = dirScope match {
      case None => inFilter
      case Some(ds) => e => inFilter(e) && ds.contains(partitionDirOf(e.path))
    }
    // sizes come from the log; a legacy entry (pre-stats log) costs one
    // stat — never a listing. A file with an outstanding deletion
    // vector joins the rewrite set REGARDLESS of size: compact is where
    // merge-on-read deletes reconcile back into clean files (Iceberg's
    // rewrite_data_files with delete-file compaction), so readers stop
    // paying the anti-join and vacuum can reclaim the vector.
    val sized = snap.files.map(e => e ->
      (if (e.size >= 0) e.size else f.getFileStatus(entryPath(base, e.path)).getLen))
    val (smallSized, bigSized) = sized.partition { case (e, sz) =>
      inScope(e) && (sz < smallFileBytes || e.dv.isDefined)
    }
    val small = smallSized.map(_._1)
    val big = bigSized.map(_._1)
    if (small.isEmpty || (small.size <= 1 && small.forall(_.dv.isEmpty)))
      return snap.version
    // a byte-budgeted task count: Spark's split planning targets one
    // split PER CORE (files.minPartitionNum defaults to the
    // parallelism), which on tiny inputs re-emits one output file per
    // input — the opposite of packing. ~targetFileBytes of small-file
    // bytes per task ⇒ each rewritten file lands near the parquet
    // sweet spot.
    val targetTasks = math.max(1,
      math.ceil(smallSized.map(_._2).sum.toDouble / targetFileBytes).toInt)
    val packed = readDataFilesLive(spark, table, snap, small.map(_.path))
    // partition cols lead the range-partitioning and the sort, so the
    // write path's required ordering is already satisfied and it does
    // not re-sort (which would destroy the clustering)
    val pCols = snap.partitionColumns.map(col)
    val rows =
      if (zorderBy.nonEmpty) {
        // logged LIVE row counts size the boundary sample; a legacy
        // entry (rowCount unknown) costs one count of the scope
        val counts = smallSized.map(_._1.liveRowCount)
        val totalRows = if (counts.forall(_ >= 0)) counts.sum else packed.count()
        val zc = "_graft_zvalue"
        packed.withColumn(zc, ZOrder.zvalue(packed, zorderBy, totalRows))
          .repartitionByRange(targetTasks, (pCols :+ col(zc)).toIndexedSeq: _*)
          .sortWithinPartitions((pCols :+ col(zc)).toIndexedSeq: _*)
          // dropping the helper is a projection: intra-partition order
          // survives, and so does the (partition-cols) ordering prefix
          // the writer requires
          .drop(zc)
      } else if (sortBy.nonEmpty) {
        val sCols = pCols ++ sortBy.map(col)
        packed.repartitionByRange(targetTasks, sCols.toIndexedSeq: _*)
          .sortWithinPartitions(sCols.toIndexedSeq: _*)
      } else packed.coalesce(targetTasks)
    val newFiles = stageFiles(spark, table, rows, snap.partitionColumns,
      ColumnMapping.mapping(snap.schema))
    compactBeforeCommitHook()
    // Rebase-on-race: a COMPACT is value-preserving surgery on a FIXED
    // file set, so losing the commit race to a concurrent APPEND (the
    // nightly-OPTIMIZE-under-continuous-ingest case) must not discard
    // the whole rewrite. As long as the newer head still carries every
    // rewritten entry UNCHANGED (same path, size, stats, and crucially
    // the same dv — a concurrent MoR delete disqualifies) and neither
    // schema nor partitioning moved (schema equality covers the bucket
    // spec and column mapping, which live in field metadata), the same
    // staged files re-commit on top of the new head: its files minus
    // the rewritten set plus the rewrite, its txns (concurrent
    // streaming watermarks survive). Anything else — a racing DELETE/
    // UPDATE/COMPACT that touched the set, a schema change — refuses
    // loudly, and the bound keeps a pathological commit storm finite.
    val rewrittenSet = small.toSet
    var prevSnap = snap
    var next = Snapshot(snap.version + 1, System.currentTimeMillis(), "COMPACT",
      snap.schema, snap.partitionColumns, big ++ newFiles, txns = snap.txns)
    var attempts = 0
    while (!tryCommit(spark, table, next, newFiles, small.map(_.path),
        prev = Some(prevSnap))) {
      attempts += 1
      val newer = latestSnapshot(spark, table).getOrElse(
        throw new ConcurrentCommitException(
          s"COMPACT on $table: log disappeared during the commit race"))
      val canRebase = attempts <= 5 &&
        newer.schema == snap.schema &&
        newer.partitionColumns == snap.partitionColumns &&
        rewrittenSet.subsetOf(newer.files.toSet)
      if (!canRebase)
        throw new ConcurrentCommitException(
          s"COMPACT on $table lost the commit race and cannot rebase — a " +
            "concurrent commit changed the schema, the partitioning, or the " +
            "files being rewritten; re-run")
      prevSnap = newer
      next = Snapshot(newer.version + 1, System.currentTimeMillis(), "COMPACT",
        newer.schema, newer.partitionColumns,
        newer.files.filterNot(rewrittenSet.contains) ++ newFiles,
        txns = newer.txns)
    }
    next.version
  }

  /** Test seam: invoked after a compact stages its rewrite, before the
    * commit loop — lets a spec interleave a concurrent commit
    * deterministically.
    */
  @volatile private[graft] var compactBeforeCommitHook: () => Unit = () => ()

  /** Test seam: invoked after a DELETE stages its rewrite and change
    * data, before its commit loop — lets a spec interleave a
    * concurrent commit deterministically.
    */
  @volatile private[graft] var deleteBeforeCommitHook: () => Unit = () => ()

  /** Test seam: the UPDATE counterpart of [[deleteBeforeCommitHook]]. */
  @volatile private[graft] var updateBeforeCommitHook: () => Unit = () => ()

  /** The hive partition directory of a table-relative file path ("" on
    * an unpartitioned table).
    */
  /** A file's HIVE-PARTITION identity: the leading run of `k=v` path
    * segments. Distinct from its parent directory since bulk-move
    * commits (r17) nest unpartitioned files under an opaque per-commit
    * batch dir — two trickle appends to an unpartitioned table land in
    * different parent dirs but the SAME (empty) partition, and
    * autoCompact's hot-partition scoping must see them together.
    */
  private[lake] def partitionDirOf(p: String): String =
    p.split('/').dropRight(1).takeWhile(_.contains('=')).mkString("/")

  /** Post-write auto-compaction (the Delta autoCompact idea): bin-pack
    * ONLY the hive partitions the LATEST commit touched, and only once
    * at least `minSmallFiles` in-scope files sit below
    * `smallFileBytes`. Trickle appends and per-micro-batch streaming
    * commits are THE small-file generators at 100 TB; this keeps each
    * hot partition's file count bounded without ever looking at — let
    * alone rewriting — the cold 99% of the table: the scope comes from
    * the last log entry's added paths (O(1 commit) metadata), the
    * decision from logged sizes, and the rewrite from a dir-scoped
    * [[compact]]. Below threshold it commits NOTHING (no empty COMPACT
    * versions from every write). Wired to
    * `option("autoCompact", "true")` on both the batch writer and the
    * streaming sink. Returns the COMPACT version, or None when below
    * threshold / nothing to do.
    */
  def autoCompact(spark: SparkSession, table: String,
                  smallFileBytes: Long = 32L << 20,
                  minSmallFiles: Int = 8,
                  targetFileBytes: Long = 128L << 20): Option[Long] = {
    val snapOpt = latestSnapshot(spark, table)
    if (snapOpt.isEmpty) return None
    val snap = snapOpt.get
    val entry = logEntryAt(spark, table, snap.version)
    val touched = entry.full.map(_.map(_.path)).getOrElse(entry.adds.map(_.path))
    if (touched.isEmpty) return None
    val dirs = touched.map(partitionDirOf).toSet
    val f = fs(spark, table)
    val base = dataPath(table)
    val smallInScope = snap.files.count { e =>
      dirs.contains(partitionDirOf(e.path)) &&
        (if (e.size >= 0) e.size
         else f.getFileStatus(entryPath(base, e.path)).getLen) < smallFileBytes
    }
    if (smallInScope < minSmallFiles) None
    else {
      val v = compact(spark, table, smallFileBytes = smallFileBytes,
        targetFileBytes = targetFileBytes, dirScope = Some(dirs))
      if (v == snap.version) None else Some(v)
    }
  }

  /** Reserved txn-ledger key recording the last clustering commit for
    * a given cluster spec — rides the snapshot's txns map (atomic with
    * the commit), distinguished from streaming writer ids by prefix.
    */
  private def clusterWatermarkKey(sortBy: Seq[String], zorderBy: Seq[String]): String =
    if (zorderBy.nonEmpty) s"__graft_cluster:z:${zorderBy.mkString(",")}"
    else s"__graft_cluster:s:${sortBy.mkString(",")}"

  /** Incremental re-cluster: range/Z-order-cluster ONLY the files that
    * arrived since the last clustering commit with the same spec (the
    * "unclustered tail"), carrying every already-clustered file by
    * reference. The last clustering version is a WATERMARK in the
    * snapshot's txn ledger (committed atomically with the clustering
    * itself), and "new since" is exactly the entries absent from that
    * version's snapshot — entries are immutable per path, so set
    * difference is the precise tail.
    *
    * This is the maintenance loop a daily-append 100 TB fact needs:
    * the first call clusters everything (no watermark yet); each later
    * call sorts just the day's appends into tightly-bounded files, so
    * [[DataSkipping]] keeps serving narrow per-file ranges WITHOUT the
    * daily full-partition rewrite a plain clustered [[compact]] costs.
    * Tail files overlap the historical runs' key ranges, which
    * file-bound skipping is indifferent to (each file's own bounds
    * stay tight); run a full clustered compact on the rare cadence
    * where merging runs pays. Files with outstanding deletion vectors
    * join the rewrite (same reconcile-on-rewrite rule as [[compact]]).
    * Returns the committed version — unchanged when the tail is empty.
    */
  def reclusterIncremental(spark: SparkSession, table: String,
                           sortBy: Seq[String] = Nil,
                           zorderBy: Seq[String] = Nil,
                           targetFileBytes: Long = 128L << 20,
                           partitionFilter: Option[Column] = None): Long = {
    require(sortBy.nonEmpty ^ zorderBy.nonEmpty,
      "pass exactly one of sortBy / zorderBy")
    require(zorderBy.isEmpty || zorderBy.size >= 2,
      "zorderBy needs at least two columns — use sortBy to cluster on one")
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    require(Bucketing.spec(snap.schema).isEmpty,
      s"$table is hash-bucketed — sort/Z-order clustering does not compose with " +
        "a bucket layout (stageFiles would re-route the rows by bucket)")
    (sortBy ++ zorderBy).foreach { c =>
      require(snap.schema.fieldNames.contains(c),
        s"cluster column $c is not in the schema of $table")
      require(!snap.partitionColumns.contains(c),
        s"cluster column $c is a partition column — constant per file already")
    }
    val key = clusterWatermarkKey(sortBy, zorderBy)
    val clusteredAsOf: Set[String] = snap.txns.get(key) match {
      case Some(v) => scala.util.Try(snapshotAt(spark, table, v).filePaths.toSet)
        .getOrElse(Set.empty) // watermark version vacuumed from the log → full pass
      case None => Set.empty
    }
    val inScope: FileEntry => Boolean = partitionFilter match {
      case None => _ => true
      case Some(c) =>
        val scope = resolvePartitionFilter(spark, snap, c, "recluster")
        e => scope.fileInScope(e.path)
    }
    // NOTE: the watermark is table-global per cluster spec — use a
    // consistent partitionFilter across calls (a scoped first pass
    // followed by an unscoped one would treat never-clustered files
    // that predate the watermark as clustered; run one unscoped full
    // pass to re-baseline)
    val tail = snap.files.filter(e =>
      inScope(e) && (!clusteredAsOf.contains(e.path) || e.dv.isDefined))
    if (tail.isEmpty) return snap.version
    val tailSet = tail.map(_.path).toSet
    val carried = snap.files.filterNot(e => tailSet.contains(e.path))

    val packed = readDataFilesLive(spark, table, snap, tail.map(_.path))
    val f = fs(spark, table)
    val base = dataPath(table)
    val tailBytes = tail.map(e =>
      if (e.size >= 0) e.size else f.getFileStatus(entryPath(base, e.path)).getLen).sum
    val targetTasks = math.max(1,
      math.ceil(tailBytes.toDouble / targetFileBytes).toInt)
    val pCols = snap.partitionColumns.map(col)
    val rows =
      if (zorderBy.nonEmpty) {
        val counts = tail.map(_.liveRowCount)
        val totalRows = if (counts.forall(_ >= 0)) counts.sum else packed.count()
        val zc = "_graft_zvalue"
        packed.withColumn(zc, ZOrder.zvalue(packed, zorderBy, totalRows))
          .repartitionByRange(targetTasks, (pCols :+ col(zc)).toIndexedSeq: _*)
          .sortWithinPartitions((pCols :+ col(zc)).toIndexedSeq: _*)
          .drop(zc)
      } else {
        val sCols = pCols ++ sortBy.map(col)
        packed.repartitionByRange(targetTasks, sCols.toIndexedSeq: _*)
          .sortWithinPartitions(sCols.toIndexedSeq: _*)
      }
    val newFiles = stageFiles(spark, table, rows, snap.partitionColumns,
      ColumnMapping.mapping(snap.schema))
    compactBeforeCommitHook()
    // same rebase-on-race as [[compact]]: value-preserving rewrite of a
    // fixed set, so a concurrent APPEND re-bases instead of discarding
    // the clustering work. The WATERMARK, however, must keep meaning
    // "every file in that version's snapshot is clustered" — the
    // rebased commit's snapshot contains the racer's unclustered file,
    // so on rebase the watermark stays at the PRE-RACE base version:
    // the next incremental pass re-sorts this pass's output plus the
    // racer (work bounded by the race window, not the table) and only
    // THEN advances the watermark over a clean snapshot.
    val rewrittenSet = tail.toSet
    var prevSnap = snap
    var next = Snapshot(snap.version + 1, System.currentTimeMillis(), "COMPACT",
      snap.schema, snap.partitionColumns, carried ++ newFiles,
      txns = snap.txns + (key -> (snap.version + 1)))
    var attempts = 0
    while (!tryCommit(spark, table, next, newFiles, tail.map(_.path),
        prev = Some(prevSnap))) {
      attempts += 1
      val newer = latestSnapshot(spark, table).getOrElse(
        throw new ConcurrentCommitException(
          s"incremental recluster on $table: log disappeared during the race"))
      val canRebase = attempts <= 5 &&
        newer.schema == snap.schema &&
        newer.partitionColumns == snap.partitionColumns &&
        rewrittenSet.subsetOf(newer.files.toSet)
      if (!canRebase)
        throw new ConcurrentCommitException(
          s"incremental recluster on $table lost the commit race and cannot " +
            "rebase — a concurrent commit changed the schema, the " +
            "partitioning, or the files being reclustered; re-run")
      prevSnap = newer
      next = Snapshot(newer.version + 1, System.currentTimeMillis(), "COMPACT",
        newer.schema, newer.partitionColumns,
        newer.files.filterNot(rewrittenSet.contains) ++ newFiles,
        txns = newer.txns + (key -> snap.version))
    }
    next.version
  }

  // ------------------------------------------------------------ schema DDL

  /** Explicit schema evolution — the ALTER TABLE ADD COLUMNS analog,
    * metadata-only: one commit carrying the widened schema, no data
    * touched. Existing files simply lack the new columns and read them
    * as null, exactly like append/merge evolution; the new columns
    * must therefore be nullable.
    *
    * On an UNMAPPED table, a name that some LIVE file physically
    * carries (visible in its logged stats — e.g. the column was
    * dropped from the schema by an overwrite and is being re-added) is
    * refused: the old bytes would silently resurrect as the "new"
    * column's values. This guard is best-effort (stats only cover
    * stats-bearing primitive columns). On a COLUMN-MAPPED table the
    * guard is unnecessary — every added field gets a fresh
    * `col-<uuid>` physical name, so no live file can carry its bytes
    * by construction; drop + re-add ([[dropColumn]]) reads null, never
    * stale values.
    */
  /** Opt `column` into per-file bloom-filter indexing ([[BloomIndex]])
    * — a metadata-only commit stamping the fpp into the field's schema
    * metadata. Every LATER write builds blooms for its staged files;
    * run a [[compact]] to backfill existing files. Supported types:
    * integral and string (anything else is flagged but silently
    * unindexed — blooms are advisory). Use on high-cardinality columns
    * that equality probes hit and clustering does not serve: min/max
    * bounds cannot skip a point lookup on an unclustered key.
    */
  def enableBloomFilter(spark: SparkSession, table: String, column: String,
                        fpp: Double = 0.01): Long = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0,1), got $fpp")
    retryCommit(spark, table, "ENABLE BLOOM") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      require(prev.schema.fieldNames.contains(column),
        s"bloom column $column is not in the schema of $table")
      require(!prev.partitionColumns.contains(column),
        s"bloom column $column is a partition column — pruned from the path already")
      val fields = prev.schema.fields.map { fl =>
        if (fl.name != column) fl
        else fl.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(fl.metadata).putDouble(BloomIndex.MetaKey, fpp).build())
      }
      CommitSpec(StructType(fields), prev.partitionColumns, prev.files, Nil, Nil,
        reset = false, protocol = prev.protocol)
    }
  }

  def addColumns(spark: SparkSession, table: String, cols: StructType): Long = {
    require(cols.nonEmpty, "addColumns needs at least one column")
    val resolver = spark.sessionState.conf.resolver
    retryCommit(spark, table, "ADD COLUMNS") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      val clash = cols.fieldNames.filter(n =>
        prev.schema.fieldNames.exists(resolver(_, n)))
      require(clash.isEmpty,
        s"column(s) already exist on $table: ${clash.mkString(", ")}")
      val notNullable = cols.fields.filterNot(_.nullable).map(_.name)
      require(notNullable.isEmpty,
        s"new column(s) must be nullable — existing rows have no value for: " +
          notNullable.mkString(", "))
      val mapped = ColumnMapping.isMapped(prev.schema)
      if (!mapped) {
        val resurrected = cols.fieldNames.filter(n =>
          prev.files.exists(_.stats.keys.exists(resolver(_, n))))
        require(resurrected.isEmpty,
          s"live data files of $table still carry bytes for: " +
            s"${resurrected.mkString(", ")} — re-adding the name would resurrect " +
            "stale values; rewrite first (overwrite/compact) or pick another name")
      }
      val newFields =
        if (mapped) cols.fields.map(f =>
          ColumnMapping.withPhysical(f, ColumnMapping.freshPhysicalName()))
        else cols.fields
      CommitSpec(StructType(prev.schema.fields ++ newFields),
        prev.partitionColumns, prev.files, Nil, Nil, reset = false)
    }
  }

  /** ADD a CHECK constraint (Delta `ALTER TABLE ... ADD CONSTRAINT ...
    * CHECK` analog): `exprSql` is a boolean SQL expression over the
    * table's logical columns that every row must not evaluate to FALSE
    * (null PASSES — SQL CHECK semantics). Existing data is validated
    * FIRST with one filtered scan (pushed filters + file skipping
    * apply); any violating row refuses the DDL with an example. The
    * commit is metadata-only, stamps writer-version 4 (a pre-constraint
    * writer must not append unvalidated rows — see [[Protocol]]), and
    * aborts if ANY other commit landed after the validation scan (rows
    * the scan never saw could violate — re-run). From then on every
    * row-adding write enforces the set in-flight ([[withChecks]]).
    */
  def addConstraint(spark: SparkSession, table: String, name: String,
                    exprSql: String): Long = {
    require(name.nonEmpty && name.matches("[A-Za-z0-9_]+"),
      s"constraint name must be alphanumeric/underscore, got '$name'")
    val snap0 = latestSnapshot(spark, table).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $table"))
    if (snap0.constraints.contains(name))
      throw new IllegalArgumentException(
        s"constraint '$name' already exists on $table " +
          s"(${snap0.constraints(name)}); drop it first")
    // fail fast on syntax before any scan
    spark.sessionState.sqlParser.parseExpression(exprSql)
    val bad = read(spark, table)
      .filter(coalesce(not(expr(exprSql)), lit(false))).limit(1).collect()
    if (bad.nonEmpty)
      throw new IllegalArgumentException(
        s"cannot add CHECK constraint '$name' ($exprSql) to $table: existing " +
          s"rows violate it, e.g. ${bad.head}")
    retryCommit(spark, table, "ADD CONSTRAINT") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      if (prev.version != snap0.version)
        throw new ConcurrentCommitException(
          s"ADD CONSTRAINT '$name' on $table raced commit v${prev.version}: the " +
            "validation scan read v" + snap0.version + " and cannot vouch for " +
            "later rows — re-run")
      CommitSpec(prev.schema, prev.partitionColumns, prev.files, Nil, Nil,
        reset = false, protocol = Protocol(prev.protocol.reader, 4),
        constraintsUpdate = Some(prev.constraints + (name -> exprSql)))
    }
  }

  /** DROP a CHECK constraint. Metadata-only; enforcement stops with the
    * commit. The writer-version stamp stays (monotonic, like Delta).
    */
  def dropConstraint(spark: SparkSession, table: String, name: String): Long =
    retryCommit(spark, table, "DROP CONSTRAINT") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      if (!prev.constraints.contains(name))
        throw new IllegalArgumentException(
          s"no constraint '$name' on $table (have: " +
            s"${prev.constraints.keys.toSeq.sorted.mkString(", ")})")
      CommitSpec(prev.schema, prev.partitionColumns, prev.files, Nil, Nil,
        reset = false, constraintsUpdate = Some(prev.constraints - name))
    }

  /** Stamp every field that lacks one with physical name == its
    * current logical name — the state transition that turns an
    * unmapped table into a mapped one without touching a byte: the
    * files already carry exactly those names.
    */
  private def ensureMapped(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      if (f.metadata.contains(ColumnMapping.PhysicalNameKey)) f
      else ColumnMapping.withPhysical(f, f.name)))

  /** Enable column mapping explicitly (RENAME/DROP COLUMN do it
    * implicitly on first use): each field's current name becomes its
    * stable physical name, and the commit stamps `Protocol(2, 2)` — a
    * version-1 reader would match logical names against the files and
    * silently misread every later-renamed column as null, so it must
    * refuse instead (see [[Protocol]]). Metadata-only; no data files
    * are read or written. Idempotent.
    */
  def enableColumnMapping(spark: SparkSession, table: String): Long =
    retryCommit(spark, table, "ENABLE COLUMN MAPPING") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      CommitSpec(ensureMapped(prev.schema), prev.partitionColumns, prev.files,
        Nil, Nil, reset = false, protocol = Protocol(2, 2))
    }

  /** `ALTER TABLE … RENAME COLUMN` — metadata-only: the field keeps
    * its physical name (the one in the data files and their logged
    * stats), only the logical name in the schema changes; zero data
    * files are read or written, at any table size. First use enables
    * column mapping ([[enableColumnMapping]]) and stamps
    * `Protocol(2, 2)` in the same commit. Reads and writes after the
    * rename translate logical ⇄ physical at the scan/stage boundary
    * ([[GraftParquetFileFormat]], [[stageFiles]]); time travel to
    * pre-rename versions sees the old name. The reference renames
    * Iceberg columns the same metadata-only way via Trino ALTER (ref:
    * trino_iceberg_transform_component.py:116-123).
    *
    * Partition columns are not renameable: their names are baked into
    * the hive directory layout of every existing data file.
    */
  def renameColumn(spark: SparkSession, table: String,
                   oldName: String, newName: String): Long = {
    require(newName.nonEmpty, "new column name must be non-empty")
    val resolver = spark.sessionState.conf.resolver
    retryCommit(spark, table, "RENAME COLUMN") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      require(!prev.partitionColumns.exists(resolver(_, oldName)),
        s"cannot rename partition column '$oldName' of $table — partition " +
          "names are baked into the hive directory layout of existing files")
      val mapped = ensureMapped(prev.schema)
      val idx = mapped.fields.indexWhere(f => resolver(f.name, oldName))
      require(idx >= 0, s"no such column on $table: '$oldName'")
      val clash = mapped.fields.zipWithIndex.exists { case (f, i) =>
        i != idx && resolver(f.name, newName) }
      require(!clash, s"column '$newName' already exists on $table")
      val fields = mapped.fields.clone()
      fields(idx) = fields(idx).copy(name = newName)
      // a generated column's spec references its SOURCE by logical
      // name — follow the rename so derivation keeps working
      val renamed = fields.map { f =>
        if (f.metadata.contains(GeneratedColumns.SourceKey) &&
            resolver(f.metadata.getString(GeneratedColumns.SourceKey), oldName)) {
          val mb = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(GeneratedColumns.SourceKey, newName)
          f.copy(metadata = mb.build())
        } else f
      }
      CommitSpec(StructType(renamed), prev.partitionColumns, prev.files,
        Nil, Nil, reset = false, protocol = Protocol(2, 2))
    }
  }

  /** `ALTER TABLE … DROP COLUMN` — metadata-only: the field leaves the
    * schema; the bytes in existing files are simply never requested
    * again (and vanish physically as compaction/DML rewrite the files
    * through the post-drop schema). First use enables column mapping
    * and stamps `Protocol(2, 2)`, which is what makes a later re-add
    * of the same name SAFE: [[addColumns]] on a mapped table assigns a
    * fresh `col-<uuid>` physical name, so the dropped bytes can never
    * resurrect as the new column's values — they read as null.
    *
    * Partition columns cannot be dropped (their values live in the
    * directory layout, not the files); the last data column cannot be
    * dropped (a table needs a schema).
    */
  def dropColumn(spark: SparkSession, table: String, name: String): Long = {
    val resolver = spark.sessionState.conf.resolver
    retryCommit(spark, table, "DROP COLUMN") { prevOpt =>
      val prev = prevOpt.getOrElse(throw new IllegalArgumentException(
        s"no committed version at $table"))
      require(!prev.partitionColumns.exists(resolver(_, name)),
        s"cannot drop partition column '$name' of $table — partition values " +
          "live in the directory layout of existing files")
      val mapped = ensureMapped(prev.schema)
      val idx = mapped.fields.indexWhere(f => resolver(f.name, name))
      require(idx >= 0, s"no such column on $table: '$name'")
      require(mapped.fields.length > 1,
        s"cannot drop the last column of $table")
      // a bucket column's name is load-bearing: the read relation
      // resolves the BucketSpec against it, and every write routes rows
      // by it — dropping it would orphan the layout claim
      require(!Bucketing.spec(mapped).exists(_.bucketCols.exists(resolver(_, name))),
        s"cannot drop bucket column '$name' of $table — the table's hash-bucket " +
          "layout is keyed on it; re-create the table unbucketed (or bucketed on " +
          "another key) first")
      // a generated partition column derives from its SOURCE on every
      // write — dropping the source would orphan the layout
      GeneratedColumns.specs(mapped).find(sp => resolver(sp.source, name)).foreach(sp =>
        throw new IllegalArgumentException(
          s"cannot drop column '$name' of $table — generated partition column " +
            s"'${sp.target}' derives from it (${sp.transform}); re-create the " +
            "table without the generated layout first"))
      // dropping a within-bucket SORT column: existing files are sorted
      // by the full sort-col sequence, which implies ordering only by
      // any PREFIX of it — keep the stamps before the dropped column,
      // strip the rest (a claim of ordering by the suffix alone would
      // be false of the files)
      val afterDrop = StructType(mapped.fields.patch(idx, Nil, 1))
      val newSchema = Bucketing.spec(mapped) match {
        case Some(sp) if sp.sortCols.exists(resolver(_, name)) =>
          val keep = sp.sortCols.takeWhile(!resolver(_, name))
          Bucketing.stamp(Bucketing.strip(afterDrop), sp.numBuckets,
            sp.bucketCols, keep)
        case _ => afterDrop
      }
      CommitSpec(newSchema,
        prev.partitionColumns, prev.files,
        Nil, Nil, reset = false, protocol = Protocol(2, 2))
    }
  }

  // --------------------------------------------------------------- restore

  /** Roll the table back to the state of `version` as a NEW commit —
    * the RESTORE analog. The commit is a reset delta carrying the old
    * version's complete file list, so data files are re-referenced,
    * never copied; nothing between is erased: the rolled-back versions
    * remain time-travelable (until vacuumed), and the change feed
    * synthesizes the rollback as delete-all + re-insert exactly like
    * an OVERWRITE, so downstream incremental readers converge instead
    * of diverging. Schema and partition layout restore with the data.
    *
    * Fails loudly (before committing anything) when any restored file
    * has already been vacuumed away — a restore that silently produced
    * a table with holes would be corruption, not rollback.
    */
  /** Zero-copy SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE` /
    * Iceberg snapshot-ref analog): commit `dst` whose v1 REFERENCES
    * `src`'s data files in place — absolute URIs in the log, zero
    * bytes copied — so a 100 TB dev/test sandbox materializes in one
    * metadata commit. The clone is fully independent from then on:
    * appends land in its own data dir, CoW DML rewrites cloned files
    * INTO the clone (the source never changes), and the clone's
    * vacuum can never touch source bytes (foreign files are outside
    * its data root, which is all vacuum ever lists). Per-file stats,
    * skipping, schema/partition layout, protocol and CHECK
    * constraints all carry over with the cloned entries.
    *
    * Caveats (the Delta shallow-clone contract):
    *  - vacuuming the SOURCE can remove files the clone still
    *    references — retain accordingly, or compact the clone
    *    (rewrites localize every file they touch);
    *  - ACTIVE deletion vectors clone by RE-KEYING: their rows are
    *    rewritten into the clone's own `_deletes/` with the data
    *    files' absolute source URIs as keys — O(deleted rows) bytes,
    *    never O(data) — so the clone OWNS its vectors (source vacuum
    *    cannot strand them) and a MoR-heavy fact branches without a
    *    compact-first;
    *  - bloom sidecars are dropped (advisory; rebuilt on rewrite);
    *  - merge-on-read DML on still-foreign files works: new vectors
    *    key on the files' absolute URIs (the same form the re-keyed
    *    inherited vectors use), so a clone takes trickle DELETE/
    *    UPDATE/MERGE without localizing a byte of source data.
    */
  def shallowClone(spark: SparkSession, src: String, dst: String,
                   asOf: Option[Long] = None): Long = {
    val snap = asOf.map(v => snapshotAt(spark, src, v)).getOrElse(
      latestSnapshot(spark, src).getOrElse(
        throw new IllegalArgumentException(s"no committed version at $src")))
    require(latestSnapshot(spark, dst).isEmpty,
      s"refusing to clone into $dst: it already has committed versions")
    require(snap.files.forall(_.size >= 0),
      s"cannot shallow-clone $src at v${snap.version}: legacy entries without " +
        "logged stats — compact the source first")
    val f = fs(spark, src)
    val srcRoot = f.makeQualified(dataPath(src))
    def absOf(rel: String): String =
      if (isForeignEntry(rel)) rel // clone of a clone: same refs
      else new Path(srcRoot, rel).toString
    // active vectors: stage ONE new vector directory in the CLONE,
    // holding the dv'd entries' rows re-keyed on absolute URIs (rows
    // already absolute — a cloned clone's — pass through)
    val dvd = snap.files.filter(_.dv.exists(_.cardinality > 0))
    val dvDir: Option[String] =
      if (dvd.isEmpty) None
      else {
        val rows = dvRows(spark, src, dvd)
          .filter(col("p").isInCollection(dvd.map(scanKey)))
          // re-key into scan-form ABSOLUTE URIs (stored local keys are
          // scan-form relative, so the concat stays in the scan domain)
          .select(when(col("p").startsWith("/") || col("p").contains(":/"), col("p"))
            .otherwise(concat(lit(scanFormPath(srcRoot) + "/"), col("p"))).as("p"),
            col("pos"))
        Some(stageDeleteVector(spark, dst, rows,
          math.max(1, math.min(32, dvd.size))))
      }
    val entries = snap.files.map { e =>
      val dv = e.dv.filter(_.cardinality > 0)
        .map(d => DeleteVector(dvDir.get, d.cardinality))
      e.copy(path = absOf(e.path), dv = dv, bloom = None)
    }
    val next = Snapshot(1L, System.currentTimeMillis(), "CLONE",
      snap.schema, snap.partitionColumns, entries,
      protocol = snap.protocol, constraints = snap.constraints)
    if (!tryCommit(spark, dst, next, entries, Nil, reset = true, prev = None,
        constraintsUpdate = Some(snap.constraints)))
      throw new ConcurrentCommitException(s"CLONE into $dst lost the commit race")
    1L
  }

  /** Write-audit-publish PUBLISH (Iceberg's audit-branch /
    * `wap.branch` workflow; ref: the reference gates silver
    * materialization on quality checks before consumers see it,
    * trino_iceberg_transform_component.py:192-206 — WAP is that gate
    * made transactional): fast-forward the audited changes of a
    * [[shallowClone]] branch back onto its source table as ONE atomic
    * commit. The workflow: clone `src` → `branch` (zero-copy
    * metadata), run any writes/DML on the branch, audit the BRANCH
    * (quality checks, row counts, eyeballs) while `src` readers still
    * see only pre-branch data, then `publish` — or simply delete the
    * branch directory to abandon.
    *
    * The published commit is the branch's net file delta replayed on
    * the CURRENT source head: files the branch rewrote or deleted are
    * removed, files the branch wrote are added, and everything the
    * branch did NOT touch rides at the source's current state — so
    * concurrent appends to `src` merge in (they land in files the
    * branch never saw). Conflict rule (the file-level discipline
    * shared with DML rebase): the branch's WRITE-SET must be stable —
    * every file the branch rewrote/deleted must still sit in the
    * source head bit-identical (same size/rowCount, no vectors) —
    * and the source's schema, partition layout and CHECK constraints
    * must be unchanged since the fork (branch writes were only
    * audited against the fork-time contract). Anything else refuses
    * loudly; re-branch and re-audit.
    *
    * With `copy = true` (default) the branch's new data files are
    * copied into the source's data root under their branch-relative
    * paths — O(branch delta) bytes, never O(table) — so the branch
    * directory is disposable after publish. With `copy = false` the
    * commit references the branch's files in place (zero bytes
    * moved), inheriting the shallow-clone lifetime caveat: the branch
    * dir must outlive the source's references (compact localizes).
    *
    * Branch schema evolution (ADD/RENAME COLUMN…) and constraint
    * additions publish through: the commit carries the branch-head
    * schema/constraints (source files read missing columns as null,
    * the existing column-evolution discipline). Active deletion
    * vectors on the branch are refused — `reorgPurge` the branch
    * first (vector rows key on branch-relative paths).
    *
    * The change feed synthesizes PUBLISH like a partition overwrite:
    * removed files' rows as deletes, added files' rows as inserts —
    * file-granular, lazy, no extra bytes at commit time. Returns the
    * published version (the unchanged head when the branch made no
    * changes).
    *
    * `txn = (appId, ver)` makes the publish IDEMPOTENT (the batch-write
    * txn-watermark protocol): if the source already carries `appId` at
    * `>= ver` the call returns the current head untouched — a replay
    * after a crash (or a coordinator retry, see [[GraftTxn]]) cannot
    * double-apply the delta. The stamp rides in the PUBLISH snapshot's
    * `txns` map, so the guard survives restarts and is checked under
    * the same commit race the delta is.
    */
  def publish(spark: SparkSession, src: String, branch: String,
              copy: Boolean = true, txn: Option[(String, Long)] = None): Long = {
    txn.foreach { case (appId, ver) =>
      latestSnapshot(spark, src).foreach { s =>
        if (s.txns.get(appId).exists(_ >= ver)) return s.version
      }
    }
    val head = latestSnapshot(spark, branch).getOrElse(
      throw new IllegalArgumentException(s"no committed version at $branch"))
    val fork = snapshotAt(spark, branch, 1L)
    require(fork.operation == "CLONE",
      s"$branch is not a WAP branch: its v1 is '${fork.operation}', expected a " +
        "shallow clone of the publish target")
    require(head.partitionColumns == fork.partitionColumns,
      s"cannot publish $branch: the branch changed the partition layout " +
        s"(${fork.partitionColumns.mkString(",")} -> ${head.partitionColumns.mkString(",")})")
    // CARRIED foreign refs may hold cloned vectors (a branch of a
    // MoR-heavy source) — inert at publish, since untouched files ride
    // at the source's CURRENT state below. Only vectors on the branch's
    // OWN files have no publish expression.
    require(head.files.forall(e =>
        isForeignEntry(e.path) || e.dv.forall(_.cardinality == 0)),
      s"cannot publish $branch: the branch head carries active deletion vectors " +
        "on its own data files (vector rows key on branch-relative paths) — " +
        "REORG TABLE ... APPLY (PURGE) the branch first")
    val f = fs(spark, src)
    val srcPrefix = qualifiedDataPrefix(spark, src) + "/"
    fork.files.foreach(e => require(e.path.startsWith(srcPrefix),
      s"$branch is not a branch of $src: its fork snapshot references ${e.path}, " +
        s"outside $src's data root"))
    val (refs, local) = head.files.partition(e => isForeignEntry(e.path))
    refs.find(!_.path.startsWith(srcPrefix)).foreach(e =>
      throw new IllegalArgumentException(
        s"cannot publish $branch onto $src: branch head references ${e.path} " +
          "from a THIRD table (clone of a clone?) — compact the branch to " +
          "localize foreign files first"))
    val carriedRels = refs.map(_.path.stripPrefix(srcPrefix)).toSet
    val removedByBranch = fork.files
      .map(e => e.copy(path = e.path.stripPrefix(srcPrefix)))
      .filterNot(e => carriedRels.contains(e.path))
    // Stage the branch's own files: copy into the source data root
    // (same relative path, so hive partition dirs survive for pruning)
    // or reference them in place. Bloom sidecars are advisory and
    // branch-local — dropped, rebuilt on the next rewrite.
    val adds: Seq[FileEntry] =
      if (local.isEmpty) Nil
      else if (copy) {
        val bf = fs(spark, branch)
        val bRoot = dataPath(branch)
        val conf = spark.sparkContext.hadoopConfiguration
        // Paths the source's CURRENT snapshot references — a same-named file
        // already live in src is a genuine collision; one NOT referenced can
        // only be debris from an earlier publish attempt whose copy died
        // mid-write (its commit never landed), so replay may reclaim it.
        val liveInSrc: Set[String] = latestSnapshot(spark, src)
          .map(_.files.iterator.map(_.path.stripPrefix(srcPrefix)).toSet)
          .getOrElse(Set.empty)
        stageParallel(local) { e =>
          val from = entryPath(bRoot, e.path)
          val to = entryPath(dataPath(src), e.path)
          // Copy via a temp name + rename so a coordinator death mid-copy
          // never leaves a partial file AT the destination path — replay
          // then sees either nothing or a complete copy, and the documented
          // always-roll-forward guarantee holds without operator surgery.
          def copyViaTemp(): Unit = {
            f.mkdirs(to.getParent)
            val tmp = new Path(to.getParent, to.getName + ".staging-" +
              java.util.UUID.randomUUID().toString.take(8))
            if (!org.apache.hadoop.fs.FileUtil.copy(bf, from, f, tmp, false, conf))
              throw new IllegalStateException(s"could not copy $from to $tmp")
            if (!f.rename(tmp, to)) {
              // another replay of the SAME publish won the rename race —
              // branch file names embed the write job's UUID, so an equal-size
              // file at the destination IS this file; accept it
              f.delete(tmp, false)
              val st = if (f.exists(to)) Some(f.getFileStatus(to)) else None
              if (!st.exists(_.getLen == e.size))
                throw new IllegalStateException(s"could not rename $tmp to $to")
            }
          }
          val existing = if (f.exists(to)) Some(f.getFileStatus(to)) else None
          existing match {
            case Some(st) if st.getLen == e.size =>
              // crash-recovery replay: this exact branch file (names embed
              // the write job's UUID) was already copied by an earlier
              // attempt that died before its commit landed — reuse it
              ()
            case Some(_) if !liveInSrc.contains(e.path) =>
              // truncated debris from a pre-temp-rename attempt (or a crash
              // between mkdirs and copy): not referenced by any committed
              // source snapshot, so no reader can see it — delete and recopy
              f.delete(to, false)
              copyViaTemp()
            case Some(_) =>
              throw new IllegalStateException(
                s"publish target $to already exists with a DIFFERENT size and " +
                  s"is referenced by $src's current snapshot — was $branch " +
                  "already published, or did another writer claim the path?")
            case None =>
              copyViaTemp()
          }
          e.copy(dv = None, bloom = None)
        }
      } else {
        val bPrefix = qualifiedDataPrefix(spark, branch) + "/"
        local.map(e => e.copy(path = bPrefix + e.path, dv = None, bloom = None))
      }
    // A no-delta branch publishes as the unchanged head — except under a
    // txn stamp, where an (empty) commit must still land the watermark so
    // coordinator recovery can tell "published, no delta" from "never ran"
    if (adds.isEmpty && removedByBranch.isEmpty && txn.isEmpty)
      return latestVersion(spark, src).getOrElse(
        throw new IllegalStateException(s"source $src has no committed versions"))
    val removedSet = removedByBranch.map(_.path).toSet
    var cur = latestSnapshot(spark, src).getOrElse(
      throw new IllegalStateException(s"source $src has no committed versions"))
    var attempt = 0
    while (true) {
      def refuse(why: String): Nothing = throw new ConcurrentCommitException(
        s"PUBLISH of $branch onto $src cannot fast-forward: $why — re-branch " +
          "from the current head and re-audit")
      if (cur.schema != fork.schema)
        refuse("the source schema changed since the branch forked")
      if (cur.partitionColumns != fork.partitionColumns)
        refuse("the source partition layout changed since the branch forked")
      if (cur.constraints != fork.constraints)
        refuse("the source CHECK constraints changed since the branch forked " +
          "(branch writes were never audited against them)")
      val curByPath = cur.files.iterator.map(e => e.path -> e).toMap
      removedByBranch.foreach { e =>
        curByPath.get(e.path) match {
          case None =>
            refuse(s"the source no longer contains ${e.path}, a file the branch " +
              "rewrote or deleted")
          case Some(c) =>
            // dv comparison is against the FORK's state: a source that
            // already carried vectors when the branch forked is no
            // conflict; only vectors the source gained (or dropped)
            // SINCE the fork mean the branch audited stale rows
            if (c.size != e.size || c.rowCount != e.rowCount ||
                c.dv.map(_.cardinality).getOrElse(0L) !=
                  e.dv.map(_.cardinality).getOrElse(0L))
              refuse(s"the source rewrote or vectored ${e.path}, a file the " +
                "branch rewrote or deleted")
        }
      }
      adds.find(a => curByPath.contains(a.path)).foreach(a =>
        refuse(s"the source independently added a file named ${a.path}"))
      // replay guard re-checked under the commit race: a competing
      // coordinator may have landed the same txn while we validated
      txn.foreach { case (appId, ver) =>
        if (cur.txns.get(appId).exists(_ >= ver)) return cur.version
      }
      val next = Snapshot(cur.version + 1, System.currentTimeMillis(), "PUBLISH",
        head.schema, head.partitionColumns,
        cur.files.filterNot(e => removedSet.contains(e.path)) ++ adds,
        txns = cur.txns ++ txn.map { case (a, v) => a -> v },
        protocol = head.protocol, constraints = head.constraints)
      if (tryCommit(spark, src, next, adds, removedByBranch.map(_.path),
          prev = Some(cur), constraintsUpdate = Some(head.constraints)))
        return next.version
      attempt += 1
      if (attempt >= maxRetries)
        throw new ConcurrentCommitException(
          s"PUBLISH of $branch onto $src lost $maxRetries commit races — re-run")
      cur = latestSnapshot(spark, src).getOrElse(
        throw new IllegalStateException(s"log of $src disappeared mid-commit"))
    }
    throw new IllegalStateException("unreachable")
  }

  def restore(spark: SparkSession, table: String, version: Long): Long = {
    val target = snapshotAt(spark, table, version)
    val f = fs(spark, table)
    val base = dataPath(table)
    // existence probes fan out like staging: bounded pool, one RPC
    // each. Deletion-vector dirs are re-referenced state too — a
    // vacuumed vector would silently RESURRECT its deleted rows.
    val probeRels: Seq[String] =
      target.filePaths ++ target.files.flatMap(_.dv.map(_.path)).distinct
    def probeMissing(): Seq[String] = stageParallel(probeRels)(rel =>
      if (f.exists(
        if (rel.startsWith("_deletes/")) new Path(table, rel)
        else entryPath(base, rel))) None
      else Some(rel)).flatten
    // probe INSIDE each commit attempt, so the vulnerable window
    // against a concurrent vacuum is one probe→publish, not the whole
    // call; vacuum narrows its side too (it re-validates its doomed
    // list against the log right before deleting, so a committed
    // RESTORE re-protects its files)
    var preHead: Option[Snapshot] = None
    val v = retryCommit(spark, table, "RESTORE") { prev =>
      require(prev.exists(_.version >= version),
        s"restore target $version is beyond the latest version of $table")
      preHead = prev
      val missing = probeMissing()
      require(missing.isEmpty,
        s"cannot restore $table to version $version: ${missing.size} of its data " +
          s"file(s) were vacuumed (first: ${missing.headOption.getOrElse("")}) — " +
          "that version is outside the retention window")
      CommitSpec(target.schema, target.partitionColumns, target.files,
        target.files, Nil, reset = true)
    }
    // detection for the residual window: a vacuum whose live set
    // predates this commit may still have swept the re-referenced
    // files between our probe and publish — surface that NOW, loudly,
    // instead of as FILE_NOT_EXIST at some later read. Before
    // throwing, commit a COMPENSATING restore back to the pre-restore
    // head (whose files a concurrent vacuum retained by definition) so
    // the table stays readable while the failure still surfaces —
    // otherwise every read fails until a manual re-restore.
    val gone = probeMissing()
    if (gone.nonEmpty) {
      val compensated = preHead.exists { h =>
        scala.util.Try(retryCommit(spark, table, "RESTORE") { p =>
          // only compensate while OUR broken restore is still the head —
          // a later commit supersedes the problem (and the authority to
          // fix it)
          require(p.exists(_.version == v),
            s"head moved past v$v; not compensating")
          CommitSpec(h.schema, h.partitionColumns, h.files, h.files, Nil,
            reset = true)
        }).isSuccess
      }
      throw new IllegalStateException(
        s"restore of $table to version $version committed as v$v, but " +
          s"${gone.size} re-referenced data file(s) were vacuumed concurrently " +
          s"(first: ${gone.head}) — the restored version is unreadable; " +
          (if (compensated)
            s"a compensating restore to the pre-restore state " +
              s"(v${preHead.get.version}) was committed so the table stays " +
              "readable; re-run restore to a version inside the current " +
              "retention window"
          else
            "re-run restore to a version inside the current retention window " +
              "(compensating restore could not be committed)"))
    }
    v
  }

  // ---------------------------------------------------------------- vacuum

  /** Delete data files referenced only by versions older than the
    * `retainVersions` most recent, plus any orphans from crashed
    * writes. Time travel further back than the retention window stops
    * working (the log entries remain for history). Returns the number
    * of files deleted.
    *
    * `graceMs` protects concurrent writers: a file younger than the
    * grace window is never deleted even if unreferenced, because it may
    * be an in-flight writer's freshly staged/moved data whose commit
    * has not landed yet (the same reason Delta's VACUUM defaults to a
    * 7-day retention). Staging dirs are likewise only swept once they
    * age past the grace window. Pass `graceMs = 0` only when no other
    * writer can be active. `dryRun = true` counts what WOULD be
    * deleted without touching anything (VACUUM DRY RUN).
    *
    * `partitionFilter` SCOPES the sweep to the matching hive
    * partitions: the walk descends only into directories the predicate
    * could match (conjuncts are judged as soon as the path binds the
    * columns they reference), so a 100 TB fact vacuums one day with a
    * one-day listing — the same maintenance scoping compact has —
    * and files outside the scope are never listed, let alone deleted.
    * A scoped pass sweeps ONLY the data tree; the whole-table sweeps
    * (change-data files, aged checkpoints, orphan manifest segments,
    * staging dirs) run on unscoped passes, which a maintenance
    * schedule should still include periodically.
    *
    * `retainMs` switches retention from count-based to TIME-based
    * ("keep 7 days of time travel", `VACUUM t RETAIN 168 HOURS`):
    * every version committed inside the window survives, the newest
    * always survives, and `retainVersions` is ignored.
    */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int = 2,
             graceMs: Long = 15L * 60 * 1000, dryRun: Boolean = false,
             partitionFilter: Option[Column] = None,
             retainMs: Option[Long] = None): Int = {
    val f = fs(spark, table)
    val vs = versionsFast(spark, table)
    if (vs.isEmpty) return 0
    // `retainMs` switches retention from count-based to TIME-based
    // (the production norm: "keep 7 days of time travel"): every
    // version committed inside the window survives, the newest always
    // survives, and timestamps come from the history checkpoint —
    // O(tail), not O(commits)
    def retainedVersions(vsX: Seq[Long]): Seq[Long] = retainMs match {
      case None => vsX.takeRight(math.max(1, retainVersions))
      case Some(ms) =>
        val cutoff = System.currentTimeMillis() - math.max(0L, ms)
        val byV = readCheckpoint(f, table)
          .map(_._2.map(e => e.version -> e).toMap).getOrElse(Map.empty)
        val kept = vsX.filter(v => byV.get(v).map(_.timestampMs)
          .getOrElse(snapshotAt(spark, table, v).timestampMs) >= cutoff)
        if (kept.isEmpty) vsX.takeRight(1) else kept
    }
    val retainedSnaps = retainedVersions(vs)
      .map(v => snapshotAt(spark, table, v))
    val retained = retainedSnaps.flatMap(_.filePaths).toSet
    val cutoffMs = System.currentTimeMillis() - math.max(0L, graceMs)
    val dp = dataPath(table)
    if (!f.exists(dp)) return 0
    var deleted = 0
    val toDelete = scala.collection.mutable.ArrayBuffer.empty[Path]
    // Restore-race re-validation, called right before any data-file
    // deletion: a commit that landed while this vacuum walked (a
    // RESTORE re-referencing old files being the dangerous one) makes
    // doomed files live again. Re-resolving the retained set against
    // the CURRENT log shrinks the unprotected window from the whole
    // listing+compute duration to one metadata roundtrip. NOT fully
    // closed: a RESTORE that commits AFTER this re-check but BEFORE
    // the delete loop finishes can still lose files with restore's own
    // probe-in-commit passing — store-side coordination no object
    // store offers would be needed. postDeleteCheck below detects that
    // ordering after the fact and warns loudly.
    def revalidated(paths: Seq[Path]): Seq[Path] = {
      val vsNow = versionsFast(spark, table)
      if (vsNow == vs) paths
      else {
        val retainedNow = retainedVersions(vsNow)
          .flatMap(v => snapshotAt(spark, table, v).filePaths).toSet
        paths.filterNot(p => retainedNow.contains(relativize(dp, p)))
      }
    }
    // Residual-race detector: if the log advanced WHILE the delete loop
    // ran, a commit (RESTORE being the dangerous one) may reference
    // files this vacuum just swept — surface it here, loudly, instead
    // of as FILE_NOT_EXIST at some later read.
    def postDeleteCheck(): Unit = {
      val vsAfter = versionsFast(spark, table)
      if (vsAfter != vs)
        logWarning(s"vacuum of $table raced a concurrent commit (log advanced " +
          s"from v${vs.max} to v${vsAfter.max} during deletion) — if that commit " +
          "was a RESTORE re-referencing vacuumed files, the restored version may " +
          "be unreadable; verify with a read and re-run restore if needed")
    }
    partitionFilter match {
      case Some(c) =>
        val snap = snapshotAt(spark, table, vs.max)
        require(snap.partitionColumns.nonEmpty,
          s"partition-scoped vacuum needs a partitioned table; $table has no " +
            "partition columns")
        val scope = resolvePartitionFilter(spark, snap, c, "vacuum")
        def walk(dir: Path, rel: String, depth: Int): Unit =
          f.listStatus(dir).foreach { st =>
            val name = st.getPath.getName
            val childRel = if (rel.isEmpty) name else s"$rel/$name"
            if (st.isDirectory) {
              if (depth >= scope.numPartitionCols ||
                  scope.dirMayMatch(childRel, depth))
                walk(st.getPath, childRel, depth + 1)
            } else if (depth >= scope.numPartitionCols &&
                st.getModificationTime < cutoffMs &&
                scope.fileInScope(childRel) && !retained.contains(childRel))
              toDelete += st.getPath
            // a file ABOVE leaf depth is not hive data of this layout —
            // out of scope by definition; the unscoped pass handles it
          }
        walk(dp, "", 0)
        if (dryRun) deleted += toDelete.size
        else {
          revalidated(toDelete.toSeq).foreach { p =>
            if (f.delete(p, false)) deleted += 1
          }
          postDeleteCheck()
        }
        return deleted
      case None => ()
    }
    val it = f.listFiles(dp, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getModificationTime < cutoffMs &&
          !retained.contains(relativize(dp, st.getPath)))
        toDelete += st.getPath
    }
    if (dryRun) deleted += toDelete.size
    else {
      revalidated(toDelete.toSeq).foreach { p =>
        if (f.delete(p, false)) deleted += 1
      }
      postDeleteCheck()
    }
    // change-data files age out with their versions: keep those the
    // retained versions recorded (the feed stays readable over the
    // same window time travel works), sweep the rest once old enough
    // — including orphans from aborted DML commits
    val retainedCdc = retainedVersions(vs)
      .flatMap(v => scala.util.Try(logEntryAt(spark, table, v)).toOption)
      .flatMap(_.cdc.getOrElse(Nil)).toSet
    val cdp = changeDataPath(table)
    if (f.exists(cdp)) {
      val cit = f.listFiles(cdp, true)
      val cdcToDelete = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (cit.hasNext) {
        val st = cit.next()
        if (st.isFile && st.getModificationTime < cutoffMs &&
            !retainedCdc.contains("_change_data/" + relativize(cdp, st.getPath)))
          cdcToDelete += st.getPath
      }
      if (dryRun) deleted += cdcToDelete.size
      else cdcToDelete.foreach { p => if (f.delete(p, false)) deleted += 1 }
    }
    // deletion-vector dirs age out the same way: a dir referenced by
    // no retained snapshot (superseded by a later delete's merged
    // vector, reconciled by compact, or orphaned by a lost commit
    // race) is swept whole once past the grace window
    val retainedDv = retainedSnaps
      .flatMap(_.files.flatMap(_.dv.map(_.path))).toSet
    val delp = deletesPath(table)
    if (f.exists(delp)) {
      f.listStatus(delp).foreach { st =>
        if (st.isDirectory && st.getModificationTime < cutoffMs &&
            !retainedDv.contains("_deletes/" + st.getPath.getName)) {
          if (dryRun) deleted += 1
          else if (f.delete(st.getPath, true)) deleted += 1
        }
      }
    }
    // bloom sidecars: advisory, swept when no retained entry references
    // them (their files were rewritten/vacuumed) and old enough
    val retainedBloom = retainedSnaps
      .flatMap(_.files.flatMap(_.bloom)).toSet
    val blp = BloomIndex.bloomPath(table)
    if (f.exists(blp)) {
      f.listStatus(blp).foreach { st =>
        if (st.isFile && st.getModificationTime < cutoffMs &&
            !retainedBloom.contains("_index/bloom/" + st.getPath.getName)) {
          if (dryRun) deleted += 1
          else if (f.delete(st.getPath, false)) deleted += 1
        }
      }
    }
    // checkpoints strictly below the newest one still useful to the
    // retention window age out, then manifest segments referenced by NO
    // surviving checkpoint (dead lineages, orphans of crashed
    // checkpoint writes) — same grace discipline as data files. The
    // newest checkpoint at or below the OLDEST retained version stays:
    // it is that version's reconstruction base. Checkpoints only ever
    // land at interval multiples, so they are FOUND by existence probes
    // (O(commits / interval) stats), never by listing the log dir —
    // vacuum stays zero-listing on the log.
    val cpVersions = (checkpointInterval to vs.max by checkpointInterval)
      .filter(v => f.exists(snapshotCheckpointFile(table, v)))
    val oldestRetained = retainedVersions(vs).min
    val keepFloor = cpVersions.filter(_ <= oldestRetained).lastOption.getOrElse(Long.MinValue)
    val (cpDrop0, cpKeep) = cpVersions.partition(_ < keepFloor)
    val cpDrop = cpDrop0.filter { v =>
      val st = scala.util.Try(f.getFileStatus(snapshotCheckpointFile(table, v))).toOption
      st.exists(_.getModificationTime < cutoffMs)
    }
    if (dryRun) deleted += cpDrop.size
    else cpDrop.foreach { v =>
      if (f.delete(snapshotCheckpointFile(table, v), false)) deleted += 1
    }
    val mp = manifestsPath(table)
    if (f.exists(mp)) {
      // checkpoints surviving this pass: kept ones plus any below the
      // floor that the grace window protected (they still reference
      // their segments) — same set whether this is a dry run or not
      val survivors = cpKeep ++ cpDrop0.diff(cpDrop)
      val referenced = survivors
        .flatMap(v => readCheckpointRefs(f, table, v).getOrElse(Nil))
        .map(_.name).toSet
      val segsToDelete = f.listStatus(mp).toSeq.filter(st =>
        st.isFile && st.getModificationTime < cutoffMs &&
          !referenced.contains(st.getPath.getName))
      if (dryRun) deleted += segsToDelete.size
      else segsToDelete.foreach { st => if (f.delete(st.getPath, false)) deleted += 1 }
    }
    // sweep staging dirs from crashed writes — only once they are old
    // enough that no live writer can still be using them
    val staging = new Path(table, "_staging")
    if (!dryRun && f.exists(staging)) {
      f.listStatus(staging).foreach { st =>
        if (st.getModificationTime < cutoffMs) f.delete(st.getPath, true)
      }
    }
    deleted
  }

  /** Log-vs-filesystem integrity audit (Delta's FSCK role): verify that
    * every file a snapshot references — data files, deletion-vector
    * dirs, bloom sidecars — is present and sized as the log recorded,
    * WITHOUT opening any of them (stat-only, O(referenced files)
    * metadata). The check an operator runs after an incident (an
    * over-eager external cleanup, a partial restore from backup, a
    * mis-scoped recursive delete) before trusting reads or letting
    * vacuum loose. Returns one row per problem, empty when healthy:
    * (path, component, issue). A missing deletion vector is flagged as
    * resurrection risk — the data file would read with its deleted rows
    * back; a missing bloom is advisory (skipping quietly degrades).
    */
  def fsck(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val v = asOf.getOrElse(latestVersion(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table")))
    val snap = snapshotAt(spark, table, v)
    val f = fs(spark, table)
    val droot = dataPath(table)
    val issues = Seq.newBuilder[(String, String, String)]
    snap.files.foreach { e =>
      val p = if (isForeignEntry(e.path)) new Path(e.path) else new Path(droot, e.path)
      (try Some(f.getFileStatus(p))
       catch { case _: java.io.FileNotFoundException => None }) match {
        case None => issues += ((e.path, "data", "missing"))
        case Some(st) if e.size >= 0 && st.getLen != e.size =>
          issues += ((e.path, "data",
            s"size mismatch: logged ${e.size} bytes, found ${st.getLen}"))
        case _ => ()
      }
    }
    // sidecars are shared per commit (one vector dir / bloom json can
    // serve many file entries) — report each missing one ONCE, with the
    // blast radius aggregated over its referencing entries
    snap.files.flatMap(e => e.dv.map(dv => (dv.path, dv.cardinality)))
      .groupBy(_._1).foreach { case (p, refs) =>
        if (!f.exists(new Path(table, p)))
          issues += ((p, "delete_vector",
            s"missing: ${refs.size} data file(s) would resurrect " +
              s"${refs.map(_._2).sum} deleted rows"))
      }
    snap.files.flatMap(_.bloom).groupBy(identity).foreach { case (b, refs) =>
      if (!f.exists(new Path(table, b)))
        issues += ((b, "bloom", s"missing sidecar referenced by ${refs.size} " +
          "file entries (advisory: bloom skipping degrades)"))
    }
    import spark.implicits._
    issues.result().toDF("path", "component", "issue")
  }
}
