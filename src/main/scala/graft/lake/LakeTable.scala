package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
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
  *    `_graft_log/` named by zero-padded version; publishing is a
  *    single atomic rename (rename-to-existing fails, so concurrent
  *    writers serialize by optimistic retry). Readers always see a
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
  * Scale notes: the log is O(files) per snapshot — at real scale you
  * would add Delta-style checkpoint compaction and a manifest-backed
  * FileIndex instead of a driver-side path list, but the commit
  * protocol, copy-on-write MERGE and pruning behavior are the same
  * ones the production formats use. Data is never rewritten except the
  * matched files of a MERGE; overwrite is a metadata swap.
  *
  * Layout:
  * {{{
  * <table>/_graft_log/00000000000000000001.json
  * <table>/data/<part=val>/part-<uuid>.parquet
  * <table>/_staging/<uuid>/   (transient)
  * }}}
  */
object LakeTable {

  final case class Snapshot(version: Long, timestampMs: Long, operation: String,
                            schema: StructType, partitionColumns: Seq[String],
                            files: Seq[String])

  final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  private def logPath(table: String) = new Path(table, "_graft_log")
  private def dataPath(table: String) = new Path(table, "data")
  private def fs(spark: SparkSession, table: String): FileSystem =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  private def versionFile(table: String, v: Long): Path =
    new Path(logPath(table), f"$v%020d.json")

  // ---------------------------------------------------------------- log I/O

  private def renderSnapshot(s: Snapshot): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "version" -> JLong(s.version),
      "timestampMs" -> JLong(s.timestampMs),
      "operation" -> JString(s.operation),
      "schemaJson" -> JString(s.schema.json),
      "partitionColumns" -> JArray(s.partitionColumns.map(JString(_)).toList),
      "files" -> JArray(s.files.map(JString(_)).toList))))

  private def jLong(v: JValue): Long = v match {
    case JLong(x) => x
    case JInt(x)  => x.toLong
    case other    => throw new IllegalStateException(s"expected number, got $other")
  }
  private def jStr(v: JValue): String = v match {
    case JString(x) => x
    case other      => throw new IllegalStateException(s"expected string, got $other")
  }

  private def parseSnapshot(s: String): Snapshot = {
    val j = JsonMethods.parse(s)
    Snapshot(
      version = jLong(j \ "version"),
      timestampMs = jLong(j \ "timestampMs"),
      operation = jStr(j \ "operation"),
      schema = DataType.fromJson(jStr(j \ "schemaJson")).asInstanceOf[StructType],
      partitionColumns = (j \ "partitionColumns").asInstanceOf[JArray].arr.map(jStr),
      files = (j \ "files").asInstanceOf[JArray].arr.map(jStr))
  }

  private def readSnapshotFile(f: FileSystem, p: Path): Snapshot = {
    val in = f.open(p)
    try parseSnapshot(new String(in.readAllBytes(), "UTF-8"))
    finally in.close()
  }

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val lp = logPath(table)
    if (!f.exists(lp)) Seq.empty
    else f.listStatus(lp).toSeq
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(n => n.stripSuffix(".json").toLong)
      .sorted
  }

  def latestSnapshot(spark: SparkSession, table: String): Option[Snapshot] =
    versions(spark, table).lastOption.map(v => snapshotAt(spark, table, v))

  def snapshotAt(spark: SparkSession, table: String, version: Long): Snapshot = {
    val f = fs(spark, table)
    val p = versionFile(table, version)
    if (!f.exists(p))
      throw new IllegalArgumentException(s"no version $version at $table")
    readSnapshotFile(f, p)
  }

  /** Commit `snap` as `snap.version` iff that version does not exist yet.
    * Returns false on a lost race (version taken by another writer).
    */
  private def tryCommit(spark: SparkSession, table: String, snap: Snapshot): Boolean = {
    val f = fs(spark, table)
    f.mkdirs(logPath(table))
    val target = versionFile(table, snap.version)
    if (f.exists(target)) return false
    val tmp = new Path(logPath(table), s".tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, false)
    try out.write(renderSnapshot(snap).getBytes("UTF-8")) finally out.close()
    // atomic publish: rename fails (returns false) if target appeared
    val ok = f.rename(tmp, target)
    if (!ok) f.delete(tmp, false)
    ok
  }

  // ------------------------------------------------------------- data files

  /** Write `df` to a transient staging dir, then move the part files
    * into the shared `data/` tree (preserving hive partition subdirs).
    * Part file names embed the write job's UUID, so moves never
    * collide. Returns the new files' table-relative paths.
    */
  private def stageFiles(spark: SparkSession, table: String, df: DataFrame,
                         partitionBy: Seq[String]): Seq[String] = {
    val f = fs(spark, table)
    val staging = new Path(new Path(table, "_staging"), java.util.UUID.randomUUID().toString)
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(staging.toString)

    val moved = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = f.listFiles(staging, true)
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet")) {
        val rel = relativize(staging, st.getPath)
        val dest = new Path(dataPath(table), rel)
        f.mkdirs(dest.getParent)
        if (!f.rename(st.getPath, dest))
          throw new IllegalStateException(s"could not move ${st.getPath} to $dest")
        moved += rel
      }
    }
    f.delete(staging, true)
    moved.toSeq
  }

  private def relativize(base: Path, p: Path): String = {
    val b = base.toUri.getPath.stripSuffix("/")
    val s = p.toUri.getPath
    require(s.startsWith(b + "/"), s"$p not under $base")
    s.drop(b.length + 1)
  }

  // ---------------------------------------------------------------- writes

  private val maxRetries = 3

  /** Replace the table contents atomically. Previous versions stay
    * readable (time travel) until vacuumed. Schema may differ freely
    * from the previous version.
    */
  def overwrite(spark: SparkSession, table: String, df: DataFrame,
                partitionBy: Seq[String] = Nil): Long = {
    val newFiles = stageFiles(spark, table, df, partitionBy)
    retryCommit(spark, table, "OVERWRITE") { prev =>
      (df.schema, partitionBy, newFiles)
    }
  }

  /** Append rows; new columns merge into the snapshot schema (old files
    * read them as null). Partitioning is carried from the table.
    */
  def append(spark: SparkSession, table: String, df: DataFrame): Long = {
    val parts = latestSnapshot(spark, table).map(_.partitionColumns).getOrElse(Nil)
    val newFiles = stageFiles(spark, table, df, parts)
    retryCommit(spark, table, "APPEND") { prev =>
      val schema = prev.map(p => mergeSchemas(p.schema, df.schema)).getOrElse(df.schema)
      (schema, prev.map(_.partitionColumns).getOrElse(parts),
        prev.map(_.files).getOrElse(Nil) ++ newFiles)
    }
  }

  private def retryCommit(spark: SparkSession, table: String, op: String)(
      derive: Option[Snapshot] => (StructType, Seq[String], Seq[String])): Long = {
    var attempt = 0
    while (attempt < maxRetries) {
      val prev = latestSnapshot(spark, table)
      val (schema, parts, files) = derive(prev)
      val snap = Snapshot(prev.map(_.version).getOrElse(0L) + 1,
        System.currentTimeMillis(), op, schema, parts, files)
      if (tryCommit(spark, table, snap)) return snap.version
      attempt += 1
    }
    throw new ConcurrentCommitException(s"$op on $table lost $maxRetries commit races")
  }

  /** Fields of `existing` plus any new fields of `incoming`; a name
    * present in both must have the same type (no silent widening).
    */
  private def mergeSchemas(existing: StructType, incoming: StructType): StructType = {
    val byName = existing.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { e =>
        require(e.dataType == f.dataType,
          s"schema conflict on '${f.name}': ${e.dataType} vs ${f.dataType}")
      }
    }
    StructType(existing.fields ++ incoming.fields.filterNot(f => byName.contains(f.name)))
  }

  // ----------------------------------------------------------------- reads

  /** Read the latest (or `asOf`) snapshot. Filters on partition columns
    * prune at the file-index level (PartitionFilters in the scan).
    */
  def read(spark: SparkSession, table: String, asOf: Option[Long] = None): DataFrame = {
    val snap = asOf.map(snapshotAt(spark, table, _))
      .orElse(latestSnapshot(spark, table))
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    if (snap.files.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], snap.schema)
    } else {
      val base = dataPath(table)
      val paths = snap.files.map(rel => new Path(base, rel).toString)
      spark.read
        .option("basePath", base.toString)
        .schema(snap.schema)
        .parquet(paths: _*)
        .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  /** Commit history, latest first: (version, timestamp_ms, operation, num_files). */
  def history(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    versions(spark, table).map(v => snapshotAt(spark, table, v))
      .map(s => (s.version, s.timestampMs, s.operation, s.files.size.toLong))
      .sortBy(-_._1)
      .toDF("version", "timestamp_ms", "operation", "num_files")
  }

  // ----------------------------------------------------------------- merge

  /** Upsert (MERGE): rows of `updates` replace current rows with the
    * same `keys` value; unmatched update rows insert. File-granularity
    * copy-on-write — only files containing a matched key are rewritten;
    * all other files carry over by reference. `updates` must be
    * key-unique and share the table schema.
    *
    * A concurrent commit between the rewrite and the publish would
    * invalidate the copied files, so a lost race aborts with
    * ConcurrentCommitException rather than rebasing (the production
    * formats do the same for conflicting row-level operations).
    */
  def merge(spark: SparkSession, table: String, updates: DataFrame,
            keys: Seq[String]): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val keyCols = keys.map(col)
    val updKeys = updates.select(keyCols: _*).distinct()

    // which files contain a matched key? (file names only — bounded by
    // file count, not row count)
    val base = dataPath(table).toString
    val affectedAbs = read(spark, table)
      .withColumn("__file", input_file_name())
      .join(broadcast(updKeys), keys)
      .select("__file").distinct()
      .collect().map(_.getString(0)).toSet
    val affectedRel = snap.files.filter(rel =>
      affectedAbs.exists(abs => abs.endsWith("/" + rel) || abs.endsWith(rel)))

    val ordered = snap.schema.fieldNames.map(col).toIndexedSeq
    val rewritten =
      if (affectedRel.isEmpty) updates.select(ordered: _*)
      else {
        val affectedPaths = affectedRel.map(rel => new Path(base, rel).toString)
        val affectedRows = spark.read
          .option("basePath", base)
          .schema(snap.schema)
          .parquet(affectedPaths: _*)
        affectedRows.join(broadcast(updKeys), keys, "left_anti")
          .select(ordered: _*)
          .unionByName(updates.select(ordered: _*))
      }

    val newFiles = stageFiles(spark, table, rewritten, snap.partitionColumns)
    val files = snap.files.filterNot(affectedRel.toSet) ++ newFiles
    val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "MERGE",
      snap.schema, snap.partitionColumns, files)
    if (!tryCommit(spark, table, next))
      throw new ConcurrentCommitException(s"MERGE on $table lost the commit race")
    next.version
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
    * `sortBy` clusters the rewritten files on the given columns
    * (sortWithinPartitions — no extra shuffle): parquet then stores
    * tight min/max stats per row group, so point/range filters on
    * those columns skip row groups at scan time — the lightweight
    * cousin of Z-ordering, and at 100 TB the difference between
    * reading a row group and reading a partition.
    */
  def compact(spark: SparkSession, table: String,
              smallFileBytes: Long = 32L << 20,
              sortBy: Seq[String] = Nil): Long = {
    val snap = latestSnapshot(spark, table)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $table"))
    val f = fs(spark, table)
    val base = dataPath(table)
    val (small, big) = snap.files.partition(rel =>
      f.getFileStatus(new Path(base, rel)).getLen < smallFileBytes)
    if (small.size <= 1) return snap.version
    val packed = spark.read
      .option("basePath", base.toString)
      .schema(snap.schema)
      .parquet(small.map(rel => new Path(base, rel).toString): _*)
      .select(snap.schema.fieldNames.map(col).toIndexedSeq: _*)
    // partition cols lead the sort so the write path's required
    // ordering is already satisfied and it does not re-sort (which
    // would destroy the clustering)
    val rows =
      if (sortBy.isEmpty) packed
      else packed.sortWithinPartitions(
        (snap.partitionColumns ++ sortBy).map(col): _*)
    val newFiles = stageFiles(spark, table, rows, snap.partitionColumns)
    val next = Snapshot(snap.version + 1, System.currentTimeMillis(), "COMPACT",
      snap.schema, snap.partitionColumns, big ++ newFiles)
    if (!tryCommit(spark, table, next))
      throw new ConcurrentCommitException(s"COMPACT on $table lost the commit race")
    next.version
  }

  // ---------------------------------------------------------------- vacuum

  /** Delete data files referenced only by versions older than the
    * `retainVersions` most recent, plus any orphans from crashed
    * writes. Time travel further back than the retention window stops
    * working (the log entries remain for history). Returns the number
    * of files deleted.
    */
  def vacuum(spark: SparkSession, table: String, retainVersions: Int = 2): Int = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    if (vs.isEmpty) return 0
    val retained = vs.takeRight(math.max(1, retainVersions))
      .flatMap(v => snapshotAt(spark, table, v).files).toSet
    val dp = dataPath(table)
    if (!f.exists(dp)) return 0
    var deleted = 0
    val it = f.listFiles(dp, true)
    val toDelete = scala.collection.mutable.ArrayBuffer.empty[Path]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && !retained.contains(relativize(dp, st.getPath)))
        toDelete += st.getPath
    }
    toDelete.foreach { p => if (f.delete(p, false)) deleted += 1 }
    // drop leftover staging dirs from crashed writes
    val staging = new Path(table, "_staging")
    if (f.exists(staging)) f.delete(staging, true)
    deleted
  }
}
