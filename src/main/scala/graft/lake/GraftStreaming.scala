package graft.lake

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset, StreamExecution}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.SqlShims
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** Structured Streaming sink for lake tables —
  * `df.writeStream.format("graft").option("checkpointLocation", …)
  * .start(path)` — with END-TO-END exactly-once semantics: each
  * micro-batch commits atomically through the transaction log, and the
  * snapshot's `txns` watermark (queryId → batchId) makes the
  * post-restart replay of the last batch a no-op instead of duplicate
  * rows. This replaces the `foreachBatch` + manual-idempotence pattern
  * the same way the reference's hourly Dagster materializations land in
  * Iceberg tables (ref: trino_iceberg_transform_component.py:116-123)
  * rather than raw files: a reader half-way through a batch never sees
  * it, and a re-run batch never lands twice.
  *
  * Append mode appends (schema-evolving, like batch appends); Complete
  * mode replaces the table per batch (for streaming aggregations);
  * Update mode is rejected — a keyed upsert stream should use
  * `foreachBatch` + [[LakeTable.merge]], which needs the key columns
  * that OutputMode does not carry.
  */
private[lake] class GraftSink(spark: SparkSession, path: String,
                              partitionColumns: Seq[String],
                              outputMode: OutputMode)
    extends Sink with Logging {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // The micro-batch's plan carries streaming leaves the writer API
    // refuses; re-wrap its physical rows as a batch frame. The rows are
    // computed lazily, once, by the write job itself.
    val session = data.sparkSession
    val batchDf = SqlShims.internalCreateDataFrame(
      session, SqlShims.rowsOf(data), data.schema, isStreaming = false)
    // the watermark key: stable across restarts of the same checkpoint
    val queryId = Option(session.sparkContext
        .getLocalProperty(StreamExecution.QUERY_ID_KEY))
      .getOrElse(throw new IllegalStateException(
        "graft sink invoked outside a streaming query (no queryId local property)"))
    val committed =
      if (outputMode == OutputMode.Complete())
        LakeTable.overwriteStream(session, path, batchDf, queryId, batchId, partitionColumns)
      else
        LakeTable.appendStream(session, path, batchDf, queryId, batchId, partitionColumns)
    if (committed.isEmpty)
      logInfo(s"graft sink: batch $batchId of query $queryId already in the log at " +
        s"$path — replay skipped")
  }

  override def toString: String = s"GraftSink[$path]"
}

/** Structured Streaming source tailing a lake table —
  * `spark.readStream.format("graft").load(path)` — the change-feed
  * reader that turns any graft table into a queue: a downstream
  * pipeline stage follows upstream commits instead of re-scanning,
  * which at 100 TB is the difference between incremental and
  * recompute-the-world.
  *
  * Offsets are transaction-log versions — durable, totally ordered,
  * and replayable (a version's file list never mutates), exactly what
  * exactly-once recovery needs. A batch for (v₁, v₂] is the set of
  * files ADDED by the commits in that range, read through the native
  * parquet scan path (pruning and pushdown still apply; the leaves are
  * re-marked streaming via [[SqlShims.asStreaming]]).
  *
  * Per-commit semantics over the range:
  *  - APPEND / STREAMING APPEND / insert-only MERGE: added files are
  *    emitted.
  *  - COMPACT: skipped entirely — it rewrites bytes, not rows, so its
  *    "added" files are data the stream already delivered.
  *  - any commit that REMOVES files (OVERWRITE, row-rewriting MERGE):
  *    the table is no longer append-only; the source fails loudly
  *    unless `option("skipChangeCommits", "true")` opts into skipping
  *    such commits wholesale (Delta's semantics under the same name).
  *
  * The first batch delivers the full snapshot current at that moment
  * (the stream then tails from there); `option("startingVersion", v)`
  * starts tailing after `v` instead, delivering only changes.
  */
private[lake] class GraftSource(spark: SparkSession, table: String,
                                options: Map[String, String])
    extends Source with Logging {

  private val skipChangeCommits =
    options.get("skipChangeCommits").exists(_.equalsIgnoreCase("true"))
  private val startingVersion: Option[Long] =
    options.get("startingVersion").map { v =>
      v.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"startingVersion must be a version number, got '$v'"))
    }

  private val initialSnapshot = LakeTable.latestSnapshot(spark, table)
    .getOrElse(throw new IllegalArgumentException(
      s"cannot stream from $table: no committed version"))

  override val schema: StructType = GraftDataSource.asNullable(initialSnapshot.schema)

  private def versionOf(o: OffsetV1): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other               => other.json.trim.toLong
  }

  override def getOffset: Option[OffsetV1] =
    LakeTable.latestVersion(spark, table).map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endV = versionOf(end)
    val files: Seq[String] = start.map(versionOf).orElse(startingVersion) match {
      case None =>
        // initial batch: the whole table as of endV
        LakeTable.snapshotAt(spark, table, endV).filePaths
      case Some(startV) =>
        var prevPaths = LakeTable.snapshotAt(spark, table, startV).filePaths.toSet
        val added = ArrayBuffer.empty[String]
        var v = startV + 1
        while (v <= endV) {
          val snap = LakeTable.snapshotAt(spark, table, v)
          val paths = snap.filePaths.toSet
          val removed = prevPaths.exists(p => !paths(p))
          if (snap.operation == "COMPACT") {
            () // byte-level rewrite; rows already delivered
          } else if (removed) {
            if (!skipChangeCommits)
              throw new UnsupportedOperationException(
                s"streaming from $table: version $v (${snap.operation}) removed data " +
                  "files — the table is not append-only at this commit. Set " +
                  "option(\"skipChangeCommits\", \"true\") to skip such commits, or " +
                  "restart the stream from a later startingVersion.")
            logWarning(s"graft source: skipping change commit v$v (${snap.operation}) " +
              s"on $table")
          } else {
            paths.foreach(p => if (!prevPaths(p)) added += p)
          }
          prevPaths = paths
          v += 1
        }
        added.toSeq
    }
    val base = LakeTable.dataPath(table)
    if (files.isEmpty) {
      SqlShims.internalCreateDataFrame(spark,
        spark.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
        schema, isStreaming = true)
    } else {
      val df = spark.read
        .option("basePath", base.toString)
        .schema(schema)
        .parquet(files.map(rel => new Path(base, rel).toString): _*)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
      SqlShims.asStreaming(df)
    }
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"GraftSource[$table]"
}
