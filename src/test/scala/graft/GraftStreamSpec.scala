package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException

import graft.lake.LakeTable

/** The lake format's Structured Streaming surface:
  * `writeStream.format("graft")` (exactly-once micro-batch commits via
  * the log's txns watermark) and `readStream.format("graft")` (tailing
  * the log, versions as offsets).
  */
class GraftStreamSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("writeStream format graft: appends land transactionally, checkpoint restart does not duplicate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("graft_sink"); val table = s"$dir/t"; val ckpt = s"$dir/ckpt"

    val ms = MemoryStream[Int]
    val q1 = ms.toDF().select(col("value").as("n"), (col("value") % 3).as("k"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(table)
    ms.addData(1 to 100: _*)
    q1.processAllAvailable()
    assert(LakeTable.read(spark, table).count() == 100)
    ms.addData(101 to 150: _*)
    q1.processAllAvailable()
    q1.stop()
    assert(LakeTable.read(spark, table).count() == 150)

    // restart from the same checkpoint: Spark replays nothing new, and
    // the txns watermark guards the boundary batch — total stays exact
    val q2 = ms.toDF().select(col("value").as("n"), (col("value") % 3).as("k"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(table)
    ms.addData(151 to 200: _*)
    q2.processAllAvailable()
    q2.stop()
    val out = LakeTable.read(spark, table)
    assert(out.count() == 200)
    assert(out.agg(countDistinct("n")).head.getLong(0) == 200)
    // every commit in the log is a streaming append with the watermark
    val snap = LakeTable.latestSnapshot(spark, table).get
    assert(snap.operation == "STREAMING APPEND")
    assert(snap.txns.nonEmpty)
  }

  test("sink autoCompact bounds the file count under per-batch trickle commits") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("graft_sink_ac"); val table = s"$dir/t"; val ckpt = s"$dir/ckpt"
    val ms = MemoryStream[Int]
    val q = ms.toDF().select(col("value").as("n"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .option("autoCompact", "true")
      .start(table)
    // 12 one-row micro-batches: without auto-compaction the table ends
    // at 12 files; with it, each threshold crossing bin-packs
    (1 to 12).foreach { i => ms.addData(i); q.processAllAvailable() }
    q.stop()
    val snap = LakeTable.latestSnapshot(spark, table).get
    assert(LakeTable.read(spark, table).count() == 12)
    assert(LakeTable.read(spark, table).agg(countDistinct("n")).head.getLong(0) == 12)
    assert(snap.files.size < 12, s"expected compaction, got ${snap.files.size} files")
    assert(LakeTable.history(spark, table).collect()
      .exists(_.getString(2) == "COMPACT"))
  }

  test("appendStream is idempotent per (queryId, batchId) and drops the replay's staged files") {
    import spark.implicits._
    val table = s"${tmp("graft_txn")}/t"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    assert(LakeTable.appendStream(spark, table, df, "q1", 0L).contains(1L))
    // replay of the same batch: no commit, no rows, no leftover files
    assert(LakeTable.appendStream(spark, table, df, "q1", 0L).isEmpty)
    assert(LakeTable.read(spark, table).count() == 2)
    val fs = new Path(table).getFileSystem(spark.sessionState.newHadoopConf())
    val dataFiles = {
      val it = fs.listFiles(new Path(table, "data"), true)
      var n = 0
      while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1; () }
      n
    }
    assert(dataFiles == LakeTable.latestSnapshot(spark, table).get.files.size)
    // a LATER batch of the same query and any batch of another query land
    assert(LakeTable.appendStream(spark, table, df, "q1", 1L).contains(2L))
    assert(LakeTable.appendStream(spark, table, df, "q2", 0L).contains(3L))
    assert(LakeTable.read(spark, table).count() == 6)
    val txns = LakeTable.latestSnapshot(spark, table).get.txns
    assert(txns == Map("q1" -> 1L, "q2" -> 0L))
    // batch commits carry the watermarks forward
    LakeTable.append(spark, table, df)
    LakeTable.compact(spark, table, smallFileBytes = 1L << 20)
    assert(LakeTable.latestSnapshot(spark, table).get.txns == txns)
  }

  test("writeStream Complete mode: each batch replaces the table with the current aggregate") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = tmp("graft_sink_complete"); val table = s"$dir/t"

    val ms = MemoryStream[Int]
    val q = ms.toDF().groupBy((col("value") % 2).as("parity"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("graft").outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(table)
    ms.addData(1 to 10: _*)
    q.processAllAvailable()
    ms.addData(11 to 40: _*)
    q.processAllAvailable()
    q.stop()
    val rows = LakeTable.read(spark, table)
      .collect().map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue).toMap
    assert(rows == Map(0L -> 20L, 1L -> 20L)) // latest batch only, not accumulated
  }

  test("readStream format graft: initial snapshot then incremental tail; compact is invisible") {
    import spark.implicits._
    val dir = tmp("graft_source"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table,
      Seq((1L, "x"), (2L, "y")).toDF("id", "s"), partitionBy = Seq("s"))

    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_tail")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    assert(spark.table("graft_tail").count() == 2) // first batch = full snapshot

    LakeTable.append(spark, table, Seq((3L, "x"), (4L, "z")).toDF("id", "s"))
    q.processAllAvailable()
    assert(spark.table("graft_tail").count() == 4) // the two appended rows, once

    // compact rewrites bytes, not rows: the stream must not re-emit
    LakeTable.append(spark, table, Seq((5L, "x")).toDF("id", "s"))
    LakeTable.compact(spark, table, smallFileBytes = 1L << 20)
    q.processAllAvailable()
    assert(spark.table("graft_tail").count() == 5)
    assert(spark.table("graft_tail").select("id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    q.stop()
  }

  test("readStream fails loudly on a change commit unless skipChangeCommits") {
    import spark.implicits._
    val dir = tmp("graft_source_chg"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, Seq((1L, "a")).toDF("id", "s"))

    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_chg")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    LakeTable.overwrite(spark, table, Seq((9L, "z")).toDF("id", "s"))
    val err = intercept[StreamingQueryException] { q.processAllAvailable(); q.stop() }
    assert(err.getMessage.contains("skipChangeCommits") ||
      Option(err.getCause).exists(_.getMessage.contains("skipChangeCommits")))

    // opting in: the change commit is skipped wholesale, the tail continues
    val q2 = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(table)
      .writeStream.format("memory").queryName("graft_chg2")
      .option("checkpointLocation", s"$dir/ckpt2")
      .start()
    q2.processAllAvailable()
    val afterSnapshot = spark.table("graft_chg2").count() // fresh stream: current snapshot
    LakeTable.overwrite(spark, table, Seq((10L, "w"), (11L, "v")).toDF("id", "s"))
    LakeTable.append(spark, table, Seq((12L, "u")).toDF("id", "s"))
    q2.processAllAvailable()
    q2.stop()
    // the overwrite's rows never arrive (skipped); the append's do
    assert(afterSnapshot == 1)
    assert(spark.table("graft_chg2").select("id").as[Long].collect().toSet == Set(9L, 12L))
  }

  test("readStream startingVersion tails from that version (inclusive), no initial snapshot") {
    import spark.implicits._
    val dir = tmp("graft_source_sv"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, (1L to 100L).toDF("id")) // v1: history
    LakeTable.append(spark, table, (101L to 110L).toDF("id"))  // v2: delivered (inclusive)
    val q = spark.readStream.format("graft")
      .option("startingVersion", 2).load(table)
      .writeStream.format("memory").queryName("graft_sv")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    // inclusive of v2 (Delta semantics), not the v1 snapshot
    assert(spark.table("graft_sv").select("id").as[Long].collect().toSet ==
      (101L to 110L).toSet)
    LakeTable.append(spark, table, (111L to 115L).toDF("id"))  // v3: tailed
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_sv").select("id").as[Long].collect().toSet ==
      (101L to 115L).toSet)
  }

  test("readStream startingTimestamp resolves to the first commit at or after the instant") {
    import spark.implicits._
    val dir = tmp("graft_source_st"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, (1L to 100L).toDF("id")) // v1: history
    val tsAfterV1 = LakeTable.logEntryAt(spark, table, 1L).timestampMs + 1
    Thread.sleep(5)
    LakeTable.append(spark, table, (101L to 110L).toDF("id"))  // v2: delivered
    val q = spark.readStream.format("graft")
      .option("startingTimestamp", tsAfterV1.toString).load(table)
      .writeStream.format("memory").queryName("graft_st")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("graft_st").select("id").as[Long].collect().toSet ==
      (101L to 110L).toSet)
    // a timestamp before the first commit delivers everything
    val q2 = spark.readStream.format("graft")
      .option("startingTimestamp", "2000-01-01").load(table)
      .writeStream.format("memory").queryName("graft_st2")
      .option("checkpointLocation", s"$dir/ckpt2")
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("graft_st2").count() == 110)
    // mutually exclusive with startingVersion
    val e = intercept[Throwable] {
      val q3 = spark.readStream.format("graft")
        .option("startingVersion", 1).option("startingTimestamp", "2000-01-01")
        .load(table)
        .writeStream.format("memory").queryName("graft_st3")
        .option("checkpointLocation", s"$dir/ckpt3").start()
      try q3.processAllAvailable() finally q3.stop()
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ messages(y.getCause))
    assert(messages(e).exists(_.contains("mutually exclusive")))
  }

  test("maxVersionsPerTrigger paces a catch-up into bounded batches") {
    import spark.implicits._
    val dir = tmp("graft_paced"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, Seq(0L).toDF("id"))            // v1: history
    (1 to 9).foreach(i =>
      LakeTable.append(spark, table, Seq(i.toLong).toDF("id")))      // v2..v10: backlog
    val q = spark.readStream.format("graft")
      .option("startingVersion", 2)
      .option("maxVersionsPerTrigger", 3).load(table)
      .writeStream.format("memory").queryName("graft_paced")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    q.stop()
    // all nine backlog rows arrive, but over >= 3 batches of <= 3
    // commits each — never one unbounded catch-up batch
    assert(spark.table("graft_paced").select("id").as[Long].collect().toSet ==
      (1L to 9L).toSet)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.forall(_ <= 3), s"batch sizes: ${sizes.mkString(",")}")
    assert(sizes.length >= 3, s"batch sizes: ${sizes.mkString(",")}")
  }

  test("startingVersion outside the version range fails at construction with a clear error") {
    import spark.implicits._
    val dir = tmp("graft_source_svbad"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, (1L to 5L).toDF("id")) // v1
    LakeTable.append(spark, table, (6L to 9L).toDF("id"))    // v2
    def startWith(v: String): Throwable = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft").option("startingVersion", v).load(table)
        .writeStream.format("memory").queryName(s"graft_svbad_$v")
        .option("checkpointLocation", s"$dir/ckpt_$v").start()
      try q.processAllAvailable() finally q.stop()
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ messages(y.getCause))
    // before the first commit (0 — Delta's "beginning" spelling) and past latest+1
    assert(messages(startWith("0")).exists(_.contains("outside the version range")))
    assert(messages(startWith("9")).exists(_.contains("outside the version range")))
    // latest + 1 is valid: only future commits
    val q = spark.readStream.format("graft").option("startingVersion", 3).load(table)
      .writeStream.format("memory").queryName("graft_svnext")
      .option("checkpointLocation", s"$dir/ckpt_next").start()
    q.processAllAvailable()
    assert(spark.table("graft_svnext").count() == 0)
    LakeTable.append(spark, table, Seq(100L).toDF("id"))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_svnext").select("id").as[Long].collect().toSet == Set(100L))
  }

  test("mid-stream schema evolution fails the stream loudly; restart picks it up") {
    import spark.implicits._
    val dir = tmp("graft_source_evolve"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, Seq((1L, "a")).toDF("id", "s"))
    val q = spark.readStream.format("graft").load(table)
      .writeStream.format("memory").queryName("graft_sevolve")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    assert(spark.table("graft_sevolve").count() == 1)
    // upstream evolves the schema: the stream must stop, not deliver
    // rows silently missing the new column
    LakeTable.append(spark, table, Seq((2L, "b", 0.5)).toDF("id", "s", "score"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    def messages(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ messages(y.getCause))
    assert(messages(e).exists(_.contains("schema evolved")), s"got: $e")
    q.stop()
  }

  test("tailing a commit range reads O(range) log entries, not O(range x files)") {
    import spark.implicits._
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val dir = tmp("graft_source_orange")
    val table = "cfs:" + dir + "/t"
    LakeTable.overwrite(spark, table, (1L to 4L).toDF("id"))
    (2 to 30).foreach { i =>
      LakeTable.append(spark, table, Seq(i.toLong * 100).toDF("id"))
    } // 30 commits, ≥30 data files
    val q = spark.readStream.format("graft")
      .option("startingVersion", 31).load(table)
      .writeStream.format("memory").queryName("graft_orange")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    (1 to 3).foreach { i =>
      LakeTable.append(spark, table, Seq(i.toLong * 1000).toDF("id"))
    }
    CountingFileSystem.reset()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("graft_orange").count() == 3)
    // the 3-commit batch reads each commit's DELTA entry once — with
    // full-snapshot diffing this would be ~3 reconstructions over a
    // 30+-file table (each log entry naming every file)
    val versionReads = CountingFileSystem.openedUnder("/_graft_log/")
      .filter(_.matches(""".*/\d{20}\.json"""))
    assert(versionReads.size <= 6,
      s"batch over 3 commits read ${versionReads.size} log entries: $versionReads")
  }

  test("readChangeFeed stream delivers DML pre/post images instead of failing on change commits") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = tmp("graft_source_cdf"); val table = s"$dir/t"
    LakeTable.overwrite(spark, table, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    val q = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(table)
      .writeStream.format("memory").queryName("graft_cdf")
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    q.processAllAvailable()
    // initial snapshot arrives as inserts
    assert(spark.table("graft_cdf")
      .filter(col(LakeTable.ChangeTypeCol) === "insert").count() == 2)
    // a MERGE (change commit!) streams its row-level delta — the plain
    // source would have demanded skipChangeCommits or died
    LakeTable.merge(spark, table, Seq((2L, 99.0), (3L, 30.0)).toDF("id", "v"),
      keys = Seq("id"))
    LakeTable.delete(spark, table, col("id") === 1L)
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("graft_cdf")
      .select("id", "v", LakeTable.ChangeTypeCol)
      .as[(Long, Double, String)].collect()
    assert(rows.count(_._3 == "insert") == 3) // snapshot 2 + merged-in 3
    assert(rows.contains((2L, 20.0, "update_preimage")))
    assert(rows.contains((2L, 99.0, "update_postimage")))
    assert(rows.contains((1L, 10.0, "delete")))
  }

  test("readChangeFeed stream carries the MoR tier: vector DML mid-stream, restart-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val dir = tmp("graft_source_cdfmor"); val table = s"$dir/t"
    val out = s"$dir/out"
    LakeTable.overwrite(spark, table,
      (1L to 20L).map(i => (i, i * 1.0)).toDF("id", "v"))
    // sink into a GRAFT table: recoverable from the checkpoint and
    // exactly-once across restarts (the sink's own txn watermark)
    def start() = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(table)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(out)
    def collected(): Seq[(Long, Double, String)] = LakeTable.read(spark, out)
      .select("id", "v", LakeTable.ChangeTypeCol)
      .as[(Long, Double, String)].collect().toSeq
    val q = start()
    q.processAllAvailable()
    assert(collected().size == 20)

    // the full MoR DML tier lands mid-stream — position-deletes and
    // appended post-images must arrive as typed change rows, where a
    // plain tail would demand skipChangeCommits or die
    LakeTable.deleteMergeOnRead(spark, table, col("id") % 10 === 3)           // 3, 13
    LakeTable.updateMergeOnRead(spark, table, Seq("v" -> lit(-1.0)), col("id") === 4L)
    LakeTable.mergeMergeOnRead(spark, table,
      Seq((5L, 55.0), (100L, 100.0)).toDF("id", "v"), keys = Seq("id"))
    q.processAllAvailable()
    q.stop()
    val rows = collected()
    assert(rows.filter(_._3 == "delete").map(_._1).toSet == Set(3L, 13L))
    assert(rows.contains((4L, 4.0, "update_preimage")) &&
      rows.contains((4L, -1.0, "update_postimage")))
    assert(rows.contains((5L, 5.0, "update_preimage")) &&
      rows.contains((5L, 55.0, "update_postimage")))
    assert(rows.contains((100L, 100.0, "insert")))
    val beforeRestart = rows.size

    // restart from the checkpoint: exactly the NEW commit arrives once
    LakeTable.deleteMergeOnRead(spark, table, col("id") === 6L)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val rows2 = collected()
    assert(rows2.size == beforeRestart + 1 &&
      rows2.contains((6L, 6.0, "delete")),
      s"restart must deliver exactly the new MoR delete once, got ${rows2.size}")

    // a FRESH CDF stream over the now-vectored snapshot: the initial
    // batch reads through the vectors — no resurrected rows
    val q3 = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(table)
      .writeStream.format("memory").queryName("graft_cdfmor_f")
      .option("checkpointLocation", s"$dir/ckpt2")
      .start()
    q3.processAllAvailable()
    q3.stop()
    val initial = spark.table("graft_cdfmor_f")
      .select("id", LakeTable.ChangeTypeCol).as[(Long, String)].collect()
    assert(initial.forall(_._2 == "insert"))
    assert(initial.map(_._1).toSet ==
      ((1L to 20L).toSet -- Set(3L, 13L, 6L)) + 100L,
      "initial CDF batch must apply outstanding deletion vectors")
  }

  test("graft-to-graft pipe: a downstream table tails an upstream one exactly-once") {
    import spark.implicits._
    val dir = tmp("graft_pipe"); val up = s"$dir/up"; val down = s"$dir/down"
    LakeTable.overwrite(spark, up, (1L to 10L).toDF("id"))
    val q = spark.readStream.format("graft").load(up)
      .withColumn("doubled", col("id") * 2)
      .writeStream.format("graft")
      .option("checkpointLocation", s"$dir/ckpt")
      .start(down)
    q.processAllAvailable()
    LakeTable.append(spark, up, (11L to 15L).toDF("id"))
    q.processAllAvailable()
    q.stop()
    val out = LakeTable.read(spark, down)
    assert(out.count() == 15)
    assert(out.filter(col("doubled") =!= col("id") * 2).count() == 0)
  }

  test("landing → bronze → silver → gold end to end, exactly-once across a restart") {
    // the reference's full chain (S3 sensor → bronze_nightly →
    // silver_daily → gold_daily, defs/schedules/defs.yaml) as three
    // chained streams: a file-source sensor ingests landing files into
    // bronze, silver conforms bronze into a lake fact table, gold tails
    // the SILVER LAKE TABLE (graft source) and MERGEs hourly windows.
    import spark.implicits._
    import org.apache.spark.sql.types._
    val d = tmp("e2e_stream")
    val (landing, bronze) = (s"$d/landing", s"$d/bronze")
    val (silverT, goldT) = (s"$d/silver/fact_events", s"$d/gold/hourly")
    val landingSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    def us(h: Long, min: Long): Long = (h * 3600L + min * 60L) * 1000000L
    def land(rows: Seq[(Long, Long, Long, String, Double)]): Unit =
      rows.toDF("event_id", "ts_us", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(landing)

    def startAll() = {
      val qB = sources.Bronze.streamIngest(spark, landing, landingSchema,
        sourceSystem = "sis", table = "events", ingestDate = "2026-08-16",
        bronzePath = bronze, checkpointPath = s"$d/ckpt_bronze")
      val bronzeSchema = StructType(landingSchema.fields ++ Seq(
        StructField("_source_system", StringType), StructField("_source_table", StringType),
        StructField("_ingest_date", DateType), StructField("_batch_id", StringType)))
      val qS = spark.readStream.schema(bronzeSchema).parquet(bronze)
        .select(col("event_id"), col("user_id"), col("event_type"),
          timestamp_micros(col("ts_us")).as("ts"), col("value"), col("_batch_id"))
        .writeStream.format("graft")
        .option("checkpointLocation", s"$d/ckpt_silver").start(silverT)
      // the graft SOURCE needs one committed version for its schema, so
      // gold starts after the first landing file has flowed into silver
      qB.processAllAvailable(); qS.processAllAvailable()
      val qG = streaming.EventStreams.windowedGoldToLake(spark,
        spark.readStream.format("graft").load(silverT), goldT, s"$d/ckpt_gold")
      (qB, qS, qG)
    }
    def drain(qs: (org.apache.spark.sql.streaming.StreamingQuery,
                   org.apache.spark.sql.streaming.StreamingQuery,
                   org.apache.spark.sql.streaming.StreamingQuery)): Unit = {
      qs._1.processAllAvailable(); qs._2.processAllAvailable(); qs._3.processAllAvailable()
    }
    def stopAll(qs: (org.apache.spark.sql.streaming.StreamingQuery,
                     org.apache.spark.sql.streaming.StreamingQuery,
                     org.apache.spark.sql.streaming.StreamingQuery)): Unit = {
      qs._1.stop(); qs._2.stop(); qs._3.stop()
    }
    // batch recompute over EVERYTHING landed so far = the gold oracle
    def expected(): Set[(Long, String, Long, Double)] =
      spark.read.schema(landingSchema).parquet(landing)
        .withColumn("ts", timestamp_micros(col("ts_us")))
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), graft.functions.Money.msum(col("value")).as("sum_value"))
        .select(unix_millis(col("window.start")).as("bucket_ms"), col("event_type"),
          col("n"), col("sum_value").cast("double"))
        .as[(Long, String, Long, Double)].collect().toSet
    def gold(): Set[(Long, String, Long, Double)] =
      LakeTable.read(spark, goldT)
        .select(col("bucket_ms"), col("event_type"), col("n"),
          col("sum_value").cast("double"))
        .as[(Long, String, Long, Double)].collect().toSet

    val h = 500000L // arbitrary epoch hour; windows are hour-aligned
    land(Seq((1L, us(h, 5), 10L, "view", 1.0), (2L, us(h, 20), 11L, "view", 2.0),
      (3L, us(h, 40), 10L, "apply", 5.0), (4L, us(h + 1, 10), 12L, "view", 3.0)))
    val qs1 = startAll()
    drain(qs1)
    assert(gold() == expected(), "gold after batch 1")
    stopAll(qs1)

    // a second landing file arrives while everything is DOWN; the
    // restarted chain picks it up from the checkpoints — updating the
    // h+1 window (MERGE, not duplicate) and opening h+2
    land(Seq((5L, us(h + 1, 30), 13L, "apply", 7.0), (6L, us(h + 2, 15), 10L, "view", 4.0)))
    val qs2 = startAll()
    drain(qs2)
    stopAll(qs2)
    assert(gold() == expected(), "gold after restart + batch 2")
    // exactly-once through the middle of the chain: silver holds every
    // landed event exactly once
    assert(LakeTable.read(spark, silverT).count() == 6)
    assert(LakeTable.read(spark, silverT).select("event_id").distinct().count() == 6)
    // and gold windows are unique per (bucket, type) — MERGE semantics
    val g = LakeTable.read(spark, goldT)
    assert(g.groupBy("bucket_ms", "event_type").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("a streamed embedding feed maintains the persisted PQ index; the probe stays exact") {
    import spark.implicits._
    import graft.operators.Similarity
    val dir = tmp("pq_stream")
    val (feed, idx) = (s"$dir/feed", s"$dir/pq")
    // index built on the even half of the corpus; the odd half arrives
    // through a lake feed table tailed as a stream, each micro-batch
    // pqAppend-ed (the O(delta) maintenance path under streaming)
    Similarity.buildPqIndex(spark, sf, idx, only = Some(col("vec_id") % 2 === 0))
    val odd = graft.Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1)
    LakeTable.overwrite(spark, feed, odd.filter(col("vec_id") % 4 === 1))
    val appendBatch: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (batch, _) => { Similarity.pqAppend(spark, idx, batch); () }
    val q = spark.readStream.format("graft").load(feed)
      .writeStream.option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch(appendBatch)
      .start()
    q.processAllAvailable()
    LakeTable.append(spark, feed, odd.filter(col("vec_id") % 4 === 3))
    q.processAllAvailable()
    q.stop()
    // the maintained index answers EXACTLY: a lost, doubled or
    // corrupted streamed vector would shift some query's top-k
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(rows(Similarity.annPqIndexed(spark, sf, idx))
      == rows(Similarity.annTopk(spark, sf)))
  }
}
