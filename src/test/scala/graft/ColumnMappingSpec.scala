package graft.lake

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{CountingFileSystem, SparkSpec}

/** Column mapping end to end: RENAME/DROP COLUMN as metadata-only
  * commits (zero data files read or written, proven on the counting
  * filesystem), fresh physical names making drop + re-add resurrection-
  * proof, protocol stamping that locks v1 readers out of mapped tables,
  * logical ⇄ physical translation through every read/write/DML/
  * streaming path, data skipping on renamed columns, and plan-cache
  * non-collision between differently-mapped relations in one session.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** Same table, reached through the counting cfs:// scheme; returns
    * (cfs path for the lake API, local path for direct inspection).
    */
  private def cfsTable(prefix: String): (String, String) = {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val local = java.nio.file.Files.createTempDirectory(prefix).toString + "/t"
    ("cfs:" + local, local)
  }

  private def dataFilesOf(local: String): Set[String] = {
    val dir = java.nio.file.Paths.get(local, "data")
    if (!java.nio.file.Files.exists(dir)) Set.empty
    else {
      val s = java.nio.file.Files.walk(dir)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.filter(p =>
          p.toString.endsWith(".parquet")).map(_.toString).toSet
      } finally s.close()
    }
  }

  private def fileScan(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan in plan"))
  }

  test("rename is metadata-only: zero data files read or written, values survive") {
    val (t, local) = cfsTable("cm_rename")
    LakeTable.overwrite(spark, t,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "tag", "v"))
    val before = dataFilesOf(local)
    assert(before.nonEmpty)

    CountingFileSystem.reset()
    LakeTable.renameColumn(spark, t, "tag", "label")
    assert(CountingFileSystem.openedUnder("/t/data").isEmpty,
      s"rename read data files: ${CountingFileSystem.openedUnder("/t/data")}")
    assert(dataFilesOf(local) == before, "rename wrote or removed data files")

    // the schema renamed; the values did not move
    val out = LakeTable.read(spark, t)
    assert(out.columns.toSeq == Seq("id", "label", "v"))
    assert(out.orderBy("id").select("label").as[String].collect().toSeq ==
      Seq("a", "b", "c"))
    // first use stamped the protocol: v1 readers must refuse this table
    assert(LakeTable.latestSnapshot(spark, t).get.protocol ==
      LakeTable.Protocol(2, 2))
    // and the data files still physically carry the OLD name — the log
    // translates, nothing was rewritten
    val raw = spark.read.parquet(before.head)
    assert(raw.columns.contains("tag") && !raw.columns.contains("label"))
  }

  test("writes after a rename stage under the physical name; reads translate back") {
    val (t, local) = cfsTable("cm_write")
    LakeTable.overwrite(spark, t, Seq((1L, "a"), (2L, "b")).toDF("id", "tag"))
    val preRename = dataFilesOf(local)
    LakeTable.renameColumn(spark, t, "tag", "label")
    LakeTable.append(spark, t, Seq((3L, "c")).toDF("id", "label"))

    val out = LakeTable.read(spark, t).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "label"))
    assert(out.select("label").as[String].collect().toSeq == Seq("a", "b", "c"))

    // the NEW file also carries the physical name "tag": one stable
    // name per column across every file, whatever the logical name was
    // at write time
    val newFiles = dataFilesOf(local) -- preRename
    assert(newFiles.nonEmpty)
    newFiles.foreach { f =>
      val raw = spark.read.parquet(f)
      assert(raw.columns.contains("tag") && !raw.columns.contains("label"),
        s"post-rename file $f should carry the physical name: ${raw.columns.toSeq}")
    }
  }

  test("drop + re-add reads null — fresh physical name, no resurrection") {
    val t = tmpTable("cm_drop")
    LakeTable.overwrite(spark, t,
      Seq((1L, "secret-1", 1.0), (2L, "secret-2", 2.0)).toDF("id", "c", "v"))
    LakeTable.dropColumn(spark, t, "c")
    assert(LakeTable.read(spark, t).columns.toSeq == Seq("id", "v"))
    assert(LakeTable.latestSnapshot(spark, t).get.protocol ==
      LakeTable.Protocol(2, 2))

    // re-adding the SAME name is legal on a mapped table (fresh
    // physical name) — and must NOT resurrect the dropped bytes, which
    // are still physically present in the live files
    LakeTable.addColumns(spark, t, StructType(Seq(StructField("c", StringType))))
    val out = LakeTable.read(spark, t).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "v", "c"))
    assert(out.select("c").collect().forall(_.isNullAt(0)),
      "re-added column resurrected dropped bytes")

    // new writes give the re-added column real values; old rows stay null
    LakeTable.append(spark, t, Seq((3L, 3.0, "fresh")).toDF("id", "v", "c"))
    val rows = LakeTable.read(spark, t).orderBy("id")
      .select("id", "c").as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, None), (2L, None), (3L, Some("fresh"))))
  }

  test("time travel across a rename sees each version's own schema") {
    val t = tmpTable("cm_tt")
    LakeTable.overwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))    // v1
    val vRename = LakeTable.renameColumn(spark, t, "tag", "label")     // v2
    LakeTable.append(spark, t, Seq((2L, "b")).toDF("id", "label"))     // v3

    val v1 = spark.read.format("graft").option("versionAsOf", 1).load(t)
    assert(v1.columns.toSeq == Seq("id", "tag"))
    assert(v1.select("tag").as[String].collect().toSeq == Seq("a"))

    val v2 = spark.read.format("graft").option("versionAsOf", vRename).load(t)
    assert(v2.columns.toSeq == Seq("id", "label"))
    assert(v2.select("label").as[String].collect().toSeq == Seq("a"))

    assert(LakeTable.read(spark, t).orderBy("id")
      .select("label").as[String].collect().toSeq == Seq("a", "b"))
    // RESTORE across the rename: back to v1 restores the OLD schema
    LakeTable.restore(spark, t, 1)
    assert(LakeTable.read(spark, t).columns.toSeq == Seq("id", "tag"))
  }

  test("data skipping on a renamed column: pushed filters physicalize against logged bounds") {
    val t = tmpTable("cm_skip")
    LakeTable.overwrite(spark, t,
      spark.range(100).select(col("id"), (col("id") * 2).as("meas"))
        .repartitionByRange(4, col("id")))
    LakeTable.renameColumn(spark, t, "id", "ident")
    LakeTable.renameColumn(spark, t, "meas", "measure")
    val live = spark.read.format("graft").load(t)
    // the stats in the log are keyed by the PHYSICAL names; a filter on
    // the new logical name must still prune to one file
    val scan = fileScan(live.filter(col("ident") === 57L))
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 file scanned, got ${scan.metrics("numFiles").value}")
    assert(live.filter(col("ident") === 57L)
      .select("measure").as[Long].head() == 114L)
    // parquet-level pushdown carries the physical name too (correct
    // rows even when the row-group filter engages)
    assert(live.filter(col("measure") >= 180L).count() == 10)
  }

  test("sanitize: a frame read from a mapped table cannot smuggle physical names into another table") {
    val (t1, _) = cfsTable("cm_smug_src")
    val (t2, local2) = cfsTable("cm_smug_dst")
    LakeTable.overwrite(spark, t1, Seq((1L, "a")).toDF("id", "tag"))
    LakeTable.renameColumn(spark, t1, "tag", "label")
    val mappedFrame = LakeTable.read(spark, t1)

    LakeTable.overwrite(spark, t2, mappedFrame)
    val snap2 = LakeTable.latestSnapshot(spark, t2).get
    // the destination is NOT mapped: no field carries mapping metadata,
    // protocol stays 1
    assert(snap2.schema.fields.forall(f =>
      !f.metadata.contains("graft.columnMapping.physicalName")),
      s"physical names smuggled into ${snap2.schema.json}")
    assert(snap2.protocol == LakeTable.Protocol(1, 1))
    // and its files carry the LOGICAL name of the frame, not t1's
    // physical name
    val raw = spark.read.parquet(dataFilesOf(local2).head)
    assert(raw.columns.contains("label") && !raw.columns.contains("tag"))
    assert(LakeTable.read(spark, t2).select("label").as[String].collect().toSeq
      == Seq("a"))
  }

  test("DML through a mapped table: merge, update, delete, change feed") {
    val t = tmpTable("cm_dml")
    LakeTable.overwrite(spark, t,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("id", "tag", "v"))
    LakeTable.renameColumn(spark, t, "tag", "label")
    LakeTable.renameColumn(spark, t, "v", "amount")

    // MERGE keyed on the original (renamed-from id is untouched) with
    // updates addressing the NEW logical names
    LakeTable.merge(spark, t,
      Seq((2L, "B", 200.0), (4L, "d", 40.0)).toDF("id", "label", "amount"),
      keys = Seq("id"))
    var rows = LakeTable.read(spark, t).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq((1L, "a", 10.0), (2L, "B", 200.0), (3L, "c", 30.0),
      (4L, "d", 40.0)))

    // UPDATE on a renamed column, predicate on a renamed column
    LakeTable.update(spark, t, Seq("amount" -> (col("amount") + 1.0)),
      col("label") === "a")
    // DELETE with a predicate on a renamed column
    LakeTable.delete(spark, t, col("label") === "c")
    rows = LakeTable.read(spark, t).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(rows == Seq((1L, "a", 11.0), (2L, "B", 200.0), (4L, "d", 40.0)))

    // the change feed reads back row-level images under LOGICAL names
    val latest = LakeTable.latestSnapshot(spark, t).get.version
    val feed = LakeTable.changes(spark, t, latest, latest)
    assert(feed.columns.contains("label") && feed.columns.contains("amount"))
    val deleted = feed.filter(col("_change_type") === "delete")
      .select("id", "label").as[(Long, String)].collect().toSeq
    assert(deleted == Seq((3L, "c")))
  }

  test("streaming sink into a mapped table stages under physical names") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cm_stream").toString
    val t = s"$dir/t"; val ckpt = s"$dir/ckpt"
    LakeTable.overwrite(spark, t, Seq((0L, "seed")).toDF("id", "tag"))
    LakeTable.renameColumn(spark, t, "tag", "label")

    val ms = MemoryStream[Int]
    val q = ms.toDF().select(col("value").cast("long").as("id"),
        concat(lit("s-"), col("value")).as("label"))
      .writeStream.format("graft")
      .option("checkpointLocation", ckpt)
      .start(t)
    ms.addData(1, 2, 3)
    q.processAllAvailable()
    q.stop()

    val out = LakeTable.read(spark, t).orderBy("id")
    assert(out.columns.toSeq == Seq("id", "label"))
    assert(out.select("label").as[String].collect().toSeq ==
      Seq("seed", "s-1", "s-2", "s-3"))
    // every data file carries the one physical name
    val snap = LakeTable.latestSnapshot(spark, t).get
    snap.filePaths.foreach { rel =>
      val raw = spark.read.parquet(s"$t/data/$rel")
      assert(raw.columns.contains("tag") && !raw.columns.contains("label"),
        s"streamed file $rel columns: ${raw.columns.toSeq}")
    }
  }

  test("compact preserves the mapping: rewritten files keep physical names") {
    val t = tmpTable("cm_compact")
    LakeTable.overwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    LakeTable.append(spark, t, Seq((2L, "b")).toDF("id", "tag"))
    LakeTable.renameColumn(spark, t, "tag", "label")
    LakeTable.append(spark, t, Seq((3L, "c")).toDF("id", "label"))
    LakeTable.compact(spark, t)
    val snap = LakeTable.latestSnapshot(spark, t).get
    snap.filePaths.foreach { rel =>
      val raw = spark.read.parquet(s"$t/data/$rel")
      assert(raw.columns.contains("tag") && !raw.columns.contains("label"))
    }
    assert(LakeTable.read(spark, t).orderBy("id")
      .select("label").as[String].collect().toSeq == Seq("a", "b", "c"))
  }

  test("plan-cache: differently-mapped relations in one session return their own values") {
    // two mapped tables with DIFFERENT logical→physical maps over the
    // same column names, plus an unmapped table — all three read in one
    // session; a relation/plan-cache collision between their file
    // formats would return another table's columns (or nulls)
    val tA = tmpTable("cm_cacheA")
    val tB = tmpTable("cm_cacheB")
    val tC = tmpTable("cm_cacheC")
    LakeTable.overwrite(spark, tA, Seq((1L, "fromA")).toDF("id", "origA"))
    LakeTable.renameColumn(spark, tA, "origA", "name") // name -> origA
    LakeTable.overwrite(spark, tB, Seq((1L, "fromB")).toDF("id", "origB"))
    LakeTable.renameColumn(spark, tB, "origB", "name") // name -> origB
    LakeTable.overwrite(spark, tC, Seq((1L, "fromC")).toDF("id", "name")) // unmapped

    val a = spark.read.format("graft").load(tA)
    val b = spark.read.format("graft").load(tB)
    val c = spark.read.format("graft").load(tC)
    assert(a.select("name").as[String].head() == "fromA")
    assert(b.select("name").as[String].head() == "fromB")
    assert(c.select("name").as[String].head() == "fromC")
    // interleaved + joined: all three scans coexist in one plan
    val joined = a.select(col("name").as("na"))
      .crossJoin(b.select(col("name").as("nb")))
      .crossJoin(c.select(col("name").as("nc")))
    assert(joined.as[(String, String, String)].head() ==
      (("fromA", "fromB", "fromC")))

    // format equality itself: maps differ -> not equal; never equal to
    // the stock format graft-side (the stock format's class-based
    // equals is asymmetric by Spark's design — documented, and defused
    // by GraftFileIndex's identity-based relation equality)
    val fa = new GraftParquetFileFormat(Map("name" -> "origA"))
    val fb = new GraftParquetFileFormat(Map("name" -> "origB"))
    val stock = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    assert(fa != fb && fa != stock && fb != stock)
    assert(fa == new GraftParquetFileFormat(Map("name" -> "origA")))
    assert(fa.hashCode != fb.hashCode)
  }

  test("stock-vs-mapped relations never alias, in EITHER equality direction") {
    // Spark's ParquetFileFormat.equals is isInstanceOf-based, so
    // stockFormat.equals(graftFormat) is TRUE while the reverse is
    // false — a cache comparing stock-first could alias a mapped
    // relation to a plain one. The defense: mapped relations stamp
    // their mapping into the HadoopFsRelation `options` (part of
    // case-class equality), so the relations compare unequal in BOTH
    // directions regardless of the format's asymmetry.
    val t = tmpTable("cm_stockfirst")
    LakeTable.overwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    LakeTable.renameColumn(spark, t, "tag", "label")
    // the asymmetry itself, documented:
    val stockFmt = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val graftFmt = new GraftParquetFileFormat(Map("label" -> "tag"))
    assert(stockFmt.equals(graftFmt), "Spark's class-based equals (the hazard)")
    assert(!graftFmt.equals(stockFmt))

    // stock parquet relation over the SAME files, resolved and CACHED
    // FIRST — the stock-first lookup direction (recursive: bulk-move
    // commits nest data files under a per-commit batch dir)
    val stockDf = spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$t/data")
    stockDf.cache()
    try {
      assert(stockDf.columns.toSeq == Seq("id", "tag"), "raw files carry physical names")
      assert(stockDf.select("tag").as[String].head() == "a")
      val graftDf = spark.read.format("graft").load(t)
      // the mapped read must NOT hit the cached stock plan
      assert(graftDf.columns.toSeq == Seq("id", "label"))
      assert(graftDf.select("label").as[String].head() == "a")
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      def relOf(df: org.apache.spark.sql.DataFrame) =
        df.queryExecution.analyzed.collectFirst {
          case l: LogicalRelation => l.relation
        }.getOrElse(fail("no LogicalRelation"))
      val stockRel = relOf(stockDf)
      val graftRel = relOf(graftDf)
      assert(!stockRel.equals(graftRel), "stock-first comparison must not alias")
      assert(!graftRel.equals(stockRel), "graft-first comparison must not alias")
      // the distinct key is structural: the mapping is in the options
      graftRel match {
        case h: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          assert(h.options.contains("graft.columnMapping"))
        case other => fail(s"unexpected relation ${other.getClass}")
      }
    } finally stockDf.unpersist()
  }

  test("enableColumnMapping is explicit, idempotent, and write-compatible") {
    val (t, local) = cfsTable("cm_enable")
    LakeTable.overwrite(spark, t, Seq((1L, "a")).toDF("id", "tag"))
    CountingFileSystem.reset()
    val v = LakeTable.enableColumnMapping(spark, t)
    assert(CountingFileSystem.openedUnder("/t/data").isEmpty)
    assert(LakeTable.latestSnapshot(spark, t).get.protocol ==
      LakeTable.Protocol(2, 2))
    // idempotent: a second enable commits the same schema again,
    // changing nothing
    LakeTable.enableColumnMapping(spark, t)
    assert(LakeTable.read(spark, t).columns.toSeq == Seq("id", "tag"))
    // physical == logical until a rename: writes through the identity
    // mapping still carry the logical names
    LakeTable.append(spark, t, Seq((2L, "b")).toDF("id", "tag"))
    dataFilesOf(local).foreach { f =>
      assert(spark.read.parquet(f).columns.toSeq.sorted == Seq("id", "tag"))
    }
    assert(v >= 2)
  }

  test("guard rails: partition columns, last column, clashes") {
    val t = tmpTable("cm_guards")
    LakeTable.overwrite(spark, t,
      Seq((1L, "p1", "x")).toDF("id", "part", "s"), partitionBy = Seq("part"))
    // partition column names are baked into the directory layout
    intercept[IllegalArgumentException] {
      LakeTable.renameColumn(spark, t, "part", "region")
    }
    intercept[IllegalArgumentException] {
      LakeTable.dropColumn(spark, t, "part")
    }
    // rename target clash
    intercept[IllegalArgumentException] {
      LakeTable.renameColumn(spark, t, "s", "id")
    }
    // unknown column
    intercept[IllegalArgumentException] {
      LakeTable.renameColumn(spark, t, "nope", "x2")
    }
    intercept[IllegalArgumentException] { LakeTable.dropColumn(spark, t, "nope") }

    // last-column guard
    val t2 = tmpTable("cm_last")
    LakeTable.overwrite(spark, t2, Seq(Tuple1(1L)).toDF("id"))
    intercept[IllegalArgumentException] { LakeTable.dropColumn(spark, t2, "id") }
  }

  test("rename chain a->b->a lands back on the same physical bytes") {
    val t = tmpTable("cm_chain")
    LakeTable.overwrite(spark, t, Seq((1L, "v")).toDF("id", "a"))
    LakeTable.renameColumn(spark, t, "a", "b")
    LakeTable.renameColumn(spark, t, "b", "a")
    val out = LakeTable.read(spark, t)
    assert(out.columns.toSeq == Seq("id", "a"))
    assert(out.select("a").as[String].head() == "v")
    // swap two columns through a temp name — the classic case that
    // breaks positional readers
    val t2 = tmpTable("cm_swap")
    LakeTable.overwrite(spark, t2, Seq((1L, "left", "right")).toDF("id", "x", "y"))
    LakeTable.renameColumn(spark, t2, "x", "tmp")
    LakeTable.renameColumn(spark, t2, "y", "x")
    LakeTable.renameColumn(spark, t2, "tmp", "y")
    val swapped = LakeTable.read(spark, t2)
    assert(swapped.select("x").as[String].head() == "right")
    assert(swapped.select("y").as[String].head() == "left")
    // merge through the swapped mapping still lands correctly
    LakeTable.merge(spark, t2, Seq((1L, "RIGHT", "LEFT")).toDF("id", "x", "y"),
      keys = Seq("id"))
    val merged = LakeTable.read(spark, t2)
    assert(merged.select("x").as[String].head() == "RIGHT")
    assert(merged.select("y").as[String].head() == "LEFT")
  }
}
