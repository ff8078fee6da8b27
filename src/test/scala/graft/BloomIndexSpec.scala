package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.lake.{BloomIndex, LakeTable}

/** Bloom-filter file skipping: an equality probe on an unclustered
  * high-cardinality column scans ~1 file of a multi-file table (min/max
  * bounds can never prune such a probe — every file's range covers
  * every key), with fpp bounded, sidecars advisory, and vacuum
  * reclaiming aged ones.
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def fsOf(t: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sessionState.newHadoopConf())

  /** files actually selected by the executed scan of `df` */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.getOrElse(sys.error("no FileSourceScanExec in plan"))
  }

  // ids INTERLEAVED across files (id % 8), so every file's [min,max]
  // spans nearly the whole key range: bounds-based skipping provably
  // cannot prune a point lookup — only the bloom can
  private def interleaved = (0L until 4000L).map(i => (i, s"s$i", i % 8))
    .toDF("id", "payload", "bucket")

  test("point lookup on an unclustered key scans ~1 file via the bloom") {
    val t = tmpTable("bloom_point")
    LakeTable.overwrite(spark, t, interleaved.limit(1).drop("bucket"))
    LakeTable.enableBloomFilter(spark, t, "id", fpp = 0.01)
    // 8 part files, ids interleaved across them — staged after the
    // enable commit, so each carries its bloom
    LakeTable.overwrite(spark, t,
      interleaved.drop("bucket").repartition(8, col("id")))
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.files.size >= 6, s"need a multi-file table, got ${snap.files.size}")
    assert(snap.files.forall(_.bloom.isDefined), "staged files must carry blooms")

    val probe = spark.read.format("graft").load(t).filter(col("id") === 1234L)
    assert(probe.select("payload").as[String].collect().toSeq == Seq("s1234"))
    val scanned = scannedFiles(probe.select("payload"))
    assert(scanned <= 2,
      s"bloom should prune the point lookup to ~1 file, scanned $scanned of ${snap.files.size}")
    // without the bloom the same probe reads every file (bounds overlap)
    val all = scannedFiles(spark.read.format("graft").load(t)
      .filter(col("payload") === "s1234").select("id"))
    assert(all == snap.files.size.toLong,
      s"sanity: an un-bloomed predicate scans all files, got $all")
    // IN probes skip too
    val inScan = scannedFiles(spark.read.format("graft").load(t)
      .filter(col("id").isin(7L, 9L)).select("payload"))
    assert(inScan <= 4, s"IN probe scanned $inScan")
  }

  test("fpp is bounded: absent keys rarely survive the filter") {
    val t = tmpTable("bloom_fpp")
    LakeTable.overwrite(spark, t, interleaved.limit(1000))
    LakeTable.enableBloomFilter(spark, t, "id", fpp = 0.01)
    LakeTable.append(spark, t, interleaved.filter(col("id") >= 1000))
    val snap = LakeTable.latestSnapshot(spark, t).get
    val bloomed = snap.files.filter(_.bloom.isDefined)
    assert(bloomed.nonEmpty)
    val f = fsOf(t)
    var probesN = 0
    var falsePos = 0
    bloomed.foreach { e =>
      val bf = BloomIndex.load(f, t, e.bloom.get)(e.path)("id")
      (100000L until 101000L).foreach { absent =>
        probesN += 1
        if (bf.mightContainLong(absent)) falsePos += 1
      }
    }
    val rate = falsePos.toDouble / probesN
    assert(rate <= 0.03, s"measured fp rate $rate exceeds 3x the configured 0.01")
  }

  test("sidecars are advisory; vacuum sweeps unreferenced ones") {
    val t = tmpTable("bloom_adv")
    LakeTable.overwrite(spark, t, interleaved.limit(100))
    LakeTable.enableBloomFilter(spark, t, "id")
    LakeTable.append(spark, t, interleaved.filter(col("id").between(100, 199)))
    val f = fsOf(t)
    val blp = new org.apache.hadoop.fs.Path(t, "_index/bloom")
    assert(f.listStatus(blp).nonEmpty)
    // delete the sidecar out from under the table: reads stay CORRECT
    // (they just stop skipping)
    f.listStatus(blp).foreach(st => f.delete(st.getPath, false))
    assert(spark.read.format("graft").load(t).filter(col("id") === 150L).count() == 1L)
    // rewrite everything, then vacuum: the rewritten files' sidecar is
    // retained, the old (now orphaned) references age out with their
    // versions
    LakeTable.compact(spark, t, smallFileBytes = 1L << 30)
    val retained = LakeTable.latestSnapshot(spark, t).get.files.flatMap(_.bloom).distinct
    LakeTable.vacuum(spark, t, retainVersions = 1, graceMs = 0L)
    val left = f.listStatus(blp).map("_index/bloom/" + _.getPath.getName).toSet
    assert(left == retained.toSet,
      s"vacuum must keep exactly the retained sidecars: left $left, want $retained")
    assert(spark.read.format("graft").load(t).filter(col("id") === 150L).count() == 1L)
  }

  test("column-mapped table: bloom follows the physical name across RENAME") {
    val t = tmpTable("bloom_map")
    LakeTable.overwrite(spark, t, interleaved.limit(500))
    LakeTable.enableBloomFilter(spark, t, "id")
    LakeTable.renameColumn(spark, t, "id", "doc_key")
    LakeTable.append(spark, t, (500L until 1000L).map(i => (i, s"s$i"))
      .toDF("doc_key", "payload"))
    val snap = LakeTable.latestSnapshot(spark, t).get
    // the flag survives the rename (metadata rides the field)
    assert(BloomIndex.flaggedColumns(snap.schema).map(_._1) == Seq("doc_key"))
    assert(snap.files.exists(_.bloom.isDefined))
    val out = spark.read.format("graft").load(t).filter(col("doc_key") === 777L)
    assert(out.select("payload").as[String].collect().toSeq == Seq("s777"))
  }

  test("bloom survives a merge-on-read delete and stays sound") {
    val t = tmpTable("bloom_dv")
    LakeTable.overwrite(spark, t, interleaved.limit(1).drop("bucket"))
    LakeTable.enableBloomFilter(spark, t, "id")
    LakeTable.overwrite(spark, t, interleaved.limit(400).drop("bucket"))
    LakeTable.deleteMergeOnRead(spark, t, col("id") % 5 === 0)
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.files.exists(e => e.dv.isDefined && e.bloom.isDefined),
      "dv re-add must preserve the bloom reference")
    val got = LakeTable.read(spark, t).filter(col("id") === 123L).count()
    assert(got == 1L)
    assert(LakeTable.read(spark, t).filter(col("id") === 120L).count() == 0L)
  }
}
