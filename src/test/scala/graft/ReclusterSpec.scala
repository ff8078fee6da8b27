package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.lake.LakeTable

/** Incremental re-cluster: after a full clustering pass, later calls
  * sort ONLY the files appended since the logged clustering watermark;
  * history carries by reference and file-bound skipping stays tight —
  * the daily-append maintenance loop that avoids daily full rewrites.
  */
class ReclusterSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s.metrics("numFiles").value
    }.getOrElse(sys.error("no FileSourceScanExec in plan"))
  }

  private def rows(lo: Long, hi: Long) =
    (lo until hi).map(i => (i, s"p$i")).toDF("id", "payload")

  test("tail-only recluster: history by reference, skipping tight, idempotent") {
    val t = tmpTable("recluster")
    // v1: ids interleaved across 4 files — unclustered
    LakeTable.overwrite(spark, t, rows(0, 8000).repartition(4, col("id")))
    // v2: first call = full cluster (no watermark yet)
    val v2 = LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"),
      targetFileBytes = 32L << 10)
    val full = LakeTable.latestSnapshot(spark, t).get
    assert(full.version == v2)
    assert(full.txns.contains("__graft_cluster:s:id"), "watermark must be logged")
    assert(full.files.size >= 2, "need multiple clustered run files")

    // v3: a day's append, unclustered
    LakeTable.append(spark, t, rows(8000, 10000).repartition(2, col("id")))
    val appended = LakeTable.latestSnapshot(spark, t).get
      .filePaths.toSet -- full.filePaths.toSet
    assert(appended.size >= 2)

    // v4: incremental pass — ONLY the tail rewrites
    val v4 = LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"),
      targetFileBytes = 32L << 10)
    val after = LakeTable.latestSnapshot(spark, t).get
    assert(after.version == v4 && after.txns("__graft_cluster:s:id") == v4)
    assert(full.filePaths.toSet.subsetOf(after.filePaths.toSet),
      "already-clustered files must carry over by reference")
    assert(appended.forall(p => !after.filePaths.contains(p)),
      "the unclustered tail must be rewritten")

    // data identical
    assert(LakeTable.read(spark, t).select("id").as[Long].collect().toSet
      == (0L until 10000L).toSet)
    // skipping: a point filter overlaps at most one file per sorted run
    // (2 runs) — without clustering it would scan every file
    val scanned = scannedFiles(spark.read.format("graft").load(t)
      .filter(col("id") === 4321L).select("payload"))
    assert(scanned <= 2, s"expected <=2 files (one per run), scanned $scanned")
    val scannedTail = scannedFiles(spark.read.format("graft").load(t)
      .filter(col("id") === 9321L).select("payload"))
    assert(scannedTail <= 2, s"tail lookup scanned $scannedTail")

    // nothing new since the watermark: no-op, same version
    assert(LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id")) == v4)
  }

  test("tail recluster rebases onto a concurrent append; racer joins the next tail") {
    val t = tmpTable("recluster_rb")
    LakeTable.overwrite(spark, t, rows(0, 40).repartition(4))
    // racer lands between the recluster's staging and its commit
    LakeTable.compactBeforeCommitHook = () => {
      LakeTable.compactBeforeCommitHook = () => ()
      LakeTable.append(spark, t, rows(40, 50).repartition(1))
    }
    val v = try LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"))
            finally LakeTable.compactBeforeCommitHook = () => ()
    val s = LakeTable.latestSnapshot(spark, t).get
    assert(s.version == v && s.operation == "COMPACT")
    // nothing lost on either side
    assert(LakeTable.read(spark, t).count() == 50)
    // the rebased watermark stays at the pre-race base (its snapshot is
    // the last one whose files are all clustered), so the NEXT pass
    // re-sorts this pass's output plus the racer's file — bounded by
    // the race window — and advances the watermark over a clean head
    val v2 = LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"))
    assert(v2 == v + 1)
    assert(LakeTable.read(spark, t).count() == 50)
    // and after that, the table is fully clustered: no-op
    assert(LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id")) == v2)
  }

  test("tail recluster reconciles deletion vectors and applies them") {
    val t = tmpTable("recluster_dv")
    LakeTable.overwrite(spark, t, rows(0, 2000).repartition(2, col("id")))
    LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"),
      targetFileBytes = 32L << 10)
    // a MoR delete puts vectors on clustered files; the next pass must
    // pull those files back into the rewrite (reconcile-on-rewrite)
    LakeTable.deleteMergeOnRead(spark, t, col("id") % 100 === 7)
    LakeTable.append(spark, t, rows(2000, 2500))
    LakeTable.reclusterIncremental(spark, t, sortBy = Seq("id"),
      targetFileBytes = 32L << 10)
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(!snap.files.exists(_.dv.isDefined), "recluster must reconcile vectors")
    // the delete predates the append, so only the first 2000 ids lost
    // their %100==7 members
    assert(LakeTable.read(spark, t).select("id").as[Long].collect().toSet
      == ((0L until 2000L).filterNot(_ % 100 == 7) ++ (2000L until 2500L)).toSet)
  }

  test("zorder tail recluster works and records its own watermark key") {
    val t = tmpTable("recluster_z")
    val df = (0L until 4000L).map(i => (i, i * 37 % 4000, s"p$i"))
      .toDF("x", "y", "payload")
    LakeTable.overwrite(spark, t, df.repartition(4, col("x")))
    LakeTable.reclusterIncremental(spark, t, zorderBy = Seq("x", "y"),
      targetFileBytes = 32L << 10)
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.txns.contains("__graft_cluster:z:x,y"))
    assert(LakeTable.read(spark, t).count() == 4000L)
  }
}
