package graft

import org.apache.spark.sql.functions._
import graft.lake.LakeTable
import graft.lake.LakeTable.ConcurrentCommitException

/** Write-audit-publish: a shallow-clone branch takes writes and DML
  * invisibly to the source, and `publish` fast-forwards the audited
  * net delta back as one atomic commit — or refuses when the source
  * moved under the branch's write-set.
  */
class WapSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rows(t: String): Set[(Long, String, Double)] =
    LakeTable.read(spark, t).select("id", "grp", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

  private def freshSrc(d: String): String = {
    val src = s"$d/src"
    LakeTable.overwrite(spark, src,
      spark.range(100).select(col("id"), (col("id") % 5).cast("string").as("grp"),
        (col("id") * 1.5).as("v")),
      partitionBy = Seq("grp"))
    src
  }

  test("publish fast-forwards branch writes and DML; audit is invisible to the source") {
    val d = tmpDir("wap_basic")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    val before = rows(src)

    LakeTable.shallowClone(spark, src, branch)
    LakeTable.append(spark, branch,
      Seq((200L, "0", 9.0), (201L, "1", 10.5)).toDF("id", "grp", "v"))
    LakeTable.delete(spark, branch, col("id") % 10 === 3) // CoW rewrite of foreign files

    // audit window: the branch sees the delta, the source does not
    assert(rows(src) == before, "source must be unchanged while the branch is audited")
    val audited = rows(branch)
    assert(audited.exists(_._1 == 200L) && !audited.exists(_._1 == 13L))

    val v = LakeTable.publish(spark, src, branch)
    assert(rows(src) == audited, "published source must equal the audited branch")
    assert(LakeTable.history(spark, src).filter(col("operation") === "PUBLISH").count() == 1)

    // copy=true makes the branch disposable: delete it wholesale, source still reads
    val f = new org.apache.hadoop.fs.Path(branch)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(branch), true)
    assert(rows(src) == audited, "published source must not reference branch files")

    // change feed of the PUBLISH version: deletes only for rewritten
    // files' rows, inserts cover the appended rows
    val feed = LakeTable.changes(spark, src, v, v)
    val ins = feed.filter(col("_change_type") === "insert")
      .select("id").as[Long].collect().toSet
    val del = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSet
    assert(Set(200L, 201L).subsetOf(ins))
    assert(Seq(3L, 13L, 23L).forall(del.contains), s"rewritten files' old rows: $del")
    assert(ins.intersect(Set(3L, 13L, 23L)).isEmpty, "deleted rows must not be re-inserted")
  }

  test("WAP over a MoR-heavy source: vectored clone branches and publishes") {
    val d = tmpDir("wap_mor")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    // the source is mid-MoR-life: active vectors on several files
    LakeTable.deleteMergeOnRead(spark, src, col("id") % 10 === 3)
    LakeTable.updateMergeOnRead(spark, src, Seq("v" -> lit(-2.0)), col("id") === 40L)
    val before = rows(src)

    // branching needs NO compact-first: the clone re-keys the vectors
    LakeTable.shallowClone(spark, src, branch)
    assert(rows(branch) == before)
    LakeTable.append(spark, branch, Seq((300L, "0", 30.0)).toDF("id", "grp", "v"))
    LakeTable.delete(spark, branch, col("id") === 41L) // CoW over a vectored foreign file
    assert(rows(src) == before, "source unchanged during audit")

    // publish: untouched carried files ride at the source's CURRENT
    // state (its own vectors), the branch delta lands atomically
    LakeTable.publish(spark, src, branch)
    val after = rows(src)
    assert(after.exists(_._1 == 300L) && !after.exists(_._1 == 41L))
    assert(!after.exists(_._1 == 13L), "source's own vector deletes persist")
    assert(after.exists(t => t._1 == 40L && t._3 == -2.0),
      "source's MoR-updated image persists through the publish")
    assert(after == before + ((300L, "0", 30.0)) - ((41L, "1", 41L * 1.5)))
  }

  test("concurrent source appends merge into the publish (disjoint write-sets)") {
    val d = tmpDir("wap_merge")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    LakeTable.append(spark, branch, Seq((300L, "2", 1.0)).toDF("id", "grp", "v"))
    // the source moves on while the branch is audited — append only
    LakeTable.append(spark, src, Seq((400L, "4", 2.0)).toDF("id", "grp", "v"))

    LakeTable.publish(spark, src, branch)
    val got = rows(src)
    assert(got.exists(_._1 == 300L), "branch append published")
    assert(got.exists(_._1 == 400L), "concurrent source append preserved")
    assert(got.size == 102)
  }

  test("publish refuses when the source rewrote a file the branch also rewrote") {
    val d = tmpDir("wap_conflict")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    // branch rewrites grp=1 files; source independently rewrites them too
    LakeTable.delete(spark, branch, col("id") === 11L)
    LakeTable.update(spark, src, Seq("v" -> (col("v") * 10)), col("id") === 21L)
    val before = rows(src)
    val err = intercept[ConcurrentCommitException](LakeTable.publish(spark, src, branch))
    assert(err.getMessage.contains("rewrote"), err.getMessage)
    assert(rows(src) == before, "failed publish must leave the source untouched")
  }

  test("publish refuses when source constraints changed since the fork") {
    val d = tmpDir("wap_constraint")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    LakeTable.append(spark, branch, Seq((500L, "0", -1.0)).toDF("id", "grp", "v"))
    LakeTable.addConstraint(spark, src, "v_nonneg", "v >= 0")
    val err = intercept[ConcurrentCommitException](LakeTable.publish(spark, src, branch))
    assert(err.getMessage.contains("constraints"), err.getMessage)
  }

  test("zero-copy publish references branch files in place; no-op branch is a no-op") {
    val d = tmpDir("wap_zero")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    val v0 = LakeTable.history(spark, src).agg(max("version")).head.getLong(0)
    // untouched branch publishes as a no-op: head unchanged
    assert(LakeTable.publish(spark, src, branch) == v0)

    LakeTable.append(spark, branch, Seq((600L, "3", 4.0)).toDF("id", "grp", "v"))
    LakeTable.publish(spark, src, branch, copy = false)
    val snap = LakeTable.latestSnapshot(spark, src).get
    val foreign = snap.files.filter(e => e.path.contains("/branch/"))
    assert(foreign.nonEmpty, "zero-copy publish must reference branch files")
    assert(rows(src).exists(_._1 == 600L))
  }

  test("publish is O(branch delta): zero source data files opened, copies only the delta") {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val d = tmpDir("wap_odelta").toString
    val (src, branch) = (s"cfs:$d/src", s"cfs:$d/branch")
    LakeTable.overwrite(spark, src,
      spark.range(1000).select(col("id"), (col("id") % 5).cast("string").as("grp"),
        (col("id") * 1.5).as("v")),
      partitionBy = Seq("grp"))
    LakeTable.shallowClone(spark, src, branch)
    LakeTable.append(spark, branch, Seq((2000L, "1", 7.0)).toDF("id", "grp", "v"))
    val localFiles = LakeTable.latestSnapshot(spark, branch).get.files
      .count(e => !e.path.contains(":"))

    CountingFileSystem.reset()
    LakeTable.publish(spark, src, branch)
    val srcOpens = CountingFileSystem.openedUnder(s"$d/src/data/")
      .filter(_.endsWith(".parquet"))
    assert(srcOpens.isEmpty,
      s"publish must not read source data files, opened: $srcOpens")
    val branchOpens = CountingFileSystem.openedUnder(s"$d/branch/data/")
      .filter(_.endsWith(".parquet")).distinct
    assert(branchOpens.size == localFiles,
      s"publish must copy exactly the branch's own files: $branchOpens")
    // staged copies land as <name>.parquet.staging-* then rename into place
    val srcCreates = CountingFileSystem.createdUnder(s"$d/src/data/")
      .filter(_.contains(".parquet")).distinct
    assert(srcCreates.size == localFiles,
      s"publish must create exactly the delta under the source: $srcCreates")
  }

  test("publish replays over truncated partial-copy debris (coordinator died mid-copy)") {
    val d = tmpDir("wap_partial")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    LakeTable.append(spark, branch, Seq((300L, "2", 7.0)).toDF("id", "grp", "v"))
    val audited = rows(branch)

    // plant the wreckage a dying coordinator leaves: a TRUNCATED file at the
    // publish destination, referenced by NO committed source snapshot
    val victim = LakeTable.latestSnapshot(spark, branch).get.files
      .filter(e => !e.path.contains(":")).head
    val f = new org.apache.hadoop.fs.Path(src)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val dest = new org.apache.hadoop.fs.Path(s"$src/data/${victim.path}")
    f.mkdirs(dest.getParent)
    val out = f.create(dest, false)
    try out.write(Array[Byte](1, 2, 3)) finally out.close()
    assert(f.getFileStatus(dest).getLen != victim.size, "debris must be truncated")

    // the replay must roll FORWARD — delete the unreferenced debris and
    // recopy — not wedge on 'already exists with a DIFFERENT size'
    LakeTable.publish(spark, src, branch)
    assert(rows(src) == audited)
    assert(f.getFileStatus(dest).getLen == victim.size, "debris must be replaced")
  }

  test("branch schema evolution publishes through; source files read nulls") {
    val d = tmpDir("wap_schema")
    val src = freshSrc(d)
    val branch = s"$d/branch"
    LakeTable.shallowClone(spark, src, branch)
    LakeTable.addColumns(spark, branch,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("note",
          org.apache.spark.sql.types.StringType))))
    LakeTable.append(spark, branch,
      Seq((700L, "1", 5.0, "audited")).toDF("id", "grp", "v", "note"))
    LakeTable.publish(spark, src, branch)
    val out = LakeTable.read(spark, src)
    assert(out.columns.contains("note"))
    assert(out.filter(col("note") === "audited").count() == 1)
    assert(out.filter(col("note").isNull).count() == 100)
  }
}
