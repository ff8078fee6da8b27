package graft

import org.apache.spark.sql.functions._
import graft.lake.{GraftTxn, LakeTable}
import graft.lake.LakeTable.ConcurrentCommitException

/** Coordinated multi-table publish: branch-per-table writes, journaled
  * commit, crash-recovery roll-forward, replay idempotence, conflict
  * refusal with the journal intact.
  */
class GraftTxnSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def ids(t: String): Set[Long] =
    LakeTable.read(spark, t).select("id").collect().map(_.getLong(0)).toSet

  private def publishCount(t: String): Long =
    LakeTable.history(spark, t).filter(col("operation") === "PUBLISH").count()

  /** Two partitioned sources, disjoint id ranges. */
  private def freshPair(d: String): (String, String) = {
    val a = s"$d/fact"; val b = s"$d/dim"
    LakeTable.overwrite(spark, a,
      spark.range(100).select(col("id"), (col("id") % 5).cast("string").as("grp"),
        (col("id") * 1.5).as("v")), partitionBy = Seq("grp"))
    LakeTable.overwrite(spark, b,
      spark.range(1000, 1020).select(col("id"), (col("id") % 3).cast("string").as("grp"),
        (col("id") * 2.0).as("v")), partitionBy = Seq("grp"))
    (a, b)
  }

  test("commit publishes every table; audit is invisible until then") {
    val d = tmpDir("txn_basic")
    val (a, b) = freshPair(d)
    val beforeA = ids(a); val beforeB = ids(b)

    val txn = GraftTxn.begin(spark, Seq(a, b), s"$d/wk", id = "t1")
    LakeTable.append(spark, txn.branch(a), Seq((500L, "0", 1.0)).toDF("id", "grp", "v"))
    LakeTable.delete(spark, txn.branch(a), col("id") === 7L)
    LakeTable.append(spark, txn.branch(b), Seq((2000L, "1", 3.0)).toDF("id", "grp", "v"))

    assert(ids(a) == beforeA && ids(b) == beforeB,
      "sources must be unchanged while branches are audited")

    val versions = GraftTxn.commit(spark, txn)
    assert(versions.keySet == Set(a, b))
    assert(ids(a) == beforeA - 7L + 500L)
    assert(ids(b) == beforeB + 2000L)
    assert(publishCount(a) == 1 && publishCount(b) == 1)
    assert(GraftTxn.isCommitted(spark, s"$d/wk", "t1"))

    // branches are disposable after a copy=true commit
    val f = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sessionState.newHadoopConf())
    f.delete(new org.apache.hadoop.fs.Path(s"$d/wk/t1"), true)
    assert(ids(a).contains(500L) && ids(b).contains(2000L))
  }

  test("recovery rolls a partial commit forward; replay never double-applies") {
    val d = tmpDir("txn_recover")
    val (a, b) = freshPair(d)

    val txn = GraftTxn.begin(spark, Seq(a, b), s"$d/wk", id = "t2")
    LakeTable.append(spark, txn.branch(a), Seq((600L, "0", 1.0)).toDF("id", "grp", "v"))
    LakeTable.append(spark, txn.branch(b), Seq((2600L, "2", 1.0)).toDF("id", "grp", "v"))

    // simulate a coordinator that died after table A's publish landed:
    // the same stamped publish the coordinator would have issued
    LakeTable.publish(spark, a, txn.branch(a), txn = Some("graft-txn:t2" -> 1L))
    val vA = LakeTable.latestSnapshot(spark, a).get.version
    assert(ids(a).contains(600L) && !ids(b).contains(2600L), "partial state")

    // commit (the retry path) claims the journal and replays the plan:
    // A's publish must no-op on its watermark, B's must land
    val versions = GraftTxn.commit(spark, txn)
    assert(versions(a) == vA, "replayed publish must return the landed version")
    assert(ids(a).count(_ == 600L) == 1 && ids(b).contains(2600L))
    assert(publishCount(a) == 1, "watermark must stop a double-apply")

    // recover() after completion: pure no-op, same versions
    val again = GraftTxn.recover(spark, s"$d/wk", "t2")
    assert(again == versions)
    assert(publishCount(a) == 1 && publishCount(b) == 1)
    assert(GraftTxn.isCommitted(spark, s"$d/wk", "t2"))
  }

  test("write-set conflict refuses with the journal intact; fixing the source lets recovery finish") {
    val d = tmpDir("txn_conflict")
    val (a, b) = freshPair(d)

    val txn = GraftTxn.begin(spark, Seq(a, b), s"$d/wk", id = "t3")
    LakeTable.append(spark, txn.branch(a), Seq((700L, "0", 1.0)).toDF("id", "grp", "v"))
    // branch rewrites b's files (CoW delete) → b's write-set is its files
    LakeTable.delete(spark, txn.branch(b), col("id") === 1001L)

    // contention: the SOURCE rewrites the same file before commit (the
    // same row the branch deleted, so the write-sets provably overlap)
    val vPre = LakeTable.latestSnapshot(spark, b).get.version
    LakeTable.delete(spark, b, col("id") === 1001L)

    val e = intercept[ConcurrentCommitException] { GraftTxn.commit(spark, txn) }
    assert(e.getMessage.contains("cannot fast-forward"))
    // table A (earlier in plan order) is published and valid; B refused
    // (its only state change is the source's own contending delete)
    assert(ids(a).contains(700L))
    assert(publishCount(b) == 0, "the conflicted publish must not have landed")
    assert(!GraftTxn.isCommitted(spark, s"$d/wk", "t3"))

    // recovery keeps refusing while the contention stands…
    intercept[ConcurrentCommitException] { GraftTxn.recover(spark, s"$d/wk", "t3") }
    // …and completes once the source's write-set is restored bit-identical
    LakeTable.restore(spark, b, vPre)
    val versions = GraftTxn.recover(spark, s"$d/wk", "t3")
    assert(versions.keySet == Set(a, b))
    assert(!ids(b).contains(1001L) && publishCount(a) == 1 && publishCount(b) == 1)
    assert(GraftTxn.isCommitted(spark, s"$d/wk", "t3"))
  }

  test("abort discards unclaimed branches; a claimed journal refuses abort") {
    val d = tmpDir("txn_abort")
    val (a, b) = freshPair(d)
    val before = ids(a)

    val t4 = GraftTxn.begin(spark, Seq(a), s"$d/wk", id = "t4")
    LakeTable.append(spark, t4.branch(a), Seq((800L, "0", 1.0)).toDF("id", "grp", "v"))
    GraftTxn.abort(spark, t4)
    assert(ids(a) == before, "aborted branch must leave the source untouched")
    intercept[IllegalArgumentException] {
      LakeTable.read(spark, t4.branch(a)).count()
    }

    val t5 = GraftTxn.begin(spark, Seq(b), s"$d/wk", id = "t5")
    GraftTxn.commit(spark, t5)
    intercept[IllegalStateException] { GraftTxn.abort(spark, t5) }
  }

  test("abort claims a tombstone: a racing commit/recover refuses, abort is idempotent") {
    val d = tmpDir("txn_tomb")
    val (a, _) = freshPair(d)
    val before = ids(a)

    val t = GraftTxn.begin(spark, Seq(a), s"$d/wk", id = "t8")
    LakeTable.append(spark, t.branch(a), Seq((801L, "0", 1.0)).toDF("id", "grp", "v"))
    GraftTxn.abort(spark, t)

    // the tombstone holds the journal path, so the check-then-act race is
    // closed: a commit attempting to claim AFTER abort refuses instead of
    // publishing from deleted branches
    val ex = intercept[IllegalArgumentException] { GraftTxn.commit(spark, t) }
    assert(ex.getMessage.contains("aborted"))
    intercept[IllegalArgumentException] { GraftTxn.recover(spark, s"$d/wk", "t8") }
    assert(!GraftTxn.isCommitted(spark, s"$d/wk", "t8"))
    assert(ids(a) == before, "no publish may land after an abort tombstone")

    GraftTxn.abort(spark, t) // idempotent re-abort is a no-op

    // reusing an aborted id says so — not the misleading "recover() it"
    // remedy, which would also refuse on a tombstone
    val eb = intercept[IllegalArgumentException] {
      GraftTxn.begin(spark, Seq(a), s"$d/wk", id = "t8")
    }
    assert(eb.getMessage.contains("was aborted"), eb.getMessage)
  }

  test("a no-delta participant still lands its watermark (empty PUBLISH)") {
    val d = tmpDir("txn_nodelta")
    val (a, b) = freshPair(d)

    val txn = GraftTxn.begin(spark, Seq(a, b), s"$d/wk", id = "t6")
    LakeTable.append(spark, txn.branch(a), Seq((900L, "0", 1.0)).toDF("id", "grp", "v"))
    // branch b: audited, found clean, nothing written
    val versions = GraftTxn.commit(spark, txn)
    assert(ids(a).contains(900L))
    assert(GraftTxn.isCommitted(spark, s"$d/wk", "t6"),
      "empty participant must still be accounted committed")
    assert(versions(b) == LakeTable.latestSnapshot(spark, b).get.version)
    assert(ids(b) == (1000L until 1020L).toSet, "empty PUBLISH must not change rows")
  }

  test("same id with a different plan refuses") {
    val d = tmpDir("txn_plan")
    val (a, b) = freshPair(d)
    val txn = GraftTxn.begin(spark, Seq(a), s"$d/wk", id = "t7")
    GraftTxn.commit(spark, txn)
    val forged = GraftTxn.Txn("t7", s"$d/wk", Seq(b -> txn.branch(a)), copy = true)
    intercept[IllegalArgumentException] { GraftTxn.commit(spark, forged) }
  }
}
