package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lake.{LakeTable, Scd2}

/** SCD Type-2 maintenance: the interval table always equals an
  * independent replay of the observation history, each changing batch
  * is exactly one commit, and the rewrite stays file-granular.
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private type Obs = (Long, String, Long) // (k, status, score)
  private type Row6 = (Long, String, Long, Long, Option[Long], Boolean)

  private def batchDf(rows: Seq[Obs]): DataFrame =
    rows.toDF("k", "status", "score")

  private def applyB(t: String, eff: Long, rows: Seq[Obs]): Long =
    Scd2.applyBatch(spark, t, batchDf(rows), Seq("k"), Seq("status", "score"), eff)

  private def state(t: String): Set[Row6] =
    LakeTable.read(spark, t)
      .select("k", "status", "score", "valid_from", "valid_to", "is_current")
      .as[Row6].collect().toSet

  /** In-memory replay: consecutive-change compression per key, each
    * change row closed by the next change's effective version.
    */
  private def replay(batches: Seq[(Long, Seq[Obs])]): Set[Row6] =
    batches.flatMap { case (eff, rows) => rows.map(r => (r._1, eff, r._2, r._3)) }
      .groupBy(_._1).flatMap { case (k, obs) =>
        val changes = obs.sortBy(_._2)
          .foldLeft(List.empty[(Long, String, Long)]) {
            case (acc, (_, eff, st, sc)) =>
              if (acc.headOption.exists(h => h._2 == st && h._3 == sc)) acc
              else (eff, st, sc) :: acc
          }.reverse
        changes.zip(changes.drop(1).map(c => Option(c._1)) :+ None).map {
          case ((eff, st, sc), next) => (k, st, sc, eff, next, next.isEmpty)
        }
      }.toSet

  private val history: Seq[(Long, Seq[Obs])] = Seq(
    1L -> Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 5L)),
    2L -> Seq((1L, "a", 10L), (2L, "b", 10L), (4L, "c", 1L)),
    3L -> Seq((3L, "b", 7L), (2L, "b", 10L)),
    4L -> Seq((1L, "z", 0L)))

  test("a batched history lands as the replayed interval table") {
    val t = s"${tmp("scd2_hist")}/dim"
    history.foreach { case (eff, rows) => applyB(t, eff, rows) }
    assert(state(t) == replay(history))
    // every key has exactly one open row
    val open = state(t).filter(_._6)
    assert(open.map(_._1) == Set(1L, 2L, 3L, 4L))
    assert(open.forall(_._5.isEmpty), "open rows carry no valid_to")
  }

  test("each changing batch is one commit; an unchanged batch is none") {
    val t = s"${tmp("scd2_noop")}/dim"
    applyB(t, 1L, history.head._2)
    val v1 = LakeTable.latestSnapshot(spark, t).get.version
    val v2 = applyB(t, 2L, history(1)._2) // changes + a new key
    assert(v2 == v1 + 1, "one atomic MERGE commit per changing batch")
    val v3 = applyB(t, 3L, history(1)._2) // identical observations again
    assert(v3 == v2, "unchanged batch returns the current version")
    assert(LakeTable.latestSnapshot(spark, t).get.version == v2,
      "unchanged batch writes no commit at all")
  }

  test("a late batch refuses instead of rewriting history backwards") {
    val t = s"${tmp("scd2_late")}/dim"
    applyB(t, 5L, Seq((1L, "a", 1L)))
    val e = intercept[IllegalArgumentException] {
      applyB(t, 5L, Seq((1L, "b", 1L))) // same effective, changed attrs
    }
    assert(e.getMessage.contains("effective"))
    val e2 = intercept[IllegalArgumentException] {
      applyB(t, 4L, Seq((1L, "c", 1L))) // behind the open row
    }
    assert(e2.getMessage.contains("effective"))
    assert(state(t) == Set((1L, "a", 1L, 5L, None, true)), "history untouched")
  }

  test("duplicate business keys in one batch fail loudly") {
    val t = s"${tmp("scd2_dup")}/dim"
    applyB(t, 1L, Seq((1L, "a", 1L)))
    val e = intercept[IllegalArgumentException] {
      applyB(t, 2L, Seq((1L, "x", 1L), (1L, "y", 2L)))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("duplicate business keys in the FIRST batch fail loudly too") {
    // the initial batch creates the table via overwrite, bypassing the merge
    // path — without its own preflight a dup key would silently land TWO open
    // rows per key, corrupting the invariant snapshotAt/joinAsOf depend on
    val t = s"${tmp("scd2_dup0")}/dim"
    val e = intercept[IllegalArgumentException] {
      applyB(t, 1L, Seq((1L, "x", 1L), (1L, "y", 2L)))
    }
    assert(e.getMessage.contains("duplicate"))
    assert(LakeTable.latestSnapshot(spark, t).isEmpty,
      "a refused initial batch must not create the table")
    // and the same keys split across batches are fine
    applyB(t, 1L, Seq((1L, "x", 1L)))
    applyB(t, 2L, Seq((1L, "y", 2L)))
    assert(state(t) == Set(
      (1L, "x", 1L, 1L, Some(2L), false),
      (1L, "y", 2L, 2L, None, true)))
  }

  test("snapshotAt answers a point-in-time dimension question") {
    val t = s"${tmp("scd2_pit")}/dim"
    history.foreach { case (eff, rows) => applyB(t, eff, rows) }
    val full = replay(history)
    for (at <- 1L to 4L) {
      val want = full.filter(r => r._4 <= at && r._5.forall(_ > at))
        .map(r => (r._1, r._2, r._3))
      val got = Scd2.snapshotAt(spark, t, at)
        .select("k", "status", "score").as[Obs].collect().toSet
      assert(got == want, s"dimension as of effective version $at")
    }
  }

  test("a one-key change rewrites only the file holding its open row") {
    val t = s"${tmp("scd2_files")}/dim"
    val b1 = spark.range(40).select(col("id").as("k"), lit("a").as("status"),
      col("id").as("score")).repartition(4, col("k"))
    Scd2.applyBatch(spark, t, b1, Seq("k"), Seq("status", "score"), 1L)
    val before = LakeTable.latestSnapshot(spark, t).get.files.map(_.path).toSet
    assert(before.size == 4, "layout under test: four data files")
    applyB(t, 2L, Seq((7L, "b", 7L)))
    val after = LakeTable.latestSnapshot(spark, t).get.files.map(_.path).toSet
    assert((before -- after).size == 1,
      "exactly the matched key's file is rewritten — O(change), not O(table)")
  }

  test("joinAsOf enriches each fact at its own effective version, equi-planned") {
    val t = s"${tmp("scd2_join")}/dim"
    history.foreach { case (eff, rows) => applyB(t, eff, rows) }
    val dim = LakeTable.read(spark, t)
    // key 1: (a,10) over [1,4), (z,0) from 4; key 3: (b,5) [1,3), (b,7) from 3
    val facts = Seq((100L, 1L, 1L), (101L, 1L, 3L), (102L, 1L, 4L), (103L, 3L, 3L))
      .toDF("f_id", "k", "at")
    val q = Scd2.joinAsOf(facts, dim, Seq("k" -> "k"), col("at"))
    val got = q.select("f_id", "status", "score")
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((100L, "a", 10L), (101L, "a", 10L),
      (102L, "z", 0L), (103L, "b", 7L)),
      "each fact sees the interval covering its OWN version — no future leakage")
    assert(got.size == 4, "fact cardinality preserved: intervals never overlap")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "interval rides as a residual on the key equi-join, never a nested loop")
  }

  test("applyFeed folds a source DML history; the watermark makes replay a no-op") {
    val d = tmp("scd2_feed")
    val (src, dim) = (s"$d/src", s"$d/dim")
    def feed(): Long =
      Scd2.applyFeed(spark, src, dim, Seq("k"), Seq("status", "score"))
    LakeTable.overwrite(spark, src, batchDf(Seq((1L, "a", 1L), (2L, "b", 2L)))) // v1
    feed()
    assert(state(dim) == Set[Row6](
      (1L, "a", 1L, 1L, None, true), (2L, "b", 2L, 1L, None, true)))

    LakeTable.update(spark, src, Seq("status" -> lit("a2")), col("k") === 1) // v2
    LakeTable.delete(spark, src, col("k") === 2)                             // v3
    LakeTable.append(spark, src, batchDf(Seq((3L, "c", 3L))))                // v4
    val v = feed()
    assert(state(dim) == Set[Row6](
      (1L, "a", 1L, 1L, Some(2L), false), (1L, "a2", 1L, 2L, None, true),
      (2L, "b", 2L, 1L, Some(3L), false), // retired: closed, no successor
      (3L, "c", 3L, 4L, None, true)))
    assert(feed() == v, "replay returns the same version")
    assert(LakeTable.latestSnapshot(spark, dim).get.version == v,
      "replay commits nothing — the txn watermark already covers the range")

    // a retired key reinserted later reopens at the reinserting version
    LakeTable.append(spark, src, batchDf(Seq((2L, "b9", 9L))))               // v5
    feed()
    assert(state(dim).filter(_._1 == 2L) == Set[Row6](
      (2L, "b", 2L, 1L, Some(3L), false), (2L, "b9", 9L, 5L, None, true)))
  }

  test("streamInto maintains the dim continuously; a fresh checkpoint replays as no-ops") {
    val d = tmp("scd2_stream")
    val (src, dim) = (s"$d/src", s"$d/dim")
    LakeTable.overwrite(spark, src, batchDf(Seq((1L, "a", 1L), (2L, "b", 2L))))
    val q = Scd2.streamInto(spark, src, dim, Seq("k"), Seq("status", "score"), s"$d/cp")
    try {
      q.processAllAvailable()
      assert(state(dim) == Set[Row6](
        (1L, "a", 1L, 1L, None, true), (2L, "b", 2L, 1L, None, true)))
      LakeTable.update(spark, src, Seq("status" -> lit("a2")), col("k") === 1) // v2
      q.processAllAvailable()
      assert(state(dim) == Set[Row6](
        (1L, "a", 1L, 1L, Some(2L), false), (1L, "a2", 1L, 2L, None, true),
        (2L, "b", 2L, 1L, None, true)))
    } finally q.stop()
    val vDone = LakeTable.latestSnapshot(spark, dim).get.version
    // restart from a FRESH checkpoint: the dim's txn watermark, not the
    // stream's offset log, carries exactly-once — full replay changes nothing
    val q2 = Scd2.streamInto(spark, src, dim, Seq("k"), Seq("status", "score"), s"$d/cp2")
    try q2.processAllAvailable() finally q2.stop()
    assert(LakeTable.latestSnapshot(spark, dim).get.version == vDone,
      "checkpoint-independent replay commits nothing")
  }

  test("intermediate states inside one feed range collapse (batch CDC)") {
    val d = tmp("scd2_collapse")
    val (src, dim) = (s"$d/src", s"$d/dim")
    LakeTable.overwrite(spark, src, batchDf(Seq((1L, "x", 1L))))          // v1
    Scd2.applyFeed(spark, src, dim, Seq("k"), Seq("status", "score"))
    LakeTable.update(spark, src, Seq("status" -> lit("y")), col("k") === 1) // v2
    LakeTable.update(spark, src, Seq("status" -> lit("z")), col("k") === 1) // v3
    Scd2.applyFeed(spark, src, dim, Seq("k"), Seq("status", "score"))
    assert(state(dim) == Set[Row6](
      (1L, "x", 1L, 1L, Some(3L), false), (1L, "z", 1L, 3L, None, true)),
      "the v2 state never becomes an interval — last change in range wins")
  }

  test("after a sorted compact, the open-row probe skips closed-history files") {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val t = "cfs:" + tmp("scd2_skip") + "/dim"
    def batchOf(eff: Long): Seq[Obs] =
      (0L until 400L).map(k => (k, s"s$eff", k))
    (1L to 3L).foreach(eff => applyB(t, eff, batchOf(eff)))
    // 400 open + 800 closed rows; segregate history the way a dim's
    // maintenance job would — sorted compact on (is_current, key)
    LakeTable.compact(spark, t, smallFileBytes = Long.MaxValue,
      sortBy = Seq("is_current", "k"), targetFileBytes = 4L << 10)
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.files.size >= 3, s"need a multi-file layout, got ${snap.files.size}")
    CountingFileSystem.reset()
    val open = LakeTable.read(spark, t).filter(col("is_current") === true)
      .select("k").collect()
    assert(open.length == 400, "every key has exactly one open row")
    val opened = CountingFileSystem.openedUnder("/data/")
      .filter(_.endsWith(".parquet")).distinct
    assert(opened.size < snap.files.size,
      s"the open-row probe must skip all-closed files via logged bounds: " +
        s"read ${opened.size} of ${snap.files.size}")
  }

  test("the change feed of a batch is close pre/post images plus inserts") {
    val t = s"${tmp("scd2_cdc")}/dim"
    applyB(t, 1L, Seq((1L, "a", 1L), (2L, "b", 2L)))
    val v = applyB(t, 2L, Seq((1L, "a2", 1L), (3L, "c", 3L)))
    val byType = LakeTable.changes(spark, t, v, v)
      .groupBy("_change_type").count().as[(String, Long)].collect().toMap
    // key 1 closes (pre+post of its v1 row) and reopens; key 3 inserts.
    // The reopened row and the fresh key are both MERGE inserts.
    assert(byType == Map("update_preimage" -> 1L, "update_postimage" -> 1L,
      "insert" -> 2L), s"got $byType")
  }
}
