package graft

import org.apache.spark.sql.functions._
import graft.lake.{Incremental, LakeTable}

/** Incremental equi-join view maintenance: the target always equals a
  * plain join of the sources' latest states, while each refresh reads
  * only the change feeds plus the affected keys' rows.
  */
class IncrementalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def facts(n: Int) = spark.range(n.toLong)
    .select(col("id").as("f_id"), (col("id") % 10).as("f_cust"),
      (col("id") * 2.5).as("f_amt"))

  private def dims(n: Int) = spark.range(n.toLong)
    .select(col("id").as("c_id"), concat(lit("cust-"), col("id")).as("c_name"),
      (col("id") % 3).cast("string").as("c_seg"))

  private def state(t: String): Set[(Long, Long, Double, String, String)] =
    LakeTable.read(spark, t)
      .select("f_id", "f_cust", "f_amt", "c_name", "c_seg")
      .as[(Long, Long, Double, String, String)].collect().toSet

  private def oracle(l: String, r: String, joinType: String = "inner")
      : Set[(Long, Long, Double, String, String)] =
    LakeTable.read(spark, l).join(LakeTable.read(spark, r),
        col("f_cust") === col("c_id"), joinType)
      .select("f_id", "f_cust", "f_amt", "c_name", "c_seg")
      .as[(Long, Long, Double, String, String)].collect().toSet

  private def refresh(l: String, r: String, t: String,
                      joinType: String = "inner"): Long =
    Incremental.refreshJoin(spark, l, r, t, Seq("f_id"),
      Seq("f_cust" -> "c_id"), joinType)

  test("refreshJoin equals a full join across a two-sided DML history") {
    val d = tmp("ij_hist")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    LakeTable.overwrite(spark, l, facts(40))
    LakeTable.overwrite(spark, r, dims(10))
    refresh(l, r, t)
    assert(state(t) == oracle(l, r), "initial build")

    // left appends: only new keys need computing
    LakeTable.append(spark, l, facts(50).filter(col("f_id") >= 40))
    refresh(l, r, t)
    assert(state(t) == oracle(l, r), "left append")

    // right update: every dependent fact row re-derives
    LakeTable.update(spark, r, Seq("c_seg" -> lit("hot")), col("c_id") === 3L)
    refresh(l, r, t)
    assert(state(t) == oracle(l, r), "right update")
    assert(state(t).count(_._5 == "hot") == 5, "5 facts reference cust 3")

    // right delete: inner join drops the dependents
    LakeTable.delete(spark, r, col("c_id") === 7L)
    refresh(l, r, t)
    assert(state(t) == oracle(l, r), "right delete")
    assert(!state(t).exists(_._2 == 7L))

    // left delete + left update + right insert, one refresh
    LakeTable.delete(spark, l, col("f_id") % 4 === 1)
    LakeTable.update(spark, l, Seq("f_cust" -> lit(9L)), col("f_id") === 0L)
    LakeTable.append(spark, r,
      Seq((7L, "cust-7b", "2")).toDF("c_id", "c_name", "c_seg"))
    refresh(l, r, t)
    assert(state(t) == oracle(l, r), "mixed two-sided delta")
    assert(state(t).exists(r0 => r0._2 == 7L && r0._4 == "cust-7b"),
      "late-arriving dim re-attaches its facts")
  }

  test("left joins flip matches to null instead of dropping rows") {
    val d = tmp("ij_left")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    LakeTable.overwrite(spark, l, facts(30))
    LakeTable.overwrite(spark, r, dims(8)) // custs 8,9 unmatched
    refresh(l, r, t, "left")
    assert(state(t) == oracle(l, r, "left"))
    assert(state(t).exists(x => x._2 == 9L && x._4 == null))

    LakeTable.delete(spark, r, col("c_id") === 2L) // retire a dim
    refresh(l, r, t, "left")
    assert(state(t) == oracle(l, r, "left"), "retired dim flips to null")
    assert(state(t).exists(x => x._2 == 2L && x._4 == null))
  }

  test("replayed refresh is a no-op; both watermarks commit atomically") {
    val d = tmp("ij_replay")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    LakeTable.overwrite(spark, l, facts(20))
    LakeTable.overwrite(spark, r, dims(10))
    refresh(l, r, t)
    LakeTable.append(spark, l, facts(25).filter(col("f_id") >= 20))
    val v1 = refresh(l, r, t)
    val v2 = refresh(l, r, t)
    assert(v1 == v2, "nothing new: the version must not move")
    assert(state(t) == oracle(l, r))
    val txns = LakeTable.latestSnapshot(spark, t).get.txns
    assert(txns.values.toSet ==
      Set(LakeTable.latestSnapshot(spark, l).get.version,
        LakeTable.latestSnapshot(spark, r).get.version) ||
      txns.size == 2, s"both watermarks stamped: $txns")
  }

  test("contracts refuse loudly: dup right keys, null left pk, name clash") {
    val d = tmp("ij_contract")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    LakeTable.overwrite(spark, l, facts(10))
    LakeTable.overwrite(spark, r, dims(5).unionByName(dims(2)))
    val e1 = intercept[IllegalArgumentException](refresh(l, r, t))
    assert(e1.getMessage.contains("key-unique"))

    val r2 = s"$d/r2"
    LakeTable.overwrite(spark, r2, dims(5).withColumnRenamed("c_name", "f_amt"))
    val e2 = intercept[IllegalArgumentException](refresh(l, r2, s"$d/t2"))
    assert(e2.getMessage.contains("collide"))

    val l3 = s"$d/l3"
    LakeTable.overwrite(spark, l3,
      Seq((Some(1L), 1L, 1.0), (None, 2L, 2.0)).toDF("f_id", "f_cust", "f_amt"))
    val e3 = intercept[IllegalArgumentException](
      refresh(l3, s"$d/r3-missing", s"$d/t3"))
    assert(e3.getMessage.contains("no committed version"))
    LakeTable.overwrite(spark, s"$d/r3", dims(3))
    val e4 = intercept[IllegalArgumentException](refresh(l3, s"$d/r3", s"$d/t3"))
    assert(e4.getMessage.contains("null"))
  }

  test("an append-only left delta appends to the view, rewriting no target file") {
    val d = tmp("ij_append")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    LakeTable.overwrite(spark, l, facts(40))
    LakeTable.overwrite(spark, r, dims(10))
    refresh(l, r, t)
    val before = LakeTable.latestSnapshot(spark, t).get.files.map(_.path).toSet
    LakeTable.append(spark, l, facts(60).filter(col("f_id") >= 40))
    refresh(l, r, t)
    val after = LakeTable.latestSnapshot(spark, t).get.files.map(_.path).toSet
    assert(before.subsetOf(after),
      "a pure left append takes the insert-only path — no view file rewrites")
    assert(state(t) == oracle(l, r), "view equals the full join after the append")
  }

  test("a touched set past the literal cap takes the checkpointed semi-join path") {
    // composite left pk: the literal cap is 64, so ~100 touched keys
    // force the semi-join restriction (the path a 10k+-key single-col
    // delta takes at scale) — result must still equal the full join
    val d = tmp("ij_semijoin")
    val (l, r, t) = (s"$d/l", s"$d/r", s"$d/t")
    val cf = spark.range(300).select(
      (col("id") / 30).cast("long").as("f_a"), (col("id") % 30).as("f_b"),
      (col("id") % 10).as("f_cust"), (col("id") * 2.5).as("f_amt"))
    LakeTable.overwrite(spark, l, cf)
    LakeTable.overwrite(spark, r, dims(10))
    def refreshC(): Long = Incremental.refreshJoin(spark, l, r, t,
      Seq("f_a", "f_b"), Seq("f_cust" -> "c_id"))
    refreshC()

    // one dim touch cascades to 30 facts (under cap): IN-chain path
    LakeTable.update(spark, r, Seq("c_seg" -> lit("warm")), col("c_id") === 2L)
    refreshC()
    // four dim touches cascade to 120 facts (> 64 cap): semi-join path
    LakeTable.update(spark, r, Seq("c_seg" -> lit("hot")), col("c_id") < 4L)
    refreshC()

    val got = LakeTable.read(spark, t)
      .select("f_a", "f_b", "f_cust", "f_amt", "c_name", "c_seg")
      .as[(Long, Long, Long, Double, String, String)].collect().toSet
    val want = LakeTable.read(spark, l).join(LakeTable.read(spark, r),
        col("f_cust") === col("c_id"))
      .select("f_a", "f_b", "f_cust", "f_amt", "c_name", "c_seg")
      .as[(Long, Long, Long, Double, String, String)].collect().toSet
    assert(got == want, "semi-join path must equal the full join")
    assert(got.count(_._6 == "hot") == 120, "all 120 dependents re-derived")
  }

  test("a delta refresh reads only affected left files (counting FS proof)") {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val d = tmp("ij_prune")
    val (l, r, t) = (s"cfs:$d/l", s"cfs:$d/r", s"cfs:$d/t")
    // left clustered by key range across several files: 4 partitions
    // by f_range so each file's f_id bounds are tight
    LakeTable.overwrite(spark, l,
      facts(400).withColumn("f_range", (col("f_id") / 100).cast("string")),
      partitionBy = Seq("f_range"))
    LakeTable.overwrite(spark, r, dims(10))
    refresh(l, r, t)

    // touch ONE left key; the recompute scan must skip every left file
    // whose f_id bounds exclude it
    LakeTable.update(spark, l, Seq("f_amt" -> lit(9999.0)), col("f_id") === 5L)
    CountingFileSystem.reset()
    refresh(l, r, t)
    val leftOpens = CountingFileSystem.openedUnder(s"$d/l/data/")
      .filter(_.endsWith(".parquet")).distinct
    // the feed names key 5 -> IN-predicate on f_id -> only files whose
    // bounds admit 5 open (the update rewrote one file in range 0)
    assert(leftOpens.forall(_.contains("f_range=0")),
      s"refresh read left files outside the touched key's range: $leftOpens")
    assert(state(t) == oracle(l, r))
  }
}
