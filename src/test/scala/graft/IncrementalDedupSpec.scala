package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.operators.Dedup

/** Incremental dedup via the persisted MinHash index: probing a batch
  * against the index finds exactly the cross pairs full-corpus mining
  * would, without re-signing the corpus; and a small probe's pushed
  * bucket predicate skips most of the range-clustered bands files.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("index probe + exact verify equals brute-force exact pairs crossing the split") {
    import graft.functions.TextFns
    graft.functions.Sketches.register(spark)
    val docs = Tables.documents(spark, sf)
    val n = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val c2 = n * 9 / 10
    // brute-force ground truth: ALL (corpus x batch) pairs at exact
    // 3-shingle Jaccard >= 0.5 — a banding miss (candidate recall < 1)
    // fails THIS assert, which is the in-repo twin of the DuckDB oracle
    val sh = docs
      .withColumn("w", TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", array_sort(TextFns.shingleExpr("w", 3)))
      .select(col("doc_id"), col("sh"))
    val expected = sh.filter(col("doc_id") < c2)
      .select(col("doc_id"), col("sh").as("sh_a"))
      .crossJoin(sh.filter(col("doc_id") >= c2)
        .select(col("doc_id").as("probe_id"), col("sh").as("sh_b")))
      .withColumn("j", expr("jaccard_sorted(sh_a, sh_b)"))
      .filter(col("j") >= 0.5)
      .select(col("doc_id"), col("probe_id"),
        graft.functions.Money.rnd(col("j"), 6).as("j"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.dedupIncr(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty, "the sf corpus has verbatim duplicates crossing the split")
    assert(got == expected,
      s"probe+verify pairs != brute-force exact crossing pairs\n got ${got.size}: " +
        s"${got.take(5)}\n expected ${expected.size}: ${expected.take(5)}")
  }

  test("a small probe's bucket pushdown skips most bands files") {
    val work = java.nio.file.Files.createTempDirectory("graft_mh_skip")
    work.toFile.deleteOnExit()
    val t = s"$work/idx"
    // synthetic corpus big enough that each band spans several
    // clustered files (the 100 TB geometry, shrunk via targetFileBytes)
    val docs = spark.range(5000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), col("id"), lit("beta"), (col("id") * 7919),
        lit("gamma"), (col("id") * 104729), lit("delta"), col("id") % 97).as("text"))
    Dedup.buildMinhashIndex(spark, docs, t, targetFileBytes = 4 * 1024)
    val totalFiles =
      graft.lake.LakeTable.latestSnapshot(spark, s"$t/bands").get.files.size
    assert(totalFiles >= 48,
      s"bands table should span several files per band, got $totalFiles")
    // probe with 2 documents that DUPLICATE index docs (so candidates
    // exist and the plan isn't folded away): 32 buckets -> pushed
    // per-band IN predicate
    val batch = docs.filter(col("doc_id").isin(100L, 200L))
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val res = Dedup.probeMinhashIndex(spark, batch, t, threshold = 0.0)
    val hits = res.collect()
    assert(hits.map(_.getLong(0)).toSet == Set(100L, 200L),
      s"each twin should hit its original: ${hits.mkString(", ")}")
    // AQE wraps the join in query stages; descend through them
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = {
      val here = p match {
        case f: FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      val below = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
        // the candidate set is persisted inside the probe; the bands
        // scan lives in the cached plan behind the in-memory scan
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scans(m.relation.cachedPlan)
        case other => other.children.flatMap(scans)
      }
      here ++ below
    }
    val bandsScan = scans(res.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains("bands")))
      .getOrElse(fail("no bands file scan in probe plan:\n" +
        res.queryExecution.executedPlan.toString.take(3000)))
    val scanned = bandsScan.metrics("numFiles").value
    assert(scanned < totalFiles / 2,
      s"pushed bucket predicate should skip files: scanned $scanned of $totalFiles")
  }

  test("appended batches are probed without re-clustering") {
    val work = java.nio.file.Files.createTempDirectory("graft_mh_app")
    work.toFile.deleteOnExit()
    val t = s"$work/idx"
    val a = Seq((1L, "alpha beta gamma delta epsilon"),
                (2L, "one two three four five six")).toDF("doc_id", "text")
    val b = Seq((3L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    Dedup.buildMinhashIndex(spark, a, t)
    Dedup.appendToMinhashIndex(spark, b, t)
    // a probe identical to doc 1 and doc 3 must hit BOTH (one clustered,
    // one in the unclustered tail) at estimate 1.0
    val probe = Seq((99L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val hits = Dedup.probeMinhashIndex(spark, probe, t, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(hits.keySet == Set(1L, 3L), s"got ${hits.keySet}")
    assert(hits.values.forall(_ == 1.0))
  }
}
