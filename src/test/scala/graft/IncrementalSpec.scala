package graft

import org.apache.spark.sql.functions._
import graft.lake.{Incremental, LakeTable}

/** Incremental aggregate maintenance from the change feed: every
  * refresh reads only the delta, yet the target always equals a full
  * recompute — and a replayed refresh is a no-op (atomic watermark).
  */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  /** target contents as (group -> (rows, qty, revenue)) */
  private def targetState(t: String): Map[String, (Long, Long, Double)] =
    LakeTable.read(spark, t)
      .select("grp", Incremental.RowsCol, "qty", "revenue")
      .as[(String, Long, Long, Double)].collect()
      .map { case (g, n, q, r) => g -> (n, q, r) }.toMap

  /** the oracle: full recompute off the source's latest state */
  private def recomputed(src: String): Map[String, (Long, Long, Double)] =
    LakeTable.read(spark, src)
      .groupBy("grp").agg(count(lit(1)), sum("qty"), sum("revenue"))
      .as[(String, Long, Long, Double)].collect()
      .map { case (g, n, q, r) => g -> (n, q, r) }.toMap

  private def assertConverged(src: String, tgt: String): Unit = {
    val got = targetState(tgt)
    val want = recomputed(src)
    assert(got.keySet == want.keySet,
      s"group sets diverged: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (g, (n, q, r)) =>
      val (gn, gq, gr) = got(g)
      assert(gn == n && gq == q, s"group $g: got ($gn,$gq), want ($n,$q)")
      assert(math.abs(gr - r) <= 1e-9 * math.max(1.0, math.abs(r)),
        s"group $g revenue: got $gr, want $r")
    }
  }

  test("incremental refresh equals full recompute across a DML history") {
    val src = tmpTable("incr_src")
    val tgt = tmpTable("incr_tgt")
    def row(id: Long, g: String, q: Long, r: Double) = (id, g, q, r)
    val measures = Map(
      "qty" -> col("qty"),
      "revenue" -> col("revenue"))

    // v1: initial corpus
    LakeTable.overwrite(spark, src,
      (1L to 20L).map(i => row(i, s"g${i % 4}", i, i * 1.5))
        .toDF("id", "grp", "qty", "revenue"))
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    assert(Incremental.refreshedThrough(spark, src, tgt).contains(1L))
    assertConverged(src, tgt)

    // appends + an upsert + a delete + an update, refreshing at
    // different cadences (multi-version deltas must fold correctly)
    LakeTable.append(spark, src,
      (21L to 30L).map(i => row(i, s"g${i % 5}", i, i * 1.5))
        .toDF("id", "grp", "qty", "revenue"))                            // v2: new group g4
    LakeTable.merge(spark, src,
      Seq(row(5L, "g1", 500L, 7.25), row(31L, "g0", 31L, 46.5))
        .toDF("id", "grp", "qty", "revenue"), Seq("id"))                 // v3: update + insert
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)        // folds v2+v3
    assertConverged(src, tgt)

    LakeTable.delete(spark, src, col("id") <= 4L)                        // v4
    LakeTable.update(spark, src, Seq("qty" -> lit(1000L)),
      col("id") === 10L)                                                 // v5
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    assertConverged(src, tgt)
    assert(Incremental.refreshedThrough(spark, src, tgt).contains(5L))

    // a group emptied out disappears from the target
    LakeTable.delete(spark, src, col("grp") === "g4")                    // v6
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    assertConverged(src, tgt)
    assert(!targetState(tgt).contains("g4"))

    // compaction is maintenance, not change: feed-invisible
    LakeTable.compact(spark, src, smallFileBytes = 1L << 30)             // v7
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    assertConverged(src, tgt)
  }

  test("replayed refresh is a no-op: the watermark commits atomically with the data") {
    val src = tmpTable("incr_replay_src")
    val tgt = tmpTable("incr_replay_tgt")
    val measures = Map("qty" -> col("qty"), "revenue" -> col("revenue"))
    LakeTable.overwrite(spark, src,
      Seq((1L, "a", 2L, 1.0), (2L, "b", 3L, 2.0)).toDF("id", "grp", "qty", "revenue"))
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    LakeTable.append(spark, src,
      Seq((3L, "a", 5L, 4.0)).toDF("id", "grp", "qty", "revenue"))
    val v = Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    // replay (same source version): no commit, no double-count
    assert(Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures) == v)
    assert(LakeTable.latestSnapshot(spark, tgt).get.version == v)
    assertConverged(src, tgt)
    assert(targetState(tgt)("a") == ((2L, 7L, 5.0)))
  }

  test("hybrid MIN/MAX refresh equals full recompute across a DML history") {
    val src = tmpTable("incr_mm_src")
    val tgt = tmpTable("incr_mm_tgt")
    val measures = Map("qty" -> col("qty"))
    val mins = Map("qmin" -> col("qty"))
    val maxs = Map("qmax" -> col("qty"))
    def refresh(): Unit =
      Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures, mins, maxs)
    def converged(): Unit = {
      val got = LakeTable.read(spark, tgt).select("grp", "qty", "qmin", "qmax")
        .as[(String, Long, Long, Long)].collect()
        .map { case (g, q, lo, hi) => g -> ((q, lo, hi)) }.toMap
      val want = LakeTable.read(spark, src).groupBy("grp")
        .agg(sum("qty").as("qty"), min("qty").as("qmin"), max("qty").as("qmax"))
        .as[(String, Long, Long, Long)].collect()
        .map { case (g, q, lo, hi) => g -> ((q, lo, hi)) }.toMap
      assert(got == want, s"hybrid target $got diverged from recompute $want")
    }
    LakeTable.overwrite(spark, src,
      (1L to 20L).map(i => (i, s"g${i % 4}", i)).toDF("id", "grp", "qty")) // v1
    refresh(); converged()
    // retire a group's current MAX: the runner-up must surface — the
    // exact case pure feed-folding cannot answer
    LakeTable.delete(spark, src, col("qty") === 20L)                      // v2 (g0's max)
    refresh(); converged()
    // an update dives below the group's MIN
    LakeTable.update(spark, src, Seq("qty" -> lit(0L)), col("id") === 7L) // v3
    refresh(); converged()
    // multi-version fold in one refresh: append + delete
    LakeTable.append(spark, src,
      (21L to 25L).map(i => (i, s"g${i % 4}", i * 10)).toDF("id", "grp", "qty")) // v4
    LakeTable.delete(spark, src, col("id") <= 2L)                         // v5
    refresh(); converged()
    // a group emptied out disappears
    LakeTable.delete(spark, src, col("grp") === "g3")                     // v6
    refresh(); converged()
    assert(!LakeTable.read(spark, tgt).select("grp").as[String]
      .collect().contains("g3"))
  }

  test("MIN/MAX delta refresh reads only source files whose bounds admit touched groups") {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val work = java.nio.file.Files.createTempDirectory("incr_mm_cost").toString
    val src = s"cfs:$work/src"
    val tgt = s"cfs:$work/tgt"
    // one data file per group: each file's logged grp bounds are [gK, gK]
    LakeTable.overwrite(spark, src,
      (1L to 10L).map(i => (i, "g0", i)).toDF("id", "grp", "qty").coalesce(1))
    (1 to 7).foreach { k =>
      LakeTable.append(spark, src,
        (1L to 10L).map(i => (k * 100L + i, s"g$k", i)).toDF("id", "grp", "qty")
          .coalesce(1))
    }
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"),
      Map("qty" -> col("qty")), mins = Map("qmin" -> col("qty")))
    // touch exactly one group
    LakeTable.update(spark, src, Seq("qty" -> lit(0L)), col("id") === 301L) // g3
    val g3Files = LakeTable.latestSnapshot(spark, src).get.files
      .filter(_.stats.get("grp").exists(s =>
        s.min.exists(_ <= "g3") && s.max.exists(_ >= "g3")))
      .map(_.path).toSet
    assert(g3Files.nonEmpty && g3Files.size <= 2)
    CountingFileSystem.reset()
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"),
      Map("qty" -> col("qty")), mins = Map("qmin" -> col("qty")))
    val opened = CountingFileSystem.openedUnder("/src/data/")
      .filterNot(_.endsWith(".crc")).toSet
    // the extremes recompute must read SOMETHING (unlike pure-additive,
    // which reads zero source files) — but only g3's file(s), proven by
    // the logged bounds skipping the other 7 groups' files
    assert(opened.nonEmpty, "a MIN refresh must recompute the touched group")
    assert(opened.forall(p => g3Files.exists(p.endsWith)),
      s"recompute read files outside the touched group's bounds: $opened")
    // correctness of the hybrid state
    assert(LakeTable.read(spark, tgt).select("grp", "qmin")
      .as[(String, Long)].collect().toMap ==
      LakeTable.read(spark, src).groupBy("grp").agg(min("qty"))
        .as[(String, Long)].collect().toMap)
  }

  test("a delta refresh reads the feed, never the source table (counting FS proof)") {
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val work = java.nio.file.Files.createTempDirectory("incr_cost").toString
    val src = s"cfs:$work/src"
    val tgt = s"cfs:$work/tgt"
    val measures = Map("qty" -> col("qty"))
    // source with many data files: a recompute would have to open them
    LakeTable.overwrite(spark, src,
      (1L to 80L).map(i => (i, s"g${i % 4}", i)).toDF("id", "grp", "qty")
        .repartition(8))
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)

    // append delta: the only source DATA files opened are the appended ones
    LakeTable.append(spark, src, Seq((81L, "g1", 5L)).toDF("id", "grp", "qty"))
    val appended = LakeTable.latestSnapshot(spark, src).get.files
      .map(_.path).toSet -- LakeTable.snapshotAt(spark, src, 1L).filePaths.toSet
    CountingFileSystem.reset()
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    val openedAfterAppend = CountingFileSystem.openedUnder("/src/data/")
      .filterNot(_.endsWith(".crc"))
    assert(openedAfterAppend.nonEmpty &&
      openedAfterAppend.forall(p => appended.exists(p.endsWith)),
      s"append refresh opened non-delta source files: $openedAfterAppend")

    // CoW-delete delta: the refresh reads the RECORDED change files only
    // — zero source data files, on a 9-file source
    LakeTable.delete(spark, src, col("id") === 3L)
    CountingFileSystem.reset()
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    val openedData = CountingFileSystem.openedUnder("/src/data/")
    assert(openedData.isEmpty,
      s"delete refresh re-read source data files: $openedData")
    assert(CountingFileSystem.openedUnder("/src/_change_data/").nonEmpty,
      "the delete's recorded change files are the expected read")
    // and the result is still right
    assert(LakeTable.read(spark, tgt).select("grp", "qty")
      .as[(String, Long)].collect().toMap ==
      LakeTable.read(spark, src).groupBy("grp").agg(sum("qty"))
        .as[(String, Long)].collect().toMap)
  }

  test("racing refreshes fold the delta exactly once (atomic watermark under a real race)") {
    val src = tmpTable("incr_race_src")
    val tgt = tmpTable("incr_race_tgt")
    val measures = Map("qty" -> col("qty"))
    LakeTable.overwrite(spark, src,
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "grp", "qty"))
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    LakeTable.append(spark, src, Seq((3L, "a", 5L)).toDF("id", "grp", "qty"))

    val start = new java.util.concurrent.CountDownLatch(1)
    val errors = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val threads = (1 to 2).map { i =>
      new Thread(() => {
        start.await()
        try Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
        catch {
          // a loser aborting loudly is acceptable; folding twice is not
          case e: LakeTable.ConcurrentCommitException => errors.add(e.getMessage); ()
        }
      })
    }
    threads.foreach(_.start()); start.countDown(); threads.foreach(_.join())

    // whoever lost (if anyone) retries and must see the watermark no-op
    Incremental.refreshAgg(spark, src, tgt, Seq("grp"), measures)
    assert(Incremental.refreshedThrough(spark, src, tgt).contains(2L))
    // the +5 delta applied EXACTLY once
    assert(LakeTable.read(spark, tgt)
      .select("grp", "qty").as[(String, Long)].collect().toMap ==
      Map("a" -> 15L, "b" -> 20L))
  }

  test("null group keys and colliding measure names are refused loudly") {
    val src = tmpTable("incr_guard_src")
    val tgt = tmpTable("incr_guard_tgt")
    LakeTable.overwrite(spark, src,
      Seq((1L, Some("a"), 2L), (2L, None: Option[String], 3L))
        .toDF("id", "grp", "qty"))
    val e = intercept[IllegalArgumentException] {
      Incremental.refreshAgg(spark, src, tgt, Seq("grp"), Map("qty" -> col("qty")))
    }
    assert(e.getMessage.contains("null"))
    assert(intercept[IllegalArgumentException] {
      Incremental.refreshAgg(spark, src, tgt, Seq("grp"), Map("grp" -> col("qty")))
    }.getMessage.contains("collide"))
  }

  test("refreshQuantiles: merged GK estimates sit inside the exact [q-eps, q+eps] envelope; replay no-op; deletes refuse") {
    val src = tmpTable("gk_src")
    val tgt = tmpTable("gk_tgt")
    val eps = 0.01
    val ev = Tables.events(spark, sf).select("event_id", "event_type", "value")
    LakeTable.overwrite(spark, src, ev.filter($"event_id" % 2 === 0))
    Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value", eps)
    LakeTable.append(spark, src, ev.filter($"event_id" % 2 =!= 0))
    val v2 = Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value", eps)

    val qs = Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
    val est = Incremental.quantileEstimate(spark, tgt, Seq("event_type"), qs)
    // GK guarantee: rank error <= eps*n per summary, and MERGING adds
    // error budgets (two batch partials + query slack) — test the
    // conservative envelope at q +- 3*eps, clamped to [0, 1]
    def lo(q: Double) = math.max(0.0, q - 3 * eps)
    def hi(q: Double) = math.min(1.0, q + 3 * eps)
    val envelope = ev.groupBy($"event_type").agg(
      count(lit(1)).as("exact_n"),
      expr(s"percentile(value, ${lo(0.5)})").as("p50_lo"),
      expr(s"percentile(value, ${hi(0.5)})").as("p50_hi"),
      expr(s"percentile(value, ${lo(0.9)})").as("p90_lo"),
      expr(s"percentile(value, ${hi(0.9)})").as("p90_hi"),
      expr(s"percentile(value, ${lo(0.99)})").as("p99_lo"),
      expr(s"percentile(value, ${hi(0.99)})").as("p99_hi"))
    val joined = est.join(envelope, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      qs.foreach { case (name, _) =>
        val v = r.getAs[Double](name)
        val (lo, hi) = (r.getAs[Double](s"${name}_lo"), r.getAs[Double](s"${name}_hi"))
        assert(v >= lo && v <= hi,
          s"${r.getString(0)}.$name estimate $v outside exact envelope [$lo, $hi]")
      }
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("exact_n"))
    }
    // replay no-op; deletes refuse
    val rows = LakeTable.read(spark, tgt).count()
    assert(Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value", eps) == v2)
    assert(LakeTable.read(spark, tgt).count() == rows)
    LakeTable.delete(spark, src, $"event_id" === 0L)
    assert(intercept[IllegalArgumentException] {
      Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value", eps)
    }.getMessage.contains("insert-only"))
  }

  test("refreshHeavyHitters: incremental top-k equals exact on this corpus, never under-counts, replay no-op") {
    val src = tmpTable("hh_src")
    val tgt = tmpTable("hh_tgt")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val terms = graft.functions.TextFns.tokens(lower($"text"))
    LakeTable.overwrite(spark, src, docs.filter($"doc_id" % 2 === 0))
    Incremental.refreshHeavyHitters(spark, src, tgt, terms)
    LakeTable.append(spark, src, docs.filter($"doc_id" % 2 =!= 0))
    val v2 = Incremental.refreshHeavyHitters(spark, src, tgt, terms)

    val exact = docs.select(explode(terms).as("term"))
      .filter($"term" =!= "")
      .groupBy("term").agg(count(lit(1)).as("n"))
    val totalN = exact.agg(sum($"n")).head().getLong(0)
    val exactTop = exact.orderBy($"n".desc, $"term").limit(20)
      .select("term").as[String].collect().toSeq

    val hh = Incremental.heavyHitters(spark, tgt, k = 20)
    val got = hh.collect().map(r => r.getString(0) -> r.getLong(1))
    // identical top-k set AND order on this corpus (eps·N slack is far
    // below the gaps between top terms)
    assert(got.map(_._1).toSeq == exactTop,
      s"got ${got.map(_._1).toSeq}\nexact $exactTop")
    // CMS property: estimates never under-count, over-count <= eps·N
    val truth = exact.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { case (term, est) =>
      val t = truth(term)
      assert(est >= t, s"$term under-counted: $est < $t")
      assert(est - t <= math.ceil(1e-4 * totalN).toLong + 1, s"$term over by ${est - t}")
    }
    // the exact-counts read (the gate's output): top-k terms, counts,
    // and ranks all EQUAL the brute-force exact top-k — candidate
    // capping loses nothing here because every top-20 term sits in
    // both batches' top-100
    val exactTop20 = exact.orderBy($"n".desc, $"term").limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val gotExact = Incremental.heavyHittersExact(spark, tgt, k = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(gotExact.map(t => (t._1, t._2)) == exactTop20,
      s"exact read drifted:\n$gotExact\nvs\n$exactTop20")
    assert(gotExact.map(_._3) == (1L to gotExact.size).toSeq)
    // replay no-op
    val rows = LakeTable.read(spark, tgt).count()
    assert(Incremental.refreshHeavyHitters(spark, src, tgt, terms) == v2)
    assert(LakeTable.read(spark, tgt).count() == rows)
    // a deleting source refuses
    LakeTable.delete(spark, src, $"doc_id" === 0L)
    assert(intercept[IllegalArgumentException] {
      Incremental.refreshHeavyHitters(spark, src, tgt, terms)
    }.getMessage.contains("insert-only"))
  }

  test("refreshSketch: merged partials equal the one-shot sketch, bounded vs exact; replay no-op; deletes refuse") {
    val src = tmpTable("sk_src")
    val tgt = tmpTable("sk_tgt")
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "event_type")
    LakeTable.overwrite(spark, src, ev.filter($"event_id" % 2 === 0))
    Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id")
    LakeTable.append(spark, src, ev.filter($"event_id" % 2 =!= 0))
    val v2 = Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id")
    val est = Incremental.sketchEstimate(spark, tgt, Seq("event_type"), "approx_users")
    // union associativity: two merged partials == one sketch over all
    val oneShot = ev.groupBy($"event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("one_shot"),
        countDistinct($"user_id").as("exact"),
        count(lit(1)).as("exact_rows"))
    val joined = est.join(oneShot, "event_type").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (approx, one, exact) =
        (r.getAs[Long]("approx_users"), r.getAs[Long]("one_shot"), r.getAs[Long]("exact"))
      assert(approx == one, s"merge broke associativity: $approx vs $one")
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"estimate $approx off exact $exact by >5%")
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("exact_rows"))
      assert(r.getAs[Long]("n_partials") == 2L)
    }
    // replay: already at the watermark — appends nothing
    val rows = LakeTable.read(spark, tgt).count()
    assert(Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id") == v2)
    assert(LakeTable.read(spark, tgt).count() == rows)
    // a deleting source refuses loudly (sketches are insert-only)
    LakeTable.delete(spark, src, $"event_id" === 0L)
    val e = intercept[IllegalArgumentException] {
      Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id")
    }
    assert(e.getMessage.contains("insert-only"))
  }
}
