package graft

import org.apache.spark.sql.functions._
import graft.operators._

class RelationalSpec extends SparkSpec {
  test("q1 aggregates every (returnflag, linestatus) group once") {
    val df = Relational.q1PricingSummary(spark, sf).cache()
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    assert(df.count() ==
      li.select(col("l_returnflag"), col("l_linestatus")).distinct().count())
    val totalRows = df.agg(sum("count_order")).head.getLong(0)
    assert(totalRows == li.count())
  }

  test("topn keeps at most 3 rows per group, ranked by price") {
    val df = Relational.topnPerGroup(spark, sf).cache()
    val perGroup = df.groupBy("o_orderpriority").count().collect()
    assert(perGroup.forall(_.getLong(1) <= 3))
    assert(df.filter(col("rn") > 3).count() == 0)
  }

  test("rollup includes a grand-total row equal to table count") {
    val df = Relational.rollupSales(spark, sf)
    val grand = df.filter(col("g_flag") === 1 && col("g_status") === 1).collect()
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.lineitem(spark, sf).count())
  }
}

class EventsSpec extends SparkSpec {
  test("asof join matches every purchase to the latest prior view") {
    val df = Events.asofJoin(spark, sf).cache()
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase")
    assert(df.count() == purchases.count())
    assert(df.filter(col("view_ts_ms") > col("purchase_ts_ms")).count() == 0)
    assert(df.filter(col("gap_ms") < 0).count() == 0)
  }

  test("sessions are disjoint and cover all events") {
    val df = Events.sessionize(spark, sf).cache()
    val totalEvents = df.agg(sum("n_events")).head.getLong(0)
    assert(totalEvents == Tables.events(spark, sf).count())
    assert(df.filter(col("session_end_ms") < col("session_start_ms")).count() == 0)
  }

  test("range join: binned equi-join equals the naive inequality join, no BNLJ") {
    val df = Events.rangeJoin(spark, sf)
    val got = df.collect().map(_.toSeq).toSet
    // the binned plan is a shuffled equi-join — a broadcast nested
    // loop here would be the O(n·m)-per-user plan the binning avoids.
    // Executed first so AQE's final plan is what we inspect.
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"BNLJ in plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), // equi-keys extracted either way
      s"no equi-join in plan:\n$plan")
    // exact equality with the naive formulation (small SF only)
    val ev = Tables.events(spark, sf)
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_millis(col("ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_event_id"), col("user_id"),
        unix_millis(col("ts")).as("purchase_ts_ms"))
    val naive = p.join(v,
        col("user_id") === col("v_user") &&
          col("v_ts") >= col("purchase_ts_ms") - 3600000L &&
          col("v_ts") <= col("purchase_ts_ms"), "left")
      .groupBy("purchase_event_id", "user_id", "purchase_ts_ms")
      .agg(count(col("v_ts")).as("views_in_window"),
        min(col("purchase_ts_ms") - col("v_ts")).as("nearest_gap_ms"))
      .collect().map(_.toSeq).toSet
    assert(got == naive)
    // every purchase appears exactly once (zero-view purchases kept)
    assert(got.size ==
      ev.filter(col("event_type") === "purchase").count())
  }
}

class ApproxSpec extends SparkSpec {
  test("approx stats track exact stats within sketch error bounds") {
    val exact = graft.operators.Events.eventsStats(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("distinct_users"), r.getAs[Double]("median_value"))).toMap
    graft.operators.Events.eventsApprox(spark, sf).collect().foreach { r =>
      val (users, median) = exact(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Long]("approx_users") - users) <= users * 0.1 + 1)
      assert(math.abs(r.getAs[Double]("approx_median") - median) <= math.abs(median) * 0.2 + 1)
    }
  }
}

class DedupSpec extends SparkSpec {
  test("minhash propose/decide equals brute-force exact jaccard pairs") {
    // ground truth: ALL pairs at exact 3-shingle Jaccard >= 0.5,
    // corpus-wide (the DuckDB oracle's definition), brute-forced here
    val sh = graft.Tables.documents(spark, sf)
      .withColumn("w", graft.functions.TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", graft.functions.TextFns.shingleExpr("w", 3))
      .select(col("doc_id"), col("sh"))
    val exact = sh.as("a").crossJoin(sh.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("j", graft.functions.TextFns.jaccard(col("a.sh"), col("b.sh")))
      .filter(col("j") >= 0.5)
      .select(col("a.doc_id"), col("b.doc_id"), round(col("j"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val mh = Dedup.dedupMinhash(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("jaccard"))).toSet
    assert(exact.nonEmpty)
    assert(mh == exact,
      s"missing=${exact.diff(mh).take(5)} extra=${mh.diff(exact).take(5)}")
  }

  test("minhash finds the high-jaccard pairs ngram_jaccard finds") {
    val exact = Dedup.ngramJaccard(spark, sf, threshold = 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = Dedup.dedupMinhash(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.subsetOf(mh), s"missing ${exact.diff(mh)}")
  }

  test("simhash pairs are within the hamming bound") {
    val df = Dedup.dedupSimhash(spark, sf).cache()
    assert(df.filter(col("hamming") > 3).count() == 0)
    assert(df.count() > 0)
  }

  test("repeated dedup/similarity calls do not accumulate cached plans") {
    def cachedCount = spark.sparkContext.getPersistentRDDs.size
    def runAll(): Unit = {
      Dedup.ngramJaccard(spark, sf).count()
      Dedup.dedupMinhash(spark, sf).count()
      Dedup.dedupSimhash(spark, sf).count()
      Dedup.dedupClusters(spark, sf).count()
      Similarity.annLsh(spark, sf).count()
      Similarity.neardupCosine(spark, sf).count()
      // annIvf persists four frames per call (corpus, assignment,
      // query-cells, phase-1) — each must retire its predecessor
      Similarity.annIvf(spark, sf).count()
    }
    runAll()
    val after1 = cachedCount
    (1 to 2).foreach(_ => runAll())
    // each call retires its predecessor's caches (keeping only
    // canonically-identical entries, which the new plan reuses):
    // bounded at one outstanding set per operator, not one per
    // invocation — including the RDD-backed connected-components
    // labels and the collapse-group frames
    assert(cachedCount <= after1,
      s"cached RDD count grew across repeated calls: $after1 -> $cachedCount")
  }

  test("connected components: chains, cliques and singletons label to the min id") {
    import spark.implicits._
    // component {1,2,3,4} as a chain, {10,11,12} as a clique, 20 and 21
    // as an isolated edge, 30 as a singleton vertex
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val vertices = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val got = Dedup.connectedComponents(vertices, edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L, 30L -> 30L))
  }

  test("dedup_clusters matches a brute-force transitive closure of the edge set") {
    import spark.implicits._
    val edges = Dedup.ngramJaccard(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val vertices = Tables.documents(spark, sf).select("doc_id").as[Long].collect()
    // driver-side union-find over the small-SF edges
    val parent = scala.collection.mutable.Map(vertices.map(v => v -> v): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = vertices.map(v => (v, find(v))).toMap
    val got = Dedup.dedupClusters(spark, sf)
      .select("doc_id", "rep_id").as[(Long, Long)].collect().toMap
    assert(got == want)
    // sizes agree with the label multiplicity and sum to the corpus
    val sizes = Dedup.dedupClusters(spark, sf)
      .select("rep_id", "cluster_size").distinct()
      .as[(Long, Long)].collect().toMap
    val wantSizes = want.values.groupBy(identity).map { case (r, vs) => r -> vs.size.toLong }
    assert(sizes == wantSizes)
  }

  test("exact dedup partitions the corpus") {
    val df = Dedup.dedupExact(spark, sf)
    assert(df.agg(sum("n_copies")).head.getLong(0) ==
      Tables.documents(spark, sf).count())
  }

  test("decontaminate covers the corpus and flags exactly the overlapping docs") {
    val benchmarkMax = 25L
    val df = TextAnalysis.decontaminate(spark, sf, benchmarkMax).cache()
    val docs = Tables.documents(spark, sf)
    // one row per corpus doc, none for benchmark docs
    assert(df.count() == docs.filter(col("doc_id") >= benchmarkMax).count())
    assert(df.filter(col("doc_id") < benchmarkMax).count() == 0)
    assert(df.filter(col("n_shared") > col("n_shingles")).count() == 0)
    assert(df.filter(col("contaminated") =!= (col("n_shared") > 0)).count() == 0)
    // cross-check against a brute-force shingle intersection
    val sh = docs
      .withColumn("w", graft.functions.TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 5)
      .withColumn("sh", graft.functions.TextFns.shingleExpr("w", 5))
    val benchSet = sh.filter(col("doc_id") < benchmarkMax)
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val expected = sh.filter(col("doc_id") >= benchmarkMax)
      .select(col("doc_id"), col("sh"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[String](1).count(benchSet.contains).toLong)
      .toMap
    df.filter(col("n_shingles") > 0).collect().foreach { r =>
      assert(r.getAs[Long]("n_shared") == expected(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("rep_ngrams measures within-doc 3-gram repetition; planted dups score high") {
    val df = TextAnalysis.repNgrams(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("n_distinct") > col("n_grams")).count() == 0)
    assert(df.filter(col("dup_ratio") < 0 || col("dup_ratio") > 1).count() == 0)
    // a doc that is one phrase repeated should dominate the ranking
    val repeated = Seq((9999L, ("lorem ipsum dolor " * 20).trim))
    import spark.implicits._
    val synth = repeated.toDF("doc_id", "text")
      .withColumn("w", graft.functions.TextFns.tokens(col("text")))
      .withColumn("g", graft.functions.TextFns.shingleAllExpr("w", 3))
      .select((lit(1.0) - size(array_distinct(col("g"))).cast("double") /
        size(col("g")).cast("double")).as("r"))
    assert(synth.head.getDouble(0) > 0.9)
  }

  test("char_entropy: zero for constant text, log2(n) for distinct chars, bounded for corpus") {
    import spark.implicits._
    graft.functions.Sketches.register(spark)
    val synth = Seq(("aaaaaaaa", 0.0), ("abcd", 2.0), ("abcdefgh", 3.0))
      .toDF("text", "expected")
      .withColumn("h", expr("char_entropy(text)"))
    synth.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("h") - r.getAs[Double]("expected")) < 1e-12,
        r.getAs[String]("text"))
    }
    val corpus = TextAnalysis.charEntropy(spark, sf)
    assert(corpus.filter(col("entropy") < 0).count() == 0)
    assert(corpus.filter(col("entropy") > 8).count() == 0) // log2(charset) bound
  }

  test("top_terms ranks the vocabulary deterministically") {
    val df = TextAnalysis.topTerms(spark, sf).collect()
    assert(df.length == 20)
    assert(df.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val ns = df.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse, "counts must be non-increasing")
    assert(df.map(_.getAs[String]("term")).distinct.length == 20)
  }

  test("seq_pack streams each shard into contiguous fixed-budget packs") {
    val budget = 2048L
    val df = TextAnalysis.seqPack(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count(),
      "every document is assigned to exactly one pack")
    // offsets live inside the budget; ids/offsets are non-negative
    assert(df.filter(col("pack_offset") < 0 || col("pack_offset") >= budget ||
      col("pack_id") < 0).count() == 0)
    // the assignment is exactly the exclusive running-token offset:
    // recompute it independently with a window and compare
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val check = df
      .withColumn("start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("pack_id") =!= floor(col("start") / budget) ||
        col("pack_offset") =!= col("start") % budget)
    assert(check.count() == 0, "pack assignment must equal the running offset")
    // packs are contiguous per shard: ids are dense from 0
    import spark.implicits._
    df.groupBy("source").agg(max("pack_id").as("mx"),
        countDistinct("pack_id").as("nd"))
      .as[(String, Long, Long)].collect().foreach { case (src, mx, nd) =>
        assert(nd == mx + 1, s"shard $src has pack-id holes")
      }
  }

  test("dup_spans matches an independent sliding-window recompute") {
    import spark.implicits._
    val k = 20
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.toSeq.flatMap { case (id, t) =>
      val w = t.trim.split("\\s+")
      if (w.length >= k) w.sliding(k).map(win => (md5hex(win.mkString(" ")), id))
      else Iterator.empty
    }.groupBy(_._1).collect { case (h, occ) if occ.map(_._2).distinct.size > 1 =>
      h -> ((occ.size.toLong, occ.map(_._2).distinct.size.toLong, occ.map(_._2).min))
    }
    val got = TextAnalysis.dupSpans(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected, s"got ${got.size} spans, expected ${expected.size}")
    assert(expected.nonEmpty, "corpus should contain cross-document repeated spans")
  }

  test("bm25_topk ranks by the textbook formula against an independent recompute") {
    import spark.implicits._
    val got = TextAnalysis.bm25Topk(spark, sf).cache()
    // structure: <= 5 query terms (length >= 4), ranks contiguous from 1,
    // scores non-increasing within each term
    val byTerm = got.select("term", "rank", "score").as[(String, Long, Double)]
      .collect().groupBy(_._1)
    assert(byTerm.nonEmpty && byTerm.size <= 5)
    byTerm.foreach { case (term, rows) =>
      assert(term.length >= 4)
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).sortBy(-_).toSeq,
        s"scores not non-increasing for $term")
    }
    // independent scalar recompute of one (term, doc) score from raw text
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .as[(Long, Seq[String])].collect().map { case (id, w) => id -> w.filter(_.nonEmpty) }
    val nd = docs.length.toDouble
    val avgdl = docs.map(_._2.length.toLong).sum.toDouble / nd
    val (term, rows0) = byTerm.head
    val df = docs.count(_._2.contains(term)).toDouble
    val idf = math.log(1.0 + (nd - df + 0.5) / (df + 0.5))
    rows0.sortBy(_._2).take(3).foreach { case (_, _, score) =>
      val expectedTop = docs.collect { case (id, w) if w.contains(term) =>
        val tf = w.count(_ == term).toDouble
        val dl = w.length.toDouble
        (id, idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)))
      }
      assert(expectedTop.exists(e => math.abs(e._2 - score) < 1e-4),
        s"no doc's recomputed score matches reported $score for $term")
    }
    got.unpersist()
  }

  test("stratified sample decides row-locally from key hash and stratum rate") {
    val df = TextAnalysis.stratifiedSample(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("bucket") < 0 || col("bucket") >= 100).count() == 0)
    assert(df.filter(col("sampled") =!= (col("bucket") < col("rate_pct"))).count() == 0)
    // all four stratum rates occur, and no stratum is emptied outright
    assert(df.select("rate_pct").distinct().count() == 4)
    val worst = df.groupBy("source", "rate_pct")
      .agg(sum(when(col("sampled"), 1).otherwise(0)).as("kept"), count(lit(1)).as("n"))
      .filter(col("rate_pct") >= 50 && col("kept") === 0).count()
    assert(worst == 0, "a >=50% stratum kept zero rows")
  }
}

class SimilaritySpec extends SparkSpec {
  test("semantic_dedup clusters are closed over the cosine edge set") {
    import spark.implicits._
    val clusters = Similarity.semanticDedup(spark, sf).cache()
    val rep = clusters.select("vec_id", "rep_id").as[(Long, Long)].collect().toMap
    // total cover: every embedding labeled exactly once
    assert(rep.size == Tables.embeddings(spark, sf).count())
    // every near-dup edge's endpoints land in the same component
    val edges = Similarity.neardupCosine(spark, sf)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(edges.nonEmpty)
    edges.foreach { case (a, b) =>
      assert(rep(a) == rep(b), s"edge ($a,$b) split across clusters")
    }
    // representative = min member of its component; sizes consistent
    val members = rep.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
    members.foreach { case (r, m) => assert(m.min == r, s"rep $r is not min of $m") }
    val sizes = clusters.select("rep_id", "cluster_size").as[(Long, Long)]
      .collect().toMap
    members.foreach { case (r, m) => assert(sizes(r) == m.size.toLong) }
    // it actually merged something (the corpus plants near-dup vectors)
    assert(members.exists(_._2.size > 1))
    clusters.unpersist()
  }

  test("ann_topk returns k ranked neighbors per query") {
    val df = Similarity.annTopk(spark, sf).cache()
    assert(df.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
    assert(df.filter(col("cosine") > 1.0001 || col("cosine") < -1.0001).count() == 0)
  }

  test("ann_ivf bound-probed search equals brute force row for row") {
    // a narrow phase 1 (2 of 16 cells) forces phase 2 to do the work:
    // the angular bound must pull in every cell that can still beat the
    // provisional k-th cosine, or this equality breaks
    val ivf = Similarity.annIvf(spark, sf, probes = 2).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    assert(exact.nonEmpty)
    assert(ivf == exact,
      s"missing=${exact.diff(ivf).take(5)} extra=${ivf.diff(exact).take(5)}")
  }

  test("persisted IVF index: probes read only the probed cells' partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.buildIvfIndex(spark, sf, tmp, cells = 8)
    val corpus = lake.LakeTable.read(spark, s"$tmp/corpus")
    val allCells = corpus.select("cell").distinct().collect().map(_.getInt(0)).sorted
    assert(allCells.length > 2)
    // a cell filter on the lake table prunes at the file-index level
    // (filter-only plan: aggregates would wrap the scan in AQE)
    val probed = corpus.filter(col("cell").isin(allCells.take(2).map(Integer.valueOf): _*))
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.selectedPartitions.partitionCount <= 2,
      s"read ${scan.selectedPartitions.partitionCount} of ${allCells.length} cells")
    // the indexed probe itself: k ranked neighbors per query, cells from
    // the probed set only, useful recall vs brute force
    val res = Similarity.annIvfIndexed(spark, sf, tmp, numQueries = 10, k = 5).cache()
    assert(res.groupBy("q_id").count().filter(col("count") =!= 5).count() == 0)
    val exact = Similarity.annTopk(spark, sf)
      .select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = res.select("q_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(s"indexed IVF recall@5 vs brute force: $recall")
    assert(recall > 0.0)
  }

  test("persisted IVF-PQ: probe opens only the probed/surviving cells' files, stays exact") {
    import spark.implicits._
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val d0 = java.nio.file.Files.createTempDirectory("ivfpq_skip").toString
    val d = s"cfs:$d0"
    // 4 orthogonal 8-dim clusters (scale-jittered along one axis each:
    // within-cluster cosine exactly 1, cross-cluster exactly 0), ids
    // laid out so queries 0-1 sit in cluster 0
    val rows = for (c <- 0 until 4; j <- 0 until 8) yield {
      val v = Array.fill(8)(0.0f)
      v(c * 2) = 1.0f + 0.01f * j
      ((c * 8 + j).toLong, v.toList, c)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val idx = s"$d/ivfpq"
    operators.Similarity.buildIvfPqIndex(spark, d, idx,
      cells = 4, subspaces = 4, codebookSize = 4)
    val corpus = lake.LakeTable.read(spark, s"$idx/corpus")
    val cluster0Cells = corpus.filter(col("vec_id") < 8)
      .select("cell").distinct().collect().map(_.getInt(0)).toSet
    val allCells = corpus.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(allCells.size > cluster0Cells.size, "need prunable foreign cells")

    CountingFileSystem.reset()
    val got = operators.Similarity.annIvfPqIndexed(spark, d, idx,
      numQueries = 2, k = 3, probes = 1).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    val opened = CountingFileSystem.openedUnder(s"$d0/ivfpq/corpus/data/")
      .filter(_.endsWith(".parquet")).distinct
    assert(opened.nonEmpty, "probe must read the index")
    // phase 1 probes the queries' own cell; every orthogonal cell's
    // angular bound sits at ~cos(90°) << τ=1, so phase 2 prunes them —
    // the scan opens NO file outside cluster 0's cells
    assert(opened.forall(p => cluster0Cells.exists(c => p.contains(s"cell=$c"))),
      s"probe opened foreign-cell files: $opened")
    // and the pruned probe is still EXACT
    val exact = operators.Similarity.annTopk(spark, d, numQueries = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Long]("rank"))).toSet
    assert(got == exact,
      s"missing=${exact.diff(got).take(5)} extra=${got.diff(exact).take(5)}")
  }

  test("ivfAppend: delta-only maintenance — append-only commit, exact merged corpus") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf_incr").toString
    val idx = s"$tmp/ivf"
    Similarity.buildIvfIndex(spark, sf, idx, cells = 8,
      only = Some(col("vec_id") % 2 === 0))
    val before = lake.LakeTable.latestSnapshot(spark, s"$idx/corpus").get
    val v = Similarity.ivfAppend(spark, idx,
      Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1))
    val after = lake.LakeTable.latestSnapshot(spark, s"$idx/corpus").get
    // append-only: the delta cost O(new vectors) — every pre-append
    // file is carried by reference, none rewritten
    assert(after.version == v && after.operation == "APPEND")
    assert(before.filePaths.toSet.subsetOf(after.filePaths.toSet))
    assert(after.filePaths.size > before.filePaths.size)
    // merged corpus covers the whole embeddings table, each vector once
    val corpus = lake.LakeTable.read(spark, s"$idx/corpus")
    val n = Tables.embeddings(spark, sf).count()
    assert(corpus.count() == n)
    assert(corpus.select("vec_id").distinct().count() == n)
    // cell partitioning survives the append: an equality probe on the
    // merged corpus still prunes to the probed cells' partitions
    val cells = corpus.select("cell").distinct().collect().map(_.getInt(0)).sorted
    val probed = corpus.filter(col("cell").isin(cells.take(2).map(Integer.valueOf): _*))
    val scan = probed.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.selectedPartitions.partitionCount <= 2)
    // probing EVERY cell of the incrementally-built index is exactly
    // brute-force top-k — the ann_ivf_incr oracle identity
    val got = Similarity.annIvfIndexed(spark, sf, idx, numQueries = 10, k = 5,
        probes = 8)
      .select("q_id", "neighbor_id", "cosine", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val exact = Similarity.annTopk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == exact)
  }

  test("persisted LSH index: probe pushdown skips bucket files; append merges") {
    val tmp = java.nio.file.Files.createTempDirectory("lsh_idx").toString
    val idx = s"$tmp/lsh"
    // build on the even half, append the odd half (the annLshIncr flow),
    // tiny target files so each (t, sig) range spans several files
    Similarity.buildLshIndex(spark, sf, idx,
      only = Some(col("vec_id") % 2 === 0), targetFileBytes = 512)
    val before = lake.LakeTable.latestSnapshot(spark, s"$idx/buckets").get
    Similarity.lshAppend(spark, idx,
      Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 1))
    val after = lake.LakeTable.latestSnapshot(spark, s"$idx/buckets").get
    // append-only maintenance: every pre-append bucket file carries over
    assert(before.filePaths.toSet.subsetOf(after.filePaths.toSet))
    val n = Tables.embeddings(spark, sf).count()
    assert(lake.LakeTable.read(spark, s"$idx/vecs").count() == n)
    // the documented clustered-tail compact, with a tiny file target so
    // each (t, sig) range spans several files (100 TB geometry, shrunk)
    lake.LakeTable.compact(spark, s"$idx/buckets",
      smallFileBytes = Long.MaxValue, sortBy = Seq("t", "sig"),
      targetFileBytes = 64)
    val clustered = lake.LakeTable.latestSnapshot(spark, s"$idx/buckets").get

    // 2 queries: 48 of the 384 (t, sig) buckets — the skip geometry; a
    // 10-query probe covers ~62% of the keyspace and rightly reads most
    // files (recall for the 10-query shape is gated in RecallSpec)
    val res = Similarity.annLshIndexed(spark, sf, idx, numQueries = 2, k = 5)
    val rows = res.collect()
    assert(rows.nonEmpty && rows.groupBy(_.getLong(0)).forall(_._2.length == 5),
      "each query must return exactly k ranked neighbors")

    // the 100 TB claim: the probe's pushed (t, sig) keys skip most of
    // the range-clustered bucket files (metric read off the executed
    // scan — the buckets scan hides inside the cached candidate plan)
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case _ => Nil
      }
      val below = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => scans(q.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          scans(r.child)
        case m: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          scans(m.relation.cachedPlan)
        case other => other.children.flatMap(scans)
      }
      here ++ below
    }
    val totalFiles = clustered.files.size
    assert(totalFiles >= 12, s"buckets table should span many files, got $totalFiles")
    val bucketsScan = scans(res.queryExecution.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains("buckets")))
      .getOrElse(fail("no buckets file scan in probe plan:\n" +
        res.queryExecution.executedPlan.toString.take(3000)))
    val scanned = bucketsScan.metrics("numFiles").value
    assert(scanned < totalFiles / 2,
      s"pushed bucket keys should skip files: scanned $scanned of $totalFiles")
  }

  test("ann_lsh finds a nonempty, threshold-respecting subset of exact pairs") {
    val lsh = Similarity.annLsh(spark, sf).cache()
    assert(lsh.count() > 0)
    assert(lsh.filter(col("cosine") < 0.35).count() == 0)
    // every LSH pair must appear in the unblocked exact pair set
    val exactAll = Similarity.neardupCosine(spark, sf)
    // neardup_cosine is label-blocked; re-derive unblocked exact pairs
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("sqrt(aggregate(v, 0D, (a, x) -> a + x * x))"))
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    val exact = a.crossJoin(b).filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (a, x) -> a + x)") / (col("na") * col("nb")))
      .filter(col("cos") >= 0.35)
      .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = lsh.select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.subsetOf(exact))
    assert(exactAll.count() >= 0) // label-blocked variant runs
  }
}

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect().map(_.mkString("|")).toSeq.sorted
  }

  test("saltedJoin: identical to plain join, hot key spreads, _salt in join keys") {
    // 90% of rows share one key — the straggler shape
    val big = (0L until 5000L).map(i =>
      (if (i % 10 < 9) 7L else i % 97, s"v$i", i)).toDF("k", "pay", "seq")
    val small = (0L until 97L).map(i => (i, s"dim$i")).toDF("k", "d")
    val salted = graft.functions.Skew.saltedJoin(big, small, Seq("k"), salt = 8)
    assert(rowsOf(salted) == rowsOf(big.join(small, Seq("k"))))
    // the hot key's rows really spread across many salt values
    val spread = big.filter($"k" === 7L)
      .select(pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(8)).as("s"))
      .distinct().count()
    assert(spread >= 6, s"hot key spread over only $spread of 8 salts")
    // and the join itself is keyed on (k, _salt) — visible in the plan
    salted.collect()
    assert(salted.queryExecution.executedPlan.toString.contains("_salt"))
    intercept[IllegalArgumentException] {
      graft.functions.Skew.saltedJoin(big.withColumn("_salt", lit(1L)), small, Seq("k"))
    }
  }

  test("skew_join gate equals the unsalted formulation") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id").cast("long").as("user_id"), col("event_type"), col("value"))
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("long").as("user_id"), col("c_mktsegment"))
    val plain = ev.join(cust, Seq("user_id"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Money.msum(col("value")).as("sum_value"))
    assert(rowsOf(Relational.skewJoin(spark, sf)) == rowsOf(plain))
  }
}

class MultimodalSpec extends SparkSpec {
  test("mm_frames: zero-shuffle explode; per-doc frame counts check out") {
    val df = Multimodal.mmFrames(spark, sf)
    // projection + generate only — frame explosion must not shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"shuffle in plan:\n$plan")
    assert(plan.contains("Generate"), s"no explode in plan:\n$plan")
    val got = df.groupBy("doc_id").count()
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"),
        ceil(length(col("text")) / 256.0).cast("long").as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), ceil(col("nf") / 4.0).cast("long").as("n"))
    assert(got.join(expected, "doc_id")
      .filter(col("count") =!= col("n")).count() == 0)
    // a full frame is 256 chars; only a doc's LAST sampled frame may be
    // shorter
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
    assert(df.withColumn("max_idx", max(col("frame_idx")).over(w))
      .filter(col("frame_len") =!= 256 && col("frame_idx") =!= col("max_idx"))
      .count() == 0)
  }
}

class EntrySpec extends SparkSpec {
  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has an oracle or is a documented rows-only op") {
    // dedup_incr and dedup_minhash left this list in r14 via the
    // propose/decide exact-verify contract (LSH proposes, exact Jaccard
    // decides → all-pairs DuckDB oracle); ann_quant left it via the
    // error-bounded candidate rule (guaranteed superset + exact re-rank
    // → brute-force top-k oracle)
    // ann_ivf left in r14 too: phase-2 bound-probing (triangle
    // inequality vs the centroids) makes IVF exact → ann_topk's oracle
    // dedup_simhash left in r15: md5-keyed signature → the oracle
    // recomputes it, and the 4x16 chunk blocking is provably lossless.
    // incr_topk left in r16: the gate emits the candidates' exact
    // merged batch counts, which DuckDB replays as per-batch top-100 +
    // GROUP BY + rank.
    val rowsOnly = Set("ann_lsh",
      "events_approx", "bpe_train", "bpe_encode",
      "incr_distinct", "incr_quantiles",
      // persisted-LSH probe: approximate by construction; recall gated
      // ≥0.9 in RecallSpec, file-skip counting-proven in SimilaritySpec
      "ann_lsh_idx")
    assert(SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet) == rowsOnly)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
