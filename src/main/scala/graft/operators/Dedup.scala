package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.rnd
import graft.functions.TextFns

/** Deduplication operators for training-data pipelines over the
  * `documents` table: exact, n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale posture: the exact/hash variants are single groupBy shuffles.
  * The pairwise variants never do an unblocked self-join — candidates
  * come from LSH band buckets (minhash), Hamming-chunk buckets
  * (simhash), or content blocks (jaccard), keeping pair counts
  * near-linear at 100 TB.
  */
object Dedup extends org.apache.spark.internal.Logging {

  /** Caches outstanding from the PREVIOUS invocation of each operator.
    * The caches serve reuse WITHIN the returned (lazy) plan, so they
    * cannot be dropped before the caller consumes it — but a
    * long-running session calling an operator repeatedly must not
    * accumulate one cached plan per call. This bounds the liability to
    * one outstanding set per operator, and it retires ONLY entries
    * whose canonical plan differs from the current call's (changed
    * dir/threshold): a same-args re-invocation builds the identical
    * plan, which Spark's CacheManager resolves to the SAME cache entry
    * — unpersisting the old DataFrame would evict the entry the new
    * plan is about to lean on, leaving the current run fully uncached
    * (measured 2x slower than cold). Keeping the matching entry is the
    * operator's materialized-index posture: repeated same-args calls
    * reuse one bounded materialization; nothing grows. A concurrent
    * overlapping call at worst recomputes (correctness unaffected —
    * unpersist only drops the materialization).
    */
  private val liveCaches =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[DataFrame]]()

  private def retirePrevious(op: String, current: Seq[DataFrame]): Unit = {
    val old = liveCaches.put(op, current)
    if (old != null) {
      val keep = current.map(_.queryExecution.analyzed.canonicalized)
      old.foreach { df =>
        try {
          if (!keep.exists(_ == df.queryExecution.analyzed.canonicalized))
            df.unpersist(blocking = false)
        } catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  /** Exact dedup: md5 content hash → group, keep min doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keep_id"))

  /** Exact 3-gram-shingle Jaccard near-dup pairs (lang-blocked).
    *
    * Never materializes the quadratic self-join: candidates come from a
    * prefix-filtered inverted index (PPJoin-style). With each doc's
    * shingles in a global total order — rarest-first by per-lang
    * document frequency — any pair with J >= t must share a shingle
    * within each doc's first (n - ceil(t*n) + 1) shingles, so only the
    * (rare-shingle) prefix postings are joined. A size filter
    * (J >= t ⇒ t·|a| <= |b| <= |a|/t) prunes candidates further before
    * the exact Jaccard verify. Scales as shuffle-on-shingle, not docs².
    */
  def ngramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    graft.functions.Sketches.register(spark)
    // exact-duplicate collapse first (see Similarity.annLsh): identical
    // (lang, text) rows — the lang column blocks pairing, so it is part
    // of the identity — share every shingle and every posting, making
    // the prefix join quadratic in duplicate multiplicity. They mine as
    // one representative and expand afterwards; identical text means
    // identical shingles, so cross pairs carry the rep pair's jaccard
    // verbatim and within-group pairs are exactly 1.
    val members = Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .groupBy(col("lang"), col("text"))
      .agg(min(col("doc_id")).as("rep_id"), collect_list(col("doc_id")).as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = members
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("sh", array_sort(TextFns.shingleExpr("w", 3)))
      .select(col("rep_id").as("doc_id"), col("lang"), col("sh"), size(col("sh")).as("n"))
      // reused three times (doc-freq scan, prefix build, verify joins),
      // but shingle arrays are ~10x the document text: DISK_ONLY keeps
      // the re-read cheap without pinning executor memory at 100 TB
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)

    // rarest-first prefix: global order = (document frequency, shingle)
    val docFreq = d.select(col("lang"), explode(col("sh")).as("s"))
      .groupBy(col("lang"), col("s")).agg(count(lit(1)).as("df"))
    val byRarity = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang"), col("doc_id")).orderBy(col("df"), col("s"))
    val prefix = d.select(col("lang"), col("doc_id"), col("n"), explode(col("sh")).as("s"))
      .join(docFreq, Seq("lang", "s"))
      .withColumn("rk", row_number().over(byRarity))
      .filter(col("rk") <= col("n") - ceil(lit(threshold) * col("n")).cast("int") + 1)
      .select(col("lang"), col("doc_id"), col("n"), col("s"))
      .cache() // joined with itself below; avoid recomputing the rank window twice
    retirePrevious("ngramJaccard", Seq(members, d, prefix))

    // (A PPJoin positional filter was considered here but is unsound
    // without exact common-before-position counts, which a relational
    // reformulation can't see — the size filter + rarest-first prefix
    // carry the pruning instead.)
    val cand = prefix.select(col("lang"), col("s"), col("doc_id").as("doc_a"), col("n").as("na"))
      .join(prefix.select(col("lang"), col("s"), col("doc_id").as("doc_b"), col("n").as("nb")),
        Seq("lang", "s"))
      .filter(col("doc_a") < col("doc_b") &&
        col("nb") >= ceil(lit(threshold) * col("na")) &&
        col("na") >= ceil(lit(threshold) * col("nb")))
      .select(col("doc_a"), col("doc_b"))
      .distinct()

    val repPairs = cand
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", expr("jaccard_sorted(sh_a, sh_b)"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), rnd(col("jaccard"), 6).as("jaccard"))

    val groups = members.select(col("rep_id"), col("ids"))
    val cross = repPairs
      .join(groups.select(col("rep_id").as("doc_a"), col("ids").as("ids_a")), Seq("doc_a"))
      .join(groups.select(col("rep_id").as("doc_b"), col("ids").as("ids_b")), Seq("doc_b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("jaccard"))
    val within = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("doc_a"), col("ib").as("doc_b"), lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  /** doc_id → connected-component representative (min doc_id reachable
    * over `edges`) via iterative min-label propagation — the step that
    * turns PAIR output (quadratic in clique size: a 1000-copy document
    * emits ~500k pairs) into the doc→keeper map a dedup pipeline
    * actually applies. All DataFrame joins, no driver loop over data:
    * each round propagates every vertex's current label across the
    * symmetrized edge set (one join + one min-aggregate, both shuffles
    * bounded by |E|+|V|) and folds it with `least`. Rounds needed =
    * component diameter, which for near-duplicate clusters is tiny
    * (cliques from a shared source have diameter 1-2); `maxIters`
    * bounds pathological chains and convergence is CHECKED (an
    * existence probe of any changed label), with each round's labels
    * persisted and the previous round's released.
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIters: Int = 25): DataFrame = {
    val spark = vertices.sparkSession
    // symmetrize with ONE scan of the (possibly expensive) edge plan —
    // a union of two projections would execute it twice
    val sym = edges
      .select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Each round's labels live as an RDD-BACKED frame, not a cached
    // plan: chaining DataFrames would nest one join deeper per round,
    // and the re-analysis + fresh whole-stage codegen of that
    // ever-deeper tree dominated wall time (measured ~2s/round on a
    // 129k-edge graph whose actual shuffles are milliseconds). The
    // LogicalRDD truncates the lineage to O(1) per round and gives an
    // explicit per-round release handle.
    def toDf(r: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) =
      spark.createDataFrame(r, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("old_rep",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("rep_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val level = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = vertices
      .select(col("doc_id").cast("long"), col("doc_id").cast("long").as("old_rep"),
        col("doc_id").cast("long").as("rep_id"))
      .rdd.persist(level)
    try {
      var i = 0
      var converged = false
      while (!converged && i < maxIters) {
        val labels = toDf(cur).select(col("doc_id"), col("rep_id"))
        val viaNbr = sym
          .join(labels.select(col("doc_id").as("dst"), col("rep_id")), Seq("dst"))
          .groupBy(col("src").as("doc_id")).agg(min(col("rep_id")).as("nbr_rep"))
        // NOTE on pointer jumping (label ← my label's label, path-
        // doubling to O(log d) rounds): tried in r18 and MEASURED
        // SLOWER on the gate corpus (4.6s → 6.3s) — near-duplicate
        // components are cliques/short chains that converge in 2-3
        // rounds anyway, so the extra |V|-scale self-join per round
        // buys nothing here. Worth revisiting only for long-chain
        // graphs.
        val nextRows = labels
          .join(viaNbr, Seq("doc_id"), "left")
          .select(col("doc_id"), col("rep_id").as("old_rep"),
            least(col("rep_id"), coalesce(col("nbr_rep"), col("rep_id"))).as("rep_id"))
          .rdd.persist(level)
        // ONE pass both materializes the round IN FULL (the next
        // round's lineage runs through it, so a partial cache plus an
        // unpersisted parent would cascade recomputation to round 0)
        // and counts changed labels — the old separate count() +
        // changed-probe jobs, fused
        val changed = nextRows.mapPartitions(it =>
          Iterator.single(it.count(r => r.getLong(2) != r.getLong(1)).toLong))
          .fold(0L)(_ + _) > 0L
        cur.unpersist(blocking = false)
        cur = nextRows
        converged = !changed
        i += 1
      }
      logInfo(s"connectedComponents converged after $i rounds " +
        s"(maxIters $maxIters)")
      retireRdd("connectedComponents", cur)
      toDf(cur).select(col("doc_id"), col("rep_id"))
    } finally sym.unpersist(blocking = false)
  }

  /** One outstanding RDD-backed label set from [[connectedComponents]],
    * released when the next call replaces it (the returned frame leans
    * on it until the caller consumes the result).
    */
  private val liveRdds = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]()
  private def retireRdd(op: String,
      current: org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]): Unit = {
    val old = liveRdds.put(op, current)
    if (old != null && (old ne current)) {
      try old.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** Cluster-representative dedup over the EXACT near-duplicate edge
    * set ([[ngramJaccard]] — prefix-filtered, lossless, which is what
    * makes this oracle-checkable end to end; the minhash/simhash
    * candidate generators plug into the same [[connectedComponents]]
    * at 100 TB where exactness is traded for bucket-local candidate
    * cost). Output: every document with its component representative
    * (min doc_id; singletons map to themselves) and the component
    * size — the keep/drop map a training-data pipeline joins against,
    * LINEAR in corpus size where the pair output is quadratic in
    * clique size.
    */
  def dedupClusters(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val vertices = Tables.documents(spark, dir).select(col("doc_id"))
    val edges = ngramJaccard(spark, dir, threshold).select(col("doc_a"), col("doc_b"))
    val labels = connectedComponents(vertices, edges)
    val sizes = labels.groupBy(col("rep_id")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("rep_id"))
      .select(col("doc_id"), col("rep_id"), col("cluster_size"))
  }

  /** MinHash + LSH near-dup detection: 64-permutation signature →
    * 16 bands of 4 → band-bucket join for candidates → exact shingle
    * Jaccard decides. Candidate generation is O(n·bands); only bucket
    * collisions pair up.
    *
    * Propose/decide contract (the [[dedupIncr]] pattern, which is what
    * gives this key a DuckDB oracle): the LSH bands + signature
    * estimate PROPOSE candidate pairs — the signature filter runs 0.15
    * BELOW the exact threshold so the estimate never outvotes the
    * exact cut — and the exact Jaccard over the candidates' shingle
    * sets DECIDES membership. The output is therefore computable from
    * the raw documents alone (all pairs at exact Jaccard ≥ threshold,
    * corpus-wide — ngram_jaccard's cut without its lang blocking), and
    * the oracle replays it as the full all-pairs exact Jaccard. A
    * banding/estimate miss (proposal recall < 1) would hash-mismatch
    * there; RecallSpec pins proposal recall == 1.0 on this corpus and
    * DedupSpec pins set-equality against brute force.
    */
  def dedupMinhash(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val numHashes = 64
    val bands = 16
    val rowsPerBand = numHashes / bands
    graft.functions.Sketches.register(spark)
    // exact-duplicate collapse first (see the twin rationale on
    // Similarity.annLsh): byte-identical texts share every band bucket,
    // so band-join volume is quadratic in duplicate multiplicity unless
    // they mine as ONE representative and expand afterwards. Identical
    // text ⇒ identical signature and shingles, so the expanded pair set
    // (members × members at the rep pair's estimates; within-group
    // pairs at exactly 1.0) is what mining the raw corpus would emit.
    val members = Tables.documents(spark, dir)
      .withColumn("w", TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_id"), collect_list(col("doc_id")).as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val d = members
      .withColumn("w", TextFns.tokens(col("text")))
      .withColumn("sh", TextFns.shingleExpr("w", 3))
      .withColumn("sig", expr(s"minhash_sig(transform(sh, s -> xxhash64(s)), $numHashes)"))
      .select(col("rep_id").as("doc_id"), col("sh"), col("sig"))
      .cache()
    retirePrevious("dedupMinhash", Seq(members, d))

    val banded = d.select(
      col("doc_id"), col("sig"),
      explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> named_struct('band', b, 'bh', hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand))))")).as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))

    // the signature estimate is row-local, so compute + threshold it
    // BEFORE the pair-dedup: the distinct then shuffles only
    // (doc_a, doc_b, est) for pairs that pass — never the two
    // 64-element signature arrays per bucket collision (est is a pure
    // function of the pair, so deduping with it keeps pair granularity)
    val est = banded.as("x").join(banded.as("y"), Seq("band", "bh"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr(s"size(filter(zip_with(x.sig, y.sig, (a, b) -> a = b), v -> v)) / cast($numHashes as double)").as("est_jaccard"))
      .filter(col("est_jaccard") >= math.max(0.0, threshold - 0.15))
      .distinct()

    // exact verify DECIDES: candidate volume is band-local, so the
    // shingle join touches only proposed pairs — never all pairs
    val repPairs = est
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("j_raw", TextFns.jaccard(col("sh_a"), col("sh_b")))
      // cut on the UNROUNDED value (the oracle's WHERE does the same);
      // the rounding is presentation only
      .filter(col("j_raw") >= threshold)
      .select(col("doc_a"), col("doc_b"), rnd(col("j_raw"), 6).as("jaccard"))

    val groups = members.select(col("rep_id"), col("ids"))
    val cross = repPairs
      .join(groups.select(col("rep_id").as("doc_a"), col("ids").as("ids_a")), Seq("doc_a"))
      .join(groups.select(col("rep_id").as("doc_b"), col("ids").as("ids_b")), Seq("doc_b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("jaccard"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("jaccard"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("jaccard"))
    // identical texts have identical shingle sets: exact Jaccard 1.0
    val within = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("doc_a"), col("ib").as("doc_b"),
        lit(1.0).as("jaccard"))
    cross.unionByName(within)
  }

  // ------------------------------------------------- incremental dedup

  private val IdxNumHashes = 64
  private val IdxBands = 16

  /** (doc_id, sig, band, bh) band buckets of a (doc_id, text) frame —
    * the unit both the index build and the probe side compute.
    */
  private def bandBuckets(docs: DataFrame): DataFrame = {
    val rowsPerBand = IdxNumHashes / IdxBands
    docs
      .withColumn("w", TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", TextFns.shingleExpr("w", 3))
      .withColumn("sig",
        expr(s"minhash_sig(transform(sh, s -> xxhash64(s)), $IdxNumHashes)"))
      .select(col("doc_id"), col("sig"),
        explode(expr(
          s"transform(sequence(0, ${IdxBands - 1}), b -> named_struct('band', b, 'bh', hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand))))")).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bh").as("bh"), col("sig"))
  }

  private def bandsTable(dir: String) = s"$dir/bands"
  private def sigsTable(dir: String) = s"$dir/sigs"

  /** Build a PERSISTED MinHash LSH index over `docs` — the artifact
    * that turns dedup from recompute-the-corpus into probe-the-index:
    * a 100 TB corpus is signed ONCE, and each arriving batch mines
    * only against its own band collisions ([[probeMinhashIndex]]).
    *
    * Two lake tables under `indexDir`, sized for scale:
    *  - `bands`: (band, bh, doc_id) — 16 fixed-width 16-byte rows per
    *    document, range-clustered on (band, bh) so the logged per-file
    *    bounds are disjoint in probe-key space and a probe's pushed
    *    bucket predicate skips every file whose bh range holds none of
    *    its buckets;
    *  - `sigs`: (doc_id, sig) — the 64-hash signature stored ONCE per
    *    document (~520 B, a fraction of document text), clustered on
    *    doc_id so the verify step's candidate lookup skips too.
    * (Inlining sig into the band rows would 16x it and make the index
    * OUTWEIGH the corpus.) Incremental growth composes with the
    * existing maintenance surface: [[appendToMinhashIndex]] appends
    * both tables and the clustered-tail `compact` re-clusters only the
    * unclustered tail.
    *
    * Both tables are written RANGE-CLUSTERED AT BIRTH
    * (repartitionByRange + sortWithinPartitions before the initial
    * commit), so the logged per-file bounds are disjoint from the
    * first version — the r16 shape (write unclustered, then two
    * full-table clustering compacts) paid a second full write+move of
    * the entire index inside the one-time build (26.4s of the quiet
    * x100 74.4s gate, VERDICT r16 item 3). Partition counts derive
    * from the corpus size and `targetFileBytes` (the knob the compacts
    * honored), so file geometry stays scale-adaptive, not tuned to
    * local mode.
    */
  def buildMinhashIndex(spark: SparkSession, docs: DataFrame, indexDir: String,
                        targetFileBytes: Long = 128L << 20): Long = {
    graft.functions.Sketches.register(spark)
    val bb = bandBuckets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // one count over the cached buckets sizes both layouts: sigs are
      // ~(8 + 64*8) B/row, bands ~16 B/row raw (parquet encoding only
      // shrinks them — erring high errs toward target-sized files)
      val nDocs = bb.filter(col("band") === 0).count()
      val sigParts = math.max(1L,
        math.ceil(nDocs * 560.0 / targetFileBytes).toLong).toInt
      val bandParts = math.max(1L,
        math.ceil(nDocs.toDouble * IdxBands * 16.0 / targetFileBytes).toLong).toInt
      graft.lake.LakeTable.overwrite(spark, sigsTable(indexDir),
        bb.filter(col("band") === 0).select(col("doc_id"), col("sig"))
          .repartitionByRange(sigParts, col("doc_id"))
          .sortWithinPartitions("doc_id"))
      // disjoint logged (band, bh) bounds are what make probe pushdown
      // skip files — established by the clustered first write itself
      graft.lake.LakeTable.overwrite(spark, bandsTable(indexDir),
        bb.select(col("band"), col("bh"), col("doc_id"))
          .repartitionByRange(bandParts, col("band"), col("bh"))
          .sortWithinPartitions("band", "bh"))
    } finally bb.unpersist(blocking = false)
  }

  /** Append a new batch to the index (the daily-ingest step). The tail
    * stays unclustered until the next clustered-tail compact; probes
    * remain correct throughout (skipping is advisory).
    */
  def appendToMinhashIndex(spark: SparkSession, docs: DataFrame, indexDir: String): Long = {
    graft.functions.Sketches.register(spark)
    val bb = bandBuckets(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      graft.lake.LakeTable.append(spark, sigsTable(indexDir),
        bb.filter(col("band") === 0).select(col("doc_id"), col("sig")))
      graft.lake.LakeTable.append(spark, bandsTable(indexDir),
        bb.select(col("band"), col("bh"), col("doc_id")))
    } finally bb.unpersist(blocking = false)
  }

  /** Probe the persisted index with a new batch: candidate pairs are
    * band-bucket collisions between the batch and the INDEX (never
    * batch x corpus, never corpus x corpus), then the distinct
    * candidates fetch the index side's stored signature and verify
    * row-locally with the signature Jaccard estimate. Returns
    * (doc_id [index side], probe_id [batch side], est_jaccard >=
    * threshold).
    *
    * Scan economics: when the batch's distinct bucket count is bounded
    * (<= `maxPushedKeys`), the probe pushes a per-band IN predicate
    * into the bands scan — against the range-clustered per-file bh
    * bounds this reads only the files whose range intersects the
    * batch's buckets — and the verify step pushes the candidate
    * doc_ids into the sigs scan the same way. A larger batch degrades
    * gracefully to full scans of the two compact index tables joined
    * against the (auto-broadcast) batch — still no corpus re-sign.
    */
  def probeMinhashIndex(spark: SparkSession, newDocs: DataFrame, indexDir: String,
                        threshold: Double = 0.5,
                        maxPushedKeys: Int = 10000): DataFrame = {
    graft.functions.Sketches.register(spark)
    val probe = bandBuckets(newDocs)
      .withColumnRenamed("doc_id", "probe_id")
      .withColumnRenamed("sig", "probe_sig")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    retirePrevious("probeMinhashIndex", Seq(probe))
    // bounded metadata to the driver: DISTINCT buckets, capped — the
    // cap decides the scan strategy, it never truncates candidates
    val buckets = probe.select(col("band"), col("bh")).distinct()
      .limit(maxPushedKeys + 1).collect()
    val bands0 = graft.lake.LakeTable.read(spark, bandsTable(indexDir))
    val bands =
      if (buckets.length > maxPushedKeys) bands0
      else {
        val byBand = buckets.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
        val pred = byBand.map { case (b, rows) =>
          col("band") === b && col("bh").isin(rows.map(_.getInt(1)): _*)
        }.reduceOption(_ || _).getOrElse(lit(false))
        bands0.filter(pred)
      }
    val cand = bands
      .join(probe.select(col("band"), col("bh"), col("probe_id")), Seq("band", "bh"))
      .filter(col("doc_id") =!= col("probe_id"))
      .select(col("doc_id"), col("probe_id"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate doc_ids, capped the same way, push into the sigs scan
    val candIds = cand.select(col("doc_id")).distinct()
      .limit(maxPushedKeys + 1).collect()
    val sigs0 = graft.lake.LakeTable.read(spark, sigsTable(indexDir))
    val sigs =
      if (candIds.length > maxPushedKeys) sigs0
      else if (candIds.isEmpty) sigs0.filter(lit(false))
      else sigs0.filter(col("doc_id").isin(candIds.map(_.getLong(0)): _*))
    retirePrevious("probeMinhashIndexCand", Seq(cand))
    cand
      .join(sigs, Seq("doc_id"))
      // one sig row per probe doc: project band 0 of the cached probe
      // (no distinct shuffle over signature arrays)
      .join(probe.filter(col("band") === 0)
        .select(col("probe_id"), col("probe_sig")), Seq("probe_id"))
      .select(col("doc_id"), col("probe_id"),
        expr(s"size(filter(zip_with(sig, probe_sig, (a, b) -> a = b), v -> v)) / cast($IdxNumHashes as double)").as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  /** The incremental-dedup flow as a gate query: index the first 80% of
    * the corpus (by doc_id) into a throwaway lake table, append the
    * next 10% incrementally, probe the last 10% as the arriving batch.
    *
    * Output: the batch's near-duplicate pairs against the indexed
    * corpus at EXACT 3-shingle Jaccard >= `threshold` — the LSH probe
    * PROPOSES candidates (band collisions against the index, never
    * batch x corpus), the exact verify over the candidates' shingles
    * DECIDES membership. That split keeps the probe cost index-bounded
    * while making the result independently computable from the raw
    * documents, so the DuckDB oracle replays it as the all-crossing-
    * pairs exact Jaccard (the ngram_jaccard pattern) — an engine-
    * independent hash gate on the whole index/append/probe path. The
    * probe's signature filter runs 0.15 BELOW the exact threshold so
    * the estimate proposes marginal pairs instead of outvoting the
    * exact cut (IncrementalDedupSpec pins candidate recall == 1.0 vs
    * brute force on this corpus).
    */
  /** Wall seconds of the last [[dedupIncr]] run's phases — the ops
    * have very different operating cadences (build is one-time,
    * append+probe are the daily mode), so a single gate total cannot
    * attribute a scaled-run slope; this record can. `probeS` covers
    * candidate generation through the pushdown-id materialization;
    * the exact-verify join is lazy (it executes in the consumer's
    * action), so verify_s = consumer total - (build+append+probe).
    */
  final case class IncrPhases(buildS: Double, appendS: Double, probeS: Double)
  @volatile var lastIncrPhases: Option[IncrPhases] = None

  def dedupIncr(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val n = docs.agg(max(col("doc_id"))).head.getLong(0) + 1
    val (c1, c2) = (n * 8 / 10, n * 9 / 10)
    val work = Work.dir("graft_mh_idx")
    val table = s"$work/minhash_index"
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (_, buildS) = timed(
      buildMinhashIndex(spark, docs.filter(col("doc_id") < c1), table))
    val (_, appendS) = timed(
      appendToMinhashIndex(spark, docs.filter(col("doc_id") >= c1 && col("doc_id") < c2), table))
    val (cand, probeS) = timed {
      val c = probeMinhashIndex(spark, docs.filter(col("doc_id") >= c2), table,
          math.max(0.0, threshold - 0.15))
        .select(col("doc_id"), col("probe_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // retire the PREVIOUS run's pair cache BEFORE materializing the
      // new one — back-to-back runs must not hold both peaks at once
      retirePrevious("dedupIncrCand", Seq(c))
      c.count() // materialize: phase boundary, and the pair set is reused twice below
      c
    }
    lastIncrPhases = Some(IncrPhases(buildS, appendS, probeS))
    System.err.println(f"[dedup_incr] phases: build=$buildS%.2fs append=$appendS%.2fs probe=$probeS%.2fs")
    // exact verify: the candidate ids PUSH into the documents scan (file
    // skipping on the logged/footer bounds) while bounded, so only the
    // candidates' texts are shingled — never a corpus re-shingle; an
    // unbounded candidate set degrades to the join (still
    // candidate-bounded after the shuffle)
    val ids = cand.select(explode(array(col("doc_id"), col("probe_id"))).as("id"))
      .distinct().limit(10001).collect().map(_.getLong(0))
    val docsPruned =
      if (ids.length > 10000) docs
      else docs.filter(col("doc_id").isin(ids.toIndexedSeq: _*))
    val sh = docsPruned
      .withColumn("w", TextFns.tokens(col("text")))
      .filter(size(col("w")) >= 3)
      .withColumn("sh", array_sort(TextFns.shingleExpr("w", 3)))
      .select(col("doc_id"), col("sh"))
    cand
      .join(sh.select(col("doc_id"), col("sh").as("sh_a")), Seq("doc_id"))
      .join(sh.select(col("doc_id").as("probe_id"), col("sh").as("sh_b")), Seq("probe_id"))
      .withColumn("jaccard", expr("jaccard_sorted(sh_a, sh_b)"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_id"), col("probe_id"), rnd(col("jaccard"), 6).as("jaccard"))
  }

  /** SimHash near-dup detection: 64-bit signature; candidates share one
    * of four 16-bit chunks (any pair within Hamming distance 3 must
    * collide on at least one chunk — pigeonhole, so the blocking is
    * LOSSLESS, not probabilistic), verified by bit_count(xor) <= 3.
    *
    * Token hashes are md5-derived (`conv(substr(md5(t), 1, 16), 16,
    * -10)`), not xxhash64: md5 is the one hash both engines share, so
    * the signature — and with it the whole decided pair set — is
    * recomputable by the DuckDB oracle from the raw documents. Unlike
    * the minhash flip this needs no recall pin: the chunk blocking is
    * provably exhaustive at the bound, so oracle == operator by
    * construction (RecallSpec still asserts the set equality).
    */
  def dedupSimhash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    graft.functions.Sketches.register(spark)
    // exact-duplicate collapse first (see Similarity.annLsh): identical
    // texts share every chunk bucket and pair at hamming 0, so they
    // mine as one representative and expand afterwards
    val members = Tables.documents(spark, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep_id"), collect_list(col("doc_id")).as("ids"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    retirePrevious("dedupSimhash", Seq(members))
    val d = members
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("simhash", expr(
        "simhash_bits(transform(toks, t -> cast(conv(substr(md5(t), 1, 16), 16, -10) as bigint)))"))
      .select(col("rep_id").as("doc_id"), col("simhash"))

    val chunked = d.select(
      col("doc_id"), col("simhash"),
      explode(expr(
        "transform(sequence(0, 3), c -> named_struct('chunk', c, 'ch', (simhash >> (c * 16)) & 65535))")).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.ch"))

    // hamming is row-local and cheap, and most chunk collisions fail it:
    // filtering BEFORE the pair-dedup means the distinct shuffles only
    // near-duplicates, not every bucket collision
    val repPairs = chunked.as("x").join(chunked.as("y"), Seq("chunk", "ch"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(
        col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        expr("bit_count(x.simhash ^ y.simhash)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()

    val groups = members.select(col("rep_id"), col("ids"))
    val cross = repPairs
      .join(groups.select(col("rep_id").as("doc_a"), col("ids").as("ids_a")), Seq("doc_a"))
      .join(groups.select(col("rep_id").as("doc_b"), col("ids").as("ids_b")), Seq("doc_b"))
      .select(explode(col("ids_a")).as("ia"), col("ids_b"), col("hamming"))
      .select(col("ia"), explode(col("ids_b")).as("ib"), col("hamming"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("hamming"))
    val within = groups.filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("ia"), col("ids"))
      .select(col("ia"), explode(col("ids")).as("ib"))
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("doc_a"), col("ib").as("doc_b"),
        lit(0L).as("hamming"))
    cross.unionByName(within)
  }
}
