package graft.lake

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.hadoop.fs.Path

/** Incremental maintenance of an additive aggregate from a lake table's
  * change feed — the propagate-the-delta pattern that turns a 100 TB
  * gold refresh from recompute-the-world into cost-of-the-change
  * (reference behavior: every scheduled transform re-runs CREATE TABLE
  * AS over its full input,
  * trino_iceberg_transform_component.py:116-129; this is the
  * incremental upgrade of that contract).
  *
  * The target table holds one row per group: the group columns, one
  * SUM per measure, and a `_graft_rows` contributing-row count. A
  * refresh reads ONLY the change feed since the last refresh — each
  * changed row contributes `+measure` (insert / update_postimage) or
  * `-measure` (delete / update_preimage) — and merges the per-group
  * delta into the target: existing groups add, new groups insert,
  * groups whose row count reaches zero are deleted. COMPACT commits
  * are invisible to the feed, so maintenance never perturbs the
  * aggregate.
  *
  * Exactly-once: every refresh commits its data TOGETHER with an
  * application watermark (`txn`, the source version it processed
  * through), so a crashed-and-replayed refresh is a no-op instead of a
  * double-count — the same discipline as the streaming sink's batch
  * watermark.
  *
  * Contract: `measures` must be ADDITIVE (SUM / COUNT; an average is a
  * ratio of two sums downstream). MIN/MAX are not foldable from a feed
  * alone (a delete may retire the current extreme, and the feed cannot
  * name the runner-up), so `mins`/`maxs` are maintained HYBRID: the
  * additive part still folds from the feed, and the extremes are
  * recomputed ONLY for the groups the feed touched — a scan pruned to
  * those groups (pushed as a group-key predicate when the touched set
  * is small, so file skipping on the logged bounds applies; a
  * broadcast semi-join past that) — still cost-of-the-change, never
  * recompute-the-world. Null group keys are refused loudly (merge keys
  * join by equality; a null key would never match and would re-insert
  * on every refresh).
  */
object Incremental {

  /** Contributing-row count column of an incrementally maintained
    * aggregate (the group's liveness tally).
    */
  val RowsCol = "_graft_rows"

  private def watermarkId(source: String): String =
    "graft-incr:" + new Path(source).toUri.getPath

  /** The source version the target has processed through, if any. */
  def refreshedThrough(spark: SparkSession, source: String,
                       target: String): Option[Long] =
    LakeTable.latestSnapshot(spark, target)
      .flatMap(_.txns.get(watermarkId(source)))

  /** Bring `target` up to date with `source`'s latest version.
    * First call builds the aggregate with one full scan (pinned to the
    * source snapshot); every later call reads only the change feed of
    * the versions since. Returns the committed target version
    * (unchanged when already up to date).
    */
  def refreshAgg(spark: SparkSession, source: String, target: String,
                 groupBy: Seq[String],
                 measures: Map[String, Column],
                 mins: Map[String, Column] = Map.empty,
                 maxs: Map[String, Column] = Map.empty): Long = {
    require(groupBy.nonEmpty, "refreshAgg needs at least one group column")
    require(measures.nonEmpty, "refreshAgg needs at least one measure")
    val allNames = measures.keys ++ mins.keys ++ maxs.keys
    require(!allNames.exists(_ == RowsCol) && !groupBy.contains(RowsCol),
      s"$RowsCol is reserved for the maintenance row count")
    require(allNames.size == allNames.toSet.size &&
        measures.keySet.intersect(mins.keySet ++ maxs.keySet).isEmpty &&
        mins.keySet.intersect(maxs.keySet).isEmpty,
      "measure/min/max output names must be distinct")
    val collide = allNames.toSet.intersect(groupBy.toSet)
    require(collide.isEmpty,
      s"measure name(s) collide with group column(s): ${collide.mkString(", ")}")
    val srcSnap = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at source $source"))
    val qid = watermarkId(source)
    val tgtSnap = LakeTable.latestSnapshot(spark, target)
    val done = tgtSnap.flatMap(_.txns.get(qid)).getOrElse(0L)
    if (done >= srcSnap.version) return tgtSnap.get.version
    val ms = measures.toSeq // stable column order
    val ext = mins.toSeq.map { case (n, e) => (n, min(e)) } ++
      maxs.toSeq.map { case (n, e) => (n, max(e)) }

    // a null group key would never merge-match (equality join) and
    // re-insert on every refresh — refuse it the moment it appears,
    // in the initial build AND in every delta (cheap: the probe runs
    // on a ~#groups-sized aggregate)
    def requireNonNullKeys(agg: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val nulls = agg.filter(groupBy.map(col(_).isNull).reduce(_ || _))
        .limit(1).count()
      require(nulls == 0L,
        s"refreshAgg group key(s) (${groupBy.mkString(", ")}) contain nulls — " +
          "null keys never merge-match; filter or coalesce them upstream")
      agg
    }

    if (done == 0L) {
      // initial build: one full scan of the pinned source snapshot.
      // PERSISTED (groups-scale) before the null-key probe: unpersisted,
      // the probe and the write would each execute the full scan+agg
      // (guide §5 — the probe is a second full pass for a ~#groups check)
      val agg = LakeTable.read(spark, source, asOf = Some(srcSnap.version))
        .groupBy(groupBy.map(col).toIndexedSeq: _*)
        .agg(count(lit(1)).as(RowsCol),
          (ms.map { case (n, e) => sum(e).as(n) } ++
            ext.map { case (n, a) => a.as(n) }): _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        requireNonNullKeys(agg)
        LakeTable.overwrite(spark, target, agg, txn = Some(qid -> srcSnap.version))
      } finally agg.unpersist(blocking = false)
    } else {
      // delta: only the feed of (done, srcSnap.version] is read.
      // PERSISTED (groups-scale): consumed by the null-key probe, the
      // touched-tuples collect (extremes path) and the merge source —
      // unpersisted each would re-execute the feed scan+agg (guide §5)
      val feed = LakeTable.changes(spark, source, done + 1, srcSnap.version)
      val sign = when(col(LakeTable.ChangeTypeCol)
        .isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
      val additive = feed
        .groupBy(groupBy.map(col).toIndexedSeq: _*)
        .agg(sum(sign).as(RowsCol),
          ms.map { case (n, e) => sum(sign * e).as(n) }: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      requireNonNullKeys(additive)
        // groups the feed touched but left net-unchanged still merge
        // (their measures may have moved even at rows-delta 0)
      val delta =
        if (ext.isEmpty) additive
        else {
          // extremes: recompute ONLY the touched groups, against the
          // same pinned source version the feed runs through. With a
          // small touched set the group tuples become a pushed
          // predicate — the scan file-skips on the logged bounds; past
          // the cap, a broadcast semi-join still prunes rows (a scan,
          // but of matching rows only, never a recompute of untouched
          // groups)
          val touched = additive.select(groupBy.map(col).toIndexedSeq: _*).distinct()
          val tuples = touched.limit(10001).collect()
          val pinned = LakeTable.read(spark, source, asOf = Some(srcSnap.version))
          val pruned =
            if (tuples.length > 10000)
              pinned.join(broadcast(touched), groupBy, "left_semi")
            else if (tuples.isEmpty) pinned.filter(lit(false))
            else pinned.filter(tuples.map { r =>
              groupBy.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
                .reduce(_ && _)
            }.reduce(_ || _))
          val extremes = pruned.groupBy(groupBy.map(col).toIndexedSeq: _*)
            .agg(ext.head._2.as(ext.head._1),
              ext.tail.map { case (n, a) => a.as(n) }: _*)
          // touched-but-emptied groups have no extremes row (left
          // outer): their nulls never land — the DELETE clause claims
          // them first
          additive.join(extremes, groupBy, "left_outer")
        }
      val addNames = ms.map(_._1) :+ RowsCol
      val extNames = ext.map(_._1)
      try LakeTable.mergeRows(spark, target, delta, groupBy,
        matched = Seq(
          // group emptied out: remove its row
          LakeTable.MatchedDelete(
            Some(col(s"t.$RowsCol") + col(s"s.$RowsCol") === 0L)),
          LakeTable.MatchedUpdate(None,
            (addNames.map(n => n -> (col(s"t.$n") + col(s"s.$n"))) ++
              extNames.map(n => n -> col(s"s.$n"))).toMap)),
        notMatchedInsert = Seq(
          // a brand-new group inserts its delta verbatim; a pure-delete
          // delta for a group the target never had would be feed
          // corruption — guard rather than insert a negative group
          (Some(col(s"s.$RowsCol") > 0L),
            (groupBy ++ addNames ++ extNames).map(n => n -> col(s"s.$n")).toMap)),
        txn = Some(qid -> srcSnap.version))
      finally additive.unpersist(blocking = false)
    }
  }

  private def sketchWatermarkId(source: String): String =
    "graft-sketch:" + new Path(source).toUri.getPath

  /** Incremental DISTINCT-count maintenance via mergeable HLL sketches
    * (Spark's Datasketches `hll_sketch_agg` / `hll_union_agg` — binary,
    * codegen-adjacent, union-associative): the target accumulates one
    * sketch PARTIAL row per (group, refresh), so a refresh costs
    * exactly one pass over the feed's NEW rows and an O(partials)
    * append — never a rescan — and the estimate at read time unions
    * O(groups × refreshes) kilobyte binaries. This is the one
    * distinct-count shape that stays cost-of-the-change at 100 TB:
    * exact `countDistinct` re-shuffles the world on every refresh.
    *
    * Sketches are insert-only summaries — a delete/update preimage
    * cannot be folded OUT of one — so the contract is an APPEND-ONLY
    * source (the event/metrics streams distinct counts are computed
    * over); a feed carrying any non-insert change refuses loudly
    * rather than under-counting silently. Exactly-once via the same
    * txn-watermark discipline as [[refreshAgg]] (a replayed refresh
    * appends nothing).
    */
  def refreshSketch(spark: SparkSession, source: String, target: String,
                    groupBy: Seq[String], valueCol: String,
                    lgK: Int = 12): Long = {
    require(groupBy.nonEmpty, "refreshSketch needs at least one group column")
    val srcSnap = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at source $source"))
    val qid = sketchWatermarkId(source)
    val tgtSnap = LakeTable.latestSnapshot(spark, target)
    val done = tgtSnap.flatMap(_.txns.get(qid)).getOrElse(0L)
    if (done >= srcSnap.version) return tgtSnap.get.version
    val rows =
      if (done == 0L) LakeTable.read(spark, source, asOf = Some(srcSnap.version))
      else {
        val feed = LakeTable.changes(spark, source, done + 1, srcSnap.version)
        val nonInsert = feed
          .filter(col(LakeTable.ChangeTypeCol) =!= "insert").limit(1).count()
        require(nonInsert == 0L,
          s"refreshSketch source $source fed a non-insert change in versions " +
            s"(${done + 1}, ${srcSnap.version}] — sketches are insert-only " +
            "summaries; rebuild the sketch table instead of folding a delete")
        feed
      }
    val partial = rows
      .groupBy(groupBy.map(col).toIndexedSeq: _*)
      .agg(expr(s"hll_sketch_agg(`$valueCol`, $lgK)").as("sketch"),
        count(lit(1)).as("n"))
      .withColumn("through_version", lit(srcSnap.version))
    // the txn ledger rides the commit: a crashed-and-replayed refresh
    // of the same (source, version) appends nothing
    (if (tgtSnap.isEmpty)
       LakeTable.overwriteStream(spark, target, partial, qid, srcSnap.version,
         operation = "SKETCH REFRESH")
         .getOrElse(LakeTable.latestVersion(spark, target).getOrElse(0L))
     else
       LakeTable.appendStream(spark, target, partial, qid, srcSnap.version,
         operation = "SKETCH REFRESH").getOrElse(tgtSnap.get.version))
  }

  /** Distinct-count estimates from an accumulated sketch table: union
    * the partials per group, estimate once. `n_rows` is the exact
    * contributing-row tally (partials carry their counts).
    */
  def sketchEstimate(spark: SparkSession, target: String,
                     groupBy: Seq[String],
                     estimateAs: String = "approx_distinct"): org.apache.spark.sql.DataFrame =
    LakeTable.read(spark, target)
      .groupBy(groupBy.map(col).toIndexedSeq: _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch, true))").as(estimateAs),
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_partials"))

  private def gkWatermarkId(source: String): String =
    "graft-gk:" + new Path(source).toUri.getPath

  /** Incremental QUANTILE maintenance via mergeable Greenwald-Khanna
    * summaries ([[graft.functions.QuantileAgg]]): each refresh appends
    * one GK partial per group over the batch's values; reads merge the
    * partials and query percentiles with rank error ≤ eps·count —
    * per-batch cost where exact `percentile` re-sorts the world per
    * refresh. Insert-only + exactly-once like [[refreshSketch]] (a
    * quantile summary cannot un-see a deleted value).
    */
  def refreshQuantiles(spark: SparkSession, source: String, target: String,
                       groupBy: Seq[String], valueCol: String,
                       eps: Double = 0.01): Long = {
    require(groupBy.nonEmpty, "refreshQuantiles needs at least one group column")
    graft.functions.QuantileAgg.register(spark)
    val srcSnap = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at source $source"))
    val qid = gkWatermarkId(source)
    val tgtSnap = LakeTable.latestSnapshot(spark, target)
    val done = tgtSnap.flatMap(_.txns.get(qid)).getOrElse(0L)
    if (done >= srcSnap.version) return tgtSnap.get.version
    val rows =
      if (done == 0L) LakeTable.read(spark, source, asOf = Some(srcSnap.version))
      else {
        val feed = LakeTable.changes(spark, source, done + 1, srcSnap.version)
        val nonInsert = feed
          .filter(col(LakeTable.ChangeTypeCol) =!= "insert").limit(1).count()
        require(nonInsert == 0L,
          s"refreshQuantiles source $source fed a non-insert change in " +
            s"(${done + 1}, ${srcSnap.version}] — quantile summaries are " +
            "insert-only; rebuild instead of folding a delete")
        feed
      }
    val partial = rows
      .groupBy(groupBy.map(col).toIndexedSeq: _*)
      .agg(expr(s"gk_sketch_agg(CAST(`$valueCol` AS DOUBLE), ${eps}d)").as("gk"),
        count(col(valueCol)).as("n"))
      .withColumn("through_version", lit(srcSnap.version))
    (if (tgtSnap.isEmpty)
       LakeTable.overwriteStream(spark, target, partial, qid, srcSnap.version,
         operation = "GK REFRESH")
         .getOrElse(LakeTable.latestVersion(spark, target).getOrElse(0L))
     else
       LakeTable.appendStream(spark, target, partial, qid, srcSnap.version,
         operation = "GK REFRESH").getOrElse(tgtSnap.get.version))
  }

  /** Percentile estimates from an accumulated GK-sketch table: merge
    * the partials per group, query each requested quantile.
    */
  def quantileEstimate(spark: SparkSession, target: String,
                       groupBy: Seq[String],
                       quantiles: Seq[(String, Double)]): org.apache.spark.sql.DataFrame = {
    graft.functions.QuantileAgg.register(spark)
    val merged = LakeTable.read(spark, target)
      .groupBy(groupBy.map(col).toIndexedSeq: _*)
      .agg(expr("gk_union_agg(gk)").as("gk"), sum(col("n")).as("n_rows"))
    merged.select((groupBy.map(col) ++
      quantiles.map { case (name, q) =>
        expr(s"gk_quantile(gk, ${q}d)").as(name) } :+
      col("n_rows")).toIndexedSeq: _*)
  }

  private def hhWatermarkId(source: String): String =
    "graft-hh:" + new Path(source).toUri.getPath

  /** Incremental HEAVY HITTERS via mergeable Count-Min sketches: each
    * refresh appends (a) ONE serialized CMS over the batch's terms
    * (Spark's builtin `count_min_sketch` — codegen'd, one pass) and
    * (b) the batch's exact top `candidatesPerBatch` terms; the
    * [[heavyHitters]] read merges the sketches
    * ([[graft.functions.CmsAgg]] — counter addition, order-free) and
    * estimates every accumulated candidate against the merged sketch.
    * Cost per refresh is one pass over the NEW rows; read cost is
    * O(partials + candidates). CMS never under-counts, so a true heavy
    * hitter that surfaced in ANY batch's candidates ranks correctly at
    * read time; a term below every batch's top-M can be missed —
    * choose M well above k (the classic candidate-set trade; the spec
    * pins top-k exactness on the test corpus and over-estimation ≤
    * eps·N). Insert-only + exactly-once like [[refreshSketch]].
    *
    * `terms` must evaluate to ARRAY<STRING> over the source rows.
    */
  def refreshHeavyHitters(spark: SparkSession, source: String, target: String,
                          terms: Column, eps: Double = 1e-4,
                          confidence: Double = 0.99, seed: Int = 42,
                          candidatesPerBatch: Int = 100): Long = {
    val srcSnap = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(
        s"no committed version at source $source"))
    val qid = hhWatermarkId(source)
    val tgtSnap = LakeTable.latestSnapshot(spark, target)
    val done = tgtSnap.flatMap(_.txns.get(qid)).getOrElse(0L)
    if (done >= srcSnap.version) return tgtSnap.get.version
    val rows =
      if (done == 0L) LakeTable.read(spark, source, asOf = Some(srcSnap.version))
      else {
        val feed = LakeTable.changes(spark, source, done + 1, srcSnap.version)
        val nonInsert = feed
          .filter(col(LakeTable.ChangeTypeCol) =!= "insert").limit(1).count()
        require(nonInsert == 0L,
          s"refreshHeavyHitters source $source fed a non-insert change in " +
            s"(${done + 1}, ${srcSnap.version}] — sketches are insert-only " +
            "summaries; rebuild instead of folding a delete")
        feed
      }
    val batchTerms = rows.select(explode(terms).as("term"))
      .filter(col("term").isNotNull && col("term") =!= "")
    val cmsRow = batchTerms
      .agg(expr(s"count_min_sketch(term, ${eps}d, ${confidence}d, $seed)").as("cms"))
      .select(lit("cms").as("kind"), lit(null).cast("string").as("term"),
        lit(null).cast("long").as("n"), col("cms"),
        lit(srcSnap.version).as("through_version"))
    val candRows = batchTerms.groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term")).limit(candidatesPerBatch)
      .select(lit("cand").as("kind"), col("term"), col("n"),
        lit(null).cast("binary").as("cms"),
        lit(srcSnap.version).as("through_version"))
    val partial = cmsRow.unionByName(candRows)
    (if (tgtSnap.isEmpty)
       LakeTable.overwriteStream(spark, target, partial, qid, srcSnap.version,
         operation = "HH REFRESH")
         .getOrElse(LakeTable.latestVersion(spark, target).getOrElse(0L))
     else
       LakeTable.appendStream(spark, target, partial, qid, srcSnap.version,
         operation = "HH REFRESH").getOrElse(tgtSnap.get.version))
  }

  /** Top-k terms from an accumulated heavy-hitters table via the
    * candidates' EXACT merged batch counts — the per-batch exact `n`
    * rows the refreshes persisted alongside the sketch, summed per
    * term and ranked (n desc, term). Because candidate rows are exact
    * counts over disjoint batches, a candidate's sum is its exact
    * total over every batch in which it surfaced, so the result is
    * replayable by an engine-independent oracle (per-batch top-M
    * candidates + GROUP BY + rank) with NO sketch error in the output
    * — unlike [[heavyHitters]], whose CMS estimates rank identically
    * on well-separated corpora (spec-pinned) but carry eps·N noise no
    * portable oracle can reproduce. The candidate-capping trade is the
    * same as [[heavyHitters]]: a term below every batch's top-M can be
    * missed, and a term absent from SOME batch's candidates
    * under-sums — both bounded by M >> k and both replayed identically
    * by the oracle, since the cap is part of the declared semantics.
    */
  def heavyHittersExact(spark: SparkSession, target: String, k: Int): org.apache.spark.sql.DataFrame = {
    val t = LakeTable.read(spark, target)
    val top = t.filter(col("kind") === "cand")
      .groupBy("term").agg(sum(col("n")).as("n"))
      .orderBy(col("n").desc, col("term")).limit(k)
    // rank the <=k rows without an unpartitioned Window over the corpus
    // (the limit already reduced to k; struct sort = (n desc, term))
    top
      .agg(sort_array(collect_list(struct((-col("n")).as("nn"),
        col("term")))).as("__rows"))
      .select(posexplode(col("__rows")).as(Seq("pos", "r")))
      .select(col("r.term").as("term"), (-col("r.nn")).as("n"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Top-k terms from an accumulated heavy-hitters table: merge the
    * sketch partials, estimate every distinct candidate, rank.
    */
  def heavyHitters(spark: SparkSession, target: String, k: Int): org.apache.spark.sql.DataFrame = {
    graft.functions.CmsAgg.register(spark)
    val t = LakeTable.read(spark, target)
    val merged = t.filter(col("kind") === "cms")
      .agg(expr("cms_union_agg(cms)").as("cms"))
    val cands = t.filter(col("kind") === "cand").select("term").distinct()
    cands.crossJoin(broadcast(merged))
      .select(col("term"), expr("cms_estimate(cms, term)").as("est"))
      .orderBy(col("est").desc, col("term")).limit(k)
  }

  // ------------------------------------------------------------------
  // incremental equi-join view maintenance

  private def joinWatermarkId(side: String, source: String): String =
    s"graft-incr-join-$side:" + new Path(source).toUri.getPath

  /** Incremental maintenance of a many-to-one equi-JOIN view (the
    * silver fact-⋈-dim enrichment every reference transform runs,
    * silver defs.yaml:113/149/183, re-run there as full CREATE TABLE
    * AS on a schedule): `target` holds `left ⋈ right` keyed by the
    * left-side primary key, and each refresh brings it to the sources'
    * latest versions for the COST OF THE CHANGE.
    *
    * Discipline: scoped recompute, not delta folding. The change feeds
    * are used ONLY to find the AFFECTED view keys — left-feed rows name
    * their keys directly; right-feed rows name the join-key values
    * whose dependents must re-derive (pre- and post-images both appear,
    * so a key change invalidates both sides), probed into the left
    * table as a pushed predicate (file-skipping on logged bounds) or a
    * semi-join past 10k keys. The affected rows then RECOMPUTE against
    * the latest pinned snapshots and MERGE in: present keys update,
    * new keys insert, keys that no longer produce a row (left delete,
    * or an inner join losing its match) delete via tombstones. Because
    * the refresh is state-based — feeds scope it, snapshots define it —
    * it is idempotent and insensitive to feed ordering, and updates/
    * deletes on EITHER side are handled exactly, which pure delta
    * folding only achieves with multiset multiplicities.
    *
    * Contracts: `leftPk` unique and non-null in `left` (the view key);
    * `right` key-unique on its join columns (many-to-one — checked on
    * the initial build, and every refresh's merge re-checks the touched
    * subset); right-side non-key columns must not collide with left
    * column names. `joinType` is `inner` or `left` (late-arriving or
    * retired dims flip matches to/from null). Exactly-once: the merge
    * commits BOTH source watermarks atomically with the data, so a
    * replayed refresh is a no-op.
    */
  def refreshJoin(spark: SparkSession, left: String, right: String,
                  target: String, leftPk: Seq[String],
                  joinKeys: Seq[(String, String)],
                  joinType: String = "inner"): Long = {
    require(leftPk.nonEmpty && joinKeys.nonEmpty,
      "refreshJoin needs a left primary key and at least one join-key pair")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"refreshJoin supports inner/left joins, got $joinType")
    val lSnap = LakeTable.latestSnapshot(spark, left).getOrElse(
      throw new IllegalArgumentException(s"no committed version at left $left"))
    val rSnap = LakeTable.latestSnapshot(spark, right).getOrElse(
      throw new IllegalArgumentException(s"no committed version at right $right"))
    val (widL, widR) = (joinWatermarkId("left", left), joinWatermarkId("right", right))
    val tgt = LakeTable.latestSnapshot(spark, target)
    val doneL = tgt.flatMap(_.txns.get(widL)).getOrElse(0L)
    val doneR = tgt.flatMap(_.txns.get(widR)).getOrElse(0L)
    if (doneL >= lSnap.version && doneR >= rSnap.version) return tgt.get.version

    val rKeys = joinKeys.map(_._2)
    val lNow = LakeTable.read(spark, left, asOf = Some(lSnap.version))
    val rNow = LakeTable.read(spark, right, asOf = Some(rSnap.version))
    val clash = (rNow.columns.toSet -- rKeys).intersect(lNow.columns.toSet)
    require(clash.isEmpty,
      s"right-side column(s) collide with left names: ${clash.mkString(", ")}")
    val viewCols = lNow.columns ++ rNow.columns.filterNot(rKeys.contains)

    def view(l: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val cond = joinKeys.map { case (lc, rc) => l(lc) === rNow(rc) }.reduce(_ && _)
      l.join(rNow, cond, joinType)
        .select(l.columns.map(l(_)).toIndexedSeq ++
          rNow.columns.filterNot(rKeys.contains).map(rNow(_)): _*)
    }
    def requirePkClean(df: org.apache.spark.sql.DataFrame): Unit =
      require(df.filter(leftPk.map(col(_).isNull).reduce(_ || _)).limit(1).count() == 0L,
        s"refreshJoin left key(s) (${leftPk.mkString(", ")}) contain nulls")

    if (tgt.isEmpty) {
      require(rNow.groupBy(rKeys.map(col).toIndexedSeq: _*).count()
          .filter(col("count") > 1).limit(1).count() == 0L,
        s"right side $right is not key-unique on (${rKeys.mkString(", ")}) — " +
          "refreshJoin maintains a many-to-one view")
      requirePkClean(lNow)
      LakeTable.overwrite(spark, target, view(lNow),
        txn = Some(widL -> lSnap.version), extraTxns = Map(widR -> rSnap.version))
    } else {
      // affected view keys: named by the left feed, or referencing a
      // right key the right feed touched. Each key carries __ni = "some
      // non-insert change row named it" so the append-only decision
      // (below) needs no dedicated probe job.
      val leftFeed =
        if (lSnap.version > doneL)
          Some(LakeTable.changes(spark, left, doneL + 1, lSnap.version))
        else None
      val fromL = leftFeed.map(_.groupBy(leftPk.map(col).toIndexedSeq: _*)
        .agg(max(when(col(LakeTable.ChangeTypeCol) =!= "insert", 1)
          .otherwise(0)).as("__ni")))
      val fromR =
        if (rSnap.version > doneR) {
          val touchedR = LakeTable.changes(spark, right, doneR + 1, rSnap.version)
            .select(rKeys.map(col).toIndexedSeq: _*).distinct()
          val cond = joinKeys.map { case (lc, rc) => lNow(lc) === touchedR(rc) }
            .reduce(_ && _)
          Some(lNow.join(touchedR, cond, "left_semi")
            .select(leftPk.map(col).toIndexedSeq: _*).distinct()
            .withColumn("__ni", lit(1)))
        } else None
      val touchedAgg = (fromL.toSeq ++ fromR.toSeq).reduce(_ unionByName _)
        .groupBy(leftPk.map(col).toIndexedSeq: _*)
        .agg(max(col("__ni")).as("__ni"))
      // restrict the left scan to the touched keys: a literal IN
      // predicate pushes into file skipping while the set is small
      // (single-column keys take ONE In expression — never a deep OR
      // chain, which overflows the converter stack at PK cardinality;
      // composite keys cap far lower), a semi-join past that. ONE
      // collect yields the key sample, the pk-null check and the
      // append-only flag (guide §5: this path previously paid a
      // localCheckpoint, a null-probe count, an append-only probe and
      // the collect — four driver actions — per refresh); only the
      // over-cap case (degrades to semi-joins anyway) keeps the probes.
      val litCap = if (leftPk.size == 1) 10000 else 64
      val tuples = touchedAgg.limit(litCap + 1).collect()
      val sawAll = tuples.length <= litCap
      // touched (pk-only) for the semi-join/anti-join consumers: a
      // LOCAL relation when the collect saw every key (no recompute, no
      // checkpoint job), else checkpointed once as before
      val touched =
        if (sawAll) spark.createDataFrame(
          java.util.Arrays.asList(
            tuples.map(r => Row.fromSeq(leftPk.indices.map(r.get))): _*),
          StructType(leftPk.map(k => lNow.schema(k)).toSeq))
        else touchedAgg.localCheckpoint()
      if (sawAll) {
        val bad = tuples.exists(r => leftPk.indices.exists(r.isNullAt))
        require(!bad,
          s"refreshJoin left key(s) (${leftPk.mkString(", ")}) contain nulls")
      } else requirePkClean(touched)
      // the daily-append operating mode: a purely-INSERT left feed with
      // an idle right side can only ADD view keys (leftPk is unique, so
      // an inserted key has no prior target row) — take mergeRows'
      // insert-only path: anti-join + append, no detection scan, no
      // file rewrite, no pre/post change images. A 100 TB fact growing
      // by a day must not rewrite its enrichment view.
      val appendOnly = fromR.isEmpty && leftFeed.nonEmpty && {
        if (sawAll) !tuples.exists(r => r.getInt(leftPk.length) == 1)
        else leftFeed.get
          .filter(col(LakeTable.ChangeTypeCol) =!= "insert").limit(1).count() == 0L
      }
      val lTouched =
        if (tuples.isEmpty) lNow.filter(lit(false))
        else if (!sawAll)
          lNow.join(touched, leftPk, "left_semi")
        else if (leftPk.size == 1)
          lNow.filter(col(leftPk.head).isin(tuples.map(_.get(0)).toIndexedSeq: _*))
        else lNow.filter(tuples.map { r =>
          leftPk.zipWithIndex.map { case (c, i) => col(c) === lit(r.get(i)) }
            .reduce(_ && _)
        }.reduce(_ || _))
      if (appendOnly)
        return LakeTable.mergeRows(spark, target, view(lTouched), leftPk,
          matched = Nil,
          notMatchedInsert = Seq((None, viewCols.map(n => n -> col(s"s.$n")).toMap)),
          txn = Some(widL -> lSnap.version),
          extraTxns = Map(widR -> rSnap.version))
      val marker = "_graft_drop"
      // the view recompute feeds both the replacement rows and the
      // tombstone anti-join — persist it so the (left scan ⋈ dim) runs
      // once, not once per consumer
      val replacement = view(lTouched)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val repl = replacement.withColumn(marker, lit(false))
        // tombstones: touched keys producing no view row anymore
        val tomb = touched
          .join(replacement.select(leftPk.map(col).toIndexedSeq: _*), leftPk, "left_anti")
          .select(replacement.schema.fields.map(f =>
            (if (leftPk.contains(f.name)) col(f.name)
             else lit(null).cast(f.dataType)).as(f.name)).toIndexedSeq: _*)
          .withColumn(marker, lit(true))
        LakeTable.mergeRows(spark, target, repl.unionByName(tomb), leftPk,
          matched = Seq(
            LakeTable.MatchedDelete(Some(col(s"s.$marker"))),
            LakeTable.MatchedUpdate(None,
              viewCols.filterNot(leftPk.contains)
                .map(n => n -> col(s"s.$n")).toMap)),
          notMatchedInsert = Seq(
            (Some(!col(s"s.$marker")), viewCols.map(n => n -> col(s"s.$n")).toMap)),
          txn = Some(widL -> lSnap.version),
          extraTxns = Map(widR -> rSnap.version))
      } finally replacement.unpersist(blocking = false)
    }
  }
}
