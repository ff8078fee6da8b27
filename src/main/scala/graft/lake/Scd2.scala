package graft.lake

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SCD Type-2 dimension maintenance over a graft lake table — the
  * canonical silver-dim pattern for the reference's conformed
  * dimensions (ref: silver defs.yaml dim_* transforms, which re-derive
  * the dimension from scratch each run; this keeps FULL history and
  * applies only the change).
  *
  * The dimension carries one row per (business key, version interval):
  * `valid_from` (the effective version that opened the row), `valid_to`
  * (the effective version that closed it; NULL while open) and
  * `is_current`. [[applyBatch]] folds one observation batch in as ONE
  * atomic MERGE commit, keyed on (business key, valid_from) — that
  * composite uniquely names a version row, so the classic two-action
  * staging (close the open row + insert its successor) is a plain
  * key-unique upsert, never a multi-statement transaction:
  *
  *   - a batch key whose attributes differ from its open row stages a
  *     CLOSE (same (key, valid_from) → replaced with valid_to =
  *     effective, is_current = false) and an OPEN ((key, effective) is
  *     new → inserted);
  *   - an unseen key stages only the OPEN;
  *   - an unchanged key stages nothing — re-delivering the same
  *     observations is a no-op (no commit, no version).
  *
  * Scale posture: the open-row read is a pushed `is_current` filter —
  * files holding only closed history have max(is_current) = false in
  * the logged bounds and skip entirely, so the probe scans the open
  * slice, not the table's accumulated history. The batch⋈open join
  * broadcasts the (small) batch, its result is batch-sized and
  * persisted once for the change/new/monotonicity splits, and the
  * MERGE rewrite touches only the files holding a staged
  * (key, valid_from) — O(change), never O(history).
  *
  * Out-of-order protection: `effective` must be strictly greater than
  * the valid_from of every open row the batch touches; a late batch
  * refuses loudly instead of silently rewriting history backwards.
  */
object Scd2 {

  val ValidFromCol = "valid_from"
  val ValidToCol = "valid_to"
  val CurrentCol = "is_current"
  private val Bookkeeping = Seq(ValidFromCol, ValidToCol, CurrentCol)

  /** Fold one observation batch (one row per business key — duplicate
    * keys fail MERGE's cardinality check) into the dimension at
    * `table`, effective at version `effective`. Returns the committed
    * lake version (the current one when the batch changes nothing).
    * The first batch creates the table with every key open.
    */
  def applyBatch(spark: SparkSession, table: String, batch0: DataFrame,
                 keys: Seq[String], attrs: Seq[String], effective: Long): Long = {
    require(keys.nonEmpty && attrs.nonEmpty,
      "scd2 needs at least one business-key column and one tracked attribute")
    val clash = (keys ++ attrs).filter(Bookkeeping.contains)
    require(clash.isEmpty,
      s"scd2 reserves column(s) ${clash.mkString(", ")} for interval bookkeeping")
    val cols = keys ++ attrs
    val batch = batch0.select(cols.map(col): _*)
    def opened(df: DataFrame): DataFrame = df
      .withColumn(ValidFromCol, lit(effective))
      .withColumn(ValidToCol, lit(null).cast("long"))
      .withColumn(CurrentCol, lit(true))

    val snap = LakeTable.latestSnapshot(spark, table)
    if (snap.isEmpty) {
      // Mirror the later-batch duplicate-key preflight on the INITIAL batch:
      // a dup-key first batch would otherwise silently write two open rows
      // per key, corrupting the one-open-row invariant snapshotAt/joinAsOf
      // depend on (the next batch then fails with a misleading error).
      val dup = batch.groupBy(keys.map(col): _*).agg(count(lit(1L)).as("__n"))
        .agg(max(col("__n"))).head()
      require(dup.isNullAt(0) || dup.getLong(0) <= 1L,
        s"scd2 batch has duplicate values of key (${keys.mkString(", ")}) — " +
          "deliver one observation per business key per batch")
      return LakeTable.overwrite(spark, table, opened(batch))
    }

    // open slice pinned to one snapshot: the pushed is_current filter
    // skips files whose logged bounds hold only closed history
    val open = LakeTable.read(spark, table, asOf = Some(snap.get.version))
      .filter(col(CurrentCol))
      .select((cols :+ ValidFromCol).map(col): _*)
      .withColumn("__matched", lit(true))

    val keyCond = keys.map(k => col(s"b.$k") === col(s"o.$k")).reduce(_ && _)
    val joined = batch.alias("b").join(open.alias("o"), keyCond, "left_outer")
      .select(cols.map(c => col(s"b.$c").as(c)) ++
        attrs.map(a => col(s"o.$a").as(s"__cur_$a")) ++
        Seq(col(s"o.$ValidFromCol").as("__cur_from"), col("__matched")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val differs = attrs.map(a => !(col(a) <=> col(s"__cur_$a"))).reduce(_ || _)
      val isChanged = col("__matched") && differs
      val willStage = isChanged || col("__matched").isNull
      // ONE preflight pass over the (persisted, batch-sized) join
      // answers all three gate questions — duplicate keys (a duplicate
      // would stage two open rows at the same (key, effective) and the
      // unconditional merge is an upsert with no cardinality guard: it
      // would land BOTH silently), out-of-order effectives (closing an
      // open row at or before its valid_from corrupts interval order),
      // and whether anything stages at all
      val pre = joined.groupBy(keys.map(col): _*)
        .agg(count(lit(1L)).as("__n"),
          max(when(isChanged, col("__cur_from"))).as("__mf"),
          max(when(willStage, lit(1L)).otherwise(lit(0L))).as("__any"))
        .agg(max(col("__n")), max(col("__mf")), max(col("__any"))).head()
      require(pre.isNullAt(0) || pre.getLong(0) <= 1L,
        s"scd2 batch has duplicate values of key (${keys.mkString(", ")}) — " +
          "deliver one observation per business key per batch")
      if (!pre.isNullAt(1))
        require(pre.getLong(1) < effective,
          s"scd2 batch effective=$effective is not past the open rows it touches " +
            s"(max open valid_from = ${pre.getLong(1)}) — apply batches in " +
            "effective order")
      if (pre.isNullAt(2) || pre.getLong(2) == 0L) return snap.get.version

      val changed = joined.filter(isChanged)
      val fresh = joined.filter(col("__matched").isNull)
      val closes = changed.select(
        keys.map(col) ++ attrs.map(a => col(s"__cur_$a").as(a)) ++ Seq(
          col("__cur_from").as(ValidFromCol),
          lit(effective).as(ValidToCol),
          lit(false).as(CurrentCol)): _*)
      val opens = opened(
        changed.select(cols.map(col): _*).unionByName(fresh.select(cols.map(col): _*)))
      LakeTable.merge(spark, table, closes.unionByName(opens), keys :+ ValidFromCol)
    } finally joined.unpersist(blocking = false)
  }

  /** The dimension as of effective version `at` — every row whose
    * interval covers it. Time travel in EFFECTIVE time (what did the
    * dim say about version 2?), orthogonal to the lake log's commit
    * time travel (what had we committed at version 2?).
    */
  def snapshotAt(spark: SparkSession, table: String, at: Long): DataFrame =
    LakeTable.read(spark, table)
      .filter(col(ValidFromCol) <= at &&
        (col(ValidToCol).isNull || col(ValidToCol) > at))

  /** Point-in-time enrichment — the consumption side of SCD2: each
    * fact row joins the dimension row whose interval covers the fact's
    * OWN effective version (`at`), so a fact never sees attributes from
    * its future (no leakage) or its past (no staleness). `keys` maps
    * fact key column → dimension key column. The plan is an EQUI-join
    * on the business key with the interval riding as a residual
    * predicate — SortMergeJoin / broadcast-hash by key cardinality,
    * never a nested loop; SCD2 intervals per key are non-overlapping,
    * so each fact matches at most one dim row and the join preserves
    * fact cardinality.
    */
  def joinAsOf(facts: DataFrame, dim: DataFrame,
               keys: Seq[(String, String)], at: Column,
               joinType: String = "inner"): DataFrame = {
    require(keys.nonEmpty, "joinAsOf needs at least one key pair")
    val d = dim.alias("d")
    val f = facts.alias("f")
    val keyCond = keys.map { case (fk, dk) => col(s"f.$fk") === col(s"d.$dk") }
      .reduce(_ && _)
    val cover = col(s"d.$ValidFromCol") <= at &&
      (col(s"d.$ValidToCol").isNull || col(s"d.$ValidToCol") > at)
    f.join(d, keyCond && cover, joinType)
  }

  /** CDC-driven SCD2: fold the change feed of lake table `source`
    * (expected key-unique per commit — a dim source, not a fact) into
    * the dimension at `dim`. Effective versions are the SOURCE's commit
    * versions, so the dimension's intervals read as source-log
    * provenance: valid_from = the commit that produced the attributes,
    * and [[snapshotAt]] answers "what did the source say as of its
    * version v". Per key, the LAST change in the unprocessed range is
    * the observation (batch CDC apply — intermediate states within the
    * range collapse); a commit that deletes and reinserts a key counts
    * as an update. A DELETE retires the key: its open row closes at the
    * deleting version with no successor.
    *
    * Exactly-once: the application watermark (`appId` → source head
    * version) rides the SAME commit as the data via the merge's txn
    * stamp (or the initial overwrite's), so a crashed-and-replayed
    * applyFeed is a no-op, never a double close. A feed range that
    * changes nothing commits nothing — the watermark intentionally
    * stays behind (re-scanning an empty range is cheap and idempotent).
    */
  def applyFeed(spark: SparkSession, source: String, dim: String,
                keys: Seq[String], attrs: Seq[String],
                appId0: Option[String] = None): Long = {
    require(keys.nonEmpty && attrs.nonEmpty,
      "scd2 needs at least one business-key column and one tracked attribute")
    val clash = (keys ++ attrs).filter(Bookkeeping.contains)
    require(clash.isEmpty,
      s"scd2 reserves column(s) ${clash.mkString(", ")} for interval bookkeeping")
    val appId = appId0.getOrElse(s"scd2:$source")
    val head = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $source"))
      .version
    val dimSnap = LakeTable.latestSnapshot(spark, dim)
    val wm = dimSnap.flatMap(_.txns.get(appId))
    if (wm.exists(_ >= head)) return dimSnap.get.version
    val startV = wm.map(_ + 1).getOrElse(1L)
    val cols = keys ++ attrs

    // last change per key wins; on a same-commit tie (overwrite's
    // delete+reinsert) the non-delete row is the key's final state
    val feed = LakeTable.changes(spark, source, startV, head)
      .filter(col(LakeTable.ChangeTypeCol) =!= "update_preimage")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(LakeTable.CommitVersionCol).desc,
        (col(LakeTable.ChangeTypeCol) === "delete").asc)
    val obs = feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col) ++ Seq(col(LakeTable.ChangeTypeCol).as("__ct"),
        col(LakeTable.CommitVersionCol).as("__v")): _*)

    if (dimSnap.isEmpty) {
      val first = obs.filter(col("__ct") =!= "delete")
        .select(cols.map(col) :+ col("__v").as(ValidFromCol): _*)
        .withColumn(ValidToCol, lit(null).cast("long"))
        .withColumn(CurrentCol, lit(true))
      return LakeTable.overwrite(spark, dim, first, txn = Some(appId -> head))
    }

    val open = LakeTable.read(spark, dim, asOf = Some(dimSnap.get.version))
      .filter(col(CurrentCol))
      .select((cols :+ ValidFromCol).map(col): _*)
      .withColumn("__matched", lit(true))
    val keyCond = keys.map(k => col(s"b.$k") === col(s"o.$k")).reduce(_ && _)
    val joined = obs.alias("b").join(open.alias("o"), keyCond, "left_outer")
      .select(cols.map(c => col(s"b.$c").as(c)) ++
        attrs.map(a => col(s"o.$a").as(s"__cur_$a")) ++
        Seq(col("b.__ct").as("__ct"), col("b.__v").as("__v"),
          col(s"o.$ValidFromCol").as("__cur_from"), col("__matched")): _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val differs = attrs.map(a => !(col(a) <=> col(s"__cur_$a"))).reduce(_ || _)
      val isDel = col("__ct") === "delete"
      val closeMark = col("__matched") && (isDel || differs)
      val openMark = !isDel && (col("__matched").isNull || differs)
      // one preflight pass: order violations + anything-to-stage (feed
      // observations are key-unique by construction — no dup check)
      val pre = joined.agg(
        max(when(closeMark && col("__cur_from") >= col("__v"), lit(1L))
          .otherwise(lit(0L))),
        max(when(closeMark || openMark, lit(1L)).otherwise(lit(0L)))).head()
      require(pre.isNullAt(0) || pre.getLong(0) == 0L,
        s"scd2 feed from $source would close open rows at or before their " +
          "valid_from — the dimension holds effectives past this feed range " +
          "(was it maintained by a different source or by newer applyBatch calls?)")
      if (pre.isNullAt(1) || pre.getLong(1) == 0L) return dimSnap.get.version

      // one staged row per action, keyed (business key, valid_from):
      // a close names the open row it replaces, an open is a fresh key
      val closes = joined.filter(closeMark).select(cols.map(col) ++ Seq(
        col("__cur_from").as(ValidFromCol), col("__v").as("__to"),
        lit(false).as("__open")): _*)
      val opens = joined.filter(openMark).select(cols.map(col) ++ Seq(
        col("__v").as(ValidFromCol), lit(null).cast("long").as("__to"),
        lit(true).as("__open")): _*)
      LakeTable.mergeRows(spark, dim, closes.unionByName(opens), keys :+ ValidFromCol,
        matched = Seq(LakeTable.MatchedUpdate(Some(!col("s.__open")), Map(
          ValidToCol -> col("s.__to"), CurrentCol -> lit(false)))),
        notMatchedInsert = Seq((Some(col("s.__open")),
          (cols.map(c => c -> col(s"s.$c")) ++ Seq(
            ValidFromCol -> col(s"s.$ValidFromCol"),
            ValidToCol -> lit(null).cast("long"),
            CurrentCol -> lit(true))).toMap)),
        txn = Some(appId -> head))
    } finally joined.unpersist(blocking = false)
  }

  /** CDC-driven SCD Type 1: fold the change feed of lake table `source`
    * into a PLAIN keyed table at `dim` — latest attributes per business
    * key, no history (DLT's `STORED AS SCD TYPE 1`). Per key, the last
    * change in the unprocessed range wins (same collapse rules as
    * [[applyFeed]]); an upsert overwrites the key's row in place and a
    * DELETE removes the key outright. One mergeRows commit per
    * application — the delete, update and insert legs are clauses of
    * the SAME atomic merge, so readers never see a half-applied feed.
    *
    * Exactly-once discipline identical to [[applyFeed]]: the
    * application watermark rides the commit's txn stamp, so a
    * crashed-and-replayed application is a no-op. The final state
    * always equals a plain upsert replay of the source's history.
    */
  def applyFeedType1(spark: SparkSession, source: String, dim: String,
                     keys: Seq[String], attrs: Seq[String],
                     appId0: Option[String] = None): Long = {
    require(keys.nonEmpty && attrs.nonEmpty,
      "scd1 needs at least one business-key column and one tracked attribute")
    val appId = appId0.getOrElse(s"scd1:$source")
    val head = LakeTable.latestSnapshot(spark, source)
      .getOrElse(throw new IllegalArgumentException(s"no committed version at $source"))
      .version
    val dimSnap = LakeTable.latestSnapshot(spark, dim)
    val wm = dimSnap.flatMap(_.txns.get(appId))
    if (wm.exists(_ >= head)) return dimSnap.get.version
    val startV = wm.map(_ + 1).getOrElse(1L)
    val cols = keys ++ attrs

    // last change per key wins; on a same-commit tie (overwrite's
    // delete+reinsert) the non-delete row is the key's final state
    val feed = LakeTable.changes(spark, source, startV, head)
      .filter(col(LakeTable.ChangeTypeCol) =!= "update_preimage")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(LakeTable.CommitVersionCol).desc,
        (col(LakeTable.ChangeTypeCol) === "delete").asc)
    val obs = feed.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(cols.map(col) :+ col(LakeTable.ChangeTypeCol).as("__ct"): _*)

    if (dimSnap.isEmpty)
      return LakeTable.overwrite(spark, dim,
        obs.filter(col("__ct") =!= "delete").select(cols.map(col): _*),
        txn = Some(appId -> head))

    // an empty range stages nothing: skip the commit, leave the
    // watermark behind (re-scanning an empty range is idempotent)
    if (obs.limit(1).isEmpty) return dimSnap.get.version
    LakeTable.mergeRows(spark, dim, obs, keys,
      matched = Seq(
        LakeTable.MatchedDelete(Some(col("s.__ct") === "delete")),
        LakeTable.MatchedUpdate(None, attrs.map(a => a -> col(s"s.$a")).toMap)),
      notMatchedInsert = Seq((Some(col("s.__ct") =!= "delete"),
        cols.map(c => c -> col(s"s.$c")).toMap)),
      txn = Some(appId -> head))
  }

  /** Continuous SCD2: a change-feed stream on `source` triggers
    * [[applyFeed]] per micro-batch. The stream is a COMMIT-DRIVEN
    * SCHEDULER, nothing more — applyFeed re-reads the feed from its own
    * txn watermark, so exactly-once holds independently of the
    * checkpoint: a restart from a fresh (or deleted) checkpoint replays
    * the source history into no-op applications instead of double
    * closes. Delta's foreachBatch-merge pattern has the same shape; the
    * difference is that the idempotence token lives in the TARGET's
    * commit, not the engine's offset log.
    */
  def streamInto(spark: SparkSession, source: String, dim: String,
                 keys: Seq[String], attrs: Seq[String], checkpoint: String,
                 appId0: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("graft")
      .option("readChangeFeed", "true")
      .load(source)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyFeed(spark, source, dim, keys, attrs, appId0); ()
      }
      .start()
}
