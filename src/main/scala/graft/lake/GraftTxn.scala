package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Coordinated multi-table publish: the WRITE-side counterpart of
  * [[graft.GraftCatalog]]'s snapshot pin. A transaction opens a WAP
  * branch ([[LakeTable.shallowClone]]) per participating table, takes
  * arbitrary writes/DML on the branches invisibly, then `commit`
  * publishes every branch — journaled, crash-recoverable, and replay-
  * idempotent — so a gold build that must move N tables together
  * (facts + dims + a manifest) either lands everywhere or can always
  * be rolled FORWARD to completion.
  *
  * What is (and is not) guaranteed — stated precisely because the
  * half-true version of this feature is worse than its absence:
  *
  *  - **All-or-nothing, eventually.** Before the first publish, a
  *    journal records the full plan via the same atomic put-if-absent
  *    primitive snapshots use. A coordinator that dies mid-commit
  *    leaves the journal; [[recover]] replays the remaining publishes.
  *    Each publish carries a txn watermark
  *    (`LakeTable.publish(txn = _)`) checked under the destination's
  *    own commit race, so replays — including a replay racing a
  *    not-actually-dead coordinator — can never double-apply a delta.
  *  - **Per-table atomicity, not cross-table atomicity.** Readers of
  *    table A may see the published state while table B is still
  *    pre-publish (the window is one publish commit wide). Readers
  *    needing one consistent instant across tables pin with
  *    [[graft.GraftCatalog.pinLake]] — pin-after-commit sees all-new,
  *    pin-before sees all-old. A shared cross-table log could close
  *    the window but would serialize unrelated tables' commits; the
  *    pin + forward-recovery pair is the deliberate trade (it is the
  *    same one Iceberg's multi-table REST commits make).
  *  - **Conflicts refuse, they do not roll back.** If a source's
  *    write-set moved under a branch (the [[LakeTable.publish]]
  *    conflict rule), commit/recover throws with the journal intact;
  *    already-published tables stay published (their commits were
  *    individually valid). Disjoint concurrent appends are NOT
  *    conflicts — publish fast-forwards over them — so the refusal
  *    surface is real contention on the branch's write-set, the case
  *    that must be re-audited anyway. Compensating restores are
  *    deliberately not automated: restoring a published table that
  *    has since taken unrelated commits would destroy them.
  *
  * Layout under `workDir`: `<id>/b<i>-<name>` branch tables, plus
  * `_txn/<id>.json` (the journal, atomic claim) and `_txn/<id>.done`
  * (completion marker, advisory — recovery recomputes from watermarks).
  *
  * Ref: the reference materializes multiple downstream Iceberg assets
  * per run (gold defs.yaml) and relies on Dagster-level retries for
  * partial failures; this makes the retry safe and the partial state
  * diagnosable.
  */
object GraftTxn {

  /** An open transaction: `pairs` maps each source table to its
    * private WAP branch. Write to `branch(src)` (or the pairs
    * directly) with any lake API, then [[commit]].
    */
  final case class Txn(id: String, workDir: String,
                       pairs: Seq[(String, String)], copy: Boolean,
                       aborted: Boolean = false) {
    def branch(src: String): String =
      pairs.collectFirst { case (s, b) if s == src => b }.getOrElse(
        throw new IllegalArgumentException(s"$src is not part of txn $id"))
  }

  private def appId(id: String): String = s"graft-txn:$id"
  private def journalPath(workDir: String, id: String) =
    new Path(s"$workDir/_txn/$id.json")
  private def donePath(workDir: String, id: String) =
    new Path(s"$workDir/_txn/$id.done")

  /** Open a transaction over `srcs`: one shallow-clone branch per
    * table under `workDir/<id>/`. The clones are zero-copy metadata;
    * nothing is visible to source readers until [[commit]].
    */
  def begin(spark: SparkSession, srcs: Seq[String], workDir: String,
            id: String = java.util.UUID.randomUUID().toString,
            copy: Boolean = true): Txn = {
    require(srcs.nonEmpty, "a transaction needs at least one table")
    require(srcs.distinct.size == srcs.size,
      s"duplicate tables in transaction: ${srcs.mkString(", ")}")
    require(!id.contains('/') && id.nonEmpty, s"invalid txn id '$id'")
    val f = LakeTable.fs(spark, workDir)
    if (f.exists(journalPath(workDir, id))) {
      // an abort tombstone is a dead end for recover() too — say so
      // instead of suggesting a remedy that will also refuse
      val existing = readJournal(spark, workDir, id)
      throw new IllegalArgumentException(
        if (existing.aborted) s"txn $id was aborted — pick a fresh id"
        else s"txn $id already has a journal under $workDir — it was (at " +
          "least partially) committed; recover() it or pick a fresh id")
    }
    val pairs = srcs.zipWithIndex.map { case (src, i) =>
      val name = new Path(src).getName
      val b = s"$workDir/$id/b$i-$name"
      LakeTable.shallowClone(spark, src, b)
      (src, b)
    }
    Txn(id, workDir, pairs, copy)
  }

  /** Publish every branch onto its source. Claims the journal first
    * (atomic put-if-absent — the point of no return), then publishes
    * in plan order with per-table txn watermarks. Throws on a
    * write-set conflict with the journal intact: fix the contention
    * (or wait out the race) and [[recover]]. Returns src → published
    * version.
    */
  def commit(spark: SparkSession, txn: Txn): Map[String, Long] = {
    val f = LakeTable.fs(spark, txn.workDir)
    val jp = journalPath(txn.workDir, txn.id)
    if (!f.exists(jp)) {
      val tmp = new Path(s"${txn.workDir}/_txn/.${txn.id}.${
        java.util.UUID.randomUUID()}.tmp")
      f.mkdirs(tmp.getParent)
      val out = f.create(tmp, false)
      try out.write(journalJson(txn).getBytes("UTF-8")) finally out.close()
      if (!LakeTable.publishIfAbsent(f, tmp, jp)) {
        // lost the claim: legal only if it is OUR plan (a retry of this
        // same txn); an abort tombstone or a different plan is refused
        val theirs = readJournal(spark, txn.workDir, txn.id)
        require(!theirs.aborted,
          s"txn ${txn.id} was aborted — its branches are gone; begin a fresh txn")
        require(theirs.pairs == txn.pairs && theirs.copy == txn.copy,
          s"txn ${txn.id}: journal already claimed with a DIFFERENT plan")
      }
    } else {
      val theirs = readJournal(spark, txn.workDir, txn.id)
      require(!theirs.aborted,
        s"txn ${txn.id} was aborted — its branches are gone; begin a fresh txn")
      require(theirs.pairs == txn.pairs && theirs.copy == txn.copy,
        s"txn ${txn.id}: journal already claimed with a DIFFERENT plan")
    }
    publishAll(spark, txn)
  }

  /** Roll an interrupted [[commit]] forward: re-publish every pair in
    * the journal. Already-landed publishes no-op on their watermark,
    * so recovery is safe to run any number of times, including
    * concurrently with a coordinator that turns out not to be dead.
    */
  def recover(spark: SparkSession, workDir: String, id: String): Map[String, Long] = {
    val txn = readJournal(spark, workDir, id)
    require(!txn.aborted,
      s"txn $id was aborted — nothing to roll forward; begin a fresh txn")
    publishAll(spark, txn)
  }

  /** Discard a transaction whose commit was never claimed: claims the
    * journal with an ABORT tombstone (same atomic put-if-absent
    * primitive commit uses, so abort and a racing commit serialize on
    * the journal path — whichever claims first wins, the loser refuses)
    * and only then deletes the branch tables. Refuses once a commit
    * journal exists (some publishes may have landed — roll forward
    * instead). Idempotent: re-aborting an aborted txn is a no-op.
    */
  def abort(spark: SparkSession, txn: Txn): Unit = {
    val f = LakeTable.fs(spark, txn.workDir)
    val jp = journalPath(txn.workDir, txn.id)
    if (!f.exists(jp)) {
      val tmp = new Path(s"${txn.workDir}/_txn/.${txn.id}.${
        java.util.UUID.randomUUID()}.abort.tmp")
      f.mkdirs(tmp.getParent)
      val out = f.create(tmp, false)
      val tomb = Txn(txn.id, txn.workDir, txn.pairs, txn.copy, aborted = true)
      try out.write(journalJson(tomb).getBytes("UTF-8"))
      finally out.close()
      if (LakeTable.publishIfAbsent(f, tmp, jp)) {
        // tombstone claimed: no commit can start now — safe to delete branches
        f.delete(new Path(s"${txn.workDir}/${txn.id}"), true)
        return
      }
      f.delete(tmp, false)
    }
    // journal already claimed: a prior abort (idempotent re-delete) or a
    // commit (refuse — publishes may have landed, roll forward instead)
    val theirs = readJournal(spark, txn.workDir, txn.id)
    if (theirs.aborted) {
      f.delete(new Path(s"${txn.workDir}/${txn.id}"), true)
    } else {
      throw new IllegalStateException(
        s"txn ${txn.id} has a claimed commit journal — it cannot be aborted, " +
          "only recover()ed forward")
    }
  }

  /** True iff every publish in the journal has landed (all watermarks
    * current) — computed from the tables, not the advisory marker.
    */
  def isCommitted(spark: SparkSession, workDir: String, id: String): Boolean = {
    val txn = readJournal(spark, workDir, id)
    !txn.aborted && txn.pairs.forall { case (src, _) =>
      LakeTable.latestSnapshot(spark, src)
        .exists(_.txns.get(appId(txn.id)).exists(_ >= 1L))
    }
  }

  private def publishAll(spark: SparkSession, txn: Txn): Map[String, Long] = {
    val versions = txn.pairs.map { case (src, branch) =>
      src -> LakeTable.publish(spark, src, branch, copy = txn.copy,
        txn = Some(appId(txn.id) -> 1L))
    }.toMap
    val f = LakeTable.fs(spark, txn.workDir)
    val done = donePath(txn.workDir, txn.id)
    if (!f.exists(done)) {
      val out = f.create(done, true)
      try out.write("done\n".getBytes("UTF-8")) finally out.close()
    }
    versions
  }

  // Journal wire format: tiny, line-oriented JSON built with the same
  // escaping discipline as the snapshot log (paths may contain quotes).
  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def journalJson(txn: Txn): String = {
    val pairs = txn.pairs.map { case (s, b) =>
      s"""{"src":${jstr(s)},"branch":${jstr(b)}}"""
    }.mkString("[", ",", "]")
    s"""{"id":${jstr(txn.id)},"copy":${txn.copy},"aborted":${txn.aborted},""" +
      s""""pairs":$pairs}""" + "\n"
  }

  private def readJournal(spark: SparkSession, workDir: String, id: String): Txn = {
    val f = LakeTable.fs(spark, workDir)
    val jp = journalPath(workDir, id)
    require(f.exists(jp), s"no journal for txn $id under $workDir")
    val in = f.open(jp)
    val raw = try {
      val bs = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bs, 65536, false)
      bs.toString("UTF-8")
    } finally in.close()
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    val j = JsonMethods.parse(raw)
    val pairs = (j \ "pairs") match {
      case JArray(ps) => ps.map(p =>
        ((p \ "src").extract[String], (p \ "branch").extract[String]))
      case _ => throw new IllegalStateException(s"malformed journal for txn $id")
    }
    val aborted = (j \ "aborted") match {
      case JBool(b) => b
      case _ => false // pre-tombstone journals carry no flag
    }
    Txn((j \ "id").extract[String], workDir, pairs,
      (j \ "copy").extract[Boolean], aborted)
  }
}
