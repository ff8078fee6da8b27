package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.lake.{LakeTable, Scd2}

/** SCD Type-2 end to end (ref: the silver dim_* transforms of
  * silver defs.yaml, which rebuild the dimension each run and keep no
  * history — this is the keep-full-history upgrade): orders act as a
  * change stream observing each customer's (status, priority), split
  * into three effective batches by order date; each batch folds into a
  * versioned dimension via [[Scd2.applyBatch]] — one atomic MERGE
  * per batch, closing changed rows and opening successors. The final
  * interval table must equal an independent replay of the same
  * observation history — exactly what the DuckDB oracle computes with
  * window functions (consecutive-change compression + lead() closing).
  */
object Scd2Ops {

  private val Cut1 = "1994-01-01"
  private val Cut2 = "1996-01-01"

  /** The effective batch index of an order date (1/2/3 by the cuts). */
  private def batchOf(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(d < lit(Cut1).cast("timestamp"), lit(1L))
      .when(d < lit(Cut2).cast("timestamp"), lit(2L))
      .otherwise(lit(3L))

  /** Build the customer-status dimension from three orders-derived
    * observation batches; returns the dim's lake path.
    */
  private def buildDim(spark: SparkSession, dir: String): String = {
    val work = Work.dir("graft_scd2")
    val dim = s"$work/customer_status_dim"
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")

    // one observation per key per batch: the latest order decides what
    // the batch "saw" (deterministic tie-break on order key)
    def observed(b: DataFrame): DataFrame = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      b.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("o_custkey").as("c_key"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
    }
    val cut1 = lit(Cut1).cast("timestamp")
    val cut2 = lit(Cut2).cast("timestamp")
    Seq(
      1L -> orders.filter(col("o_orderdate") < cut1),
      2L -> orders.filter(col("o_orderdate") >= cut1 && col("o_orderdate") < cut2),
      3L -> orders.filter(col("o_orderdate") >= cut2)
    ).foreach { case (eff, b) =>
      Scd2.applyBatch(spark, dim, observed(b),
        keys = Seq("c_key"), attrs = Seq("status", "priority"), effective = eff)
    }
    dim
  }

  def scd2Dim(spark: SparkSession, dir: String): DataFrame =
    LakeTable.read(spark, buildDim(spark, dir))
      .select("c_key", "status", "priority", "valid_from", "valid_to", "is_current")

  /** Point-in-time enrichment ([[Scd2.joinAsOf]]): every order joins
    * the dimension row covering the order's OWN batch — an order from
    * batch 1 sees batch-1 attributes even after the key changed in
    * batch 3 (no future leakage), which a plain join to the latest dim
    * state gets wrong. Equi-join on the key with the interval as a
    * residual; fact cardinality preserved (intervals don't overlap).
    */
  def scd2Join(spark: SparkSession, dir: String): DataFrame = {
    val dim = buildDim(spark, dir)
    val facts = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        batchOf(col("o_orderdate")).as("at_version"))
    Scd2.joinAsOf(facts, LakeTable.read(spark, dim),
        keys = Seq("o_custkey" -> "c_key"), at = col("at_version"))
      .select("o_orderkey", "o_custkey", "at_version", "status", "priority")
  }

  /** CDC-driven SCD2 end to end: a customer lake goes through
    * overwrite → two UPDATEs → DELETE, and [[Scd2.applyFeed]] folds the
    * change feed into the dimension twice (initial build, then the
    * three DML commits in one application). Effective versions are the
    * SOURCE's commit versions; the two updates land within one feed
    * range, so a key touched by both collapses to its final state (the
    * intermediate never becomes an interval — batch CDC semantics) and
    * the delete retires its key. The oracle replays the scripted DML
    * per key class.
    */
  def scd2Cdc(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_scd2cdc")
    val src = s"$work/customer_lake"
    val dim = s"$work/customer_dim"
    val customer = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    def feed(): Long = Scd2.applyFeed(spark, src, dim,
      keys = Seq("c_custkey"), attrs = Seq("c_mktsegment", "c_acctbal"))

    LakeTable.overwrite(spark, src, customer) // v1
    feed() // initial build: every key opens at valid_from = 1
    LakeTable.update(spark, src, Seq("c_mktsegment" -> lit("VIP")),
      col("c_custkey") % 10 === 1) // v2
    LakeTable.update(spark, src, Seq("c_acctbal" -> (col("c_acctbal") + 100)),
      col("c_custkey") % 7 === 3) // v3
    LakeTable.delete(spark, src, col("c_custkey") % 17 === 5) // v4
    feed() // folds v2..v4: last change per key wins

    LakeTable.read(spark, dim).select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal").cast("double").as("c_acctbal"),
      col("valid_from"), col("valid_to"), col("is_current"))
  }

  /** CDC-driven SCD TYPE 1 end to end ([[Scd2.applyFeedType1]], the
    * semantics behind `APPLY CHANGES INTO … STORED AS SCD TYPE 1` —
    * the statement form itself is spec-driven in SqlSurfaceSpec, since
    * the Verify session carries no parser extensions): the same
    * scripted source DML as [[scd2Cdc]], folded into a PLAIN keyed
    * dimension — latest attributes only, no history; the feed's DELETE
    * removes its keys outright. The oracle replays the final state as
    * one upsert pass over the source history, so a hash match proves
    * "TYPE 1 == overwrite-in-place" against an independent engine.
    */
  def scd1Cdc(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_scd1cdc")
    val src = s"$work/customer_lake"
    val dim = s"$work/customer_dim"
    val customer = Tables.customer(spark, dir)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    def feed(): Unit = Scd2.applyFeedType1(spark, src, dim,
      keys = Seq("c_custkey"), attrs = Seq("c_mktsegment", "c_acctbal"))

    LakeTable.overwrite(spark, src, customer) // v1
    feed() // initial build: plain keyed copy
    LakeTable.update(spark, src, Seq("c_mktsegment" -> lit("VIP")),
      col("c_custkey") % 10 === 1) // v2
    LakeTable.update(spark, src, Seq("c_acctbal" -> (col("c_acctbal") + 100)),
      col("c_custkey") % 7 === 3) // v3
    LakeTable.delete(spark, src, col("c_custkey") % 17 === 5) // v4
    feed() // folds v2..v4 as one atomic delete/update/insert merge

    LakeTable.read(spark, dim).select(col("c_custkey"), col("c_mktsegment"),
      col("c_acctbal").cast("double").as("c_acctbal"))
  }

  /** One-pass upsert replay: composed updates for survivors, deleted
    * keys gone, no bookkeeping columns.
    */
  val scd1OracleSql: String =
    """SELECT c_custkey,
         CASE WHEN c_custkey % 10 = 1 THEN 'VIP' ELSE c_mktsegment END AS c_mktsegment,
         CAST(CASE WHEN c_custkey % 7 = 3 THEN c_acctbal + 100
                   ELSE c_acctbal END AS DOUBLE) AS c_acctbal
       FROM customer WHERE c_custkey % 17 <> 5"""

  /** Replay of the scripted DML per key class: deleted keys keep one
    * closed original row; updated survivors close at their LAST update
    * and reopen with the composed attributes; untouched keys stay open.
    */
  val cdcOracleSql: String =
    """WITH t AS (SELECT c_custkey AS k, c_mktsegment AS seg, c_acctbal AS bal,
           c_custkey % 17 = 5 AS del, c_custkey % 7 = 3 AS u3,
           c_custkey % 10 = 1 AS u2
         FROM customer),
       orig AS (SELECT k, seg, CAST(bal AS DOUBLE) AS bal,
           CAST(1 AS BIGINT) AS valid_from,
           CAST(CASE WHEN del THEN 4 WHEN u3 THEN 3 WHEN u2 THEN 2 END AS BIGINT) AS valid_to,
           NOT (del OR u3 OR u2) AS is_current
         FROM t),
       succ AS (SELECT k,
           CASE WHEN u2 THEN 'VIP' ELSE seg END AS seg,
           CAST(CASE WHEN u3 THEN bal + 100 ELSE bal END AS DOUBLE) AS bal,
           CAST(CASE WHEN u3 THEN 3 ELSE 2 END AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
         FROM t WHERE NOT del AND (u3 OR u2))
       SELECT k AS c_custkey, seg AS c_mktsegment, bal AS c_acctbal,
              valid_from, valid_to, is_current FROM orig
       UNION ALL
       SELECT k, seg, bal, valid_from, valid_to, is_current FROM succ"""

  /** Shared replay CTEs: per-batch observation pick + consecutive-
    * change compression per key (the change rows the intervals derive
    * from).
    */
  private val dimCte: String =
    s"""ob AS (
         SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate, o_orderkey,
           CASE WHEN o_orderdate < TIMESTAMP '$Cut1' THEN 1
                WHEN o_orderdate < TIMESTAMP '$Cut2' THEN 2 ELSE 3 END AS b
         FROM orders),
       pick AS (
         SELECT o_custkey AS c_key, o_orderstatus AS status,
                o_orderpriority AS priority, b
         FROM (SELECT *, row_number() OVER (PARTITION BY b, o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM ob)
         WHERE rn = 1),
       seq AS (
         SELECT *, lag(status) OVER w AS ps, lag(priority) OVER w AS pp
         FROM pick WINDOW w AS (PARTITION BY c_key ORDER BY b)),
       chg AS (
         SELECT c_key, status, priority, b FROM seq
         WHERE ps IS NULL OR status <> ps OR priority <> pp)"""

  /** Independent replay: intervals from lead() over the change rows. */
  val oracleSql: String =
    s"""WITH $dimCte
       SELECT c_key, status, priority, CAST(b AS BIGINT) AS valid_from,
         CAST(lead(b) OVER (PARTITION BY c_key ORDER BY b) AS BIGINT) AS valid_to,
         lead(b) OVER (PARTITION BY c_key ORDER BY b) IS NULL AS is_current
       FROM chg"""

  /** The replayed dimension joined back to every order at the order's
    * own batch — the point-in-time enrichment ground truth.
    */
  val joinOracleSql: String =
    s"""WITH $dimCte,
       dim AS (
         SELECT c_key, status, priority, b AS valid_from,
           lead(b) OVER (PARTITION BY c_key ORDER BY b) AS valid_to
         FROM chg),
       f AS (
         SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderdate < TIMESTAMP '$Cut1' THEN 1
                WHEN o_orderdate < TIMESTAMP '$Cut2' THEN 2 ELSE 3 END AS b
         FROM orders)
       SELECT f.o_orderkey, f.o_custkey, CAST(f.b AS BIGINT) AS at_version,
         d.status, d.priority
       FROM f JOIN dim d ON f.o_custkey = d.c_key
         AND d.valid_from <= f.b AND (d.valid_to IS NULL OR d.valid_to > f.b)"""
}
