package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.lake.{Incremental, LakeTable}

/** End-to-end incremental aggregation (ref behavior: the daily
  * recompute-the-world CREATE TABLE AS transforms of
  * trino_iceberg_transform_component.py:116-129 — this is the
  * propagate-the-delta upgrade): a lake copy of `orders` goes through
  * overwrite → append → copy-on-write DELETE, and after each commit
  * the target aggregate is refreshed from the CHANGE FEED only, never
  * by rescanning the source. The final aggregate must equal a plain
  * GROUP BY over the surviving rows — which is exactly what the
  * DuckDB oracle checks, making the whole lake+CDF+merge machinery
  * correctness-gated, not just spec-covered.
  *
  * Measures are summed as DECIMAL(38,6): decimal addition is exact
  * and associative, so folding the feed's partial sums matches the
  * oracle's one-shot sum bit for bit.
  */
object IncrementalOps {

  def incrAgg(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_incr")
    val src = s"$work/orders_lake"
    val tgt = s"$work/orders_by_priority"
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority", "o_totalprice")
    val measures = Map(
      "total_price" -> col("o_totalprice").cast(DecimalType(38, 6)))

    // v1: half the corpus lands; the first refresh is the full build
    LakeTable.overwrite(spark, src, orders.filter(col("o_orderkey") % 2 === 0))
    Incremental.refreshAgg(spark, src, tgt, Seq("o_orderpriority"), measures)
    // v2: the other half appends; refresh folds just the feed
    LakeTable.append(spark, src, orders.filter(col("o_orderkey") % 2 =!= 0))
    Incremental.refreshAgg(spark, src, tgt, Seq("o_orderpriority"), measures)
    // v3: a copy-on-write delete; refresh subtracts the pre-images
    LakeTable.delete(spark, src, col("o_orderkey") % 10 === 7)
    Incremental.refreshAgg(spark, src, tgt, Seq("o_orderpriority"), measures)

    LakeTable.read(spark, tgt).select(
      col("o_orderpriority"),
      col(Incremental.RowsCol).as("n_rows"),
      round(col("total_price"), 2).cast("double").as("total_price"))
  }

  val oracleSql: String =
    """SELECT o_orderpriority, count(*) AS n_rows,
       CAST(round(sum(CAST(o_totalprice AS DECIMAL(38,6))), 2) AS DOUBLE) AS total_price
       FROM orders WHERE o_orderkey % 10 <> 7 GROUP BY 1"""

  /** End-to-end incremental JOIN view ([[Incremental.refreshJoin]]):
    * an orders⋈customer enrichment view (the reference's fact-to-dim
    * silver transforms, silver defs.yaml:149 — re-run there as full
    * CREATE TABLE AS) maintained for the cost of the change across a
    * two-sided history: left append, right UPDATE (every dependent
    * fact re-derives), right DELETE (inner join drops its facts), and
    * a left delete. The final view must equal a plain join of the
    * final states — exactly what the DuckDB oracle replays.
    */
  def incrJoin(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_incrj")
    val l = s"$work/orders_lake"
    val r = s"$work/customer_lake"
    val tgt = s"$work/orders_enriched"
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.customer(spark, dir)
      .select("c_custkey", "c_name", "c_mktsegment")
    def refresh(): Long = Incremental.refreshJoin(spark, l, r, tgt,
      Seq("o_orderkey"), Seq("o_custkey" -> "c_custkey"))

    LakeTable.overwrite(spark, l, orders.filter(col("o_orderkey") % 2 === 0))
    LakeTable.overwrite(spark, r, customer)
    refresh() // initial build
    LakeTable.append(spark, l, orders.filter(col("o_orderkey") % 2 =!= 0))
    refresh() // left append: only the new keys compute
    LakeTable.update(spark, r, Seq("c_mktsegment" -> lit("VIP")),
      col("c_custkey") % 10 === 1)
    refresh() // dim update: dependents re-derive
    LakeTable.delete(spark, r, col("c_custkey") % 17 === 3)
    refresh() // dim retirement: inner join drops its facts
    LakeTable.delete(spark, l, col("o_orderkey") % 10 === 7)
    refresh() // fact delete: tombstones

    LakeTable.read(spark, tgt).select(
      col("o_orderkey"), col("o_custkey"),
      col("o_totalprice").cast("double").as("o_totalprice"),
      col("c_name"), col("c_mktsegment"))
  }

  val joinOracleSql: String =
    """SELECT o.o_orderkey, o.o_custkey,
              CAST(o.o_totalprice AS DOUBLE) AS o_totalprice, c.c_name,
              CASE WHEN c.c_custkey % 10 = 1 THEN 'VIP'
                   ELSE c.c_mktsegment END AS c_mktsegment
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE o.o_orderkey % 10 <> 7 AND c.c_custkey % 17 <> 3"""

  /** Incremental quantiles ([[Incremental.refreshQuantiles]]): per-type
    * event-value percentiles maintained as mergeable Greenwald-Khanna
    * partials — two batches, two appended partials per type, final
    * p50/p90/p99 from the merged summary. No SQL oracle (summary
    * binaries); the spec pins each estimate inside the exact
    * [q−eps, q+eps] percentile envelope.
    */
  def incrQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_incrq")
    val src = s"$work/events_lake"
    val tgt = s"$work/value_sketches"
    val ev = Tables.events(spark, dir).select("event_id", "event_type", "value")
    LakeTable.overwrite(spark, src, ev.filter(col("event_id") % 2 === 0))
    Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value")
    LakeTable.append(spark, src, ev.filter(col("event_id") % 2 =!= 0))
    Incremental.refreshQuantiles(spark, src, tgt, Seq("event_type"), "value")
    Incremental.quantileEstimate(spark, tgt, Seq("event_type"),
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
      .orderBy(col("event_type"))
  }

  /** Incremental DISTINCT maintenance via mergeable HLL sketch partials
    * ([[Incremental.refreshSketch]]): an append-only events lake lands
    * in two batches, each refresh appends one sketch partial per
    * event_type from JUST that batch's feed, and the final estimate
    * unions the partials — distinct users per event type without ever
    * rescanning the stream. No SQL oracle (sketch binaries are
    * engine-specific); IncrementalSketchSpec pins the merged estimate
    * EQUAL to the one-shot sketch over all data (union associativity)
    * and within 5% of exact countDistinct, and proves replay is a
    * no-op and a deleting source refuses.
    */
  /** Incremental heavy hitters ([[Incremental.refreshHeavyHitters]]):
    * the documents corpus lands in two batches, each refresh appends
    * one Count-Min partial + the batch's exact top-100 candidate
    * counts, and the final top-20 is CMS-ranked but emitted with the
    * candidates' exact merged batch counts
    * ([[Incremental.heavyHittersExact]]) — term frequency without
    * rescanning the corpus, and a result DuckDB replays exactly
    * (per-batch top-100 + GROUP BY + rank), so the whole
    * refresh/merge/rank path sits behind the hash gate. HeavyHitterSpec
    * additionally pins CMS-rank == exact-rank and estimates within
    * eps·N above truth.
    */
  def incrTopk(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_incrtk")
    val src = s"$work/docs_lake"
    val tgt = s"$work/term_sketches"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val terms = graft.functions.TextFns.tokens(lower(col("text")))
    LakeTable.overwrite(spark, src, docs.filter(col("doc_id") % 2 === 0))
    Incremental.refreshHeavyHitters(spark, src, tgt, terms)
    LakeTable.append(spark, src, docs.filter(col("doc_id") % 2 =!= 0))
    Incremental.refreshHeavyHitters(spark, src, tgt, terms)
    Incremental.heavyHittersExact(spark, tgt, k = 20)
  }

  def incrDistinct(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_incrd")
    val src = s"$work/events_lake"
    val tgt = s"$work/user_sketches"
    val ev = Tables.events(spark, dir).select("event_id", "user_id", "event_type")
    LakeTable.overwrite(spark, src, ev.filter(col("event_id") % 2 === 0))
    Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id")
    LakeTable.append(spark, src, ev.filter(col("event_id") % 2 =!= 0))
    Incremental.refreshSketch(spark, src, tgt, Seq("event_type"), "user_id")
    Incremental.sketchEstimate(spark, tgt, Seq("event_type"), "approx_users")
      .orderBy(col("event_type"))
  }
}
