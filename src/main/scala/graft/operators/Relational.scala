package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.Money
import graft.functions.Money.msum

/** Core relational query surface — the join/aggregate/window SQL shapes
  * the reference executes through Trino (ref:
  * defs/silver_transforms/defs.yaml, defs/gold_analytics/defs.yaml).
  *
  * Scale notes: every query is a declarative DataFrame plan so Catalyst
  * pushes filters/pruning into the parquet scans. Broadcast hints are
  * only placed on tables whose size is bounded by the schema
  * (region=5, nation=25 rows); anything that scales with the data
  * (customer, orders, supplier) is left to Catalyst/AQE statistics.
  * Facts shuffle at most once per aggregation key.
  */
object Relational {

  /** Wide aggregation with filter pushdown (TPC-H Q1 shape). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_base_price"),
        msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        Money.mavg(col("l_quantity")).as("avg_qty"),
        Money.mavg(col("l_extendedprice")).as("avg_price"),
        Money.mavg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** 3-way join + agg + deterministic top-N (TPC-H Q3 shape).
    * No broadcast hint on customer: it scales with the fact tables, so
    * the choice is left to Catalyst/AQE stats (auto-broadcast at test
    * scale, shuffle join at 100 TB).
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("order_date"), col("o_orderpriority"))
      .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("order_date"), col("l_orderkey"))
      .limit(10)
  }

  /** 6-way join with broadcast dimensions (TPC-H Q5 shape).
    * Broadcast hints only on the schema-bounded tables (nation=25,
    * region≤5 rows). Supplier scales linearly with data volume, so it is
    * left to Catalyst/AQE statistics — broadcast at test scale, shuffle
    * join at 100 TB — like customer/orders.
    */
  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
              col("o_orderdate") <  lit("1999-01-01").cast("timestamp"))
    val li   = Tables.lineitem(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(msum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
  }

  /** Top-N per group via window row_number — partition-local sort, one
    * shuffle on the partition key.
    */
  def topnPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val ord = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    ord.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
  }

  /** Set operations (INTERSECT / EXCEPT / UNION ALL): audience segment
    * sizes — customers who ordered vs users who purchased in events.
    */
  def customerSegments(spark: SparkSession, dir: String): DataFrame = {
    val buyers = Tables.orders(spark, dir).select(col("o_custkey").as("id")).distinct()
    val purchasers = Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("id")).distinct()
    def seg(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("segment"), col("n"))
    seg("buyers", buyers)
      .unionByName(seg("purchasers", purchasers))
      .unionByName(seg("both", buyers.intersect(purchasers)))
      .unionByName(seg("buyers_only", buyers.except(purchasers)))
      .unionByName(seg("purchasers_only", purchasers.except(buyers)))
  }

  /** Native pivot: event counts per market segment × event type. */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    ev.join(cust, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"))
      .pivot("event_type", Seq("view", "click", "signup", "purchase", "error"))
      .count()
      .na.fill(0L)
  }

  /** GROUP BY ROLLUP with GROUPING() disambiguation.
    *
    * Formulated as rollup-over-pre-aggregate: a native rollup Expands
    * every fact row once per level (×3) BEFORE the shuffle. The
    * measures are associative (exact decimal sums, counts), so the
    * fact is first aggregated at the full (flag, status) grain — one
    * ordinary map-side-combined shuffle — and the rollup, with its
    * Expand and native grouping() flags, runs over the
    * cardinality-bounded result. Bit-identical to the native form
    * (decimal sums re-aggregate exactly; RelationalPlanSpec proves
    * equality and that the shipped plan's Expand sits above the fact
    * aggregate, not on the scan).
    */
  def rollupSales(spark: SparkSession, dir: String): DataFrame = {
    val base = rollupSalesBase(spark, dir)
    base.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        round(sum(col("qd")), 2).cast("double").as("sum_qty"),
        round(sum(col("pd")), 2).cast("double").as("sum_price"),
        sum(col("cnt")).as("n"))
  }

  /** GROUP BY GROUPING SETS with mixed-granularity sets — the Trino
    * shape ROLLUP can't express: (flag, status), (ship_year), (flag),
    * and the grand total over the same fact, disambiguated by native
    * GROUPING() flags.
    *
    * Same formulation discipline as [[rollupSales]]: the measures are
    * associative, so the fact is first aggregated once at the union
    * grain (flag, status, ship_year) — one ordinary map-side-combined
    * shuffle — and the grouping-sets Expand (×4 per row) runs over the
    * cardinality-bounded pre-aggregate instead of every fact row.
    * RelationalPlanSpec proves bit-equality with the native form and
    * that the shipped Expand sits above the fact aggregate.
    */
  def groupingSetsSales(spark: SparkSession, dir: String): DataFrame = {
    val base = groupingSetsBase(spark, dir)
    base.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_year")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        grouping(col("ship_year")).cast("long").as("g_year"),
        round(sum(col("qd")), 2).cast("double").as("sum_qty"),
        round(sum(col("pd")), 2).cast("double").as("sum_price"),
        sum(col("cnt")).as("n"))
  }

  private def groupingSetsBase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    li.groupBy(col("l_returnflag"), col("l_linestatus"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        sum(col("l_quantity").cast(dec)).as("qd"),
        sum(col("l_extendedprice").cast(dec)).as("pd"),
        count(lit(1)).as("cnt"))
  }

  /** Native grouping-sets over the raw fact (Expand ×4 of every row) —
    * kept only as the equality baseline for RelationalPlanSpec.
    */
  private[graft] def groupingSetsSalesNative(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .withColumn("ship_year", year(col("l_shipdate")).cast("long"))
    li.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("ship_year")), Seq(col("l_returnflag")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"), col("ship_year"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        grouping(col("ship_year")).cast("long").as("g_year"),
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
  }

  private def rollupSalesBase(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast(dec)).as("qd"),
        sum(col("l_extendedprice").cast(dec)).as("pd"),
        count(lit(1)).as("cnt"))
  }

  /** Revenue mix per market segment × event type — deliberately run as
    * a SALTED replicated join ([[graft.functions.Skew.saltedJoin]]):
    * the event stream's user key is low-cardinality relative to the
    * cluster's task count (~150 distinct users here; at 100 TB, think
    * "tenant id" or "country"), so a plain shuffle join keys at most
    * |users| tasks and the hottest user's whole event history lands in
    * ONE task. Salting by 8 spreads every user over 8 shuffle
    * partitions; the dim side pays ×8 replication of 150 rows —
    * nothing. Result is bit-identical to the plain join (spec-pinned);
    * the DuckDB oracle replays it as the plain join.
    */
  def skewJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_type"), col("value"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey").cast("long").as("user_id"), col("c_mktsegment"))
    graft.functions.Skew.saltedJoin(ev, cust, Seq("user_id"), salt = 8)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"), msum(col("value")).as("sum_value"))
  }

  /** Native single-level rollup (Expand ×3 of the fact) — kept only as
    * the equality baseline for RelationalPlanSpec.
    */
  private[graft] def rollupSalesNative(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("long").as("g_flag"),
        grouping(col("l_linestatus")).cast("long").as("g_status"),
        msum(col("l_quantity")).as("sum_qty"),
        msum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).as("n"))
  }
}
