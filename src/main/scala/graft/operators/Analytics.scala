package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.{dsum, msum, rnd}

/** Gold-layer analytics models — Spark-native equivalent of the
  * reference's gold Trino models (ref: defs/gold_analytics/defs.yaml).
  *
  * Scale notes: each model is one shuffle on its GROUP BY key with
  * partial aggregation; scalar "top-1" subqueries are computed as 1-row
  * broadcast cross joins, never driver-side collects.
  */
object Analytics {

  /** gold_sales_metrics ⇄ ref enrollment_metrics (gold defs.yaml:13):
    * COUNT DISTINCT, conditional COUNT DISTINCT ratio (retention_rate),
    * AVG over a joined dim, count-per-distinct ratio (avg_class_size).
    *
    * Formulated as a two-level aggregation: a flat groupBy with four
    * countDistinct aggregates makes Spark Expand every fact row x4
    * before the shuffle. Pre-aggregating at (group keys, customer)
    * grain shrinks the fact shuffle (one distinct column instead of
    * three) and turns the customer-level distincts into plain
    * sums/flags — the order-grain distinct stays exact because an
    * order belongs to exactly one customer. Values are bit-identical
    * to the flat form: decimal sums are associative and the ratios
    * divide the same exact integers.
    */
  def goldSalesMetrics(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val perCustomer = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_returnflag"), col("c_mktsegment"), col("o_orderpriority"),
        col("o_custkey"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(dec)).as("qty_dec"),
        sum(col("c_acctbal").cast(dec)).as("acct_dec"),
        count(col("c_acctbal")).as("n_acct"),
        countDistinct(col("l_orderkey")).as("n_orders"),
        max(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("has_finished"),
        max(when(col("c_acctbal") < 0, 1L).otherwise(0L)).as("has_negative"))
    perCustomer
      .groupBy(col("l_returnflag"), col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("total_customers"),
        round(sum(col("qty_dec")), 2).cast("double").as("total_qty"),
        rnd(sum(col("acct_dec")).cast("double") / sum(col("n_acct")), 4).as("avg_acctbal"),
        rnd(sum(col("has_finished")).cast("double") /
          nullif(count(lit(1)), lit(0L)), 4).as("finished_rate"),
        sum(col("has_negative")).as("negative_bal_customers"),
        rnd(sum(col("n_rows")).cast("double") /
          nullif(sum(col("n_orders")), lit(0L)), 4).as("avg_order_lines"))
  }

  /** Flat single-groupBy formulation of [[goldSalesMetrics]] — four
    * countDistinct aggregates in one Aggregate, so Spark plans an
    * Expand that replicates every joined fact row once per distinct
    * column before the shuffle. Kept (not exported) as the measured
    * alternative: AnalyticsPlanSpec proves bit-identical results and
    * PLANS.md records the sf0.1 timings behind the choice of default.
    */
  private[graft] def goldSalesMetricsFlat(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_returnflag"), col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("total_customers"),
        round(sum(col("l_quantity").cast(dec)), 2).cast("double").as("total_qty"),
        rnd(sum(col("c_acctbal").cast(dec)).cast("double") /
          count(col("c_acctbal")), 4).as("avg_acctbal"),
        rnd(countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).cast("double") /
          nullif(countDistinct(col("o_custkey")), lit(0L)), 4).as("finished_rate"),
        countDistinct(when(col("c_acctbal") < 0, col("o_custkey"))).as("negative_bal_customers"),
        rnd(count(lit(1)).cast("double") /
          nullif(countDistinct(col("l_orderkey")), lit(0L)), 4).as("avg_order_lines"))
  }

  /** gold_finance ⇄ ref financial_aid_analytics (gold defs.yaml:52):
    * filtered agg + derived-key (YEAR) join to a second fact + budget
    * utilization ratio.
    *
    * Same two-level shape as [[goldSalesMetrics]]: pre-aggregate at
    * (year, segment, customer) so the fact shuffle carries no distinct
    * Expand, then count customers as rows. The yearly-totals join lands
    * AFTER aggregation on the ~35-row result instead of on every fact
    * row. Values are bit-identical (associative decimal sums, same
    * exact quotients); the oracle is unchanged.
    */
  def goldFinance(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val yearlyTotals = ord
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(dsum(col("o_totalprice")).as("yearly_total"))
    val product = col("l_extendedprice") * col("l_discount")
    val perCustomer = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("l_discount") > 0)
      .groupBy(year(col("o_orderdate")).as("yr"), col("c_mktsegment"), col("o_custkey"))
      .agg(
        sum(product.cast(dec)).as("disc_dec"),
        count(product).as("n_lines"))
    perCustomer
      .groupBy(col("yr"), col("c_mktsegment"))
      .agg(
        count(lit(1)).as("total_customers"),
        sum(col("disc_dec")).as("disc_dec"),
        sum(col("n_lines")).as("n_lines"))
      .join(broadcast(yearlyTotals), Seq("yr"), "left")
      .select(
        col("yr").cast("string").as("fiscal_year"),
        col("c_mktsegment"),
        col("total_customers"),
        round(col("disc_dec"), 2).cast("double").as("total_discount"),
        rnd(col("disc_dec").cast("double") * 0.92, 2).as("total_disbursed"),
        rnd(col("disc_dec").cast("double") / col("n_lines"), 4).as("avg_discount_per_line"),
        rnd(col("disc_dec").cast("double") /
          nullif(col("yearly_total"), lit(0.0)), 6).as("budget_utilization"))
  }

  /** Flat formulation of [[goldFinance]] (one countDistinct → Expand×2);
    * see [[goldSalesMetricsFlat]].
    */
  private[graft] def goldFinanceFlat(spark: SparkSession, dir: String): DataFrame = {
    val li   = Tables.lineitem(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val yearlyTotals = ord
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(dsum(col("o_totalprice")).as("yearly_total"))
    val product = col("l_extendedprice") * col("l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("l_discount") > 0)
      .groupBy(year(col("o_orderdate")).as("yr"), col("c_mktsegment"))
      .agg(
        countDistinct(col("o_custkey")).as("total_customers"),
        sum(product.cast(dec)).as("disc_dec"),
        count(product).as("n_lines"))
      .join(broadcast(yearlyTotals), Seq("yr"), "left")
      .select(
        col("yr").cast("string").as("fiscal_year"),
        col("c_mktsegment"),
        col("total_customers"),
        round(col("disc_dec"), 2).cast("double").as("total_discount"),
        rnd(col("disc_dec").cast("double") * 0.92, 2).as("total_disbursed"),
        rnd(col("disc_dec").cast("double") / col("n_lines"), 4).as("avg_discount_per_line"),
        rnd(col("disc_dec").cast("double") /
          nullif(col("yearly_total"), lit(0.0)), 6).as("budget_utilization"))
  }

  /** gold_funnel ⇄ ref admissions_funnel (gold defs.yaml:91):
    * pivot-style conditional counts, yield/melt rates, top-1 scalar
    * subquery (tie-broken for determinism — ref's ORDER BY COUNT(*) DESC
    * LIMIT 1 is ambiguous on ties).
    */
  def goldFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    val top1 = ev.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("event_type"))
      .limit(1)
      .select(col("event_type").as("top_event_type"))
    def stage(t: String) = count(when(col("event_type") === t, 1))
    ev.join(cust, col("user_id") === col("c_custkey"), "left")
      .groupBy(coalesce(col("c_mktsegment"), lit("Unknown")).as("segment"))
      .agg(
        stage("view").as("inquiries"),
        stage("click").as("applications"),
        stage("signup").as("admits"),
        stage("purchase").as("enrolled"),
        stage("error").as("errors"),
        rnd(stage("purchase").cast("double") / nullif(stage("signup"), lit(0)), 4).as("yield_rate"),
        rnd((stage("signup") - stage("purchase")).cast("double") /
          nullif(stage("signup"), lit(0)), 4).as("melt_rate"),
        msum(col("value")).as("expected_revenue"))
      .crossJoin(broadcast(top1))
  }
}
