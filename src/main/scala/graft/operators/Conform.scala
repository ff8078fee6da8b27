package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Silver-layer conforming transforms — the Spark-native equivalent of
  * the reference's Trino/Iceberg silver layer (ref:
  * defs/silver_transforms/defs.yaml). Each transform mirrors one
  * reference transform's SQL shape over the testdata star schema.
  *
  * The reference mints surrogate keys with UUID() (nondeterministic);
  * here keys are md5 of the natural key so results are reproducible and
  * oracle-comparable — at scale this also makes the transforms
  * idempotent re-runs instead of append-only drift.
  *
  * Scale notes: nation/region (schema-bounded) are broadcast-hinted;
  * customer-scale joins are left to AQE. The DISTINCT semi-join flag
  * (ref dim_students.is_athlete) is expressed as a pre-aggregated key
  * set joined once, not a row-multiplying join.
  */
object Conform {

  private def sk(cols: Column*): Column = md5(concat_ws("-", cols: _*).cast("binary"))

  /** dim_customer ⇄ ref dim_students (defs.yaml:12): multi-way LEFT
    * JOIN, DISTINCT-subquery flag, COALESCE default, concat label.
    */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir)
    val buyers = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
    cust
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"), "left")
      .join(buyers, col("c_custkey") === col("o_custkey"), "left")
      .select(
        sk(col("c_custkey")).as("customer_key"),
        col("c_custkey"),
        col("c_name"),
        concat_ws(" / ", col("c_name"), col("c_mktsegment")).as("customer_label"),
        col("c_mktsegment"),
        col("c_acctbal"),
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"),
        coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"),
        col("o_custkey").isNotNull.as("has_orders"))
  }

  /** dim_part ⇄ ref dim_courses (defs.yaml:57): projection + key. */
  def dimPart(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      sk(col("p_partkey")).as("part_key"),
      col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
      col("p_size"), col("p_retailprice"))

  /** dim_supplier ⇄ ref dim_employees (defs.yaml:83): dim enrichment. */
  def dimSupplier(spark: SparkSession, dir: String): DataFrame = {
    val supp = Tables.supplier(spark, dir)
    val nat  = Tables.nation(spark, dir)
    val reg  = Tables.region(spark, dir)
    supp
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        sk(col("s_suppkey")).as("supplier_key"),
        col("s_suppkey"), col("s_name"),
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"),
        coalesce(col("r_name"), lit("UNKNOWN")).as("region_name"),
        col("s_acctbal"))
  }

  /** fact_lineitem ⇄ ref fact_enrollments (defs.yaml:113): fact LEFT
    * JOIN with COALESCE(measure, 0).
    */
  def factLineitem(spark: SparkSession, dir: String): DataFrame = {
    val li  = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"), "left")
      .select(
        sk(col("l_orderkey"), col("l_linenumber")).as("lineitem_key"),
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"), col("l_linenumber"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"),
        col("l_shipdate").cast("date").as("ship_date"),
        coalesce(col("o_totalprice"), lit(0.0)).as("order_totalprice"),
        coalesce(col("o_orderstatus"), lit("NA")).as("order_status"))
  }

  /** fact_orders ⇄ ref fact_financial_transactions (defs.yaml:149):
    * fact-to-dim enrichment join.
    */
  def factOrders(spark: SparkSession, dir: String): DataFrame = {
    val ord  = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat  = Tables.nation(spark, dir)
    ord
      .join(cust, col("o_custkey") === col("c_custkey"), "left")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"), "left")
      .select(
        sk(col("o_orderkey")).as("order_key"),
        col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"),
        col("c_name").as("customer_name"),
        coalesce(col("c_mktsegment"), lit("NA")).as("mktsegment"),
        coalesce(col("n_name"), lit("UNKNOWN")).as("nation_name"))
  }

  /** fact_events ⇄ ref fact_admissions_contacts (defs.yaml:183): event
    * facts enriched with the customer dim + funnel-stage mapping (ref
    * funnel_stage from salesforce_opportunities.stage_name).
    */
  def factEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev   = Tables.events(spark, dir)
    val cust = Tables.customer(spark, dir)
    ev.join(cust, col("user_id") === col("c_custkey"), "left")
      .select(
        sk(col("event_id")).as("event_key"),
        col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        col("event_type"),
        funnelStage(col("event_type")).as("funnel_stage"),
        col("value"),
        col("c_name").as("customer_name"),
        coalesce(col("c_mktsegment"), lit("NA")).as("mktsegment"))
  }

  /** Funnel-stage mapping (ref admissions stages Inquiry→Enrolled). */
  def funnelStage(eventType: Column): Column =
    when(eventType === "view", "Inquiry")
      .when(eventType === "click", "Application")
      .when(eventType === "signup", "Admitted")
      .when(eventType === "purchase", "Enrolled")
      .otherwise("Other")
}
