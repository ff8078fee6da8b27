package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column-level lineage for the silver conforming transforms — the
  * Spark-native equivalent of the reference's lineage metadata (ref:
  * trino_iceberg_transform_component.py:221-288 _SILVER_SCHEMAS and
  * _build_column_lineage). One row per (model, column, source);
  * surrogate keys carry the source "(derived)".
  */
object Lineage {

  /** (model, column, sources). Kept in sync with Conform. */
  val silverLineage: Seq[(String, String, Seq[String])] = Seq(
    ("dim_customer", "customer_key", Seq("(derived)")),
    ("dim_customer", "c_custkey", Seq("customer.c_custkey")),
    ("dim_customer", "c_name", Seq("customer.c_name")),
    ("dim_customer", "customer_label", Seq("customer.c_name", "customer.c_mktsegment")),
    ("dim_customer", "c_mktsegment", Seq("customer.c_mktsegment")),
    ("dim_customer", "c_acctbal", Seq("customer.c_acctbal")),
    ("dim_customer", "nation_name", Seq("nation.n_name")),
    ("dim_customer", "region_name", Seq("region.r_name")),
    ("dim_customer", "has_orders", Seq("orders.o_custkey")),
    ("dim_part", "part_key", Seq("(derived)")),
    ("dim_part", "p_partkey", Seq("part.p_partkey")),
    ("dim_part", "p_name", Seq("part.p_name")),
    ("dim_part", "p_brand", Seq("part.p_brand")),
    ("dim_part", "p_type", Seq("part.p_type")),
    ("dim_part", "p_size", Seq("part.p_size")),
    ("dim_part", "p_retailprice", Seq("part.p_retailprice")),
    ("dim_supplier", "supplier_key", Seq("(derived)")),
    ("dim_supplier", "s_suppkey", Seq("supplier.s_suppkey")),
    ("dim_supplier", "s_name", Seq("supplier.s_name")),
    ("dim_supplier", "nation_name", Seq("nation.n_name")),
    ("dim_supplier", "region_name", Seq("region.r_name")),
    ("dim_supplier", "s_acctbal", Seq("supplier.s_acctbal")),
    ("fact_lineitem", "lineitem_key", Seq("(derived)")),
    ("fact_lineitem", "l_orderkey", Seq("lineitem.l_orderkey")),
    ("fact_lineitem", "l_partkey", Seq("lineitem.l_partkey")),
    ("fact_lineitem", "l_suppkey", Seq("lineitem.l_suppkey")),
    ("fact_lineitem", "l_linenumber", Seq("lineitem.l_linenumber")),
    ("fact_lineitem", "l_quantity", Seq("lineitem.l_quantity")),
    ("fact_lineitem", "l_extendedprice", Seq("lineitem.l_extendedprice")),
    ("fact_lineitem", "l_discount", Seq("lineitem.l_discount")),
    ("fact_lineitem", "l_tax", Seq("lineitem.l_tax")),
    ("fact_lineitem", "l_returnflag", Seq("lineitem.l_returnflag")),
    ("fact_lineitem", "l_linestatus", Seq("lineitem.l_linestatus")),
    ("fact_lineitem", "ship_date", Seq("lineitem.l_shipdate")),
    ("fact_lineitem", "order_totalprice", Seq("orders.o_totalprice")),
    ("fact_lineitem", "order_status", Seq("orders.o_orderstatus")),
    ("fact_orders", "order_key", Seq("(derived)")),
    ("fact_orders", "o_orderkey", Seq("orders.o_orderkey")),
    ("fact_orders", "order_date", Seq("orders.o_orderdate")),
    ("fact_orders", "o_orderstatus", Seq("orders.o_orderstatus")),
    ("fact_orders", "o_orderpriority", Seq("orders.o_orderpriority")),
    ("fact_orders", "o_totalprice", Seq("orders.o_totalprice")),
    ("fact_orders", "customer_name", Seq("customer.c_name")),
    ("fact_orders", "mktsegment", Seq("customer.c_mktsegment")),
    ("fact_orders", "nation_name", Seq("nation.n_name")),
    ("fact_events", "event_key", Seq("(derived)")),
    ("fact_events", "event_id", Seq("events.event_id")),
    ("fact_events", "user_id", Seq("events.user_id")),
    ("fact_events", "ts_ms", Seq("events.ts")),
    ("fact_events", "event_type", Seq("events.event_type")),
    ("fact_events", "funnel_stage", Seq("events.event_type")),
    ("fact_events", "value", Seq("events.value")),
    ("fact_events", "customer_name", Seq("customer.c_name")),
    ("fact_events", "mktsegment", Seq("customer.c_mktsegment")))

  /** Flattened lineage rows: (model, column_name, source). */
  def lineage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    silverLineage
      .flatMap { case (m, c, ss) => ss.map(s => (m, c, s)) }
      .toDF("model", "column_name", "source")
  }

  /** DuckDB oracle for the lineage rows (generated from the same data,
    * so the two can't drift).
    */
  def oracleSql: String = {
    val rows = silverLineage
      .flatMap { case (m, c, ss) => ss.map(s => s"('$m','$c','$s')") }
      .mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(model, column_name, source)"
  }
}
