package graft.operators

import org.apache.spark.sql.types._

/** Declared output-schema contracts for every silver and gold model —
  * the analog of the reference's per-transform `output_columns`
  * declarations (ref: defs/silver_transforms/defs.yaml:43-55 and
  * defs/gold_analytics/defs.yaml; published to the catalog by
  * trino_iceberg_transform_component.py:75,93).
  *
  * The pipeline's quality gate asserts materialized schema == contract
  * after every run, so a silent type or column drift in an operator
  * fails the gate instead of shipping. Partition columns added at
  * materialization time (fact_events.event_date) are part of the
  * contract: they are part of the stored table a consumer sees.
  */
object Contracts {

  private def st(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val S = StringType; val L = LongType; val I = IntegerType
  val D = DoubleType; val B = BooleanType; val DT = DateType

  val silver: Map[String, StructType] = Map(
    "dim_customer" -> st("customer_key" -> S, "c_custkey" -> L, "c_name" -> S,
      "customer_label" -> S, "c_mktsegment" -> S, "c_acctbal" -> D,
      "nation_name" -> S, "region_name" -> S, "has_orders" -> B),
    "dim_part" -> st("part_key" -> S, "p_partkey" -> L, "p_name" -> S,
      "p_brand" -> S, "p_type" -> S, "p_size" -> I, "p_retailprice" -> D),
    "dim_supplier" -> st("supplier_key" -> S, "s_suppkey" -> L, "s_name" -> S,
      "nation_name" -> S, "region_name" -> S, "s_acctbal" -> D),
    "fact_lineitem" -> st("lineitem_key" -> S, "l_orderkey" -> L, "l_partkey" -> L,
      "l_suppkey" -> L, "l_linenumber" -> I, "l_quantity" -> D,
      "l_extendedprice" -> D, "l_discount" -> D, "l_tax" -> D,
      "l_returnflag" -> S, "l_linestatus" -> S, "ship_date" -> DT,
      "order_totalprice" -> D, "order_status" -> S),
    "fact_orders" -> st("order_key" -> S, "o_orderkey" -> L, "order_date" -> DT,
      "o_orderstatus" -> S, "o_orderpriority" -> S, "o_totalprice" -> D,
      "customer_name" -> S, "mktsegment" -> S, "nation_name" -> S),
    "fact_events" -> st("event_key" -> S, "event_id" -> L, "user_id" -> L,
      "ts_ms" -> L, "event_type" -> S, "funnel_stage" -> S, "value" -> D,
      "customer_name" -> S, "mktsegment" -> S, "event_date" -> DT))

  val gold: Map[String, StructType] = Map(
    "gold_sales_metrics" -> st("l_returnflag" -> S, "c_mktsegment" -> S,
      "o_orderpriority" -> S, "total_customers" -> L, "total_qty" -> D,
      "avg_acctbal" -> D, "finished_rate" -> D, "negative_bal_customers" -> L,
      "avg_order_lines" -> D),
    "gold_finance" -> st("fiscal_year" -> S, "c_mktsegment" -> S,
      "total_customers" -> L, "total_discount" -> D, "total_disbursed" -> D,
      "avg_discount_per_line" -> D, "budget_utilization" -> D),
    "gold_funnel" -> st("segment" -> S, "inquiries" -> L, "applications" -> L,
      "admits" -> L, "enrolled" -> L, "errors" -> L, "yield_rate" -> D,
      "melt_rate" -> D, "expected_revenue" -> D, "top_event_type" -> S))

  val all: Map[String, StructType] = silver ++ gold

  /** Nullability-insensitive equality (parquet round-trips relax it). */
  def conforms(actual: StructType, expected: StructType): Boolean =
    actual.fields.map(f => (f.name, f.dataType)).toSeq ==
      expected.fields.map(f => (f.name, f.dataType)).toSeq

  /** Human-readable drift description, empty if conforming. */
  def drift(actual: StructType, expected: StructType): String =
    if (conforms(actual, expected)) ""
    else s"expected [${expected.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}] " +
         s"got [${actual.fields.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}]"
}
