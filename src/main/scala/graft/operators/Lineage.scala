package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Column-level lineage + catalog metadata for the silver/gold models —
  * the Spark-native equivalent of the reference's lineage AND
  * OpenMetadata surfaces (ref: trino_iceberg_transform_component.py:
  * 221-288 _SILVER_SCHEMAS / _build_column_lineage;
  * gold_analytics_component.py:74-91 attaches per-model
  * `openmetadata_tags` joined ", " plus per-column descriptions from
  * defs.yaml output_columns). One row per (model, column, source);
  * surrogate keys carry the source "(derived)"; every row also carries
  * the column's description and the model's classification tags
  * (PII/Domain/Tier taxonomy, gold defs.yaml:20-23).
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

  /** (model, column, sources) for the gold analytics models — the
    * reference registers gold lineage the same way it does silver
    * (gold_analytics_component.py:114-121).
    */
  val goldLineage: Seq[(String, String, Seq[String])] = Seq(
    ("gold_sales_metrics", "l_returnflag", Seq("lineitem.l_returnflag")),
    ("gold_sales_metrics", "c_mktsegment", Seq("customer.c_mktsegment")),
    ("gold_sales_metrics", "o_orderpriority", Seq("orders.o_orderpriority")),
    ("gold_sales_metrics", "total_customers", Seq("orders.o_custkey")),
    ("gold_sales_metrics", "total_qty", Seq("lineitem.l_quantity")),
    ("gold_sales_metrics", "avg_acctbal", Seq("customer.c_acctbal")),
    ("gold_sales_metrics", "finished_rate", Seq("orders.o_orderstatus")),
    ("gold_sales_metrics", "negative_bal_customers", Seq("customer.c_acctbal")),
    ("gold_sales_metrics", "avg_order_lines", Seq("lineitem.l_orderkey")),
    ("gold_finance", "fiscal_year", Seq("orders.o_orderdate")),
    ("gold_finance", "c_mktsegment", Seq("customer.c_mktsegment")),
    ("gold_finance", "total_customers", Seq("orders.o_custkey")),
    ("gold_finance", "total_discount", Seq("lineitem.l_extendedprice", "lineitem.l_discount")),
    ("gold_finance", "total_disbursed", Seq("lineitem.l_extendedprice", "lineitem.l_discount")),
    ("gold_finance", "avg_discount_per_line", Seq("lineitem.l_extendedprice", "lineitem.l_discount")),
    ("gold_finance", "budget_utilization", Seq("lineitem.l_extendedprice", "orders.o_totalprice")),
    ("gold_funnel", "segment", Seq("customer.c_mktsegment")),
    ("gold_funnel", "inquiries", Seq("events.event_type")),
    ("gold_funnel", "applications", Seq("events.event_type")),
    ("gold_funnel", "admits", Seq("events.event_type")),
    ("gold_funnel", "enrolled", Seq("events.event_type")),
    ("gold_funnel", "errors", Seq("events.event_type")),
    ("gold_funnel", "yield_rate", Seq("events.event_type")),
    ("gold_funnel", "melt_rate", Seq("events.event_type")),
    ("gold_funnel", "expected_revenue", Seq("events.value")),
    ("gold_funnel", "top_event_type", Seq("events.event_type")))

  /** Per-model classification tags — the reference's OpenMetadata
    * taxonomy (gold defs.yaml:20-23 "PII:None"/"Domain:…"/"Tier:Gold"),
    * extended to the silver tier the same way the reference tags every
    * registered model. Rendered comma-joined, exactly as
    * gold_analytics_component.py:91 ships them.
    */
  val modelTags: Map[String, Seq[String]] = Map(
    "dim_customer"       -> Seq("PII:Direct", "Domain:Sales", "Tier:Silver"),
    "dim_part"           -> Seq("PII:None", "Domain:Catalog", "Tier:Silver"),
    "dim_supplier"       -> Seq("PII:Direct", "Domain:Procurement", "Tier:Silver"),
    "fact_lineitem"      -> Seq("PII:None", "Domain:Sales", "Tier:Silver"),
    "fact_orders"        -> Seq("PII:Indirect", "Domain:Sales", "Tier:Silver"),
    "fact_events"        -> Seq("PII:Indirect", "Domain:Events", "Tier:Silver"),
    "gold_sales_metrics" -> Seq("PII:None", "Domain:Sales", "Tier:Gold"),
    "gold_finance"       -> Seq("PII:Aggregated", "Domain:Finance", "Tier:Gold"),
    "gold_funnel"        -> Seq("PII:None", "Domain:Events", "Tier:Gold"))

  /** Per-column descriptions — the reference's defs.yaml
    * output_columns `description:` field, one per (model, column).
    * No apostrophes: the oracle embeds these in a SQL VALUES literal.
    */
  val columnDescriptions: Map[(String, String), String] = Map(
    ("dim_customer", "customer_key")       -> "Surrogate key",
    ("dim_customer", "c_custkey")          -> "Natural key from customer source",
    ("dim_customer", "c_name")             -> "Customer name",
    ("dim_customer", "customer_label")     -> "Name + market segment display label",
    ("dim_customer", "c_mktsegment")       -> "Market segment",
    ("dim_customer", "c_acctbal")          -> "Account balance",
    ("dim_customer", "nation_name")        -> "Nation via nationkey",
    ("dim_customer", "region_name")        -> "Region via nation",
    ("dim_customer", "has_orders")         -> "Customer has at least one order",
    ("dim_part", "part_key")               -> "Surrogate key",
    ("dim_part", "p_partkey")              -> "Natural key from part source",
    ("dim_part", "p_name")                 -> "Part name",
    ("dim_part", "p_brand")                -> "Brand",
    ("dim_part", "p_type")                 -> "Part type",
    ("dim_part", "p_size")                 -> "Size",
    ("dim_part", "p_retailprice")          -> "Retail price",
    ("dim_supplier", "supplier_key")       -> "Surrogate key",
    ("dim_supplier", "s_suppkey")          -> "Natural key from supplier source",
    ("dim_supplier", "s_name")             -> "Supplier name",
    ("dim_supplier", "nation_name")        -> "Nation via nationkey",
    ("dim_supplier", "region_name")        -> "Region via nation",
    ("dim_supplier", "s_acctbal")          -> "Account balance",
    ("fact_lineitem", "lineitem_key")      -> "Surrogate key",
    ("fact_lineitem", "l_orderkey")        -> "Order foreign key",
    ("fact_lineitem", "l_partkey")         -> "Part foreign key",
    ("fact_lineitem", "l_suppkey")         -> "Supplier foreign key",
    ("fact_lineitem", "l_linenumber")      -> "Line number within order",
    ("fact_lineitem", "l_quantity")        -> "Quantity ordered",
    ("fact_lineitem", "l_extendedprice")   -> "Extended price",
    ("fact_lineitem", "l_discount")        -> "Discount fraction",
    ("fact_lineitem", "l_tax")             -> "Tax fraction",
    ("fact_lineitem", "l_returnflag")      -> "Return flag",
    ("fact_lineitem", "l_linestatus")      -> "Line status",
    ("fact_lineitem", "ship_date")         -> "Ship date",
    ("fact_lineitem", "order_totalprice")  -> "Denormalized order total",
    ("fact_lineitem", "order_status")      -> "Denormalized order status",
    ("fact_orders", "order_key")           -> "Surrogate key",
    ("fact_orders", "o_orderkey")          -> "Natural key from orders source",
    ("fact_orders", "order_date")          -> "Order date",
    ("fact_orders", "o_orderstatus")       -> "Order status",
    ("fact_orders", "o_orderpriority")     -> "Order priority",
    ("fact_orders", "o_totalprice")        -> "Order total price",
    ("fact_orders", "customer_name")       -> "Denormalized customer name",
    ("fact_orders", "mktsegment")          -> "Denormalized market segment",
    ("fact_orders", "nation_name")         -> "Customer nation",
    ("fact_events", "event_key")           -> "Surrogate key",
    ("fact_events", "event_id")            -> "Natural key from events stream",
    ("fact_events", "user_id")             -> "Acting user",
    ("fact_events", "ts_ms")               -> "Event time in epoch millis",
    ("fact_events", "event_type")          -> "Raw event type",
    ("fact_events", "funnel_stage")        -> "Funnel stage bucketed from event type",
    ("fact_events", "value")               -> "Event monetary value",
    ("fact_events", "customer_name")       -> "Denormalized customer name",
    ("fact_events", "mktsegment")          -> "Denormalized market segment",
    ("gold_sales_metrics", "l_returnflag")           -> "Return flag grouping key",
    ("gold_sales_metrics", "c_mktsegment")           -> "Market segment grouping key",
    ("gold_sales_metrics", "o_orderpriority")        -> "Order priority grouping key",
    ("gold_sales_metrics", "total_customers")        -> "Distinct customers",
    ("gold_sales_metrics", "total_qty")              -> "Sum of line quantities",
    ("gold_sales_metrics", "avg_acctbal")            -> "Average account balance",
    ("gold_sales_metrics", "finished_rate")          -> "Share of customers with a finished order",
    ("gold_sales_metrics", "negative_bal_customers") -> "Customers with negative balance",
    ("gold_sales_metrics", "avg_order_lines")        -> "Average lines per order",
    ("gold_finance", "fiscal_year")           -> "Fiscal year",
    ("gold_finance", "c_mktsegment")          -> "Market segment",
    ("gold_finance", "total_customers")       -> "Distinct customers with discounts",
    ("gold_finance", "total_discount")        -> "Total discount amount",
    ("gold_finance", "total_disbursed")       -> "Discount amount net of holdback",
    ("gold_finance", "avg_discount_per_line") -> "Average discount per line",
    ("gold_finance", "budget_utilization")    -> "Share of yearly order value discounted",
    ("gold_funnel", "segment")          -> "Market segment or Unknown",
    ("gold_funnel", "inquiries")        -> "View events",
    ("gold_funnel", "applications")     -> "Click events",
    ("gold_funnel", "admits")           -> "Signup events",
    ("gold_funnel", "enrolled")         -> "Purchase events",
    ("gold_funnel", "errors")           -> "Error events",
    ("gold_funnel", "yield_rate")       -> "Signup to purchase conversion",
    ("gold_funnel", "melt_rate")        -> "Signup without purchase share",
    ("gold_funnel", "expected_revenue") -> "Sum of event values",
    ("gold_funnel", "top_event_type")   -> "Most frequent event type overall")

  private def enriched: Seq[(String, String, String, String, String)] =
    (silverLineage ++ goldLineage).flatMap { case (m, c, ss) =>
      val desc = columnDescriptions.getOrElse((m, c), "")
      val tags = modelTags.getOrElse(m, Nil).mkString(", ")
      ss.map(s => (m, c, s, desc, tags))
    }

  /** Flattened lineage rows:
    * (model, column_name, source, description, tags).
    */
  def lineage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    enriched.toDF("model", "column_name", "source", "description", "tags")
  }

  /** DuckDB oracle for the lineage rows (generated from the same data,
    * so the two can't drift).
    */
  def oracleSql: String = {
    val rows = enriched
      .map { case (m, c, s, d, t) => s"('$m','$c','$s','$d','$t')" }
      .mkString(", ")
    s"SELECT * FROM (VALUES $rows) AS t(model, column_name, source, description, tags)"
  }
}
