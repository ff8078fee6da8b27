package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-quality checks — Spark-native equivalents of the reference's
  * asset checks (ref: trino_iceberg_transform_component.py:192-206
  * check_queries: not_null_pk / no_duplicates / row_count /
  * referential_integrity / value_range, and the bronze freshness checks
  * in s3_data_landing_component.py).
  *
  * Output is one row per (table, check) with the measured value and the
  * pass verdict, matching the reference's pass rule
  * (trino_iceberg_transform_component.py:206: zero-violation checks pass
  * at value==0, volume checks at value>0).
  */
object Quality {

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)

    def row(table: String, check: String, value: DataFrame, zeroPass: Boolean): DataFrame =
      value.select(
        lit(table).as("table_name"),
        lit(check).as("check_name"),
        col("v").cast("long").as("value"),
        (if (zeroPass) col("v") === 0 else col("v") > 0).as("passed"))

    val checks = Seq(
      row("customer", "not_null_pk",
        cust.agg(count(when(col("c_custkey").isNull, 1)).as("v")), zeroPass = true),
      row("orders", "not_null_pk",
        ord.agg(count(when(col("o_orderkey").isNull, 1)).as("v")), zeroPass = true),
      row("customer", "no_duplicates",
        cust.agg((count(lit(1)) - countDistinct(col("c_custkey"))).as("v")), zeroPass = true),
      row("orders", "no_duplicates",
        ord.agg((count(lit(1)) - countDistinct(col("o_orderkey"))).as("v")), zeroPass = true),
      row("lineitem", "no_duplicates",
        li.agg((count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber"))).as("v")),
        zeroPass = true),
      row("customer", "row_count", cust.agg(count(lit(1)).as("v")), zeroPass = false),
      row("orders", "row_count", ord.agg(count(lit(1)).as("v")), zeroPass = false),
      row("lineitem", "row_count", li.agg(count(lit(1)).as("v")), zeroPass = false),
      // orphan FK rows: fact keys with no parent — left_anti keeps the
      // scan-side distributed; parent key sets are broadcastable.
      row("lineitem->orders", "referential_integrity",
        li.join(broadcast(ord.select(col("o_orderkey"))),
            col("l_orderkey") === col("o_orderkey"), "left_anti")
          .agg(count(lit(1)).as("v")), zeroPass = true),
      row("orders->customer", "referential_integrity",
        ord.join(broadcast(cust.select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"), "left_anti")
          .agg(count(lit(1)).as("v")), zeroPass = true),
      row("lineitem", "value_range",
        li.agg(count(when(
          col("l_discount") < 0 || col("l_discount") > 1 || col("l_quantity") <= 0, 1)).as("v")),
        zeroPass = true),
      row("orders", "value_range",
        ord.agg(count(when(col("o_totalprice") <= 0, 1)).as("v")), zeroPass = true)
    )
    checks.reduce(_ unionByName _)
  }

  /** Freshness per event source (ref bronze freshness SLA checks):
    * latest timestamp per event_type and its lag behind the dataset max.
    */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perType = ev.groupBy(col("event_type"))
      .agg(unix_millis(max(col("ts"))).as("last_ts_ms"), count(lit(1)).as("n_rows"))
    perType
      .withColumn("lag_ms", max(col("last_ts_ms")).over(Window.partitionBy()) - col("last_ts_ms"))
      .select(col("event_type"), col("last_ts_ms"), col("n_rows"), col("lag_ms"))
  }
}
