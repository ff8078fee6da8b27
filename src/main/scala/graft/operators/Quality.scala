package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
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
  *
  * Scale notes: all per-table checks for one table are computed in a
  * SINGLE scan-aggregate (then unpivoted with stack), so the whole
  * summary costs one pass per table plus one anti-join per FK edge —
  * not one job per check.
  */
object Quality {

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)

    // one scan per table computing every intra-table check, unpivoted
    val custChecks = cust.agg(
        count(when(col("c_custkey").isNull, 1)).as("nn"),
        (count(lit(1)) - countDistinct(col("c_custkey"))).as("dup"),
        count(lit(1)).as("rc"))
      .selectExpr(
        """stack(3,
             'customer', 'not_null_pk',   nn,  nn = 0,
             'customer', 'no_duplicates', dup, dup = 0,
             'customer', 'row_count',     rc,  rc > 0
           ) AS (table_name, check_name, value, passed)""")

    val ordChecks = ord.agg(
        count(when(col("o_orderkey").isNull, 1)).as("nn"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dup"),
        count(lit(1)).as("rc"),
        count(when(col("o_totalprice") <= 0, 1)).as("vr"))
      .selectExpr(
        """stack(4,
             'orders', 'not_null_pk',   nn,  nn = 0,
             'orders', 'no_duplicates', dup, dup = 0,
             'orders', 'row_count',     rc,  rc > 0,
             'orders', 'value_range',   vr,  vr = 0
           ) AS (table_name, check_name, value, passed)""")

    // facts get not_null_pk/row_count/value_range but NOT no_duplicates,
    // matching the reference's per-transform check assignment (ref
    // silver defs.yaml: fact_enrollments has no no_duplicates check) —
    // and indeed (l_orderkey, l_linenumber) is not unique in this data.
    val liChecks = li.agg(
        count(when(col("l_orderkey").isNull, 1)).as("nn"),
        count(lit(1)).as("rc"),
        count(when(
          col("l_discount") < 0 || col("l_discount") > 1 || col("l_quantity") <= 0, 1)).as("vr"))
      .selectExpr(
        """stack(3,
             'lineitem', 'not_null_pk', nn,  nn = 0,
             'lineitem', 'row_count',   rc,  rc > 0,
             'lineitem', 'value_range', vr,  vr = 0
           ) AS (table_name, check_name, value, passed)""")

    // orphan FK rows: left_anti keeps the fact side distributed; the
    // parent key set shuffles (or broadcasts when small, per AQE).
    def orphans(label: String, fact: DataFrame, factKey: String,
                parentKeys: DataFrame, parentKey: String): DataFrame =
      fact.join(parentKeys, col(factKey) === col(parentKey), "left_anti")
        .agg(count(lit(1)).as("v"))
        .select(
          lit(label).as("table_name"),
          lit("referential_integrity").as("check_name"),
          col("v").cast("long").as("value"),
          (col("v") === 0).as("passed"))

    val riChecks = Seq(
      orphans("lineitem->orders", li, "l_orderkey", ord.select(col("o_orderkey")), "o_orderkey"),
      orphans("orders->customer", ord, "o_custkey", cust.select(col("c_custkey")), "c_custkey"))

    (Seq(custChecks, ordChecks, liChecks) ++ riChecks)
      .map(df => df.select(col("table_name"), col("check_name"),
        col("value").cast("long").as("value"), col("passed")))
      .reduce(_ unionByName _)
  }

  /** Freshness per event source (ref bronze freshness SLA checks):
    * latest timestamp per event_type and its lag behind the dataset max.
    */
  def dqFreshness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val perType = ev.groupBy(col("event_type"))
      .agg(unix_millis(max(col("ts"))).as("last_ts_ms"), count(lit(1)).as("n_rows"))
    // the dataset max must join back onto the per-type rows WITHOUT a
    // second scan of the fact (a self-join recomputes the aggregate
    // subtree — column pruning defeats exchange reuse) and without an
    // unpartitioned Window: pack the event-type-bounded rows into one
    // row, take the max there, and explode back — one scan, one tiny
    // global aggregate over ≤|event types| rows
    perType
      .agg(collect_list(struct(col("event_type"), col("last_ts_ms"), col("n_rows"))).as("__rows"),
        max(col("last_ts_ms")).as("__max_ts"))
      .select(explode(col("__rows")).as("r"), col("__max_ts"))
      .select(col("r.event_type").as("event_type"),
        col("r.last_ts_ms").as("last_ts_ms"),
        col("r.n_rows").as("n_rows"),
        (col("__max_ts") - col("r.last_ts_ms")).as("lag_ms"))
  }

  /** Freshness as a pass/fail SLA gate — the reference's freshness
    * checks are asset checks returning `passed` with a severity (ref:
    * s3_data_landing_component.py:176-196), not a dashboard. A source
    * breaches when its newest event lags the freshest source by more
    * than `maxLagMs`; [[graft.Pipeline.runSilver]] fails its gate on
    * any breach before materializing from stale bronze.
    *
    * The relative-lag check alone is blind to a TOTAL outage: when
    * ingest halts for every source at once, all lags are 0 and the gate
    * passes over arbitrarily old bronze. `maxAgeMs` adds the reference's
    * wall-clock SLA (landing freshness gates against current time): a
    * source also breaches when `now - last_ts_ms > maxAgeMs`. `nowMs`
    * is injectable so specs pin the clock.
    */
  def dqFreshnessGate(spark: SparkSession, dir: String, maxLagMs: Long,
                      maxAgeMs: Option[Long] = None,
                      nowMs: () => Long = () => System.currentTimeMillis()): DataFrame = {
    val rel = dqFreshness(spark, dir)
      .withColumn("max_lag_ms", lit(maxLagMs))
    maxAgeMs match {
      case None => rel.withColumn("passed", col("lag_ms") <= maxLagMs)
      case Some(age) => rel
        .withColumn("age_ms", lit(nowMs()) - col("last_ts_ms"))
        .withColumn("max_age_ms", lit(age))
        .withColumn("passed", col("lag_ms") <= maxLagMs && col("age_ms") <= age)
    }
  }
}
