package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.lake.LakeTable

/** Cross-engine maintenance check (ref behavior: every reference
  * transform materializes an Iceberg table that Trino then reads back,
  * trino_iceberg_transform_component.py:116-129): one PARTITIONED lake
  * table is driven through the full maintenance surface — overwrite,
  * append, MERGE upsert, copy-on-write DELETE and UPDATE, clustered
  * COMPACT, an "oops" delete, and a RESTORE that undoes it — and the
  * FINAL TABLE STATE is handed to the correctness gate, where DuckDB
  * replays the same history as plain SQL over the same input parquet.
  * A hash match means an independent engine agrees with every commit
  * path end to end, closing the loop that `incr_agg` closes for the
  * change feed.
  */
object MaintenanceOps {

  def lakeDml(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_lakedml").toString
    val t = s"$work/orders_lake"
    val key = col("o_orderkey")
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice")

    // v1: partitioned overwrite of one slice, v2: append another
    LakeTable.overwrite(spark, t, orders.filter(key % 3 === 0),
      partitionBy = Seq("o_orderstatus"))
    LakeTable.append(spark, t, orders.filter(key % 3 === 1))
    // v3: MERGE upsert — existing keys take the source row (price
    // bumped), fresh keys insert
    LakeTable.merge(spark, t,
      orders.filter(key % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
      keys = Seq("o_orderkey"))
    // v4: copy-on-write DELETE, v5: copy-on-write UPDATE
    LakeTable.delete(spark, t, key % 7 === 3)
    LakeTable.update(spark, t,
      Seq("o_totalprice" -> (col("o_totalprice") * 2)),
      col("o_orderpriority") === "1-URGENT")
    // v6: clustered compact — rows untouched, so the oracle must not
    // notice; v7: an accidental delete; v8: RESTORE undoes it by
    // re-referencing v6's files
    val v6 = LakeTable.compact(spark, t, smallFileBytes = 1L << 30,
      sortBy = Seq("o_orderkey"))
    LakeTable.delete(spark, t, key % 2 === 0)
    LakeTable.restore(spark, t, v6)

    LakeTable.read(spark, t).select(
      col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"),
      col("o_totalprice").cast("double").as("o_totalprice"))
  }

  /** DuckDB replays the same history as one SQL expression. */
  val oracleSql: String =
    """WITH merged AS (
         SELECT o_orderkey, o_orderpriority, o_orderstatus,
                CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1000.0
                     ELSE o_totalprice END AS p
         FROM orders
         WHERE o_orderkey % 3 IN (0, 1) OR o_orderkey % 5 = 0
       )
       SELECT o_orderkey, o_orderpriority, o_orderstatus,
              CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN p * 2
                        ELSE p END AS DOUBLE) AS o_totalprice
       FROM merged
       WHERE o_orderkey % 7 <> 3"""
}
