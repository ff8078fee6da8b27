package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Money.msum
import graft.lake.LakeTable

/** Co-located (bucketed) fact-to-fact join, the lake's zero-shuffle
  * join surface (see [[graft.lake.Bucketing]]): orders and lineitem are
  * (re)created hash-bucketed on the order key into the same bucket
  * count, so the revenue join planned here runs WITHOUT exchanging
  * either side — each task reads bucket i of both tables. At 100 TB
  * this is the canonical daily-pipeline shape: the dominant fact join
  * pre-paid its shuffle once, at layout time, instead of on every
  * query. The oracle replays the same join+aggregate as plain SQL over
  * the raw parquet — the layout must be invisible to the result.
  *
  * ref: the reference's Iceberg tables use bucket partition transforms
  * for the same purpose (trino_iceberg_transform_component.py:33).
  */
object BucketedOps {

  def bucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val work = Work.dir("graft_bucket")
    val ot = s"$work/orders_bkt"
    val lt = s"$work/lineitem_bkt"
    LakeTable.overwriteBucketed(spark, ot,
      Tables.orders(spark, dir).select("o_orderkey", "o_orderpriority"),
      numBuckets = 8, bucketCols = Seq("o_orderkey"))
    LakeTable.overwriteBucketed(spark, lt,
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_extendedprice", "l_discount"),
      numBuckets = 8, bucketCols = Seq("l_orderkey"))
    // the merge hint pins a sort-merge join so the co-located path is
    // what actually runs (a broadcast would mask it at bench scale —
    // and could never be the plan at 100 TB)
    LakeTable.read(spark, ot).hint("merge")
      .join(LakeTable.read(spark, lt),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        msum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val oracleSql: String =
    """SELECT o_orderpriority,
      |       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))), 2) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |GROUP BY o_orderpriority""".stripMargin
}
