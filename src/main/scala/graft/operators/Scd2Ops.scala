package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.lake.{LakeTable, Scd2}

/** SCD Type-2 end to end (ref: the silver dim_* transforms of
  * silver defs.yaml, which rebuild the dimension each run and keep no
  * history — this is the keep-full-history upgrade): orders act as a
  * change stream observing each customer's (status, priority), split
  * into three effective batches by order date; each batch folds into a
  * versioned dimension via [[Scd2.applyBatch]] — one atomic MERGE
  * per batch, closing changed rows and opening successors. The final
  * interval table must equal an independent replay of the same
  * observation history — exactly what the DuckDB oracle computes with
  * window functions (consecutive-change compression + lead() closing).
  */
object Scd2Ops {

  private val Cut1 = "1994-01-01"
  private val Cut2 = "1996-01-01"

  def scd2Dim(spark: SparkSession, dir: String): DataFrame = {
    val work = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    val dim = s"$work/customer_status_dim"
    val orders = Tables.orders(spark, dir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")

    // one observation per key per batch: the latest order decides what
    // the batch "saw" (deterministic tie-break on order key)
    def observed(b: DataFrame): DataFrame = {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      b.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select(col("o_custkey").as("c_key"),
          col("o_orderstatus").as("status"),
          col("o_orderpriority").as("priority"))
    }
    val cut1 = lit(Cut1).cast("timestamp")
    val cut2 = lit(Cut2).cast("timestamp")
    Seq(
      1L -> orders.filter(col("o_orderdate") < cut1),
      2L -> orders.filter(col("o_orderdate") >= cut1 && col("o_orderdate") < cut2),
      3L -> orders.filter(col("o_orderdate") >= cut2)
    ).foreach { case (eff, b) =>
      Scd2.applyBatch(spark, dim, observed(b),
        keys = Seq("c_key"), attrs = Seq("status", "priority"), effective = eff)
    }
    LakeTable.read(spark, dim)
      .select("c_key", "status", "priority", "valid_from", "valid_to", "is_current")
  }

  /** Independent replay: per-batch observation pick, consecutive-change
    * compression per key, intervals from lead() over the change rows.
    */
  val oracleSql: String =
    s"""WITH ob AS (
         SELECT o_custkey, o_orderstatus, o_orderpriority, o_orderdate, o_orderkey,
           CASE WHEN o_orderdate < TIMESTAMP '$Cut1' THEN 1
                WHEN o_orderdate < TIMESTAMP '$Cut2' THEN 2 ELSE 3 END AS b
         FROM orders),
       pick AS (
         SELECT o_custkey AS c_key, o_orderstatus AS status,
                o_orderpriority AS priority, b
         FROM (SELECT *, row_number() OVER (PARTITION BY b, o_custkey
                 ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM ob)
         WHERE rn = 1),
       seq AS (
         SELECT *, lag(status) OVER w AS ps, lag(priority) OVER w AS pp
         FROM pick WINDOW w AS (PARTITION BY c_key ORDER BY b)),
       chg AS (
         SELECT c_key, status, priority, b FROM seq
         WHERE ps IS NULL OR status <> ps OR priority <> pp)
       SELECT c_key, status, priority, CAST(b AS BIGINT) AS valid_from,
         CAST(lead(b) OVER (PARTITION BY c_key ORDER BY b) AS BIGINT) AS valid_to,
         lead(b) OVER (PARTITION BY c_key ORDER BY b) IS NULL AS is_current
       FROM chg"""
}
