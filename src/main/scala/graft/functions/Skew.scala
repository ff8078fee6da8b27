package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot-key aggregations and joins.
  *
  * AQE's skew-join splitting (enabled in GraftSession) covers sort-merge
  * joins at runtime; these helpers cover the aggregation side: a
  * two-phase salted aggregation spreads a hot group key over `salt`
  * sub-partitions before the final merge, bounding any single task's
  * input regardless of key skew.
  */
object Skew {

  /** Two-phase salted count+sum: partial aggregate on (keys, salt),
    * then merge on keys. Result is identical to the unsalted
    * groupBy(keys).agg(count, sum) — only the shuffle layout changes.
    *
    * The salt is derived from row CONTENT (xxhash64 over every column),
    * not from spark_partition_id/monotonically_increasing_id: a
    * content-derived salt reproduces identical shuffle output when a
    * task is re-executed after a fetch failure, so partial aggregates
    * can never double-count or drop rows under stage retry — the
    * multi-executor failure regime this helper exists for. Identical
    * rows share a salt, which only matters for spread if one exact row
    * dominates a hot key.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int = 16): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("_salt", pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*), lit(salt)))
      .groupBy(keyCols :+ col("_salt"): _*)
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(keyCols: _*)
      .agg(sum("_n").as("n"), sum("_s").as("sum_value"))
  }
}
