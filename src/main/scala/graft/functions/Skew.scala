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

  /** Replicated-fragment (salted) INNER equi-join: the skewed/
    * low-cardinality BIG side gets a content-derived salt in
    * [0, salt), the SMALL side is replicated `salt` times, and the
    * join runs on `keys :+ _salt` — so one hot key's rows spread over
    * `salt` shuffle partitions instead of landing in one task. Result
    * is exactly `big.join(small, keys)` (each big row meets each
    * matching small row once: the row's salt selects exactly one of
    * the `salt` replicas).
    *
    * When to reach for it at 100 TB: the small side exceeds the
    * broadcast threshold (else just broadcast) AND either the big
    * side's key histogram is heavy-tailed or the key cardinality is
    * below the cluster's task count — the two shapes where a plain
    * shuffle join leaves most of the cluster idle behind one straggler
    * task. AQE's skew-join splitting covers the sort-merge runtime
    * case reactively; explicit salting is the deterministic layout
    * that doesn't depend on runtime stats, works under hash joins, and
    * composes with a downstream salted aggregation. The small side
    * pays ×salt replication through its shuffle — pick `salt` around
    * the straggler ratio, not in the hundreds.
    *
    * Same content-derived salt discipline as [[saltedCountSum]]: a
    * re-executed task reproduces identical shuffle output, so stage
    * retry can never duplicate or drop join rows.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 16): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "'_salt' column name is reserved by saltedJoin")
    val b = big.withColumn("_salt",
      pmod(xxhash64(big.columns.toIndexedSeq.map(col): _*), lit(salt)))
    val s = small.withColumn("_salt",
      explode(array((0 until salt).map(i => lit(i.toLong)): _*)))
    b.join(s, keys :+ "_salt").drop("_salt")
  }
}
