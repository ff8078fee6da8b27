package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional clustering support for [[LakeTable.compact]] — the
  * OPTIMIZE ZORDER BY analog for the lake tables behind every
  * reference transform (Iceberg tables created at
  * trino_iceberg_transform_component.py:116-123; Iceberg's sort-order
  * file rewrite is the same public-knowledge lever).
  *
  * A linear sort clusters file bounds tightly on the LEADING column
  * only; a filter on any later column still admits every file. Mapping
  * each row to a point on a Z-order (Morton) curve and range-writing
  * on that value gives every participating column locality, so the
  * per-file min/max bounds in the transaction log stay narrow on ALL
  * of them and [[DataSkipping]] prunes files for filters on any one.
  *
  * Everything here composes built-in codegen'd expressions — no UDFs:
  *
  *  1. per column, a rank bucket in [0, 64): boundaries are sampled
  *     once (bounded, seeded) and baked in as literals; the bucket of
  *     a value is `count(boundaries <= value)` via `aggregate` over a
  *     literal array — works for any orderable type (numeric, string,
  *     date, timestamp), nulls bucket to 0 like the stats' null-first
  *     ordering;
  *  2. the 6-bit bucket ids interleave MSB-first into one long via
  *     `shiftleft`/`bitwiseOR` — pure bit arithmetic inside
  *     whole-stage codegen.
  */
private[lake] object ZOrder {

  /** Buckets per dimension (2^BitsPerDim). 64 cells per axis is enough
    * granularity for compact output file counts in the thousands while
    * keeping the bucket expression a 63-element scan; up to 10
    * dimensions fit one long.
    */
  val BitsPerDim = 6
  val Buckets: Int = 1 << BitsPerDim

  /** The number of sampled rows the driver materializes to pick
    * boundaries — bounded regardless of table size.
    */
  val SampleCap = 200000L

  /** One Z-value column for `cols` of `df`, sampling `df` once for the
    * per-column boundaries (one extra bounded read of the compact
    * scope — acceptable for a maintenance job). `totalRows` drives the
    * sample fraction; pass the logged row counts when known.
    */
  def zvalue(df: DataFrame, cols: Seq[String], totalRows: Long): Column = {
    val bs = boundaries(df, cols, totalRows)
    interleave(cols.map(c => bucket(col(c), bs(c))))
  }

  /** Per-column rank-bucket boundaries from one seeded, size-capped
    * sample: `Buckets - 1` evenly spaced values of the sorted sample.
    * Deterministic for a fixed input (fixed sample seed).
    */
  def boundaries(df: DataFrame, cols: Seq[String],
                 totalRows: Long): Map[String, Seq[Any]] = {
    val frac = math.min(1.0, SampleCap.toDouble / math.max(totalRows, 1L))
    // cached: each column's sorted collect below re-reads the sample,
    // not the compact scope
    val sampled = df.select(cols.map(col).toIndexedSeq: _*)
      .sample(withReplacement = false, frac, seed = 7L)
      .cache()
    try cols.map { c =>
      // driver-side materialization is bounded by SampleCap rows
      val vals = sampled.select(c).na.drop().sort(col(c)).collect().map(_.get(0))
      val picked =
        if (vals.isEmpty) Seq.empty[Any]
        else (1 until Buckets)
          .map(i => vals((i.toLong * vals.length / Buckets).toInt))
          .distinct
      c -> picked
    }.toMap
    finally { sampled.unpersist(); () }
  }

  /** Rank bucket of `c` against sorted `boundaries`:
    * `count(b <= c)` — 0 for nulls (and for an all-null sample, where
    * there are no boundaries at all).
    *
    * Computed as a balanced binary-search decision tree of `when`
    * expressions over the sorted boundary literals: ~log2(n)
    * comparisons evaluated per row (the generated code follows one
    * root-to-leaf path) instead of the previous `aggregate`'s O(n)
    * scan — still built-in codegen'd expressions only, no UDF.
    */
  def bucket(c: Column, boundaries: Seq[Any]): Column =
    if (boundaries.isEmpty) lit(0)
    else {
      // rank(lo, hi): the count, given it is already known to lie in
      // [lo, hi]. boundaries is sorted ascending and distinct, so
      // c >= boundaries(mid) pins every index <= mid as counted.
      def rank(lo: Int, hi: Int): Column =
        if (lo >= hi) lit(lo)
        else {
          val mid = (lo + hi) / 2
          when(c.geq(lit(boundaries(mid))), rank(mid + 1, hi))
            .otherwise(rank(lo, mid))
        }
      when(c.isNull, lit(0)).otherwise(rank(0, boundaries.length))
    }

  /** MSB-first bit interleave of the bucket ids (each in [0, Buckets))
    * into one long — built-in shift/or arithmetic, codegen'd.
    */
  def interleave(buckets: Seq[Column]): Column = {
    var out: Column = lit(0L)
    for (b <- (BitsPerDim - 1) to 0 by -1; c <- buckets)
      out = shiftleft(out, 1).bitwiseOR(
        shiftright(c, b).bitwiseAND(lit(1)).cast("long"))
    out
  }
}
