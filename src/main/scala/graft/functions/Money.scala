package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic money/measure aggregation + rounding policy.
  *
  * Two distinct fp hazards make `round(sum(double))` non-reproducible
  * across runs and engines:
  *
  * 1. A parallel `sum(double)` is order-dependent: partial aggregates
  *    combine in whatever order tasks finish, so a total landing within
  *    ~1e-7 of a round-half boundary flips its rounded value between
  *    runs (observed: gold_finance (1996, HOUSEHOLD) at sf0.01 — raw sum
  *    4453370.01499994, 6e-8 from the .015 knife edge).
  *    Fix: accumulate in DECIMAL(38,6) — exact, associative, commutative.
  *    All source money columns carry ≤2 decimal places (products ≤4), so
  *    the cast itself never rounds.
  *
  * 2. Spark's `round(double, s)` rounds the double's shortest decimal
  *    string (BigDecimal.valueOf + HALF_UP) while DuckDB — the oracle
  *    engine — computes std::round(x·10^s)/10^s in doubles. The two
  *    disagree exactly on boundary values: round(4453370.015, 2) is
  *    .02 under Spark but .01 under DuckDB (x·100 = 445337001.49999994).
  *    With exact decimal sums, totals are exact multiples of 1e-4, so
  *    boundary landings are common, not rare.
  *    Fix: round money totals in DECIMAL space (both engines round
  *    decimals half-away-from-zero — verified: DuckDB
  *    round(0.125::DECIMAL(10,3), 2) = 0.13), and round ratios/means
  *    with `rnd`, a builtin-composed bit-exact mimic of DuckDB's
  *    double rounding.
  *
  * At 100 TB: decimal partial aggregation is codegen'd and map-side
  * combined exactly like double sums (one shuffle, 16-byte state); the
  * 32 integer digits of DECIMAL(38,6) hold sums up to 1e32 — far above
  * any money total — so ANSI overflow is unreachable in practice.
  */
object Money {

  private val MoneyDec = DecimalType(38, 6)

  /** Exact, order-independent sum of a (≤6 dp) double expression,
    * surfaced as a deterministic double for downstream arithmetic.
    */
  def dsum(c: Column): Column = sum(c.cast(MoneyDec)).cast("double")

  /** Money total rounded in DECIMAL space: the half-way decision is made
    * on the exact sum (no double ever carries the unrounded value), so
    * no fp knife edge exists on either engine.
    * Oracle shape: CAST(round(sum(CAST(x AS DECIMAL(38,6))), s) AS DOUBLE).
    */
  def msum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast(MoneyDec)), scale).cast("double")

  /** Order-independent mean: exact sum over the non-null count, one
    * deterministic double division, DuckDB-matched rounding.
    * Oracle shape: round(CAST(sum(CAST(x AS DECIMAL(38,6))) AS DOUBLE)/count(x), s).
    */
  def mavg(c: Column, scale: Int = 4): Column = rnd(dsum(c) / count(c), scale)

  /** Bit-exact mimic of DuckDB's round(double, s):
    * std::round(x·10^s)/10^s, half away from zero. Composed from
    * codegen'd builtins (multiply, floor, exact >= 0.5 comparison) so it
    * stays inside whole-stage codegen; Math.floor/`floor` agree and the
    * fractional comparison is exact, so the result equals std::round for
    * every finite double. Preserves DuckDB's -0.0 for negatives rounding
    * to zero. Use for every oracle-compared rounding whose input is a
    * deterministic double (ratios, means, percentiles, cosines).
    */
  def rnd(c: Column, scale: Int): Column = {
    val p = lit(math.pow(10, scale))
    val y = c * p
    val a = abs(y)
    val f = floor(a).cast("double")
    val r = when(a - f >= 0.5, f + lit(1.0)).otherwise(f)
    when(y < 0.0, -r).otherwise(r) / p
  }
}
