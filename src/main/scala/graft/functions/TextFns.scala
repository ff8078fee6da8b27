package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers for the training-data pipeline operators.
  * All are built from codegen'd builtin functions (no Scala UDFs) so
  * they stay inside whole-stage codegen at scale.
  */
object TextFns {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** All word n-gram shingles (with repeats, in order) over a token
    * array column named by `tokArr` (expression string).
    */
  def shingleAllExpr(tokArr: String, n: Int): Column = {
    // Guarded IF keeps element_at in-bounds (ANSI mode throws on OOB),
    // and avoids sequence(1, 0) = [1, 0] descending-surprise on short docs.
    val parts = (1 to n).map(k => s"element_at($tokArr, i + ${k - 1})").mkString(", ")
    expr(
      s"""filter(
            transform(sequence(1, size($tokArr)),
                      i -> IF(i + ${n - 1} <= size($tokArr),
                              concat_ws(' ', $parts),
                              CAST(NULL AS STRING))),
            x -> x IS NOT NULL)""")
  }

  /** Distinct word n-gram shingles over a token array column named by
    * `tokArr` (expression string), e.g. shingles("w", 3).
    */
  def shingleExpr(tokArr: String, n: Int): Column =
    array_distinct(shingleAllExpr(tokArr, n))

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  // MinHash / SimHash sketches live in graft.functions.Sketches as
  // custom Catalyst expressions: builtin higher-order functions would
  // re-evaluate the hash array per outer-lambda iteration (64x).
}
