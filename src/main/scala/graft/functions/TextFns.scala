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

  /** Distinct word n-gram shingles over a token array column named by
    * `tokArr` (expression string), e.g. shingles("w", 3).
    */
  def shingleExpr(tokArr: String, n: Int): Column = {
    // Guarded IF keeps element_at in-bounds (ANSI mode throws on OOB),
    // and avoids sequence(1, 0) = [1, 0] descending-surprise on short docs.
    val parts = (1 to n).map(k => s"element_at($tokArr, i + ${k - 1})").mkString(", ")
    expr(
      s"""array_distinct(filter(
            transform(sequence(1, size($tokArr)),
                      i -> IF(i + ${n - 1} <= size($tokArr),
                              concat_ws(' ', $parts),
                              CAST(NULL AS STRING))),
            x -> x IS NOT NULL))""")
  }

  /** Jaccard similarity of two distinct-element array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b)).cast("double")

  /** MinHash signature: for seeds 0..n-1, min over shingles of the
    * seeded murmur3 hash. One pass over the shingle array per seed.
    */
  def minhashSignature(shingles: String, n: Int): Column =
    expr(s"transform(sequence(0, ${n - 1}), i -> array_min(transform($shingles, s -> hash(i, s))))")

  /** 64-bit SimHash over a (multiset) token array column: bit b is set
    * when tokens whose xxhash64 has bit b outnumber those that don't.
    */
  def simhash64(tokArr: String): Column =
    expr(
      s"""aggregate(sequence(0, 63), 0L, (acc, b) ->
            acc | IF(size(filter($tokArr, t -> ((xxhash64(t) >> b) & 1) = 1)) * 2 > size($tokArr),
                     shiftleft(1L, b), 0L))""")
}
