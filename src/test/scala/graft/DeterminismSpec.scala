package graft

/** Every query must produce an identical result multiset across runs —
  * the driver's correctness gate hash-compares results, so any hidden
  * nondeterminism (unstable tie-breaks, partition-order-dependent
  * first()/min-by, time-dependent expressions) fails the round.
  */
class DeterminismSpec extends SparkSpec {
  test("all queries are run-to-run deterministic at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val a = fn(spark, sf).collect().map(_.toString).sorted
      val b = fn(spark, sf).collect().map(_.toString).sorted
      assert(a.sameElements(b), s"$name differs between runs")
    }
  }
}
