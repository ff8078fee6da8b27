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

  test("money aggregates are identical under different shuffle layouts") {
    // The round-1 gold_finance flake: double partial sums combine in
    // task-completion order, so a total near a round-half boundary
    // flips between layouts. The decimal-money policy must make every
    // aggregate bit-identical no matter how the shuffle partitions.
    val moneyQueries = Seq("q1_pricing_summary", "q5_region_revenue",
      "rollup_sales", "gold_finance", "gold_sales_metrics", "events_windowed")
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    try {
      moneyQueries.foreach { name =>
        val results = Seq("2", "13").map { parts =>
          spark.conf.set(key, parts)
          SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
        }
        assert(results(0) == results(1), s"$name differs across shuffle layouts")
      }
    } finally spark.conf.set(key, saved)
  }
}
