package graft

/** Pins the measured two-level-vs-flat gold aggregation choice
  * (PLANS.md "Measured: flat vs two-level"): the shipped two-level
  * forms are bit-identical to the flat single-groupBy forms and plan
  * without an Expand of the joined fact.
  */
class AnalyticsPlanSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.mkString("|")).toSet
  }

  test("two-level gold_sales_metrics is bit-identical to the flat form") {
    val a = rowsOf(operators.Analytics.goldSalesMetrics(spark, sf))
    val b = rowsOf(operators.Analytics.goldSalesMetricsFlat(spark, sf))
    assert(a == b)
  }

  test("two-level gold_finance is bit-identical to the flat form") {
    val a = rowsOf(operators.Analytics.goldFinance(spark, sf))
    val b = rowsOf(operators.Analytics.goldFinanceFlat(spark, sf))
    assert(a == b)
  }

  test("shipped gold plans carry no Expand; flat sales does") {
    assert(!operators.Analytics.goldSalesMetrics(spark, sf)
      .queryExecution.executedPlan.toString.contains("Expand"))
    assert(!operators.Analytics.goldFinance(spark, sf)
      .queryExecution.executedPlan.toString.contains("Expand"))
    assert(operators.Analytics.goldSalesMetricsFlat(spark, sf)
      .queryExecution.executedPlan.toString.contains("Expand"))
  }
}

/** Pins seq_pack's plan contract: exactly ONE shuffle (the shard-key
  * Exchange feeding the running-sum window) and a column-pruned scan —
  * the properties that make it shard-parallel at 100 TB. A regression
  * to a global sort or a second shuffle would pass correctness and
  * only show up here.
  */
class SeqPackPlanSpec extends SparkSpec {
  test("seq_pack plans one shard-key shuffle over a pruned scan") {
    val df = operators.TextAnalysis.seqPack(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan
    // AdaptiveSparkPlan.toString prints BOTH the final and the initial
    // plan — count shuffles in the final section only
    val finalPlan = plan.toString.split("== Initial Plan ==")(0)
    val shuffles = finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(shuffles == 1, s"expected exactly one shuffle, got $shuffles:\n$plan")
    assert(!finalPlan.contains("rangepartitioning"),
      "seq_pack must never global-sort")
    // the scan leaf sits inside an AQE query stage — assert the pruned
    // read schema from the rendered plan
    assert(finalPlan.contains(
      "ReadSchema: struct<doc_id:bigint,text:string,source:string>"),
      s"scan must prune to the 3 referenced columns:\n$finalPlan")
  }
}

/** Same discipline for rollup_sales: the rollup-over-pre-aggregate form
  * must equal the native rollup bit-for-bit, and its Expand must sit
  * above the fact aggregate (replicating ≤|flag×status| rows), not on
  * the scan (replicating every fact row ×3).
  */
class RelationalPlanSpec extends SparkSpec {
  import org.apache.spark.sql.functions.col

  test("rollup-over-pre-aggregate is bit-identical to native rollup") {
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.mkString("|")).toSet
    }
    assert(rowsOf(operators.Relational.rollupSales(spark, sf)) ==
      rowsOf(operators.Relational.rollupSalesNative(spark, sf)))
  }

  test("grouping-sets-over-pre-aggregate is bit-identical to native grouping sets") {
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val cols = df.columns.sorted.toIndexedSeq
      df.select(cols.map(col): _*).collect().map(_.mkString("|")).toSet
    }
    assert(rowsOf(operators.Relational.groupingSetsSales(spark, sf)) ==
      rowsOf(operators.Relational.groupingSetsSalesNative(spark, sf)))
  }

  test("grouping-sets Expand runs over the pre-aggregate, not the scan") {
    val plan = operators.Relational.groupingSetsSales(spark, sf)
      .queryExecution.optimizedPlan
    val expands = plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }
    assert(expands.nonEmpty, "grouping sets should still plan an Expand")
    expands.foreach { e =>
      val under = e.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 3 => a
      }
      assert(under.nonEmpty, "Expand is replicating raw fact rows")
    }
  }

  test("rollup Expand runs over the pre-aggregate, not the scan") {
    // logical plan: the physical tree hides inside AdaptiveSparkPlanExec
    val plan = operators.Relational.rollupSales(spark, sf)
      .queryExecution.optimizedPlan
    val expands = plan.collect {
      case e: org.apache.spark.sql.catalyst.plans.logical.Expand => e
    }
    assert(expands.nonEmpty, "rollup should still plan an Expand")
    // the Expand's subtree must already contain the (flag, status) fact
    // aggregate — i.e. it replicates pre-aggregated rows, not the scan
    expands.foreach { e =>
      val under = e.child.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
            if a.groupingExpressions.size == 2 => a
      }
      assert(under.nonEmpty, "Expand is replicating raw fact rows")
    }
  }
}
