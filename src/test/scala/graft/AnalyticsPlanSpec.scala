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
