package graft

/** The whole engine must be drivable from spark.sql, like the
  * reference's Trino SQL surface.
  */
class SqlSurfaceSpec extends SparkSpec {

  test("base tables and models are queryable via SQL") {
    GraftCatalog.registerAll(spark, sf)
    assert(spark.sql(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1").count() > 0)
    assert(spark.sql("SELECT count(*) FROM dim_customer").head.getLong(0) ==
      Tables.customer(spark, sf).count())
    assert(spark.sql(
      "SELECT * FROM gold_funnel WHERE enrolled > 0").count() > 0)
    // predicates on a view push through to the parquet scan
    val plan = spark.sql("SELECT c_name FROM dim_customer WHERE c_custkey = 7")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,7)]"),
      s"filter not pushed:\n$plan")
  }

  test("materialized lake tables are queryable via SQL with partition pruning") {
    val tmp = java.nio.file.Files.createTempDirectory("sql_lake").toString
    Pipeline.runSilver(spark, sf, tmp)
    GraftCatalog.registerLake(spark, tmp)
    assert(spark.sql("SELECT count(*) FROM dim_customer_tbl").head.getLong(0) ==
      Tables.customer(spark, sf).count())
    // a time filter on the partitioned fact prunes through the view
    // (filter-only: an aggregate would wrap the scan in an AQE plan)
    val pruned = spark.sql(
      "SELECT * FROM fact_lineitem_tbl WHERE ship_date = DATE'1996-01-02'")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.nonEmpty)
    assert(scan.selectedPartitions.partitionCount <= 1)
  }

  test("sketch functions are available in SQL without registration") {
    // GraftSession.builder injects GraftExtensions — no Sketches.register
    GraftCatalog.registerTables(spark, sf)
    val row = spark.sql(
      """SELECT doc_id,
           simhash_bits(transform(split(trim(text), '\\s+'), t -> xxhash64(t))) AS sh,
           dot_d(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp
         FROM documents LIMIT 1""").head
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getAs[Long]("sh") != 0L)
  }
}
