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

  test("a fresh session resolves lake tables by name from the persisted catalog") {
    val tmp = java.nio.file.Files.createTempDirectory("sql_catalog").toString
    Pipeline.runSilver(spark, sf, tmp) // materialization writes _catalog.json
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/_catalog.json")))
    // a brand-new session has empty temp-view state: without the
    // persisted catalog it cannot see any lake table...
    val s2 = spark.newSession()
    intercept[org.apache.spark.sql.AnalysisException] {
      s2.sql("SELECT count(*) FROM fact_events_tbl").collect()
    }
    // ...but restores the full surface from the warehouse dir alone
    s2.conf.set("spark.graft.warehouse", tmp)
    val restored = GraftCatalog.init(s2)
    assert(restored.toSet == Pipeline.silverModels.keySet.map(_ + "_tbl"))
    assert(s2.sql("SELECT count(*) FROM fact_events_tbl").head.getLong(0) ==
      operators.Conform.factEvents(spark, sf).count())
    // partition pruning is intact through the restored view
    val day = s2.sql("SELECT min(event_date) FROM fact_events_tbl").head.getDate(0)
    val pruned = s2.sql(s"SELECT * FROM fact_events_tbl WHERE event_date = DATE'$day'")
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
