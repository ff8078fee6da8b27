package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line. A full warmup pass runs first so the
  * timed passes measure steady-state engine throughput (plan + codegen
  * compiled, JIT warm, parquet footers in page cache) rather than JVM
  * startup — the regime that matters for a long-running cluster.
  *
  * The benchmarked action is a `noop`-sink write, not count():
  * count() lets Catalyst prune every projected column, so
  * row-preserving queries (redact_pii, token_count, fact_*) would be
  * timed without their regex/hash work. The noop sink consumes every
  * column of every row and discards it — full computation, no I/O.
  *
  * A query that throws is reported in a separate "failed" list with
  * value -1, never as a (fast-looking) partial elapsed time. Two timed
  * passes run after warmup and the per-query minimum is kept —
  * single-sample local[32] timings carry ±30% background-load noise.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Sample BEFORE any query runs: the bench itself drives the box to
    // full load, so an end-of-run sample would measure our own work and
    // stamp RETRY on every healthy run. Pre-existing load is what
    // inflates timings.
    val load = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

    // Full materialization of every column, zero sink cost.
    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (diagnosis; the driver
    // never sets it, so driver benches always cover every query)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // warmup: execute each query once (ignore failures; timed passes report them)
    names.foreach { n =>
      try consume(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // operators cache intermediates; isolate queries
    }

    val timedRuns = 2
    val results = names.map { name =>
      var best = Double.MaxValue
      var failed = false
      var run = 0
      while (run < timedRuns && !failed) {
        val t0 = System.nanoTime()
        try {
          consume(SparkEntry.queries(name)(spark, sfDir))
          best = math.min(best, (System.nanoTime() - t0) / 1e9)
        } catch { case _: Throwable => failed = true }
        spark.catalog.clearCache() // not part of the measured query
        run += 1
      }
      name -> (if (failed) -1.0 else best)
    }
    val ok = results.filter(_._2 >= 0)
    val failedNames = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // in-band box-load indicator: rounds 6 and 10 both produced
    // 2-4x-inflated numbers on a loaded box that read as regressions
    // until re-measured — record the 1-min load average with the
    // timings so noise is diagnosable from the artifact alone.
    // Unavailable (negative) reads as null, cpus is numeric, and a
    // loaded box stamps load_note=RETRY so the artifact carries its
    // own "re-measure before judging" flag.
    val loadJson = if (load < 0.0) "null" else load.toString
    val loadNote =
      if (load > 1.5) s""","load_note":"RETRY: load_avg ${"%.2f".format(load)} > 1.5 at sample time - timings likely inflated; re-measure on a quiet box""""
      else ""
    val cpusJson = cpus.toIntOption.map(_.toString).getOrElse("\"" + cpus + "\"")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""failed":${failedNames.mkString("[", ",", "]")},"runs":$timedRuns,""" +
      s""""load_avg_1m":$loadJson,"cpus":$cpusJson,"sf":"$sfDir"$loadNote}""")
    spark.stop()
  }
}
