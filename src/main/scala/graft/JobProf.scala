package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Diagnostic main (guide §1 measure-first): run selected SparkEntry
  * keys once with a job-level listener and print, per key, the Spark
  * job count, summed job wall time, and the driver-side gap (wall −
  * union of job intervals) — the number that tells whether a key is
  * bounded by query execution or by per-job/driver overhead. Not part
  * of the bench contract; numbers here guide optimization only.
  *
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_ONLY.
  */
object JobProf {
  final case class JobRec(id: Int, desc: String, start: Long, var end: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRec]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = js.stageInfos.lastOption.map(_.name)
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))))
          .getOrElse("")
        jobs.put(js.jobId, JobRec(js.jobId, desc, js.time, -1L))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
    }
    spark.sparkContext.addSparkListener(listener)

    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warmup pass (classload/JIT), unprofiled
    names.foreach { n =>
      try consume(SparkEntry.queries(n)(spark, sfDir))
      catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    names.foreach { n =>
      jobs.clear()
      val c0 = graft.lake.LakeTable.commitNanos
      val fo0 = graft.lake.LakeTable.fileOpsNanos
      val t0 = System.nanoTime()
      try consume(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => System.err.println(s"[$n] FAILED: $e") }
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val cS = (graft.lake.LakeTable.commitNanos - c0) / 1e9
      val foS = (graft.lake.LakeTable.fileOpsNanos - fo0) / 1e9
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq.filter(_.end > 0).sortBy(_.start)
      // union of job intervals -> busy time; wall - busy = driver gap
      var busy = 0L
      var curS = -1L; var curE = -1L
      recs.foreach { r =>
        if (r.start > curE) { busy += (curE - curS) max 0L; curS = r.start; curE = r.end }
        else if (r.end > curE) curE = r.end
      }
      busy += (curE - curS) max 0L
      val sumJob = recs.map(r => r.end - r.start).sum
      System.err.println(f"[$n] wall=$wall%.2fs jobs=${recs.size} " +
        f"jobSum=${sumJob / 1e3}%.2fs jobUnion=${busy / 1e3}%.2fs " +
        f"driverGap=${wall - busy / 1e3}%.2fs commit=$cS%.2fs fileops=$foS%.2fs")
      val byDesc = recs.groupBy(r => if (r.desc.length > 60) r.desc.take(60) else r.desc)
        .map { case (d, rs) => (d, rs.size, rs.map(r => r.end - r.start).sum / 1e3) }
        .toSeq.sortBy(-_._3)
      byDesc.take(15).foreach { case (d, n2, s) =>
        System.err.println(f"    $s%7.2fs x$n2%-3d $d")
      }
    }
    spark.stop()
  }
}
