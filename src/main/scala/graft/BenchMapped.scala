package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** Maintenance-surface micro-bench: the SAME DML + maintenance sequence
  * (overwrite, upsert-merge, update, delete, compact, full read) on an
  * UNMAPPED lake table vs a COLUMN-MAPPED one (rename applied before
  * the DML, so every write/read/skipping path pays the logical →
  * physical translation). Prints one JSON line with both timing maps.
  *
  * Column mapping translation is plan-time name rewriting, so the two
  * columns should be equal within noise at any scale — this main is
  * the measured evidence (PLANS.md).
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.BenchMapped"
  */
object BenchMapped {
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

    def consume(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def sequence(mapped: Boolean): Seq[(String, Double)] = {
      val t = java.nio.file.Files.createTempDirectory(
        if (mapped) "bm_mapped" else "bm_plain").toString + "/t"
      val orders = Tables.orders(spark, sfDir)
      def timed(name: String)(body: => Unit): (String, Double) = {
        val t0 = System.nanoTime(); body
        name -> (System.nanoTime() - t0) / 1e9
      }
      val steps = Seq.newBuilder[(String, Double)]
      steps += timed("overwrite") {
        LakeTable.overwrite(spark, t, orders)
      }
      if (mapped) {
        LakeTable.enableColumnMapping(spark, t)
        // rename a column the merge/update/delete/read all touch
        LakeTable.renameColumn(spark, t, "o_totalprice", "price")
      }
      val priceCol = if (mapped) "price" else "o_totalprice"
      val updates = LakeTable.read(spark, t)
        .filter(col("o_orderkey") % 100 === 0)
        .withColumn(priceCol, col(priceCol) * 1.1)
      steps += timed("merge")(LakeTable.merge(spark, t, updates, Seq("o_orderkey")))
      steps += timed("update") {
        LakeTable.update(spark, t, Seq(priceCol -> (col(priceCol) + 1.0)),
          col("o_orderkey") % 101 === 0)
      }
      steps += timed("delete")(LakeTable.delete(spark, t, col("o_orderkey") % 103 === 0))
      steps += timed("compact")(LakeTable.compact(spark, t, smallFileBytes = 256L << 20))
      steps += timed("read")(consume(LakeTable.read(spark, t)
        .filter(col(priceCol) > 1000.0)))
      steps.result()
    }

    // warmup both paths once, then time
    sequence(mapped = false); sequence(mapped = true)
    val plain = sequence(mapped = false)
    val mappedRun = sequence(mapped = true)
    def js(steps: Seq[(String, Double)]) =
      steps.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(s"""{"metric":"mapped_vs_plain","unit":"sec","sf":"$sfDir",""" +
      s""""plain":${js(plain)},"plain_total":${plain.map(_._2).sum},""" +
      s""""mapped":${js(mappedRun)},"mapped_total":${mappedRun.map(_._2).sum}}""")
    spark.stop()
  }
}
