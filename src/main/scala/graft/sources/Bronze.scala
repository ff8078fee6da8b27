package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze ingestion layer — the Spark-native equivalent of the
  * reference's S3 landing → bronze flow (ref:
  * s3_data_landing_component.py: per-source-system landing prefixes,
  * parquet bronze tables, freshness metadata).
  *
  * Source formats: parquet (the reference's landing format), plus CSV
  * and JSON for generic landing zones. The bronze sink is
  * date-partitioned parquet with ingest metadata columns — at 100 TB
  * partitioning by ingest date keeps compaction and retention
  * per-partition, and downstream readers get partition pruning.
  */
object Bronze {

  /** Read a landing-zone file in the named format. A schema can be
    * supplied to avoid sampling-inference jobs at scale.
    */
  def readLanding(spark: SparkSession, path: String, format: String,
                  schema: Option[StructType] = None): DataFrame = {
    val base = format.toLowerCase match {
      case "parquet" => spark.read.format("parquet")
      case "orc"     => spark.read.format("orc")
      case "csv"     => spark.read.format("csv").option("header", "true")
      case "json"    => spark.read.format("json")
      case other     => throw new IllegalArgumentException(s"unsupported landing format: $other")
    }
    schema.fold(base.option("inferSchema", "true"))(s => base.schema(s)).load(path)
  }

  /** Stamp ingest metadata (source system, table, batch id) — the
    * bronze contract every downstream silver transform can rely on.
    * `ingestDate` is an explicit parameter (not now()) so re-runs are
    * deterministic and idempotent per batch.
    */
  def withIngestMeta(df: DataFrame, sourceSystem: String, table: String,
                     ingestDate: String, batchId: String): DataFrame =
    df.withColumn("_source_system", lit(sourceSystem))
      .withColumn("_source_table", lit(table))
      .withColumn("_ingest_date", lit(ingestDate).cast("date"))
      .withColumn("_batch_id", lit(batchId))

  /** Write a bronze table partitioned by ingest date. */
  def writeBronze(df: DataFrame, outPath: String): Unit =
    df.write.mode("overwrite")
      .partitionBy("_ingest_date")
      .parquet(outPath)

  /** Event-driven landing→bronze: a Structured Streaming file source
    * watches the landing path (the reference's S3 sensor, ref:
    * s3_data_landing_component.py sensors) and appends each new file's
    * rows to the bronze path. Returns the started query; callers stop
    * it (tests: processAllAvailable + stop).
    */
  def streamIngest(spark: SparkSession, landingPath: String, schema: StructType,
                   sourceSystem: String, table: String, ingestDate: String,
                   bronzePath: String, checkpointPath: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val raw = spark.readStream.schema(schema).parquet(landingPath)
    val stamped = withIngestMeta(raw, sourceSystem, table, ingestDate,
      batchId = s"stream-$ingestDate")
    stamped.writeStream
      .format("parquet")
      .option("path", bronzePath)
      .option("checkpointLocation", checkpointPath)
      .outputMode("append")
      .start()
  }

  /** Full landing→bronze hop for one table. */
  def ingest(spark: SparkSession, landingPath: String, format: String,
             sourceSystem: String, table: String, ingestDate: String,
             batchId: String, bronzePath: String,
             schema: Option[StructType] = None): DataFrame = {
    val raw = readLanding(spark, landingPath, format, schema)
    val stamped = withIngestMeta(raw, sourceSystem, table, ingestDate, batchId)
    writeBronze(stamped, bronzePath)
    stamped
  }
}
