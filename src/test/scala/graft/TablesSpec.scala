package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** The schema-adaptive events loader (round-11 post-mortem): the
  * driver's testdata has shipped `events.ts` as parquet
  * TIMESTAMP(NANOS), and later as plain timestamp[us] (read as
  * TIMESTAMP_NTZ). `Tables.events` must yield the SAME session-zone
  * TimestampType column — same epoch instants — from every physical
  * form, so every events query is insulated from the next
  * regeneration flip. (The true NANOS branch needs a writer Spark
  * doesn't have; its long-typed surface — what the legacy conf turns
  * NANOS into — is exercised directly.)
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  // one known instant: 2024-03-05 06:07:08.123456 UTC
  private val micros = 1709618828123456L

  private def dirFor(rows: org.apache.spark.sql.DataFrame): String = {
    val d = java.nio.file.Files.createTempDirectory("tables_ev").toString
    rows.write.parquet(s"$d/events.parquet")
    d
  }

  private def loadedMicros(d: String): Long = {
    val df = Tables.events(spark, d)
    assert(df.schema("ts").dataType == TimestampType,
      s"loader must normalize ts to TimestampType, got ${df.schema("ts").dataType}")
    df.select(unix_micros(col("ts"))).as[Long].head()
  }

  test("events loader: long ts (nanos-as-long surface) converts to the instant") {
    val d = dirFor(Seq((1L, micros * 1000L)).toDF("event_id", "ts"))
    assert(loadedMicros(d) == micros)
  }

  test("events loader: timestamp_ntz ts casts to the same instant under UTC") {
    val ntz = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val d = dirFor(ntz)
    // written as timestamp[us] without UTC adjustment — exactly the
    // current testdata's physical form; Spark reads it back as NTZ
    assert(spark.read.parquet(s"$d/events.parquet").schema("ts").dataType ==
      TimestampNTZType)
    assert(loadedMicros(d) == micros)
  }

  test("events loader: plain timestamp ts passes through unchanged") {
    val d = dirFor(Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts")))
    assert(loadedMicros(d) == micros)
  }

  test("events loader: an unreadable ts type is refused loudly") {
    val d = dirFor(Seq((1L, "not-a-time")).toDF("event_id", "ts"))
    val e = intercept[IllegalStateException] { Tables.events(spark, d) }
    assert(e.getMessage.contains("unsupported type"))
  }
}
