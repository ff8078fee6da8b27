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

  test("events loader: TRUE parquet TIMESTAMP(NANOS) reads scoped — session conf untouched") {
    import org.apache.parquet.example.data.simple.SimpleGroupFactory
    import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupWriteSupport}
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageTypeParser, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

    val schema = Types.buildMessage()
      .required(PrimitiveTypeName.INT64).named("event_id")
      .required(PrimitiveTypeName.INT64)
      .as(LogicalTypeAnnotation.timestampType(true, TimeUnit.NANOS)).named("ts")
      .named("events")
    val d = java.nio.file.Files.createTempDirectory("tables_nanos").toString
    val file = new org.apache.hadoop.fs.Path(s"$d/events.parquet/part-0.parquet")
    val conf = new org.apache.hadoop.conf.Configuration()
    GroupWriteSupport.setSchema(schema, conf)
    val w = ExampleParquetWriter.builder(file).withConf(conf).build()
    val g = new SimpleGroupFactory(schema).newGroup()
    g.add("event_id", 1L)
    g.add("ts", micros * 1000L)
    w.write(g)
    w.close()

    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key) // Some("false"): the default
    assert(!before.contains("true"))
    // a bare read of the NANOS file fails (that is what the loader's
    // fallback catches)
    intercept[Exception] { spark.read.parquet(s"$d/events.parquet").schema }
    assert(loadedMicros(d) == micros)
    // the legacy handling rode the inference window + the relation's
    // read options: the session value is exactly what it was, so later
    // parquet reads in this session are unaffected
    assert(spark.conf.getOption(key) == before,
      "legacy nanos conf must not leak into the session")
    // and a bare NANOS read still fails — proof the session did not
    // silently inherit the legacy behavior
    intercept[Exception] { spark.read.parquet(s"$d/events.parquet").schema }
  }

  test("events loader: an unreadable ts type is refused loudly") {
    val d = dirFor(Seq((1L, "not-a-time")).toDF("event_id", "ts"))
    val e = intercept[IllegalStateException] { Tables.events(spark, d) }
    assert(e.getMessage.contains("unsupported type"))
  }
}
