package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.lake.{GeneratedColumns, LakeTable}
import GeneratedColumns.Spec

/** Generated partition columns (hidden partitioning): write-side
  * derivation == read-side literal mapping (UTC property), predicate
  * synthesis soundness, layout inheritance across every write path,
  * and — the point — partition pruning from RAW-column predicates,
  * isolated from min/max skipping via the 32-column stats cap.
  */
class GeneratedColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"gen_$tag").toString + "/t"

  // ~±40 years of micros around epoch, deterministic
  private def randomMicros(n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(rnd.nextLong() % (40L * 365 * 86400000000L))
  }

  test("write-side expression equals read-side literal math, all transforms, pre-epoch included") {
    val micros = randomMicros(500) ++ Seq(0L, -1L, 1L, -86400000000L)
    val df = micros.toDF("us").select(timestamp_micros($"us").as("ts"))
    val out = df.select(
      $"ts",
      GeneratedColumns.genColumn("hour", "ts", TimestampType).as("h"),
      GeneratedColumns.genColumn("day", "ts", TimestampType).as("d"),
      GeneratedColumns.genColumn("month", "ts", TimestampType).as("m"),
      GeneratedColumns.genColumn("year", "ts", TimestampType).as("y"))
    // compare against the driver-side Literal math on internal values
    val rows = out.queryExecution.toRdd.collect() // InternalRows: micros/days raw
    rows.foreach { r =>
      val us = r.getLong(0)
      def t(tf: String) = GeneratedColumns.evalTransform(tf, Literal(us, TimestampType)).get.value
      assert(r.getLong(1) == t("hour"), s"hour($us)")
      assert(r.getInt(2) == t("day"), s"day($us)")
      assert(r.getInt(3) == t("month"), s"month($us)")
      assert(r.getInt(4) == t("year"), s"year($us)")
    }
    // DATE source for day/month/year
    val dd = Seq(18000, -3, 0, 40000).toDF("days")
      .select(date_from_unix_date($"days").as("dt"), $"days")
    val dout = dd.select($"days",
      GeneratedColumns.genColumn("day", "dt", DateType).as("d"),
      GeneratedColumns.genColumn("month", "dt", DateType).as("m"),
      GeneratedColumns.genColumn("year", "dt", DateType).as("y"))
    dout.queryExecution.toRdd.collect().foreach { r =>
      val days = r.getInt(0)
      def t(tf: String) = GeneratedColumns.evalTransform(tf, Literal(days, DateType)).get.value
      assert(r.getInt(1) == t("day"))
      assert(r.getInt(2) == t("month"))
      assert(r.getInt(3) == t("year"))
    }
  }

  test("synthesize: comparison shapes map, strictness relaxes, unsound shapes contribute nothing") {
    val gens = Seq(Spec("p_day", "day", "ts"))
    val pSchema = StructType(Seq(StructField("p_day", DateType)))
    val ts = AttributeReference("ts", TimestampType)()
    val resolver = spark.sessionState.conf.resolver
    val us = 1700000000000000L // some instant
    val day = Literal(Math.floorDiv(us, GeneratedColumns.MicrosPerDay).toInt, DateType)
    def synth(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      GeneratedColumns.synthesize(Seq(e), gens, pSchema, resolver)

    synth(EqualTo(ts, Literal(us, TimestampType))) match {
      case Seq(EqualTo(a: AttributeReference, l: Literal)) =>
        assert(a.name == "p_day" && a.dataType == DateType && l == day)
      case other => fail(s"unexpected: $other")
    }
    // strict > relaxes to >= on the truncated value
    synth(GreaterThan(ts, Literal(us, TimestampType))) match {
      case Seq(GreaterThanOrEqual(_: AttributeReference, l: Literal)) => assert(l == day)
      case other => fail(s"unexpected: $other")
    }
    // literal-on-left flips
    synth(GreaterThan(Literal(us, TimestampType), ts)) match {
      case Seq(LessThanOrEqual(_: AttributeReference, l: Literal)) => assert(l == day)
      case other => fail(s"unexpected: $other")
    }
    synth(LessThan(ts, Literal(us, TimestampType))) match {
      case Seq(LessThanOrEqual(_: AttributeReference, l: Literal)) => assert(l == day)
      case other => fail(s"unexpected: $other")
    }
    // IN maps point-wise and dedups
    synth(In(ts, Seq(Literal(us, TimestampType), Literal(us + 1L, TimestampType)))) match {
      case Seq(In(_: AttributeReference, vs)) => assert(vs == Seq(day))
      case other => fail(s"unexpected: $other")
    }
    // null literal: no mapping (the original predicate rejects all rows anyway)
    assert(synth(EqualTo(ts, Literal(null, TimestampType))).isEmpty)
    // cast-wrapped attribute: type domain mismatch, no mapping
    assert(synth(EqualTo(Cast(ts, StringType), Literal("x"))).isEmpty)
    // unrelated column: no mapping
    assert(synth(EqualTo(AttributeReference("other", TimestampType)(),
      Literal(us, TimestampType))).isEmpty)
  }

  test("stamp validation: unknown transform, missing source, wrong type, existing target") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("s", StringType)))
    intercept[IllegalArgumentException] {
      GeneratedColumns.stamp(schema, Seq(Spec("p", "week", "ts")))
    }
    intercept[IllegalArgumentException] {
      GeneratedColumns.stamp(schema, Seq(Spec("p", "day", "nope")))
    }
    intercept[IllegalArgumentException] {
      GeneratedColumns.stamp(schema, Seq(Spec("p", "hour", "s")))
    }
    intercept[IllegalArgumentException] {
      GeneratedColumns.stamp(schema, Seq(Spec("s", "day", "ts")))
    }
  }

  private def eventsDf = Tables.events(spark, sf)
    .select($"event_id", $"user_id", $"event_type", $"value", $"ts")

  test("end to end: derive at write, every later write path preserves the layout and values") {
    val t = tmpTable("e2e")
    val ev = eventsDf
    val days = ev.select(to_date($"ts")).distinct().count()
    assert(days >= 3, s"need multi-day testdata, got $days days")

    LakeTable.overwriteGenerated(spark, t, ev.filter($"event_id" % 3 === 0),
      Seq(Spec("p_day", "day", "ts")))
    // append WITHOUT the column: inherited + derived
    LakeTable.append(spark, t, ev.filter($"event_id" % 3 === 1))
    // append WITH a wrong manual value: recomputed, cannot drift
    LakeTable.append(spark, t, ev.filter($"event_id" % 3 === 2)
      .withColumn("p_day", lit("1999-01-01").cast(DateType)))
    // CoW update + compact keep the layout
    LakeTable.update(spark, t, Seq("value" -> ($"value" + 1)), $"event_id" === 7L)
    LakeTable.compact(spark, t, smallFileBytes = 1L << 30)

    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.partitionColumns == Seq("p_day"))
    assert(GeneratedColumns.specs(snap.schema) == Seq(Spec("p_day", "day", "ts")))
    // every live file sits in a day dir, and stored values match the
    // UTC transform of the source for every row
    assert(snap.files.forall(_.path.contains("p_day=")), snap.files.map(_.path))
    val back = LakeTable.read(spark, t)
    val drift = back.filter(
      $"p_day" =!= date_from_unix_date(
        expr(s"cast((unix_micros(ts) - pmod(unix_micros(ts), ${GeneratedColumns.MicrosPerDay})) div ${GeneratedColumns.MicrosPerDay} as int)")))
    assert(drift.count() == 0, "stored p_day drifted from transform(ts)")
    val expected = ev.withColumn("value",
      when($"event_id" === 7L, $"value" + 1).otherwise($"value"))
    assert(back.drop("p_day").orderBy("event_id").collect().toSeq ==
      expected.orderBy("event_id").collect().toSeq)
  }

  test("hidden pruning: raw-ts range opens only matching day partitions, ISOLATED from stats skipping") {
    // push the timestamp past the 32-column stats cap so the log has NO
    // min/max for it — file-level DataSkipping is blind here, and any
    // pruning observed can only come from the generated-partition
    // synthesis. (Realistic: wide fact tables exceed stats caps; hidden
    // partitioning still prunes.)
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val local = java.nio.file.Files.createTempDirectory("gen_prune").toString + "/t"
    val t = "cfs:" + local
    val pad = (1 to 33).map(i => lit(i).as(s"pad_$i"))
    val ev = eventsDf.select((pad :+ $"event_id" :+ $"value" :+ $"ts"): _*)
    LakeTable.overwriteGenerated(spark, t, ev, Seq(Spec("p_day", "day", "ts")))
    val snap = LakeTable.latestSnapshot(spark, t).get
    val dayDirs = snap.files.map(_.path.split('/').head).distinct
    assert(dayDirs.size >= 3)
    assert(!snap.files.head.stats.keys.exists(_ == "ts"),
      s"test premise broken: ts has logged stats ${snap.files.head.stats.keys}")

    // one full UTC day in the middle of the data
    val someDay = dayDirs.sorted.apply(1).stripPrefix("p_day=")
    val lo = java.time.LocalDate.parse(someDay).atStartOfDay(java.time.ZoneOffset.UTC)
    val loUs = lo.toInstant.toEpochMilli * 1000L
    // inclusive end INSIDE the day: `ts < nextMidnight` would
    // (correctly, conservatively) keep the boundary partition too,
    // since day(nextMidnight) IS the next day
    val hiUs = loUs + GeneratedColumns.MicrosPerDay - 1L

    CountingFileSystem.reset()
    val got = LakeTable.read(spark, t)
      .filter($"ts" >= timestamp_micros(lit(loUs)) && $"ts" <= timestamp_micros(lit(hiUs)))
      .agg(count(lit(1)), sum($"value")).collect()
    val opened = CountingFileSystem.openedUnder("/data/")
      .filter(_.endsWith(".parquet")).distinct
    assert(opened.nonEmpty)
    assert(opened.forall(_.contains(s"p_day=$someDay")),
      s"stats-blind scan opened outside p_day=$someDay: $opened")
    // and the pruned answer is the right answer
    val exp = eventsDf
      .filter($"ts" >= timestamp_micros(lit(loUs)) && $"ts" <= timestamp_micros(lit(hiUs)))
      .agg(count(lit(1)), sum($"value")).collect()
    assert(got.toSeq == exp.toSeq)
  }

  test("writer option route: generatedPartition creates, plain overwrite preserves, reads prune") {
    val t = tmpTable("opt")
    eventsDf.write.format("graft").mode("overwrite")
      .option("generatedPartition", "p_day=day(ts)")
      .save(t)
    val snap1 = LakeTable.latestSnapshot(spark, t).get
    assert(GeneratedColumns.specs(snap1.schema) == Seq(Spec("p_day", "day", "ts")))
    // overwrite WITHOUT the option: layout preserved (like bucketBy)
    eventsDf.filter($"event_id" % 2 === 0).write.format("graft")
      .mode("overwrite").save(t)
    val snap2 = LakeTable.latestSnapshot(spark, t).get
    assert(GeneratedColumns.specs(snap2.schema) == Seq(Spec("p_day", "day", "ts")))
    assert(snap2.partitionColumns == Seq("p_day"))
    assert(LakeTable.read(spark, t).count() == eventsDf.filter($"event_id" % 2 === 0).count())
    // malformed spec string fails loudly
    intercept[IllegalArgumentException] {
      eventsDf.write.format("graft").mode("overwrite")
        .option("generatedPartition", "oops").save(tmpTable("bad"))
    }
  }

  test("truncN transform: derive == literal math, range pruning, retention drop on id ranges") {
    // write/read agreement incl. negatives
    val vals = Seq(-2001L, -1L, 0L, 999L, 1000L, 123456L)
    val df = vals.toDF("id")
      .select($"id", GeneratedColumns.genColumn("trunc1000", "id", LongType).as("b"))
    df.collect().foreach { r =>
      val expect = GeneratedColumns
        .evalTransform("trunc1000", Literal(r.getLong(0), LongType)).get.value
      assert(r.getLong(1) == expect, s"trunc1000(${r.getLong(0)})")
    }
    // end to end: id-range partitioned lake, equality probe prunes,
    // retention delete on an aligned id cutoff drops by metadata
    CountingFileSystem.install(spark.sparkContext.hadoopConfiguration)
    val local = java.nio.file.Files.createTempDirectory("gen_trunc").toString + "/t"
    val t = "cfs:" + local
    val rows = (0L until 5000L).map(i => (i, s"v$i")).toDF("id", "s")
    LakeTable.overwriteGenerated(spark, t, rows, Seq(Spec("p_bkt", "trunc1000", "id")))
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.files.map(_.path.split('/').head).distinct.size == 5)
    CountingFileSystem.reset()
    assert(LakeTable.read(spark, t).filter($"id" === 3456L).count() == 1)
    val opened = CountingFileSystem.openedUnder("/data/")
      .filter(_.endsWith(".parquet")).distinct
    assert(opened.forall(_.contains("p_bkt=3000")), s"opened: $opened")
    CountingFileSystem.reset()
    val v = LakeTable.delete(spark, t, $"id" < 2000L)
    assert(CountingFileSystem.openedUnder("/data/")
      .filter(_.endsWith(".parquet")).isEmpty, "aligned id retention must not read")
    assert(LakeTable.logEntryAt(spark, t, v).removedFull.nonEmpty)
    assert(LakeTable.read(spark, t).count() == 3000)
  }

  test("column evolution: dropping a generated source refuses; renaming it follows the spec") {
    val t = tmpTable("evol")
    LakeTable.overwriteGenerated(spark, t, eventsDf, Seq(Spec("p_day", "day", "ts")))
    val e = intercept[IllegalArgumentException] {
      LakeTable.dropColumn(spark, t, "ts")
    }
    assert(e.getMessage.contains("p_day"))
    LakeTable.renameColumn(spark, t, "ts", "event_ts")
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(GeneratedColumns.specs(snap.schema) == Seq(Spec("p_day", "day", "event_ts")))
    // an append through the renamed schema still derives correctly
    LakeTable.append(spark, t,
      eventsDf.limit(50).withColumnRenamed("ts", "event_ts"))
    val drift = LakeTable.read(spark, t).filter(
      $"p_day" =!= to_date($"event_ts")) // UTC session: to_date == day()
    assert(drift.count() == 0)
  }

  test("z-order compact composes with hidden partitioning: layout, values and pruning survive") {
    val t = tmpTable("zg")
    LakeTable.overwriteGenerated(spark, t, eventsDf, Seq(Spec("p_day", "day", "ts")))
    LakeTable.compact(spark, t, smallFileBytes = 1L << 30,
      zorderBy = Seq("user_id", "value"))
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(GeneratedColumns.specs(snap.schema) == Seq(Spec("p_day", "day", "ts")))
    assert(snap.files.forall(_.path.contains("p_day=")))
    val drift = LakeTable.read(spark, t).filter($"p_day" =!= to_date($"ts"))
    assert(drift.count() == 0)
    assert(LakeTable.read(spark, t).count() == eventsDf.count())
  }

  test("MoR path prunes too: deleteMergeOnRead over a generated table, read stays day-scoped and correct") {
    val t = tmpTable("mor")
    LakeTable.overwriteGenerated(spark, t, eventsDf, Seq(Spec("p_day", "day", "ts")))
    LakeTable.deleteMergeOnRead(spark, t, $"event_id" % 11 === 3)
    val back = LakeTable.read(spark, t).drop("p_day")
    val exp = eventsDf.filter(!($"event_id" % 11 === 3))
    assert(back.orderBy("event_id").collect().toSeq ==
      exp.orderBy("event_id").collect().toSeq)
    // a raw-ts day probe through the MoR relation still answers right
    val day0 = exp.select(to_date(min($"ts"))).head().getDate(0).toString
    val lo = java.time.LocalDate.parse(day0).atStartOfDay(java.time.ZoneOffset.UTC)
    val loUs = lo.toInstant.toEpochMilli * 1000L
    val probe = LakeTable.read(spark, t)
      .filter($"ts" >= timestamp_micros(lit(loUs)) &&
        $"ts" < timestamp_micros(lit(loUs + GeneratedColumns.MicrosPerDay)))
      .count()
    val probeExp = exp
      .filter($"ts" >= timestamp_micros(lit(loUs)) &&
        $"ts" < timestamp_micros(lit(loUs + GeneratedColumns.MicrosPerDay)))
      .count()
    assert(probe == probeExp)
  }
}
