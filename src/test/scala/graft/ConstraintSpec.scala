package graft

import org.apache.spark.sql.functions._
import graft.lake.LakeTable

/** CHECK constraints (Delta invariants analog): the transaction log
  * carries named boolean SQL expressions; ADD validates existing data
  * first, every row-adding commit enforces the set in-flight during
  * the write (zero extra passes), the stamp survives restarts /
  * checkpoints / overwrites, and a violating write fails loudly naming
  * the constraint. SQL CHECK semantics: a NULL evaluation passes.
  */
class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  private def violates(body: => Any, name: String): Unit = {
    val e = intercept[Exception](body)
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString(" | ")
    assert(all.contains("CHECK constraint violated") && all.contains(name),
      s"expected a CHECK violation naming '$name', got: $all")
  }

  test("append/overwrite enforce constraints in-flight; null passes; drop re-allows") {
    val t = tmpTable("cks_basic")
    LakeTable.overwrite(spark, t,
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    val v = LakeTable.addConstraint(spark, t, "amount_positive", "amount > 0")
    val snap = LakeTable.snapshotAt(spark, t, v)
    assert(snap.constraints == Map("amount_positive" -> "amount > 0"))
    assert(snap.protocol.writer == 4, "constraints stamp writer-version 4")

    // violating append fails naming the constraint; nothing committed
    violates(LakeTable.append(spark, t,
      Seq((3L, -5.0)).toDF("id", "amount")), "amount_positive")
    assert(LakeTable.read(spark, t).count() == 2)
    // passing append commits; NULL evaluations pass (SQL CHECK)
    LakeTable.append(spark, t,
      Seq((3L, Some(30.0)), (4L, None)).toDF("id", "amount"))
    assert(LakeTable.read(spark, t).count() == 4)
    // overwrite keeps the constraint and validates replacement rows
    violates(LakeTable.overwrite(spark, t,
      Seq((9L, -1.0)).toDF("id", "amount")), "amount_positive")
    LakeTable.overwrite(spark, t, Seq((9L, 1.0)).toDF("id", "amount"))
    assert(LakeTable.latestSnapshot(spark, t).get.constraints.size == 1)
    // drop re-allows
    LakeTable.dropConstraint(spark, t, "amount_positive")
    LakeTable.append(spark, t, Seq((10L, -3.0)).toDF("id", "amount"))
    assert(LakeTable.read(spark, t).filter(col("amount") < 0).count() == 1)
  }

  test("ADD CONSTRAINT validates existing data and refuses violations with an example") {
    val t = tmpTable("cks_existing")
    LakeTable.overwrite(spark, t, Seq((1L, 5.0), (2L, -2.0)).toDF("id", "amount"))
    val e = intercept[IllegalArgumentException](
      LakeTable.addConstraint(spark, t, "amount_positive", "amount > 0"))
    assert(e.getMessage.contains("existing") && e.getMessage.contains("amount_positive"))
    assert(LakeTable.latestSnapshot(spark, t).get.constraints.isEmpty)
    // duplicate name and bad identifier refused
    LakeTable.addConstraint(spark, t, "id_notnull", "id IS NOT NULL")
    intercept[IllegalArgumentException](
      LakeTable.addConstraint(spark, t, "id_notnull", "id > 0"))
    intercept[IllegalArgumentException](
      LakeTable.addConstraint(spark, t, "bad name!", "id > 0"))
    intercept[Exception](
      LakeTable.addConstraint(spark, t, "syntax", "id >>> 0"))
  }

  test("UPDATE and MERGE validate rewritten/new rows; DELETE and compact are exempt") {
    val t = tmpTable("cks_dml")
    LakeTable.overwrite(spark, t, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amount"))
    LakeTable.addConstraint(spark, t, "amount_cap", "amount <= 100")
    // UPDATE that pushes a row over the cap fails; table unchanged
    violates(LakeTable.update(spark, t,
      Seq("amount" -> (col("amount") * 1000)), col("id") === 1L), "amount_cap")
    assert(LakeTable.read(spark, t).agg(max("amount")).head.getDouble(0) == 20.0)
    // compliant update passes
    LakeTable.update(spark, t, Seq("amount" -> (col("amount") + 1)), col("id") === 1L)
    // MERGE inserting a violating row fails
    violates(LakeTable.merge(spark, t,
      Seq((3L, 500.0)).toDF("id", "amount"), Seq("id")), "amount_cap")
    LakeTable.merge(spark, t, Seq((3L, 50.0)).toDF("id", "amount"), Seq("id"))
    assert(LakeTable.read(spark, t).count() == 3)
    // DELETE rewrites only kept (already-validated) rows — exempt, works
    LakeTable.delete(spark, t, col("id") === 2L)
    assert(LakeTable.read(spark, t).count() == 2)
    // compact preserves values — exempt, works, constraint survives
    LakeTable.append(spark, t, Seq((4L, 60.0)).toDF("id", "amount"))
    LakeTable.compact(spark, t)
    assert(LakeTable.latestSnapshot(spark, t).get.constraints.contains("amount_cap"))
    violates(LakeTable.append(spark, t,
      Seq((5L, 101.0)).toDF("id", "amount")), "amount_cap")
  }

  test("constraints survive checkpoints, reconstruction, and a fresh-session read") {
    val t = tmpTable("cks_persist")
    LakeTable.overwrite(spark, t, Seq((1L, 1.0)).toDF("id", "amount"))
    LakeTable.addConstraint(spark, t, "amount_positive", "amount > 0")
    // push past a checkpoint interval so reconstruction goes through it
    (2 to 12).foreach(i =>
      LakeTable.append(spark, t, Seq((i.toLong, i.toDouble)).toDF("id", "amount")))
    val snap = LakeTable.latestSnapshot(spark, t).get
    assert(snap.version >= 11 && snap.constraints.contains("amount_positive"))
    // every retained version at/after the ADD carries the set
    assert(LakeTable.snapshotAt(spark, t, snap.version - 1)
      .constraints.contains("amount_positive"))
    violates(LakeTable.append(spark, t,
      Seq((99L, -1.0)).toDF("id", "amount")), "amount_positive")
  }

  test("a constraint referencing a column absent from an evolution append passes") {
    val t = tmpTable("cks_evolve")
    LakeTable.overwrite(spark, t, Seq((1L, 5.0)).toDF("id", "amount"))
    LakeTable.addConstraint(spark, t, "amount_positive", "amount > 0")
    // schema-evolution append WITHOUT the constrained column: readers
    // see null for it -> SQL CHECK passes
    LakeTable.append(spark, t, Seq((2L, "x")).toDF("id", "note"))
    val out = LakeTable.read(spark, t)
    assert(out.count() == 2 && out.filter(col("amount").isNull).count() == 1)
  }

  test("a write racing ADD CONSTRAINT aborts instead of committing unvalidated rows") {
    // drive the commit-time drift guard directly: rows staged against a
    // snapshot WITHOUT the constraint must not land on one WITH it
    val m = LakeTable.getClass.getDeclaredMethods
      .find(_.getName == "checkConstraintsStable")
      .getOrElse(fail("checkConstraintsStable not found"))
    m.setAccessible(true)
    def snapWith(cks: Map[String, String]): LakeTable.Snapshot =
      LakeTable.Snapshot(1L, 0L, "APPEND",
        org.apache.spark.sql.types.StructType(Nil), Nil, Nil, constraints = cks)
    def invoke(stage: Map[String, String], commit: Map[String, String]): Unit =
      try m.invoke(LakeTable, "t", Some(snapWith(stage)), Some(snapWith(commit)))
      catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }
    // unchanged / dropped constraints: fine (the write over-checked)
    invoke(Map("a" -> "x > 0"), Map("a" -> "x > 0"))
    invoke(Map("a" -> "x > 0"), Map.empty)
    // added or CHANGED since staging: abort loudly
    val e1 = intercept[LakeTable.ConcurrentCommitException](
      invoke(Map.empty, Map("a" -> "x > 0")))
    assert(e1.getMessage.contains("ADD CONSTRAINT"))
    val e2 = intercept[LakeTable.ConcurrentCommitException](
      invoke(Map("a" -> "x > 0"), Map("a" -> "x > 1")))
    assert(e2.getMessage.contains("a"))
  }

  test("streaming sink enforces constraints per micro-batch commit") {
    val t = tmpTable("cks_stream")
    LakeTable.overwrite(spark, t, Seq((1L, 5.0)).toDF("id", "amount"))
    LakeTable.addConstraint(spark, t, "amount_positive", "amount > 0")
    violates(LakeTable.appendStream(spark, t,
      Seq((2L, -1.0)).toDF("id", "amount"), "q-cks", 0L), "amount_positive")
    assert(LakeTable.appendStream(spark, t,
      Seq((2L, 2.0)).toDF("id", "amount"), "q-cks", 1L).isDefined)
    assert(LakeTable.read(spark, t).count() == 2)
  }
}
