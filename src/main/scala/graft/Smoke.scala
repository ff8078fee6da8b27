package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pre-snapshot smoke gate: read EVERY base table of the CURRENT
  * `/root/testdata` through the exact loaders the queries use, and
  * count.
  *
  * Exists because of the round-10 episode: the testdata was regenerated
  * with `events.ts` in a different physical type after the snapshot
  * shipped green, and every events consumer failed the official gate.
  * External testdata is untrusted input — this main proves, in ~30s,
  * that every loader still agrees with the data ON DISK RIGHT NOW.
  * Run before any snapshot commit:
  *
  * {{{ sbt "runMain graft.Smoke" }}}            (all three SFs)
  * {{{ sbt "runMain graft.Smoke /root/testdata/sf0.01" }}}
  *
  * Exits non-zero (and prints FAIL lines) if any loader throws or
  * returns an empty table.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = GraftSession.get()
    val loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "region"     -> (Tables.region _),
      "nation"     -> (Tables.nation _),
      "customer"   -> (Tables.customer _),
      "supplier"   -> (Tables.supplier _),
      "part"       -> (Tables.part _),
      "orders"     -> (Tables.orders _),
      "lineitem"   -> (Tables.lineitem _),
      "events"     -> (Tables.events _),
      "documents"  -> (Tables.documents _),
      "embeddings" -> (Tables.embeddings _))
    var failures = List.empty[String]
    for (dir <- dirs; (name, load) <- loaders) {
      val label = s"$dir/$name"
      try {
        val df = load(spark, dir)
        val n = df.count()
        // force full materialization of every column: a loader whose
        // cast only fails at execution time must fail HERE, not in a query
        df.foreach(_ => ())
        if (n > 0) println(s"SMOKE OK   $label rows=$n")
        else { failures ::= label; println(s"SMOKE FAIL $label: 0 rows") }
      } catch {
        case e: Exception =>
          failures ::= label
          println(s"SMOKE FAIL $label: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(3).mkString(" | "))
      }
    }
    if (failures.nonEmpty) {
      println(s"SMOKE: ${failures.size} FAILURES: ${failures.reverse.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    println("SMOKE: all loaders green against current testdata")
    spark.stop()
  }
}
