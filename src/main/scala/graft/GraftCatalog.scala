package graft

import org.apache.spark.sql.SparkSession

/** SQL surface: the reference's users query through SQL (Trino), so the
  * engine exposes everything to `spark.sql` too — base tables and
  * silver/gold models as temp views, sketch functions in the function
  * registry (also injectable at session build via [[GraftExtensions]]).
  */
object GraftCatalog {

  val baseTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every base table as a temp view over `dir`. */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    baseTables.foreach {
      case "events" => Tables.events(spark, dir).createOrReplaceTempView("events")
      case t        => Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    graft.functions.Sketches.register(spark)
  }

  /** Register the silver and gold models as temp views (lazy — each
    * view is the model's logical plan over the base files, so Catalyst
    * can still push user predicates through it).
    */
  def registerModels(spark: SparkSession, dir: String): Unit = {
    (Pipeline.silverModels ++ Pipeline.goldModels).foreach { case (name, fn) =>
      fn(spark, dir).createOrReplaceTempView(name)
    }
  }

  /** Register the MATERIALIZED lake tables of a pipeline warehouse as
    * temp views (`<name>_tbl`, to keep the lazy model views available
    * alongside) — the analog of the reference's Glue-cataloged Iceberg
    * tables being queryable by name in Trino. Partition pruning works
    * through the view: the view body is a lake snapshot scan.
    */
  def registerLake(spark: SparkSession, warehouseDir: String): Unit =
    Seq("silver" -> Pipeline.silverModels.keySet, "gold" -> Pipeline.goldModels.keySet)
      .foreach { case (layer, names) =>
        names.foreach { name =>
          val path = Pipeline.tablePath(warehouseDir, layer, name)
          if (graft.lake.LakeTable.versions(spark, path).nonEmpty)
            graft.lake.LakeTable.read(spark, path).createOrReplaceTempView(s"${name}_tbl")
        }
      }

  /** Full SQL surface in one call. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerModels(spark, dir)
  }
}

/** Session extensions: inject the custom expressions as SQL functions
  * at session build time (`GraftSession.builder` applies this), so SQL
  * users get simhash_bits / minhash_sig / dot_d / jaccard_sorted /
  * lsh_sigs without any registration call.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.Sketches._

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Sketches", name),
        builder))
    inject("simhash_bits", es => SimHashBits(es.head))
    inject("minhash_sig", es => MinHashSig(es.head, es(1).eval().asInstanceOf[Int]))
    inject("dot_d", es => DotProductD(es.head, es(1)))
    inject("jaccard_sorted", es => JaccardSorted(es.head, es(1)))
    inject("lsh_sigs", es => LshSigs(es.head,
      es(1).eval().asInstanceOf[Int],
      es(2).eval().asInstanceOf[Int],
      es(3).eval().asInstanceOf[Int].toLong))
    inject("char_entropy", es => CharEntropy(es.head))
  }
}
