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
    * tables being queryable by name in Trino. The views are LIVE: each
    * is a `format("graft")` relation whose file list re-resolves from
    * the transaction log at every query planning (see
    * [[graft.lake.GraftFileIndex]]), so after any writer's
    * MERGE/append the very next `spark.sql` over the view sees the new
    * rows — no re-registration, matching the reference's
    * query-time Glue resolution. (Only SCHEMA changes still need a
    * re-register: the view's resolved attributes are fixed.) Partition
    * pruning works through the view. Also persists the registry (see
    * [[saveCatalog]]) so a FRESH session can restore the same surface
    * from the warehouse directory alone.
    */
  def registerLake(spark: SparkSession, warehouseDir: String): Unit = {
    Seq("silver" -> Pipeline.silverModels.keySet, "gold" -> Pipeline.goldModels.keySet)
      .foreach { case (layer, names) =>
        names.foreach { name =>
          val path = Pipeline.tablePath(warehouseDir, layer, name)
          if (graft.lake.LakeTable.versions(spark, path).nonEmpty)
            graft.lake.LakeTable.readLive(spark, path).createOrReplaceTempView(s"${name}_tbl")
        }
      }
    // best-effort, like saveCatalog below: namespaced DDL can fail in a
    // restricted session (CREATE DATABASE mkdirs under the session
    // warehouse dir, which a read-only consumer may not own) — the
    // primary <name>_tbl view surface must survive that
    try registerLakeNamespaced(spark, warehouseDir)
    catch { case _: Exception => () }
    // best-effort: a read-only consumer registering over someone else's
    // warehouse must not fail on the catalog write (the producer's
    // materialization path persists it anyway)
    try saveCatalog(spark, warehouseDir)
    catch { case _: java.io.IOException | _: SecurityException => () }
  }

  /** Schema-qualified table names — the identifier surface the
    * reference's users actually type: Trino addresses every model as
    * `{catalog}.{schema}.{table}` (ref trino_iceberg_transform_
    * component.py:116-123 builds `iceberg.silver.dim_students`), so
    * graft registers each materialized lake table under
    * `<layer>.<name>` in the session catalog (`silver.dim_customer`,
    * `gold.gold_funnel`) as an EXTERNAL `USING graft` table at its
    * transaction-log path. Registration is pure metadata — no data is
    * read or written:
    *
    *  - SELECT resolves through [[graft.lake.GraftDataSource]] to the
    *    same live relation the `<name>_tbl` views serve (query-time
    *    snapshot resolution, partition pruning, filter pushdown);
    *  - INSERT INTO routes through the relation's `InsertableRelation`
    *    (transactional append / layout-preserving overwrite);
    *  - MERGE/UPDATE/DELETE and the maintenance SQL (OPTIMIZE,
    *    DESCRIBE HISTORY, VACUUM, ...) resolve the 2-part name through
    *    the same analyzed-plan path as registered views
    *    ([[graft.lake.GraftSqlParser.resolveTarget]] calls
    *    `spark.table`, which accepts `db.table`).
    *
    * New COMMITS are visible on the very next query with no ceremony
    * (the relation's file index re-resolves the log at every
    * planning). The catalog stores the CREATE-time schema but the LOG
    * stays the schema authority (GraftDataSource deliberately ignores
    * the stored schema at resolution), so a post-CREATE column
    * evolution needs only the stock `REFRESH TABLE layer.name` —
    * which drops the cached relation and re-resolves against the
    * current snapshot — never a re-register. A name already registered
    * against a DIFFERENT path (a re-created warehouse in the same
    * shared external catalog) is dropped and re-pointed. Returns the
    * registered `layer.name` identifiers.
    */
  def registerLakeNamespaced(spark: SparkSession, warehouseDir: String): Seq[String] = {
    for {
      (layer, names) <- Seq("silver" -> Pipeline.silverModels.keySet,
                            "gold"   -> Pipeline.goldModels.keySet)
      name <- names.toSeq.sorted
      path = Pipeline.tablePath(warehouseDir, layer, name)
      if graft.lake.LakeTable.versions(spark, path).nonEmpty
      registered <- registerNamespacedTable(spark, layer, name, path)
    } yield registered
  }

  private val SqlIdent = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Register ONE `layer.name` identifier over a log path: create the
    * database on demand, re-point a GRAFT table registered against a
    * different path (a re-created warehouse in the same shared
    * external catalog), and invalidate any cached relation. Safety:
    * a pre-existing table of ANOTHER provider under the same name is
    * never dropped (DROP on a managed table deletes its data) — the
    * registration is skipped with a warning instead. Identifiers and
    * the path are validated before being interpolated into DDL.
    */
  private def registerNamespacedTable(spark: SparkSession, layer: String,
                                      name: String, path: String): Option[String] = {
    if (!SqlIdent.matches(layer) || !SqlIdent.matches(name) || path.contains("'"))
      return None // not expressible as safe DDL — leave the view surface only
    val cat = spark.sessionState.catalog
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $layer")
    val id = org.apache.spark.sql.catalyst.TableIdentifier(name, Some(layer))
    // qualify both sides: the catalog absolutizes locations, so a
    // relative warehouseDir must not read as a perpetual mismatch.
    // Compare the FULL qualified URI (scheme included): a file:// and
    // an s3:// location with equal paths are different tables, and a
    // path-only compare would read them as matching.
    def qualified(p: String): String = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sessionState.newHadoopConf())
        .makeQualified(hp).toString
    }
    if (cat.tableExists(id)) {
      val meta = cat.getTableMetadata(id)
      val isGraft = meta.provider.exists(_.equalsIgnoreCase("graft"))
      if (!isGraft) {
        System.err.println(s"[graft] $layer.$name exists with provider " +
          s"${meta.provider.getOrElse("?")} — refusing to drop a non-graft " +
          "table; namespaced registration skipped (the <name>_tbl view still works)")
        return None
      }
      if (qualified(meta.location.toString) != qualified(path)) {
        // re-point only ever drops EXTERNAL registrations: dropping a
        // MANAGED table deletes its data, and a user's managed
        // `USING graft` CTAS under this name is not ours to destroy
        if (meta.tableType != org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL) {
          System.err.println(s"[graft] $layer.$name is a MANAGED graft table at " +
            s"${meta.location} — refusing to drop (would delete its data); " +
            "namespaced registration skipped (the <name>_tbl view still works)")
          return None
        }
        spark.sql(s"DROP TABLE $layer.$name")
      }
    }
    spark.sql(s"CREATE TABLE IF NOT EXISTS $layer.$name USING graft LOCATION '$path'")
    spark.catalog.refreshTable(s"$layer.$name")
    Some(s"$layer.$name")
  }

  /** Snapshot-consistent multi-table reads: resolve EVERY cataloged
    * lake table's latest committed version in one metadata sweep, then
    * register each as `<name>_tbl` PINNED at that version (versionAsOf
    * through [[graft.lake.LakeTable.read]]). Where [[registerLake]]'s
    * live views re-resolve the log at every query — each query in a
    * multi-statement gold build potentially seeing a different commit
    * of each input — a pin freezes the whole surface at one instant,
    * so a build that joins dims and facts across many statements reads
    * one consistent warehouse state even while writers keep
    * committing. This is the cross-table analog of the reference's
    * per-query Glue snapshot resolution (its Trino queries each pin
    * an Iceberg snapshot per table; a multi-table pin extends that to
    * the whole job — ref: trino_iceberg_transform_component.py:33).
    * The sweep is pure metadata (one `versions` listing per table, no
    * data reads), so the window between the first and last table's
    * resolution is milliseconds regardless of data size; per-table,
    * every read through the pin is exactly one immutable snapshot.
    * Returns table name -> pinned version. Re-register live views
    * with [[registerLake]] to release the pin.
    */
  def pinLake(spark: SparkSession, warehouseDir: String): Map[String, Long] = {
    val pins = for {
      (layer, names) <- Seq("silver" -> Pipeline.silverModels.keySet,
                            "gold"   -> Pipeline.goldModels.keySet)
      name <- names.toSeq.sorted
      path = Pipeline.tablePath(warehouseDir, layer, name)
      v <- graft.lake.LakeTable.versions(spark, path).lastOption
    } yield (name, path, v)
    // resolution above is the only racy step; view registration below
    // is pure session state over already-frozen versions
    pins.foreach { case (name, path, v) =>
      graft.lake.LakeTable.read(spark, path, asOf = Some(v))
        .createOrReplaceTempView(s"${name}_tbl")
    }
    pins.map { case (name, _, v) => name -> v }.toMap
  }

  // ------------------------------------------------ persistent registry
  //
  // The reference's tables live in a Glue catalog: any NEW Trino session
  // resolves `university_silver.fact_enrollments` by name with zero
  // registration code (ref: trino_iceberg_transform_component.py:37,
  // gold_analytics_component.py:36). Temp views die with the session, so
  // the warehouse itself carries `_catalog.json` — written at
  // materialization time, read at session init — making the directory
  // the single source of truth a second user needs.

  private def catalogFile(warehouseDir: String) =
    new org.apache.hadoop.fs.Path(warehouseDir, "_catalog.json")

  /** Persist the registry of lake tables that exist in `warehouseDir`.
    * Overwrite is fine here: the content is derived purely from what is
    * on disk, so the last writer's version is always correct.
    */
  def saveCatalog(spark: SparkSession, warehouseDir: String): Unit = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val entries = for {
      (layer, names) <- Seq("silver" -> Pipeline.silverModels.keySet,
                            "gold"   -> Pipeline.goldModels.keySet)
      name <- names.toSeq.sorted
      path = Pipeline.tablePath(warehouseDir, layer, name)
      snap <- graft.lake.LakeTable.latestSnapshot(spark, path)
    } yield JObject(
      "name" -> JString(name),
      "layer" -> JString(layer),
      "path" -> JString(path),
      "partitionColumns" -> JArray(snap.partitionColumns.map(JString(_)).toList))
    val p = catalogFile(warehouseDir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    // tmp + atomic-replace publish — an in-place truncate-then-write
    // would let a concurrently-initializing consumer session read a
    // half-written file and fail its restore. Last-writer-wins overwrite
    // is correct here (content derives purely from what is on disk).
    val tmp = new org.apache.hadoop.fs.Path(
      warehouseDir, s"._catalog-${java.util.UUID.randomUUID()}.tmp")
    val out = f.create(tmp, false)
    try out.write(JsonMethods.compact(JsonMethods.render(
      JObject("tables" -> JArray(entries.toList)))).getBytes("UTF-8"))
    finally out.close()
    if (f.getUri.getScheme == "file") {
      // POSIX rename(2): atomic replace
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Restore the lake-table SQL surface in THIS session from a
    * warehouse's persisted registry: each cataloged table registers as
    * a LIVE `<name>_tbl` view (query-time snapshot resolution, like
    * [[registerLake]]). Returns the registered names (empty when the
    * warehouse has no catalog). Restoration needs only the directory —
    * not the model registry — so any consumer session can do it.
    */
  def restoreLake(spark: SparkSession, warehouseDir: String): Seq[String] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val p = catalogFile(warehouseDir)
    val f = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!f.exists(p)) return Seq.empty
    val in = f.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // tolerate malformed content (pre-atomic-save writers, foreign
    // droppings): a consumer session's init must never crash on it
    val tables = scala.util.Try {
      (JsonMethods.parse(txt) \ "tables").asInstanceOf[JArray].arr
    }.getOrElse(List.empty)
    tables.flatMap { e =>
      (e \ "name", e \ "layer", e \ "path") match {
        case (JString(name), layerJ, JString(path))
            if graft.lake.LakeTable.versions(spark, path).nonEmpty =>
          graft.lake.LakeTable.readLive(spark, path).createOrReplaceTempView(s"${name}_tbl")
          // the namespaced identifier too (same surface registerLake
          // builds) — layer is present in every catalog this writer
          // produced; a foreign/legacy entry without one registers the
          // view only, and a DDL failure must not break the restore
          // contract (this function must never crash a session init)
          layerJ match {
            case JString(layer) if layer.nonEmpty =>
              try registerNamespacedTable(spark, layer, name, path)
              catch { case _: Exception => () }
            case _ => ()
          }
          Some(s"${name}_tbl")
        case _ => None
      }
    }
  }

  /** Session-init hook: when `spark.graft.warehouse` is set, restore
    * that warehouse's lake tables by name ([[GraftSession.get]] calls
    * this, so a consumer session needs only the conf).
    */
  def init(spark: SparkSession): Seq[String] =
    spark.conf.getOption("spark.graft.warehouse")
      .map(restoreLake(spark, _)).getOrElse(Seq.empty)

  /** Full SQL surface in one call. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    registerTables(spark, dir)
    registerModels(spark, dir)
  }
}

/** Session extensions: inject the custom expressions as SQL functions
  * at session build time (`GraftSession.builder` applies this), so SQL
  * users get simhash_bits / minhash_sig / dot_d / jaccard_sorted /
  * lsh_sigs without any registration call. Also guards the SQL write
  * surface: a static `PARTITION (...)` spec on an INSERT into a graft
  * table would bypass [[graft.lake.GraftRelation]]'s transactional
  * insert and write raw files past the transaction log — rejected
  * loudly; partition routing is automatic from row values.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
  import graft.functions.Sketches._

  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    // SQL DML over lake tables: rewrite the analyzer's raw-file insert
    // into the transactional GraftInsertCommand (post-hoc, so column
    // matching/casts have already been applied)
    ext.injectPostHocResolutionRule(_ => new graft.lake.GraftInsertRule)
    // SQL MERGE INTO over lake tables: the analyzer resolves the node,
    // only the V1 planner is missing — convert to the log's merge
    ext.injectPostHocResolutionRule(_ => new graft.lake.GraftMergeRule)
    // unfiltered count(*) over a lake table answered from the log's
    // row counts — no scan (see MetadataOnlyAgg)
    ext.injectOptimizerRule(_ => new graft.lake.MetadataOnlyAgg)
    // maintenance SQL the Spark grammar lacks: OPTIMIZE / VACUUM /
    // RESTORE / ALTER TABLE ... ADD|DROP CONSTRAINT (GraftSqlParser
    // delegates everything else to the session parser untouched)
    ext.injectParser((session, delegate) =>
      new graft.lake.GraftSqlParser(session, delegate))
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.Sketches", name),
        builder))
    inject("simhash_bits", es => SimHashBits(es.head))
    inject("minhash_sig", es => MinHashSig(es.head,
      evalIntArg("minhash_sig", "numHashes", es(1))))
    inject("dot_d", es => DotProductD(es.head, es(1)))
    inject("jaccard_sorted", es => JaccardSorted(es.head, es(1)))
    inject("lsh_sigs", es => LshSigs(es.head,
      evalIntArg("lsh_sigs", "tables", es(1)),
      evalIntArg("lsh_sigs", "bits", es(2)),
      evalLongArg("lsh_sigs", "seed", es(3))))
    inject("char_entropy", es => CharEntropy(es.head))
    inject("dot_i8", es => DotProductI8(es.head, es(1)))
    inject("quantize_i8", es => QuantizeI8(es.head,
      evalDoublesArg(es(1)), evalDoublesArg(es(2))))
    inject("dot_i8_deq", es => DotI8Deq(es.head, es(1),
      evalDoublesArg(es(2)), evalDoublesArg(es(3))))
    inject("deq_err_i8", es => DeqErrI8(es.head,
      evalDoublesArg(es(1)), evalDoublesArg(es(2))))
    inject("pq_encode", es => PqEncode(es.head, evalDoublesArg(es(1)),
      evalIntArg("pq_encode", "m", es(2)),
      evalIntArg("pq_encode", "k", es(3))))
    inject("pq_lut", es => PqLut(es.head, evalDoublesArg(es(1)),
      evalIntArg("pq_lut", "m", es(2)),
      evalIntArg("pq_lut", "k", es(3))))
    inject("pq_adc", es => PqAdc(es.head, es(1)))
    inject("nearest_cell", es => NearestCell(es.head, evalDoublesArg(es(1)),
      evalIntArg("nearest_cell", "k", es(2))))
  }
}
