package graft.lake

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Per-file statistics (row count, per-column min/max/null-count) read
  * from parquet footers at COMMIT time and recorded in the transaction
  * log, so readers never have to touch the files to plan a scan.
  *
  * This is the manifest-metadata role Iceberg plays for the reference:
  * every Iceberg data file carries value bounds + counts in its
  * manifest entry, which is what lets Trino prune files without
  * listing or opening them (ref:
  * trino_iceberg_transform_component.py:116-123 — the Iceberg table
  * behind every transform). Collection cost is one footer read per
  * NEWLY WRITTEN file per commit — the files were just written by this
  * writer, so the footer is page-cache-warm; carried-over files keep
  * their already-logged stats untouched.
  *
  * Soundness notes (a wrong bound silently drops rows at skip time, so
  * every case errs toward "no stats" = "never skipped"):
  *  - Only top-level atomic columns with Spark's fixed parquet physical
  *    mapping are collected (int/long/string/date/bool/float/double and
  *    INT64 timestamps); nested fields, decimals, binaries and INT96
  *    timestamps get no stats.
  *  - Min/max aggregation across row groups uses the footer's own
  *    [[org.apache.parquet.column.statistics.Statistics#comparator]] —
  *    for strings that is unsigned lexicographic byte order, the same
  *    total order `UTF8String` uses, NOT java.lang.String order (the
  *    two disagree above the BMP).
  *  - A row group with empty/absent statistics invalidates the column
  *    for the whole file; an all-null row group contributes only to the
  *    null count.
  *  - Float/double NaN invalidates the column (parquet min/max ordering
  *    around NaN is writer-dependent).
  *  - Truncated binary bounds (writers may shorten them) are still
  *    sound: a truncated min is a prefix (≤ true min), a truncated max
  *    is incremented past the true max.
  */
private[lake] object ParquetStats {

  /** Cap on the number of statted columns per table, Delta-style: a
    * 1000-column table must not turn every snapshot into a stats dump.
    * The first `maxStatsColumns` eligible fields (schema order) win.
    */
  private val maxStatsColumns = 32

  /** Schema fields eligible for stats, in schema order, capped. */
  def eligibleFields(schema: StructType): Seq[StructField] =
    schema.fields.toSeq.filter(f => eligible(f.dataType)).take(maxStatsColumns)

  private def eligible(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | BooleanType |
         FloatType | DoubleType | StringType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Read one file's footer and aggregate (rowCount, per-column stats)
    * across its row groups. Any I/O or shape surprise degrades to
    * "no stats" — never fails the commit.
    */
  def collect(conf: Configuration, file: Path, schema: StructType):
      (Long, Map[String, LakeTable.ColStats]) = {
    val fields = eligibleFields(schema)
    try {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val rowCount = blocks.map(_.getRowCount).sum

        val out = fields.flatMap { field =>
          var min: AnyRef = null
          var max: AnyRef = null
          var cmp: java.util.Comparator[AnyRef] = null
          var nulls = 0L
          var rangeValid = true
          var nullsValid = true
          blocks.foreach { block =>
            block.getColumns.asScala.find(_.getPath.toDotString == field.name) match {
              case None => rangeValid = false; nullsValid = false
              case Some(ccm) =>
                val st = ccm.getStatistics
                if (st == null || st.isEmpty) { rangeValid = false; nullsValid = false }
                else {
                  if (st.isNumNullsSet) nulls += st.getNumNulls else nullsValid = false
                  if (st.hasNonNullValue) {
                    val c = st.comparator().asInstanceOf[java.util.Comparator[AnyRef]]
                    val bMin = st.genericGetMin.asInstanceOf[AnyRef]
                    val bMax = st.genericGetMax.asInstanceOf[AnyRef]
                    if (min == null || c.compare(bMin, min) < 0) min = bMin
                    if (max == null || c.compare(bMax, max) > 0) max = bMax
                    cmp = c
                  }
                }
            }
          }
          val prim = blocks.headOption.flatMap(
            _.getColumns.asScala.find(_.getPath.toDotString == field.name))
            .map(_.getPrimitiveType)
          val mn = if (rangeValid && min != null) prim.flatMap(p => render(field.dataType, p, min)) else None
          val mx = if (rangeValid && max != null) prim.flatMap(p => render(field.dataType, p, max)) else None
          val nc = if (nullsValid) Some(nulls) else None
          // min and max are only trustworthy together (a one-sided bound
          // can't come out of this aggregation anyway, but render may
          // reject one side, e.g. NaN)
          val (mnF, mxF) = if (mn.isDefined && mx.isDefined) (mn, mx) else (None, None)
          if (mnF.isEmpty && nc.isEmpty) None
          else Some(field.name -> LakeTable.ColStats(mnF, mxF, nc))
        }.toMap
        (rowCount, out)
      } finally reader.close()
    } catch {
      case _: java.io.IOException | _: RuntimeException => (-1L, Map.empty)
    }
  }

  /** Canonical string form of a footer stat value for the log, in the
    * domain [[DataSkipping]] parses back: integrals/date as decimal
    * Long, timestamps as epoch MICROS, boolean as 0/1, float/double via
    * their exact-round-trip toString, strings as UTF-8 text. None =
    * value not representable (type surprise, NaN) → no stats.
    */
  private def render(dt: DataType, prim: org.apache.parquet.schema.PrimitiveType,
                     v: AnyRef): Option[String] = dt match {
    case ByteType | ShortType | IntegerType | LongType => v match {
      case n: java.lang.Number => Some(n.longValue.toString)
      case _ => None
    }
    case DateType => v match {
      case n: java.lang.Integer => Some(n.toString)
      case _ => None
    }
    case BooleanType => v match {
      case b: java.lang.Boolean => Some(if (b) "1" else "0")
      case _ => None
    }
    case FloatType => v match {
      case f: java.lang.Float if !f.isNaN => Some(f.toString)
      case _ => None
    }
    case DoubleType => v match {
      case d: java.lang.Double if !d.isNaN => Some(d.toString)
      case _ => None
    }
    case StringType => v match {
      case b: Binary => Some(b.toStringUsingUTF8)
      case _ => None
    }
    case TimestampType | TimestampNTZType =>
      (v, prim.getLogicalTypeAnnotation) match {
        case (n: java.lang.Long, ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
          ts.getUnit match {
            case LogicalTypeAnnotation.TimeUnit.MICROS => Some(n.toString)
            case LogicalTypeAnnotation.TimeUnit.MILLIS =>
              Some((n * 1000L).toString) // millis→micros; cannot overflow for real dates
            case _ => None // NANOS and INT96 — Spark doesn't write these here
          }
        case _ => None
      }
    case _ => None
  }
}
