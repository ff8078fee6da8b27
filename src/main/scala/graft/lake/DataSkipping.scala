package graft.lake

import org.apache.spark.sql.catalyst.analysis.Resolver
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** File-level data skipping over the per-file min/max bounds recorded
  * in the transaction log ([[ParquetStats]]): a pushed data filter that
  * provably matches no row of a file prunes the file from the scan
  * before any I/O — the Trino-on-Iceberg behavior the reference's users
  * get from manifest value bounds, one level above parquet's own
  * row-group skipping (which still costs a footer read per file).
  *
  * Soundness contract: [[skip]] may return true ONLY when no row of
  * the file can satisfy the filters. Everything unknown — an
  * unsupported expression shape, a column without stats (e.g. added by
  * schema evolution after the file was written), a cast around the
  * attribute, a NaN anywhere — keeps the file. SQL null semantics make
  * bounds-pruning sound for comparisons: a null row evaluates the
  * predicate to null, which a filter treats as false, so bounds over
  * the non-null values are enough.
  *
  * Float/double columns only participate in equality/null proofs, not
  * range proofs: Spark orders NaN above every value, while parquet
  * writers exclude NaN from min/max — a file whose max is 3.0 can
  * still hold NaN rows that satisfy `col > 5.0`.
  */
private[lake] object DataSkipping {

  /** true iff the pushed conjuncts prove the file matches no row. */
  def skip(filters: Seq[Expression], schema: StructType, resolver: Resolver,
           entry: LakeTable.FileEntry): Boolean = {
    if (entry.rowCount == 0L) return true
    filters.exists(f => prove(f, schema, resolver, entry))
  }

  /** Parsed stats of one column in its comparison domain. */
  private final case class Bounds(dt: DataType, min: Option[Any], max: Option[Any],
                                  nullCount: Option[Long], rowCount: Long)

  private def boundsOf(schema: StructType, resolver: Resolver,
                       entry: LakeTable.FileEntry, attr: String): Option[Bounds] =
    schema.fields.find(f => resolver(f.name, attr)).flatMap { f =>
      entry.stats.get(f.name).map { s =>
        Bounds(f.dataType, s.min.flatMap(parse(f.dataType, _)),
          s.max.flatMap(parse(f.dataType, _)), s.nullCount, entry.rowCount)
      }
    }

  private def parse(dt: DataType, s: String): Option[Any] =
    scala.util.Try[Any](dt match {
      case ByteType | ShortType | IntegerType | LongType | DateType |
           TimestampType | TimestampNTZType | BooleanType => s.toLong
      case FloatType  => s.toFloat.toDouble
      case DoubleType => s.toDouble
      case StringType => UTF8String.fromString(s)
      case other => throw new IllegalArgumentException(other.toString)
    }).toOption

  /** Literal value → the same comparison domain; None = not comparable
    * (NaN, type surprise) → never prove anything with it.
    */
  private def litDomain(dt: DataType, v: Any): Option[Any] = (dt, v) match {
    case (_, null) => None
    case (ByteType | ShortType | IntegerType | LongType, n: Number) => Some(n.longValue)
    case (DateType, n: Number) => Some(n.longValue)
    case (TimestampType | TimestampNTZType, n: Number) => Some(n.longValue)
    case (BooleanType, b: Boolean) => Some(if (b) 1L else 0L)
    case (FloatType, f: Float) => if (f.isNaN) None else Some(f.toDouble)
    case (DoubleType, d: Double) => if (d.isNaN) None else Some(d.toDouble)
    case (StringType, u: UTF8String) => Some(u)
    case _ => None
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    // primitive semantics: -0.0 == 0.0, NaN never reaches here
    case (x: Double, y: Double) => if (x < y) -1 else if (x > y) 1 else 0
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) // unsigned byte order, same as parquet
    case _ => throw new IllegalStateException(s"incomparable $a / $b")
  }

  private def rangeProvable(dt: DataType): Boolean = dt match {
    case FloatType | DoubleType => false // NaN sorts above max but is absent from stats
    case _ => true
  }

  /** true iff `e` is provably false-or-null for every row of the file. */
  private def prove(e: Expression, schema: StructType, resolver: Resolver,
                    entry: LakeTable.FileEntry): Boolean = {
    def bounds(a: AttributeReference) = boundsOf(schema, resolver, entry, a.name)

    /** no value in [min,max] equals `v` (null rows never equal anything) */
    def outsideEq(a: AttributeReference, v: Any): Boolean =
      bounds(a).exists { b =>
        (for { mn <- b.min; mx <- b.max; l <- litDomain(b.dt, v) }
          yield cmp(l, mn) < 0 || cmp(l, mx) > 0).getOrElse(false) ||
        // a column that is entirely null can equal nothing
        (b.rowCount >= 0 && b.nullCount.contains(b.rowCount))
      }

    /** range proof: `holds(cmp(bound, lit))` over min or max */
    def proveRange(a: AttributeReference, v: Any,
                   pick: Bounds => Option[Any], holds: Int => Boolean): Boolean =
      bounds(a).exists { b =>
        rangeProvable(b.dt) && {
          (for { bd <- pick(b); l <- litDomain(b.dt, v) } yield holds(cmp(bd, l)))
            .getOrElse(false) ||
          (b.rowCount >= 0 && b.nullCount.contains(b.rowCount))
        }
      }

    e match {
      case And(l, r) => prove(l, schema, resolver, entry) || prove(r, schema, resolver, entry)
      case Or(l, r) => prove(l, schema, resolver, entry) && prove(r, schema, resolver, entry)

      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        if (v == null) true else outsideEq(a, v)
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        if (v == null) true else outsideEq(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) =>
        if (v == null) bounds(a).exists(_.nullCount.contains(0L)) else outsideEq(a, v)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) =>
        if (v == null) bounds(a).exists(_.nullCount.contains(0L)) else outsideEq(a, v)

      // col < v: empty iff min >= v (mirrored literal-first forms flip)
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        v == null || proveRange(a, v, _.min, _ >= 0)
      case LessThan(Literal(v, _), a: AttributeReference) =>
        v == null || proveRange(a, v, _.max, _ <= 0)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        v == null || proveRange(a, v, _.min, _ > 0)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        v == null || proveRange(a, v, _.max, _ < 0)
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        v == null || proveRange(a, v, _.max, _ <= 0)
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        v == null || proveRange(a, v, _.min, _ >= 0)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        v == null || proveRange(a, v, _.max, _ < 0)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        v == null || proveRange(a, v, _.min, _ > 0)

      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        vs.nonEmpty && vs.forall { case Literal(v, _) => v == null || outsideEq(a, v) }
      case InSet(a: AttributeReference, vs) =>
        vs.nonEmpty && vs.forall(v => v == null || outsideEq(a, v))

      case IsNull(a: AttributeReference) =>
        bounds(a).exists(_.nullCount.contains(0L))
      case IsNotNull(a: AttributeReference) =>
        bounds(a).exists(b => b.rowCount >= 0 && b.nullCount.contains(b.rowCount))

      case _ => false
    }
  }
}
