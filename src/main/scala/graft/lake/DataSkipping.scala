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

      // a bare boolean column is `col = true` (Catalyst does not
      // normalize it to EqualTo) — the SCD2 `is_current` probe shape,
      // where all-closed history files have max = false and skip
      case a: AttributeReference if a.dataType == BooleanType =>
        outsideEq(a, true)
      case Not(a: AttributeReference) if a.dataType == BooleanType =>
        outsideEq(a, false)

      case _ => false
    }
  }

  // -------------------------------------------------- whole-file proofs

  /** A known INCLUSIVE value interval for a column of one file, derived
    * from something other than footer stats — the hive partition value
    * (constant per file: min = max = value), or the source-column range
    * a generated-transform partition value implies
    * ([[GeneratedColumns.sourceBounds]]). Values are Catalyst-internal
    * (Long micros for TIMESTAMP, Int days for DATE, …) and NON-NULL for
    * every row of the file by construction.
    */
  final case class KnownBounds(dt: DataType, min: Any, max: Any)

  /** true iff EVERY live row of the file provably satisfies ALL the
    * conjuncts — the dual of [[skip]], and the gate for metadata-only
    * file drops (a retention `DELETE WHERE ts < cutoff` removes interior
    * files from the log without reading them).
    *
    * Soundness mirrors [[skip]], flipped: may return true ONLY when no
    * row can evaluate any conjunct to false-or-null. So every
    * comparison additionally demands `nullCount == 0` (a null row
    * evaluates to null = not deleted = must survive), float/double stay
    * excluded from range proofs (NaN), and the logged bounds being
    * OUTER approximations (truncated string bounds widen outward, per
    * [[ParquetStats]]) keeps "true range ⊆ predicate region" sound.
    * Deletion-vector rows need no care: bounds cover all physical rows,
    * a superset of the live ones.
    */
  def proveAllRows(filters: Seq[Expression], schema: StructType, resolver: Resolver,
                   entry: LakeTable.FileEntry,
                   known: Map[String, KnownBounds] = Map.empty): Boolean = {
    if (entry.rowCount == 0L) return true
    filters.nonEmpty && filters.forall(f => proveTrue(f, schema, resolver, entry, known))
  }

  private def proveTrue(e: Expression, schema: StructType, resolver: Resolver,
                        entry: LakeTable.FileEntry,
                        known: Map[String, KnownBounds]): Boolean = {
    /** candidate bounds for `a`: the known interval (null-free by
      * construction), and the footer stats — either proving suffices
      */
    def cands(a: AttributeReference): Seq[Bounds] = {
      val k = known.collectFirst { case (n, kb) if resolver(n, a.name) =>
        Bounds(kb.dt, Some(kb.min), Some(kb.max), Some(0L), entry.rowCount) }
      val s = boundsOf(schema, resolver, entry, a.name)
      (k.toSeq ++ s.toSeq).filter(b => rangeProvable(b.dt))
    }
    /** all rows non-null AND `holds(cmp(pick(bounds), lit))` */
    def allRange(a: AttributeReference, v: Any,
                 pick: Bounds => Option[Any], holds: Int => Boolean): Boolean =
      v != null && cands(a).exists { b =>
        b.nullCount.contains(0L) &&
          (for { bd <- pick(b); l <- litDomain(b.dt, v) } yield holds(cmp(bd, l)))
            .getOrElse(false)
      }
    /** all rows non-null and constant-equal to `v` */
    def allEq(a: AttributeReference, v: Any): Boolean =
      v != null && cands(a).exists { b =>
        b.nullCount.contains(0L) &&
          (for { mn <- b.min; mx <- b.max; l <- litDomain(b.dt, v) }
            yield cmp(mn, l) == 0 && cmp(mx, l) == 0).getOrElse(false)
      }
    e match {
      case And(l, r) => proveTrue(l, schema, resolver, entry, known) &&
        proveTrue(r, schema, resolver, entry, known)
      case Or(l, r) => proveTrue(l, schema, resolver, entry, known) ||
        proveTrue(r, schema, resolver, entry, known)
      case Literal(true, BooleanType) => true

      case EqualTo(a: AttributeReference, Literal(v, _)) => allEq(a, v)
      case EqualTo(Literal(v, _), a: AttributeReference) => allEq(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) => allEq(a, v)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) => allEq(a, v)

      // col < v for ALL rows: max < v (mirrored forms flip)
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        allRange(a, v, _.max, _ < 0)
      case LessThan(Literal(v, _), a: AttributeReference) =>
        allRange(a, v, _.min, _ > 0)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        allRange(a, v, _.max, _ <= 0)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        allRange(a, v, _.min, _ >= 0)
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        allRange(a, v, _.min, _ > 0)
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        allRange(a, v, _.max, _ < 0)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        allRange(a, v, _.min, _ >= 0)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        allRange(a, v, _.max, _ <= 0)

      case In(a: AttributeReference, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        // a constant column whose value is one of the list
        vs.exists { case Literal(v, _) => allEq(a, v) }

      case IsNotNull(a: AttributeReference) =>
        cands(a).exists(_.nullCount.contains(0L)) ||
          boundsOf(schema, resolver, entry, a.name).exists(_.nullCount.contains(0L))

      case _ => false
    }
  }
}
