package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Column mapping ("name" mode): a stable PHYSICAL name per top-level
  * column, carried in the field metadata of the logical schema the
  * transaction log records. Data files and their logged stats always
  * use physical names; readers translate logical → physical at scan
  * time. The indirection is what makes `RENAME COLUMN` (logical name
  * changes, physical stays — zero data touched) and `DROP COLUMN`
  * (field leaves the schema; the bytes in old files are simply never
  * requested again) metadata-only operations, and what makes re-adding
  * a dropped name SAFE: the new field gets a fresh `col-<uuid>`
  * physical name, so the old bytes can never resurrect as its values.
  * This is Delta Lake's column-mapping name mode (its `id` mode needs
  * parquet field-id support); Iceberg gets the same property from its
  * integer field IDs. The reference's Iceberg tables therefore rename/
  * drop columns as metadata ops (ref:
  * trino_iceberg_transform_component.py:116-123 — Trino `ALTER TABLE`
  * on Iceberg); this is the analog.
  *
  * A field WITHOUT the metadata key has physical name == logical name
  * — the universal invariant for tables that never used the feature,
  * which is why every translation below is the identity for them.
  * Mapping covers top-level columns only (the DDL surface operates on
  * top-level columns; struct-internal renames are not offered).
  * Tables carrying the metadata are stamped `Protocol(2, 2)`: a
  * pre-mapping reader would match logical names against physical files
  * and read every renamed column as null — the exact silent misread
  * the protocol gate exists to prevent.
  */
private[lake] object ColumnMapping {

  val PhysicalNameKey = "graft.columnMapping.physicalName"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalNameKey)) f.metadata.getString(PhysicalNameKey)
    else f.name

  /** Does any field carry an explicit physical name? (Enabling the
    * feature stamps every field, so this is "is the table mapped".)
    */
  def isMapped(schema: StructType): Boolean =
    schema.fields.exists(_.metadata.contains(PhysicalNameKey))

  /** logical name -> physical name for every top-level field. */
  def mapping(schema: StructType): Map[String, String] =
    schema.fields.iterator.map(f => f.name -> physicalName(f)).toMap

  /** Any field whose physical name differs from its logical one? The
    * cheap "is any translation actually needed" gate: a just-enabled
    * table (physical == logical everywhere) keeps the plain read/write
    * paths and their plan-cache equality.
    */
  def needsTranslation(schema: StructType): Boolean =
    schema.fields.exists(f => physicalName(f) != f.name)

  /** The schema as the data files see it: fields renamed to their
    * physical names (metadata kept — readers ignore it; nothing
    * downstream keys on it).
    */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physicalName(f))))

  def withPhysical(f: StructField, physical: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalNameKey, physical).build())

  /** Fresh never-before-used physical name (Delta's convention). */
  def freshPhysicalName(): String = "col-" + java.util.UUID.randomUUID()

  private def strip(m: Metadata): Metadata =
    new MetadataBuilder().withMetadata(m).remove(PhysicalNameKey).build()

  /** Remove mapping metadata from a user-supplied frame. Write APIs
    * sanitize their input so a frame that was READ from a mapped table
    * (its schema carries the metadata) cannot smuggle that table's
    * physical names into another table's log — the authoritative
    * mapping of a write is always the TARGET's snapshot, never the
    * provenance of the rows.
    */
  def sanitize(df: DataFrame): DataFrame = {
    if (!df.schema.fields.exists(_.metadata.contains(PhysicalNameKey))) df
    else df.select(df.schema.fields.map(f =>
      df(f.name).as(f.name, strip(f.metadata))).toIndexedSeq: _*)
  }

  def sanitizeSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(metadata = strip(f.metadata))))

  /** Rename a logical frame's columns to their physical names before a
    * file write. `mapping` is logical → physical; columns it does not
    * cover keep their names.
    */
  def renameToPhysical(df: DataFrame, mapping: Map[String, String]): DataFrame = {
    if (mapping.forall { case (l, p) => l == p }) df
    else df.select(df.columns.map(c => col(c).as(mapping.getOrElse(c, c))).toIndexedSeq: _*)
  }

  /** Translate a catalyst expression's attribute references from
    * logical to physical names (used to match pushed data filters
    * against physically-keyed file stats).
    */
  def physicalizeExpr(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      mapping: Map[String, String])
      : org.apache.spark.sql.catalyst.expressions.Expression =
    e.transform {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference
          if mapping.contains(a.name) && mapping(a.name) != a.name =>
        a.withName(mapping(a.name))
    }
}
