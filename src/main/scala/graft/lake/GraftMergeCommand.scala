package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeIntoTable, Project, SubqueryAlias, UpdateAction, UpdateTable, View}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.col

/** SQL `MERGE INTO` on a graft table, routed through the transaction
  * log's copy-on-write merge — the last missing piece of SQL write
  * parity (the reference's entire compute surface is SQL; its
  * deployments upsert via Iceberg MERGE).
  *
  * Spark's analyzer fully resolves `MergeIntoTable` over a V1 relation
  * (star actions expand to per-column assignments, attributes bind,
  * CheckAnalysis passes) — only the PLANNER has no V1 strategy.
  * [[GraftMergeRule]] converts the resolved node into this command for
  * the upsert shapes [[LakeTable.merge]] expresses:
  *
  *  - `ON` a conjunction of target-column = source-expression
  *    equalities (the merge keys);
  *  - `WHEN MATCHED THEN UPDATE SET ...` and/or
  *    `WHEN NOT MATCHED THEN INSERT ...`, unconditional, at most one
  *    of each, assigning the SAME source expressions (MERGE applies
  *    one row image per source row — differing UPDATE/INSERT images
  *    would need a per-row matched bit the upsert primitive does not
  *    carry);
  *  - every ON key's source side must be what the action assigns to
  *    that key column (otherwise the join the upsert performs would
  *    not be the join the query asked for).
  *
  * Anything else — DELETE actions, per-action conditions,
  * NOT MATCHED BY SOURCE — fails loudly with the reason rather than
  * planning wrong semantics. Update-only merges restrict the source to
  * rows whose key already exists (left-semi against the current
  * snapshot); insert-only merges to rows whose key does not
  * (left-anti); both-action merges are the plain upsert.
  */
final case class GraftMergeCommand(tablePath: String, updates: LogicalPlan,
                                   keys: Seq[String],
                                   updateOnly: Boolean, insertOnly: Boolean)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(updates)

  override def run(spark: SparkSession): Seq[Row] = {
    val data = org.apache.spark.sql.graft.SqlShims.ofRows(spark, updates)
    if (insertOnly) {
      // rows whose key is not present yet; the upsert would also
      // REPLACE matched rows, which an insert-only merge must not
      val current = LakeTable.read(spark, tablePath).select(keys.map(col): _*)
      LakeTable.append(spark, tablePath, data.join(current, keys, "left_anti"))
    } else if (updateOnly) {
      val current = LakeTable.read(spark, tablePath).select(keys.map(col): _*)
      LakeTable.merge(spark, tablePath,
        data.join(current, keys, "left_semi"), keys)
    } else {
      LakeTable.merge(spark, tablePath, data, keys)
    }
    Seq.empty
  }
}

/** SQL `DELETE FROM <graft table> WHERE ...`, planned onto
  * [[LakeTable.delete]] (file-granularity copy-on-write). The resolved
  * predicate's attribute references are re-bound BY NAME against the
  * fresh read the delete performs — the exprIds of the command's view
  * resolution do not exist in that plan.
  */
final case class GraftDeleteCommand(tablePath: String, condition: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val byName = condition.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
    LakeTable.delete(spark, tablePath,
      org.apache.spark.sql.graft.SqlShims.columnOf(byName))
    Seq.empty
  }
}

/** SQL `UPDATE <graft table> SET ... [WHERE ...]`, planned onto
  * [[LakeTable.update]] (file-granularity copy-on-write). Like
  * [[GraftDeleteCommand]], resolved references re-bind by name.
  */
final case class GraftUpdateCommand(tablePath: String,
                                    set: Seq[(String, Expression)],
                                    condition: Expression)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    def byName(e: Expression): Expression = e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    }
    import org.apache.spark.sql.graft.SqlShims.columnOf
    LakeTable.update(spark, tablePath,
      set.map { case (n, v) => n -> columnOf(byName(v)) },
      columnOf(byName(condition)))
    Seq.empty
  }
}

final class GraftMergeRule extends Rule[LogicalPlan] {

  /** The graft file index behind a (possibly aliased/viewed) relation. */
  private def graftIndex(plan: LogicalPlan): Option[GraftFileIndex] = plan match {
    case LogicalRelation(rel: GraftRelation, _, _, _, _) => Some(rel.index)
    case SubqueryAlias(_, child) => graftIndex(child)
    case View(_, _, child, _) => graftIndex(child)
    case _ => None
  }

  private def unsupported(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"MERGE INTO a graft table: $what. Supported shape: ON a conjunction of " +
        "target-column = source-expression equalities, with an unconditional " +
        "WHEN MATCHED THEN UPDATE SET ... and/or WHEN NOT MATCHED THEN INSERT ... " +
        "assigning the same source expressions; use the LakeTable API for richer shapes")

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(target, condition)
        if d.resolved && graftIndex(target).isDefined =>
      val idx = graftIndex(target).get
      if (idx.asOf.isDefined)
        throw new IllegalArgumentException(
          s"cannot DELETE from a time-travel graft relation of ${idx.tablePath}")
      GraftDeleteCommand(idx.tablePath, condition)

    case u @ UpdateTable(target, assignments, condition)
        if u.resolved && graftIndex(target).isDefined =>
      val idx = graftIndex(target).get
      if (idx.asOf.isDefined)
        throw new IllegalArgumentException(
          s"cannot UPDATE a time-travel graft relation of ${idx.tablePath}")
      val set = assignments.map {
        case Assignment(k: Attribute, v) => k.name -> v
        case Assignment(k, _) => throw new UnsupportedOperationException(
          s"UPDATE on a graft table: assignment target $k is not a column")
      }
      GraftUpdateCommand(idx.tablePath, set,
        condition.getOrElse(org.apache.spark.sql.catalyst.expressions.Literal.TrueLiteral))

    case m: MergeIntoTable if m.resolved && graftIndex(m.targetTable).isDefined =>
      val idx = graftIndex(m.targetTable).get
      if (idx.asOf.isDefined)
        throw new IllegalArgumentException(
          s"cannot MERGE into a time-travel graft relation of ${idx.tablePath}")
      if (m.notMatchedBySourceActions.nonEmpty)
        unsupported("WHEN NOT MATCHED BY SOURCE is not supported")
      if (m.withSchemaEvolution) {
        // WITH SCHEMA EVOLUTION is the default behavior of the log's
        // merge (new columns merge into the snapshot schema) — accept
      }
      val targetAttrs = m.targetTable.outputSet

      val updateAssignments = m.matchedActions match {
        case Seq() => None
        case Seq(UpdateAction(None, assignments, _)) => Some(assignments)
        case Seq(UpdateAction(Some(_), _, _)) =>
          unsupported("a condition on WHEN MATCHED is not supported")
        case Seq(_: DeleteAction) | Seq(DeleteAction(_)) =>
          unsupported("WHEN MATCHED THEN DELETE is not supported")
        case _ => unsupported("at most one unconditional WHEN MATCHED action is supported")
      }
      val insertAssignments = m.notMatchedActions match {
        case Seq() => None
        case Seq(InsertAction(None, assignments)) => Some(assignments)
        case Seq(InsertAction(Some(_), _)) =>
          unsupported("a condition on WHEN NOT MATCHED is not supported")
        case _ => unsupported("at most one unconditional WHEN NOT MATCHED action is supported")
      }
      if (updateAssignments.isEmpty && insertAssignments.isEmpty)
        unsupported("no UPDATE or INSERT action given")

      def toMap(as: Seq[Assignment]): Map[String, Expression] = as.map {
        case Assignment(k: Attribute, v) => k.name -> v
        case Assignment(k, _) => unsupported(s"assignment target $k is not a column")
      }.toMap
      val updateMap = updateAssignments.map(toMap)
      val insertMap = insertAssignments.map(toMap)
      (updateMap, insertMap) match {
        case (Some(u), Some(i)) =>
          val same = u.keySet == i.keySet &&
            u.forall { case (k, v) => i(k).semanticEquals(v) }
          if (!same) unsupported(
            "UPDATE and INSERT must assign the same source expressions (one row " +
              "image per source row)")
        case _ => ()
      }
      val image: Map[String, Expression] = updateMap.orElse(insertMap).get

      // ON condition -> merge keys; each key's source side must be the
      // row image's value for that column
      val keys = conjuncts(m.mergeCondition).map {
        case EqualTo(t: AttributeReference, s) if targetAttrs.contains(t) &&
            s.references.subsetOf(m.sourceTable.outputSet) =>
          image.get(t.name) match {
            case Some(v) if v.semanticEquals(s) => t.name
            case Some(_) => unsupported(s"ON key ${t.name} must be assigned its own " +
              "join value (the upsert joins on the assigned column)")
            case None => unsupported(s"ON key ${t.name} is not assigned by the action")
          }
        case EqualTo(s, t: AttributeReference) if targetAttrs.contains(t) &&
            s.references.subsetOf(m.sourceTable.outputSet) =>
          image.get(t.name) match {
            case Some(v) if v.semanticEquals(s) => t.name
            case Some(_) => unsupported(s"ON key ${t.name} must be assigned its own " +
              "join value (the upsert joins on the assigned column)")
            case None => unsupported(s"ON key ${t.name} is not assigned by the action")
          }
        case other => unsupported(s"ON condition term '${other.sql}' is not a " +
          "target-column = source-expression equality")
      }

      // one row image per source row, with target column names; columns
      // the action does not assign write null (merge semantics)
      val targetOrder = m.targetTable.output.map(_.name).filter(image.contains)
      val projection = targetOrder.map(n => Alias(image(n), n)())
      val updates = Project(projection, m.sourceTable)

      GraftMergeCommand(idx.tablePath, updates, keys,
        updateOnly = insertAssignments.isEmpty, insertOnly = updateAssignments.isEmpty)
    case _ => plan
  }
}
