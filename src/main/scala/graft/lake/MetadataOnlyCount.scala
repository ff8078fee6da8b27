package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** `SELECT count(*) FROM <graft table>` answered from the transaction
  * log alone: every snapshot file entry carries its exact footer row
  * count, so an unfiltered global count is a sum over the log — no
  * scan, no tasks, O(1) in data size. At 100 TB the difference is a
  * sub-millisecond metadata lookup vs a full-table file-open storm
  * (even parquet's footer-only count path opens every file). Delta
  * ships the same optimization for the same reason; the reference gets
  * it from Iceberg manifests via Trino.
  *
  * Fires only when provably exact:
  *  - global aggregation (no GROUP BY), every aggregate a plain
  *    `count(1)`/`count(*)` — no DISTINCT, no FILTER clause, no other
  *    aggregates;
  *  - directly over the relation (any Filter in between bails; a
  *    Project cannot change row count and is looked through);
  *  - every file entry in the snapshot has a logged row count (a
  *    legacy pre-stats entry bails to the scan).
  *
  * The snapshot is re-resolved at rule time, consistent with the
  * live-view semantics of [[GraftFileIndex]]; `versionAsOf` relations
  * count their pinned version.
  */
class MetadataOnlyCount extends Rule[LogicalPlan] {

  private def plainCount(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(v, _))), Complete, false, None, _) => v != null
    case _ => false
  }

  private def graftSnapshot(plan: LogicalPlan): Option[LakeTable.Snapshot] = plan match {
    case LogicalRelation(rel: GraftRelation, _, _, false, _) =>
      // checked: an evolved/re-partitioned table fails as loudly here
      // as the scan this answer replaces would
      Some(rel.index.snapshotChecked())
    case Project(_, child) => graftSnapshot(child) // row-count-preserving
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall {
          case Alias(ae: AggregateExpression, _) => plainCount(ae)
          case ae: AggregateExpression           => plainCount(ae)
          case _                                 => false
        } =>
      graftSnapshot(child) match {
        case Some(snap) if snap.files.forall(_.rowCount >= 0) =>
          val total = snap.files.map(_.rowCount).sum
          LocalRelation(agg.output.map(_.toAttribute),
            Seq(InternalRow.fromSeq(aggExprs.map(_ => total))))
        case _ => agg
      }
  }
}
