package graft.lake

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** `SELECT count(*) FROM <graft table>` answered from the transaction
  * log alone: every snapshot file entry carries its exact footer row
  * count, so a global count is a sum over the log — no scan, no tasks,
  * O(1) in data size. At 100 TB the difference is a sub-millisecond
  * metadata lookup vs a full-table file-open storm (even parquet's
  * footer-only count path opens every file). Delta ships the same
  * optimization for the same reason; the reference gets it from
  * Iceberg manifests via Trino.
  *
  * A count whose ONLY filters reference partition columns is still a
  * log sum: partition values parse from each entry's hive path, the
  * filter evaluates driver-side per partition directory, and admitted
  * entries' row counts sum — `count(*) WHERE event_date = X` on a 100
  * TB fact is a metadata lookup, not a scan of X's partition.
  *
  * Fires only when provably exact:
  *  - global aggregation (no GROUP BY), every aggregate a plain
  *    `count(1)`/`count(*)` — no DISTINCT, no FILTER clause, no other
  *    aggregates;
  *  - over the relation through row-count-preserving steps only:
  *    attribute-only Projects, and Filters whose predicate is
  *    deterministic, subquery-free, and references only partition
  *    columns (anything else bails to the scan);
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

  /** The graft relation (plain or merge-on-read) under attribute-only
    * Projects and Filters, with the filter conditions collected on the
    * way down. A Project that computes or renames anything bails: a
    * collected condition could then reference an alias this rule would
    * mis-bind.
    */
  private def graftScan(plan: LogicalPlan): Option[(Either[GraftRelation, GraftMorRelation], Seq[Expression])] =
    plan match {
      case LogicalRelation(rel: GraftRelation, _, _, false, _)    => Some((Left(rel), Nil))
      case LogicalRelation(rel: GraftMorRelation, _, _, false, _) => Some((Right(rel), Nil))
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        graftScan(child)
      case Filter(cond, child) =>
        graftScan(child).map { case (rel, cs) => (rel, cond +: cs) }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg @ Aggregate(Nil, aggExprs, child, _)
        if aggExprs.nonEmpty && aggExprs.forall {
          case Alias(ae: AggregateExpression, _) => plainCount(ae)
          case ae: AggregateExpression           => plainCount(ae)
          case _                                 => false
        } =>
      graftScan(child) match {
        case Some((relE, conds)) =>
          // checked: an evolved/re-partitioned table fails as loudly
          // here as the scan this answer replaces would
          val (snap, pSchema) = relE match {
            case Left(rel)  => (rel.index.snapshotChecked(), rel.index.partitionSchema)
            case Right(rel) => (rel.snapshotChecked(), rel.partitionSchema)
          }
          // a deletion vector's cardinality subtracts from the logged
          // count — the metadata answer stays exact under merge-on-read
          lazy val countable = snap.files.forall(e =>
            e.rowCount >= 0 && e.dv.forall(_.cardinality >= 0))
          if (conds.isEmpty && countable) {
            val total = snap.files.map(_.liveRowCount).sum
            LocalRelation(agg.output.map(_.toAttribute),
              Seq(InternalRow.fromSeq(aggExprs.map(_ => total))))
          } else if (countable &&
              PartitionPaths.evaluableOnPartitions(conds, pSchema, conf.resolver)) {
            val pred = PartitionPaths.bind(conds, pSchema, conf.resolver)
            val tz = Option(conf.sessionLocalTimeZone)
            // evaluate once per distinct partition DIRECTORY, not per file
            val byDir = snap.files.groupBy(e => {
              val i = e.path.lastIndexOf('/')
              if (i < 0) "" else e.path.substring(0, i)
            })
            val total = byDir.iterator.map { case (_, files) =>
              val row = PartitionPaths.valuesOf(files.head.path, pSchema, tz)
              if (pred.eval(row)) files.map(_.liveRowCount).sum else 0L
            }.sum
            LocalRelation(agg.output.map(_.toAttribute),
              Seq(InternalRow.fromSeq(aggExprs.map(_ => total))))
          } else agg
        case _ => agg
      }
  }
}
