package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** THE scan-path extraction for the constraint/MV rule family — one
  * implementation with one contract, because each caller's soundness
  * argument leans on exactly what these walks admit (five divergent
  * copies is how the multi-path hole slipped in; r13 review).
  *
  * SINGLE-ROOT is load-bearing everywhere: a scan reading several
  * paths (`spark.read.parquet(a, b)`) is a bag UNION — uniqueness
  * verified on one path says nothing about the union (a key present in
  * both paths duplicates), and an MV of one path is missing the other
  * path's rows. Every extractor returns None for multi-root scans.
  */
object PlanScans {

  private def rootOf(lr: LogicalRelation): Option[String] = lr.relation match {
    case h: HadoopFsRelation if h.location.rootPaths.length == 1 =>
      Some(h.location.rootPaths.head.toString)
    case _ => None // multi-path or non-file relation: refuse
  }

  private def attrsOnly(projList: Seq[NamedExpression]): Boolean =
    projList.forall(_.isInstanceOf[AttributeReference])

  /** Bare scan under attribute-only Projects. The strictest walk: any
    * Filter/Join/Limit/Sample/aggregate refuses. What "a scan of the
    * registered table" means on the MV rule's QUERY side.
    */
  def bareScanPath(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => rootOf(lr)
    case Project(pl, child) if attrsOnly(pl) => bareScanPath(child)
    case _ => None
  }

  /** Bare scan, additionally looking through Filters. Sound ONLY where
    * the caller's algebra tolerates an arbitrary right-side predicate:
    * join elimination (a filtered match set null-extends rows the
    * parent never reads; uniqueness survives subsetting) and eager
    * aggregation (an inner join's right filter only selects which
    * groups survive). The optimizer itself plants isnotnull(key) here.
    */
  def filteredScanPath(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => rootOf(lr)
    case Project(pl, child) if attrsOnly(pl) => filteredScanPath(child)
    case Filter(_, child) => filteredScanPath(child)
    case _ => None
  }

  /** Row-preserving chain to a scan: Projects with arbitrary
    * DETERMINISTIC expressions are admitted (they never add, drop or
    * duplicate rows), Filters and everything else refuse. What an
    * AUDIT must see: `TableConstraints.registerUnique` verifying a key
    * on this plan really verified it on every row of the scan, and an
    * MV definition aggregating this plan really summarized the whole
    * table (a Filter here was the r13-review hole: a subset-verified
    * "constraint" licensing rewrites on the full table).
    */
  def rowPreservingScanPath(plan: LogicalPlan): Option[String] = plan match {
    case lr: LogicalRelation => rootOf(lr)
    case Project(pl, child) if pl.forall(_.deterministic) => rowPreservingScanPath(child)
    case _ => None
  }
}
