package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, First}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, RepartitionOperation, Sort}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Constraint-based DISTINCT ELIMINATION (opt-in): a deduplication whose
  * keys include a VERIFIED primary key of the underlying scan is a
  * per-row no-op — every "group" is a single row — so the blocking
  * hash aggregate (a full shuffle of the dedup columns) is replaced by
  * a streaming projection.
  *
  * Soundness needs strictly more than [[JoinEliminationRewrite]]'s
  * uniqueness: `dropDuplicates` treats equal NULL keys as ONE group, so
  * a column that is merely duplicate-free among its non-null values
  * could still collapse several null-keyed rows. The registration this
  * rule trusts is therefore [[TableConstraints.registerKey]] — unique
  * AND null-free, the full PRIMARY KEY contract — audited in one
  * ANALYZE-style pass and fingerprint-pinned to the scan's file listing
  * like every other constraint in this catalog.
  *
  * Because user-provided rules run in the optimizer's LAST batch, the
  * `Deduplicate` node is long gone (ReplaceDeduplicateWithAggregate
  * rewrote it); this rule matches the post-replacement shape instead:
  * an Aggregate whose every output is either a grouping attribute or a
  * `first(attr)` alias over a singleton group. Both dedup spellings
  * land here — `distinct()` (all columns group) and
  * `dropDuplicates(pk)` (non-keys wrapped in first()) — and so does a
  * hand-written `groupBy(pk).agg(first(...))`, which is sound by the
  * same singleton-group argument. first()'s arbitrary-row
  * nondeterminism collapses: over one row there is nothing to choose.
  *
  * Why this matters at 100 TB: defensive `dropDuplicates` on an
  * already-unique ingest key is one of the most common wasted shuffles
  * in inherited pipelines — the full table hashes across the cluster to
  * remove nothing. Output exprIds are preserved (grouping attrs pass
  * through; first() aliases are re-issued under their original ids), so
  * parent operators never re-resolve. The child may filter, sort,
  * repartition or compute columns over the registered scan (all
  * row-preserving; uniqueness and null-freeness survive every subset) —
  * the KEY itself must trace to the scan column as a bare, possibly
  * renamed attribute; anything else (joins, unions, generators)
  * refuses. Enable with `spark.graft.distinctElim.enabled=true`.
  */
object DistinctEliminationRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.distinctElim.enabled"

  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(DistinctEliminationRewrite))
      spark.experimental.extraOptimizations = current :+ DistinctEliminationRewrite
  }

  /** Rewrite the aggregate list to its projection form, refusing on the
    * first output that is not a grouping attribute or a plain
    * `first(attr)` (no DISTINCT, no FILTER clause, no ignoreNulls — the
    * exact shape ReplaceDeduplicateWithAggregate emits).
    */
  private def projected(aggExprs: Seq[NamedExpression],
      grouping: AttributeSet): Option[Seq[NamedExpression]] = {
    val out = aggExprs.map {
      case a: AttributeReference if grouping.contains(a) => a
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case First(attr: AttributeReference, false) =>
            Alias(attr, name)(exprId = al.exprId, qualifier = al.qualifier)
          case _ => return None
        }
      case _ => return None
    }
    Some(out)
  }

  /** Does any of `keys` trace — by exprId, through row-preserving
    * operators — to a registered primary-key column of a single file
    * scan? Projects may COMPUTE other columns freely (they never add,
    * drop or duplicate rows); only the key itself must pass through as
    * a bare attribute (possibly renamed — the registration name is the
    * SCAN-side name, which the lineage walk recovers). Filters shrink
    * to a subset, Sort/Repartition only reorder — unique + null-free
    * survive all three.
    */
  private def tracesToKey(appId: String, plan: LogicalPlan, keys: Seq[Attribute]): Boolean =
    plan match {
      case lr: LogicalRelation =>
        PlanScans.filteredScanRef(lr).exists(ref =>
          keys.exists(a => TableConstraints.isKey(appId, ref, a.name)))
      case Project(pl, child) =>
        val mapped = keys.flatMap { k =>
          pl.collectFirst {
            case a: AttributeReference if a.exprId == k.exprId => a
            case al @ Alias(a: AttributeReference, _) if al.exprId == k.exprId => a
          }
        }
        mapped.nonEmpty && tracesToKey(appId, child, mapped)
      case Filter(_, child) => tracesToKey(appId, child, keys)
      case s: Sort => tracesToKey(appId, s.child, keys)
      case r: RepartitionOperation => tracesToKey(appId, r.child, keys)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val appId = SparkSession.active.sparkContext.applicationId
    plan.transformUp {
      case agg @ Aggregate(ge, ae, child, _) if !child.isStreaming =>
        val groupAttrs = ge.collect { case a: AttributeReference => a }
        if (groupAttrs.isEmpty || !tracesToKey(appId, child, groupAttrs)) agg
        else projected(ae, AttributeSet(groupAttrs))
          .map(p => Project(p, child)).getOrElse(agg)
    }
  }
}
