package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view roll-up rewrite (OPT-IN): an `Aggregate` over a
  * registered base table re-plans as a (re-)aggregation of its
  * pre-aggregated summary table when the query is derivable from it —
  * grouping columns a subset of the MV's, every aggregate one of the
  * MV's measures, any filter touching only MV grouping columns.
  *
  * Why this matters at 100 TB: the classic warehouse pattern is ONE
  * nightly pass that folds the fact table to a few-thousand-row summary,
  * after which every dashboard/report aggregate reads the summary — a
  * 10^6× scan reduction the OPTIMIZER applies, so users keep writing
  * queries against the base table and old notebooks speed up without
  * edits. This is the query-rewrite half of the project's MV posture
  * ([[graft.SharedFrames]] is the build-once half; `cmp1`'s
  * VersionedTable is where a production MV would live so refreshes
  * publish atomically).
  *
  * Derivability rules (v1, exactness-preserving only):
  *   - `SUM(e)` over an integral/decimal-typed `e` → `SUM(mv.sum_e)`
  *     (associative and exact; DOUBLE sums are refused — re-aggregation
  *     reorders accumulation, and this library's differential gate
  *     promises bit-stable results);
  *   - `MIN(e)`/`MAX(e)` → `MIN(mv.min_e)`/`MAX(mv.max_e)`;
  *   - `COUNT(*)` → `COALESCE(SUM(mv.cnt), 0)` (the coalesce restores
  *     COUNT's non-null contract; a grouped MV row always has cnt ≥ 1,
  *     the coalesce only fires for a global aggregate over zero rows);
  *   - `COUNT(DISTINCT …)` and FILTER clauses: never derivable from a
  *     grouped summary — left untouched.
  *
  * Measure matching is STRUCTURAL, keyed on the normalized SQL text of
  * the aggregate function as it appears in the OPTIMIZED plan
  * (`AggregateFunction.sql` prints attribute names, not exprIds, so two
  * plans over different scan instances of the same table compare equal).
  * Registration extracts those strings from the MV definition frame's
  * own optimized plan, so definition and query pass through the same
  * analyzer/optimizer normalizations — the same trick Calcite-style MV
  * matching uses, minus algebraic equivalence search (a sum spelled
  * differently than the MV's definition simply doesn't match; the gate
  * entry and spec pin the contract).
  *
  * Scope guards: the child must be a bare scan of the registered base
  * path — attribute-only Projects are looked through, ONE Filter is
  * allowed iff its references are all MV grouping columns (it transplants
  * onto the MV, where partition/min-max pruning applies), anything else
  * (joins, windows, non-trivial projections) disqualifies. Output
  * exprIds are preserved by re-aliasing, so parent operators never see
  * the substitution. Catalog entries are keyed by applicationId — no
  * cross-session leakage; enable with `spark.graft.mv.enabled=true`.
  */
object MaterializedViewRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.mv.enabled"

  /** One derivable measure: the MV column holding the partial, the
    * normalized SQL of the base-table aggregate it folds, and how to
    * re-aggregate the partial (`sum` also serves COUNT(*), flagged so
    * the rewrite restores non-nullness).
    */
  final case class Measure(mvCol: String, fnSql: String, reAgg: String, isCount: Boolean)

  /** `mvRelation` is the ANALYZED scan of the summary, captured once at
    * registration: re-planning a query must not pay a parquet listing +
    * footer read per optimizer pass (measured: that overhead alone made
    * the rewrite a net LOSS at sf0.1 — 0.29 s vs 0.24 s for the raw
    * aggregate). Each rewrite takes `newInstance()` of it — fresh
    * exprIds, so the same MV can serve two aggregates in one query
    * without attribute conflicts, with zero IO at plan time.
    */
  final case class MvDef(basePath: String, baseFingerprint: PlanScans.ScanFingerprint,
      mvPath: String, groupCols: Seq[String], measures: Seq[Measure],
      mvRelation: LogicalRelation)

  // (applicationId, basePath) -> MvDef; appId-keyed like SharedFrames so a
  // restarted session can never see a stale registration.
  private val catalog = new ConcurrentHashMap[(String, String), MvDef]()

  /** Register `mvDf` (an Aggregate over `base`, already written to
    * `mvPath`) as the summary of `base`. Group columns must be plain
    * base columns aliased to themselves; measures are extracted from the
    * definition's optimized plan (see scaladoc).
    *
    * REFRESH CONTRACT: the summary's analyzed scan (its file listing)
    * is captured HERE — rewrites pay zero plan-time IO, which also
    * means a refresh that rewrites `mvPath` in place is invisible (and
    * leaves the cached listing pointing at deleted part-files). A
    * refresh job must re-register, which atomically replaces the
    * catalog entry; the natural spelling is opt6's — publish each
    * refresh as a NEW `VersionedTable` version and register that
    * version's path.
    *
    * BASE-SIDE STALENESS: the base scan's file-listing fingerprint is
    * captured here too, and the rewrite compares it against the
    * query-side relation's listing on every match — if part-files were
    * appended (or compacted, or overwritten) after registration, the
    * rewrite STANDS DOWN and the query runs on the base table until a
    * refresh re-registers over the new listing. Without this, the MV
    * would keep answering with a summary silently missing the new rows
    * (VERDICT r13 #2).
    */
  def register(spark: SparkSession, base: DataFrame, mvDf: DataFrame, mvPath: String): Unit = {
    // row-preserving walk: the base frame may carry normalization
    // Projects (e.g. Tables' NTZ-timestamp cast) above the relation —
    // those never add/drop/duplicate rows; anything else (a Filter, a
    // Join) would make the registration a lie. QUERY matching
    // (unwrapScan) stays strict.
    val baseRef = PlanScans.rowPreservingScanRef(base.queryExecution.optimizedPlan)
      .getOrElse(throw new IllegalArgumentException(
        "MV base must be a row-preserving chain over a single file-source scan"))
    val basePath = baseRef.path
    val (groupCols, measures) = mvDf.queryExecution.optimizedPlan.collectFirst {
      case Aggregate(ge, ae, child, _) =>
        // the definition must summarize EVERY row of the base scan: a
        // Filter (or join, or sample) between the Aggregate and the
        // scan would register a partial summary that later rewrites
        // whole-table queries to silently wrong results (r13 review).
        val defPath = PlanScans.rowPreservingScanPath(child).getOrElse(
          throw new IllegalArgumentException(
            "MV definition must aggregate a row-preserving chain over the base scan " +
              "(no filters/joins between the Aggregate and the scan)"))
        if (defPath != basePath) throw new IllegalArgumentException(
          s"MV definition aggregates $defPath, not the base scan $basePath")
        val groups = ge.map {
          case a: AttributeReference => a.name
          case other => throw new IllegalArgumentException(
            s"MV grouping expressions must be plain columns, got $other")
        }
        val ms = ae.collect {
          case Alias(AggregateExpression(fn, _, false, None, _), name) => fn match {
            case Sum(c, _) => Measure(name, fn.sql, "sum", isCount = false)
            case _: Count => Measure(name, fn.sql, "sum", isCount = true)
            case Min(_) => Measure(name, fn.sql, "min", isCount = false)
            case Max(_) => Measure(name, fn.sql, "max", isCount = false)
            case other => throw new IllegalArgumentException(
              s"MV measures must be SUM/COUNT/MIN/MAX, got ${other.sql}")
          }
        }
        (groups, ms)
    }.getOrElse(throw new IllegalArgumentException("MV definition must be an Aggregate"))
    val mvRelation = spark.read.parquet(mvPath).queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(s"MV at $mvPath did not analyze to a scan"))
    catalog.put((spark.sparkContext.applicationId, basePath),
      MvDef(basePath, baseRef.fingerprint, mvPath, groupCols, measures, mvRelation))
    ()
  }

  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(MaterializedViewRewrite))
      spark.experimental.extraOptimizations = current :+ MaterializedViewRewrite
  }

  // ------------------------------------------------------ star-schema MVs

  /** One dimension leg of a star MV: the dim's scan (path +
    * fingerprint + full schema names) and the equi-key pair, left key
    * ON THE FACT.
    */
  final case class DimJoin(path: String, fingerprint: PlanScans.ScanFingerprint,
      leftKey: String, rightKey: String, schemaNames: Seq[String])

  /** A star MV: an aggregate over fact ⟕ dims (all LEFT OUTER
    * equi-joins whose left keys are fact columns). Soundness of
    * matching needs NO uniqueness constraint: if the fact and every
    * dim have the same file listing the query's join is bag-identical
    * to the join the MV summarized (pure-star left joins commute —
    * each leg multiplies a fact row by max(matches, 1) independently
    * of the others — so dim ORDER is canonicalized away), and the MV
    * summarizes exactly the query's input.
    */
  final case class StarDef(factPath: String, factFp: PlanScans.ScanFingerprint,
      dims: Seq[DimJoin], mvPath: String, groupCols: Seq[String], measures: Seq[Measure],
      mvRelation: LogicalRelation)

  // (applicationId, canonical star signature) -> StarDef
  private val starCatalog = new ConcurrentHashMap[(String, String), StarDef]()

  private def starKey(factPath: String, dims: Seq[DimJoin]): String =
    factPath + dims.map(d => s"|${d.path}~${d.leftKey}~${d.rightKey}")
      .sorted.mkString

  private def sortedDims(dims: Seq[DimJoin]): Seq[DimJoin] =
    dims.sortBy(d => (d.path, d.leftKey, d.rightKey, d.fingerprint.files,
      d.fingerprint.bytes, d.fingerprint.maxMtime))

  /** Unwrap a pure-star join tree: a chain of LEFT OUTER single-pair
    * equi-joins whose right sides are bare dim scans and whose left
    * keys are FACT columns (a dim-sourced left key would be a
    * snowflake — refused, the commutation argument needs independence),
    * over a fact leaf accepted by `leaf` (row-preserving at
    * registration; bare-scan-plus-one-filter on the query side). The
    * fact leaf may yield ONE deterministic filter (the optimizer
    * pushes a dashboard's WHERE below the joins onto the fact scan);
    * [[tryRewrite]] admits it only over MV GROUPING columns and
    * transplants it 1:1 onto the summary — sound because a fact-column
    * filter commutes with every left dim join, so the filtered join's
    * groups are exactly the MV groups passing the predicate. Dim legs
    * stay predicate-free (beyond the optimizer's own isnotnull(key)):
    * a filtered dim means the query joins a SUBSET of what the MV
    * summarized.
    */
  private def unwrapStarShape(plan: LogicalPlan,
      leaf: LogicalPlan => Option[(PlanScans.ScanRef, Option[Expression])])
      : Option[(PlanScans.ScanRef, AttributeSet, Seq[DimJoin], Option[Expression])] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrapStarShape(child, leaf)
    case Join(l, r, LeftOuter, Some(EqualTo(x: AttributeReference, y: AttributeReference)), _) =>
      for {
        (fRef, factOut, dims, factFilter) <- unwrapStarShape(l, leaf)
        keys <- {
          val rOut = r.outputSet
          if (rOut.contains(y) && !rOut.contains(x)) Some((x, y))
          else if (rOut.contains(x) && !rOut.contains(y)) Some((y, x))
          else None
        }
        if factOut.contains(keys._1) // pure star: left key on the fact
        rRef <- dimScanRef(r, keys._2)
      } yield (fRef, factOut, dims :+ DimJoin(rRef.path, rRef.fingerprint,
        keys._1.name, keys._2.name, rRef.schemaNames), factFilter)
    case other =>
      leaf(other).map { case (ref, f) => (ref, other.outputSet, Seq.empty[DimJoin], f) }
  }

  /** Registration-side fact leaf: row-preserving chain, NO filters (the
    * definition must summarize every fact row).
    */
  private def regFactLeaf(plan: LogicalPlan): Option[(PlanScans.ScanRef, Option[Expression])] =
    PlanScans.rowPreservingScanRef(plan).map(r => (r, None))

  /** Query-side fact leaf: a bare scan, optionally under ONE
    * deterministic pushed-down Filter (attribute-only Projects looked
    * through on either side — [[PlanScans.bareScanRef]] refuses a
    * second Filter below).
    */
  private def queryFactLeaf(plan: LogicalPlan): Option[(PlanScans.ScanRef, Option[Expression])] =
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        queryFactLeaf(child)
      case Filter(cond, child) if cond.deterministic =>
        PlanScans.bareScanRef(child).map(r => (r, Some(cond)))
      case other => PlanScans.bareScanRef(other).map(r => (r, None))
    }

  /** Bare dim scan, admitting ONLY the optimizer's own
    * `isnotnull(rightKey)` (null keys never match a LEFT join's
    * condition, so dropping them is the identity on the join output —
    * the optimizer plants exactly this via constraint inference). Any
    * other predicate means the query joins a SUBSET of the dim the MV
    * summarized: refuse.
    */
  private def dimScanRef(plan: LogicalPlan,
      rightKey: AttributeReference): Option[PlanScans.ScanRef] = {
    def keyNotNullOnly(cond: Expression): Boolean = cond match {
      case And(a, b) => keyNotNullOnly(a) && keyNotNullOnly(b)
      case IsNotNull(a: AttributeReference) => a.exprId == rightKey.exprId
      case _ => false
    }
    plan match {
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        dimScanRef(child, rightKey)
      case Filter(cond, child) if keyNotNullOnly(cond) => dimScanRef(child, rightKey)
      case lr: LogicalRelation => PlanScans.bareScanRef(lr)
      case _ => None
    }
  }

  /** Register `mvDf` — an Aggregate over a pure-star join tree,
    * already written to `mvPath` — as the star summary of its fact
    * table. Everything (fact path, dim legs, group columns, measures)
    * is extracted from the definition's own optimized plan; group and
    * measure name resolution must be unambiguous across the join
    * output (fact/dim column name collisions are refused). The same
    * staleness contract as [[register]] applies to the fact AND every
    * dim: any listing change stands the rewrite down until
    * re-registration.
    */
  def registerStar(spark: SparkSession, mvDf: DataFrame, mvPath: String): Unit = {
    val reg = mvDf.queryExecution.optimizedPlan.collectFirst {
      case Aggregate(ge, ae, child, _) =>
        val (factRef, _, dims, _) =
          unwrapStarShape(child, regFactLeaf).getOrElse(
            throw new IllegalArgumentException(
              "star MV definition must aggregate a pure-star join tree " +
                "(LEFT OUTER equi-joins of bare dim scans onto one fact scan)"))
        if (dims.isEmpty) throw new IllegalArgumentException(
          "no dimension joins found — use register() for single-table MVs")
        val groups = ge.map {
          case a: AttributeReference => a.name
          case other => throw new IllegalArgumentException(
            s"star MV grouping expressions must be plain columns, got $other")
        }
        val ms = ae.collect {
          case Alias(AggregateExpression(fn, _, false, None, _), name) => fn match {
            case Sum(_, _) => Measure(name, fn.sql, "sum", isCount = false)
            case _: Count => Measure(name, fn.sql, "sum", isCount = true)
            case Min(_) => Measure(name, fn.sql, "min", isCount = false)
            case Max(_) => Measure(name, fn.sql, "max", isCount = false)
            case other => throw new IllegalArgumentException(
              s"star MV measures must be SUM/COUNT/MIN/MAX, got ${other.sql}")
          }
        }
        // name-resolution ambiguity guard: query matching binds group
        // columns, measures and filters by NAME, so every referenced
        // name must live on exactly ONE leg of the star. Checked
        // against the legs' FULL schemas, not the plan output — column
        // pruning removes an unreferenced duplicate from the optimized
        // output, and a later query referencing the OTHER leg's column
        // of that name would bind to this MV's wrong-leg values (the
        // r14 review found the output-based check vacuous for exactly
        // this reason).
        val referenced = (ge.flatMap(_.references) ++
          ae.collect { case Alias(AggregateExpression(fn, _, _, _, _), _) => fn }
            .flatMap(_.references)).map(_.name).toSet
        val legSchemas = factRef.schemaNames +: dims.map(_.schemaNames)
        val dup = referenced.filter(n => legSchemas.count(_.contains(n)) != 1)
        if (dup.nonEmpty) throw new IllegalArgumentException(
          s"ambiguous column name(s) across the star join's legs: ${dup.mkString(", ")}")
        StarDef(factRef.path, factRef.fingerprint, sortedDims(dims), mvPath, groups, ms, null)
    }.getOrElse(throw new IllegalArgumentException("star MV definition must be an Aggregate"))
    val mvRelation = spark.read.parquet(mvPath).queryExecution.analyzed.collectFirst {
      case lr: LogicalRelation => lr
    }.getOrElse(throw new IllegalStateException(s"MV at $mvPath did not analyze to a scan"))
    starCatalog.put((spark.sparkContext.applicationId, starKey(reg.factPath, reg.dims)),
      reg.copy(mvRelation = mvRelation))
    ()
  }

  /** Query-side star match: same shape walk with the STRICT fact leaf,
    * catalog hit on the canonical signature, then fingerprint equality
    * on the fact and every dim leg (staleness: any appended/compacted
    * leg stands the rewrite down).
    */
  private def tryStar(spark: SparkSession, appId: String, agg: Aggregate, ge: Seq[Expression],
      ae: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] =
    for {
      (factRef, _, dims, factFilter) <- unwrapStarShape(child, queryFactLeaf)
      if dims.nonEmpty
      sd <- Option(starCatalog.get((appId, starKey(factRef.path, dims))))
      if sd.factFp == factRef.fingerprint
      if sortedDims(dims) == sd.dims
      // no query-side name guard is needed: everything the rewrite can
      // bind resolves through mv.groupCols / registered measure text,
      // and registration's LEG-SCHEMA guard proved each of those names
      // lives on exactly one leg — with leg schemas pinned identical by
      // the fingerprint equality above, a query attribute of that name
      // can only be that leg's column. A query referencing a name the
      // registration never did simply fails to match (missed rewrite).
      out <- tryRewrite(spark, agg, ge, ae, factFilter,
        MvDef(sd.factPath, sd.factFp, sd.mvPath, sd.groupCols, sd.measures, sd.mvRelation))
    } yield out

  /** Strip attribute-only Projects; allow one Filter. Returns the base
    * scan path and the optional filter condition. Single-root only
    * ([[PlanScans]] — a multi-path scan is a union the MV knows nothing
    * about).
    */
  private def unwrapScan(plan: LogicalPlan): Option[(PlanScans.ScanRef, Option[Expression])] =
    plan match {
      case lr: LogicalRelation => PlanScans.bareScanRef(lr).map(r => (r, None))
      case Project(projList, child) if projList.forall(_.isInstanceOf[AttributeReference]) =>
        unwrapScan(child)
      case Filter(cond, child) =>
        unwrapScan(child).flatMap {
          case (r, None) => Some((r, Some(cond)))
          case _ => None // two filters: stay out
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    val spark = SparkSession.active
    val appId = spark.sparkContext.applicationId
    plan.transformUp {
      case agg @ Aggregate(ge, ae, child, _) =>
        val rewritten = (for {
          (ref, filterOpt) <- unwrapScan(child)
          mv <- Option(catalog.get((appId, ref.path)))
          // staleness gate: the query-side listing must be the listing
          // the MV summarized — files appended/compacted/overwritten
          // since registration would make the summary silently wrong,
          // so the rewrite stands down and the query runs on the base.
          if mv.baseFingerprint == ref.fingerprint
          out <- tryRewrite(spark, agg, ge, ae, filterOpt, mv)
        } yield out).orElse(tryStar(spark, appId, agg, ge, ae, child))
        rewritten.getOrElse(agg)
    }
  }

  private def tryRewrite(spark: SparkSession, agg: Aggregate, ge: Seq[Expression],
      ae: Seq[NamedExpression], filterOpt: Option[Expression], mv: MvDef): Option[LogicalPlan] = {
    // grouping must be plain columns, each one an MV grouping column
    val groupNames = ge.map {
      case a: AttributeReference if mv.groupCols.contains(a.name) => a.name
      case _ => return None
    }
    // a filter may only touch MV grouping columns (it transplants 1:1)
    filterOpt.foreach { cond =>
      if (!cond.deterministic) return None
      if (!cond.references.forall(r => mv.groupCols.contains(r.name))) return None
    }
    val mvPlan = mv.mvRelation.newInstance() // fresh exprIds, zero plan-time IO
    val mvAttr: Map[String, AttributeReference] =
      mvPlan.output.collect { case a: AttributeReference => a.name -> a }.toMap
    if (!mv.groupCols.forall(mvAttr.contains) || !mv.measures.forall(m => mvAttr.contains(m.mvCol)))
      return None

    val newAggExprs: Seq[NamedExpression] = ae.map {
      case a: AttributeReference if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
      case al @ Alias(a: AttributeReference, name) if groupNames.contains(a.name) =>
        Alias(mvAttr(a.name), name)(exprId = al.exprId, qualifier = al.qualifier)
      // a deterministic, aggregate-free expression over GROUP columns
      // (e.g. COALESCE(g, -1), CONCAT(g, '!')) evaluates identically
      // per output group on either side — transplant it onto the MV
      // attributes. CollapseProject folds such projections INTO the
      // Aggregate, so dashboard queries hit this arm routinely. Must
      // be tried BEFORE the measure arm falls through to refusal, and
      // must never swallow an AggregateExpression (a COUNT over base
      // rows is NOT a scalar of the group).
      case al @ Alias(e, name)
        if e.deterministic &&
          !e.exists(_.isInstanceOf[AggregateExpression]) &&
          e.references.nonEmpty &&
          e.references.forall(r => groupNames.contains(r.name)) =>
        val onMv = e.transform {
          case a: AttributeReference => mvAttr.getOrElse(a.name, return None)
        }
        Alias(onMv, name)(exprId = al.exprId, qualifier = al.qualifier)
      case al @ Alias(aggE @ AggregateExpression(fn, _, false, None, _), name) =>
        val m = mv.measures.find(_.fnSql == fn.sql).getOrElse(return None)
        val partial = mvAttr(m.mvCol)
        val reFn: AggregateFunction = m.reAgg match {
          case "sum" => Sum(partial)
          case "min" => Min(partial)
          case "max" => Max(partial)
        }
        // exactness guard: refuse float re-aggregation (accumulation order)
        if (Seq(org.apache.spark.sql.types.DoubleType,
            org.apache.spark.sql.types.FloatType).contains(partial.dataType)) return None
        val reAggE = aggE.copy(aggregateFunction = reFn)
        val body: Expression =
          if (m.isCount) Coalesce(Seq(reAggE, Literal(0L))) // COUNT is non-null
          else reAggE
        if (body.dataType != al.dataType) return None // type-preserving or bust
        Alias(body, name)(exprId = al.exprId, qualifier = al.qualifier)
      case _ => return None
    }
    val newGroup: Seq[Expression] = groupNames.map(mvAttr(_))
    val newChild: LogicalPlan = filterOpt match {
      case Some(cond) =>
        val onMv = cond.transform {
          case a: AttributeReference => mvAttr.getOrElse(a.name, return None)
        }
        Filter(onMv, mvPlan)
      case None => mvPlan
    }
    Some(Aggregate(newGroup, newAggExprs, newChild))
  }
}
