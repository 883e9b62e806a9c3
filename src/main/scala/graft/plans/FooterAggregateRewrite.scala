package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex
import org.apache.spark.sql.types._

/** FOOTER-STATISTICS aggregate answering (opt-in): a global aggregate
  * of `count(*)` / `count(col)` / `min(col)` / `max(col)` over a BARE
  * parquet scan — no filter, no grouping — is already answered by the
  * file footers: every row group carries its row count and per-column
  * min/max/null-count statistics. With the flag on, the whole
  * scan+aggregate collapses to a one-row [[LocalRelation]] computed
  * from the footers at PLAN time — the DSv1 twin of parquet aggregate
  * pushdown (`spark.sql.parquet.aggregatePushdown` exists only for
  * DSv2 scans), and the reason real warehouses answer `SELECT
  * COUNT(*)` from the catalog in milliseconds instead of scanning
  * 100 TB.
  *
  * Soundness boundaries (each refusal keeps the aggregate):
  *  - the child must be a bare scan under attribute-only Projects —
  *    any Filter refuses (footer stats describe ALL rows);
  *  - `min`/`max` only for plain INTEGRAL types (INT32/INT64 with no
  *    logical-type reinterpretation): parquet may TRUNCATE binary
  *    statistics, date/decimal logical types reinterpret the physical
  *    value, and float/double stats are undefined under NaN — all
  *    refuse;
  *  - `min`/`max` require every row group to HAVE statistics for the
  *    column; `count(col)` requires the null count to be set in every
  *    row group. A single stats-less block refuses (a writer is free
  *    to omit statistics);
  *  - DISTINCT refuses (footers cannot answer it); FILTER clauses
  *    refuse.
  *
  * Plan-time cost, stated honestly: one footer read per file, O(KB)
  * each, memoized per (path, listing fingerprint) — the same
  * [[PlanScans.ScanFingerprint]] the constraint catalog uses, so an
  * append/rewrite invalidates the cached stats instead of serving
  * stale answers. At 100 TB/100k files the first planning pays the
  * footer sweep ONCE per table version; a production deployment would
  * persist this cache in its catalog (exactly what ANALYZE TABLE
  * materializes).
  *
  * Enable with `spark.graft.footerAgg.enabled=true`.
  */
object FooterAggregateRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.footerAgg.enabled"

  def install(spark: SparkSession): Unit = {
    val current = spark.experimental.extraOptimizations
    if (!current.contains(FooterAggregateRewrite))
      spark.experimental.extraOptimizations = current :+ FooterAggregateRewrite
  }

  /** Per-column footer stats. `valid` = EVERY row group carried a
    * statistics object (a single stats-less block poisons the column —
    * refusal, not an answer). `min`/`max` merge over the blocks that
    * held non-null values; None WITH valid=true means the column is
    * all-null everywhere, which IS an answer (SQL MIN/MAX = NULL) —
    * the two cases must not conflate (review find during design).
    */
  private case class ColStats(nulls: Option[Long], valid: Boolean,
      min: Option[Any], max: Option[Any])
  private case class TableStats(rows: Long, cols: Map[String, ColStats])

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, PlanScans.ScanFingerprint), TableStats]()

  /** Read every footer of the scan's CURRENT listing. Returns None if
    * the index is not listing-backed (no trustworthy fingerprint — the
    * PlanScans refusal) or any footer fails to read.
    */
  private def statsOf(h: HadoopFsRelation): Option[TableStats] = h.location match {
    case p: PartitioningAwareFileIndex if h.location.rootPaths.length == 1 =>
      val files = p.allFiles()
      val fp = PlanScans.ScanFingerprint(files.length, files.iterator.map(_.getLen).sum,
        if (files.isEmpty) 0L else files.iterator.map(_.getModificationTime).max)
      val key = (h.location.rootPaths.head.toString, fp)
      Option(cache.get(key)).orElse {
        try {
          val conf = h.sparkSession.sessionState.newHadoopConf()
          var rows = 0L
          val colAgg = scala.collection.mutable.Map.empty[String, ColStats]
          files.foreach { f =>
            val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf)
            val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
            try {
              val footer = reader.getFooter
              footer.getBlocks.asScala.foreach { block =>
                rows += block.getRowCount
                block.getColumns.asScala.foreach { cc =>
                  val path = cc.getPath.toDotString
                  val st = cc.getStatistics
                  val cur = ColStats(
                    if (st != null && st.isNumNullsSet) Some(st.getNumNulls) else None,
                    st != null && !st.isEmpty,
                    if (st != null && st.hasNonNullValue) Some(st.genericGetMin) else None,
                    if (st != null && st.hasNonNullValue) Some(st.genericGetMax) else None)
                  val merged = colAgg.get(path) match {
                    case None => cur
                    case Some(prev) => ColStats(
                      for (a <- prev.nulls; b <- cur.nulls) yield a + b,
                      prev.valid && cur.valid,
                      mergeMinMax(prev.min, cur.min, takeMin = true),
                      mergeMinMax(prev.max, cur.max, takeMin = false))
                  }
                  colAgg(path) = merged
                }
              }
            } finally reader.close()
          }
          val ts = TableStats(rows, colAgg.toMap)
          cache.put(key, ts)
          Some(ts)
        } catch { case _: Exception => None }
      }
    case _ => None
  }

  /** Min/max merge where a missing side is NEUTRAL (that block simply
    * held no non-null values); validity — did every block carry a
    * stats object at all — is tracked separately in [[ColStats]].
    */
  private def mergeMinMax(a: Option[Any], b: Option[Any], takeMin: Boolean): Option[Any] =
    (a, b) match {
      case (Some(x), Some(y)) =>
        val cmp = (x, y) match {
          case (i: java.lang.Integer, j: java.lang.Integer) => Integer.compare(i, j)
          case (i: java.lang.Long, j: java.lang.Long) => java.lang.Long.compare(i, j)
          case (i: java.lang.Float, j: java.lang.Float) => java.lang.Float.compare(i, j)
          case (i: java.lang.Double, j: java.lang.Double) => java.lang.Double.compare(i, j)
          case _ => 0 // unreachable: plain-numeric gate upstream
        }
        Some(if ((cmp <= 0) == takeMin) x else y)
      case (Some(x), None) => Some(x)
      case (None, y) => y
    }

  /** Is `attr` a PLAIN INTEGRAL column of the scan (no logical-type
    * reinterpretation between the parquet physical value and the Spark
    * value)? Dates/decimals/strings refuse (reinterpretation or stat
    * truncation), and float/double refuse too: the parquet spec leaves
    * min/max undefined in the presence of NaN, so floating stats are
    * writer-dependent — Spark's own DSv2 aggregate pushdown draws the
    * same line.
    */
  private def plainNumeric(t: DataType): Boolean = t match {
    case IntegerType | LongType => true
    case _ => false
  }

  /** The bare-scan walk: attribute-only Projects down to a single-root
    * parquet LogicalRelation; anything else (Filter included) refuses.
    * Returns the relation plus the scan-side name of each attr.
    */
  private def bareScan(plan: LogicalPlan): Option[HadoopFsRelation] = plan match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation if h.location.rootPaths.length == 1 &&
        h.fileFormat.isInstanceOf[org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
        Some(h)
      case _ => None
    }
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) => bareScan(child)
    case _ => None
  }

  private def answer(ae: AggregateExpression, stats: TableStats): Option[Any] = {
    if (ae.isDistinct || ae.filter.isDefined) return None
    ae.aggregateFunction match {
      case c: Count if c.children.forall(ch => ch.foldable && !ch.nullable) =>
        Some(stats.rows)
      case c: Count => c.children match {
        case Seq(a: AttributeReference) =>
          stats.cols.get(a.name).flatMap(_.nulls).map(n => stats.rows - n)
        case _ => None
      }
      case m: Min => m.child match {
        case a: AttributeReference if plainNumeric(a.dataType) =>
          // every row group must CARRY stats (valid); min None under
          // valid=true means an all-null column — SQL MIN's null
          stats.cols.get(a.name).filter(_.valid).map(cs => cs.min.orNull)
        case _ => None
      }
      case m: Max => m.child match {
        case a: AttributeReference if plainNumeric(a.dataType) =>
          stats.cols.get(a.name).filter(_.valid).map(cs => cs.max.orNull)
        case _ => None
      }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case agg @ Aggregate(Nil, aggExprs, child, _) if !child.isStreaming =>
        bareScan(child).flatMap(statsOf) match {
          case None => agg
          case Some(stats) =>
            val values = aggExprs.map {
              case Alias(ae: AggregateExpression, _) => answer(ae, stats)
              case _ => None
            }
            if (values.exists(_.isEmpty)) agg // one unanswerable output refuses all
            else {
              val row = InternalRow.fromSeq(values.map(_.get).map {
                case null => null
                case v: java.lang.Integer => v.intValue()
                case v: java.lang.Long => v.longValue()
                case v: java.lang.Float => v.floatValue()
                case v: java.lang.Double => v.doubleValue()
                case v => v
              })
              LocalRelation(agg.output, Seq(row)) // exprIds preserved
            }
        }
    }
  }
}
