package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by modules under graft.queries; each module
  * pairs Spark plans with DuckDB oracle SQL over the same parquet tables.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] =
    Seq(Parity, Mart, Extras, Stats, YouGileQueries, Dedup, Similarity, Text,
      Sampling, MultimodalQueries, Linkage, Graph, StreamingGate, Analytics,
      Retrieval)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Mart.build(configure(spark), "/root/testdata/sf0.001")

  /** Session settings every gate query assumes, applicable to a session we
    * did not create (the driver's). ANSI off = null-on-garbage cast
    * semantics, the SURVEY.md §7.4 decision (pandas parity + availability);
    * DQ counters, not exceptions, surface bad input.
    */
  def configure(spark: SparkSession): SparkSession = {
    // first-row-per-key window dedups plan as min_by hash aggregates
    // (graft.plans.RowNumberDedupRewrite; extensions route in
    // GraftExtensions, runtime route here for sessions we did not build)
    graft.plans.RowNumberDedupRewrite.install(spark)
    // naive point-in-interval joins plan as binned equi-joins when a
    // session opts in via spark.graft.rangeJoin.binUs (see RangeBinJoin)
    graft.plans.RangeBinJoinRewrite.install(spark)
    // large literal IN-lists plan as broadcast semi joins (opt-in conf;
    // the gate sessions opt in so opt3 exercises the rewrite — no other
    // entry carries a 256+-element literal list)
    graft.plans.InListToJoinRewrite.install(spark)
    // COUNT(DISTINCT) plans as the KMV sketch aggregate when a session
    // opts in via spark.graft.approxDistinct (see ApproxDistinctRewrite;
    // exact below k, so the opt4 gate entry hash-matches the exact oracle)
    graft.plans.ApproxDistinctRewrite.install(spark)
    // aggregates over a registered base table re-plan as roll-ups of its
    // materialized summary when spark.graft.mv.enabled is set (opt5)
    graft.plans.MaterializedViewRewrite.install(spark)
    // left joins to a VERIFIED-unique key with no right-column references
    // drop entirely when spark.graft.joinElim.enabled is set (opt7)
    graft.plans.JoinEliminationRewrite.install(spark)
    // fact-side aggregates push below a verified-unique dimension join
    // when spark.graft.eagerAgg.enabled is set (opt8)
    graft.plans.EagerAggregationRewrite.install(spark)
    // dedups whose keys include a verified primary key drop to a
    // projection when spark.graft.distinctElim.enabled is set (opt14)
    graft.plans.DistinctEliminationRewrite.install(spark)
    // unfiltered global count/min/max over a parquet scan answer from
    // the file footers when spark.graft.footerAgg.enabled is set (opt16)
    graft.plans.FooterAggregateRewrite.install(spark)
    // bounded edit-distance predicates plan as the banded thresholded
    // levenshtein — always on, strictly semantics-preserving (opt17)
    graft.plans.LevenshteinThresholdRewrite.install(spark)
    // set-if-missing: a session (or spec) that pinned its own threshold
    // — including 0 = off — keeps it across re-configure
    if (spark.conf.getOption(graft.plans.InListToJoinRewrite.ThresholdConfKey).isEmpty)
      spark.conf.set(graft.plans.InListToJoinRewrite.ThresholdConfKey, "256")
    // guide §3.1: prefer shuffled-hash over sort-merge when the planner's
    // size conditions allow — skips the per-partition sort on both sides;
    // AQE's runtime rewrite handles the cases planning-time estimates
    // miss (threshold = the advisory partition size, the documented
    // pairing). Scale-honest: strategy choice, not a local[32] constant.
    // Risk stated precisely (ADVICE r18): the fallback is a PLANNING-time
    // choice — the planner keeps sort-merge where its size conditions
    // fail, but a ShuffledHashJoin build side does NOT spill or fall
    // back at runtime, so a build side that blows past its estimate
    // risks an executor OOM where sort-merge would have spilled. AQE's
    // skew-join split bounds the runtime-rewritten cases; for
    // planning-time picks the exposure is bounded build sides
    // (aggregated/contracted frames — er2's blocker classes, dq12's
    // key histograms) and ShjSkewSpec pins result correctness under a
    // planted ~100x hot build key on exactly this path.
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64MB")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // events.parquet carries TIMESTAMP(NANOS); Spark only exposes it as a
    // nanosecond long under this flag (normalized in Tables.events). Set
    // once per session instead of as a read side effect (ADVICE r01).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.defs).toMap.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(configure(s), dir))
    }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracle).toMap

  /** Scale-boundary probes (see [[graft.queries.QueryModule.probes]]):
    * NOT part of the gate battery — resolvable by the dev mains only.
    */
  def probeQueries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.probes).toMap.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => fn(configure(s), dir))
    }

  /** Gate entries + ladder probes under one name resolution — the dev
    * mains' (Explain/ShowQuery/TimeQuery/StreamBreakdown) lookup map,
    * built once per call site instead of re-spelled at each (review
    * r18). A probe silently shadowing a gate entry would make the dev
    * loop measure a different plan than the gate ships — fail instead.
    */
  def allQueries: Map[String, (SparkSession, String) => DataFrame] = {
    val (q, p) = (queries, probeQueries)
    val clash = q.keySet.intersect(p.keySet)
    require(clash.isEmpty, s"probe names shadow gate entries: $clash")
    q ++ p
  }
}
