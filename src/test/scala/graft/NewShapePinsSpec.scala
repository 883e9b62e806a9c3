package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the round-9 additions the gate hash can't see:
  * hh1 must run the sketch as a map-side-combinable ObjectHashAggregate
  * and rescore through a broadcast semi-join (never a shuffle of one
  * row per distinct id to a window), and emb6 must stay a single-scan
  * single-aggregate-exchange plan whatever the block size.
  */
class NewShapePinsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def aqeOff[A](f: org.apache.spark.sql.SparkSession => A): A = {
    val s = SparkEntry.configure(spark)
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    try { s.conf.set("spark.sql.adaptive.enabled", "false"); f(s) }
    finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ds11: windows are disjoint and ordered, fractions ~80/10/10, audit is exact") {
    val s = SparkEntry.configure(spark)
    val rows = SparkEntry.queries("ds11_time_split")(s, "/root/testdata/sf0.01")
      .collect().map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val (tr, va, te) = (rows("train"), rows("val"), rows("test"))
    // strictly ordered, non-overlapping time windows
    assert(tr.getAs[Long]("max_us") < va.getAs[Long]("min_us"))
    assert(va.getAs[Long]("max_us") < te.getAs[Long]("min_us"))
    // fractions near the 80/10/10 design (events are ~uniform in time)
    val n = Seq(tr, va, te).map(_.getAs[Long]("n_events")).sum.toDouble
    assert(math.abs(tr.getAs[Long]("n_events") / n - 0.8) < 0.05)
    assert(math.abs(va.getAs[Long]("n_events") / n - 0.1) < 0.05)
    // the audit column: test's overlap with itself IS its user count, and
    // the leak it exists to measure is non-trivial on this data
    assert(te.getAs[Long]("test_overlap_users") == te.getAs[Long]("n_users"))
    assert(tr.getAs[Long]("test_overlap_users") > 0, "time split shares users: audit must see it")
  }

  test("hh1: sketch is an ObjectHashAggregate, rescore a broadcast semi-join, no window") {
    aqeOff { s =>
      val plan = SparkEntry.queries("hh1_heavy_hitters")(s, dir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), "MG sketch not aggregated map-side")
      assert(plan.contains("BroadcastHashJoin LeftSemi") || plan.contains("LeftSemi, BuildRight"),
        s"rescore not a broadcast semi-join:\n$plan")
      assert(!plan.contains("Window"), "hh1 must not rank via a window")
    }
  }

  test("emb6: one embeddings scan, one aggregate exchange (plus the presentation sort)") {
    aqeOff { s =>
      // pin the BUILD plan — the gate entry returns the SharedFrames-
      // memoized copy (scanless by design, pinned below)
      val df = graft.queries.Similarity.covarianceBlock(s, dir)
      val scans = df.queryExecution.executedPlan.collect {
        case p if p.nodeName.contains("Scan") && p.toString.contains("embeddings") => p
      }
      assert(scans.size == 1, s"expected 1 embeddings scan, got ${scans.size}")
      val shuffles = df.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeLike => e
      }
      // groupBy(dim_i, dim_j) + the presentation orderBy range exchange
      assert(shuffles.size <= 2, s"unexpected exchanges: ${shuffles.size}")
    }
  }

  test("emb6 entry: second call reads the memoized covariance, no embeddings rescan") {
    aqeOff { s =>
      SparkEntry.queries("emb6_covariance")(s, dir).collect() // build or reuse
      val again = SparkEntry.queries("emb6_covariance")(s, dir)
      val scans = again.queryExecution.executedPlan.collect {
        case p if p.nodeName.contains("Scan") && p.toString.contains("embeddings") => p
      }
      assert(scans.isEmpty, s"memoized entry rescans embeddings: ${scans.size}")
    }
  }

  test("dpp1: fact scan carries a dynamic partition pruning filter and prunes") {
    val s = SparkEntry.configure(spark)
    val df = SparkEntry.queries("dpp1_partition_pruned_join")(s, dir)
    val rows = df.collect()
    // mechanism: the partitioned fact scan must carry the runtime
    // pruning subquery (reused broadcast), not read every partition
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning filter on the fact scan:\n$plan")
    // non-vacuity: the runtime predicate keeps SOME months and drops
    // SOME (else the pruning filter proves nothing)
    val total = SparkEntry.configure(spark).read
      .parquet(graft.queries.Extras.dppRoot(s, dir))
      .select("om").distinct().count()
    assert(rows.nonEmpty, "vacuous: predicate kept no months")
    assert(rows.length < total,
      s"vacuous: all $total partitions survived - nothing was pruned")
  }

  test("ann14: label-partitioned retrieval prunes partitions at runtime") {
    val s = SparkEntry.configure(spark)
    val df = SparkEntry.queries("ann14_topk_pruned")(s, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // mechanism: the partitioned embeddings scan must carry the dynamic
    // pruning filter fed by the broadcast query labels (dpp1's pin)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning filter on the label-partitioned scan:\n$plan")
    // non-vacuity: the query labels must keep strictly fewer partitions
    // than exist, else the pruning proves nothing
    val root = graft.queries.Similarity.annPartRoot(s, dir)
    val allLabels = SparkEntry.configure(spark).read.parquet(root)
      .select("label").distinct().count()
    val queryLabels = SparkEntry.configure(spark).read.parquet(root)
      .filter(org.apache.spark.sql.functions.col("vec_id").isin(0L, 1L, 2L))
      .select("label").distinct().count()
    assert(queryLabels < allLabels,
      s"vacuous: queries cover all $allLabels labels - nothing to prune")
    // layout invisibility: identical result to ann8's unpartitioned path
    val base = SparkEntry.queries("ann8_topk_filtered")(s, dir).collect()
    assert(rows.map(_.toSeq).toSeq == base.map(_.toSeq).toSeq,
      "partitioned layout changed the retrieval result")
  }

  test("ann15: probe stays inside the query's label and its per-label index has real buckets") {
    val s = SparkEntry.configure(spark)
    val rows = SparkEntry.queries("ann15_topk_label_ivf")(s, dir).collect()
    assert(rows.nonEmpty)
    // every neighbor shares its query's label — the probe never leaves
    // the label's own index
    val emb = Tables(s, dir, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("label"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(2))
      assert(emb(q) == emb(n), s"neighbor $n left query $q's label")
    }
    // non-vacuity: at least one label trained into MULTIPLE buckets, so
    // the (label, centroid) probe is a strict refinement of ann8's
    // label-only candidate set
    val a = graft.queries.Similarity.labelAssigned(s, dir)
    val labels = a.select("label").distinct().count()
    val buckets = a.select("label", "centroid_id").distinct().count()
    assert(buckets > labels, s"every label collapsed to one bucket ($buckets/$labels)")
  }

  test("opt17: the naive levenshtein predicate re-plans as the banded thresholded form") {
    import org.apache.spark.sql.catalyst.expressions.Levenshtein
    val s = SparkEntry.configure(spark)
    val df = SparkEntry.queries("opt17_lev_threshold")(s, dir)
    val levs = df.queryExecution.optimizedPlan.collect { case p => p }
      .flatMap(_.expressions.flatMap(_.collect { case l: Levenshtein => l }))
    assert(levs.nonEmpty, "no levenshtein survived in the optimized plan")
    assert(levs.forall(_.threshold.isDefined),
      s"un-thresholded levenshtein left in the plan: $levs")
    // non-vacuity: the twin fixture guarantees lev-1 pairs, so the
    // rewritten predicate actually admits rows
    assert(df.collect().map(_.getLong(1)).sum > 0, "no pairs survived — vacuous")
    // rule-off control: the same predicate built on a session with the
    // rule removed keeps the un-thresholded levenshtein (i.e. the pin
    // above is detecting the REWRITE, not some analyzer behavior).
    // Built directly — the queries() wrapper would re-install the rule.
    val s2 = SparkEntry.configure(spark.newSession())
    s2.experimental.extraOptimizations =
      s2.experimental.extraOptimizations.filterNot(_ == graft.plans.LevenshteinThresholdRewrite)
    val ctrl = Tables(s2, dir, "customer")
      .select(org.apache.spark.sql.functions.col("c_name").as("na"),
        org.apache.spark.sql.functions.col("c_name").as("nb"))
      .filter(org.apache.spark.sql.functions.levenshtein(
        org.apache.spark.sql.functions.col("na"),
        org.apache.spark.sql.functions.col("nb")) <= 2)
    val ctrlLevs = ctrl.queryExecution.optimizedPlan.collect { case p => p }
      .flatMap(_.expressions.flatMap(_.collect { case l: Levenshtein => l }))
    assert(ctrlLevs.exists(_.threshold.isEmpty), "rule-off control still rewrote")
  }

  test("dq7: the key-grain frame is persisted, not rebuilt per consumer") {
    val s = SparkEntry.configure(spark)
    val df = SparkEntry.queries("dq7_join_skew")(s, dir)
    df.collect()
    // after the action the persisted mult frame backs the hot-census
    // branch as an InMemoryTableScan instead of re-running the fact scan
    assert(df.queryExecution.executedPlan.toString.contains("InMemoryTableScan"),
      "mult frame not cached — lineitem would scan twice")
  }

  test("ann13: just-ingested delta vectors are searchable AND findable (non-vacuous)") {
    val s = SparkEntry.configure(spark.newSession())
    val rows = SparkEntry.queries("ann13_incremental_ivf")(s, dir).collect()
    val queryIds = rows.map(_.getLong(0)).toSet
    // query ids 0 and 26 are DELTA rows (% 13 = 0): they queried the index
    assert(queryIds.contains(0L) && queryIds.contains(26L),
      s"delta queries missing from the result: $queryIds")
    // and at least one delta vector surfaces as a NEIGHBOR of someone
    val neighbors = rows.map(_.getLong(2))
    assert(neighbors.exists(_ % 13 == 0),
      "no just-ingested vector was ever retrieved — the ingest pin is vacuous")
  }

  test("sw13: streaming decontamination flags the benchmark's own docs (non-vacuous)") {
    val s = SparkEntry.configure(spark.newSession())
    val rows = SparkEntry.queries("sw13_stream_decontaminate")(s, dir).collect()
    assert(rows.nonEmpty, "stream produced no contamination rows")
    val byDoc = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 0 is in the benchmark slice (0 % 97 == 0): streaming it back
    // through the probe must flag every one of its own shingles
    assert(byDoc.get(0L).exists(_ >= 1L),
      s"benchmark doc 0 not flagged by its own suite: $byDoc")
  }
  test("ev26: a planted daily cycle flips periodic_24; the gate corpus stays flat") {
    import org.apache.spark.sql.functions._
    val s = SparkEntry.configure(spark.newSession())
    import s.implicits._
    // type P: events only during hours h % 24 < 4 (a hard daily duty
    // cycle -> lag-24 products land on-peak, lag-1 mostly cross the
    // edge); type F: one event every hour (flat)
    val rows =
      (0 until 720).filter(_ % 24 < 4).flatMap(h => Seq.fill(5)(("P", h.toLong))) ++
      (0 until 720).map(h => ("F", h.toLong))
    val out = graft.queries.Extras.autocorrelationOf(
      rows.toDF("event_type", "h"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("r1_milli"), r.getAs[Long]("r24_milli"),
          r.getAs[Boolean]("periodic_24"))).toMap
    val (p1, p24, pFlag) = out("P")
    assert(pFlag && p24 > p1 + 100, s"daily cycle not detected: r1=$p1 r24=$p24")
    val (f1, f24, fFlag) = out("F")
    assert(!fFlag && math.abs(f1 - f24) < 100, s"flat series flagged: r1=$f1 r24=$f24")
    // and the real corpus is honestly aperiodic
    val gate = SparkEntry.queries("ev26_autocorrelation")(s, dir).collect()
    assert(gate.nonEmpty && gate.forall(!_.getAs[Boolean]("periodic_24")))
  }
}
