package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SaltedJoin
import graft.streaming.EventStream

/** Salted-join equivalence under skew and streaming dedup-within-
  * watermark semantics.
  */
/** Top-level, not nested in the suite: a case class inside a spec class
  * captures the outer `this`, which Spark's Encoder codegen cannot
  * compile — every use fell back to the interpreter and polluted test
  * logs with codegen warnings (VERDICT r05 cosmetic).
  */
case class EvId(event_id: Long, ts: Timestamp, user_id: Long)

class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("salted left join returns exactly the plain join's rows on skewed data") {
    // hot key: 900 of 1000 left rows share k=1
    val left = spark.range(1000)
      .selectExpr("CASE WHEN id < 900 THEN 1 ELSE id END AS k", "id AS row_id")
    val right = Seq((1L, "hot"), (950L, "cold"), (999L, "cold2")).toDF("k", "label")
    // compare as sorted multisets: the characteristic salted-join bug is
    // row DUPLICATION (right side replicated per bucket), which a Set
    // comparison would silently collapse
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "row_id", "label").collect()
        .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).sorted.toSeq
    val plain = rows(left.join(right, Seq("k"), "left"))
    val salted = rows(SaltedJoin.leftJoinSalted(left, right, key = "k",
      dispersion = "row_id", buckets = 8))
    assert(salted == plain)
    assert(plain.count(_._3.contains("hot")) == 900)
  }

  test("binned range join equals the naive predicate join and plans no nested loop") {
    val s = SparkEntry.configure(spark)
    val ev = graft.Tables(s, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts")
    val win = ev.select($"user_id".as("w_user"), $"event_id".as("w_id"),
      $"ts".as("win_start"), ($"ts" + org.apache.spark.sql.functions.expr("INTERVAL 2 HOURS")).as("win_end"))
    val binned = graft.operators.RangeJoin.pointInInterval(
      ev, win, "user_id", "w_user", "ts", "win_start", "win_end", binUs = 2L * 3600 * 1000000)
    val naive = ev.join(win,
      $"user_id" === $"w_user" && $"ts" >= $"win_start" && $"ts" < $"win_end")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = rows(binned)
    assert(b.nonEmpty)
    assert(b == rows(naive))
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "range join must stay an equi-join on (key, bin)")
  }

  test("interval-overlap join equals the naive join with no duplicate pairs") {
    val s = SparkEntry.configure(spark)
    import org.apache.spark.sql.functions.{col, expr}
    val ev = graft.Tables(s, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "ts")
    // LONG intervals (4h) against a SMALL bin (30min): every interval
    // covers ~8 bins, so any exactly-once bug (pair emitted per shared
    // bin) multiplies pairs ~8x — the multiset compare catches it where
    // a span-sized bin would mask it
    val a = ev.filter(col("event_id") % 2 === 0).select(col("event_id").as("a_id"),
      col("user_id").as("a_user"), col("ts").as("a_s"),
      (col("ts") + expr("INTERVAL 4 HOURS")).as("a_e"))
    val b = ev.filter(col("event_id") % 2 === 1).select(col("event_id").as("b_id"),
      col("user_id").as("b_user"), col("ts").as("b_s"),
      (col("ts") + expr("INTERVAL 4 HOURS")).as("b_e"))
    val binned = graft.operators.RangeJoin.intervalOverlap(
      a, b, "a_user", "b_user", "a_s", "a_e", "b_s", "b_e", binUs = 30L * 60 * 1000000)
    val naive = a.join(b,
      col("a_user") === col("b_user") && col("a_s") < col("b_e") && col("b_s") < col("a_e"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val got = rows(binned)
    assert(got.nonEmpty)
    assert(got == rows(naive)) // sorted SEQ compare: duplicates would diverge
    assert(got.distinct == got, "pair emitted in more than one shared bin")
  }

  test("narrow-key mart dedup is row-for-row equivalent to the wide dropDuplicates") {
    val dir = "/root/testdata/sf0.001"
    val s = SparkEntry.configure(spark)
    // compare as multisets: any concatenated sort key can collide, and
    // between equal keys a stable sort preserves side-dependent order
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val wide = multiset(graft.queries.Mart.build(s, dir))
    val narrow = multiset(graft.queries.Mart.buildNarrow(s, dir))
    assert(wide.nonEmpty)
    assert(narrow == wide)
  }

  test("same-key bucketed tables join without any shuffle exchange") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    graft.operators.Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    graft.operators.Bucketing.writeBucketed(lineitem, "lineitem_b", "o_orderkey", 4)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = graft.operators.Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        orders.join(lineitem, Seq("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("bkt1 gate entry: co-located bucketed join + agg plans with zero shuffle exchanges") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.001"
    // broadcast + AQE off for the same reason as the dd10 pin below: the
    // property is that the bucketed layout itself satisfies BOTH the
    // join's and the aggregate's distribution at any size — not that AQE
    // happened to broadcast a fixture-sized side
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      // drop the presentation sort exactly like Bench does — its range
      // exchange is the one shuffle the entry is allowed
      val out = org.apache.spark.sql.GraftShims.dropTopLevelSort(
        SparkEntry.queries("bkt1_bucketed_join")(s, dir))
      val shuffles =
        out.queryExecution.executedPlan.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"bucketed join+agg must be shuffle-free:\n${out.queryExecution.executedPlan}")
      assert(out.collect().nonEmpty, "bkt1 produced no rows at fixture scale — vacuous pin")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("dd10 posture: ingest join reads the bucketed corpus band table shuffle-free") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.001"
    // disable broadcast AND adaptive re-planning: at fixture scale AQE
    // would (legitimately) broadcast the tiny corpus table, which is
    // exactly what must not be confused with the bucketed-scan property
    // this test pins — that the corpus side needs NO exchange at any size
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val prev = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val out = SparkEntry.queries("dd10_incremental_neardup")(s, dir)
      val smjs = out.queryExecution.executedPlan.collect { case j: SortMergeJoinExec => j }
      val ingest = smjs.filter(
        _.children.exists(_.collectLeaves().exists(_.toString.contains(
          graft.queries.Dedup.Dd10CorpusTable))))
      assert(ingest.nonEmpty, "ingest join is not a sort-merge join over the bucketed table")
      val corpusSide = ingest.head.children.find(
        _.collectLeaves().exists(_.toString.contains(graft.queries.Dedup.Dd10CorpusTable))).get
      val shuffles = corpusSide.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.isEmpty,
        s"corpus side of the ingest join shuffles:\n$corpusSide")
      assert(out.collect().nonEmpty, "dd10 produced no matches at fixture scale — vacuous pin")
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("filters push to the parquet scan and projections prune the read schema") {
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.001"
    // explain truncates ReadSchema at spark.sql.maxMetadataStringLength
    // (default 100) — a pruning regression would hide BEHIND the cut,
    // making the negative assertions vacuous; widen for this check
    val prevLen = spark.conf.get("spark.sql.maxMetadataStringLength")
    // (re)widen before EVERY explain: restoring in a per-call finally
    // would leave the second call truncated to the 100-char default,
    // making its negative assertions vacuous (ADVICE r04)
    def formatted(name: String) = {
      spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
      SparkEntry.queries(name)(s, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
    }
    try {
      // f6: LIKE 'src1%' must reach the scan as StringStartsWith
      val f6 = formatted("f6_like_regex")
      assert(f6.contains("PushedFilters") && f6.contains("StartsWith"),
        s"f6 prefix filter not pushed:\n$f6")
      // p1: a 3-column projection over part must not read the wide columns
      val p1 = formatted("p1_scan_project")
      val read = p1.linesIterator.filter(_.contains("ReadSchema")).mkString
      // untruncated-explain guard: the full struct must close with ">"
      assert(read.contains(">"), s"ReadSchema still truncated:\n$read")
      assert(read.contains("p_partkey") && !read.contains("p_retailprice") && !read.contains("p_comment"),
        s"p1 scan reads pruned columns:\n$read")
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prevLen)
  }

  test("AQE skew-split fires on a 90%-hot join key (the dd2/tri1 posture)") {
    // Dedup.scala and Graph.scala leave hot-key handling to AQE's skew
    // split rather than pre-salting every join; this pins that the
    // mechanism actually engages on a 90%-hot key (VERDICT r05 #6).
    // Thresholds are lowered so test-sized data crosses them — the
    // DEFAULTS only trigger at hundreds of MB per partition; what's
    // under test is the plan mechanism, not the production threshold.
    val tuned = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // the shared test session runs 2 shuffle partitions; skew detection
      // compares against the MEDIAN partition size (for 2 partitions the
      // median IS the larger one), so the hot partition can never qualify —
      // spread the cold keys over 16 partitions so the median is honest
      "spark.sql.shuffle.partitions" -> "16",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB")
    val prev = tuned.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      tuned.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(200000)
        .selectExpr("CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k", "id AS v")
      val right = spark.range(1000).selectExpr("id AS k", "id * 2 AS w")
      val joined = left.join(right, "k")
      // an action on the SAME Dataset finalizes its adaptive plan (a
      // write would execute a cloned QueryExecution and leave this one
      // isFinalPlan=false)
      val got = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the hot partition:\n$plan")
      // the split must be invisible in the result: same rows as the
      // plain (AQE-off) spelling of the identical join
      val plainConf = Seq("spark.sql.adaptive.enabled" -> "false")
      val prevPlain = plainConf.map { case (k, _) => k -> spark.conf.getOption(k) }
      val want =
        try {
          plainConf.foreach { case (k, v) => spark.conf.set(k, v) }
          left.join(right, "k").collect()
        } finally prevPlain.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None)    => spark.conf.unset(k)
        }
      def key(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(_.toSeq.mkString("|")).sorted.toSeq
      assert(key(got) == key(want), "skew-split changed the join result")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("sj4 gate entry executes under a real OptimizeSkewedJoin split") {
    // non-vacuity for the sj4_skew_join CORRECTNESS row: the gate query's
    // own adaptive plan must contain the skew-split, at the gate's
    // smallest scale. Three traps the gate must dodge at sf0.001 (all
    // documented in skewJoinGate's scaladoc): a 2-partition session's
    // median IS the hot partition (gate pins 16), compressed shuffle
    // bytes (the constant-key hot partition lz4-compresses ~10x, so the
    // conf-scoped threshold is 2 KB, not 16 KB), and map-output
    // granularity (one parquet file = one mapper = unsplittable hot
    // partition — the gate repartitions the fact side to 8 mappers).
    // The entry builds on a CHILD session, so the lowered thresholds
    // must not leak into this one.
    val before = spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    val df = SparkEntry.queries("sj4_skew_join")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"sj4's adaptive plan did not skew-split:\n$plan")
    assert(spark.conf.getOption("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      == before, "sj4's tuned confs leaked into the parent session")
  }

  test("streaming dedup drops duplicate event ids within the watermark") {
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[EvId]
    val q = EventStream.startMemorySink(
      EventStream.dedupedEvents(stream.toDF()), "dedup_events", OutputMode.Append())
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
      stream.addData(EvId(1, t0, 5), EvId(1, t0, 5), EvId(2, t0, 6))
      q.processAllAvailable()
      stream.addData(EvId(2, t0, 6), EvId(3, t0, 7)) // dup of 2 across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_events").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }
}
