package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the quantile-sketch census (q06). Since r06 the
  * gate itself verifies the sketch (exact quantiles + in-bracket flags,
  * hash-compared against literal TRUE in the oracle); this spec keeps
  * the TIGHTER accuracy claim — the gate bracket is ±1% of rank, here
  * the raw sketch must sit within 1% of the value SPAN of the true
  * quantiles — plus a direct replay of the exact columns.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("imp2: forward-fill replays driver-side; leading nulls stay null") {
    val out = SparkEntry.queries("imp2_forward_fill")(spark, dir).collect()
    assert(out.exists(_.getAs[Boolean]("was_gap")), "no planted gaps — vacuous")
    // replay LOCF per user in plain Scala over the same planted stream
    val filled = out
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts"),
        r.getAs[Long]("event_id"), r.getAs[Boolean]("was_gap"),
        Option(r.getAs[java.lang.Double]("value_filled"))))
    val src = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
      .collect().map(r => r.getAs[Long]("event_id") ->
        (if (r.getAs[Long]("event_id") % 3 == 0) None else Some(r.getAs[Double]("value")))).toMap
    filled.groupBy(_._1).foreach { case (_, rows) =>
      var carry: Option[Double] = None
      rows.sortBy(r => (r._2.getTime, r._3)).foreach { case (_, _, id, gap, got) =>
        assert(gap == src(id).isEmpty)
        carry = src(id).orElse(carry)
        assert(got == carry, s"event $id: got $got want $carry")
      }
    }
  }

  test("ev20: gap histogram replays driver-side and conserves gap count") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev20_interarrival_hist")(s, dir).collect()
    val ev = Tables(s, dir, "events")
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[Long]("event_id")))
    val gaps = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).sliding(2).collect {
        case Array(p, c) => (c._2 - p._2) / 1000000L
      }
    }.toSeq
    val want = gaps.groupBy(g => java.lang.Long.toBinaryString(g).length)
      .map { case (b, gs) => b -> (gs.size.toLong, gs.min, gs.max) }
    assert(out.map(_.getAs[Long]("n_gaps")).sum == gaps.size.toLong)
    out.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(want(b) == ((r.getAs[Long]("n_gaps"), r.getAs[Long]("min_gap_s"),
        r.getAs[Long]("max_gap_s"))), s"bucket $b diverged")
    }
    assert(out.map(_.getAs[Int]("bucket")).toSet == want.keySet)
  }

  test("u4: multiset counts obey bag algebra against raw multiplicities") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("u4_multiset_setops")(s, dir).collect()
      .map(r => (r.getAs[String]("set_op"), r.getAs[String]("o_orderpriority"),
        r.getAs[String]("o_orderstatus")) -> r.getAs[Long]("n_copies")).toMap
    val orders = SparkEntry.configure(spark).read.parquet(s"$dir/orders.parquet")
      .selectExpr("o_orderpriority", "o_orderstatus",
        "o_orderdate < TIMESTAMP '1998-01-01' AS early").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getAs[Boolean]("early")))
    val em = orders.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val lm = orders.filterNot(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    (em.keySet ++ lm.keySet).foreach { case k @ (p, st) =>
      val both = math.min(em.getOrElse(k, 0L), lm.getOrElse(k, 0L))
      val excess = math.max(0L, em.getOrElse(k, 0L) - lm.getOrElse(k, 0L))
      assert(out.getOrElse(("both_copies", p, st), 0L) == both, s"$k both")
      assert(out.getOrElse(("early_excess", p, st), 0L) == excess, s"$k excess")
    }
    // bag semantics genuinely differ from distinct: some key carries > 1 copy
    assert(out.exists { case ((op, _, _), n) => op == "both_copies" && n > 1 })
  }

  test("imp4: regression-imputed values replay as exact rationals; plant covered") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("imp4_regression_impute")(s, dir).collect()
    assert(out.nonEmpty)
    val ev = Tables(s, dir, "events")
      .selectExpr("event_type", "event_id", "unix_micros(ts) DIV 1000000 AS x",
        "CAST(round(value * 100) AS BIGINT) AS y").collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Long]("x"), r.getAs[Long]("y")))
    assert(out.map(_.getAs[Long]("event_id")).toSet ==
      ev.filter(_._2 % 7 == 0).map(_._2).toSet, "imputed set != planted nulls")
    val moments = ev.filter(_._2 % 7 != 0).groupBy(_._1).view.mapValues { rs =>
      val n = BigInt(rs.length)
      val sx = rs.map(r => BigInt(r._3)).sum; val sy = rs.map(r => BigInt(r._4)).sum
      val sxx = rs.map(r => BigInt(r._3) * r._3).sum
      val sxy = rs.map(r => BigInt(r._3) * r._4).sum
      (n, sx, sy, sxx, sxy)
    }.toMap
    out.foreach { r =>
      val (n, sx, sy, sxx, sxy) = moments(r.getAs[String]("event_type"))
      val x = BigInt(r.getAs[Long]("x"))
      val a = ((n * sxy - sx * sy) * x + (sy * sxx - sx * sxy)) * 1000
      val m = n * sxx - sx * sx
      val want = (a - (((a % m) + m) % m)) / m
      assert(BigInt(r.getAs[Long]("y_hat_milli")) == want, s"event ${r.getAs[Long]("event_id")}")
    }
    // imputations should land inside the observed value range (sane fit)
    val (lo, hi) = (ev.map(_._4).min * 1000 - 500000, ev.map(_._4).max * 1000 + 500000)
    out.foreach(r => assert(r.getAs[Long]("y_hat_milli") >= lo &&
      r.getAs[Long]("y_hat_milli") <= hi, "imputed value far outside data range"))
  }

  test("dq10: freshness lags replay; staleness fires at gate scale") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("dq10_freshness")(s, dir).collect()
    val byType = Tables(s, dir, "events")
      .groupBy("event_type")
      .agg(org.apache.spark.sql.functions.expr("unix_micros(max(ts))").as("us"),
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("us"), r.getAs[Long]("n"))).toMap
    val frontier = byType.values.map(_._1).max
    assert(out.length == byType.size)
    out.foreach { r =>
      val (us, n) = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == n)
      val lag = (frontier - us) / 60000000L
      assert(r.getAs[Long]("minutes_behind") == lag)
      assert(r.getAs[Boolean]("is_stale") == (lag > 20))
    }
    assert(out.exists(_.getAs[Boolean]("is_stale")), "no stale feed at sf0.01 — vacuous flag")
    assert(out.exists(!_.getAs[Boolean]("is_stale")), "every feed stale — vacuous flag")
  }

  test("ev23: last-touch census replays against a driver-side argmax") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev23_last_touch")(s, dir).collect()
      .map(r => r.getAs[String]("touch_type") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("sum_delay_s"))).toMap
    val ev = Tables(s, dir, "events")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS us")
      .collect().map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val touchesByUser = ev.filter(e => e._3 == "view" || e._3 == "click").groupBy(_._2)
    val agg = scala.collection.mutable.Map.empty[String, (Long, Long)]
    ev.filter(_._3 == "purchase").foreach { case (_, u, _, us) =>
      val cand = touchesByUser.getOrElse(u, Array.empty).filter(_._4 <= us)
      val (tpe, delay) =
        if (cand.isEmpty) ("none", 0L)
        else {
          val best = cand.maxBy(t => (t._4, t._1))
          (best._3, (us - best._4) / 1000000L)
        }
      val (n, d) = agg.getOrElse(tpe, (0L, 0L))
      agg(tpe) = (n + 1, d + delay)
    }
    assert(out == agg.toMap, s"attribution diverged: $out vs $agg")
    assert(out.contains("view") && out.contains("click"), "a channel never wins")
    assert(out.contains("none"), "no unattributed purchase — vacuous none path")
  }

  test("ev22: DAU/WAU/stickiness replay driver-side; WAU bounds DAU") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev22_stickiness")(s, dir).collect()
    val ud = Tables(s, dir, "events")
      .selectExpr("CAST(to_date(ts) AS STRING) AS day", "user_id").distinct().collect()
      .map(r => (java.time.LocalDate.parse(r.getString(0)), r.getAs[Long]("user_id")))
    val dau = ud.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val wau = ud.flatMap { case (d, u) => (0 to 6).map(i => (d.plusDays(i), u)) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    assert(out.length == dau.size, "one row per observed day")
    out.foreach { r =>
      val d = r.getAs[java.sql.Date]("day").toLocalDate
      assert(r.getAs[Long]("dau") == dau(d))
      assert(r.getAs[Long]("wau") == wau(d))
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
      assert(r.getAs[Long]("stickiness_ppm") == dau(d) * 1000000L / wau(d))
    }
    assert(out.exists(r => r.getAs[Long]("wau") > r.getAs[Long]("dau")),
      "WAU never exceeds DAU — trailing window vacuous")
  }

  test("dq9: exact NDVs replay; the raw KMV estimate sits within the stated 5%") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("dq9_cardinality_audit")(s, dir).collect()
      .map(r => r.getAs[String]("column_name") ->
        (r.getAs[Long]("exact_ndv"), r.getAs[Boolean]("within_5pct"))).toMap
    val li = SparkEntry.configure(spark).read.parquet(s"$dir/lineitem.parquet")
    out.foreach { case (c, (ndv, ok)) =>
      assert(ndv == li.select(c).distinct().count(), s"$c exact ndv")
      assert(ok, s"$c estimate outside 5% — the gate would hash-fail")
      val approx = li.agg(graft.functions.NdvSketch.ndvSketch(col(c))).head().getLong(0)
      assert(math.abs(approx - ndv) * 100 <= ndv * 5, s"$c raw estimate drifted")
    }
    assert(out.size == 4)
  }

  test("dq9/dq11 plan shape: the sketch NEVER rides a distinct partial; dq11 is one scan") {
    // the r9 regression was exactly this plan smell — a wide-buffer
    // sketch aggregate sharing a node with a DISTINCT aggregate gets its
    // buffer allocated per distinct value. Pin the separation: dq9 = two
    // scans (multi-distinct HashAggregate chain + grouping-free sketch
    // ObjectHashAggregate) joined on 1-row frames; dq11 = ONE scan, ONE
    // ObjectHashAggregate pair, no Expand anywhere.
    val s = SparkEntry.configure(spark)
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    try {
      s.conf.set("spark.sql.adaptive.enabled", "false")
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec}
      import org.apache.spark.sql.execution.ExpandExec
      val dq9 = SparkEntry.queries("dq9_cardinality_audit")(s, dir).queryExecution.executedPlan
      val objAggs9 = dq9.collect { case a: ObjectHashAggregateExec => a }
      assert(objAggs9.nonEmpty, "dq9 sketch side must be an ObjectHashAggregate")
      assert(objAggs9.forall(_.groupingExpressions.isEmpty),
        "dq9 sketch aggregate must be grouping-free — buffer-per-distinct-value is the r9 bug")
      assert(dq9.collect { case sc: FileSourceScanExec => sc }.size == 2)
      val dq11 = SparkEntry.queries("dq11_stats_policy")(s, dir).queryExecution.executedPlan
      assert(dq11.collect { case sc: FileSourceScanExec => sc }.size == 1, "dq11 must scan once")
      assert(dq11.collect { case e: ExpandExec => e }.isEmpty, "dq11 must not Expand")
      assert(dq11.collect { case a: HashAggregateExec => a }.isEmpty &&
        dq11.collect { case a: ObjectHashAggregateExec => a }.size == 2,
        "dq11 = one partial + one final ObjectHashAggregate")
    } finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("dq11: policy census replays driver-side") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("dq11_stats_policy")(s, dir).collect()
    assert(out.length == 11)
    val li = s.read.parquet(s"$dir/lineitem.parquet")
    val n = li.count()
    out.foreach { r =>
      val c = r.getAs[String]("column_name")
      val ndv = li.select(c).na.drop().distinct().count()
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_nulls") == n - li.select(c).na.drop().count())
      assert(r.getAs[Boolean]("is_high_card") == (ndv > 64), s"$c policy bit")
      if (!r.isNullAt(r.fieldIndex("exact_ndv")))
        assert(r.getAs[Long]("exact_ndv") == ndv, s"$c exact ndv (sketch below k must be exact)")
    }
    // the policy split is non-vacuous: both classes occur
    assert(out.count(_.getAs[Boolean]("is_high_card")) > 0)
    assert(out.count(!_.getAs[Boolean]("is_high_card")) > 0)
  }

  test("dq8: gap intervals cover exactly the missing hours, disjoint and separated") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("dq8_gap_audit")(s, dir).collect()
    assert(out.nonEmpty, "no gaps at sf0.01 — vacuous audit")
    val present = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "error" && col("user_id") % 5 === 0)
      .select(date_trunc("hour", col("ts")).as("hr")).distinct().collect()
      .map(_.getAs[java.sql.Timestamp]("hr").getTime).toSet
    val (lo, hi) = (present.min, present.max)
    val missing = (lo to hi by 3600000L).filterNot(present).toSet
    val covered = out.flatMap { r =>
      val a = r.getAs[java.sql.Timestamp]("gap_start").getTime
      val b = r.getAs[java.sql.Timestamp]("gap_end").getTime
      val hours = (a to b by 3600000L)
      assert(hours.size.toLong == r.getAs[Long]("n_hours"), "interval length mismatch")
      hours
    }
    assert(covered.toSet == missing, "gap intervals != missing hour set")
    assert(covered.length == covered.distinct.length, "overlapping gap intervals")
    // maximality: the hour before each start and after each end is present
    out.foreach { r =>
      val a = r.getAs[java.sql.Timestamp]("gap_start").getTime
      val b = r.getAs[java.sql.Timestamp]("gap_end").getTime
      assert(present(a - 3600000L), "gap start not maximal")
      assert(present(b + 3600000L), "gap end not maximal")
    }
  }

  test("ev19: weekday shares and signed deviations replay; deviations balance") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev19_weekday_profile")(s, dir).collect()
    assert(out.length == 7)
    val total = out.map(_.getAs[Long]("n_events")).sum
    out.foreach { r =>
      val n = r.getAs[Long]("n_events")
      assert(r.getAs[Long]("share_ppm") == n * 1000000L / total)
      val want = BigInt(7 * n - total) * 1000000 match {
        case a => (a - (((a % (7 * total)) + 7 * total) % (7 * total))) / (7 * total)
      }
      assert(BigInt(r.getAs[Long]("dev_ppm")) == want)
    }
    // signed deviations must roughly telescope (each floored ⇒ within 7 ppm)
    val devSum = out.map(_.getAs[Long]("dev_ppm")).sum
    assert(devSum <= 0 && devSum >= -7, s"deviations do not balance: $devSum")
  }

  test("ev18: cusum replays driver-side; deviations sum to zero; peak flagged") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev18_cusum_changepoint")(s, dir).collect()
    val daily = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
      .groupBy(to_date(col("ts")).as("day")).count().collect()
      .map(r => (r.getAs[java.sql.Date]("day"), r.getAs[Long]("count")))
      .sortBy(_._1.getTime)
    val nd = daily.length.toLong
    val tot = daily.map(_._2).sum
    var run = 0L
    val want = daily.map { case (d, c) => run += nd * c - tot; (d, c, run) }
    assert(run == 0L, "scaled deviations must telescope to zero")
    val peak = want.map(w => math.abs(w._3)).max
    assert(out.length == daily.length)
    out.zip(want).foreach { case (r, (d, c, cu)) =>
      assert(r.getAs[java.sql.Date]("day") == d)
      assert(r.getAs[Long]("n_events") == c)
      assert(r.getAs[Long]("cusum_scaled") == cu)
      assert(r.getAs[Boolean]("is_changepoint") == (math.abs(cu) == peak))
    }
    assert(out.count(_.getAs[Boolean]("is_changepoint")) >= 1)
  }

  test("imp3: winsorize census replays driver-side with exact interpolated bands") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("imp3_winsorize")(s, dir).collect()
    val byLang = SparkEntry.configure(spark).read.parquet(s"$dir/documents.parquet")
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // Spark's Percentile weights BOTH sides (lo·(h−rank) + hi·(rank−l));
    // the algebraically-equal lo + frac·(hi−lo) rounds differently in fp
    // and can land the ×1000 floor one milli off
    def interp(v: Array[Long], p: Double): Double = {
      val sorted = v.sorted
      val rank = p * (sorted.length - 1)
      val l = math.floor(rank).toInt; val h = math.ceil(rank).toInt
      if (l == h) sorted(l).toDouble
      else sorted(l) * (h - rank) + sorted(h) * (rank - l)
    }
    assert(out.map(_.getAs[String]("lang")).toSet == byLang.keySet)
    out.foreach { r =>
      val v = byLang(r.getAs[String]("lang"))
      val lo = math.floor(interp(v, 0.05) * 1000).toLong
      val hi = math.floor(interp(v, 0.95) * 1000).toLong
      assert(r.getAs[Long]("lo_milli") == lo && r.getAs[Long]("hi_milli") == hi)
      val m = v.map(_ * 1000)
      assert(r.getAs[Long]("n_docs") == v.length)
      assert(r.getAs[Long]("n_clip_low") == m.count(_ < lo))
      assert(r.getAs[Long]("n_clip_high") == m.count(_ > hi))
      assert(r.getAs[Long]("n_clip_low") > 0 && r.getAs[Long]("n_clip_high") > 0,
        "no clipping at all — vacuous winsorization")
      val sum = m.map(x => math.max(lo, math.min(hi, x))).sum
      assert(r.getAs[Long]("sum_clamped_milli") == sum)
      assert(r.getAs[Long]("mean_clamped_milli") == sum / v.length)
    }
  }

  test("ev17: RFM codes cover all quartiles and census conserves users/events") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("ev17_rfm_segments")(s, dir).collect()
    val ev = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
    val nUsers = ev.select("user_id").distinct().count()
    val nEvents = ev.count()
    assert(out.map(_.getAs[Long]("n_users")).sum == nUsers, "census loses users")
    assert(out.map(_.getAs[Long]("sum_events")).sum == nEvents, "census loses events")
    // recency is degenerate in this stream (most users active on the
    // final day → all three quartile boundaries 0), so only range-check
    // it; frequency and monetary must genuinely stratify
    val rCodes = out.map(_.getAs[Long]("r_code"))
    assert(rCodes.forall(x => x >= 1 && x <= 4), "r_code out of range")
    Seq("f_code", "m_code").foreach { c =>
      val codes = out.flatMap(r => List.fill(r.getAs[Long]("n_users").toInt)(r.getAs[Long](c)))
      assert(codes.forall(x => x >= 1 && x <= 4), s"$c out of range")
      assert(codes.distinct.sorted.sameElements(Array(1L, 2L, 3L, 4L)),
        s"$c does not span all four quartiles")
      // quartile coding: each code holds between 5% and 45% of users
      val share = codes.groupBy(identity).view.mapValues(_.length.toDouble / nUsers)
      share.foreach { case (k, p) =>
        assert(p > 0.05 && p < 0.45, s"$c=$k holds ${p * 100}%% of users") }
    }
  }

  test("dq7: skew audit ties out to a driver-side multiplicity recount") {
    val r = SparkEntry.queries("dq7_join_skew")(spark, dir).head
    val mult = SparkEntry.configure(spark).read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_orderkey").count().collect()
      .map(x => x.getAs[Long]("l_orderkey") -> x.getAs[Long]("count")).toMap
    val nRows = mult.values.sum
    assert(r.getAs[Long]("n_rows") == nRows)
    assert(r.getAs[Long]("n_keys") == mult.size)
    assert(r.getAs[Long]("max_mult") == mult.values.max)
    val avgMilli = 1000L * nRows / mult.size
    assert(r.getAs[Long]("avg_mult_milli") == avgMilli)
    assert(r.getAs[Long]("n_hot_keys") == mult.values.count(_ * 1000 > 2 * avgMilli))
    val want5 = mult.toSeq.sortBy { case (k, c) => (-c, k) }.take(5)
      .map { case (k, c) => s"$k:$c" }.mkString(",")
    assert(r.getAs[String]("hot5") == want5)
    assert(r.getAs[Long]("skew_x1000") > 1000, "no skew signal at all — vacuous audit")
  }

  test("q06: every in-gate bracket flag is true") {
    val out = SparkEntry.queries("q06_quantile_sketch")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("p25_ok", "p50_ok", "p75_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"${r.getAs[String]("event_type")}: $c false"))
    }
  }

  test("approx quantiles sit within 1% of the exact per-type quantiles") {
    val events = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
    val vq = round(col("value") * 100).cast("long")
    val both = events.groupBy("event_type")
      .agg(
        percentile_approx(vq, array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("a"),
        expr("percentile(CAST(round(value * 100) AS BIGINT), array(0.25, 0.5, 0.75))").as("e"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getSeq[Long](1), r.getSeq[Double](2))).toMap
    assert(both.nonEmpty)
    val span = events.agg(max(vq) - min(vq)).head.getLong(0).toDouble
    both.foreach { case (t, (approx, exact)) =>
      approx.zip(exact).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.01 * span, s"$t: approx $a vs exact $e (span $span)")
      }
    }
  }

  test("q27: both nation roles broadcast, share recomputes, numerator non-vacuous") {
    val df = SparkEntry.queries("q27_market_share")(spark, dir)
    val out = df.collect()
    assert(out.nonEmpty)
    // the share nation actually supplies into the market at this scale
    assert(out.exists(_.getAs[Long]("nation_rev_e4") > 0), "share numerator vacuous")
    out.foreach { r =>
      val (n, t) = (r.getAs[Long]("nation_rev_e4"), r.getAs[Long]("total_rev_e4"))
      assert(n >= 0 && n <= t)
      assert(r.getAs[Long]("share_ppm") == (BigInt(n) * 1000000 / t).toLong)
    }
    // nation (twice), region: the bounded dims never shuffle
    val plan = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3,
      "expected the three dim joins to broadcast")
  }

  test("q28: every Q6 predicate reaches the parquet scan") {
    val prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "10000")
    try {
      val plan = SparkEntry.queries("q28_forecast_revenue")(spark, dir)
        .queryExecution.executedPlan.toString
      Seq("LessThan(l_quantity,24", "GreaterThanOrEqual(l_discount,0.05",
        "LessThanOrEqual(l_discount,0.07", "GreaterThanOrEqual(l_shipdate,")
        .foreach(p => assert(plan.contains(p), s"predicate not pushed: $p"))
    } finally spark.conf.set("spark.sql.maxMetadataStringLength", prev)
  }

  test("dq4: ppm shares normalize per window and the drift flag recomputes") {
    val out = SparkEntry.queries("dq4_dist_drift")(spark, dir).collect()
    assert(out.nonEmpty)
    val totA = out.map(_.getAs[Long]("n_a")).sum
    val totB = out.map(_.getAs[Long]("n_b")).sum
    assert(totA > 0 && totB > 0, "a drift window is empty — entry vacuous")
    // truncating integral division: each window's shares sum into (1M - #types, 1M]
    Seq("share_a_ppm", "share_b_ppm").foreach { c =>
      val s = out.map(_.getAs[Long](c)).sum
      assert(s > 1000000L - out.length && s <= 1000000L, s"$c sums to $s")
    }
    out.foreach { r =>
      val sa = (BigInt(r.getAs[Long]("n_a")) * 1000000 / totA).toLong
      val sb = (BigInt(r.getAs[Long]("n_b")) * 1000000 / totB).toLong
      assert(sa == r.getAs[Long]("share_a_ppm"), s"share_a mismatch: $r")
      assert(sb == r.getAs[Long]("share_b_ppm"), s"share_b mismatch: $r")
      assert(r.getAs[Long]("delta_ppm") == sb - sa, s"delta mismatch: $r")
      assert(r.getAs[Boolean]("drifted") ==
        (math.abs(sb - sa) > 20000L), s"drift flag mismatch: $r")
    }
  }

  test("w6: rolling median exercises odd AND even frames; null only on empty frames") {
    val out = SparkEntry.queries("w6_rolling_median")(spark, dir).collect()
    assert(out.nonEmpty)
    val ns = out.map(_.getAs[Long]("n_vals")).toSet
    // partition warmups guarantee short frames; both parities must occur
    // >1 so the two-middle interpolation branch is genuinely exercised
    assert(ns.exists(n => n > 1 && n % 2 == 1), s"no odd frame > 1 in $ns")
    assert(ns.exists(n => n > 1 && n % 2 == 0), s"no even frame > 1 in $ns")
    out.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("med2_c")) == (r.getAs[Long]("n_vals") == 0L),
        s"med2_c nullability disagrees with frame emptiness: $r")
    }
  }
  test("dq18: a planted location shift fires the drift flag; a stationary twin does not") {
    import org.apache.spark.sql.functions._
    val s = SparkEntry.configure(spark.newSession())
    import s.implicits._
    // type A: identical halves (KS 0); type B: half 2 shifted by +1000
    // cents (disjoint supports, KS = 1000 milli)
    val rows =
      (1 to 200).map(i => ("A", (i % 50) * 10L, 1L, 0L)) ++
      (1 to 200).map(i => ("A", (i % 50) * 10L, 0L, 1L)) ++
      (1 to 200).map(i => ("B", (i % 50) * 10L, 1L, 0L)) ++
      (1 to 200).map(i => ("B", 100000L + (i % 50) * 10L, 0L, 1L))
    val out = graft.queries.Stats.ksDriftOf(
      rows.toDF("event_type", "v_c", "in1", "in2"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("ks_milli"), r.getAs[Boolean]("drifted"))).toMap
    assert(out("A") == ((0L, false)), s"stationary type flagged: ${out("A")}")
    assert(out("B") == ((1000L, true)), s"disjoint shift must max KS: ${out("B")}")
    // and the gate corpus is honestly stationary: all-false there
    val gate = SparkEntry.queries("dq18_ks_drift")(s, dir).collect()
    assert(gate.nonEmpty && gate.forall(!_.getAs[Boolean]("drifted")))
  }
}
