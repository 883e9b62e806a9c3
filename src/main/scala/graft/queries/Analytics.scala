package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-8 analytics additions: distributed closed-form model fitting and
  * exact quantiles without a global sort — both engineered for cross-engine
  * hash stability (every intermediate is exact integer/decimal arithmetic;
  * the only floating step would be a final division, and even that is
  * avoided by fixed-point ppm scaling with sign-split truncation).
  */
object Analytics extends QueryModule {

  private def t(s: SparkSession, dir: String, n: String) = graft.Tables(s, dir, n)

  // ---------------------------------------------------------------- ev15
  /** Per-event-type OLS trend of value over time, computed from exact
    * integer moments: x = epoch seconds, y = value cents, slope =
    * (nΣxy − ΣxΣy) / (nΣx² − (Σx)²) reported in fixed-point ppm. All four
    * moments are DECIMAL(38,0) sums of long products (Σx² ≈ 3e23 at
    * sf0.1 — far inside both engines' 38-digit/int128 range), so the
    * aggregation is a single map-side-combinable groupBy. The squared/cross
    * moments cast ONE OPERAND to decimal BEFORE the multiply (x·x ≈ 3e18
    * would sit only 3× under Long.MaxValue as long·long, silently wrapping
    * with ANSI off for timestamps past ~2065, while the oracle multiplies in
    * HUGEINT) — decimal-first multiplication keeps both engines exact. The
    * 100 TB plan
    * is one partial-agg shuffle carrying five numbers per event type, the
    * same shape as a COUNT/SUM rollup. The ppm result uses
    * sign(num) · (|num|·10⁶ div den): integral division of NONNEGATIVE
    * operands truncates identically in Spark and DuckDB, where a signed
    * `div` would hit their floor-vs-truncate disagreement.
    */
  private def trendFit(s: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val m = t(s, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) DIV 1000000").as("x"),
        round(col("value") * 100).cast(LongType).as("y"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"),
        sum(col("x").cast(d38) * col("y")).as("sxy"))
    m.withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("mag", expr("(abs(num) * 1000000) DIV den"))
      .select(col("event_type"), col("n"),
        when(col("den") === 0, lit(null).cast(LongType))
          .when(col("num") < 0, -col("mag"))
          .otherwise(col("mag")).as("slope_ppm"))
      .orderBy(col("event_type").asc_nulls_first)
  }

  private val trendFitSql =
    """WITH p AS (
      |  SELECT event_type, epoch_us(ts) // 1000000 AS x,
      |         CAST(round(value * 100) AS BIGINT) AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, COUNT(*) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM p GROUP BY event_type),
      |d AS (
      |  SELECT event_type, n, n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      |  FROM m)
      |SELECT event_type, n,
      |  CASE WHEN den = 0 THEN NULL
      |       WHEN num < 0 THEN CAST(-((-num * 1000000) // den) AS BIGINT)
      |       ELSE CAST((num * 1000000) // den AS BIGINT) END AS slope_ppm
      |FROM d
      |ORDER BY event_type NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- qt1
  /** Exact per-group quantiles WITHOUT a global sort: histogram the value
    * domain per group ((lang, n_chars) partial-agg shuffle — map-side
    * combinable, cardinality bounded by distinct values, not rows), then a
    * per-group running sum over the compact histogram and a conditional-min
    * pick: p-th quantile = smallest v with 100·cum(v) ≥ p·n (the discrete
    * lower-quantile definition, integer arithmetic only). At 100 TB the
    * window runs over per-group DISTINCT VALUE counts — thousands of rows
    * per group, not billions — which is the standard two-shuffle exact
    * quantile plan where a sort-based percentile would be a cluster-wide
    * range exchange of every row.
    */
  private def exactQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum("c").over(
        Window.partitionBy("lang").orderBy(col("n_chars").asc_nulls_first)))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
    def pick(p: Int) =
      min(when(col("cum") * 100 >= col("n") * p, col("n_chars")))
    cum.groupBy("lang")
      .agg(max(col("n")).as("n_docs"),
        pick(50).as("p50_chars"), pick(90).as("p90_chars"),
        pick(99).as("p99_chars"))
      .orderBy(col("lang").asc_nulls_first)
  }

  private val exactQuantilesSql =
    """WITH h AS (
      |  SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY 1, 2),
      |cum AS (
      |  SELECT lang, n_chars,
      |    SUM(c) OVER (PARTITION BY lang ORDER BY n_chars NULLS FIRST) AS cum,
      |    SUM(c) OVER (PARTITION BY lang) AS n
      |  FROM h)
      |SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
      |  MIN(CASE WHEN cum * 100 >= n * 50 THEN n_chars END) AS p50_chars,
      |  MIN(CASE WHEN cum * 100 >= n * 90 THEN n_chars END) AS p90_chars,
      |  MIN(CASE WHEN cum * 100 >= n * 99 THEN n_chars END) AS p99_chars
      |FROM cum GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ev16
  /** Ordered conversion funnel view → click → purchase, each user counted
    * at a stage iff the stage event happens AT OR AFTER the previous
    * stage's earliest qualifying event and within one day of the first
    * view. Each stage is one filtered aggregate joined to the previous
    * stage's per-user frame — no window over the event stream and no
    * self-join of events against events: stage frames are one row per
    * user, so the joins are key-shuffles of user-grain frames (broadcast
    * candidates at any realistic funnel selectivity).
    */
  private def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") >= col("t1") &&
        col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") >= col("t2") &&
        col("ts") <= col("t1") + expr("INTERVAL 1 DAY"))
      .groupBy("user_id").agg(min("ts").as("t3"))
    def stage(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
    stage(v, "1_view").unionByName(stage(c, "2_click")).unionByName(stage(p, "3_purchase"))
      .orderBy(col("stage").asc_nulls_first)
  }

  private val funnelSql =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2, MIN(v.t1) AS t1
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click'
      |    AND e.ts >= v.t1 AND e.ts <= v.t1 + INTERVAL 1 DAY
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.ts >= c.t2 AND e.ts <= c.t1 + INTERVAL 1 DAY
      |  GROUP BY e.user_id)
      |SELECT '1_view' AS stage, COUNT(*) AS n_users FROM v
      |UNION ALL SELECT '2_click', COUNT(*) FROM c
      |UNION ALL SELECT '3_purchase', COUNT(*) FROM p
      |ORDER BY stage NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- qt2
  /** WEIGHTED quantiles over the same histogram machinery as qt1 — each
    * document weighted by its length, answering the token-budget question
    * "what document size covers p% of the corpus VOLUME per language?"
    * (p50 here is the size-biased median: half the characters live in
    * documents at or below it). Identical scale shape to qt1 — the only
    * change is the running sum accumulating Σ(v·count) instead of
    * Σcount, still exact integer arithmetic end to end.
    */
  private def weightedQuantiles(s: SparkSession, dir: String): DataFrame = {
    val hist = t(s, dir, "documents")
      .groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
      .withColumn("w", col("n_chars") * col("c"))
    val cum = hist
      .withColumn("wcum", sum("w").over(
        Window.partitionBy("lang").orderBy(col("n_chars").asc_nulls_first)))
      .withColumn("wn", sum("w").over(Window.partitionBy("lang")))
    def pick(p: Int) =
      min(when(col("wcum") * 100 >= col("wn") * p, col("n_chars")))
    cum.groupBy("lang")
      .agg(max(col("wn")).as("total_chars"),
        pick(50).as("wp50_chars"), pick(90).as("wp90_chars"),
        pick(99).as("wp99_chars"))
      .orderBy(col("lang").asc_nulls_first)
  }

  private val weightedQuantilesSql =
    """WITH h AS (
      |  SELECT lang, n_chars, COUNT(*) AS c, n_chars * COUNT(*) AS w
      |  FROM documents GROUP BY lang, n_chars),
      |cum AS (
      |  SELECT lang, n_chars,
      |    SUM(w) OVER (PARTITION BY lang ORDER BY n_chars NULLS FIRST) AS wcum,
      |    SUM(w) OVER (PARTITION BY lang) AS wn
      |  FROM h)
      |SELECT lang, CAST(MAX(wn) AS BIGINT) AS total_chars,
      |  MIN(CASE WHEN wcum * 100 >= wn * 50 THEN n_chars END) AS wp50_chars,
      |  MIN(CASE WHEN wcum * 100 >= wn * 90 THEN n_chars END) AS wp90_chars,
      |  MIN(CASE WHEN wcum * 100 >= wn * 99 THEN n_chars END) AS wp99_chars
      |FROM cum GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ev18
  /** CUSUM change-point detection over daily event volume — the
    * level-shift monitor beside ev8's spike detector (MAD flags single
    * outlier days; CUSUM finds the day the MEAN moved). All integer: the
    * per-day deviation from the mean is pre-scaled by n_days
    * (nd·c_d − total, summing to zero over the window), the running sum
    * is exact, and the change-point is the day of peak |cusum| — ties
    * all flagged, no float anywhere.
    *
    * Scale posture: the corpus collapses to day grain in one map-side-
    * combinable aggregate; the running sum and peak run over the tiny
    * day-grain frame (the rr1/dq4 "window over a post-agg frame"
    * posture — an unpartitioned window is fine when the frame is
    * #days-sized; a multi-year unbounded variant chunks by month like
    * w5). Oracle CASTs its windowed SUM — the r8 HUGEINT lesson.
    */
  private def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val st = daily.agg(count(lit(1)).as("nd"), sum(col("c")).as("tot"))
    val cu = daily.join(broadcast(st))
      .withColumn("cusum_scaled",
        sum(col("nd") * col("c") - col("tot"))
          .over(Window.orderBy(col("day").asc_nulls_first)))
    val peak = cu.agg(max(abs(col("cusum_scaled"))).as("peak"))
    cu.join(broadcast(peak))
      .select(col("day"), col("c").as("n_events"), col("cusum_scaled"),
        (abs(col("cusum_scaled")) === col("peak")).as("is_changepoint"))
      .orderBy(col("day").asc_nulls_first)
  }

  private val cusumChangepointSql =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1),
      |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd, CAST(SUM(c) AS BIGINT) AS tot
      |       FROM daily),
      |cu AS (
      |  SELECT day, c,
      |    CAST(SUM(nd * c - tot) OVER (ORDER BY day NULLS FIRST) AS BIGINT)
      |      AS cusum_scaled
      |  FROM daily CROSS JOIN st)
      |SELECT day, c AS n_events, cusum_scaled,
      |  abs(cusum_scaled) = (SELECT MAX(abs(cusum_scaled)) FROM cu) AS is_changepoint
      |FROM cu ORDER BY day NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- imp4
  /** Regression imputation — the model-based fill beside imp1's median
    * and imp2's carry-forward: nulls (planted at event_id ≡ 0 mod 7)
    * are predicted from each type's OLS line fit on the NON-null rows,
    * ŷ = a + b·x evaluated as ONE exact rational — ŷ·1000 =
    * ((nΣxy−ΣxΣy)·x + (ΣyΣxx−ΣxΣxy))·1000 DIV (nΣxx−(Σx)²) — so no
    * float slope/intercept ever materializes (ev15's moment discipline;
    * numerator ≈ 10³⁵ at sf0.1, inside DECIMAL(38,0)/int128; signed ⇒
    * the pmod-floor spelling). The moments frame is per-type (tiny,
    * broadcast back); the imputation is map-side over the null rows
    * only.
    */
  private def regressionImpute(s: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val base = t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("unix_micros(ts) DIV 1000000").as("x"),
        when(col("event_id") % 7 === 0, lit(null))
          .otherwise(round(col("value") * 100).cast(LongType)).as("y"))
    val m = base.filter(col("y").isNotNull)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"),
        sum(col("x").cast(d38) * col("y")).as("sxy"))
    base.filter(col("y").isNull)
      .join(broadcast(m), Seq("event_type"))
      .withColumn("a0",
        expr("((n * sxy - sx * sy) * CAST(x AS DECIMAL(38,0))" +
          " + (sy * sxx - sx * sxy)) * 1000"))
      .withColumn("m0", expr("n * sxx - sx * sx"))
      .select(col("event_type"), col("event_id"), col("x"),
        expr("CAST((a0 - ((a0 % m0 + m0) % m0)) DIV m0 AS BIGINT)").as("y_hat_milli"))
      .orderBy(col("event_id").asc_nulls_first)
  }

  private val regressionImputeSql =
    """WITH base AS (
      |  SELECT event_type, event_id, epoch_us(ts) // 1000000 AS x,
      |    CASE WHEN event_id % 7 = 0 THEN NULL
      |         ELSE CAST(round(value * 100) AS BIGINT) END AS y
      |  FROM events),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
      |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM base WHERE y IS NOT NULL GROUP BY event_type),
      |nulls AS (
      |  SELECT b.event_type, b.event_id, b.x,
      |    ((n * sxy - sx * sy) * CAST(b.x AS HUGEINT)
      |      + (sy * sxx - sx * sxy)) * 1000 AS a0,
      |    (n * sxx - sx * sx) AS m0
      |  FROM base b JOIN m USING (event_type) WHERE b.y IS NULL)
      |SELECT event_type, event_id, x,
      |  CAST((a0 - ((a0 % m0 + m0) % m0)) // m0 AS BIGINT) AS y_hat_milli
      |FROM nulls
      |ORDER BY event_id NULLS FIRST""".stripMargin

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "imp4_regression_impute" -> (regressionImpute _),
    "ev18_cusum_changepoint" -> (cusumChangepoint _),
    "ev15_trend_fit" -> (trendFit _),
    "ev16_funnel" -> (funnel _),
    "qt1_exact_quantiles" -> (exactQuantiles _),
    "qt2_weighted_quantiles" -> (weightedQuantiles _))

  def oracle: Map[String, String] = Map(
    "imp4_regression_impute" -> regressionImputeSql,
    "ev18_cusum_changepoint" -> cusumChangepointSql,
    "ev15_trend_fit" -> trendFitSql,
    "ev16_funnel" -> funnelSql,
    "qt1_exact_quantiles" -> exactQuantilesSql,
    "qt2_weighted_quantiles" -> weightedQuantilesSql)
}
