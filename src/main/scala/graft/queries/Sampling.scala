package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deterministic sampling for training-data pipelines: hash-gated
  * stratified sampling plus train/test split assignment. Both decisions
  * derive from md5 of the row key — the one hash both engines spell
  * identically — so the same row is sampled into the same split on every
  * run, on every engine, regardless of partitioning or cluster size.
  * That reproducibility is the property `df.sample()` (seeded per
  * partition, repartition-sensitive) cannot give at scale, and it is
  * what makes downstream ablations comparable across pipeline runs.
  *
  * Mechanics: the first two hex chars of `md5(tag || doc_id)` are a
  * uniform draw from 256 buckets; a lexicographic compare against a
  * per-stratum hex threshold implements P(keep) = threshold/256
  * (hex strings compare identically to their numeric value — same trick
  * as the MinHash string-min). Sampling and split use different tags so
  * the two decisions are independent.
  *
  * Scale posture: pure map-side filter + projection — no shuffle at all
  * until the gate sort (which real pipelines don't run); the sampled
  * fraction streams straight into whatever consumes it.
  */
object Sampling extends QueryModule {

  /** P(keep) per stratum in 1/256 units, as two-hex-char thresholds:
    * en is downsampled to 64/256, everything else kept at 128/256.
    */
  private val EnThreshold = "40"
  private val DefaultThreshold = "80"

  /** Test-split fraction: 13/256 ≈ 5%. */
  private val TestThreshold = "0d"

  private def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .filter(
        substring(md5(concat(lit("smp:"), col("doc_id"))), 1, 2) <
          when(col("lang") === "en", lit(EnThreshold)).otherwise(lit(DefaultThreshold)))
      .select(
        col("doc_id"), col("lang"),
        when(substring(md5(concat(lit("split:"), col("doc_id"))), 1, 2) < lit(TestThreshold),
          lit("test")).otherwise(lit("train")).as("split"))
      .orderBy(col("doc_id").asc_nulls_first)

  private val stratifiedSampleSql =
    s"""SELECT doc_id, lang,
       |  CASE WHEN substr(md5('split:' || doc_id), 1, 2) < '$TestThreshold'
       |       THEN 'test' ELSE 'train' END AS split
       |FROM documents
       |WHERE substr(md5('smp:' || doc_id), 1, 2) <
       |  CASE WHEN lang = 'en' THEN '$EnThreshold' ELSE '$DefaultThreshold' END
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- ds12
  /** JOIN-CONSISTENT sampling — the multi-table property ds1's per-row
    * hash gate cannot give: sampling orders and lineitems
    * INDEPENDENTLY at rate p keeps only p² of the joined pairs and
    * biases every per-order statistic computed from the sample.
    * Keying BOTH tables' admission on the same hash of the JOIN KEY
    * (md5 of o_orderkey / l_orderkey, one threshold) makes the two
    * samples co-admit entire order groups, so
    * sample(orders) ⋈ sample(lineitem) ≡ sample(orders ⋈ lineitem) —
    * the universe-sampling identity (Σ-consistent sampling; what
    * BlinkDB-style engines call a key universe). The entry audits the
    * identity it claims: the per-priority census over the joined
    * sample carries orders whose EVERY lineitem survived
    * (complete_orders = orders, a vacuous-looking equality that an
    * independent per-row sample visibly breaks), and the oracle
    * recomputes the same census from the raw join under the same key
    * gate.
    *
    * Scale posture: the gate is a per-row codegen predicate pushed at
    * both scans — no shuffle added, the join keeps its key
    * partitioning, and the sampled fraction (~1/8) flows through the
    * same broadcast/shuffle plan the full join would use.
    */
  private val JoinSampleThreshold = "20" // 32/256 = 12.5% of the key universe

  private def consistentSample(s: SparkSession, dir: String): DataFrame = {
    def admit(key: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      substring(md5(concat(lit("u:"), key.cast("string"))), 1, 2) <
        lit(JoinSampleThreshold)
    val o = Tables(s, dir, "orders").filter(admit(col("o_orderkey")))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val li = Tables(s, dir, "lineitem").filter(admit(col("l_orderkey")))
      .select(col("l_orderkey").as("o_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_c"))
    val perOrder = o.join(li, Seq("o_orderkey"), "left")
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(count(col("price_c")).as("n_lines"), // 0 for lineitem-less orders
        coalesce(sum(col("price_c")), lit(0L)).as("order_price_c"))
    // the audit half: admitted orders' sampled line counts vs their
    // FULL-table line counts — the identity makes every order complete
    // (computed on both engines, not asserted; an independent per-row
    // sample visibly breaks it — ConsistentSampleSpec's control). The
    // full-count side re-reads lineitem: audit cost, not production
    // cost — the identity itself adds only the scan predicate.
    val fullCnt = Tables(s, dir, "lineitem")
      .groupBy(col("l_orderkey").as("o_orderkey"))
      .agg(count(lit(1)).as("full_lines"))
    perOrder.join(fullCnt, Seq("o_orderkey"), "left")
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("n_lines")).as("n_lines"),
        sum(col("order_price_c")).as("sum_price_c"),
        sum(when(col("n_lines") =!= coalesce(col("full_lines"), lit(0L)), 1L)
          .otherwise(0L)).as("n_incomplete_orders"))
      .orderBy(col("o_orderpriority").asc_nulls_first)
  }

  private val consistentSampleSql =
    s"""WITH o AS (
       |  SELECT o_orderkey, o_orderpriority FROM orders
       |  WHERE substr(md5('u:' || CAST(o_orderkey AS VARCHAR)), 1, 2) < '$JoinSampleThreshold'),
       |li AS (
       |  SELECT l_orderkey AS o_orderkey,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
       |  FROM lineitem
       |  WHERE substr(md5('u:' || CAST(l_orderkey AS VARCHAR)), 1, 2) < '$JoinSampleThreshold'),
       |per_order AS (
       |  SELECT o.o_orderkey, o.o_orderpriority,
       |    CAST(COUNT(li.price_c) AS BIGINT) AS n_lines,
       |    CAST(COALESCE(SUM(li.price_c), 0) AS BIGINT) AS order_price_c
       |  FROM o LEFT JOIN li USING (o_orderkey)
       |  GROUP BY o.o_orderkey, o.o_orderpriority),
       |full_cnt AS (
       |  SELECT l_orderkey AS o_orderkey, CAST(COUNT(*) AS BIGINT) AS full_lines
       |  FROM lineitem GROUP BY l_orderkey)
       |SELECT o_orderpriority,
       |  CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       |  CAST(SUM(order_price_c) AS BIGINT) AS sum_price_c,
       |  CAST(SUM(CASE WHEN n_lines <> COALESCE(full_lines, 0) THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_incomplete_orders
       |FROM per_order LEFT JOIN full_cnt USING (o_orderkey)
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- ds11
  /** Temporal train/val/test split with a leakage audit — the OTHER split
    * axis a training pipeline needs beside ds1's hash split: evaluation
    * data must come from time STRICTLY AFTER training data (fresh-data
    * holdout; forecasting and recommendation evals are meaningless
    * otherwise). Boundaries are the 80% / 90% points of the observed
    * [min, max] event-time span, computed in exact epoch-microsecond
    * integer arithmetic (`mn + (mx-mn)*8 DIV 10` — non-negative operands,
    * so Spark DIV and DuckDB // agree) and attached as a broadcast 1-row
    * scalar, never a driver round-trip.
    *
    * The audit column is the one that catches real bugs: per split, how
    * many of its users ALSO appear in the test window (`test_overlap
    * _users`). A user-level-leakage-free protocol (user holdout) would
    * need that to be 0 for train; the time split deliberately shares
    * users across windows, and the entry MEASURES it instead of assuming
    * — ds6 is the companion that splits along dup-cluster boundaries.
    *
    * Scale posture: one min/max agg (6-byte exchange), map-side labeling,
    * one 3-group aggregate, and a distinct-(split,user) frame semi-joined
    * against test users — all key-partitioned exchanges that carry
    * partial-aggregated rows only; nothing global but the 3-row sort.
    */
  private def timeSplit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val labeled = ev.crossJoin(broadcast(bounds))
      .withColumn("split",
        // DIV, not `/`: the Column `/` operator is double division; the
        // boundary must stay an exact integer microsecond on both engines
        when(col("us") < expr("mn + (mx - mn) * 8 DIV 10"), lit("train"))
          .when(col("us") < expr("mn + (mx - mn) * 9 DIV 10"), lit("val"))
          .otherwise(lit("test")))
      .select(col("split"), col("user_id"), col("us"))
    val perSplit = labeled.groupBy(col("split")).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      min(col("us")).as("min_us"),
      max(col("us")).as("max_us"))
    val splitUsers = labeled.select(col("split"), col("user_id")).distinct()
    val testUsers = splitUsers.filter(col("split") === "test").select(col("user_id"))
    val overlap = splitUsers
      .join(testUsers, Seq("user_id"), "left_semi")
      .groupBy(col("split")).agg(countDistinct(col("user_id")).as("test_overlap_users"))
    perSplit.join(overlap, Seq("split"), "left")
      .select(col("split"), col("n_events"), col("n_users"), col("min_us"),
        col("max_us"), coalesce(col("test_overlap_users"), lit(0L)).as("test_overlap_users"))
      .orderBy(col("split").asc_nulls_first)
  }

  private val timeSplitSql =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |lab AS (
      |  SELECT user_id, us,
      |    CASE WHEN us < mn + (mx - mn) * 8 // 10 THEN 'train'
      |         WHEN us < mn + (mx - mn) * 9 // 10 THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM ev, b),
      |tu AS (SELECT DISTINCT user_id FROM lab WHERE split = 'test'),
      |agg AS (
      |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |    MIN(us) AS min_us, MAX(us) AS max_us
      |  FROM lab GROUP BY split),
      |lk AS (
      |  SELECT split, CAST(COUNT(DISTINCT su.user_id) AS BIGINT) AS test_overlap_users
      |  FROM (SELECT DISTINCT split, user_id FROM lab) su
      |  JOIN tu USING (user_id) GROUP BY split)
      |SELECT agg.split, n_events, n_users, min_us, max_us,
      |  CAST(COALESCE(lk.test_overlap_users, 0) AS BIGINT) AS test_overlap_users
      |FROM agg LEFT JOIN lk ON agg.split = lk.split
      |ORDER BY agg.split NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds2
  /** Exactly-K-per-stratum sampling (ds1 keeps a *fraction*; evaluation
    * sets want a fixed COUNT): the K smallest md5 keys per lang via the
    * bounded BottomKAgg — ObjectHashAggregate with map-side partials,
    * so each task forwards at most K rows per stratum and the exchange
    * never sees the corpus, where the `row_number() OVER (PARTITION BY
    * lang ORDER BY md5)` spelling (= the oracle) shuffles every row.
    */
  private val SampleK = 10

  private def topkSample(s: SparkSession, dir: String): DataFrame = {
    val bottomK = udaf(new graft.functions.BottomKAgg(SampleK))
    Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        md5(concat(lit("smpk:"), col("doc_id"))).as("k"))
      .groupBy("lang")
      .agg(bottomK(col("k"), col("doc_id")).as("hits"))
      .select(col("lang"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(
        col("lang"),
        (col("pos") + 1).cast("long").as("rank"),
        col("hit.id").as("doc_id"),
        col("hit.key").as("sort_key"))
      .orderBy(col("lang").asc_nulls_first, col("rank").asc_nulls_first)
  }

  private val topkSampleSql =
    s"""WITH keyed AS (
       |  SELECT lang, doc_id, md5('smpk:' || doc_id) AS k FROM documents),
       |ranked AS (
       |  SELECT lang, doc_id, k,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY k NULLS FIRST, doc_id NULLS FIRST) AS rank
       |  FROM keyed)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, k AS sort_key
       |FROM ranked WHERE rank <= $SampleK
       |ORDER BY lang NULLS FIRST, rank NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds3
  /** Weight-proportional Bernoulli sampling: P(keep) ∝ document length
    * (the standard quality/length-weighted downsampling move), still
    * fully deterministic and partitioning-independent. The uniform draw
    * is the first 8 md5 hex chars; the per-row acceptance threshold is
    * the weight scaled into the same 32-bit space and rendered as a
    * zero-padded lowercase hex string, so one lexicographic compare
    * implements P(keep) = min(n_chars, cap)/cap in pure integer/string
    * math both engines evaluate bit-identically (no float RNG anywhere).
    * Map-side filter only — same zero-shuffle posture as ds1. Rows with
    * n_chars at/over the cap keep P = (2^32−1)/2^32 (one draw in 4
    * billion lost — documented, irrelevant, and identical across
    * engines). w_ppm is emitted for observability/audit.
    */
  // Shared with the composed curation pass (Text.curationV2) so the
  // sampling stage cannot drift from ds3 (review r06: the constants
  // were previously copied there).
  private[queries] val WeightCap = 512L // chars at which P(keep) saturates

  /** Weight scaled into 32-bit draw space, capped at 2^32−1. */
  private[queries] def weightThreshold(nChars: org.apache.spark.sql.Column) =
    least(least(nChars, lit(WeightCap)) * lit(4294967296L / WeightCap),
      lit(4294967295L))

  /** The keep decision: md5 draw (first 8 hex chars, tagged) compared
    * against the hex-rendered threshold.
    */
  private[queries] def weightGate(
      docId: org.apache.spark.sql.Column, nChars: org.apache.spark.sql.Column,
      tag: String) =
    substring(md5(concat(lit(tag), docId)), 1, 8) <
      lower(lpad(hex(weightThreshold(nChars)), 8, "0"))

  /** DuckDB twins of [[weightThreshold]] / [[weightGate]]. */
  private[queries] def weightThresholdSql(nCharsCol: String): String =
    s"least(least($nCharsCol, $WeightCap) * ${4294967296L / WeightCap}, 4294967295)"
  private[queries] def weightGateSql(docIdCol: String, nCharsCol: String, tag: String): String =
    s"substr(md5('$tag' || $docIdCol), 1, 8) < " +
      s"lower(lpad(hex(${weightThresholdSql(nCharsCol)}), 8, '0'))"

  private def weightedSample(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("thr", weightThreshold(col("n_chars")))
      .filter(weightGate(col("doc_id"), col("n_chars"), "wsmp:"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        expr("(thr * 1000000) DIV 4294967296").as("w_ppm")) // integer div, not `/`
      .orderBy(col("doc_id").asc_nulls_first)

  private val weightedSampleSql =
    s"""WITH thr AS (
       |  SELECT doc_id, lang, n_chars,
       |    ${weightThresholdSql("n_chars")} AS thr
       |  FROM documents)
       |SELECT doc_id, lang, n_chars,
       |  CAST(thr * 1000000 // 4294967296 AS BIGINT) AS w_ppm
       |FROM thr
       |WHERE ${weightGateSql("doc_id", "n_chars", "wsmp:")}
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds4
  /** Temperature resampling across languages — the multilingual data-mix
    * move: downsample each language toward the rarest one's scale with
    * P(keep | lang) = sqrt(n_min / n_lang) (temperature τ = 0.5 applied
    * to corpus shares; the rarest language keeps everything, a language
    * 4× the rarest keeps half). The per-language keep probability is
    * computed ONCE from the per-language counts (two tiny aggregates +
    * a broadcast back), rendered into the same 32-bit hex-threshold
    * space as ds3, and applied with the md5-draw gate — deterministic,
    * partitioning-independent, no float RNG. sqrt and one division are
    * single IEEE ops on exact integers, spelled identically in the
    * oracle, so the thresholds are bit-stable cross-engine.
    *
    * Output is the per-language census (total, kept, p_ppm) — the mix
    * report a data-mix pass is judged by.
    */
  private def temperatureResample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents").select("doc_id", "lang")
    val perLang = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val minLang = perLang.agg(min(col("n_lang")).as("n_min"))
    val thr = least(
      floor(lit(4294967296.0) *
        sqrt(col("n_min").cast("double") / col("n_lang").cast("double")))
        .cast("long"),
      lit(4294967295L))
    val gated = docs
      .join(broadcast(perLang), Seq("lang"))
      .join(broadcast(minLang))
      .withColumn("thr", thr)
      .withColumn("kept",
        substring(md5(concat(lit("tsmp:"), col("doc_id"))), 1, 8) <
          lower(lpad(hex(col("thr")), 8, "0")))
    gated.groupBy("lang")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        first(expr("(thr * 1000000) DIV 4294967296")).as("p_ppm"))
      .orderBy(col("lang").asc_nulls_first)
  }

  private val temperatureResampleSql =
    """WITH perlang AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
      |  FROM documents GROUP BY lang),
      |m AS (SELECT CAST(MIN(n_lang) AS BIGINT) AS n_min FROM perlang),
      |thr AS (
      |  SELECT lang, n_lang,
      |    LEAST(CAST(floor(4294967296.0 *
      |      sqrt(CAST(n_min AS DOUBLE) / CAST(n_lang AS DOUBLE))) AS BIGINT),
      |      4294967295) AS thr
      |  FROM perlang, m),
      |gated AS (
      |  SELECT d.lang, t.thr,
      |    substr(md5('tsmp:' || d.doc_id), 1, 8)
      |      < lower(lpad(hex(t.thr), 8, '0')) AS kept
      |  FROM documents d JOIN thr t ON d.lang = t.lang)
      |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
      |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(ANY_VALUE(thr * 1000000 // 4294967296) AS BIGINT) AS p_ppm
      |FROM gated GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds5
  /** Token-budget data mixing — the step that turns a curated corpus
    * into a training MIX: each source gets a token budget proportional
    * to its mixture weight, and documents are admitted per source in
    * deterministic hash priority order until the budget is spent (the
    * straddling document is admitted, the standard convention). Weights
    * here derive from the source id (`srcN` → N % 4 + 1, so the domain
    * is covered with no default case and budgets stay non-degenerate at
    * every SF); the overall budget is one third of the corpus token
    * mass; tokens are the `n_chars DIV 4` proxy (integer — the exact
    * tokenizer is tx1's job, the mixing math is this entry's). All
    * arithmetic is integral, so budgets and cuts are bit-stable
    * cross-engine.
    *
    * Scale posture: two scalar broadcasts (corpus total, weight sum
    * over the distinct-source table) + ONE shuffle on source for the
    * per-source ordered prefix sum. A pathologically hot source makes
    * that window serial — the w5 hierarchical chunked-prefix-sum
    * technique is the drop-in unbounded alternative; budgets
    * themselves never need the data sorted globally.
    */
  private def tokenBudgetMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        greatest(lit(1L), expr("n_chars DIV 4")).as("tok"),
        md5(concat(lit("mix:"), col("doc_id"))).as("k"))
      .withColumn("w", expr("CAST(substr(source, 4) AS BIGINT) % 4 + 1"))
    val total = docs.agg(sum(col("tok")).as("corpus_tok"))
    val wsum = docs.select("source", "w").distinct()
      .agg(sum(col("w")).as("wsum"))
    val win = Window.partitionBy("source")
      .orderBy(col("k").asc_nulls_first, col("doc_id").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(broadcast(total)).join(broadcast(wsum))
      .withColumn("budget_tok", expr("(corpus_tok DIV 3) * w DIV wsum"))
      .withColumn("cum_tok", sum(col("tok")).over(win))
      .filter(col("cum_tok") - col("tok") < col("budget_tok"))
      .select("doc_id", "source", "tok", "cum_tok", "budget_tok")
      .orderBy(col("source").asc_nulls_first, col("cum_tok").asc_nulls_first,
        col("doc_id").asc_nulls_first)
  }

  private val tokenBudgetMixSql =
    """WITH docs AS (
      |  SELECT doc_id, source,
      |    GREATEST(1, n_chars // 4) AS tok,
      |    md5('mix:' || doc_id) AS k,
      |    CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS w
      |  FROM documents),
      |t AS (SELECT SUM(tok) AS corpus_tok FROM docs),
      |ws AS (SELECT SUM(w) AS wsum FROM (SELECT DISTINCT source, w FROM docs)),
      |c AS (
      |  SELECT d.doc_id, d.source, d.tok,
      |    (t.corpus_tok // 3) * d.w // ws.wsum AS budget_tok,
      |    SUM(d.tok) OVER (PARTITION BY d.source
      |      ORDER BY d.k NULLS FIRST, d.doc_id NULLS FIRST
      |      ROWS UNBOUNDED PRECEDING) AS cum_tok
      |  FROM docs d, t, ws)
      |SELECT doc_id, source, CAST(tok AS BIGINT) AS tok,
      |  CAST(cum_tok AS BIGINT) AS cum_tok, CAST(budget_tok AS BIGINT) AS budget_tok
      |FROM c WHERE cum_tok - tok < budget_tok
      |ORDER BY source NULLS FIRST, cum_tok NULLS FIRST, doc_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds7
  /** Deterministic interleaved epoch ordering + shard assignment — the
    * "write the training order" step: every doc gets a reproducible
    * position in the epoch and a shard file number. Per-source order is
    * an md5 permutation (repartition-independent, the ds1 rule); the
    * global order interleaves sources by per-source rank — every source's
    * rank-1 docs come before any source's rank-2 docs — so a training
    * run reading shards in order sees all sources uniformly mixed from
    * the first batch instead of source-sized runs.
    *
    * Scale posture: the serial spelling of "global position" is one
    * total-order row_number — a single-task sort. This entry computes it
    * HIERARCHICALLY (w5's pattern): rank within the (small, bounded)
    * per-rank wave + broadcast cumulative wave offsets, so no task ever
    * sees more than a wave and the only full exchanges are the two
    * waves/source window shuffles. The oracle executes the serial
    * row_number spelling literally — the gate hash-proves
    * hierarchical ≡ serial.
    */
  private val NShards = 64

  private def interleaveShards(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val keyed = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("ord:"), col("doc_id"))).as("okey"))
    val bySrc = Window.partitionBy("source")
      .orderBy(col("okey").asc_nulls_first, col("doc_id").asc_nulls_first)
    val ranked = keyed
      .withColumn("src_rank", row_number().over(bySrc).cast(LongType))
    val byWave = Window.partitionBy("src_rank")
      .orderBy(col("okey").asc_nulls_first, col("doc_id").asc_nulls_first)
    val offsets = ranked.groupBy("src_rank").agg(count(lit(1)).as("wave_n"))
      .withColumn("wave_off",
        coalesce(sum(col("wave_n")).over(Window
          .orderBy(col("src_rank").asc)
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("src_rank").as("off_rank"), col("wave_off"))
    ranked
      .withColumn("wave_pos", row_number().over(byWave).cast(LongType))
      .join(broadcast(offsets), col("src_rank") === col("off_rank"))
      .select(col("doc_id"), col("source"), col("src_rank"),
        (col("wave_off") + col("wave_pos")).as("global_pos"),
        ((col("wave_off") + col("wave_pos") - 1) % NShards).as("shard"))
      .orderBy(col("doc_id").asc_nulls_first)
  }

  private val interleaveShardsSql =
    s"""WITH keyed AS (
       |  SELECT doc_id, source, md5('ord:' || doc_id) AS okey FROM documents),
       |ranked AS (
       |  SELECT doc_id, source, okey,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY okey NULLS FIRST, doc_id NULLS FIRST) AS BIGINT) AS src_rank
       |  FROM keyed),
       |pos AS (
       |  SELECT doc_id, source, src_rank,
       |    CAST(row_number() OVER (ORDER BY src_rank,
       |      okey NULLS FIRST, doc_id NULLS FIRST) AS BIGINT) AS global_pos
       |  FROM ranked)
       |SELECT doc_id, source, src_rank, global_pos,
       |  CAST((global_pos - 1) % $NShards AS BIGINT) AS shard
       |FROM pos
       |ORDER BY doc_id NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds8
  /** Class-balance downsampling: equalize every language to the
    * MINORITY class's size — the companion to ds4's temperature
    * softening (τ→∞ flattens the mix; this is the hard τ=∞ endpoint a
    * classifier-training set wants). The per-language quota is the min
    * group count, computed in-plan (two tiny aggregates, broadcast back
    * — never a driver-side collect), and admission within a language is
    * by the ds3-style tagged md5 draw, so membership is a pure function
    * of (doc_id, corpus) — partitioning- and engine-independent.
    *
    * Scale posture: one shuffle on lang for the rank window; the quota
    * side is a #langs-row frame cross-joined broadcast. ds2's bounded
    * BottomKAgg is the no-window alternative when the quota is a
    * compile-time constant; here k is data-dependent, which is exactly
    * when the window spelling earns its sort.
    */
  private def balanceDownsample(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(s, dir, "documents")
      .select(col("lang"), col("doc_id"),
        md5(concat(lit("bal:"), col("doc_id"))).as("draw"))
    val quota = docs.groupBy("lang").agg(count(lit(1)).as("n"))
      .agg(min(col("n")).as("n_min"))
    val w = Window.partitionBy("lang")
      .orderBy(col("draw").asc_nulls_first, col("doc_id").asc_nulls_first)
    docs
      .withColumn("bal_rank", row_number().over(w).cast("long"))
      .crossJoin(broadcast(quota))
      .filter(col("bal_rank") <= col("n_min"))
      .select(col("lang"), col("doc_id"), col("bal_rank"))
      .orderBy(col("lang").asc_nulls_first, col("bal_rank").asc_nulls_first)
  }

  private val balanceDownsampleSql =
    """WITH keyed AS (
      |  SELECT lang, doc_id, md5('bal:' || doc_id) AS draw FROM documents),
      |quota AS (
      |  SELECT CAST(MIN(n) AS BIGINT) AS n_min FROM (
      |    SELECT lang, COUNT(*) AS n FROM keyed GROUP BY lang)),
      |ranked AS (
      |  SELECT lang, doc_id,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY draw NULLS FIRST, doc_id NULLS FIRST) AS BIGINT) AS bal_rank
      |  FROM keyed)
      |SELECT lang, doc_id, bal_rank
      |FROM ranked, quota WHERE bal_rank <= n_min
      |ORDER BY lang NULLS FIRST, bal_rank NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ds9
  /** Histogram-matching resampler — reshape the corpus length
    * distribution toward a TARGET histogram (uniform over 10 fixed-width
    * buckets here; any target column works) by per-bucket Bernoulli
    * acceptance: accept(b) = min(1, target_b / n_b), the importance-
    * sampling move behind "flatten the length distribution before
    * packing" and domain-mix reshaping. Acceptance rates are computed
    * from ONE tiny bucket census (≤10 rows, broadcast back), rendered
    * into ds3's 32-bit hex-threshold space, and applied with the
    * tagged-md5 draw — deterministic, partitioning-independent,
    * membership a pure function of doc_id. The threshold product runs
    * in DECIMAL(38,0)/HUGEINT so a 10^12-row bucket census cannot
    * overflow. Map-side gate; the only exchanges carry bucket-count
    * rows.
    */
  private def distMatch(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), expr("least(9, n_chars DIV 60)").as("bucket"))
    val counts = d.groupBy("bucket").agg(count(lit(1)).as("n_b"))
    val target = counts.agg(expr("CAST(sum(n_b) AS BIGINT) DIV 10").as("t"))
    val thr = counts.join(broadcast(target))
      .select(col("bucket"), col("n_b"),
        expr("CAST(least((CAST(t AS DECIMAL(38,0)) * 4294967296) DIV n_b," +
          " 4294967295) AS BIGINT)").as("thr"))
    d.join(broadcast(thr), Seq("bucket"))
      .groupBy("bucket", "n_b", "thr")
      .agg(sum(when(substring(md5(concat(lit("dmatch:"), col("doc_id"))), 1, 8) <
          lower(lpad(hex(col("thr")), 8, "0")), 1L).otherwise(0L)).as("n_kept"))
      .select(col("bucket"), col("n_b").as("n_docs"),
        expr("(thr * 1000000) DIV 4294967296").as("accept_ppm"), col("n_kept"))
      .orderBy(col("bucket").asc_nulls_first)
  }

  private val distMatchSql =
    """WITH d AS (
      |  SELECT doc_id, least(9, n_chars // 60) AS bucket FROM documents),
      |counts AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_b FROM d GROUP BY bucket),
      |tgt AS (SELECT CAST(SUM(n_b) AS BIGINT) // 10 AS t FROM counts),
      |thr AS (
      |  SELECT bucket, n_b,
      |    CAST(least((CAST(t AS HUGEINT) * 4294967296) // n_b, 4294967295) AS BIGINT) AS thr
      |  FROM counts CROSS JOIN tgt)
      |SELECT d.bucket, n_b AS n_docs,
      |  CAST(thr * 1000000 // 4294967296 AS BIGINT) AS accept_ppm,
      |  CAST(SUM(CASE WHEN substr(md5('dmatch:' || doc_id), 1, 8) <
      |    lower(lpad(hex(thr), 8, '0')) THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM d JOIN thr USING (bucket)
      |GROUP BY d.bucket, n_b, thr
      |ORDER BY bucket NULLS FIRST""".stripMargin

  // --------------------------------------------------------------- ds10
  /** Deterministic A/B experiment assignment + sample-ratio-mismatch
    * audit — the experimentation-platform primitive: each USER hashes
    * into control/treatment by the first md5 hex nibble (tagged draw,
    * ds1's determinism contract — membership is a pure function of
    * (tag, user_id), independent of partitioning and rerun-stable), and
    * the census reports per-arm user/event/value totals plus the SRM
    * deviation of the user split from 50/50 in SIGNED floor ppm (the
    * pmod spelling, since dev is signed) with a >1% mismatch flag —
    * the guardrail every experiment readout checks first. Assignment is
    * map-side; the only exchanges carry user-grain then arm-grain rows.
    */
  private def abAssignment(s: SparkSession, dir: String): DataFrame = {
    val users = Tables(s, dir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("cents"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"), col("user_id"))), 1, 1) < "8",
          lit("control")).otherwise(lit("treatment")))
    val arms = users.groupBy("arm")
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"),
        sum(col("cents")).as("sum_value_cents"))
    val tot = arms.agg(sum(col("n_users")).as("n_total"))
    arms.join(broadcast(tot))
      .withColumn("a0", expr("(2 * n_users - n_total) * 1000000"))
      .select(col("arm"), col("n_users"), col("n_events"), col("sum_value_cents"),
        expr("CAST((a0 - ((a0 % n_total + n_total) % n_total)) DIV n_total" +
          " AS BIGINT)").as("dev_ppm"),
        (abs(expr("(2 * n_users - n_total) * 1000000")) >= col("n_total") * 10000)
          .as("srm_flag"))
      .orderBy(col("arm").asc_nulls_first)
  }

  private val abAssignmentSql =
    """WITH users AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_ev,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
      |    CASE WHEN substr(md5('ab:' || user_id), 1, 1) < '8'
      |         THEN 'control' ELSE 'treatment' END AS arm
      |  FROM events GROUP BY user_id),
      |arms AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
      |    CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |    CAST(SUM(cents) AS BIGINT) AS sum_value_cents
      |  FROM users GROUP BY arm),
      |tot AS (SELECT CAST(SUM(n_users) AS BIGINT) AS n_total FROM arms)
      |SELECT arm, n_users, n_events, sum_value_cents,
      |  CAST((((2 * n_users - n_total) * 1000000)
      |    - ((((2 * n_users - n_total) * 1000000) % n_total + n_total) % n_total))
      |    // n_total AS BIGINT) AS dev_ppm,
      |  abs((2 * n_users - n_total) * 1000000) >= n_total * 10000 AS srm_flag
      |FROM arms CROSS JOIN tot
      |ORDER BY arm NULLS FIRST""".stripMargin

  override val defs: Map[String, (SparkSession, String) => DataFrame] =
    Map(
      "ds10_ab_assignment" -> (abAssignment _),
      "ds9_dist_match" -> (distMatch _),
      "ds8_balance_downsample" -> (balanceDownsample _),
      "ds7_interleave_shards" -> (interleaveShards _),
      "ds5_token_budget_mix" -> (tokenBudgetMix _),
      "ds1_stratified_sample" -> (stratifiedSample _),
      "ds12_consistent_sample" -> (consistentSample _),
      "ds11_time_split" -> (timeSplit _),
      "ds2_topk_sample" -> (topkSample _),
      "ds3_weighted_sample" -> (weightedSample _),
      "ds4_temperature_resample" -> (temperatureResample _))

  override val oracle: Map[String, String] =
    Map(
      // serial total-order spelling — hash-proves hierarchical ≡ serial
      "ds10_ab_assignment" -> abAssignmentSql,
      "ds9_dist_match" -> distMatchSql,
      "ds8_balance_downsample" -> balanceDownsampleSql,
      "ds7_interleave_shards" -> interleaveShardsSql,
      "ds5_token_budget_mix" -> tokenBudgetMixSql,
      "ds1_stratified_sample" -> stratifiedSampleSql,
      "ds12_consistent_sample" -> consistentSampleSql,
      "ds11_time_split" -> timeSplitSql,
      "ds2_topk_sample" -> topkSampleSql,
      "ds3_weighted_sample" -> weightedSampleSql,
      "ds4_temperature_resample" -> temperatureResampleSql)
}
