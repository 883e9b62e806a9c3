package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TopKAgg

/** Lexical-retrieval operators over `documents`: BM25 ranked top-k
  * retrieval (ir1) and inverted-index construction with impact-ordered
  * posting prefixes (ir2) — the sparse-retrieval half of a training-data
  * curation stack (hard-negative mining, query-based corpus probes,
  * contamination lookups) next to the dense ANN family in
  * [[Similarity]].
  *
  * Cross-engine exactness: BM25's `ln`-idf is NOT bit-stable across
  * libm implementations, so both scoring factors are integer-exact
  * rational surrogates (monotone in the same variables, floor-divided):
  *   idf_milli(t)  = (1000·(2N − 2df + 1)) DIV (2df + 1)     — the
  *     argument of the BM25+ log, scaled; preserves the df ordering.
  *   tf_milli(t,d) = (44000·A·tf) DIV (20·A·tf + 6·A + 18·dl) — exactly
  *     tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)) with k1 = 1.2, b = 0.75
  *     cleared to integers (×20·A), avgdl floored to A = S DIV N.
  * Every intermediate fits BIGINT at any plausible scale (A and tf are
  * bounded by document length, N ≤ 10^12 keeps the idf numerator under
  * 2·10^18); no doubles anywhere.
  *
  * Scale posture: the token stream is filtered to the query vocabulary
  * BEFORE the tf aggregate (broadcast semi-join, so the shuffle carries
  * only matching-term rows); document frequency and corpus stats are
  * tiny broadcast aggregates; per-query top-k is the bounded
  * [[TopKAgg]] buffer (k rows per group per partition reach the
  * exchange — no window over all scored rows). The ir2 index is one
  * `GROUP BY term` with map-side partial aggregation; posting lists are
  * impact-ordered PREFIXES via the same bounded top-k, never a
  * collect_list of full postings.
  */
object Retrieval extends QueryModule {

  // per-row tokenize over every document: the compute-bound case the
  // spread loader exists for (single-row-group testdata otherwise runs
  // the whole pipeline in one task)
  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.wide(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))

  /** Fixed benchmark query set — literal in both engines. */
  private val QuerySet: Seq[(Int, String)] = Seq(
    1 -> "join hash row",
    2 -> "customer order query",
    3 -> "scan filter table")

  /** The integer-exact BM25 contribution (term, doc_id, c) over the
    * corpus restricted to a broadcastable vocabulary — the ONE scoring
    * definition shared by ir1 (plain retrieval), ir4's lexical tower
    * and both of ir5's passes, so the surrogate can never drift between
    * entries (RetrievalSpec's ir1-vs-ir5 rerank comparison assumes it).
    */
  /** The corpus-level BM25 constants (avg doc length, doc count) — one
    * full scan+tokenize+sum pass. Split out (r19 opt) so a TWO-pass
    * consumer (ir5's PRF) can compute it once and hand the persisted
    * 1-row frame to both bm25Contrib calls instead of paying the
    * corpus pass per call; single-pass consumers (ir1/ir4) keep the
    * default.
    */
  private def bm25Stats(d: DataFrame): DataFrame = d.agg(
    expr("CAST(sum(size(w)) AS BIGINT) DIV count(*)").as("a"),
    count(lit(1)).as("n"))

  private def bm25Contrib(d: DataFrame, terms: DataFrame,
      sharedStats: Option[DataFrame] = None): DataFrame = {
    val stats = sharedStats.getOrElse(bm25Stats(d))
    // tf feeds TWO consumers — the broadcast df aggregate below and the
    // scoring join — and a broadcast exchange executes its child
    // independently, so without materialization the full
    // explode-probe-aggregate corpus pass runs TWICE per bm25Contrib
    // call (r18 opt: ir5 paid it four times across its two passes).
    // The frame is vocabulary-filtered — a few rows per matching doc —
    // so persisting it is bounded by |vocab|·|matching docs|, never the
    // corpus (the guide §2.4 shared-exchange posture).
    // Lifecycle (ADVICE r18): the cache is NOT unpersisted here — the
    // returned frame is lazy, so there is no in-function point after
    // materialization. Bounded-memory across calls relies on the
    // harness sweep (Bench.sweepState / Verify's clearCache between
    // entries); a long-lived non-bench caller composing many
    // bm25Contrib frames must sweep the SQL cache itself or the
    // per-call tf caches accumulate for the session.
    val tf = d
      .select(col("doc_id"), size(col("w")).cast("long").as("dl"), explode(col("w")).as("term"))
      .join(broadcast(terms), Seq("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), Seq("term"))
      .join(broadcast(stats))
      .select(col("term"), col("doc_id"),
        (expr("(1000 * (2*n - 2*df + 1)) DIV (2*df + 1)") *
          expr("(44000 * a * tf) DIV (20*a*tf + 6*a + 18*dl)")).as("c"))
  }

  // ---------------------------------------------------------------- ir1
  private def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val qterms = s.createDataFrame(QuerySet).toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    val contrib = bm25Contrib(d, qterms.select("term").distinct())
    val topk = udaf(new TopKAgg(10))
    contrib
      .join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("doc_id")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").as("score"))
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  private val bm25TopKSql = {
    val values = QuerySet.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $values),
       |docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |stats AS (SELECT CAST(SUM(len(w)) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS a,
       |                 CAST(COUNT(*) AS BIGINT) AS n FROM docs),
       |qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term FROM q),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |tf AS (
       |  SELECT t.term, doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    CAST(len(list_filter(w, x -> x = t.term)) AS BIGINT) AS tf
       |  FROM docs CROSS JOIN terms t
       |  WHERE list_contains(w, t.term)),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT f.term, f.doc_id,
       |    ((1000 * (2*s.n - 2*d.df + 1)) // (2*d.df + 1)) *
       |    ((44000 * s.a * f.tf) // (20*s.a*f.tf + 6*s.a + 18*f.dl)) AS c
       |  FROM tf f JOIN dfreq d USING (term) CROSS JOIN stats s),
       |scored AS (
       |  SELECT qt.query_id, c.doc_id, CAST(SUM(c.c) AS BIGINT) AS score
       |  FROM contrib c JOIN qterms qt USING (term)
       |  GROUP BY qt.query_id, c.doc_id),
       |ranked AS (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT query_id, rank, doc_id, score FROM ranked WHERE rank <= 10
       |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  // ---------------------------------------------------------------- ir2
  /** Inverted-index build: per term, document frequency, total term
    * frequency, and the first 10 postings in IMPACT order (tf desc,
    * doc_id asc — the order a WAND/top-k evaluator consumes) as a
    * comma-joined string. The prefix is a bounded top-k aggregate, so
    * the full posting list for a stop-word-frequency term never
    * materializes in one place; a production sink would write posting
    * SEGMENTS per (term, shard) the same way.
    */
  private def postings(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKAgg(10))
    docs(s, dir)
      .select(col("doc_id"), explode(col("w")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum(col("tf")).as("tf_total"),
        topk(col("tf"), col("doc_id")).as("hits"))
      .select(col("term"), col("df"), col("tf_total"),
        expr("concat_ws(',', transform(hits, h -> CAST(h.id AS STRING)))").as("postings10"))
      .orderBy(col("term").asc_nulls_first)
  }

  private val postingsSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (
      |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM toks WHERE term != '' GROUP BY term, doc_id),
      |ranked AS (
      |  SELECT term, doc_id, tf,
      |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
      |  FROM tf),
      |prefix AS (
      |  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY rn) AS postings10
      |  FROM ranked WHERE rn <= 10 GROUP BY term),
      |agg AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS tf_total
      |  FROM tf GROUP BY term)
      |SELECT a.term, a.df, a.tf_total, p.postings10
      |FROM agg a JOIN prefix p USING (term)
      |ORDER BY term NULLS FIRST""".stripMargin

  // ---------------------------------------------------------------- ir3
  /** Exact phrase retrieval over a POSITIONAL index — the third leg of
    * the retrieval family (ir1 scores bags of words, ir2 builds posting
    * prefixes; phrase queries need token POSITIONS): each phrase of k
    * terms is matched by k−1 equi-joins on (doc_id, adjusted position) —
    * exactly how a positional inverted index evaluates "w₁ w₂ … wₖ"
    * (posting-list intersection with offset alignment), never a regex
    * over raw text. The token stream is filtered to the phrase
    * vocabulary BEFORE any exchange (the ir1 posture), so the joins
    * carry only matching-term postings; the oracle states the same
    * matches as per-document array arithmetic — the hash proves the
    * distributed index-join plan ≡ the naive per-doc scan.
    */
  private val PhraseSet: Seq[(Int, String)] = Seq(
    1 -> "hash join",
    2 -> "value table",
    3 -> "key agg row")

  private def phraseMatch(s: SparkSession, dir: String): DataFrame = {
    val vocab = PhraseSet.flatMap(_._2.split(" ")).distinct
    // vocabulary prefilter; persisted because every phrase probes it
    // (k posting streams per phrase), same lifecycle as q15's shared
    // aggregate — Bench's sweep state reclaims it between entries
    val toks = docs(s, dir)
      .select(col("doc_id"), posexplode(col("w")).as(Seq("pos", "term")))
      .filter(col("term").isin(vocab: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perPhrase = PhraseSet.map { case (qid, phrase) =>
      val terms = phrase.split(" ")
      val first = toks.filter(col("term") === terms.head).select(col("doc_id"), col("pos"))
      val matched = terms.zipWithIndex.drop(1).foldLeft(first) { case (acc, (t, i)) =>
        acc.join(
          toks.filter(col("term") === t)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
      }
      matched.groupBy("doc_id").agg(count(lit(1)).as("n_matches"))
        .select(lit(qid).as("query_id"), col("doc_id"), col("n_matches"))
    }
    perPhrase.reduce(_ unionByName _)
      .orderBy(col("query_id").asc_nulls_first, col("doc_id").asc_nulls_first)
  }

  private val phraseMatchSql = {
    val qs = PhraseSet.map { case (qid, phrase) =>
      val terms = phrase.split(" ")
      val cond = terms.zipWithIndex
        .map { case (t, j) => s"w[i+${j + 1}] = '$t'" }.mkString(" AND ")
      s"""SELECT $qid AS query_id, doc_id,
         |  CAST(len(list_filter(range(0, len(w) - ${terms.length - 1}),
         |    i -> $cond)) AS BIGINT) AS n_matches
         |FROM docs""".stripMargin
    }
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
       |SELECT query_id, doc_id, n_matches
       |FROM (${qs.mkString("\n UNION ALL \n")})
       |WHERE n_matches > 0
       |ORDER BY query_id NULLS FIRST, doc_id NULLS FIRST""".stripMargin
  }

  // ---------------------------------------------------------------- ir4
  /** Hybrid retrieval with reciprocal-rank fusion — the tower-combiner
    * over ir1's sparse (BM25) and the dense (embedding dot-product)
    * rankers, query-by-example: for query docs 0–2, the LEXICAL tower
    * scores BM25 with the query doc's first 8 tokens as terms and the
    * DENSE tower scores the query doc's embedding against the corpus
    * (ann1's spelling); each tower's bounded top-10 then fuses by
    * RRF(k=60): fused(c) = Σ_towers 10⁶ DIV (60 + rank_t(c)) — the
    * standard hybrid-search combiner (hard-negative mining, near-dup
    * candidate generation, RAG retrieval), integer-exact so the oracle
    * restates both towers and the fusion literally.
    *
    * Scale posture: each tower keeps its own bounded-k shape (BM25's
    * vocabulary-prefiltered shuffle + TopKAgg; the dense tower's
    * broadcast query set + TopKAgg), and fusion touches only the ≤ 2k
    * rows per query the towers emitted — RRF adds NO corpus-scale work,
    * which is exactly why it is the production default over score
    * normalization (scores never cross towers, only ranks).
    */
  private val RrfQueryIds = Seq(0L, 1L, 2L)
  private val RrfK = 60

  private def hybridRrf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val topk = udaf(new TopKAgg(10))
    // -- lexical tower: BM25, query terms = first 8 tokens of the query doc
    val qterms = d.filter(col("doc_id").isin(RrfQueryIds: _*))
      .select(col("doc_id").as("query_id"), explode(slice(col("w"), 1, 8)).as("term"))
      .distinct()
    val contrib = bm25Contrib(d, qterms.select("term").distinct())
    val lex = contrib
      .join(broadcast(qterms), Seq("term"))
      .filter(col("doc_id") =!= col("query_id")) // query-by-example: not self
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("doc_id")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("hit.id").as("cand_id"))
    // -- dense tower: exact dot-product top-10 (ann1's spelling)
    val emb = Tables.wide(s, dir, "embeddings").select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * 1000).cast("long")).as("q"))
    val queries = emb.filter(col("vec_id").isin(RrfQueryIds: _*))
      .select(col("vec_id").as("query_id"), col("q").as("qv"))
    val den = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        graft.functions.VectorFunctions.longDot(col("qv"), col("q")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("neighbor_id")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"), col("hit.id").as("cand_id"))
    // -- RRF fusion over the two bounded lists
    val fusedTopk = udaf(new TopKAgg(10))
    lex.unionByName(den)
      .groupBy("query_id", "cand_id")
      .agg(sum(expr(s"1000000 DIV ($RrfK + rank)")).as("rrf_milli"))
      .groupBy("query_id")
      .agg(fusedTopk(col("rrf_milli"), col("cand_id")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("hit.id").as("cand_id"), col("hit.score").as("rrf_milli"))
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  private val hybridRrfSql = {
    val ids = RrfQueryIds.mkString(", ")
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |stats AS (SELECT CAST(SUM(len(w)) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS a,
       |                 CAST(COUNT(*) AS BIGINT) AS n FROM docs),
       |qterms AS (
       |  SELECT DISTINCT doc_id AS query_id, unnest(w[1:8]) AS term
       |  FROM docs WHERE doc_id IN ($ids)),
       |terms AS (SELECT DISTINCT term FROM qterms),
       |tf AS (
       |  SELECT t.term, doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    CAST(len(list_filter(w, x -> x = t.term)) AS BIGINT) AS tf
       |  FROM docs CROSS JOIN terms t
       |  WHERE list_contains(w, t.term)),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |contrib AS (
       |  SELECT f.term, f.doc_id,
       |    ((1000 * (2*s.n - 2*d.df + 1)) // (2*d.df + 1)) *
       |    ((44000 * s.a * f.tf) // (20*s.a*f.tf + 6*s.a + 18*f.dl)) AS c
       |  FROM tf f JOIN dfreq d USING (term) CROSS JOIN stats s),
       |lex_scored AS (
       |  SELECT qt.query_id, c.doc_id AS cand_id, CAST(SUM(c.c) AS BIGINT) AS score
       |  FROM contrib c JOIN qterms qt USING (term)
       |  WHERE c.doc_id <> qt.query_id
       |  GROUP BY qt.query_id, c.doc_id),
       |lex AS (
       |  SELECT query_id, cand_id, rank FROM (
       |    SELECT query_id, cand_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, cand_id) AS rank
       |    FROM lex_scored) WHERE rank <= 10),
       |emb AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
       |  FROM embeddings),
       |queries AS (SELECT vec_id AS query_id, q AS qv FROM emb WHERE vec_id IN ($ids)),
       |den_scored AS (
       |  SELECT query_id, e.vec_id AS cand_id,
       |    CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * e.q[i])) AS BIGINT) AS score
       |  FROM queries CROSS JOIN emb e
       |  WHERE e.vec_id <> query_id),
       |den AS (
       |  SELECT query_id, cand_id, rank FROM (
       |    SELECT query_id, cand_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY score DESC, cand_id) AS rank
       |    FROM den_scored) WHERE rank <= 10),
       |fused AS (
       |  SELECT query_id, cand_id,
       |    CAST(SUM(1000000 // ($RrfK + rank)) AS BIGINT) AS rrf_milli
       |  FROM (SELECT * FROM lex UNION ALL SELECT * FROM den)
       |  GROUP BY query_id, cand_id)
       |SELECT query_id, rank, cand_id, rrf_milli FROM (
       |  SELECT query_id, cand_id, rrf_milli,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY rrf_milli DESC, cand_id) AS rank
       |  FROM fused) WHERE rank <= 10
       |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  // ---------------------------------------------------------------- ir5
  /** Pseudo-relevance-feedback query expansion (Rocchio/RM-shaped): the
    * standard second-pass retriever — run the plain BM25 query, take
    * the top-F documents AS IF relevant, mine their most frequent
    * non-query terms as expansion terms, and re-score the corpus with
    * the expanded weighted query (original terms at weight 2, expansion
    * at weight 1 — the classic α:β ratio kept integral so the oracle
    * can restate scoring exactly). Recall-starved single-term queries
    * are the production use: mining hard negatives or contamination
    * candidates where the literal phrasing misses paraphrases.
    *
    * Scale posture — the PRF-inherent cost is exactly two
    * vocabulary-filtered corpus passes, and nothing else grows: pass 1
    * is ir1's shape (broadcast query vocabulary → filtered token
    * shuffle → bounded [[TopKAgg]](F)); the feedback set is F·|Q| ≤ 15
    * DOCUMENTS, so the expansion-term census (explode → count → window)
    * runs on a bounded frame — the only window in the family, and it
    * ranks a few hundred rows, never the corpus; pass 2 re-runs the
    * ir1 shape with the (still tiny, still broadcast) expanded
    * vocabulary and weighted sum. At 100 TB both passes are the same
    * filtered-shuffle plan ir1 already proved out.
    */
  private val PrfFeedbackK = 5
  private val PrfExpandM = 3

  private def prfExpansion(s: SparkSession, dir: String): DataFrame = {
    // NOT persisted (r18 opt, measured negative): caching the tokenized
    // frame for the five consumers (2× stats, 2× tf explode, feedback
    // mining) costs MORE than re-splitting — materializing ~130-element
    // string-array rows through block storage measured 3.5 → 4.2 s
    // steady, the same wide-payload-cache lesson as the r18 tx10
    // window-vs-aggregator negative. The scan+split is the cheap part;
    // the tf persist in bm25Contrib (narrow, vocabulary-filtered) is
    // where sharing pays.
    val d = docs(s, dir)
    val qterms = s.createDataFrame(QuerySet).toDF("query_id", "qtext")
      .select(col("query_id"), explode(split(col("qtext"), " ")).as("term"))
      .distinct()
    // r19 opt: the BM25 corpus constants are identical for both passes
    // (pure function of the corpus) — one persisted 1-row frame serves
    // pass 1 and pass 2 instead of each bm25Contrib call re-running the
    // full scan+tokenize+sum (the narrow-frame sharing posture; the
    // wide docs persist stays the measured negative above).
    val stats = bm25Stats(d).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // pass 1: plain BM25, keep the top-F feedback documents per query
    val topkF = udaf(new TopKAgg(PrfFeedbackK))
    val feedback = bm25Contrib(d, qterms.select("term").distinct(), Some(stats))
      .join(broadcast(qterms), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("c")).as("score"))
      .groupBy("query_id")
      .agg(topkF(col("score"), col("doc_id")).as("hits"))
      .select(col("query_id"), explode(col("hits")).as("hit"))
      .select(col("query_id"), col("hit.id").as("doc_id"))
    // expansion mining: term census over the bounded feedback set,
    // minus each query's own terms, top-M by (count desc, term asc)
    val expTerms = d.join(broadcast(feedback), Seq("doc_id"))
      .select(col("query_id"), explode(col("w")).as("term"))
      .groupBy("query_id", "term")
      .agg(count(lit(1)).as("cnt"))
      .join(qterms, Seq("query_id", "term"), "left_anti")
      .withColumn("rk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cnt").desc, col("term").asc)))
      .filter(col("rk") <= PrfExpandM)
      .select("query_id", "term")
    // The expanded query is PLANNING data, not corpus data — ≤ |Q|·M
    // rows (the SketchJoin bounded-probe precedent) — so collect it and
    // re-embed as a local relation: leaving it lazy replicates the
    // whole pass-1 subtree under every pass-2 consumer (vocabulary
    // filter, df aggregate, weighted join), turning 2 corpus passes
    // into ~6. With wq local, pass 2 is structurally ir1's plan.
    val expLocal = expTerms.collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    // pass 2: weighted re-score with the expanded query
    val qtermsW = qterms.withColumn("wt", lit(2L))
    val wq =
      if (expLocal.isEmpty) qtermsW
      else qtermsW.unionByName(
        s.createDataFrame(expLocal).toDF("query_id", "term").withColumn("wt", lit(1L)))
    val topk = udaf(new TopKAgg(10))
    bm25Contrib(d, wq.select("term").distinct(), Some(stats))
      .join(broadcast(wq), Seq("term"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("wt") * col("c")).as("score"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("doc_id")).as("hits"))
      .select(col("query_id"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).as("rank"),
        col("hit.id").as("doc_id"), col("hit.score").as("score"))
      .orderBy(col("query_id").asc_nulls_first, col("rank").asc_nulls_first)
  }

  private val prfExpansionSql = {
    val values = QuerySet.map { case (id, q) => s"($id, '$q')" }.mkString(", ")
    s"""WITH q(query_id, qtext) AS (VALUES $values),
       |docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |stats AS (SELECT CAST(SUM(len(w)) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS a,
       |                 CAST(COUNT(*) AS BIGINT) AS n FROM docs),
       |qterms AS (SELECT DISTINCT query_id, unnest(string_split(qtext, ' ')) AS term FROM q),
       |terms1 AS (SELECT DISTINCT term FROM qterms),
       |tf1 AS (
       |  SELECT t.term, doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    CAST(len(list_filter(w, x -> x = t.term)) AS BIGINT) AS tf
       |  FROM docs CROSS JOIN terms1 t
       |  WHERE list_contains(w, t.term)),
       |df1 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf1 GROUP BY term),
       |c1 AS (
       |  SELECT f.term, f.doc_id,
       |    ((1000 * (2*s.n - 2*d.df + 1)) // (2*d.df + 1)) *
       |    ((44000 * s.a * f.tf) // (20*s.a*f.tf + 6*s.a + 18*f.dl)) AS c
       |  FROM tf1 f JOIN df1 d USING (term) CROSS JOIN stats s),
       |s1 AS (
       |  SELECT qt.query_id, c.doc_id, CAST(SUM(c.c) AS BIGINT) AS score
       |  FROM c1 c JOIN qterms qt USING (term)
       |  GROUP BY qt.query_id, c.doc_id),
       |fb AS (
       |  SELECT query_id, doc_id FROM (
       |    SELECT query_id, doc_id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |    FROM s1) WHERE rank <= $PrfFeedbackK),
       |fbt AS (
       |  SELECT query_id, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
       |    SELECT f.query_id, unnest(dc.w) AS term
       |    FROM fb f JOIN docs dc USING (doc_id))
       |  GROUP BY query_id, term),
       |fbx AS (
       |  SELECT f.query_id, f.term, f.cnt FROM fbt f
       |  LEFT JOIN qterms qt ON f.query_id = qt.query_id AND f.term = qt.term
       |  WHERE qt.query_id IS NULL),
       |exp AS (
       |  SELECT query_id, term FROM (
       |    SELECT query_id, term,
       |      row_number() OVER (PARTITION BY query_id ORDER BY cnt DESC, term) AS rk
       |    FROM fbx) WHERE rk <= $PrfExpandM),
       |wq AS (
       |  SELECT query_id, term, CAST(2 AS BIGINT) AS wt FROM qterms
       |  UNION ALL
       |  SELECT query_id, term, CAST(1 AS BIGINT) AS wt FROM exp),
       |vocab AS (SELECT DISTINCT term FROM wq),
       |tf2 AS (
       |  SELECT t.term, doc_id, CAST(len(w) AS BIGINT) AS dl,
       |    CAST(len(list_filter(w, x -> x = t.term)) AS BIGINT) AS tf
       |  FROM docs CROSS JOIN vocab t
       |  WHERE list_contains(w, t.term)),
       |df2 AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf2 GROUP BY term),
       |c2 AS (
       |  SELECT f.term, f.doc_id,
       |    ((1000 * (2*s.n - 2*d.df + 1)) // (2*d.df + 1)) *
       |    ((44000 * s.a * f.tf) // (20*s.a*f.tf + 6*s.a + 18*f.dl)) AS c
       |  FROM tf2 f JOIN df2 d USING (term) CROSS JOIN stats s),
       |s2 AS (
       |  SELECT w.query_id, c.doc_id, CAST(SUM(w.wt * c.c) AS BIGINT) AS score
       |  FROM c2 c JOIN wq w ON c.term = w.term
       |  GROUP BY w.query_id, c.doc_id)
       |SELECT query_id, rank, doc_id, score FROM (
       |  SELECT query_id, doc_id, score,
       |    row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rank
       |  FROM s2) WHERE rank <= 10
       |ORDER BY query_id NULLS FIRST, rank NULLS FIRST""".stripMargin
  }

  override val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ir1_bm25_topk" -> (bm25TopK _),
    "ir2_postings" -> (postings _),
    "ir3_phrase_match" -> (phraseMatch _),
    "ir4_hybrid_rrf" -> (hybridRrf _),
    "ir5_prf_expansion" -> (prfExpansion _))

  override val oracle: Map[String, String] = Map(
    "ir1_bm25_topk" -> bm25TopKSql,
    "ir2_postings" -> postingsSql,
    "ir3_phrase_match" -> phraseMatchSql,
    "ir4_hybrid_rrf" -> hybridRrfSql,
    "ir5_prf_expansion" -> prfExpansionSql)
}
