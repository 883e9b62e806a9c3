package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adaptive blocking for edit-distance record linkage — the production
  * lever for low-entropy block keys (BASELINE.md round-15 ledger: er2's
  * (nation, ⌊balance⌋) block went ~quadratic at sf1 because the
  * copy-replicated corpus keeps block-key cardinality CONSTANT while
  * rows grow, avg occupancy 10.3 vs ~1). Blocking must be invisible in
  * the result: every path below ends in the exact levenshtein verify,
  * so the edge set is exactly { (a,b) | same block ∧ lev(text) ≤ τ } no
  * matter which path generated the candidate.
  *
  * Two composable levers, both correctness-preserving:
  *
  *  1. '''Exact-duplicate contraction.''' Rows with identical
  *     (block, text) are interchangeable for matching: they match the
  *     same partner set, and within a block they match EACH OTHER at
  *     lev 0 (≤ τ), so an equivalence class is always one clique inside
  *     its component. Contracting each class to its minimum id
  *     therefore preserves connected components exactly, and the
  *     min-id cluster label is unchanged (min over component of class
  *     minima = min over component of ids). This kills the replication
  *     artifact outright: candidate work scales with DISTINCT texts per
  *     block, not rows, so an N-way-replicated corpus pays the same
  *     candidate join as the original.
  *
  *  2. '''Segment sub-split of oversized blocks.''' A block whose
  *     rep-level occupancy still exceeds `bound` (genuinely low-entropy
  *     key over distinct strings) switches from within-block all-pairs
  *     to partition-based signatures (the Pass-Join scheme, Li/Deng/
  *     Feng, VLDB 2012): partition each string into τ+1 contiguous
  *     segments; by pigeonhole, τ edits cannot destroy all τ+1 exact
  *     segments, and indels shift alignment by at most τ, so any pair
  *     within lev ≤ τ shares (block, partnerLen, segNo, exact segment
  *     string) with a probe start within ±τ of the segment start.
  *     Candidate generation becomes an equi-join on that 4-part key —
  *     occupancy bounded by segment-value frequency instead of block
  *     size — at a bounded fan-out of ≤ (2τ+1)·(τ+1)·(2τ+1) probe keys
  *     per string. Small blocks keep plain all-pairs (cheaper
  *     constants); the census that decides is two hash aggregates.
  *
  * Scale posture: no step is quadratic in rows. Contraction is one
  * hash aggregate + an equi-join; the census is an aggregate at block
  * granularity; candidate generation is equi-joins whose build keys
  * have bounded occupancy by construction. Nothing is collected.
  */
object AdaptiveBlocker {

  /** Verified edit-distance edges within equality blocks, plus the
    * (block, text) → representative contraction classes.
    *
    * @param rows      input frame
    * @param blockCols equality block key columns (part of the match
    *                  predicate: pairs in different blocks never match)
    * @param idCol     unique long id column
    * @param textCol   string column compared with levenshtein
    * @param tau       maximum edit distance (inclusive)
    * @param bound     rep-level block occupancy above which the block
    *                  switches from all-pairs to segment signatures
    * @return (edges, classes): edges = (a, b) rep-level pairs, a < b,
    *         lev ≤ τ, same block; classes = (blockCols…, textCol, rep),
    *         one row per (block, text) class, rep = min id of the
    *         class. Components over `edges`, expanded onto rows by
    *         joining `classes` back on (block, text), equal components
    *         of the uncontracted pair graph. Classes come back keyed by
    *         (block, text) — not per row id — so the expansion join is
    *         rows ⋈ classes, broadcastable whenever the distinct
    *         vocabulary is small (the exact situation contraction wins).
    *
    *         NULL keys (r16 review #2): a row with NULL in any block
    *         column or in the text can never match anything — SQL
    *         equality semantics, the same contract as the plain
    *         within-block equi-join this operator replaces — so such
    *         rows produce no edges here and do NOT come back from the
    *         equality expansion join. Callers MUST expand with a LEFT
    *         join + coalesce(cluster, rowId) so those rows surface as
    *         the singletons they are instead of vanishing (er2 does
    *         exactly this). The contraction aggregate does group NULL
    *         keys together (groupBy null-equality), but that phantom
    *         class is edge-inert: its rep enters the candidate joins on
    *         equality keys and matches nothing.
    */
  def levEdges(rows: DataFrame, blockCols: Seq[String], idCol: String,
      textCol: String, tau: Int, bound: Int): (DataFrame, DataFrame) = {
    require(tau >= 1 && bound >= 1)
    val bk = blockCols.map(col)
    val base = rows.select(bk :+ col(idCol).as("id") :+ col(textCol).as("txt"): _*)

    // 1. contraction: one representative per (block, text) class.
    // 2. census → per-block path choice (consistent per block: the flag
    //    is a block-granularity aggregate joined back onto every rep).
    // The flagged class frame is consumed FIVE times downstream (both
    // sides of the small all-pairs join, both sides of the segment
    // join, and the caller's expansion) — localCheckpoint materializes
    // it once instead of re-running the contraction aggregate per
    // consumer (measured 4x on er2: the un-checkpointed chain ran ~7 s
    // steady at sf0.1 vs ~2 s checkpointed). It is the CONTRACTED
    // vocabulary — small by construction; at cluster scale this is one
    // bounded materialization, same storage class as a shuffle spill.
    val reps = base.groupBy(bk :+ col("txt"): _*).agg(min(col("id")).as("rid"))
    val census = reps.groupBy(bk: _*).agg(count(lit(1)).as("bn"))
    val flagged = reps.join(census, blockCols).localCheckpoint()
    val small = flagged.filter(col("bn") <= bound)
    val big = flagged.filter(col("bn") > bound)
    val classes = flagged.select(bk :+ col("txt").as(textCol) :+ col("rid").as("rep"): _*)

    // 3a. small blocks: within-block all-pairs (occupancy ≤ bound, so
    //     the join fan-out is ≤ bound per probe row)
    val smallCand = small.select(bk :+ col("rid").as("a") :+ col("txt").as("ta"): _*)
      .join(small.select(bk :+ col("rid").as("b") :+ col("txt").as("tb"): _*), blockCols)
      .filter(col("a") < col("b"))
      .select("a", "b", "ta", "tb")

    // 3b. oversized blocks: Pass-Join segment signatures.
    //     Even partition of a length-L string into k = τ+1 segments:
    //     base = ⌊L/k⌋, rem = L mod k; segments 0..k-rem-1 have length
    //     base, the last rem have base+1; 1-based start of segment i is
    //     1 + i·base + max(0, i − (k − rem)).
    val k = tau + 1
    def segLen(l: String) =
      expr(s"CAST($l DIV $k + IF(i >= $k - $l % $k, 1, 0) AS INT)")
    def segStart(l: String) =
      expr(s"CAST(1 + i * ($l DIV $k) + greatest(0, i - ($k - $l % $k)) AS INT)")
    // index side: each rep's own segments, keyed by its own length
    val idx = big
      .select(bk :+ col("rid").as("a") :+ col("txt").as("ta") :+ length(col("txt")).as("ll"): _*)
      .withColumn("i", explode(expr(s"sequence(0, $tau)")))
      .withColumn("slen", segLen("ll"))
      .withColumn("sstart", segStart("ll"))
      .withColumn("key", expr("substring(ta, sstart, slen)"))
      .select(bk :+ col("a") :+ col("ta") :+ col("ll") :+ col("i") :+ col("key"): _*)
    // probe side: for every compatible partner length ll ∈ [len−τ, len+τ]
    // and segment i of THAT length's scheme, the substrings of this
    // string starting within ±τ of the segment start. sequence(lo, hi)
    // descends when lo > hi, so empty windows are guarded to array().
    // The partner-length floor is 0, not 1 (r16 ADVICE): a length-0
    // partner's scheme is τ+1 empty segments (slen=0, sstart=1, key "")
    // which the index side emits for the empty string, so probing ll=0
    // is what generates the (empty, short-string) candidate in the role
    // where the empty string is the index side — clamping to 1 dropped
    // exactly that edge whenever the empty string held the smaller id.
    val probe = big
      .select(bk :+ col("rid").as("b") :+ col("txt").as("tb") :+ length(col("txt")).as("ls"): _*)
      .withColumn("ll", explode(expr(s"sequence(greatest(ls - $tau, 0), ls + $tau)")))
      .withColumn("i", explode(expr(s"sequence(0, $tau)")))
      .withColumn("slen", segLen("ll"))
      .withColumn("sstart", segStart("ll"))
      .withColumn("p", explode(expr(
        s"IF(greatest(sstart - $tau, 1) <= least(sstart + $tau, ls - slen + 1), " +
        s"sequence(greatest(sstart - $tau, 1), least(sstart + $tau, ls - slen + 1)), " +
        "array())")))
      .withColumn("key", expr("substring(tb, CAST(p AS INT), slen)"))
      .select(bk :+ col("b") :+ col("tb") :+ col("ll") :+ col("i") :+ col("key"): _*)
    // the pigeonhole lemma holds with either endpoint as the partitioned
    // side, so every true pair is generated in both roles — a<b keeps one
    val bigCand = idx.join(probe, blockCols ++ Seq("ll", "i", "key"))
      .filter(col("a") < col("b"))
      .select("a", "b", "ta", "tb")
      .dropDuplicates("a", "b")

    // 4. exact verify — blocking is invisible past this line. The
    // THRESHOLDED levenshtein (Spark 3.5+) runs the banded O(τ·n)
    // decision with early exit instead of the full O(n·m) DP — same
    // predicate (returns the distance when ≤ τ, −1 otherwise), strictly
    // less work per candidate, and this is the inner loop over every
    // candidate pair.
    val edges = smallCand.unionByName(bigCand)
      .filter(levenshtein(col("ta"), col("tb"), tau) =!= -1)
      .select("a", "b")
    (edges, classes)
  }
}
