package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.udaf
import graft.functions.MisraGriesAgg

/** Sketch-planned left equi-join — the DECISION layer over the join
  * spellings this library already carries: measure the inputs with
  * bounded-state probes, then pick the physical strategy the numbers
  * call for:
  *
  *  - `broadcast` when the build side is provably small (one count);
  *  - `salted` ([[SaltedJoin]]) when the probe side's key distribution
  *    is skewed past the threshold — the case where a plain shuffle
  *    funnels the hot key through one task and AQE can't always split
  *    (forced shuffle-hash, downstream keyed aggregation);
  *  - `shuffle` otherwise (Catalyst's sort-merge / shuffle-hash).
  *
  * Every branch computes the IDENTICAL left equi-join; only the plan
  * differs, so callers (and the sj2 gate) can hash-compare the chosen
  * branch against the plain spelling. dq12 is the cardinality half of
  * this story (output-size estimation from the KMV sketch); this
  * operator is the input-shape half (build size + probe skew).
  *
  * Skew probe = Misra–Gries candidates + exact rescore (the hh1
  * composition): the MG pass ships ≤ k counters per partition — never a
  * per-key exchange — and guarantees every key with share > n/(k+1)
  * survives as a candidate; the rescore then counts ONLY the ≤ k
  * candidate keys exactly via an `isin` probe. Decision determinism:
  * with k = 64 the guarantee floor is ~1.5% share, far under the 10%
  * default threshold, so whenever a key is hot enough to trigger
  * salting it is guaranteed a candidate on EVERY partitioning, and its
  * rescored count — hence the decision — is a pure function of the
  * data. (Below the floor, candidate sets may vary with partition
  * order, but every candidate's true share is then under the threshold,
  * so the decision is stably `shuffle`.)
  *
  * The probes' results are three driver-side scalars — the measured-
  * gate posture the bloom/skew entries already use; at production scale
  * the same numbers come from table stats or a stats service instead.
  */
object SketchJoin {

  /** Exact count of the most frequent `key` value, via MG candidates +
    * exact rescore. 0 for an empty frame. Keys are probed through
    * xxhash64 so any key type fits in the Long-item MG sketch; a hash
    * collision could only merge two candidates' counts (overestimating
    * the top share), with 64-bit birthday odds.
    */
  def topKeyCount(df: DataFrame, key: Column, mgK: Int = 64): Long = {
    val cands = df.select(udaf(new MisraGriesAgg(mgK)).apply(xxhash64(key)).as("c"))
      .collect()(0).getSeq[Long](0)
    if (cands.isEmpty) return 0L
    val top = df.filter(xxhash64(key).isin(cands: _*))
      .groupBy(xxhash64(key)).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect()(0)
    if (top.isNullAt(0)) 0L else top.getLong(0)
  }

  /** Plan and build the left equi-join of `left` ⟕ `right` on `key`.
    * Returns (strategy, frame); the strategy is one of
    * broadcast/salted/shuffle as documented above.
    *
    * @param dispersion        probe-side column whose hash spreads the
    *                          hot key's rows over salt buckets
    * @param broadcastRowLimit build side at or under this row count is
    *                          broadcast (a row-count stand-in for the
    *                          byte threshold a production planner uses)
    * @param skewShareMilli    probe-side top-key share (milli-units)
    *                          at or above which the join is salted
    */
  def planLeftJoin(left: DataFrame, right: DataFrame, key: String,
      dispersion: String, broadcastRowLimit: Long = 100000L,
      skewShareMilli: Long = 100L, buckets: Int = 16,
      mgK: Int = 64): (String, DataFrame) = {
    val buildRows = right.count()
    if (buildRows <= broadcastRowLimit)
      ("broadcast", left.join(broadcast(right), Seq(key), "left"))
    else {
      val probeRows = left.count()
      val topShareMilli =
        if (probeRows == 0) 0L
        else topKeyCount(left, col(key), mgK) * 1000L / probeRows
      if (topShareMilli >= skewShareMilli)
        ("salted", SaltedJoin.leftJoinSalted(left, right, key, dispersion, buckets))
      else ("shuffle", left.join(right, Seq(key), "left"))
    }
  }
}
