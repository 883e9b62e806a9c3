package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: points matched to the intervals
  * that contain them, with an equi-key.
  *
  * The naive Spark plan for `p.key = i.key AND p.ts BETWEEN i.start AND
  * i.end` is a BroadcastNestedLoopJoin (or a sort-merge on the key alone
  * followed by a per-key cross filter) — quadratic in the hot keys and a
  * scale-killer. This operator turns it into a pure equi-join by time
  * binning: each interval is replicated to every bin it covers
  * (`ceil(span/bin)` copies — bounded when the bin width is chosen near
  * the typical span), each point belongs to exactly one bin, and the
  * join condition becomes `(key, bin)` equality plus the exact
  * containment filter. A point meets a qualifying interval in exactly
  * one bin — the point's own — so no post-join dedup is needed.
  *
  * Interval semantics are half-open `[start, end)`; empty intervals
  * (`end <= start`) match nothing and are dropped before replication
  * (Spark's `sequence` would otherwise generate a *descending* bin
  * range for them).
  */
object RangeJoin {

  /** Inner point-in-interval join.
    *
    * @param points    left side; one row per point
    * @param intervals right side; one row per interval
    * @param pointKey / intervalKey equi-key column names
    * @param pointTs   timestamp column of the point
    * @param start/end interval bound columns (same type family as pointTs)
    * @param binUs     bin width in microseconds; pick ≈ the typical span
    */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointKey: String, intervalKey: String,
      pointTs: String, start: String, end: String,
      binUs: Long): DataFrame = {
    def bin(c: Column): Column = floor(unix_micros(c) / binUs).cast("long")
    val p = points.withColumn("__bin", bin(col(pointTs)))
    val i = intervals
      .filter(col(end) > col(start))
      .withColumn("__bin",
        explode(sequence(bin(col(start)), floor((unix_micros(col(end)) - 1) / binUs).cast("long"))))
    p.join(i,
      p(pointKey) === i(intervalKey) && p("__bin") === i("__bin") &&
        p(pointTs) >= i(start) && p(pointTs) < i(end))
      .drop("__bin")
  }

  /** Inner interval-OVERLAP join (both sides are interval sets): pairs
    * with `aS < bE AND bS < aE` under an equi-key, half-open `[s, e)`.
    *
    * Same binning as [[pointInInterval]], replicated on BOTH sides —
    * but two overlapping intervals can share MANY bins, so instead of a
    * post-join `distinct` (a full extra shuffle of the pair stream) the
    * join emits each pair only in ONE bin: the bin containing the
    * overlap's start `max(aS, bS)`. That bin is covered by both
    * intervals by construction, so no pair is lost, and no other bin
    * passes the predicate — exactly-once without dedup.
    */
  def intervalOverlap(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binUs: Long): DataFrame = {
    def bin(c: Column): Column = floor(unix_micros(c) / binUs).cast("long")
    def binned(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s))
        .withColumn("__bin",
          explode(sequence(bin(col(s)), floor((unix_micros(col(e)) - 1) / binUs).cast("long"))))
    val l = binned(left, lStart, lEnd)
    val r = binned(right, rStart, rEnd)
    l.join(r,
      l(leftKey) === r(rightKey) && l("__bin") === r("__bin") &&
        l(lStart) < r(rEnd) && r(rStart) < l(lEnd) &&
        l("__bin") === floor(
          greatest(unix_micros(l(lStart)), unix_micros(r(rStart))) / binUs).cast("long"))
      .drop("__bin")
  }
}
