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
}
