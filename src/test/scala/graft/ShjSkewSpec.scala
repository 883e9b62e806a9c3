package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Skew-proofing for the session-wide shuffled-hash preference (r19,
  * VERDICT r18 #7 / ADVICE r18): `preferSortMergeJoin=false` lets the
  * planner pick ShuffledHashJoin from size ESTIMATES, and a SHJ build
  * side does not spill or fall back at runtime — so a skewed build side
  * that blows past its estimate is the configured posture's failure
  * mode. This spec plants a hot key whose build-side partition is ~100×
  * the median (er2's blocker-join shape: one giant block key among many
  * small ones) through a SHUFFLE_HASH-planned join and pins that
  * (a) the plan really is a ShuffledHashJoin — the hazard is exercised,
  *     not dodged via broadcast, and
  * (b) the skewed execution completes and its result equals the
  *     sort-merge spelling of the identical join bit-for-bit.
  * At spec scale "completes" is the memory claim AQE's skew handling
  * and the bounded per-partition build make at cluster scale; the
  * equality pin is what guards against a silent wrong-result mode.
  */
class ShjSkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("shuffled-hash join with a planted hot build key completes and matches sort-merge") {
    import spark.implicits._
    val s = spark
    // build side: 100k rows on one hot key + 1k distinct cold keys
    val build = s.range(0, 100000).select(
      when(col("id") < 99000, lit(7L)).otherwise(col("id") % 1000 + 100L).as("k"),
      col("id").as("payload"))
    // probe side: every key once + the hot key a few more times
    val probe = s.range(0, 1100).select(
      when(col("id") < 100, lit(7L)).otherwise(col("id") + 100L).as("k"),
      (col("id") * 10L).as("p"))
    def agg(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("k").agg(count(lit(1)).as("n"), sum(col("payload") + col("p")).as("s"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val shj = build.hint("shuffle_hash").join(probe, Seq("k"))
    // the hazard must actually be on the SHJ path (not broadcast away)
    val planned = shj.queryExecution.sparkPlan.toString
    assert(planned.contains("ShuffledHashJoin"),
      s"hint did not yield a shuffled-hash join:\n$planned")
    val smj = build.hint("merge").join(probe, Seq("k"))
    assert(smj.queryExecution.sparkPlan.toString.contains("SortMergeJoin"),
      "reference is not a sort-merge join")
    assert(agg(shj) == agg(smj),
      "skewed shuffled-hash result diverges from sort-merge reference")
  }
}
