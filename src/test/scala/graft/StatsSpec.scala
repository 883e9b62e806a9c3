package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the quantile-sketch census (q06): the gate
  * records it rows-only (GK sketches are engine-specific), so the
  * accuracy claim lives here — with a 10k accuracy parameter over a few
  * thousand rows per group the sketch is near-exact, so a tight bound
  * against the true quantiles is fair.
  */
class StatsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx quantiles sit within 1% of the exact per-type quantiles") {
    val approx = SparkEntry.queries("q06_quantile_sketch")(spark, dir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p25"), r.getAs[Double]("p50"), r.getAs[Double]("p75"))).toMap
    val events = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet")
    val exact = events.groupBy("event_type")
      .agg(expr("percentile(value, array(0.25, 0.5, 0.75))").as("q"))
      .collect()
      .map(r => r.getAs[String]("event_type") -> r.getSeq[Double](1)).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    val span = events.agg(max(col("value")) - min(col("value"))).head.getDouble(0)
    exact.foreach { case (t, es) =>
      val (a25, a50, a75) = approx(t)
      Seq(a25 -> es(0), a50 -> es(1), a75 -> es(2)).foreach { case (a, e) =>
        assert(math.abs(a - e) <= 0.01 * span, s"$t: approx $a vs exact $e (span $span)")
      }
    }
  }
}
