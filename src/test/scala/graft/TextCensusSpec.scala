package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the HLL census (tx7): the gate records it
  * rows-only (sketch estimates are engine-specific), so the accuracy
  * claim lives here — every per-language estimate must sit within the
  * documented HyperLogLog++ relative error of the exact distinct count.
  */
class TextCensusSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct census stays within the default HLL++ error bound") {
    val approx = SparkEntry.queries("tx7_census_hll")(spark, dir).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("approx_distinct_texts"), r.getAs[Long]("approx_sources"))).toMap
    val exact = SparkEntry.configure(spark).read
      .parquet(s"$dir/documents.parquet")
      .groupBy("lang")
      .agg(
        countDistinct(md5(col("text"))).as("texts"),
        countDistinct(col("source")).as("sources"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("texts"), r.getAs[Long]("sources"))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    // default rsd is 5%; allow 3 sigma plus integer slack for small groups
    def within(a: Long, e: Long) = math.abs(a - e) <= math.max(3, 0.15 * e)
    exact.foreach { case (lang, (t, s)) =>
      val (at, as) = approx(lang)
      assert(within(at, t), s"$lang texts: approx $at vs exact $t")
      assert(within(as, s), s"$lang sources: approx $as vs exact $s")
    }
  }
}
