package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesAgg

/** Misra–Gries sketch (hh1): the n/(k+1) superset guarantee under
  * forced evictions and adversarial partition merges, plus the gate
  * entry's exactness against a naive groupBy on the same data.
  */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  /** Skewed planted stream: ids 0..4 are heavy (600 each), ids
    * 100..899 are a long tail (1 each) — 3800 items, so with k = 7 the
    * threshold is 3800/8 = 475 and exactly the five heavy ids exceed
    * it while the tail forces constant evictions (800 distinct ≫ 7
    * counters).
    */
  private def planted = {
    val heavy = (0L until 5L).flatMap(id => Seq.fill(600)(id))
    val tail = (100L until 900L)
    spark.createDataFrame(
      spark.sparkContext.parallelize(scala.util.Random.shuffle(heavy ++ tail).map(Tuple1(_)), 13))
      .toDF("id")
  }

  test("MG survivors are a superset of all true > n/(k+1) items under evictions") {
    val mg = udaf(new MisraGriesAgg(7))
    val cands = planted.agg(mg(col("id"))).head.getSeq[Long](0).toSet
    assert(cands.size <= 7, s"state bound violated: ${cands.size} > k")
    (0L until 5L).foreach(id => assert(cands.contains(id), s"heavy id $id evicted"))
  }

  test("sketch+rescore equals the naive exact answer on planted data") {
    val k = 7
    val df = planted
    val mg = udaf(new MisraGriesAgg(k))
    val cands = df.agg(mg(col("id")).as("c")).select(explode(col("c")).as("id"))
    val total = df.count()
    val got = df.join(broadcast(cands), Seq("id"), "left_semi")
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > total)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > total)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(want.keySet == (0L until 5L).toSet)
  }

  test("hh1 gate entry: exact, nonempty, and every row clears the threshold") {
    val out = SparkEntry.queries("hh1_heavy_hitters")(spark, dir).collect()
    assert(out.nonEmpty, "no heavy hitters at sf0.01 — threshold regression")
    val n = SparkEntry.configure(spark).read.parquet(s"$dir/events.parquet").count()
    out.foreach(r => assert(r.getAs[Long]("n_events") * 128 > n))
  }
}
