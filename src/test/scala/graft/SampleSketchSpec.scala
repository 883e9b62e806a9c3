package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SampleSketch

/** Pins for [[graft.functions.SampleSketch]] (dq17's aggregate): the
  * bottom-k-by-md5 sample must be a pure function of the data
  * (partition-independent), EXACTLY mergeable (rollup ≡ direct), keep
  * multiset duplicates (it samples rows, not distinct values), and
  * skip null inputs.
  */
class SampleSketchSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def base(s: org.apache.spark.sql.SparkSession) =
    Tables(s, dir, "customer").select(
      col("c_nationkey").as("nat"),
      col("c_mktsegment").as("seg"),
      md5(concat(lit("s:"), col("c_custkey").cast("string"))).as("h"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))

  test("the sample is partition-independent (pure function of the data)") {
    val s = SparkEntry.configure(spark.newSession())
    def sampleOf(parts: Int) = base(s).repartition(parts)
      .groupBy("nat").agg(SampleSketch.sampleSet(col("h"), col("bal_c"), 4).as("sk"))
      .orderBy("nat").collect().map(_.toSeq).toSeq
    assert(sampleOf(1) == sampleOf(7) && sampleOf(7) == sampleOf(32))
  }

  test("rollup mergeability is EXACT: merged per-segment samples equal the direct sample") {
    val s = SparkEntry.configure(spark.newSession())
    val level1 = base(s).groupBy("nat", "seg")
      .agg(SampleSketch.sampleSet(col("h"), col("bal_c"), 4).as("sk"))
    val merged = level1.groupBy("nat")
      .agg(SampleSketch.sampleMergeSets(col("sk"), 4).as("sk"))
    val direct = base(s).groupBy("nat")
      .agg(SampleSketch.sampleSet(col("h"), col("bal_c"), 4).as("sk"))
    val m = merged.orderBy("nat").collect().map(_.toSeq).toSeq
    val d = direct.orderBy("nat").collect().map(_.toSeq).toSeq
    assert(m.nonEmpty && m == d)
    // non-vacuity: at least one nation actually trimmed (sample < group)
    val counts = base(s).groupBy("nat").count().collect().map(_.getLong(1))
    assert(counts.exists(_ > 4), "fixture too small to exercise the trim")
  }

  test("multiset semantics: duplicate (hash, value) rows both survive; nulls skip") {
    val s = SparkEntry.configure(spark.newSession())
    import s.implicits._
    val df = Seq(
      ("a", 1L), ("a", 1L), ("b", 2L), // duplicate rows are distinct observations
      (null.asInstanceOf[String], 9L)  // null hash: skipped
    ).toDF("h", "v")
    val out = df.agg(SampleSketch.sampleSet(col("h"), col("v"), 8).as("sk"))
      .selectExpr("transform(sk, x -> x.h) AS hs", "transform(sk, x -> x.v) AS vs")
      .collect()(0)
    assert(out.getSeq[String](0) == Seq("a", "a", "b"))
    assert(out.getSeq[Long](1) == Seq(1L, 1L, 2L))
    // a k smaller than the duplicate run trims deterministically
    val trimmed = df.agg(SampleSketch.sampleSet(col("h"), col("v"), 2).as("sk"))
      .selectExpr("transform(sk, x -> x.v) AS vs").collect()(0)
    assert(trimmed.getSeq[Long](0) == Seq(1L, 1L))
  }
}
