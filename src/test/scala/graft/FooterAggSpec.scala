package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.FooterAggregateRewrite

/** Pins for [[graft.plans.FooterAggregateRewrite]] (opt16): the
  * answered plan must carry NO scan at all; every refusal keeps it;
  * the fingerprint-keyed cache must not serve stale answers after an
  * append; and the all-null-column case answers SQL NULL rather than
  * refusing (the valid-vs-empty distinction in ColStats).
  */
class FooterAggSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def onSession(): SparkSession = {
    val s = SparkEntry.configure(spark.newSession())
    s.conf.set(FooterAggregateRewrite.ConfKey, "true")
    s
  }

  private def nScans(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case lr: LogicalRelation => lr }.size

  test("answered plan has no scan; values equal the executed control") {
    val s = onSession()
    val q = Tables(s, dir, "lineitem").agg(
      count(lit(1)).as("n"), min(col("l_orderkey")).as("mn"),
      max(col("l_orderkey")).as("mx"), count(col("l_partkey")).as("np"))
    assert(nScans(q) == 0, s"scan survived:\n${q.queryExecution.optimizedPlan}")
    val off = SparkEntry.configure(spark.newSession())
    val ctl = Tables(off, dir, "lineitem").agg(
      count(lit(1)).as("n"), min(col("l_orderkey")).as("mn"),
      max(col("l_orderkey")).as("mx"), count(col("l_partkey")).as("np"))
    assert(nScans(ctl) == 1)
    assert(q.collect().toSeq == ctl.collect().toSeq)
  }

  test("refusals: filter, grouping, non-integral min, avg, distinct keep the scan") {
    val s = onSession()
    val li = Tables(s, dir, "lineitem")
    assert(nScans(li.filter(col("l_orderkey") > 10).agg(count(lit(1)))) == 1,
      "filtered scan must refuse (footers describe ALL rows)")
    assert(nScans(li.groupBy("l_returnflag").agg(count(lit(1)))) == 1,
      "grouped aggregate must refuse")
    assert(nScans(li.agg(min(col("l_quantity")))) == 1,
      "double min must refuse (NaN-undefined parquet stats)")
    assert(nScans(li.agg(min(col("l_shipdate")))) == 1,
      "date min must refuse (logical-type reinterpretation)")
    assert(nScans(li.agg(avg(col("l_orderkey")))) == 1,
      "avg is not footer-answerable")
    assert(nScans(li.agg(countDistinct(col("l_orderkey")))) >= 1,
      "distinct is not footer-answerable")
    // conf off: nothing fires
    val off = SparkEntry.configure(spark.newSession())
    assert(nScans(Tables(off, dir, "lineitem").agg(count(lit(1)))) == 1)
  }

  test("append invalidates the cached stats (fingerprint-keyed, no staleness)") {
    val s = onSession()
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("footer_agg").toString
    Seq(1L, 2L, 3L).toDF("v").write.mode("overwrite").parquet(path)
    def q() = {
      val df = s.read.parquet(path).agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
      assert(nScans(df) == 0, "rewrite must fire on the temp table")
      df.collect()(0)
    }
    val r1 = q()
    assert(r1.getLong(0) == 3L && r1.getLong(1) == 3L)
    Seq(9L, 10L).toDF("v").write.mode("append").parquet(path)
    val r2 = q() // fresh listing → fresh fingerprint → fresh footers
    assert(r2.getLong(0) == 5L, s"stale count after append: $r2")
    assert(r2.getLong(1) == 10L, s"stale max after append: $r2")
  }

  test("schema evolution refuses: a file missing the column must not be billed as non-null") {
    val s = onSession()
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("footer_agg_evo").toString
    Seq((1L, 10L), (2L, 20L)).toDF("k", "v").write.mode("append").parquet(path)
    Seq(3L, 4L, 5L).toDF("k").write.mode("append").parquet(path) // no v
    val df = s.read.option("mergeSchema", "true").parquet(path)
      .agg(count(col("v")).as("nv"), min(col("v")).as("mn"))
    // v covers only 2 of 5 rows: the rewrite must keep the scan...
    assert(nScans(df) == 1, s"uncovered column answered from footers:\n${df.queryExecution.optimizedPlan}")
    // ...and execution gives the true answer (the rows without v are null)
    val r = df.collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 10L, s"got $r")
    // count(*) over the same mixed table IS coverable — answered scan-free
    val cnt = s.read.option("mergeSchema", "true").parquet(path).agg(count(lit(1)).as("n"))
    assert(nScans(cnt) == 0 && cnt.collect()(0).getLong(0) == 5L)
  }

  test("an all-null integral column answers count 0 and NULL min — not a refusal") {
    val s = onSession()
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("footer_agg_null").toString
    Seq[(Long, java.lang.Long)]((1L, null), (2L, null))
      .toDF("k", "v").write.mode("overwrite").parquet(path)
    val df = s.read.parquet(path)
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"), min(col("v")).as("mn"))
    assert(nScans(df) == 0, "all-null column must still answer from footers")
    val r = df.collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(2), s"got $r")
  }
}
