package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SketchJoin

/** The sketch-planned join's two contracts: the probes pick the branch
  * the data calls for (deterministically, on any partitioning), and
  * every branch computes the identical left equi-join.
  */
class SketchJoinSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // probe side: key 0 holds 30% of rows, the rest spread over 700 keys;
  // extra high-cardinality column doubles as the salt dispersion
  private def skewed: DataFrame =
    spark.range(0, 3000).select(
      when(col("id") % 10 < 3, 0L).otherwise(col("id") % 700L).as("k"),
      col("id").as("row_id"))

  private def uniform: DataFrame =
    spark.range(0, 3000).select((col("id") % 700L).as("k"), col("id").as("row_id"))

  private def dim(n: Int): DataFrame =
    spark.range(0, n).select(col("id").as("k"), (col("id") % 5L).as("attr"))

  private def plan(l: DataFrame, r: DataFrame) =
    SketchJoin.planLeftJoin(l, r, key = "k", dispersion = "row_id",
      broadcastRowLimit = 100L, skewShareMilli = 100L, buckets = 8)

  test("branch selection: tiny dim -> broadcast; skewed probe -> salted; uniform -> shuffle") {
    assert(plan(skewed, dim(50))._1 == "broadcast")
    assert(plan(skewed, dim(700))._1 == "salted")
    assert(plan(uniform, dim(700))._1 == "shuffle")
  }

  test("decision is invariant to probe-side partitioning") {
    val big = dim(700)
    val choices = Seq(1, 13, 32).map(p => plan(skewed.repartition(p), big)._1)
    assert(choices.distinct == Seq("salted"), s"partitioning moved the decision: $choices")
  }

  test("every branch computes the identical left join") {
    def rows(df: DataFrame): Seq[(Long, Long, Long)] =
      df.select(col("k"), col("row_id"), coalesce(col("attr"), lit(-1L)))
        .as[(Long, Long, Long)].collect().sorted.toSeq
    val l = skewed
    val reference = rows(l.join(dim(700), Seq("k"), "left"))
    // salted (the branch the planner picks here)
    val (s1, salted) = plan(l, dim(700))
    assert(s1 == "salted" && rows(salted) == reference)
    // broadcast and shuffle branches forced via thresholds
    val (s2, bcast) = SketchJoin.planLeftJoin(l, dim(700), "k", "row_id",
      broadcastRowLimit = 10000L, skewShareMilli = 100L, buckets = 8)
    assert(s2 == "broadcast" && rows(bcast) == reference)
    val (s3, shuffled) = SketchJoin.planLeftJoin(l, dim(700), "k", "row_id",
      broadcastRowLimit = 100L, skewShareMilli = 900L, buckets = 8)
    assert(s3 == "shuffle" && rows(shuffled) == reference)
  }

  test("broadcast branch actually broadcasts (plan pin, AQE off)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (s, df) = plan(skewed, dim(50))
      assert(s == "broadcast")
      val physical = df.queryExecution.executedPlan
      assert(physical.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
        physical.toString.take(500))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
