package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.NdvSketch

/** dq12's estimator contract: the sketch-fed System-R containment
  * estimate n_L·n_R / max(ndv_L, ndv_R) is exact for uniform joins, and
  * — the decision that matters — classifies join outputs the same way
  * ground truth does on both the benign (FK) and explosive (hot-key)
  * shape.
  */
class JoinCardinalitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  /** The 100 TB path: estimate from the KMV sketch NDVs (exact below k
    * here, so the asserts are deterministic).
    */
  private def estimate(l: DataFrame, r: DataFrame): Long = {
    val ls = l.agg(count(lit(1)).as("n"), NdvSketch.ndvSketch(col("k")).as("ndv"))
      .collect()(0)
    val rs = r.agg(count(lit(1)).as("n"), NdvSketch.ndvSketch(col("k")).as("ndv"))
      .collect()(0)
    ls.getLong(0) * rs.getLong(0) / math.max(ls.getLong(1), rs.getLong(1))
  }

  private def actual(l: DataFrame, r: DataFrame): Long =
    l.join(r, Seq("k")).count()

  test("uniform multiplicity: the containment estimate is exactly the join cardinality") {
    // FK shape: every fact key hits the unique dim side -> est = n_fact
    val fact = spark.range(0, 500).select((col("id") % 100).as("k"))
    val dim = spark.range(0, 100).select(col("id").as("k"))
    assert(estimate(fact, dim) == 500L)
    assert(actual(fact, dim) == 500L)
    // uniform many-to-many: m x n per key, est = (100m)(100n)/100 = 100mn
    val l = spark.range(0, 300).select((col("id") % 100).as("k")) // m = 3
    val r = spark.range(0, 200).select((col("id") % 100).as("k")) // n = 2
    assert(estimate(l, r) == 600L)
    assert(actual(l, r) == 600L)
  }

  test("the estimate drives the same safe-vs-explosive decision as ground truth") {
    // decision rule a planner would apply: join output small enough to
    // keep as a broadcastable/materializable frame iff <= threshold
    val threshold = 5000L
    // benign: FK join, output = fact size, far under threshold
    val fact = spark.range(0, 2000).select((col("id") % 400).as("k"))
    val dim = spark.range(0, 400).select(col("id").as("k"))
    // explosive: one hot key on BOTH sides -> quadratic output
    val hotL = spark.range(0, 200).select(lit(7L).as("k"))
    val hotR = spark.range(0, 200).select(lit(7L).as("k"))
    for ((l, r) <- Seq((fact, dim), (hotL, hotR))) {
      val est = estimate(l, r)
      val act = actual(l, r)
      assert((est <= threshold) == (act <= threshold),
        s"estimate $est and truth $act disagree at threshold $threshold")
    }
  }
}
