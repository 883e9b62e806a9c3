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

  test("histogram-derived stats equal raw-row stats (the r18 dq12 rewrite)") {
    // dq12 now derives every per-side quantity from the key HISTOGRAM
    // (k, cnt) instead of raw rows; this pins the equivalences the
    // rewrite rests on, over a frame with NULL keys and duplicates:
    //   n        = Σcnt           ≡ COUNT(*)
    //   ndv      = COUNT(hist.k)  ≡ COUNT(DISTINCT k)
    //   sketch   over hist.k      ≡ sketch over raw k   (set-pure KMV)
    //   actual   = Σ cl·cr        ≡ row-grain join count
    val l = spark.range(0, 60)
      .select(when(col("id") % 7 =!= 0, col("id") % 9).as("k"))
    val r = spark.range(0, 40)
      .select(when(col("id") % 5 =!= 0, col("id") % 11).as("k"))
    val hl = l.groupBy(col("k")).agg(count(lit(1)).as("cl"))
    val hr = r.groupBy(col("k")).agg(count(lit(1)).as("cr"))
    val rawL = l.agg(count(lit(1)), countDistinct(col("k")),
      NdvSketch.ndvSketch(col("k"))).collect()(0)
    val histL = hl.agg(sum(col("cl")), count(col("k")),
      NdvSketch.ndvSketch(col("k"))).collect()(0)
    assert(rawL.getLong(0) == histL.getLong(0), "n from Σcnt")
    assert(rawL.getLong(1) == histL.getLong(1), "ndv from histogram row count")
    assert(rawL.getLong(2) == histL.getLong(2), "KMV over keys ≡ KMV over rows")
    val actualRows = l.join(r, Seq("k")).count()
    val actualHist = hl.join(hr, Seq("k"))
      .agg(coalesce(sum(col("cl") * col("cr")), lit(0L))).collect()(0).getLong(0)
    assert(actualRows == actualHist, "Σ cl·cr ≡ join row count")
    // empty-join corner: coalesce keeps the 0 the old count() reported
    val none = spark.range(0, 5).select((col("id") + 1000).as("k"))
      .groupBy("k").agg(count(lit(1)).as("cr"))
    assert(hl.join(none.withColumnRenamed("cr", "cr2"), Seq("k"))
      .agg(coalesce(sum(col("cl") * col("cr2")), lit(0L))).collect()(0).getLong(0) == 0L)
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
