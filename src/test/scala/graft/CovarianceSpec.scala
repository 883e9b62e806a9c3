package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** emb6 covariance block: the gate hash-proves it against DuckDB; these
  * pin the algebra — the diagonal must equal emb5's variance profile
  * (same formula, different plan), an independent BigInt replay must
  * reproduce a signed off-diagonal entry exactly (exercising the
  * pmod floor-division spelling on a NEGATIVE numerator), and the
  * block must actually contain negative entries (else the sign-safe
  * path is vacuous).
  */
class CovarianceSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val cov = SparkEntry.queries("emb6_covariance")(spark, dir).collect()

  test("diagonal equals emb5's var_ppm for the block dims") {
    val varPpm = SparkEntry.queries("emb5_dim_profile")(spark, dir)
      .filter(col("dim") < 8).collect()
      .map(r => r.getAs[Long]("dim") -> r.getAs[Long]("var_ppm")).toMap
    val diag = cov.filter(r => r.getAs[Long]("dim_i") == r.getAs[Long]("dim_j"))
    assert(diag.length == 8)
    diag.foreach { r =>
      assert(r.getAs[Long]("cov_ppm") == varPpm(r.getAs[Long]("dim_i")),
        s"diag ${r.getAs[Long]("dim_i")} != emb5 variance")
    }
  }

  test("a negative off-diagonal entry replays exactly in BigInt floor math") {
    val neg = cov.find(r => r.getAs[Long]("cov_ppm") < 0)
      .getOrElse(fail("no negative covariance at sf0.01 — sign path untested"))
    val (i, j) = (neg.getAs[Long]("dim_i").toInt, neg.getAs[Long]("dim_j").toInt)
    val q = SparkEntry.configure(spark).read.parquet(s"$dir/embeddings.parquet")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(v => BigInt(math.floor(v.toDouble * 1000).toLong)))
    val n = BigInt(q.length)
    val sx = q.map(_(i)).sum
    val sy = q.map(_(j)).sum
    val sxy = q.map(v => v(i) * v(j)).sum
    val a = (n * sxy - sx * sy) * 1000000
    val m = n * n
    // BigInt /% truncates; floor for the (negative a, positive m) case:
    val floorDiv = if (a.sign < 0 && a % m != 0) a / m - 1 else a / m
    assert(BigInt(neg.getAs[Long]("cov_ppm")) == floorDiv)
    assert(BigInt(neg.getAs[Long]("sum_xy")) == sxy)
  }

  test("block shape: 36 upper-triangular pairs, all n equal") {
    assert(cov.length == 36)
    assert(cov.forall(r => r.getAs[Long]("dim_i") <= r.getAs[Long]("dim_j")))
    assert(cov.map(_.getAs[Long]("n")).distinct.length == 1)
  }

  test("emb7: PQ distortion census is complete, exact, and non-vacuous") {
    val s = SparkEntry.configure(spark)
    val out = SparkEntry.queries("emb7_pq_distortion")(s, dir).collect()
    assert(out.map(_.getAs[Int]("m")).sorted.toSeq == Seq(0, 1, 2, 3))
    val embSrc = s.read.parquet(s"$dir/embeddings.parquet")
    val nVecs = embSrc.count()
    val dim = embSrc.select(size(col("embedding"))).head().getInt(0)
    out.foreach { r =>
      assert(r.getAs[Long]("n_vectors") == nVecs, "a subspace lost vectors")
      assert(r.getAs[Long]("n_elems") == nVecs * dim / 4)
      val sse = r.getAs[Long]("sse")
      assert(sse > 0, "lossless quantization at Ks=8 — vacuous audit")
      assert(r.getAs[Long]("mse_milli") == sse * 1000 / r.getAs[Long]("n_elems"))
      assert(r.getAs[Long]("max_dist") <= sse && r.getAs[Long]("max_dist") > 0)
    }
  }
}
