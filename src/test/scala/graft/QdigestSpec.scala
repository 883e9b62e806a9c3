package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{QdBuf, QdCore, QdNode}

/** Pins the q-digest kernel under dq19/sw17: the gate hash proves the
  * rank-bound flags; these pin what the flags can't see — exactness
  * below the compression threshold, the O(k) state bound under a
  * stream far larger than k, the rank-error contract under compression
  * AND under arbitrary merge topology (the mergeability claim itself),
  * and the clamp edges.
  */
class QdigestSpec extends AnyFunSuite {

  private def build(vs: Seq[Long], k: Int): Seq[QdNode] = {
    val b = vs.foldLeft(QdCore.zero)((acc, v) => QdCore.add(acc, v, k))
    QdCore.normalize(b.nodes, b.pending, k)
  }

  /** deterministic lcg values in [0, bound) */
  private def lcg(n: Int, bound: Long): Seq[Long] = {
    var x = 88172645463325252L
    (0 until n).map { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 20) % bound
    }
  }

  private def exactRank(vs: Seq[Long], a: Long): (Long, Long) =
    (vs.count(_ <= a).toLong, vs.count(_ < a).toLong)

  private def rankWithin(vs: Seq[Long], a: Long, target: Long, slack: Long): Boolean = {
    val (le, lt) = exactRank(vs.map(QdCore.clamp), a)
    le >= target - slack && lt <= target + slack
  }

  test("below the threshold the digest is exact: answers are true order statistics") {
    val k = 64
    val vs = lcg(50, 1000000L) // n < k → thr = 0 → no folding
    val items = build(vs, k)
    assert(items.length == vs.distinct.length, "no compression may happen below k")
    val sorted = vs.sorted
    (1 to vs.length).foreach { r =>
      assert(QdCore.quantile(items, r.toLong) == sorted(r - 1),
        s"rank $r: expected ${sorted(r - 1)}")
    }
  }

  test("state stays O(k) and ranks stay within eps*n on a large skewed stream") {
    val k = 128
    // heavy skew: 80% of mass in a tiny range, tail across the universe
    val vs = lcg(40000, 100L) ++ lcg(10000, QdCore.Universe)
    val items = build(vs, k)
    assert(items.length <= 3 * k + QdCore.L,
      s"digest has ${items.length} nodes — the 3k size bound is broken")
    val n = vs.length.toLong
    val slack = n * QdCore.L / k // the eps = L/k contract
    Seq(100, 500, 900, 990).foreach { p =>
      val r = math.max(1L, n * p / 1000L)
      val a = QdCore.quantile(items, r)
      assert(rankWithin(vs, a, r, slack), s"p=$p: answer $a outside eps*n of rank $r")
    }
  }

  test("merge topology is absorbed by the contract: split builds answer within bound") {
    val k = 128
    val vs = lcg(30000, QdCore.Universe)
    val n = vs.length.toLong
    val slack = n * QdCore.L / k
    // three very different merge shapes over the same data
    val whole = build(vs, k)
    val halves = QdCore.merge(
      QdBuf(build(vs.take(15000), k), Nil), QdBuf(build(vs.drop(15000), k), Nil), k).nodes
    val shards = vs.grouped(1000).map(g => QdBuf(build(g, k), Nil))
      .reduce((a, b) => QdCore.merge(a, b, k)).nodes
    Seq(100, 500, 900, 990).foreach { p =>
      val r = math.max(1L, n * p / 1000L)
      Seq("whole" -> whole, "halves" -> halves, "shards" -> shards).foreach {
        case (name, items) =>
          val a = QdCore.quantile(items, r)
          assert(rankWithin(vs, a, r, slack), s"$name p=$p: answer $a outside bound")
      }
    }
  }

  test("property: rank contract and count conservation across random streams, k, and splits") {
    import org.scalacheck.{Gen, rng}
    // generated streams across the compression regimes (n below k, at
    // the flush boundary, well above), dense duplicates, clamp-edge
    // values, and a random 2-way split re-merged — the answers must
    // stay within eps*n of the requested rank everywhere, and the
    // total count must be conserved exactly (fixed seeds, no
    // scalatestplus bridge in the offline set)
    val genCase = for {
      k <- Gen.oneOf(16, 64, 256)
      n <- Gen.oneOf(Gen.choose(1, 12), Gen.choose(100, 600), Gen.choose(3000, 6000))
      dense <- Gen.oneOf(50L, 1000L, QdCore.Universe)
      vs <- Gen.listOfN(n, Gen.frequency(
        9 -> Gen.choose(0L, dense - 1),
        1 -> Gen.oneOf(-3L, 0L, QdCore.Universe - 1, QdCore.Universe + 7)))
    } yield (k, vs)
    (1L to 30L).foreach { seed =>
      val (k, vs) = genCase.pureApply(Gen.Parameters.default, rng.Seed(seed))
      val n = vs.length.toLong
      val slack = n * QdCore.L / k + 1
      val whole = build(vs, k)
      assert(whole.map(_.c).sum == n, s"seed=$seed: count not conserved")
      val (xa, xb) = vs.splitAt(vs.length / 3)
      val merged = QdCore.merge(QdBuf(build(xa, k), Nil), QdBuf(build(xb, k), Nil), k).nodes
      assert(merged.map(_.c).sum == n, s"seed=$seed: merged count not conserved")
      // the rank assertion only DISCRIMINATES when the contract's slack
      // is tighter than the whole stream (k=16 has eps = 24/16 > 1 —
      // any answer passes, so asserting would be vacuous; r16 review)
      if (slack < n) {
        Seq(1, 250, 500, 750, 999).foreach { p =>
          val r = math.max(1L, n * p / 1000L)
          Seq("whole" -> whole, "merged" -> merged).foreach { case (name, items) =>
            val a = QdCore.quantile(items, r)
            assert(rankWithin(vs, a, r, slack),
              s"seed=$seed k=$k n=$n $name p=$p: answer $a outside eps*n of rank $r")
          }
        }
      }
    }
  }

  test("values clamp into the universe; counts are conserved through compression") {
    val k = 16
    val vs = Seq(-5L, -1L, 0L, QdCore.Universe - 1, QdCore.Universe, QdCore.Universe + 99)
    val items = build(vs ++ lcg(500, 1000L), k)
    assert(items.map(_.c).sum == (vs.length + 500).toLong,
      "compression must conserve total count")
    // rank-1 answer is the smallest clamped value's region (>= 0)
    assert(QdCore.quantile(items, 1L) >= 0L)
    // the max-rank answer cannot exceed the universe
    assert(QdCore.quantile(items, (vs.length + 500).toLong) <= QdCore.Universe - 1)
  }

  test("clampedCents preserves NULL, and the digest excludes it (r16 ADVICE)") {
    // greatest(NULL, 0) null-SKIPS in Spark, so the pre-fix spelling
    // quietly turned NULL prices into 0-cent observations; the fix keeps
    // NULL → NULL so QdAgg's Option reduce drops the row — pinned here
    // end-to-end so the count the digest carries equals count(col), not
    // count(*)
    val spark = SharedSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(Some(1.0), None, Some(2.0), None, Some(3.0)).toDF("value")
      .select(graft.functions.QdigestSketch.clampedCents("value").as("pc"))
    assert(df.filter(col("pc").isNull).count() == 2, "NULL inputs must stay NULL")
    val nodes = df.agg(graft.functions.QdigestSketch.qdSet(col("pc")).as("sk"))
      .selectExpr("aggregate(sk, 0L, (acc, x) -> acc + x.c) AS n")
      .collect()(0).getLong(0)
    assert(nodes == 3L, s"digest must ingest only the 3 non-null rows, got $nodes")
  }
}
