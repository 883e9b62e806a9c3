package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AdaptiveBlocker

/** The adaptive blocker's whole contract is INVISIBILITY: whatever mix
  * of contraction, all-pairs, and segment signatures generated the
  * candidates, the verified edge set must equal the brute-force
  * { same block ∧ lev ≤ τ } pair set at rep level, and the contraction
  * map must preserve connected components. Pins (r15 VERDICT #3):
  *
  *  1. edge-set equality vs brute force on a DETERMINISTIC random-ish
  *     corpus with varied lengths (indels in play, not just
  *     substitutions) and a forced-oversized block — exercising the
  *     Pass-Join segment path's pigeonhole soundness;
  *  2. path-choice invisibility: bound=1 (everything segments) and
  *     bound=10^9 (everything all-pairs) produce identical edges on the
  *     er2 gate fixture;
  *  3. the planted low-entropy key: R-way exact replication leaves the
  *     rep-level edge count and block occupancy UNCHANGED (work scales
  *     with distinct texts, not rows), while expanded components still
  *     match the brute-force pair graph's.
  */
class AdaptiveBlockerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  /** lcg-derived corpus: deterministic, varied lengths 3..12 over a
    * 3-letter alphabet so lev≤2 pairs (including indel pairs) are dense.
    */
  private def corpus(n: Int, block: Long => Long) = {
    import spark.implicits._
    (0 until n).map { i =>
      var x = i.toLong * 6364136223846793005L + 1442695040888963407L
      def nx(): Int = { x = x * 6364136223846793005L + 1442695040888963407L; ((x >>> 33) % 1000000).toInt }
      val len = 3 + nx() % 10
      val s = new StringBuilder
      (0 until len).foreach(_ => s.append(('a' + nx() % 3).toChar))
      (i.toLong, block(i.toLong), s.toString)
    }.toDF("id", "blk", "txt")
  }

  private def bruteEdges(df: org.apache.spark.sql.DataFrame, tau: Int) = {
    // brute force at rep level: contract identical (blk, txt), then
    // all-pairs + exact verify — the definitionally-correct answer
    val reps = df.groupBy("blk", "txt").agg(min(col("id")).as("rid"))
    reps.select(col("blk"), col("rid").as("a"), col("txt").as("ta"))
      .join(reps.select(col("blk"), col("rid").as("b"), col("txt").as("tb")), Seq("blk"))
      .filter(col("a") < col("b") && levenshtein(col("ta"), col("tb")) <= tau)
      .select("a", "b")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("segment path equals brute force on a varied-length corpus (indels included)") {
    val df = corpus(220, _ % 2) // two blocks of ~110 distinct-ish strings
    val (adaptive, _) = AdaptiveBlocker.levEdges(df, Seq("blk"), "id", "txt", tau = 2, bound = 5)
    val expected = edgeSet(bruteEdges(df, 2))
    val got = edgeSet(adaptive)
    assert(expected.nonEmpty, "fixture must actually produce lev<=2 pairs")
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("bound is invisible: segments-everywhere == all-pairs-everywhere on the er2 fixture") {
    val s = SparkEntry.configure(spark.newSession())
    val c = Tables(s, "/root/testdata/sf0.001", "customer")
    val rows = c.select(col("c_custkey").as("id"),
      concat_ws("|", col("c_nationkey"), floor(col("c_acctbal"))).as("blk"),
      col("c_name").as("txt"))
    val (allPairs, _) = AdaptiveBlocker.levEdges(rows, Seq("blk"), "id", "txt", 2, Int.MaxValue)
    val (segments, _) = AdaptiveBlocker.levEdges(rows, Seq("blk"), "id", "txt", 2, 1)
    assert(edgeSet(allPairs) == edgeSet(segments))
  }

  test("property: segment path equals brute force on random corpora incl. tiny strings") {
    import org.scalacheck.{Gen, rng}
    import spark.implicits._
    // random corpora over a 2-letter alphabet with lengths 0..8 — the
    // regime where lev<=2 pairs are dense and the Pass-Join pigeonhole's
    // edge cases live (strings shorter than tau+1 get zero-length
    // segments, whose empty-string keys must degrade to all-pairs, not
    // lose pairs; length-0 strings pin the r16 ADVICE partner-length
    // floor — a (""/short) pair must survive in BOTH id orders).
    // bound=3 forces the segment path everywhere.
    val genCorpus = for {
      n <- Gen.choose(30, 80)
      rows <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 8)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
        blk <- Gen.choose(0L, 1L)
      } yield (blk, cs.mkString))
    } yield rows.zipWithIndex.map { case ((blk, txt), i) => (i.toLong, blk, txt) }
    (1L to 8L).foreach { seed =>
      val rows = genCorpus.pureApply(Gen.Parameters.default, rng.Seed(seed))
      val df = rows.toDF("id", "blk", "txt")
      val (adaptive, _) = AdaptiveBlocker.levEdges(df, Seq("blk"), "id", "txt", 2, 3)
      val got = edgeSet(adaptive)
      val expected = edgeSet(bruteEdges(df, 2))
      assert(got == expected,
        s"seed=$seed missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
    }
  }

  test("empty strings in an oversized block edge with short partners in both id orders") {
    // r16 ADVICE: the probe side's partner-length floor was 1, so the
    // ("", s) candidate with len(s) <= tau was only generated with the
    // non-empty string as index side, and a < b then dropped the edge
    // whenever the empty string's rep held the SMALLER id. Both
    // orderings, segment path forced (bound=1), and filler rows push
    // the block over any occupancy heuristic.
    import spark.implicits._
    // two BLOCKS so the empty string is a distinct rep in each — in one
    // it holds the smaller id, in the other the larger (same-block empty
    // strings would contract to one class and never need the probe)
    val df = Seq(
      (1L, 0L, ""), (2L, 0L, "ab"), // empty rep has the SMALLER id
      (5L, 1L, "cd"), (6L, 1L, "")) // and the LARGER id
      .toDF("id", "blk", "txt")
    val (edges, _) = AdaptiveBlocker.levEdges(df, Seq("blk"), "id", "txt", tau = 2, bound = 1)
    val got = edgeSet(edges)
    assert(got.contains((1L, 2L)) && got.contains((5L, 6L)),
      s"both empty/short orientations must edge: $got")
    assert(got == edgeSet(bruteEdges(df, 2)))
  }

  test("NULL keys: no edges, and a left-join expansion keeps the rows as singletons") {
    // r16 review #2: SQL equality semantics — a NULL block key (or NULL
    // text) matches nothing, not even another NULL, so such rows edge
    // with nobody and the documented left-join + coalesce expansion
    // surfaces them as their own singletons instead of dropping them
    import spark.implicits._
    val df = Seq(
      (1L, Option(0L), Option("abc")), (2L, Option(0L), Option("abd")),
      (3L, Option.empty[Long], Option("abc")), (4L, Option.empty[Long], Option("abc")),
      (5L, Option(0L), Option.empty[String]), (6L, Option(0L), Option.empty[String]))
      .toDF("id", "blk", "txt")
    val (edges, classes) = AdaptiveBlocker.levEdges(df, Seq("blk"), "id", "txt", 2, 16)
    assert(edgeSet(edges) == Set((1L, 2L)), "only the non-null pair may edge")
    val cc = graft.operators.ConnectedComponents.run(edges)
    val expanded = df
      .join(classes.join(cc.select(col("node").as("rep"), col("cluster")), Seq("rep"), "left")
        .select(col("blk"), col("txt"), coalesce(col("cluster"), col("rep")).as("cluster")),
        Seq("blk", "txt"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expanded == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 6L),
      s"null-keyed rows must be their own singletons: $expanded")
  }

  test("planted low-entropy key: replication leaves rep-level work and edges unchanged") {
    import spark.implicits._
    val baseN = 60
    val base = corpus(baseN, _ => 0L) // ONE block — worst-case key entropy
    // R-way exact replication with fresh ids ABOVE the originals, so
    // every class's min id is the original row's id
    val r = 8
    val replicated = base.as[(Long, Long, String)].flatMap { case (id, blk, txt) =>
      (0 until r).map(cp => (id + cp.toLong * 1000L, blk, txt))
    }.toDF("id", "blk", "txt")
    val (e1, c1) = AdaptiveBlocker.levEdges(base, Seq("blk"), "id", "txt", 2, 16)
    val (eR, cR) = AdaptiveBlocker.levEdges(replicated, Seq("blk"), "id", "txt", 2, 16)
    // contraction: class count == distinct texts, occupancy independent of R
    assert(cR.count() == c1.count())
    // rep-level edges identical — the candidate join never saw the copies
    assert(edgeSet(e1) == edgeSet(eR))
    // and the expansion is component-exact: components of the replicated
    // pair graph, computed brute-force, equal rep components expanded
    val cc = graft.operators.ConnectedComponents.run(eR)
    val expanded = replicated
      .join(cR.join(cc.select(col("node").as("rep"), col("cluster")), Seq("rep"), "left")
        .select(col("blk"), col("txt"),
          coalesce(col("cluster"), col("rep")).as("cluster")), Seq("blk", "txt"))
      .select(col("id"), col("cluster"))
    val bruteAll = {
      val a = replicated.select(col("blk"), col("id").as("a"), col("txt").as("ta"))
      val b = replicated.select(col("blk"), col("id").as("b"), col("txt").as("tb"))
      a.join(b, Seq("blk"))
        .filter(col("a") < col("b") && levenshtein(col("ta"), col("tb")) <= 2)
        .select("a", "b")
    }
    val ccBrute = graft.operators.ConnectedComponents.run(bruteAll)
    val expectedClusters = replicated
      .join(ccBrute.select(col("node").as("id"), col("cluster").as("c2")), Seq("id"), "left")
      .select(col("id"), coalesce(col("c2"), col("id")).as("c2"))
    val joined = expanded.join(expectedClusters, Seq("id"))
      .filter(col("cluster") =!= col("c2"))
    assert(joined.count() == 0, "expanded rep components must equal brute-force components")
  }
}
