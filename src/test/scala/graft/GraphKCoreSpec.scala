package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins for g5's peel loop (r19 opt, VERDICT r18 #1): the convergence
  * early-exit must be INVISIBLE — the peeled edge set equals the fixed
  * unroll's bit-for-bit, both when the fixpoint arrives before the
  * sweep budget (the early exit fires and skips whole sweeps) and when
  * the graph shrinks at every sweep (it never fires).
  */
class GraphKCoreSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def edges(pairs: (Long, Long)*) = {
    import spark.implicits._
    // symmetric frame, both orientations — kCore's e0 contract
    pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("a", "b")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("early-exit ≡ full unroll on a sweep-1-stable graph (triangle: every node deg 2)") {
    val e0 = edges((1L, 2L), (2L, 3L), (1L, 3L))
    val fast = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = true))
    val full = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = false))
    assert(fast == full && fast == rows(e0),
      s"stable triangle must survive identically: fast=$fast full=$full")
  }

  test("early-exit ≡ full unroll on a chain that shrinks at every sweep") {
    // path 1-2-3-4-5: endpoints peel each sweep; never stable until empty
    val e0 = edges((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val fast = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = true))
    val full = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = false))
    assert(fast == full, s"shrinking chain: fast=$fast full=$full")
    assert(full.isEmpty, s"a 5-path has no 2-core: $full")
  }

  test("early-exit ≡ full unroll on a mixed graph (stable core + peeling tail)") {
    // triangle {1,2,3} (the 2-core) plus a tail 3-6-7 that peels away
    val e0 = edges((1L, 2L), (2L, 3L), (1L, 3L), (3L, 6L), (6L, 7L))
    val fast = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = true))
    val full = rows(graft.queries.Graph.peelKCore(e0, k = 2, sweeps = 3, earlyExit = false))
    assert(fast == full, s"mixed graph: fast=$fast full=$full")
    assert(fast == rows(edges((1L, 2L), (2L, 3L), (1L, 3L))),
      s"only the triangle survives: $fast")
  }
}
