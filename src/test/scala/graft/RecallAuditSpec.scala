package graft

import org.scalatest.funsuite.AnyFunSuite

/** ann11 recall audit: the gate hash-proves the counts vs DuckDB; this
  * spec pins that the audit's channels ARE the family's gate entries —
  * n_hit must equal |top-5 of ann1 ∩ ann2's IVF top-5| recomputed from
  * those entries' own outputs — and that the shortfall is non-vacuous
  * (single-probe IVF really loses boundary neighbors at sf0.01).
  */
class RecallAuditSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("audit ties out to ann1 (exact) and ann2 (IVF) gate outputs") {
    val audit = SparkEntry.queries("ann11_recall_audit")(spark, dir).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"), r.getAs[Long]("recall_ppm"))).toMap
    assert(audit.size == 3)
    val exact5 = SparkEntry.queries("ann1_topk_exact")(spark, dir).collect()
      .filter(_.getAs[Int]("rank") <= 5)
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val ivf5 = SparkEntry.queries("ann2_topk_ivf")(spark, dir).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    audit.foreach { case (q, (nExact, nHit, ppm)) =>
      assert(nExact == exact5(q).size)
      val want = (exact5(q) intersect ivf5.getOrElse(q, Set.empty)).size
      assert(nHit == want, s"query $q: n_hit $nHit != recomputed $want")
      assert(ppm == 1000000L * nHit / nExact)
    }
    assert(audit.values.exists(_._3 < 1000000L),
      "every query at perfect recall — the audit's reason to exist went vacuous; revisit")
  }
}
