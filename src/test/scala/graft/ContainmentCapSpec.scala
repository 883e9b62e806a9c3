package graft

import org.scalatest.funsuite.AnyFunSuite

/** Non-vacuity pins for dd17 (stop-shingle–capped containment). The
  * gate hash proves capped-Spark ≡ capped-oracle; these pins prove the
  * cap is LIVE (it actually drops shingles on the gate corpus — an
  * always-empty stop list would pass the hash trivially) and HARMLESS
  * to the signal: planted +2M subset docs whose header assignment
  * doesn't exceed their source's (two thirds — see the dd17 scaladoc)
  * keep exact 1e6 ppm containment through the cap; the third that
  * gains a header its source lacks legitimately drops below 1e6, so
  * the pin asserts the surviving class nonEmpty, not all-planted.
  */
class ContainmentCapSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("the df cap drops the injected boilerplate shingles at gate scale") {
    val s = SparkEntry.configure(spark.newSession())
    val (total, kept) = graft.queries.Dedup.cappedShingleStats(s, dir)
    assert(kept < total,
      s"cap dropped nothing ($total distinct, $kept kept) — the stop list is vacuous")
    // the injected 14-word header yields at least a dozen high-df grams
    assert(total - kept >= 10, s"only ${total - kept} shingles capped — header not landing")
  }

  test("planted subset docs keep exact 1e6 ppm containment through the cap") {
    val s = SparkEntry.configure(spark.newSession())
    val out = SparkEntry.queries("dd17_containment_capped")(s, dir).collect()
    val planted = out.filter(r => r.getLong(0) >= 2000000L && r.getLong(4) == 1000000L)
    assert(planted.nonEmpty,
      "no planted +2M doc at exactly 1e6 ppm — the cap ate real containment signal")
  }

  test("dd18 output is bounded at K rows per contained doc on the boilerplate corpus") {
    // r15 VERDICT #4: the report cap must hold EXACTLY — ≤ K rows per
    // doc_a (so ≤ K·N total at any replication factor), rank dense in
    // 1..K, and each doc's kept set must be the top-K of dd17's full
    // report under (ppm DESC, doc_b ASC) — the bounded aggregate can't
    // silently reorder or drop a better pair.
    val s = SparkEntry.configure(spark.newSession())
    val topk = SparkEntry.queries("dd18_containment_topk")(s, dir).collect()
    val full = SparkEntry.queries("dd17_containment_capped")(s, dir).collect()
    assert(topk.nonEmpty)
    val k = 3
    val byDoc = topk.groupBy(_.getLong(0))
    byDoc.foreach { case (doc, rows) =>
      assert(rows.length <= k, s"doc $doc has ${rows.length} rows > K=$k")
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length.toLong),
        s"doc $doc ranks not dense: ${rows.map(_.getLong(1)).toSeq}")
    }
    val expected = full.groupBy(_.getLong(0)).map { case (doc, rows) =>
      doc -> rows.map(r => (r.getLong(4), r.getLong(1))) // (ppm, doc_b)
        .sortBy { case (ppm, b) => (-ppm, b) }.take(k).toSeq
    }
    byDoc.foreach { case (doc, rows) =>
      val got = rows.sortBy(_.getLong(1)).map(r => (r.getLong(3), r.getLong(2))).toSeq
      assert(got == expected(doc), s"doc $doc top-$k mismatch: $got vs ${expected(doc)}")
    }
    assert(byDoc.keySet == expected.keySet)
  }

  test("dd18's top-K is a bounded aggregate, never a window over the pair stream") {
    // the scale claim: k rows per (doc x partition) reach the exchange
    // via ObjectHashAggregate partials — a row_number window would drag
    // every verified pair through one per-doc sort (the TopK.scala
    // anti-pattern the operator exists to avoid)
    // throwaway session: AQE off only here (no restore needed — the
    // session is discarded; r16 review #4 dropped a dead finally that
    // hardcoded "true" while claiming to restore)
    val s = SparkEntry.configure(spark.newSession())
    s.conf.set("spark.sql.adaptive.enabled", "false")
    val plan = SparkEntry.queries("dd18_containment_topk")(s, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in dd18's plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate"),
      "top-K must run as the bounded typed aggregate")
  }
}
