package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dd15 LSH-quality audit: the gate hash-proves the counts; this spec
  * pins the MEANING — consistency with the dd2/dd6 gate entries it
  * audits, and that the recall shortfall is the real LSH
  * false-negative tail (≥0.5-Jaccard pairs that genuinely share no
  * band), not an accounting bug.
  */
class LshQualitySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  private lazy val audit = SparkEntry.queries("dd15_lsh_quality")(spark, dir).head

  test("audit counts are internally consistent and tie out to dd2") {
    val (na, nl, nb) = (audit.getAs[Long]("n_anchor_pairs"),
      audit.getAs[Long]("n_lsh_pairs"), audit.getAs[Long]("n_both"))
    assert(nb <= na && nb <= nl)
    assert(audit.getAs[Long]("lsh_only") == nl - nb)
    assert(audit.getAs[Long]("anchor_only") == na - nb)
    assert(audit.getAs[Long]("lsh_recall_ppm") == 1000000L * nb / na)
    // the LSH channel in the audit IS dd2's verified pair table
    assert(nl == SparkEntry.queries("dd2_minhash_lsh_pairs")(spark, dir).count())
  }

  test("the recall shortfall is non-vacuous and every miss is a true band miss") {
    assert(audit.getAs[Long]("anchor_only") > 0,
      "no band misses at sf0.01 — the audit's reason to exist went vacuous; revisit")
    // reconstruct the miss pairs: anchor-verified ≥0.5 pairs absent from dd2
    val lsh = SparkEntry.queries("dd2_minhash_lsh_pairs")(spark, dir)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val anchorPairs = SparkEntry.probeQueries("dd6_ngram_jaccard")(spark, dir)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val misses = anchorPairs -- lsh
    assert(misses.size == audit.getAs[Long]("anchor_only"))
    // each miss must share NO band signature — replay dd2's banding
    // (K=12 seeded md5-minima, 4 bands × 3 rows) on the two documents
    val docs = SparkEntry.configure(spark).read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def text(id: Long): String =
      if (id >= 2000000L) { // near-dup variant: first 90% of words
        val w = docs(id - 2000000L).split(" ")
        w.take(w.length * 9 / 10).mkString(" ")
      } else if (id >= 1000000L) docs(id - 1000000L)
      else docs(id)
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bands(id: Long): Set[(Int, String)] = {
      val w = text(id).split(" ")
      val shingles = w.sliding(3).map(_.mkString(" ")).toSeq.distinct
      val mhs = (0 until 12).map(k => shingles.map(x => md5hex(s"$k:$x")).min)
      (0 until 4).map(b => b -> md5hex((0 until 3).map(r => mhs(b * 3 + r)).mkString("|"))).toSet
    }
    misses.foreach { case (a, b) =>
      assert(bands(a).intersect(bands(b)).isEmpty,
        s"pair ($a,$b) shares a band but dd2 missed it — candidate-join bug, not LSH tail")
    }
  }
}
