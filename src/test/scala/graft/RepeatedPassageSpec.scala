package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** dd16's defining guarantee: a repeated run of ≥ W tokens is caught at
  * ANY offset — including the case dd11's content-defined segmenting
  * provably misses (a passage whose words contain no boundary hash
  * fuses with its differing surroundings, so the shared text never
  * yields a shared segment).
  */
class RepeatedPassageSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("offset-shifted boundary-free passage: dd11 misses it, dd16 catches it") {
    // 15 passage words, none a CDC boundary (md5 first hex >= '4'): the
    // passage can never START a segment, so in both docs it fuses into a
    // segment that begins at a context word — and the contexts differ
    val passage = (0 until 1000).map(i => s"pw$i")
      .filter(w => md5hex(w).charAt(0) >= '4').take(15)
    assert(passage.size == 15)
    val docA = ((0 until 30).map(i => s"aa$i") ++ passage ++ (0 until 10).map(i => s"az$i"))
      .mkString(" ")
    val docB = ((0 until 40).map(i => s"bb$i") ++ passage ++ (0 until 6).map(i => s"by$i"))
      .mkString(" ")
    val docC = (0 until 50).map(i => s"cc$i").mkString(" ")
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")

    // dd11's segmentation: NO shared segment between docA and docB
    val segs = docs.select(col("doc_id"), explode(queries.Dedup.cdcSegments).as("seg"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert(segs(1L).intersect(segs(2L)).isEmpty,
      s"CDC unexpectedly shared: ${segs(1L).intersect(segs(2L))}")

    // dd16 (unsampled): the 15-token passage yields exactly 15-12+1 = 4
    // shared window fingerprints in each carrier, none in the bystander
    val out = queries.Dedup.repeatedPassageCensusOver(docs, sampled = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == Map(1L -> 4L, 2L -> 4L, 3L -> 0L), s"census: $out")
  }

  test("sampling is content-deterministic: shared passages keep identical sampled sets") {
    // the same passage must sample to the SAME fingerprint subset in
    // every document containing it — per-doc shared counts stay equal
    val passage = (0 until 400).map(i => s"qq$i") // long: sampling keeps ~1/16
    val docA = ((0 until 7).map(i => s"ha$i") ++ passage).mkString(" ")
    val docB = (passage ++ (0 until 9).map(i => s"hb$i")).mkString(" ")
    val docs = Seq((1L, docA), (2L, docB)).toDF("doc_id", "text")
    val out = queries.Dedup.repeatedPassageCensusOver(docs, sampled = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val shared = out.map(_._3).toSet
    assert(shared.size == 1 && shared.head > 0,
      s"shared sampled fingerprints must be equal and non-empty: ${out.toSeq}")
  }
}
