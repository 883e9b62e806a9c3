package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-bound check for the HLL census (tx7). Since r06 the gate itself
  * verifies the sketch (exact distinct counts + within-15% flags,
  * hash-compared against literal TRUE in the oracle); this spec keeps
  * the direct claim on the RAW estimates — every per-language estimate
  * within the documented HyperLogLog++ relative error of the exact
  * distinct count — plus an all-flags-true replay of the gate entry.
  */
class TextCensusSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("tx16: PMI scores replay from raw counts; ordering and support hold") {
    val s = SparkEntry.configure(spark)
    val got = SparkEntry.queries("tx16_pmi_collocations")(s, dir).collect()
    assert(got.length == 20)
    // raw counts straight off the corpus
    val texts = Tables(s, dir, "documents").select("text").collect().map(_.getString(0))
    val uni = texts.flatMap(_.split(" ", -1)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bi = texts.map(_.split(" ", -1)).filter(_.length >= 2)
      .flatMap(w => w.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nu = BigInt(uni.values.sum)
    val nb = BigInt(bi.filter(_._2 >= 5).values.sum)
    var prev = Long.MaxValue
    got.foreach { r =>
      val (w1, w2, cab, ppm) = (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("c_ab"), r.getAs[Long]("pmi_ppm"))
      assert(cab == bi((w1, w2)) && cab >= 5)
      val want = (BigInt(1000000) * cab * nu * nu) / (nb * uni(w1) * uni(w2))
      assert(BigInt(ppm) == want, s"($w1,$w2): got $ppm want $want")
      assert(ppm <= prev, "not sorted by pmi desc"); prev = ppm
    }
    // top-20 really is the global top: no excluded candidate beats the floor
    val floor = got.map(_.getAs[Long]("pmi_ppm")).min
    val inTop = got.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"))).toSet
    bi.filter(_._2 >= 5).foreach { case (p, cab) =>
      if (!inTop(p)) {
        val ppm = (BigInt(1000000) * cab * nu * nu) / (nb * uni(p._1) * uni(p._2))
        assert(ppm <= BigInt(floor), s"excluded $p scores $ppm above floor $floor")
      }
    }
  }

  test("tok1: BPE merges on a hand-computed micro-corpus, incl. adjacent-pair greed") {
    import spark.implicits._
    // vocab: abab×3, ab×2, ba×1. Merge 1 must be (a,b) with weighted
    // count 3·2+2·1 = 8 — which REQUIRES both (a,b) occurrences inside
    // "abab" to merge in one pass (" a  b  a  b " → " ab  ab "): merge 2
    // is then (ab,ab)×3; a delimiter-eating single-space encoding would
    // under-merge "abab" to [ab,a,b] and learn (ab,a) instead.
    val docs = Seq("abab abab abab ab ab ba").toDF("text")
    val out = graft.queries.Text.bpeMergesOver(docs, 3)
      .collect().map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("pa"),
        r.getAs[String]("pb"), r.getAs[Long]("n_occurrences")))
    assert(out.toSeq == Seq((1L, "a", "b", 8L), (2L, "ab", "ab", 3L), (3L, "b", "a", 1L)))
  }

  test("tok5: convergence stops when no pair clears min frequency; minFreq=1 prefix equals tok1's trainer") {
    import spark.implicits._
    // "abc abc": vocab {abc: 2} → (a,b) n=2, then (ab,c) n=2, then NO
    // pairs remain — the loop must stop at 2 learned merges of 16
    val sat = Seq("abc abc").toDF("text")
    val out = graft.queries.Text.bpeMergesConverging(sat, 16, 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, "a", "b", 2L), (2L, "ab", "c", 2L)),
      s"saturating corpus must learn exactly 2 merges: ${out.toSeq}")
    // the min-frequency gate itself: a pair seen once is not learnable
    val single = Seq("xy").toDF("text")
    assert(graft.queries.Text.bpeMergesConverging(single, 16, 2).count() == 0L)
    // and at minFreq=1 the converging trainer is EXACTLY tok1's
    // unrolled trainer — same winners, same counts, same order
    val docs = Seq("abab abab abab ab ab ba").toDF("text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("pa"),
        r.getAs[String]("pb"), r.getAs[Long]("n_occurrences"))).toSeq
    assert(rows(graft.queries.Text.bpeMergesConverging(docs, 3, 1)) ==
      rows(graft.queries.Text.bpeMergesOver(docs, 3)))
  }

  test("tok2: applying learned merges segments the micro-corpus to hand-computed counts") {
    import spark.implicits._
    // merges after 3 rounds: (a,b), (ab,ab), (b,a). Segmentations:
    // abab→[abab], ab→[ab], ba→[ba] — every word ONE subword, which
    // again requires in-word adjacent-pair greed ("abab" must reach
    // [ab][ab] in round 1 for (ab,ab) to be learnable/applicable).
    val docs = Seq((1L, "abab abab abab ab ab ba")).toDF("doc_id", "text")
    val out = graft.queries.Text.bpeApplyOver(docs, 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_chars_w") == 18L)
    assert(r.getAs[Long]("n_subwords") == 6L)
  }

  test("tok3: holdout coverage is internally consistent and merges generalize") {
    val rows = SparkEntry.queries("tok3_vocab_coverage")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nc, ns) = (r.getAs[Long]("n_chars_w"), r.getAs[Long]("n_subwords"))
      // subwords can't outnumber chars, and merges must compress: ratio > 1
      assert(ns <= nc && ns >= r.getAs[Long]("n_words"))
      assert(r.getAs[Long]("chars_per_subword_milli") == 1000 * nc / ns)
      assert(r.getAs[Long]("chars_per_subword_milli") > 1000,
        s"${r.getAs[String]("lang")}: learned merges never applied on holdout")
      assert(r.getAs[Long]("n_merged_subwords") > 0)
      // shared alphabet ⇒ the train inventory covers the holdout here;
      // a nonzero OOV on this corpus means the inventory join broke
      assert(r.getAs[Long]("oov_subwords") == 0L)
    }
  }

  test("tok3: inventory OOV fires for symbols absent from the train split") {
    import spark.implicits._
    // train (even ids) has alphabet {a,b}; holdout (odd) introduces 'z':
    // replaying the entry's inventory probe on a micro-corpus must
    // count z-subwords as OOV (the gate corpus can't exercise this).
    val docs = Seq((0L, "ab ab ab"), (1L, "az zb")).toDF("doc_id", "text")
    val (onerow, applied) = graft.queries.Text.bpeRules(
      docs.filter(col("doc_id") % 2 === 0), 1)
    def subs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(split(col("text"), " ")).as("w"))
      .withColumn("syms",
        concat(lit(" "), rtrim(regexp_replace(col("w"), "(.)", "$1  ")), lit(" ")))
      .crossJoin(broadcast(onerow))
      .select(explode(split(trim(expr(applied)), "  ")).as("sub"))
    val inv = subs(docs.filter(col("doc_id") % 2 === 0)).distinct()
    val oov = subs(docs.filter(col("doc_id") % 2 === 1))
      .join(inv, Seq("sub"), "left_anti").collect().map(_.getString(0))
    assert(oov.count(_ == "z") == 2, s"expected two OOV 'z' symbols, got ${oov.toSeq}")
  }

  test("tx7: every in-gate sketch flag is true") {
    val out = SparkEntry.queries("tx7_census_hll")(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      Seq("texts_ok", "sources_ok").foreach(c =>
        assert(r.getAs[Boolean](c), s"${r.getAs[String]("lang")}: $c false"))
    }
  }

  test("approx_count_distinct census stays within the default HLL++ error bound") {
    val both = SparkEntry.configure(spark).read
      .parquet(s"$dir/documents.parquet")
      .groupBy("lang")
      .agg(
        countDistinct(md5(col("text"))).as("texts"),
        countDistinct(col("source")).as("sources"),
        approx_count_distinct(md5(col("text"))).as("a_texts"),
        approx_count_distinct(col("source")).as("a_sources"))
      .collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("texts"), r.getAs[Long]("sources")),
          (r.getAs[Long]("a_texts"), r.getAs[Long]("a_sources")))).toMap
    assert(both.nonEmpty)
    // default rsd is 5%; allow 3 sigma plus integer slack for small groups
    def within(a: Long, e: Long) = math.abs(a - e) <= math.max(3, 0.15 * e)
    both.foreach { case (lang, ((t, s), (at, as))) =>
      assert(within(at, t), s"$lang texts: approx $at vs exact $t")
      assert(within(as, s), s"$lang sources: approx $as vs exact $s")
    }
  }
}
