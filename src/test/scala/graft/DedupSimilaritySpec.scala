package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{TopHit, TopHitP, TopKAgg, TopKPayloadAgg}
import graft.queries.{Dedup, Similarity}

/** Determinism/semantics checks for the LLM-pipeline operators, run at
  * sf0.001 (the smoke scale): the injected duplicates MUST be found, and
  * the TopK aggregator must behave like sort-then-take under any
  * reduce/merge interleaving.
  */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    // ++ probeQueries: dd6/dd12 are ladder probes since r18, still
    // spec-driven here at sf0.001 where their shape is safe
    SparkEntry.allQueries(name)(spark, dir).collect()

  test("ann12: the SQ8 index is genuinely byte-width; re-ranked scores are exact") {
    import org.apache.spark.sql.types.{ArrayType, ByteType}
    val idx = Similarity.sq8Index(spark, dir)
    val et = idx.schema("code_i8").dataType.asInstanceOf[ArrayType].elementType
    assert(et == ByteType, s"index must store int8 codes, got $et")
    // the re-rank is full-precision: every (query, neighbor) ann12 shares
    // with ann1's exact top-10 must carry the identical exact score
    val exact = run("ann1_topk_exact")
      .map(r => (r.getLong(0), r.getAs[Long]("neighbor_id")) -> r.getAs[Long]("score")).toMap
    val sq8 = run("ann12_topk_sq8")
    val shared = sq8.filter(r => exact.contains((r.getLong(0), r.getAs[Long]("neighbor_id"))))
    assert(shared.nonEmpty, "zero overlap with the exact top-10 despite R=20 candidates")
    shared.foreach { r =>
      assert(exact((r.getLong(0), r.getAs[Long]("neighbor_id"))) == r.getAs[Long]("score"),
        s"re-ranked score differs from exact for $r")
    }
  }

  test("TopKAgg reduce-fold equals sort-then-take, ties broken by id") {
    val agg = new TopKAgg(3)
    val hits = Seq(TopHit(5, 9), TopHit(7, 2), TopHit(5, 1), TopHit(7, 8), TopHit(1, 0))
    val folded = hits.foldLeft(agg.zero)(agg.reduce)
    val expected = hits.sortBy(h => (-h.score, h.id)).take(3)
    assert(folded == expected)
    assert(folded == List(TopHit(7, 2), TopHit(7, 8), TopHit(5, 1)))
  }

  test("TopKAgg merge is consistent with folding everything on one side") {
    val agg = new TopKAgg(4)
    val a = Seq(TopHit(9, 1), TopHit(3, 2), TopHit(3, 9))
    val b = Seq(TopHit(8, 4), TopHit(3, 1), TopHit(10, 7))
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == (a ++ b).sortBy(h => (-h.score, h.id)).take(4))
  }

  test("TopKPayloadAgg reduce-fold equals sort-then-take; payload never affects ranking") {
    val agg = new TopKPayloadAgg(3)
    val hits = Seq(
      TopHitP(5, 9, 0.59), TopHitP(7, 2, 0.72), TopHitP(5, 1, 0.51),
      TopHitP(7, 8, 0.78), TopHitP(1, 0, 0.10))
    val folded = hits.foldLeft(agg.zero)(agg.reduce)
    assert(folded == hits.sortBy(h => (-h.score, h.id)).take(3))
    // same (score, id) stream as the TopKAgg test → same selected ids
    assert(folded.map(_.id) == List(2L, 8L, 1L))
  }

  test("TopKPayloadAgg merge is consistent with folding everything on one side") {
    val agg = new TopKPayloadAgg(4)
    val a = Seq(TopHitP(9, 1, 0.9), TopHitP(3, 2, 0.3), TopHitP(3, 9, 0.3))
    val b = Seq(TopHitP(8, 4, 0.8), TopHitP(3, 1, 0.3), TopHitP(10, 7, 1.0))
    val merged = agg.merge(a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged == (a ++ b).sortBy(h => (-h.score, h.id)).take(4))
  }

  test("exact dedup groups every injected +1M copy with its original as keeper") {
    val groups = run("dd1_exact_dedup")
      .map(r => (r.getAs[Long]("keeper_doc_id"), r.getAs[Long]("n_copies")))
    val dups = groups.filter(_._2 == 2L)
    assert(dups.nonEmpty)
    assert(dups.forall(_._1 < 1000000L)) // keeper is always the original id
  }

  test("MinHash-LSH surfaces every exact copy as a jaccard-1.0 pair") {
    val pairs = run("dd2_minhash_lsh_pairs")
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("jaccard")))
    val exactCopies = pairs.filter { case (a, b, _) => a < 1000000L && b == a + 1000000L }
    assert(exactCopies.nonEmpty)
    assert(exactCopies.forall(_._3 == 1.0)) // identical shingle sets
    // near-copies (+2M truncations) are found with high-but-<1 similarity
    val nearCopies = pairs.filter { case (a, b, _) => a < 1000000L && b == a + 2000000L }
    assert(nearCopies.nonEmpty)
    assert(nearCopies.forall { case (_, _, j) => j >= 0.5 && j < 1.0 })
  }

  test("ds6: every dup cluster lands in ONE split, and the cluster key changed someone's split") {
    val rows = run("ds6_cluster_safe_split")
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"), r.getAs[String]("split")))
    val byCluster = rows.groupBy(_._2).filter(_._2.length > 1)
    assert(byCluster.nonEmpty, "fixture must produce multi-member clusters")
    byCluster.foreach { case (c, members) =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster $c split across ${members.map(_._3).distinct.mkString(",")}")
    }
    // non-vacuity: for at least one multi-member cluster member, splitting
    // by the doc's OWN id hash would have disagreed — the cluster grain
    // is doing real work, not coinciding with per-doc hashing
    def docSplit(id: Long): String = {
      // same gate as the query: first two hex chars of md5("csplit:"+id)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"csplit:$id".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString
      if (hex < "26") "test" else "train"
    }
    val changed = byCluster.values.flatten.filter { case (id, c, split) =>
      id != c && docSplit(id) != split
    }
    assert(changed.nonEmpty, "no member's split differs from its own-id hash — vacuous pin")
  }

  test("dd6: two-anchor blocking catches a body-copy whose opening was rewritten") {
    import spark.implicits._
    // same 40-word body under DIFFERENT openings: the r9 prefix-only
    // block keyed on the opening trigram and produced no candidate for
    // this pair; the body anchor (min salted shingle md5) collides as
    // long as the minimizing shingle sits in the shared body (md5 is
    // fixed, so this plant is deterministic forever)
    val body = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do " +
      "eiusmod tempor incididunt ut labore et dolore magna aliqua enim ad " +
      "minim veniam quis nostrud exercitation ullamco laboris nisi aliquip " +
      "ex ea commodo consequat duis aute irure in reprehenderit voluptate")
    val d1 = s"alpha beta gamma $body"
    val d2 = s"zeta eta theta iota $body" // opening trigram differs
    val d3 = "completely unrelated text about other matters entirely " +
      "with no overlap whatsoever in any of its word trigrams at all"
    val c = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(c).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // and the openings really differ — the catch is the body anchor's
    assert(d1.split(" ").take(3).toSeq != d2.split(" ").take(3).toSeq)
  }

  test("SimHash of an exact copy equals the original's") {
    val sh = run("dd3_simhash").map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("simhash"))).toMap
    val originalsWithCopy = sh.keys.filter(id => id < 1000000L && sh.contains(id + 1000000L))
    assert(originalsWithCopy.nonEmpty)
    originalsWithCopy.foreach(id => assert(sh(id) == sh(id + 1000000L)))
  }

  test("brute-force top-k: per-query scores are non-increasing and ranks dense") {
    val rows = run("ann1_topk_exact")
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank"), r.getAs[Long]("score")))
    assert(rows.length == 30) // 3 queries × k=10
    rows.groupBy(_._1).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 10))
      assert(sorted.sliding(2).forall { case Array(x, y) => x._3 >= y._3 })
    }
  }

  test("IVF top-k returns results from the query's own bucket only (subset of brute-force corpus)") {
    val rows = run("ann2_topk_ivf")
    assert(rows.length == 15) // 3 queries × k=5
  }

  test("cosine top-k plan aggregates map-side — no corpus-wide window exchange") {
    val plan = SparkEntry.queries("ann3_topk_cosine")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("Window"), "ann3 must not rank via a row_number window")
  }

  test("cosine top-k ranks on the quantized milli-cosine; payload stays consistent") {
    val rows = run("ann3_topk_cosine").map(r =>
      (r.getAs[Long]("query_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("score"), r.getAs[Double]("cosine")))
    assert(rows.length == 30) // 3 queries × k=10
    rows.foreach { case (_, _, s, c) =>
      assert(s == math.floor(c * 1000).toLong) // score IS the quantized payload
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    rows.groupBy(_._1).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 10))
      assert(sorted.sliding(2).forall { case Array(x, y) => x._3 >= y._3 })
    }
  }

  test("incremental near-dup equals dd2's pairs restricted to corpus x batch") {
    def pairs(name: String) = run(name)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs("dd2_minhash_lsh_pairs")
      .filter { case (a, b, _) => a < 1000000L && b >= 1000000L }
    val inc = pairs("dd10_incremental_neardup")
    assert(inc == full, s"incremental diverged: ${inc.size} vs ${full.size} pairs")
    assert(inc.nonEmpty, "planted batch duplicates must surface")
    // every planted exact copy (+1M of a %7 doc) must match its original
    inc.foreach { case (a, b, j) => assert(a < 1000000L && b >= 1000000L && j >= 0.5) }
  }

  test("cur3: one winner per cluster, richest member wins, planted copies lose to their source") {
    val out = run("cur3_canonical_pick")
    assert(out.nonEmpty)
    val byCluster = out.groupBy(_.getAs[Long]("cluster_id"))
    byCluster.foreach { case (c, rs) =>
      val kept = rs.filter(_.getAs[Boolean]("is_kept"))
      assert(kept.length == 1, s"cluster $c elected ${kept.length} winners")
      val k = kept.head
      assert(rs.forall(_.getAs[Long]("kept_doc_id") == k.getAs[Long]("doc_id")),
        s"cluster $c: kept_doc_id disagrees with the is_kept row")
      val best = rs.map(r => (-r.getAs[Long]("score"), r.getAs[Long]("doc_id"))).min
      assert((-k.getAs[Long]("score"), k.getAs[Long]("doc_id")) == best,
        s"cluster $c: winner is not (max score, min doc_id)")
      assert(rs.forall(_.getAs[Long]("cluster_size") == rs.length))
    }
    // non-vacuous: multi-member clusters exist, so drops actually happen
    assert(byCluster.exists(_._2.length > 1), "no multi-member cluster — election vacuous")
    // a +1M exact copy clustered with anything never wins: its source is in
    // the same cluster with an identical score and a smaller doc_id
    val clusteredCopies = out.filter { r =>
      val id = r.getAs[Long]("doc_id")
      id >= 1000000L && id < 2000000L && r.getAs[Long]("cluster_id") != id
    }
    assert(clusteredCopies.nonEmpty)
    clusteredCopies.foreach(r => assert(!r.getAs[Boolean]("is_kept"),
      s"exact copy ${r.getAs[Long]("doc_id")} won its cluster"))
  }

  test("dd12: planted prefix docs are fully contained in their source; copies contain both ways") {
    val out = run("dd12_containment")
    assert(out.nonEmpty)
    val pairs = out.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Long]("containment_ppm")).toMap
    // every +2M prefix doc long enough to shingle: its set is a true
    // subset of its source's → containment exactly 1e6, and the pair
    // must survive prefix filtering (no false negatives)
    val prefixPairs = pairs.keys.filter { case (a, b) => a >= 2000000L && a - 2000000L == b }
    assert(prefixPairs.nonEmpty, "no prefix-doc containment pairs found")
    prefixPairs.foreach(p => assert(pairs(p) == 1000000L, s"prefix pair $p not fully contained"))
    // exact copies (+1M) contain their source in BOTH directions
    val copyAB = pairs.keys.filter { case (a, b) => a >= 1000000L && a < 2000000L && a - 1000000L == b }
    assert(copyAB.nonEmpty, "no exact-copy containment pairs found")
    copyAB.foreach { case (a, b) =>
      assert(pairs((a, b)) == 1000000L && pairs.get((b, a)).contains(1000000L),
        s"exact copy ($a,$b) not mutually contained")
    }
    // thresholding actually applied
    out.foreach(r => assert(r.getAs[Long]("containment_ppm") >= 800000L))
  }

  test("emb4: nearest sibling is the true argmin of the recomputed distance matrix") {
    val audit = run("emb3_cluster_audit").map(r =>
      r.getAs[Long]("centroid_id") -> r.getAs[Long]("mean_dist")).toMap
    val out = run("emb4_centroid_separation")
    assert(out.nonEmpty && out.length == audit.size,
      "separation audit must cover every trained centroid")
    // emb4's min_sqdist must be consistent pairwise: the distance is
    // symmetric, so A's min through B implies B's min is <= that value
    val minBy = out.map(r => r.getAs[Long]("centroid_id") ->
      (r.getAs[Long]("nearest_id"), r.getAs[Long]("min_sqdist"))).toMap
    minBy.foreach { case (a, (b, d)) =>
      assert(a != b && d >= 0)
      assert(minBy(b)._2 <= d, s"centroid $b claims a min above its incoming distance $d")
    }
  }

  test("emb3: audit covers every vector once and its stats are internally consistent") {
    val out = run("emb3_cluster_audit")
    assert(out.nonEmpty)
    val nVecs = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.map(_.getAs[Long]("n_members")).sum == nVecs,
      "cluster member counts do not cover the corpus exactly")
    out.foreach { r =>
      val (n, inertia) = (r.getAs[Long]("n_members"), r.getAs[Long]("inertia"))
      val (mean, max) = (r.getAs[Long]("mean_dist"), r.getAs[Long]("max_dist"))
      assert(n > 0 && inertia >= 0)
      assert(mean == inertia / n, s"mean_dist disagrees with inertia/n for ${r}")
      assert(max >= mean, "max member distance below the mean")
    }
  }

  test("ann8: every hit shares the query's label, and post-filtering ann1 would lose hits") {
    val labels = spark.read.parquet(s"$dir/embeddings.parquet").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val out = run("ann8_topk_filtered")
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(labels(r.getAs[Long]("neighbor_id")) == labels(r.getAs[Long]("query_id")),
        s"cross-label hit leaked through the pre-filter: $r")
    }
    // the predicate must BIND: the unfiltered exact top-k (ann1) carries
    // cross-label neighbors for at least one query, i.e. post-filtering
    // that shortlist would return fewer than k — the recall loss the
    // pre-filter spelling exists to avoid
    val unfiltered = run("ann1_topk_exact")
    assert(unfiltered.exists { r =>
      labels(r.getAs[Long]("neighbor_id")) != labels(r.getAs[Long]("query_id"))
    }, "vacuous: the unfiltered top-k is already label-pure at smoke scale")
  }

  test("dd13: kept set is an independent set at radius ε; every drop has an earlier ε-neighbor") {
    val out = run("dd13_semantic_dedup")
    val kept = out.filter(_.getAs[Boolean]("is_kept")).map(_.getAs[Long]("vec_id")).toSet
    val dropped = out.filterNot(_.getAs[Boolean]("is_kept")).map(_.getAs[Long]("vec_id")).toSet
    assert(kept.nonEmpty && dropped.nonEmpty, "vacuous: ε never fired at smoke scale")
    val cluster = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    // recompute quantized cosine straight from the parquet — no reuse of
    // the entry's own kernels, so a dot/norm bug cannot self-certify
    val q = spark.read.parquet(s"$dir/embeddings.parquet").collect().map { r =>
      r.getAs[Long]("vec_id") ->
        r.getSeq[Float](r.fieldIndex("embedding")).map(x => math.floor(x.toDouble * 1000).toLong).toArray
    }.toMap
    def cosPpm(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val (na, nb) = (a.map(x => x * x).sum, b.map(x => x * x).sum)
      math.floor(dot.toDouble * 1000000.0 / math.sqrt(na.toDouble * nb.toDouble)).toLong
    }
    val byCluster = q.keys.toSeq.groupBy(cluster)
    for ((_, vs) <- byCluster; Seq(u, v) <- vs.sorted.combinations(2)) {
      val sim = cosPpm(q(u), q(v))
      if (kept(u) && kept(v))
        assert(sim < Similarity.SemDedupPpm, s"kept pair ($u, $v) violates ε: $sim")
    }
    for (v <- dropped) {
      val mates = byCluster(cluster(v)).filter(u => u < v)
      assert(mates.exists(u => cosPpm(q(u), q(v)) >= Similarity.SemDedupPpm),
        s"dropped $v has no earlier ε-neighbor in its cluster")
    }
  }

  test("dd14: pairs are canonical, cross-language, above threshold, and consistent with dd13") {
    val pairs = run("dd14_crosslang_neardup")
    assert(pairs.nonEmpty, "no cross-language near-dup at fixture scale — vacuous")
    val langOf = SparkEntry.configure(spark).read.parquet(s"$dir/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    pairs.foreach { r =>
      val (a, b) = (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))
      assert(a < b, "pair not canonical")
      assert(r.getAs[String]("lang_a") == langOf(a) && r.getAs[String]("lang_b") == langOf(b))
      assert(r.getAs[String]("lang_a") != r.getAs[String]("lang_b"))
      assert(r.getAs[Long]("cos_ppm") >= 300000L)
    }
    // consistency with dd13: a cross-lang pair at or above dd13's epsilon
    // means the HIGHER id cannot be kept (it has a lower-id epsilon-mate)
    val kept = run("dd13_semantic_dedup")
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("is_kept")).toMap
    val strong = pairs.filter(_.getAs[Long]("cos_ppm") >= 350000L)
    strong.foreach { r =>
      assert(!kept(r.getAs[Long]("vec_b")),
        s"${r.getAs[Long]("vec_b")} kept despite epsilon-mate ${r.getAs[Long]("vec_a")}")
    }
  }

  test("property fuzz: contraction equality holds on 8 seeded corpora across all three channels") {
    // the adversarial fixture below pins the known traps; this fuzz
    // sweeps random corpora with a small vocabulary (so near-dup pairs
    // are dense), random duplication factors (0–6 extra copies per
    // doc), random truncations, and occasional empty/short docs — the
    // regimes where banding, anchoring, and the expansion interact
    import spark.implicits._
    def lcg(seed: Long): () => Long = {
      var x = seed * 6364136223846793005L + 1442695040888963407L
      () => { x = x * 6364136223846793005L + 1442695040888963407L; x >>> 16 }
    }
    val vocab = Array("key", "agg", "row", "scan", "fast", "table", "hash", "part")
    (1L to 8L).foreach { seed =>
      val nx = lcg(seed)
      val base = (0 until 24).map { i =>
        val len = (nx() % 12).toInt // 0..11 words: includes empty/short
        (i.toLong, (0 until len).map(_ => vocab((nx() % vocab.length).toInt)).mkString(" "))
      }
      val rows = base.flatMap { case (id, txt) =>
        val copies = (nx() % 7).toInt
        (0 to copies).map(cp => (id + cp.toLong * 1000L, txt)) ++
          (if (nx() % 3 == 0 && txt.nonEmpty)
            Seq((id + 50000L, txt.split(" ").dropRight(1).mkString(" "))) else Nil)
      }
      val df = rows.toDF("doc_id", "text")
      def pairSet(d: org.apache.spark.sql.DataFrame) =
        d.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2))).toSet
      val cases = Seq[(String,
          org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
          org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
        ("dd2", Dedup.minhashPairsOver, Dedup.minhashPairsUncontracted),
        ("dd5", Dedup.simhashNearDupOver, Dedup.simhashNearDupUncontracted),
        ("dd6", Dedup.ngramJaccardPairsContracted, Dedup.ngramJaccardPairsUncontracted))
      cases.foreach { case (name, contracted, reference) =>
        val got = pairSet(contracted(df))
        val want = pairSet(reference(df))
        assert(got == want,
          s"seed=$seed $name: missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      }
    }
  }

  test("dd19 semantics: pairs reachable only through hot anchors are given up, cold pairs kept") {
    import spark.implicits._
    // 20 identical banner docs: EVERY anchor they own (opening trigram
    // AND body min-shingle) has df 20 > cap 16 — uncapped finds all 190
    // identity pairs, capped must find none of them. The cold pair's
    // anchors have df 2 and must survive in both.
    val banner = (0 until 20).map(i => (100L + i, "promo banner follows alpha beta gamma"))
    val cold = Seq(
      (1L, "unique document about spark execution engines"),
      (2L, "unique document about spark execution engines today"))
    val c = (banner ++ cold).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = pairs(graft.queries.Dedup.ngramJaccardCappedOver(c))
    val uncapped = pairs(graft.queries.Dedup.ngramJaccardPairsUncontracted(c))
    assert(uncapped.contains((1L, 2L)) && capped.contains((1L, 2L)),
      "cold-anchor near-dup pair must survive the cap")
    assert(uncapped.count(p => p._1 >= 100L) == 190,
      "uncapped must pair the whole banner clique")
    assert(!capped.exists(p => p._1 >= 100L),
      s"hot-anchor-only pairs must be given up: ${capped.filter(_._1 >= 100L).take(5)}")
    assert(capped.subsetOf(uncapped), "the cap may only REMOVE pairs")
  }

  test("dd19 r19 spelling: merged census-explosion ≡ join spelling below the cap; " +
    "only the CAPPED path explodes (skew guard)") {
    import spark.implicits._
    // every anchor here has df ≤ 3 ≪ cap 16, so the cap never bites and
    // the capped pipeline (one groupBy: collect set, size-filter,
    // explode ordered pairs) must produce EXACTLY the uncapped
    // reference's pairs — which, per the r19 skew guard (VERDICT r18
    // #9), is the distributed anchor self-join spelling. Equality
    // below the cap pins the merged census (count(1) ≡ set size), the
    // explosion ≡ join multiset, and the shared DISTINCT at once.
    val warm = Seq(
      (10L, "warm cluster doc alpha beta"),
      (11L, "warm cluster doc alpha gamma"),
      (12L, "warm cluster doc alpha delta"))
    val cold = Seq(
      (1L, "unique document about spark execution engines"),
      (2L, "unique document about spark execution engines today"))
    val c = (warm ++ cold).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val capped = pairs(graft.queries.Dedup.ngramJaccardCappedOver(c))
    val reference = pairs(graft.queries.Dedup.ngramJaccardPairsUncontracted(c))
    assert(reference.nonEmpty, "vacuous fixture — no reference pairs")
    assert(capped == reference,
      s"below the cap the spellings must agree: missing=${(reference -- capped).take(3)} " +
        s"extra=${(capped -- reference).take(3)}")
    // plan-shape guard: the set-explosion (flatten(transform(...)) over a
    // collected member set) may appear ONLY under a df cap — an uncapped
    // caller concentrating a hot anchor's member set into one row is the
    // §2 skew hazard the guard exists for
    val cappedPlan = graft.queries.Dedup.ngramJaccardCappedOver(c)
      .queryExecution.optimizedPlan.toString
    val uncappedPlan = graft.queries.Dedup.ngramJaccardPairsUncontracted(c)
      .queryExecution.optimizedPlan.toString
    assert(cappedPlan.contains("flatten(transform"),
      "capped path lost its set-explosion spelling")
    assert(!uncappedPlan.contains("flatten(transform"),
      "UNCAPPED path must not set-explode (skew guard, VERDICT r18 #9)")
  }

  test("contraction invisibility: dd2/dd5/dd6 pair sets equal the uncontracted " +
    "pipelines on an N-way replicated corpus with nulls, empties, and short docs") {
    // r16 VERDICT #1: exact-dup contraction applied to the near-dup
    // channels must be INVISIBLE — pair-for-pair, score-for-score. The
    // corpus is adversarial on purpose: verbatim N-way replication (the
    // ScaleGen sf10 shape whose band-bucket inflation the contraction
    // exists to kill), genuine near-dups across classes, sub-3-word docs
    // (present in dd5's sweep, absent from dd2/dd6's), empty and NULL
    // text, and a word-permuted pair (same SimHash, different class).
    import spark.implicits._
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today"),
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 0
      (2L, "completely different text about training data pipelines at scale"),
      (3L, "short doc"), // < 3 words: no shingles, still simhashes
      (4L, ""), // empty: no shingles, simhash of [""]
      (5L, null.asInstanceOf[String]), // NULL text: inert in dd2/dd6, sweeps in dd5
      (6L, "scale at pipelines data training about text different completely"), // permutation of 2
      (7L, "the quick brown fox jumps over the lazy dog today")) // in-base exact dup of 0
    val n = 5
    val replicated = base.flatMap { case (id, txt) =>
      (0 until n).map(cp => (id + cp.toLong * 100L, txt))
    }.toDF("doc_id", "text")
      // a NULL-id exact copy of doc 0 (r17 review #1): NULL ids can
      // never pair — the uncontracted '<' orientation is NULL-false in
      // both roles — so the contracted expansion must not mint a
      // degenerate (x, x) self-pair from least/greatest null-skipping
      .unionByName(Seq((Option.empty[Long], base.head._2)).toDF("doc_id", "text"))
    def pairSet(df: org.apache.spark.sql.DataFrame) = {
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
      assert(!rows.exists(p => p._1 == p._2), s"degenerate self-pair: ${rows.find(p => p._1 == p._2)}")
      rows.toSet
    }
    val cases = Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)](
      ("dd2", Dedup.minhashPairsOver, Dedup.minhashPairsUncontracted),
      ("dd5", Dedup.simhashNearDupOver, Dedup.simhashNearDupUncontracted),
      ("dd6", Dedup.ngramJaccardPairsContracted, Dedup.ngramJaccardPairsUncontracted))
    cases.foreach { case (name, contracted, reference) =>
      val got = pairSet(contracted(replicated))
      val want = pairSet(reference(replicated))
      assert(want.nonEmpty, s"$name: vacuous fixture — no reference pairs")
      // non-vacuity of the contraction itself: intra-class pairs exist
      assert(got.nonEmpty && got == want,
        s"$name: missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
    // and the lever is real: rep-level candidate work is independent of N
    val (membersA, repsA) = Dedup.contractedCorpus(replicated)
    val (_, repsB) = Dedup.contractedCorpus(base.toDF("doc_id", "text"))
    assert(repsA.count() == repsB.count(),
      "replication must not grow the contracted rep corpus")
    assert(membersA.count() == base.length.toLong * n)
    // the census that picks the path: the replicated fixture is far
    // above the threshold (every row has n-1 = 4+ same-text partners),
    // the unique-text base sits below it (only the 0≡7 planted pair)
    val mult = Dedup.dupMultiplier(replicated)
    assert(mult > Dedup.DupContractionThreshold, s"replicated multiplier $mult")
    val multBase = Dedup.dupMultiplier(base.toDF("doc_id", "text"))
    assert(multBase < Dedup.DupContractionThreshold, s"base multiplier $multBase")
    // exact value on the base: only docs 0 and 7 share a text → one
    // class of 2 → mass 2·1 = 2 over 8 rows
    assert(math.abs(multBase - 2.0 / 8.0) < 1e-9)
  }
}
