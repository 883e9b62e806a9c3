package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ConnectedComponents

/** Semantics pins for the round-5 curation operators: connected
  * components (dd7's engine), decontamination (dd8), deterministic
  * stratified sampling (ds1), context-window chunking (tx8), and
  * time-series gap-fill (ev4). The oracle gate proves cross-engine
  * equality; these tests pin the PROPERTIES the oracle can't state
  * (transitivity, reproducibility, coverage bounds, grid density).
  */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("connected components collapses transitive chains and keeps components apart") {
    // chain 1-2-3-4 (diameter 3, needs >1 sweep), pair 10-11, triangle
    // 20-21-22 with a redundant duplicate edge
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L), (20L, 21L)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components handles a long path within the sweep budget") {
    // path of 17 nodes: min-label needs ~16 sweeps to reach the far end
    val edges = (0L until 16L).map(i => (i, i + 1)).toDF("a", "b")
    val got = ConnectedComponents.run(edges).collect()
    assert(got.length == 17 && got.forall(_.getLong(1) == 0L))
  }

  test("connected components equals a union-find reference on 12 generated graphs") {
    import org.scalacheck.{Gen, rng}
    val genEdges: Gen[List[(Long, Long)]] = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield es.filter(e => e._1 != e._2) // CC input is near-dup PAIRS: no self loops

    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // roots are component minima because unions always point high → low
      parent.keys.map(k => k -> find(k)).toMap
    }

    (1L to 12L).foreach { seed =>
      val edges = genEdges.pureApply(Gen.Parameters.default, rng.Seed(seed))
      if (edges.nonEmpty) {
        val got = ConnectedComponents.run(edges.toDF("a", "b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == unionFind(edges), s"seed=$seed edges=$edges")
      }
    }
  }

  test("dd7 cluster ids are component minima and sizes count members") {
    val s = SparkEntry.configure(spark)
    val rows = SparkEntry.queries("dd7_dup_clusters")(s, sf).collect()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_.getLong(0)).min == cid, s"cluster $cid label is not its min doc_id")
      assert(members.forall(_.getLong(2) == members.length), s"cluster $cid size mismatch")
      assert(members.length >= 2, s"cluster $cid has no partner (pairs input!)")
    }
  }

  test("dd8 flags the injected copies of benchmark documents") {
    val s = SparkEntry.configure(spark)
    val flagged = SparkEntry.queries("dd8_decontaminate")(s, sf)
      .select("doc_id").as[Long].collect().toSet
    // corpus() injects an exact copy (+1M) of every doc_id % 7 == 0; any
    // such doc that is ALSO a benchmark doc (% 97 == 0, >= 4 words) must
    // be flagged through its copy — the guaranteed leak path
    val docs = Tables(s, sf, "documents")
      .filter(col("doc_id") % 97 === 0 && col("doc_id") % 7 === 0 &&
        size(split(col("text"), " ")) >= 4)
      .select("doc_id").as[Long].collect()
    assert(docs.nonEmpty, "fixture lost its benchmark-copy overlap")
    docs.foreach(d => assert(flagged.contains(d + 1000000L),
      s"exact copy of benchmark doc $d escaped decontamination"))
  }

  test("ds1 sampling is reproducible and respects the per-stratum rates") {
    val s = SparkEntry.configure(spark)
    // sf0.01, not sf0.001: ~100 docs per stratum makes a silently
    // dropped stratum statistically detectable (at 10 docs a zero rate
    // sits inside any honest binomial tolerance)
    val dir = "/root/testdata/sf0.01"
    def run() = SparkEntry.queries("ds1_stratified_sample")(s, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val a = run()
    assert(a == run(), "hash-gated sampling must be bit-reproducible")
    val total = Tables(s, dir, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = a.groupBy(_._2).view.mapValues(_.size).toMap
    // iterate the CORPUS strata, not the sampled ones: a stratum whose
    // rate regressed to zero must fail here, not vanish from the check
    total.foreach { case (lang, n) =>
      val p = kept.getOrElse(lang, 0).toDouble / n
      val expected = if (lang == "en") 64.0 / 256 else 128.0 / 256
      // 4-sigma binomial tolerance
      val tol = 4 * math.sqrt(expected * (1 - expected) / n)
      assert(math.abs(p - expected) <= tol, s"$lang rate $p vs $expected (tol $tol)")
    }
    // both splits occur, and test stays the small side
    val splits = a.groupBy(_._3).view.mapValues(_.size).toMap
    assert(splits.keySet == Set("train", "test") && splits("test") < splits("train"))
  }

  test("ds5 mixing honors each source's token budget up to the straddling doc") {
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.01"
    val kept = SparkEntry.queries("ds5_token_budget_mix")(s, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("tok"), r.getAs[Long]("cum_tok"), r.getAs[Long]("budget_tok")))
    assert(kept.nonEmpty)
    val bySource = kept.groupBy(_._2)
    val corpusBySource = Tables(s, dir, "documents")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every source is represented, none is swallowed whole: the budget
    // must cut INSIDE each source for the entry to exercise the cut
    assert(bySource.keySet == corpusBySource.keySet)
    bySource.foreach { case (src, rows) =>
      assert(rows.length < corpusBySource(src).toInt, s"$src kept everything")
      val budget = rows.head._5
      // admitted-iff-budget-not-yet-spent: every kept doc started under
      // budget; only the straddling doc may end past it
      assert(rows.forall { case (_, _, tok, cum, b) => b == budget && cum - tok < b })
      assert(rows.count { case (_, _, _, cum, b) => cum >= b } <= 1,
        s"$src admitted more than one straddler")
      // kept token mass reaches the budget (the straddler closes it)
      assert(rows.map(_._4).max >= budget, s"$src under-filled its budget")
    }
    // weights 1..4 produce monotone budgets: a weight-4 source's budget
    // is 4x a weight-1 source's (same corpus total, same weight sum)
    val budgetOf = bySource.view.mapValues(_.head._5).toMap
    val w = (src: String) => src.drop(3).toLong % 4 + 1
    val perUnit = budgetOf.map { case (src, b) => b / w(src) }
    assert(perUnit.max - perUnit.min <= 1, s"budgets not weight-proportional: $budgetOf")
  }

  test("ds10: arm membership replays via md5; users conserved; SRM math exact") {
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.01"
    val out = SparkEntry.queries("ds10_ab_assignment")(s, dir).collect()
      .map(r => r.getAs[String]("arm") -> r).toMap
    assert(out.keySet == Set("control", "treatment"))
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val users = Tables(s, dir, "events").select("user_id").distinct().collect()
      .map(_.getLong(0))
    val wantControl = users.count(u => md5hex(s"ab:$u").charAt(0) < '8').toLong
    assert(out("control").getAs[Long]("n_users") == wantControl)
    assert(out.values.map(_.getAs[Long]("n_users")).sum == users.length.toLong)
    val total = users.length.toLong
    out.values.foreach { r =>
      val n = r.getAs[Long]("n_users")
      val a = BigInt(2 * n - total) * 1000000
      val m = BigInt(total)
      val want = (a - (((a % m) + m) % m)) / m
      assert(BigInt(r.getAs[Long]("dev_ppm")) == want)
      assert(r.getAs[Boolean]("srm_flag") ==
        ((2 * n - total).abs * 1000000 >= total * 10000))
    }
  }

  test("ds9 histogram matching: membership replays driver-side, rates track targets") {
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("ds9_dist_match")(s, dir).collect()
      .map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("accept_ppm"), r.getAs[Long]("n_kept"))).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(s, dir, "documents").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), math.min(9L, r.getLong(1) / 60)))
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val target = counts.values.sum / 10
    // exact membership replay: same tagged draw, same threshold
    val expect = counts.map { case (b, nB) =>
      val thr = math.min(target * 4294967296L / nB, 4294967295L)
      val kept = docs.count { case (id, bb) =>
        bb == b && md5hex(s"dmatch:$id").substring(0, 8) < f"$thr%08x" }
      b -> (nB, thr * 1000000L / 4294967296L, kept.toLong)
    }
    assert(got == expect, s"census diverged:\n got=$got\n want=$expect")
    // rates must point the right way: under-represented buckets keep all
    val under = counts.filter(_._2 <= target).keySet
    under.foreach(b => assert(got(b)._2 == 999999L, s"bucket $b should saturate"))
    val over = counts.filter(_._2 * 5 > 6 * target).keySet // >1.2× target
    assert(over.nonEmpty, "no over-represented bucket — vacuous reshaping")
    over.foreach(b => assert(got(b)._2 < 900000L, s"bucket $b barely downsampled"))
  }

  test("ds3 weighted sampling equals an exact driver-side recomputation") {
    val s = SparkEntry.configure(spark)
    val dir = "/root/testdata/sf0.01"
    val got = SparkEntry.queries("ds3_weighted_sample")(s, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("w_ppm"))).toMap
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(s, dir, "documents").select("doc_id", "n_chars")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = docs.flatMap { case (id, n) =>
      val thr = math.min(math.min(n, 512L) * (4294967296L / 512L), 4294967295L)
      val keep = md5hex(s"wsmp:$id").substring(0, 8) < f"$thr%08x"
      if (keep) Some(id -> thr * 1000000L / 4294967296L) else None
    }.toMap
    assert(got == expect, s"sampled set diverged (got ${got.size}, expected ${expect.size})")
    // longer docs must be sampled strictly more often in aggregate
    val kept = expect.keySet
    val (long_, short_) = docs.partition(_._2 >= 256)
    val pLong = long_.count(d => kept(d._1)).toDouble / long_.size.max(1)
    val pShort = short_.count(d => kept(d._1)).toDouble / short_.size.max(1)
    assert(pLong > pShort, s"length weighting inverted: $pLong vs $pShort")
  }

  test("tx8 chunk geometry: stride starts, bounded tails, no contained duplicates") {
    val s = SparkEntry.configure(spark)
    val chunks = SparkEntry.queries("tx8_chunking")(s, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val lens = Tables(s, sf, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    // geometry bounds derive from the operator's own constants — a
    // retuned chunk size retunes the assertions with it
    val len = graft.queries.Text.ChunkLen.toLong
    val stride = graft.queries.Text.ChunkStride.toLong
    val overlap = len - stride
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == lens.keySet, "every document must chunk")
    byDoc.foreach { case (doc, cs) =>
      val n = lens(doc)
      // starts walk the stride grid but stop once a window could not
      // add tokens beyond the previous one
      val expected = ((math.max(1L, n - overlap) - 1) / stride) + 1
      assert(cs.length == expected, s"doc $doc: ${cs.length} chunks for $n words")
      assert(cs.map(_._2).sorted.toSeq == (0L until expected).toSeq)
      cs.sortBy(_._2).zipWithIndex.foreach { case ((_, id, tokens), i) =>
        val start = 1 + stride * id
        val want = math.min(len, n - start + 1)
        assert(tokens == want, s"doc $doc chunk $i: $tokens tokens, want $want")
        // every non-first chunk must reach past the previous window's
        // end: a <=overlap-token tail would be a pure duplicate
        if (id > 0) assert(tokens >= overlap + 1, s"doc $doc chunk $i is contained in its predecessor")
      }
    }
  }

  test("dd8 probes the corpus against a BROADCAST benchmark set") {
    val s = SparkEntry.configure(spark)
    val plan = SparkEntry.queries("dd8_decontaminate")(s, sf)
      .queryExecution.executedPlan.toString
    // the benchmark suite is bounded by design — the corpus side must
    // stream into a broadcast hash probe, never shuffle on shingle
    assert(plan.contains("BroadcastHashJoin"), s"benchmark set not broadcast:\n$plan")
  }

  test("tx9 packing conserves tokens and fills every non-final bin") {
    val s = SparkEntry.configure(spark)
    val bins = SparkEntry.queries("tx9_pack")(s, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(bins.nonEmpty)
    // conservation: packed tokens == chunk-table tokens
    val chunkTokens = SparkEntry.queries("tx8_chunking")(s, sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).as[Long].head()
    assert(bins.map(_._4).sum == chunkTokens, "packing lost or duplicated tokens")
    bins.groupBy(_._1).foreach { case (bucket, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong), s"bucket $bucket bin ids not dense")
      // next-fit: every bin except the last must have been closed by an
      // overflow, i.e. reached capacity − (max chunk − 1)
      val minFill = graft.queries.Text.PackCapacity - (graft.queries.Text.ChunkLen - 1)
      sorted.dropRight(1).foreach { case (_, bin, _, tokens, _) =>
        assert(tokens >= minFill, s"bucket $bucket bin $bin closed at $tokens tokens")
      }
    }
  }

  test("ds2 keeps exactly K per stratum through a map-side bounded aggregate") {
    val s = SparkEntry.configure(spark)
    // sf0.001 has 71+ docs per lang — plenty to exercise the full K=10
    val df = SparkEntry.queries("ds2_topk_sample")(s, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"BottomKAgg not planned as agg:\n$plan")
    assert(!plan.toLowerCase.contains("window"), s"sampler must not shuffle all rows into a window:\n$plan")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    val totals = Tables(s, sf, "documents")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(perLang.keySet == totals.keySet)
    perLang.foreach { case (lang, g) =>
      assert(g.length == math.min(10L, totals(lang)), s"$lang sample size ${g.length}")
      assert(g.map(_._2).sorted.toSeq == (1L to g.length).toSeq, s"$lang ranks not dense")
    }
  }

  test("ev4 grid is hour-dense per type and zero rows are true gaps") {
    val s = SparkEntry.configure(spark)
    val rows = SparkEntry.queries("ev4_gapfill")(s, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, g) =>
      val hours = g.map(_._2.getTime).sorted
      hours.sliding(2).foreach {
        case Array(a, b) => assert(b - a == 3600000L, s"$tpe grid has a hole or dup")
        case _ =>
      }
    }
    val real = SparkEntry.queries("ev1_time_buckets")(s, sf).collect()
      .map(r => (r.getString(1), r.getTimestamp(0))).toSet
    rows.filter(_._3 == 0L).foreach { case (tpe, h, _) =>
      assert(!real.contains((tpe, h)), s"zero-filled ($tpe, $h) actually has events")
    }
    rows.filter(_._3 > 0L).foreach { case (tpe, h, _) =>
      assert(real.contains((tpe, h)), s"non-zero ($tpe, $h) missing from ev1")
    }
  }

  test("ds8 equalizes every language to the minority count via the md5 draw") {
    val out = SparkEntry.queries("ds8_balance_downsample")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[Long]("bal_rank")))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "doc_id", "md5('bal:' || CAST(doc_id AS STRING)) AS draw").collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("doc_id"), r.getAs[String]("draw")))
    val nMin = docs.groupBy(_._1).values.map(_.size).min.toLong
    val byLang = out.groupBy(_._1)
    assert(byLang.keySet == docs.map(_._1).toSet, "a language vanished")
    byLang.foreach { case (lang, rows) =>
      assert(rows.length == nMin, s"$lang kept ${rows.length} != n_min $nMin")
      assert(rows.map(_._3).sorted.toSeq == (1L to nMin), s"$lang ranks not dense")
      // membership is exactly the n_min smallest (draw, doc_id) of the language
      val expect = docs.filter(_._1 == lang).sortBy(d => (d._3, d._2)).take(nMin.toInt)
        .map(_._2).toSet
      assert(rows.map(_._2).toSet == expect, s"$lang membership diverged from the draw order")
    }
  }

  test("ds7 epoch order is a permutation, interleaves sources by wave, and balances shards") {
    val out = SparkEntry.queries("ds7_interleave_shards")(spark, sf).collect()
    assert(out.nonEmpty)
    // global_pos is exactly 1..N — no gaps, no collisions across waves
    val pos = out.map(_.getAs[Long]("global_pos")).sorted.toSeq
    assert(pos == (1L to out.length).toSeq, "global_pos is not a permutation")
    // wave contiguity: every rank-r doc precedes every rank-(r+1) doc, so
    // a prefix of the epoch covers all sources as evenly as possible
    val maxPosByRank = out.groupBy(_.getAs[Long]("src_rank"))
      .view.mapValues(_.map(_.getAs[Long]("global_pos"))).toMap
    maxPosByRank.toSeq.sortBy(_._1).sliding(2).foreach {
      case Seq((r1, p1), (r2, p2)) =>
        assert(p1.max < p2.min, s"wave $r1 overlaps wave $r2 in the epoch order")
      case _ => ()
    }
    // consecutive-modulo sharding balances to within one doc
    val shardCounts = out.groupBy(_.getAs[Long]("shard")).values.map(_.length)
    assert(shardCounts.max - shardCounts.min <= 1, "shard skew > 1")
    // per-source ranks are dense from 1
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val ranks = rs.map(_.getAs[Long]("src_rank")).sorted.toSeq
      assert(ranks == (1L to rs.length).toSeq, s"source $src ranks not dense")
    }
  }
}
