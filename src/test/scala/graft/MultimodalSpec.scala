package graft

import org.apache.spark.sql.types.{BinaryType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FakeDecoder, MediaFile, MediaMeta}

/** Multimodal plumbing: schema shape, batch-path equivalence, decoder
  * determinism, frame sampling, and partitioning behavior (narrow
  * transform — no shuffle).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("media table: opaque binary payload + typed metadata struct") {
    val schema = Multimodal.mediaTable(spark, dir).schema
    assert(schema("content").dataType == BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq == Seq("format", "width", "height", "duration_ms"))
  }

  test("FakeDecoder is deterministic and content-sensitive") {
    val m = MediaFile(1, "image", "hello world".getBytes("UTF-8"), MediaMeta("raw", 16, 16, 0))
    val f1 = FakeDecoder.features(m)
    val f2 = FakeDecoder.features(m.copy(media_id = 2))
    assert(f1.content_hash == f2.content_hash) // hash depends on bytes only
    assert(f1.content_hash != FakeDecoder.features(
      m.copy(content = "different".getBytes("UTF-8"))).content_hash)
    assert(f1.n_bytes == 11)
    assert(f1.mean_byte == "hello world".getBytes("UTF-8").map(_ & 0xff).sum.toDouble / 11)
  }

  test("frame sampling takes every nth fixed-size chunk") {
    val bytes = Array.tabulate[Byte](300)(_.toByte)
    val frames = FakeDecoder.sampleFrames(bytes, frameBytes = 64, everyNth = 2)
    assert(frames.map(_.length) == Seq(64, 64, 44)) // chunks 0,2,4 of 64,64,64,64,44
  }

  test("sampledFrames rows carry the md5 of the exact byte slice they sample") {
    import spark.implicits._
    val bytes = Array.tabulate[Byte](300)(_.toByte)
    val ds = Seq(MediaFile(7, "video", bytes, MediaMeta("raw", 16, 16, 0)),
      MediaFile(8, "image", bytes, MediaMeta("raw", 16, 16, 0))).toDS()
    val frames = Multimodal.sampledFrames(ds, FakeDecoder).collect().sortBy(_.frame_idx)
    // only the video row produces frames; sampled index p ↔ source chunk 2p
    assert(frames.map(_.media_id).distinct.toSeq == Seq(7L))
    assert(frames.map(f => (f.frame_idx, f.frame_bytes)).toSeq == Seq((0, 64), (1, 64), (2, 44)))
    val md = java.security.MessageDigest.getInstance("MD5")
    frames.foreach { f =>
      val slice = bytes.slice(128 * f.frame_idx, 128 * f.frame_idx + f.frame_bytes)
      assert(f.frame_hash == md.digest(slice).map("%02x".format(_)).mkString)
    }
  }

  test("extractFeatures over partitions equals direct per-row decoding") {
    val ds = Multimodal.mediaTable(spark, dir).repartition(3)
    val viaSpark = Multimodal.extractFeatures(ds, FakeDecoder)
      .collect().sortBy(_.media_id)
    val direct = ds.collect().map(FakeDecoder.features).sortBy(_.media_id)
    assert(viaSpark.toSeq == direct.toSeq)
    assert(viaSpark.exists(f => f.kind == "video" && f.n_frames > 1))
  }

  test("feature extraction is a narrow transform: partition count preserved, no shuffle") {
    val ds = Multimodal.mediaTable(spark, dir).repartition(4)
    val out = Multimodal.extractFeatures(ds, FakeDecoder)
    assert(out.rdd.getNumPartitions == 4)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") || plan.indexOf("Exchange") > plan.indexOf("MapPartitions"))
  }

  test("mm5: perceptual near-dup catches copied AND perturbed frames, not disjoint ones") {
    import spark.implicits._
    // deterministic planted frames (md5 is fixed, so these hamming
    // distances are pinned forever): an exact copy (hamming 0), a
    // 1-char perturbation chosen to land inside the radius-1 ball
    // (hamming 1 — the "re-encode jitter" case mm4's exact hash
    // misses), and a disjoint all-digit frame (hamming 10)
    val a = "the quick brown fox jumps over the lazy dog and keeps on running"
    val b = "t" + "x" + a.drop(2) // perturb position 1
    val c = "0123456789" * 6 + "0123"
    val frames = Seq(
      (1L, 0, a), (2L, 0, a), (3L, 0, b), (4L, 0, c))
      .toDF("media_id", "frame_idx", "frame_str")
    val pairs = graft.queries.MultimodalQueries.frameNearDup(frames)
      .collect().map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"),
        r.getAs[Int]("hamming"))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)),
      s"got $pairs")
    // brute-force equivalence on the real fixture: banding at radius 1
    // has EXACT recall by pigeonhole (one differing bit leaves one of
    // two 8-bit bands intact), so the banded sweep must equal all-pairs
    // hamming <= 1 over the fingerprints
    val media = Multimodal.mediaTable(spark, dir)
    val fc = Multimodal.frameContents(media, FakeDecoder).toDF()
    val sims = graft.queries.MultimodalQueries.frameSimhash(fc)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("simhash")))
    val brute = (for {
      (ka, sa) <- sims; (kb, sb) <- sims if ka < kb
      if java.lang.Long.bitCount(sa ^ sb) <= 1
    } yield (ka, kb)).toSet
    val swept = graft.queries.MultimodalQueries.frameNearDup(fc)
      .collect().map(r => (r.getAs[Long]("media_a") * (1L << 32) + r.getAs[Int]("idx_a"),
        r.getAs[Long]("media_b") * (1L << 32) + r.getAs[Int]("idx_b"))).toSet
    assert(swept == brute, s"banded sweep ${swept.size} pairs vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture produced no near-dup frames — vacuous pin")
  }
}
