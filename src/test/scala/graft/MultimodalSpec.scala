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
}
