package graft

import graft.media.MediaFeatures
import graft.media.MediaFeatures.{MediaBlob, MediaFeature}
import java.nio.file.{Files, Paths}

/** Multimodal decode plumbing: batch shape, per-partition lifecycle,
  * deterministic stub features, binaryFile ingestion.
  */
class MediaFeaturesSpec extends SparkSpec {

  private def blob(id: String, kind: String, n: Int): MediaBlob =
    MediaBlob(id, kind, Array.tabulate(n)(i => ((i * 7 + n) % 251).toByte))

  test("decodeAll: deterministic features, schema, video frame count") {
    import spark.implicits._
    val in = Seq(blob("a", "image", 100), blob("b", "audio", 5000), blob("c", "video", 977))
    val out = MediaFeatures.decodeAll(in.toDS()).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq === Seq("a", "b", "c"))
    assert(out.forall(_.features.length === 16))
    assert(out.find(_.media_id == "c").get.n_frames === (977 % 240) + 1)
    assert(out.find(_.media_id == "a").get.n_frames === 1)
    // determinism: re-run yields bit-identical features
    val again = MediaFeatures.decodeAll(in.toDS()).collect().sortBy(_.media_id)
    assert(out.zip(again).forall { case (x, y) => x.features.sameElements(y.features) })
    // dims in plausible header ranges
    assert(out.forall(f => f.width >= 1 && f.width <= 640 && f.height >= 1 && f.height <= 480))
  }

  test("decoder lifecycle: one open/close per partition, not per row") {
    import spark.implicits._
    val opens = spark.sparkContext.longAccumulator("opens")
    val closes = spark.sparkContext.longAccumulator("closes")
    val in = (1 to 64).map(i => blob(f"m$i%03d", "image", i * 10)).toDS().repartition(4)
    val counting = (dim: Int) => new MediaFeatures.Decoder {
      private val inner = new MediaFeatures.StubDecoder(dim)
      override def open(): Unit = opens.add(1)
      override def decode(b: MediaBlob): MediaFeature = inner.decode(b)
      override def close(): Unit = closes.add(1)
    }
    val n = MediaFeatures.decodeAll(in, 16, counting).count()
    assert(n === 64)
    assert(opens.value === 4)
    assert(closes.value === 4)
  }

  test("codec binding: session conf routes decodeAll through a registered codec (VERDICT r6 #8)") {
    import spark.implicits._
    val in = Seq(blob("m1", "image", 10), blob("m2", "audio", 20)).toDS()
    // a 'real library' binding is exactly this one registration line
    MediaFeatures.Codecs.register("sevens", dim => new MediaFeatures.Decoder {
      private val inner = new MediaFeatures.StubDecoder(dim)
      override def decode(b: MediaBlob): MediaFeature =
        inner.decode(b).copy(features = Array.fill(dim)(7f))
    })
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "sevens")
    try {
      val out = MediaFeatures.decodeAll(in).collect()
      assert(out.length === 2)
      assert(out.forall(_.features.forall(_ === 7f)), "conf-selected codec not used")
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
    // conf unset -> back to the stub default
    assert(MediaFeatures.decodeAll(in).collect()
      .exists(_.features.exists(_ !== 7f)), "stub default not restored")
    // an unknown binding fails loudly at plan-build time, not mid-job
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "no-such-codec")
    try intercept[IllegalArgumentException] { MediaFeatures.decodeAll(in) }
    finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("resize clamps dims preserving aspect; frame-sample evenly spaces pointers") {
    import spark.implicits._
    val in = Seq(blob("img", "image", 2000), blob("vid", "video", 1000)).toDS()
    val feats = MediaFeatures.decodeAll(in)
    val resized = MediaFeatures.resize(feats, 64, 64).collect().map(f => f.media_id -> f).toMap
    val orig = feats.collect().map(f => f.media_id -> f).toMap
    resized.values.foreach { f =>
      assert(f.width <= 64 && f.height <= 64 && f.width >= 1 && f.height >= 1)
    }
    orig.foreach { case (id, o) =>
      if (o.width <= 64 && o.height <= 64) assert(resized(id).width === o.width) // no upscale
    }
    val ptrs = MediaFeatures.sampleFrames(in, 4).collect()
    val vid = ptrs.filter(_.media_id == "vid").sortBy(_.frame_idx)
    assert(vid.map(_.frame_idx).toSeq === Seq(0, 1, 2, 3))
    assert(vid.map(_.byte_offset).toSeq === Seq(0L, 250L, 500L, 750L))
    assert(ptrs.count(_.media_id == "img") === 1) // stills: one frame
  }

  test("binaryFile ingestion feeds the decoder (K7/S8 storage shape)") {
    val dir = tmpDir("media")
    Files.write(Paths.get(dir, "one.bin"), Array[Byte](1, 2, 3, 4))
    Files.write(Paths.get(dir, "two.bin"), Array.fill[Byte](10)(9))
    val feats = MediaFeatures.decodeAll(MediaFeatures.readBlobs(spark, dir, "audio"))
      .collect().sortBy(_.n_bytes)
    assert(feats.length === 2)
    assert(feats.map(_.n_bytes).toSeq === Seq(4, 10))
    assert(feats.forall(_.kind == "audio"))
    assert(feats.forall(_.media_id.endsWith(".bin")))
  }
}
