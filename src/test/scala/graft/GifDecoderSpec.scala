package graft

import graft.media.MediaFeatures
import graft.media.MediaFeatures.MediaBlob
import java.awt.image.BufferedImage

/** The multi-frame codec path: a synthesized ANIMATED GIF decodes to
  * its true frame count and a physically-correct temporal luminance
  * envelope through the same registry + partition-streamed pipeline
  * as the other codecs — the video-shaped contract (n_frames > 1,
  * time-axis features) proven on a real container.
  */
class GifDecoderSpec extends SparkSpec {

  /** Minimal animated-GIF writer via ImageIO's sequence API. */
  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, v: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
    img
  }

  test("gif codec: true frame count and a rising luminance envelope") {
    // 8 frames fading dark → bright: envelope must rise monotonically
    val frames = (0 until 8).map(i => solid(24, 16, 30 + i * 28))
    val blob = MediaBlob("g1", "video", animatedGif(frames))
    val dec = new graft.media.GifDecoder(4)
    val f = dec.decode(blob)
    assert(f.width === 24 && f.height === 16)
    assert(f.n_frames === 8)
    assert(f.features.length === 4)
    // each segment averages 2 frames; grays survive the GIF palette
    // exactly, so the envelope is the in-segment mean luma / 255
    val expect = (0 until 4).map(s =>
      (30 + s * 2 * 28 + 30 + (s * 2 + 1) * 28) / 2.0 / 255.0)
    f.features.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 0.02, s"envelope $got vs $e")
    }
    assert(f.features.sliding(2).forall(p => p(0) < p(1)), "envelope must rise")
  }

  test("gif codec runs through the registry + partition-streamed pipeline") {
    import spark.implicits._
    val blobs = (1 to 4).map { k =>
      MediaBlob(s"v$k", "video",
        animatedGif((0 until k + 1).map(i => solid(16, 16, 40 * k))))
    }
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "gif")
    try {
      val feats = MediaFeatures.decodeAll(
        spark.createDataset(blobs).repartition(2), featureDim = 4)
        .collect().sortBy(_.media_id)
      // true frame counts (k+1 frames for blob k), true dims
      assert(feats.map(_.n_frames).toSeq === Seq(2, 3, 4, 5))
      assert(feats.forall(f => f.width == 16 && f.height == 16))
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("gif codec rejects non-GIF payloads loudly") {
    val dec = new graft.media.GifDecoder(4)
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("x", "video", Array.fill[Byte](64)(9)))
    }
    // a PNG still is a decodable IMAGE but not a GIF — the multi-frame
    // decoder refuses rather than silently reading one frame
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(solid(8, 8, 100), "png", bos)
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("y", "video", bos.toByteArray))
    }
  }
}
