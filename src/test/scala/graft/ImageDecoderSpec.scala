package graft

import graft.media.MediaFeatures
import graft.media.MediaFeatures.MediaBlob
import java.awt.image.BufferedImage

/** The second non-stub codec path (VERDICT r12 #6): synthesized PNG and
  * JPEG payloads decode to their true pixel dimensions and a
  * physically-correct luminance histogram, through the SAME registry +
  * partition-streamed pipeline the stub and the WAV codec use
  * (`spark.conf.set("graft.media.codec", "image")` is the whole swap).
  */
class ImageDecoderSpec extends SparkSpec {

  /** Encode a BufferedImage to bytes in the given ImageIO format. */
  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("image codec: PNG dimensions and luminance histogram are physically correct") {
    val dec = new graft.media.ImageDecoder(8)
    // solid gray (100,100,100): luma 100 → bin 3 of 8 (bin spans
    // [96,128) — 100 sits well inside, unlike 128 which is exactly ON
    // the 4th boundary where float luma ulps pick the side), all mass
    val gray = dec.decode(MediaBlob("i1", "image",
      encode(solid(40, 30, 0x646464), "png")))
    assert(gray.width === 40 && gray.height === 30 && gray.n_frames === 1)
    assert(gray.features.length === 8)
    assert(math.abs(gray.features(3) - 1f) < 1e-6)
    assert(gray.features.zipWithIndex.filter(_._2 != 3).forall(_._1 === 0f))
    // half black / half white: luma 0 → bin 0, luma 255 → bin 7, 50/50
    val img = new BufferedImage(64, 16, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0x000000 else 0xffffff)
    val bw = dec.decode(MediaBlob("i2", "image", encode(img, "png")))
    assert(math.abs(bw.features(0) - 0.5f) < 1e-6)
    assert(math.abs(bw.features(7) - 0.5f) < 1e-6)
    assert(math.abs(bw.features.sum - 1f) < 1e-5) // histogram normalized
    // pure-channel sanity: Rec.601 orders luma(blue) < luma(red) < luma(green)
    def meanBin(rgb: Int): Double = {
      val f = dec.decode(MediaBlob("i3", "image",
        encode(solid(8, 8, rgb), "png"))).features
      f.zipWithIndex.map { case (v, i) => v * i }.sum
    }
    assert(meanBin(0x0000ff) < meanBin(0xff0000))
    assert(meanBin(0xff0000) < meanBin(0x00ff00))
  }

  test("image codec: JPEG payloads decode through the same sniffing path") {
    val dec = new graft.media.ImageDecoder(8)
    // JPEG is lossy and the histogram is 32-luma-wide bins — assert
    // dimensions exactly and that the mass concentrates within one bin
    // of the true luma's bin (solid gray 100 → bin 3)
    val f = dec.decode(MediaBlob("j1", "image",
      encode(solid(33, 21, 0x646464), "jpeg")))
    assert(f.width === 33 && f.height === 21 && f.n_frames === 1)
    val topBin = f.features.zipWithIndex.maxBy(_._1)._2
    assert(math.abs(topBin - 3) <= 1, s"jpeg mass in bin $topBin, expected ~3")
    assert(math.abs(f.features.sum - 1f) < 1e-5)
  }

  test("image codec runs through the registry + partition-streamed pipeline") {
    import spark.implicits._
    // six gray levels, increasing brightness
    val blobs = (1 to 6).map { k =>
      val v = k * 40 - 20
      MediaBlob(s"m$k", "image",
        encode(solid(16, 16, (v << 16) | (v << 8) | v), "png"))
    }
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "image")
    try {
      val feats = MediaFeatures.decodeAll(
        spark.createDataset(blobs).repartition(3), featureDim = 16)
        .collect().sortBy(_.media_id)
      assert(feats.length === 6)
      assert(feats.forall(f => f.width == 16 && f.height == 16 && f.n_frames == 1))
      // brighter inputs put their mass in strictly higher bins
      val meanBins = feats.map(_.features.zipWithIndex
        .map { case (v, i) => v * i }.sum)
      assert(meanBins.sliding(2).forall(p => p(0) < p(1)))
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("image codec rejects non-image payloads loudly") {
    val dec = new graft.media.ImageDecoder(4)
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("x", "image", Array.fill[Byte](64)(7)))
    }
  }
}
