package graft

import graft.media.{ImageTransforms, MediaFeatures}
import graft.media.MediaFeatures.MediaBlob
import java.awt.image.BufferedImage

/** Pixel-physical correctness of the REAL image resize: dimensions
  * follow the aspect-preserving fit, solid colors survive bilinear
  * resampling exactly, and the resized bytes decode through the SAME
  * registry codec pipeline ([[ImageTransforms]] composes with
  * [[MediaFeatures.decodeAll]]).
  */
class ImageTransformsSpec extends SparkSpec {

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def solid(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    img
  }

  test("resize: aspect-preserving fit, exact solid-color preservation") {
    // 200x100 into a 50x50 box → scale 0.25 → 50x25
    val in = MediaBlob("r1", "image", encodePng(solid(200, 100, 0x646464)))
    val out = ImageTransforms.resizeOne(in, 50, 50)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out.payload))
    assert(img.getWidth === 50 && img.getHeight === 25)
    // bilinear resampling of a constant field is the constant
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      assert((img.getRGB(x, y) & 0xffffff) === 0x646464, s"pixel ($x,$y)")
    // already-fitting images keep their dimensions
    val same = ImageTransforms.resizeOne(
      MediaBlob("r2", "image", encodePng(solid(30, 20, 0x112233))), 50, 50)
    val simg = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(same.payload))
    assert(simg.getWidth === 30 && simg.getHeight === 20)
  }

  test("resize composes with the registry decode pipeline") {
    import spark.implicits._
    // gradient scenes at 128x64; resize into 32x32 → 32x16
    val blobs = (1 to 4).map { k =>
      val img = new BufferedImage(128, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 128) {
        val v = math.min(255, 40 * k + x / 8)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      MediaBlob(s"g$k", "image", encodePng(img))
    }
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "image")
    try {
      val resized = ImageTransforms.resizePng(
        spark.createDataset(blobs).repartition(2), 32, 32)
      val feats = MediaFeatures.decodeAll(resized, featureDim = 8)
        .collect().sortBy(_.media_id)
      assert(feats.forall(f => f.width == 32 && f.height == 16))
      // brightness ordering survives the downscale
      val meanBins = feats.map(_.features.zipWithIndex
        .map { case (v, i) => v * i }.sum)
      assert(meanBins.sliding(2).forall(p => p(0) < p(1)))
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("resize rejects non-image payloads loudly") {
    intercept[IllegalArgumentException] {
      ImageTransforms.resizeOne(MediaBlob("x", "image",
        Array.fill[Byte](32)(3)), 10, 10)
    }
  }
}
