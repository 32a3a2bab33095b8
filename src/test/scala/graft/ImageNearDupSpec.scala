package graft

import graft.media.{ImageNearDup, MediaFeatures}
import graft.media.MediaFeatures.MediaBlob
import java.awt.image.BufferedImage

/** End-to-end multimodal dedup: synthesized PNG groups decode through
  * the REAL `javax.imageio` codec (registry binding, partition-streamed
  * pipeline) into luminance histograms, and [[ImageNearDup]] finds
  * exactly the planted near-dup pairs — with measured sub-quadratic
  * candidate volume (the dedup-family banding discipline applied to a
  * second modality).
  */
class ImageNearDupSpec extends SparkSpec {

  private def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A horizontal gradient scene centered at `base` gray, ± jitter. */
  private def scene(w: Int, h: Int, base: Int, jitter: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v0 = base + (x * 40 / w) - 20 + jitter
      val v = math.max(0, math.min(255, v0))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  test("image near-dup finds planted pairs, no cross-group pairs, sub-quadratic candidates") {
    import spark.implicits._
    // group A: three jittered variants of a dark scene (near-dups);
    // group B: three variants of a bright scene; one lone mid scene
    val blobs =
      (0 until 3).map(j => MediaBlob(s"a$j", "image",
        encodePng(scene(32, 24, 60, j)))) ++
      (0 until 3).map(j => MediaBlob(s"b$j", "image",
        encodePng(scene(32, 24, 200, j)))) :+
      MediaBlob("solo", "image", encodePng(scene(32, 24, 128, 0)))
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "image")
    try {
      val feats = MediaFeatures.decodeAll(
        spark.createDataset(blobs).repartition(3), featureDim = 8)
      val pairs = ImageNearDup.histNearDupPairs(feats, maxL1 = 0.2)
        .collect().map(r => (r.getString(0), r.getString(1)))
      // intra-group pairs present...
      for (g <- Seq("a", "b"); i <- 0 until 3; j <- i + 1 until 3)
        assert(pairs.contains((s"$g$i", s"$g$j")),
          s"missing near-dup pair $g$i-$g$j in ${pairs.toSeq}")
      // ...and nothing across groups or to the lone scene
      assert(pairs.forall { case (x, y) => x.head == y.head },
        s"cross-group false positives: ${pairs.toSeq}")
      assert(!pairs.exists(p => p._1 == "solo" || p._2 == "solo"))
      // blocking is sub-quadratic: candidate pairs < all-pairs
      val cand = ImageNearDup.candidateCounts(feats)
        .agg(org.apache.spark.sql.functions.sum("pairs")).collect()(0).getLong(0)
      val n = blobs.length.toLong
      assert(cand < n * (n - 1) / 2,
        s"blocking produced all-pairs ($cand of ${n * (n - 1) / 2})")
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }
}
