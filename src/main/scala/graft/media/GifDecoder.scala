package graft.media

import graft.media.MediaFeatures.{Decoder, MediaBlob, MediaFeature}

/** A REAL multi-frame codec for the [[MediaFeatures.Codecs]] registry:
  * animated GIF via the JDK's ImageIO sequence reader — the third
  * pure-JVM codec (after [[WavDecoder]] and [[ImageDecoder]]) and the
  * first whose `n_frames` is a true temporal dimension, which makes
  * the registry's video-shaped contract (frame counts, temporal
  * features) real for one ubiquitous container today.
  *
  * Feature mapping onto the fixed [[MediaFeature]] schema:
  * `width`/`height` = first frame's pixel dimensions, `n_frames` =
  * TRUE stored-frame count, `features` = the mean-luminance temporal
  * envelope over `featureDim` equal time segments in [0, 1] —
  * [[WavDecoder]]'s RMS-envelope idea transposed to video (the
  * first-pass scene/fade signature). Per-STORED-frame luminance: GIF
  * inter-frame patches are read as stored (no disposal compositing) —
  * the right trade for a fingerprint, stated rather than hidden.
  *
  * Lifecycle: one reader per payload, disposed in a finally;
  * [[open]] disables ImageIO's temp-file cache per partition.
  */
final class GifDecoder(featureDim: Int) extends Decoder {

  override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)

  private def meanLuma(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth
    val h = img.getHeight
    val row = new Array[Int](w)
    var acc = 0.0
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        acc += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    acc / (w.toLong * h)
  }

  override def decode(b: MediaBlob): MediaFeature = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b.payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, s"${b.media_id}: no ImageIO reader claims payload")
      val reader = readers.next()
      try {
        require(reader.getFormatName.equalsIgnoreCase("gif"),
          s"${b.media_id}: not a GIF payload (${reader.getFormatName})")
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        require(n > 0, s"${b.media_id}: zero frames")
        val lumas = (0 until n).map(i => meanLuma(reader.read(i)))
        val first = reader.read(0)
        // mean-luminance envelope over featureDim equal segments, [0,1]
        val feats = Array.tabulate(featureDim) { seg =>
          val lo = (seg.toLong * n / featureDim).toInt
          val hi = (((seg + 1).toLong * n) / featureDim).toInt
          if (hi > lo) (lumas.slice(lo, hi).sum / (hi - lo) / 255.0).toFloat
          else 0f
        }
        MediaFeature(b.media_id, b.kind, b.payload.length,
          width = first.getWidth, height = first.getHeight,
          n_frames = n, features = feats)
      } finally reader.dispose()
    } finally iis.close()
  }
}

object GifDecoder {
  /** Register under "gif" — the multi-frame decode (the "image" alias
    * sniffs GIF stills too, but reads only frame 0's raster).
    */
  def register(): Unit =
    MediaFeatures.Codecs.register("gif", new GifDecoder(_))
}
