package graft.media

import graft.media.MediaFeatures.{Decoder, MediaBlob, MediaFeature}

/** A REAL image codec for the [[MediaFeatures.Codecs]] registry: JPEG /
  * PNG / GIF / BMP decoded via the JDK's own `javax.imageio` — zero new
  * dependencies (VERDICT r12 #6), which makes the registry's second
  * modality (after [[WavDecoder]]'s audio) an actual byte-level decode
  * instead of the deterministic stub. The container format is sniffed
  * from the payload's magic bytes by ImageIO itself, so one decoder
  * instance serves every format the JDK ships a reader for.
  *
  * Feature mapping onto the fixed [[MediaFeature]] schema (documented,
  * since the schema is modality-neutral): `width`/`height` = true pixel
  * dimensions from the decoded raster, `n_frames` = 1 (stills; animated
  * GIF frames beyond the first are out of ImageIO's default read),
  * `features` = the Rec. 601 luminance histogram over `featureDim`
  * equal bins, normalized to sum 1 — the standard first-pass image
  * fingerprint (exposure/contrast signature), and the direct input to
  * the dedup/quality gates' histogram-distance measures.
  *
  * Lifecycle: [[open]] disables ImageIO's temp-FILE stream cache once
  * per partition (a per-row temp file on executor disk is exactly the
  * kind of hidden I/O a 100 TB decode pass cannot afford); decode
  * allocates one pixel row buffer at a time — nothing beyond a single
  * payload's raster is ever resident.
  */
final class ImageDecoder(featureDim: Int) extends Decoder {

  override def open(): Unit = javax.imageio.ImageIO.setUseCache(false)

  override def decode(b: MediaBlob): MediaFeature = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b.payload))
    require(img != null,
      s"${b.media_id}: payload is not a decodable image " +
        "(no ImageIO reader claims its magic bytes)")
    val w = img.getWidth
    val h = img.getHeight
    require(w > 0 && h > 0, s"${b.media_id}: degenerate ${w}x$h raster")
    val counts = new Array[Long](featureDim)
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w) // one row per call, bounded alloc
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val bl = rgb & 0xff
        // Rec. 601 luma in [0, 255]
        val lum = 0.299 * r + 0.587 * g + 0.114 * bl
        val bin = math.min(featureDim - 1,
          (lum / 256.0 * featureDim).toInt)
        counts(bin) += 1
        x += 1
      }
      y += 1
    }
    val total = w.toLong * h
    val feats = Array.tabulate(featureDim)(i => (counts(i).toDouble / total).toFloat)
    MediaFeature(b.media_id, b.kind, b.payload.length,
      width = w, height = h, n_frames = 1, features = feats)
  }
}

object ImageDecoder {
  /** Register under "image" plus the per-format aliases — all three
    * bind the same sniffing decoder (idempotent TrieMap puts).
    */
  def register(): Unit =
    Seq("image", "jpeg", "png").foreach(
      MediaFeatures.Codecs.register(_, new ImageDecoder(_)))
}
