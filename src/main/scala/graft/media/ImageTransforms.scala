package graft.media

import graft.media.MediaFeatures.MediaBlob
import org.apache.spark.sql.Dataset

/** REAL pixel-level image transforms (pure JDK — `java.awt.image` +
  * `javax.imageio`, zero dependencies), completing the multimodal
  * verb set for the image modality: [[ImageDecoder]] decodes and
  * feature-extracts; this resizes. Unlike [[MediaFeatures.resize]]
  * (the codec-agnostic METADATA rewrite that serves stub-backed
  * modalities), `resizePng` re-renders actual pixels and re-encodes,
  * so downstream decodes see the true scaled raster.
  *
  * Scale shape: a narrow `mapPartitions` — one image resident at a
  * time per task, no shuffle; the transform composes with
  * [[MediaFeatures.decodeAll]] into a single pipelined stage.
  */
object ImageTransforms {

  /** Aspect-preserving downscale to fit (maxW, maxH), bilinear,
    * re-encoded as PNG (lossless, so the spec can pin pixel
    * physics). Images already inside the box pass through re-encoded
    * at original size; non-image payloads fail loudly (same contract
    * as [[ImageDecoder]]).
    */
  def resizeOne(b: MediaBlob, maxW: Int, maxH: Int): MediaBlob = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(b.payload))
    require(img != null, s"${b.media_id}: payload is not a decodable image")
    val scale = math.min(1.0,
      math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
    val w = math.max(1, math.floor(img.getWidth * scale).toInt)
    val h = math.max(1, math.floor(img.getHeight * scale).toInt)
    val out = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    MediaBlob(b.media_id, b.kind, bos.toByteArray)
  }

  /** Distributed resize: partition-streamed, one decoder+encoder pass
    * per row, ImageIO's temp-file cache disabled once per partition
    * (the [[ImageDecoder.open]] discipline).
    */
  def resizePng(blobs: Dataset[MediaBlob], maxW: Int, maxH: Int): Dataset[MediaBlob] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map(resizeOne(_, maxW, maxH))
    }
  }
}
