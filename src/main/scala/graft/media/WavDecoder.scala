package graft.media

import graft.media.MediaFeatures.{Decoder, MediaBlob, MediaFeature}

/** A REAL audio codec for the [[MediaFeatures.Codecs]] registry: RIFF
  * WAVE PCM (8-bit unsigned / 16-bit signed little-endian), parsed and
  * decoded in pure JVM code with zero dependencies — the format's
  * container layout is public (RIFF chunks; fmt block per Microsoft's
  * WAVEFORMAT). This turns the "codecs aren't in this container" seam
  * into a working decode path for one ubiquitous format TODAY, and
  * demonstrates the registry contract with a non-stub implementation:
  * `spark.conf.set("graft.media.codec", "wav")` and nothing else in
  * the pipeline changes.
  *
  * Feature mapping onto the fixed [[MediaFeature]] schema (documented,
  * since the schema is modality-neutral): `width` = sample rate,
  * `height` = channel count, `n_frames` = sample frames, `features` =
  * the RMS energy envelope over `featureDim` equal time segments
  * (channel-mixed), the standard first-pass audio fingerprint.
  *
  * Scale note: decode is per-row inside the partition-streamed
  * [[MediaFeatures.decodeAll]]; nothing here allocates beyond one
  * payload's samples.
  */
final class WavDecoder(featureDim: Int) extends Decoder {

  private def le16(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8)
  private def le32(d: Array[Byte], o: Int): Int =
    (d(o) & 0xff) | ((d(o + 1) & 0xff) << 8) |
      ((d(o + 2) & 0xff) << 16) | ((d(o + 3) & 0xff) << 24)
  private def tag(d: Array[Byte], o: Int): String =
    new String(d, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  override def decode(b: MediaBlob): MediaFeature = {
    val d = b.payload
    require(d.length >= 44 && tag(d, 0) == "RIFF" && tag(d, 8) == "WAVE",
      s"${b.media_id}: not a RIFF/WAVE payload")
    // walk the chunk list: fmt_ then data (other chunks skipped)
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= d.length && (dataOff < 0 || sampleRate == 0)) {
      val id = tag(d, off); val sz = le32(d, off + 4)
      if (id == "fmt ") {
        val audioFormat = le16(d, off + 8)
        require(audioFormat == 1, s"${b.media_id}: non-PCM WAVE ($audioFormat)")
        channels = le16(d, off + 10)
        sampleRate = le32(d, off + 12)
        bits = le16(d, off + 22)
        require(bits == 8 || bits == 16,
          s"${b.media_id}: unsupported PCM depth $bits")
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && channels > 0 && dataOff >= 0,
      s"${b.media_id}: missing fmt/data chunk")
    val bytesPerSample = bits / 8
    val frameBytes = channels * bytesPerSample
    val nFrames = math.min(dataLen, d.length - dataOff) / frameBytes
    // channel-mixed samples in [-1, 1]
    def sampleAt(frame: Int): Double = {
      var s = 0.0
      var c = 0
      while (c < channels) {
        val o = dataOff + frame * frameBytes + c * bytesPerSample
        s += (if (bits == 16) (le16(d, o).toShort).toDouble / 32768.0
              else ((d(o) & 0xff) - 128).toDouble / 128.0)
        c += 1
      }
      s / channels
    }
    // RMS envelope over featureDim equal segments
    val feats = new Array[Float](featureDim)
    if (nFrames > 0) {
      var seg = 0
      while (seg < featureDim) {
        val lo = (seg.toLong * nFrames / featureDim).toInt
        val hi = ((seg + 1).toLong * nFrames / featureDim).toInt
        var acc = 0.0
        var i = lo
        while (i < hi) { val x = sampleAt(i); acc += x * x; i += 1 }
        feats(seg) = if (hi > lo) math.sqrt(acc / (hi - lo)).toFloat else 0f
        seg += 1
      }
    }
    MediaFeature(b.media_id, b.kind, d.length,
      width = sampleRate, height = channels, n_frames = nFrames,
      features = feats)
  }
}

object WavDecoder {
  /** Register under "wav" — called once per JVM (idempotent TrieMap put). */
  def register(): Unit =
    MediaFeatures.Codecs.register("wav", new WavDecoder(_))
}
