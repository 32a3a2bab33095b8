package graft

import graft.media.MediaFeatures
import graft.media.MediaFeatures.MediaBlob

/** The non-stub codec path: a synthesized RIFF/WAVE PCM payload decodes
  * to its true header metadata and a physically-correct RMS envelope,
  * through the SAME registry + partition-streamed pipeline the stub
  * uses (`spark.conf.set("graft.media.codec", "wav")` is the whole
  * swap — the VERDICT "real codecs" seam, closed for one real format).
  */
class WavDecoderSpec extends SparkSpec {

  /** Minimal RIFF/WAVE writer: 16-bit signed little-endian PCM. */
  private def wav16(sampleRate: Int, channels: Int,
      samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2)
    buf.putShort((channels * 2).toShort); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  test("wav codec: header metadata and RMS envelope are physically correct") {
    // 1 second of a 440 Hz sine at half amplitude, mono 8 kHz
    val sr = 8000
    val amp = 0.5
    val samples = Array.tabulate(sr)(i =>
      (amp * 32767 * math.sin(2 * math.Pi * 440 * i / sr)).toShort)
    val blob = MediaBlob("a1", "audio", wav16(sr, 1, samples))
    val dec = new graft.media.WavDecoder(8)
    val f = dec.decode(blob)
    assert(f.width === sr)          // sample rate
    assert(f.height === 1)          // channels
    assert(f.n_frames === sr)       // 1 second of frames
    // a sine's RMS is amp/sqrt(2); every full segment must be within 2%
    val expect = amp / math.sqrt(2)
    f.features.foreach(v =>
      assert(math.abs(v - expect) < 0.02, s"segment rms $v vs $expect"))
    // silence decodes to a zero envelope
    val silent = dec.decode(MediaBlob("a2", "audio",
      wav16(sr, 2, Array.fill(400)(0.toShort))))
    assert(silent.height === 2 && silent.n_frames === 200) // 400 interleaved samples / 2ch
    assert(silent.features.forall(_ === 0f))
  }

  test("wav codec runs through the registry + partition-streamed pipeline") {
    import spark.implicits._
    val sr = 4000
    val blobs = (1 to 6).map { k =>
      val samples = Array.tabulate(sr / 2)(i =>
        (0.25 * k / 6.0 * 32767 * math.sin(2 * math.Pi * 220 * i / sr)).toShort)
      MediaBlob(s"m$k", "audio", wav16(sr, 1, samples))
    }
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "wav")
    try {
      val feats = MediaFeatures.decodeAll(
        spark.createDataset(blobs).repartition(3), featureDim = 4)
        .collect().sortBy(_.media_id)
      assert(feats.length === 6)
      assert(feats.forall(f => f.width == sr && f.n_frames == sr / 2))
      // louder inputs yield larger envelopes — ordering preserved
      val rms = feats.map(f => f.features.sum)
      assert(rms.sliding(2).forall(p => p(0) < p(1)))
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("wav codec rejects non-WAVE and non-PCM payloads loudly") {
    val dec = new graft.media.WavDecoder(4)
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("x", "audio", Array.fill[Byte](64)(7)))
    }
  }
}
