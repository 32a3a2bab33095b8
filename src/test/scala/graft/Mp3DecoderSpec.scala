package graft

import graft.media.MediaFeatures
import graft.media.MediaFeatures.MediaBlob

/** The mp3 codec path: synthesized MPEG Layer III bitstreams (valid
  * headers + frame-length law) parse to true sample rate, channel
  * count, PCM sample-frame totals, and a physically-correct VBR
  * bitrate envelope — through the same registry + partition-streamed
  * pipeline as the other codecs. Frame synthesis here writes real
  * headers per the public bit layout, so the walker is exercised on
  * the format, not on a mock of itself.
  */
class Mp3DecoderSpec extends SparkSpec {

  private val brV1 = Map(32 -> 1, 40 -> 2, 48 -> 3, 56 -> 4, 64 -> 5, 80 -> 6,
    96 -> 7, 112 -> 8, 128 -> 9, 160 -> 10, 192 -> 11, 224 -> 12, 256 -> 13, 320 -> 14)
  private val brV2 = Map(8 -> 1, 16 -> 2, 24 -> 3, 32 -> 4, 40 -> 5, 48 -> 6,
    56 -> 7, 64 -> 8, 80 -> 9, 96 -> 10, 112 -> 11, 128 -> 12, 144 -> 13, 160 -> 14)

  /** One Layer III frame: 4-byte header + zero audio data to the exact
    * frame length. mpeg1=false emits MPEG2 (22.05/24/16 kHz family).
    */
  private def frame(kbps: Int, sampleRate: Int, mono: Boolean = true,
      mpeg1: Boolean = true, padding: Int = 0): Array[Byte] = {
    val (verBits, srTable, brIdx) =
      if (mpeg1) (3, Seq(44100, 48000, 32000), brV1(kbps))
      else (2, Seq(22050, 24000, 16000), brV2(kbps))
    val srIdx = srTable.indexOf(sampleRate)
    require(srIdx >= 0, s"bad sample rate $sampleRate")
    val mode = if (mono) 3 else 0
    val h = (0x7ff << 21) | (verBits << 19) | (1 << 17) | (1 << 16) |
      (brIdx << 12) | (srIdx << 10) | (padding << 9) | (mode << 6)
    val len = (if (mpeg1) 144 else 72) * kbps * 1000 / sampleRate + padding
    val buf = new Array[Byte](len)
    buf(0) = ((h >>> 24) & 0xff).toByte; buf(1) = ((h >>> 16) & 0xff).toByte
    buf(2) = ((h >>> 8) & 0xff).toByte; buf(3) = (h & 0xff).toByte
    buf
  }

  private def stream(frames: Seq[Array[Byte]]): Array[Byte] =
    frames.reduce(_ ++ _)

  test("mp3 codec: CBR stream yields true meta and a flat bitrate envelope") {
    val payload = stream(Seq.fill(10)(frame(128, 44100)))
    val f = new graft.media.Mp3Decoder(4).decode(MediaBlob("m1", "audio", payload))
    assert(f.width === 44100)      // sample rate
    assert(f.height === 1)         // mono
    assert(f.n_frames === 10 * 1152)
    assert(f.features.length === 4)
    f.features.foreach(v => assert(math.abs(v - 128.0 / 320.0) < 1e-6))
  }

  test("mp3 codec: VBR envelope rises with the per-frame bitrates, exactly") {
    val rates = Seq(64, 80, 96, 112, 128, 160, 192, 224)
    val payload = stream(rates.map(frame(_, 44100)))
    val f = new graft.media.Mp3Decoder(4).decode(MediaBlob("m2", "audio", payload))
    val expect = rates.grouped(2).map(g => g.sum / 2.0 / 320.0).toSeq
    f.features.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-6, s"envelope $got vs $e")
    }
    assert(f.features.sliding(2).forall(p => p(0) < p(1)), "envelope must rise")
  }

  test("mp3 codec: ID3v2 prefix and ID3v1 trailer are skipped; MPEG2 and stereo parse") {
    val audio = stream(Seq.fill(6)(frame(64, 24000, mono = false, mpeg1 = false)))
    // ID3v2 header: "ID3", v2.3, no flags, syncsafe size 0x0100 = 128
    val id3v2 = Array[Byte]('I', 'D', '3', 3, 0, 0, 0, 0, 1, 0) ++
      new Array[Byte](128)
    val id3v1 = Array[Byte]('T', 'A', 'G') ++ new Array[Byte](125)
    val f = new graft.media.Mp3Decoder(4)
      .decode(MediaBlob("m3", "audio", id3v2 ++ audio ++ id3v1))
    assert(f.width === 24000)
    assert(f.height === 2)
    assert(f.n_frames === 6 * 576) // MPEG2 Layer III: 576 samples/frame
  }

  test("mp3 codec: padded frames advance by the padded length") {
    val payload = stream(Seq.fill(5)(frame(128, 44100, padding = 1)))
    val f = new graft.media.Mp3Decoder(4).decode(MediaBlob("m4", "audio", payload))
    assert(f.n_frames === 5 * 1152) // mis-walking padding would lose sync
  }

  test("mp3 codec runs through the registry + partition-streamed pipeline") {
    import spark.implicits._
    val blobs = (1 to 4).map(k =>
      MediaBlob(s"a$k", "audio", stream(Seq.fill(k + 1)(frame(128, 44100)))))
    spark.conf.set(MediaFeatures.Codecs.CodecConf, "mp3")
    try {
      val feats = MediaFeatures.decodeAll(
        spark.createDataset(blobs).repartition(2), featureDim = 4)
        .collect().sortBy(_.media_id)
      assert(feats.map(_.n_frames).toSeq === Seq(2 * 1152, 3 * 1152, 4 * 1152, 5 * 1152))
      assert(feats.forall(f => f.width == 44100 && f.height == 1))
    } finally spark.conf.unset(MediaFeatures.Codecs.CodecConf)
  }

  test("mp3 codec rejects non-MPEG payloads and mid-stream desync loudly") {
    val dec = new graft.media.Mp3Decoder(4)
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("x", "audio", Array.fill[Byte](64)(9)))
    }
    // a RIFF/WAVE payload is audio but not MPEG — refuse, don't guess
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("y", "audio",
        "RIFF0000WAVEfmt ".getBytes ++ new Array[Byte](48)))
    }
    // valid first frame, then garbage that is neither a frame nor ID3v1
    intercept[IllegalArgumentException] {
      dec.decode(MediaBlob("z", "audio",
        frame(128, 44100) ++ Array.fill[Byte](32)(0x55)))
    }
  }
}
