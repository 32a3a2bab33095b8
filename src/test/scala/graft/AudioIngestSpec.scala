package graft

import graft.ingest.{AudioIngest, Http}
import org.apache.spark.sql.functions._

/** S8+K7 intent (spotify_audio_ingest.py:35-76, fixing its line-30 stub):
  * preview-url resolution with per-track fallback, binary landing,
  * pointer records, and the binaryFile scan back into a DataFrame.
  */
class AudioIngestSpec extends SparkSpec {

  private val itemWithUrl =
    """{"track":{"id":"t1","preview_url":"https://cdn/x1.mp3"}}"""
  private val itemNoUrl =
    """{"track":{"id":"t2","preview_url":null}}"""
  private val itemStillNone =
    """{"track":{"id":"t3","preview_url":null}}"""

  // non-UTF-8 leading bytes (0xFF 0xFB = mp3 frame sync) prove the
  // download path is binary-safe — a String round-trip would mangle them
  private def mp3Bytes(tag: String): Array[Byte] =
    Array(0xFF.toByte, 0xFB.toByte) ++ s"MP3BYTES-$tag".getBytes("UTF-8")

  private class StubHttp extends Http {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    def get(url: String, params: Map[String, String],
        headers: Map[String, String]): (Int, String) = {
      calls += url
      url match {
        case "https://api.spotify.com/v1/tracks/t2" =>
          (200, """{"preview_url":"https://cdn/x2.mp3"}""")
        case "https://api.spotify.com/v1/tracks/t3" =>
          (200, """{"preview_url":null}""") // still none → skip (py:57-59)
        case _ => (404, "")
      }
    }
    def getBytes(url: String, params: Map[String, String],
        headers: Map[String, String]): (Int, Array[Byte]) = {
      calls += url
      url match {
        case "https://cdn/x1.mp3" => (200, mp3Bytes("1"))
        case "https://cdn/x2.mp3" => (200, mp3Bytes("2"))
        case _ => (404, Array.empty[Byte])
      }
    }
    def postForm(url: String, form: Map[String, String],
        headers: Map[String, String]): (Int, String) = (500, "")
  }

  test("S8: item url preferred, fallback fetch on miss, skip when still none") {
    val dir = tmpDir("audio")
    val http = new StubHttp
    val pointers = new AudioIngest(http)
      .ingest(Seq(itemWithUrl, itemNoUrl, itemStillNone), "tok", dir, "2025-07-30T00:00:00Z")
    assert(pointers.map(_.track_id) === Seq("t1", "t2")) // t3 skipped
    assert(http.calls.count(_.contains("/v1/tracks/")) === 2) // only t2, t3 fall back
    // K7: bytes landed as {track_id}.mp3, bit-exact incl. non-UTF-8 bytes
    val f1 = java.nio.file.Paths.get(dir, "t1.mp3")
    assert(java.nio.file.Files.readAllBytes(f1).sameElements(mp3Bytes("1")))
    assert(pointers.forall(_.fetched_at === "2025-07-30T00:00:00Z"))
  }

  test("K7: binaryFile scan exposes blobs as binary + metadata columns") {
    val dir = tmpDir("audio2")
    new AudioIngest(new StubHttp).ingest(Seq(itemWithUrl, itemNoUrl), "tok", dir,
      "2025-07-30T00:00:00Z")
    val scan = AudioIngest.binaryScan(spark, dir)
    assert(scan.columns.toSet === Set("path", "modificationTime", "length", "content"))
    val rows = scan.orderBy(col("path")).collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Array[Byte]]("content").sameElements(mp3Bytes("1")))
    // pointer frame is Kafka-sinkable (K2 shape after to_json)
    val pf = AudioIngest.pointerFrame(spark,
      Seq(graft.ingest.AudioPointer("t1", s"$dir/t1.mp3", "2025-07-30T00:00:00Z")))
    assert(pf.columns.toSeq === Seq("track_id", "audio_path", "fetched_at"))
    val kf = graft.ingest.KafkaFrames.trackMessages(pf)
    assert(kf.head().getString(0).contains("\"track_id\":\"t1\""))
  }
}
