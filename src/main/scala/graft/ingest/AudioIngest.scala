package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One downloaded preview + its pointer record
  * (spotify_audio_ingest.py:69-76: {track_id, audio_path, fetched_at}).
  */
final case class AudioPointer(track_id: String, audio_path: String, fetched_at: String)

/** S8 + K7 — the audio preview path, implementing the *intent* of
  * spotify_audio_ingest.py (its line 30 is a broken stub in the
  * reference; the DAG as written crashes).
  *
  * S8 (py:35-59): take `preview_url` from the playlist item; if absent,
  * GET `/v1/tracks/{id}` and retry; skip the track if still none.
  * K7 (py:62-76): write the bytes to `{track_id}.mp3` and emit a pointer
  * record for the Kafka audio topic.
  *
  * Driver-side by design at reference scale (≤150 tracks/run); the
  * Spark-side surface is [[binaryScan]] (blobs as a DataFrame) and
  * [[pointerFrame]] (pointer records for the K2-style sink).
  */
final class AudioIngest(http: Http, apiBase: String = "https://api.spotify.com/v1") {

  private val mapper = new ObjectMapper()

  /** (track_id, preview_url?) from a raw playlist item JSON. */
  def previewFromItem(itemJson: String): (String, Option[String]) = {
    val t = mapper.readTree(itemJson).get("track")
    if (t == null || t.isNull) ("", None)
    else {
      val id = Option(t.get("id")).filterNot(_.isNull).map(_.asText()).getOrElse("")
      val url = Option(t.get("preview_url")).filterNot(_.isNull).map(_.asText())
        .filter(_.nonEmpty)
      (id, url)
    }
  }

  /** S8 fallback: per-track lookup when the playlist item lacks a URL. */
  def fallbackPreviewUrl(token: String, trackId: String): Option[String] = {
    val (status, body) = http.get(s"$apiBase/tracks/$trackId", Map.empty,
      Map("Authorization" -> s"Bearer $token"))
    if (status != 200) None
    else Option(mapper.readTree(body).get("preview_url"))
      .filterNot(_.isNull).map(_.asText()).filter(_.nonEmpty)
  }

  /** S8+K7: resolve → download → land `{track_id}.mp3` → pointer rows.
    * Tracks that still have no preview URL are skipped, not failed.
    */
  def ingest(items: Seq[String], token: String, audioDir: String,
      fetchedAtIso: String): Seq[AudioPointer] = {
    val dir = java.nio.file.Paths.get(audioDir)
    java.nio.file.Files.createDirectories(dir)
    items.flatMap { item =>
      val (id, fromItem) = previewFromItem(item)
      if (id.isEmpty) None
      else fromItem.orElse(fallbackPreviewUrl(token, id)).flatMap { url =>
        // binary-safe path — mp3 bodies are not UTF-8; a String
        // round-trip would replace invalid sequences and corrupt them
        val (status, body) = http.getBytes(url, Map.empty, Map.empty)
        if (status != 200) None
        else {
          val f = dir.resolve(s"$id.mp3")
          java.nio.file.Files.write(f, body)
          Some(AudioPointer(id, f.toString, fetchedAtIso))
        }
      }
    }
  }
}

object AudioIngest {

  /** Multimodal blob scan: opaque binary column + typed metadata
    * (path, length, modificationTime) via Spark's binaryFile source —
    * the table-side representation of the landed mp3 directory.
    */
  def binaryScan(spark: SparkSession, dir: String, glob: String = "*.mp3"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  /** Pointer records as a frame for the Kafka sink (K2 shape). */
  def pointerFrame(spark: SparkSession, pointers: Seq[AudioPointer]): DataFrame = {
    import spark.implicits._
    pointers.toDF()
  }
}
