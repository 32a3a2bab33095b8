package graft.ingest

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable.ArrayBuffer

/** Minimal HTTP abstraction so all driver-side ingest logic (S1–S4) is
  * unit-testable offline: production wires a real client, tests wire a
  * canned-response stub. Returns (statusCode, body).
  */
trait Http {
  def get(url: String, params: Map[String, String],
      headers: Map[String, String]): (Int, String)
  def postForm(url: String, form: Map[String, String],
      headers: Map[String, String]): (Int, String)

  /** Binary-safe GET for media payloads — a String round-trip corrupts
    * any body that is not valid UTF-8 (mp3 bytes are not).
    */
  def getBytes(url: String, params: Map[String, String],
      headers: Map[String, String]): (Int, Array[Byte])
}

/** Production Http over java.net.http (JDK built-in, no extra deps). */
final class JdkHttp(timeoutSeconds: Long = 20) extends Http {
  private val client = java.net.http.HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()

  private def send(b: java.net.http.HttpRequest.Builder,
      headers: Map[String, String]): (Int, String) = {
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.timeout(java.time.Duration.ofSeconds(timeoutSeconds)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  override def getBytes(url: String, params: Map[String, String],
      headers: Map[String, String]): (Int, Array[Byte]) = {
    val full = if (params.isEmpty) url
      else url + "?" + params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(full)).GET()
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.timeout(java.time.Duration.ofSeconds(timeoutSeconds)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())
    (resp.statusCode(), resp.body())
  }

  private def enc(s: String) =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  def get(url: String, params: Map[String, String],
      headers: Map[String, String]): (Int, String) = {
    val qs = if (params.isEmpty) ""
      else params.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("?", "&", "")
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url + qs)).GET(), headers)
  }

  def postForm(url: String, form: Map[String, String],
      headers: Map[String, String]): (Int, String) = {
    val body = form.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    send(java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body)), headers)
  }
}

/** Driver-side Spotify Web API ingest (S1–S4). Pagination and batching
  * are inherently sequential driver work at this scale (150 items/run) —
  * the DataFrame boundary starts where the JSON lands.
  *
  * Reference: token fetch spotify_ingest.py:31-63 (S2); preflight
  * :65-78 (S3); paginated playlist loop :80-134 (S1); chunked artist
  * enrichment spotify_artist_genres_to_kafka.py:75-91 (S4).
  */
final class SpotifyClient(http: Http,
    apiBase: String = "https://api.spotify.com/v1",
    tokenUrl: String = "https://accounts.spotify.com/api/token") {

  private val mapper = new ObjectMapper()

  /** S2: OAuth client-credentials token; None on any failure. */
  def fetchToken(clientId: String, clientSecret: String): Option[String] = {
    val basic = java.util.Base64.getEncoder.encodeToString(
      s"$clientId:$clientSecret".getBytes("UTF-8"))
    val (status, body) = http.postForm(tokenUrl,
      Map("grant_type" -> "client_credentials"),
      Map("Authorization" -> s"Basic $basic"))
    if (status != 200) None
    else Option(mapper.readTree(body).get("access_token")).map(_.asText())
      .filter(_.nonEmpty)
  }

  private def bearer(token: String) = Map("Authorization" -> s"Bearer $token")

  /** S3: preflight — GET one item; 403/404 (gone/private playlist) means
    * "skip this run", mirroring the reference's AirflowSkipException.
    */
  def preflight(token: String, playlistId: String): Boolean = {
    val (status, _) = http.get(s"$apiBase/playlists/$playlistId/tracks",
      Map("limit" -> "1"), bearer(token))
    status != 403 && status != 404
  }

  /** S1: paginated playlist fetch — limit=100 pages, follow `next` until
    * null, accumulate raw item JSON (kept as strings: schema-on-read
    * happens in Spark, not here).
    */
  def fetchPlaylistItems(token: String, playlistId: String): Seq[String] = {
    val items = ArrayBuffer.empty[String]
    var url: Option[String] =
      Some(s"$apiBase/playlists/$playlistId/tracks?limit=100")
    var first = true
    while (url.isDefined) {
      val (status, body) =
        if (first) http.get(url.get.takeWhile(_ != '?'),
          Map("limit" -> "100"), bearer(token))
        else http.get(url.get, Map.empty, bearer(token)) // `next` embeds the query
      first = false
      if (status != 200)
        throw new RuntimeException(s"playlist fetch failed: HTTP $status")
      val root = mapper.readTree(body)
      val arr = root.get("items")
      if (arr != null && arr.isArray)
        arr.forEach((n: JsonNode) => items += mapper.writeValueAsString(n))
      url = Option(root.get("next")).filterNot(_.isNull).map(_.asText())
        .filter(_.nonEmpty)
    }
    items.toSeq
  }

  /** S4: artist enrichment in chunks of ≤50 ids per request. */
  def fetchArtists(token: String, ids: Seq[String]): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    ids.grouped(50).foreach { chunk =>
      val (status, body) = http.get(s"$apiBase/artists",
        Map("ids" -> chunk.mkString(",")), bearer(token))
      if (status != 200)
        throw new RuntimeException(s"artists fetch failed: HTTP $status")
      val arr = mapper.readTree(body).get("artists")
      if (arr != null && arr.isArray)
        arr.forEach { (n: JsonNode) =>
          if (n != null && !n.isNull) out += mapper.writeValueAsString(n)
        }
    }
    out.toSeq
  }
}
