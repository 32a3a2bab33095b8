package graft

import graft.ingest._
import org.apache.spark.sql.functions._

/** S1–S5 + K1–K4 + P4: driver-side ingest against a canned-response Http
  * stub — pagination accumulates, preflight skips, chunking is ≤50,
  * latest-file resolution by mtime, empty inputs no-op, and the
  * Kafka-shaped (key,value) frames are well-formed JSONEachRow.
  */
class IngestSpec extends SparkSpec {

  /** Http stub: url-prefix → ordered responses (pagination-aware). */
  private class StubHttp(routes: Map[String, Seq[(Int, String)]]) extends Http {
    val calls = scala.collection.mutable.ArrayBuffer.empty[String]
    private val remaining = scala.collection.mutable.Map(routes.toSeq: _*)
    private def serve(url: String): (Int, String) = {
      calls += url
      remaining.keys.find(url.startsWith).map { k =>
        val rs = remaining(k)
        if (rs.size > 1) remaining(k) = rs.tail
        rs.head
      }.getOrElse((404, "{}"))
    }
    def getBytes(url: String, params: Map[String, String],
        headers: Map[String, String]): (Int, Array[Byte]) = {
      val (s, b) = get(url, params, headers)
      (s, b.getBytes("UTF-8"))
    }
    def get(url: String, params: Map[String, String],
        headers: Map[String, String]): (Int, String) = {
      // encode params into the recorded url for assertions
      val qs = if (params.isEmpty) "" else
        params.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("?", "&", "")
      serve(url + qs)
    }
    def postForm(url: String, form: Map[String, String],
        headers: Map[String, String]): (Int, String) = serve(url)
  }

  private def item(id: String) =
    s"""{"added_at":"2025-07-18T09:27:45Z","track":{"id":"$id","name":"T$id","artists":[{"id":"a-$id","name":"A$id"}],"album":{"id":"al","name":"Al","release_date":"2024-05-01"},"popularity":7,"external_urls":{"spotify":"u"}}}"""

  test("S2: token fetch extracts access_token; None on non-200") {
    val ok = new SpotifyClient(new StubHttp(Map(
      "https://accounts.spotify.com/api/token" -> Seq((200, """{"access_token":"tok123"}""")))))
    assert(ok.fetchToken("id", "secret") === Some("tok123"))
    val bad = new SpotifyClient(new StubHttp(Map(
      "https://accounts.spotify.com/api/token" -> Seq((500, "oops")))))
    assert(bad.fetchToken("id", "secret") === None)
  }

  test("S3: preflight skips on 403/404, proceeds otherwise") {
    def client(status: Int) = new SpotifyClient(new StubHttp(Map(
      "https://api.spotify.com/v1/playlists/p1/tracks" -> Seq((status, "{}")))))
    assert(!client(403).preflight("t", "p1"))
    assert(!client(404).preflight("t", "p1"))
    assert(client(200).preflight("t", "p1"))
  }

  test("S1: pagination follows `next` until null and accumulates items") {
    val page1 = s"""{"items":[${item("t1")},${item("t2")}],"next":"https://api.spotify.com/v1/playlists/p1/tracks?offset=100&limit=100"}"""
    val page2 = s"""{"items":[${item("t3")}],"next":null}"""
    val http = new StubHttp(Map(
      "https://api.spotify.com/v1/playlists/p1/tracks" -> Seq((200, page1), (200, page2))))
    val items = new SpotifyClient(http).fetchPlaylistItems("tok", "p1")
    assert(items.size === 3)
    assert(items.head.contains("\"t1\""))
    assert(items.last.contains("\"t3\""))
    assert(http.calls.size === 2)
  }

  test("S4: artist enrichment chunks ids ≤50 per request") {
    val ids = (1 to 120).map(i => f"a$i%03d")
    def artistsBody(n: Int) =
      s"""{"artists":[${(1 to n).map(i => s"""{"id":"x$i","name":"N"}""").mkString(",")}]}"""
    val http = new StubHttp(Map(
      "https://api.spotify.com/v1/artists" ->
        Seq((200, artistsBody(50)), (200, artistsBody(50)), (200, artistsBody(20)))))
    val out = new SpotifyClient(http).fetchArtists("tok", ids)
    assert(out.size === 120)
    assert(http.calls.size === 3)
    assert(http.calls.forall(_.split(",").length <= 50))
  }

  test("K1+S5: landing writes the stamped array file; latest wins by mtime") {
    val dir = tmpDir("landing")
    val t0 = java.time.Instant.parse("2025-07-29T00:00:00Z")
    val t1 = java.time.Instant.parse("2025-07-30T00:00:00Z")
    val f0 = Landing.landRaw(Seq(item("old")), dir, "p1", t0)
    Thread.sleep(20) // distinct mtimes
    val f1 = Landing.landRaw(Seq(item("new1"), item("new2")), dir, "p1", t1)
    assert(f0.getFileName.toString === "playlist_p1_2025-07-29T000000Z.json")
    assert(Landing.latestRawFile(dir).map(_.getFileName.toString)
      === Some(f1.getFileName.toString))
    assert(Landing.latestRawFile(tmpDir("empty-landing")) === None)
    // the landed file round-trips through the declared-schema reader
    val back = Pipelines.readLatestPlaylist(spark, dir)
    assert(back.isDefined && back.get.count() === 2)
  }

  test("P4: every pipeline stage no-ops (None) on empty input") {
    val emptyDir = tmpDir("empty-raw")
    assert(Pipelines.latestTrackMessages(spark, emptyDir, "2025-07-30T00:00:00Z") === None)
    // landed file whose items all lack track ids → normalize empties → None
    Landing.landRaw(Seq("""{"added_at":"x","track":null}"""), emptyDir, "p", java.time.Instant.now())
    assert(Pipelines.latestTrackMessages(spark, emptyDir, "2025-07-30T00:00:00Z") === None)
    // preflight failure → ingest skipped, nothing landed
    val skipped = Pipelines.ingestPlaylist(
      new SpotifyClient(new StubHttp(Map(
        "https://api.spotify.com/v1/playlists/p9/tracks" -> Seq((404, "{}"))))),
      "tok", "p9", tmpDir("noland"), java.time.Instant.now())
    assert(skipped === None)
  }

  test("K2/K3: Kafka frames are JSONEachRow, keyed for artists") {
    val dir = tmpDir("landing-k")
    Landing.landRaw(Seq(item("t1"), item("t2")), dir, "p1",
      java.time.Instant.parse("2025-07-30T00:00:00Z"))
    val msgs = Pipelines.latestTrackMessages(spark, dir, "2025-07-30T00:00:00Z").get
    assert(msgs.columns.toSeq === Seq("value"))
    val parsed = spark.read.json(msgs.select("value").as[String](
      org.apache.spark.sql.Encoders.STRING))
    assert(parsed.select("track_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted === Array("t1", "t2"))

    val artistsHttp = new StubHttp(Map(
      "https://api.spotify.com/v1/artists" ->
        Seq((200, """{"artists":[{"id":"a-t1","name":" N1 ","genres":["Techno"],"popularity":9,"followers":{"total":5}},{"id":"a-t2","name":"N2","genres":[],"popularity":1,"followers":{"total":1}}]}"""))))
    val am = Pipelines.latestArtistMessages(spark, dir,
      new SpotifyClient(artistsHttp), "tok", "2025-07-30T00:00:00Z").get
    assert(am.columns.toSeq === Seq("key", "value"))
    val keys = am.select("key").as[String](org.apache.spark.sql.Encoders.STRING).collect().sorted
    assert(keys === Array("a-t1", "a-t2"))
    assert(am.filter(col("value").contains("\"artist_name\":\"N1\"")).count() === 1) // trimmed
  }

  test("K2/K3: frames satisfy the Kafka connector's binary (key, value) contract") {
    // The spark-sql-kafka sink accepts only string/binary key and value
    // columns, requires value non-null, and serializes strings as UTF-8
    // bytes. No broker exists in this sandbox (see README "Known
    // seams"), so this drives the exact serialization the connector
    // would perform and proves it round-trips.
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val dir = tmpDir("landing-bin")
    Landing.landRaw(Seq(item("t1"), item("t2")), dir, "p1",
      java.time.Instant.parse("2025-07-30T00:00:00Z"))
    val tracks = Pipelines.latestTrackMessages(spark, dir, "2025-07-30T00:00:00Z").get
    val artistsHttp = new StubHttp(Map(
      "https://api.spotify.com/v1/artists" ->
        Seq((200, """{"artists":[{"id":"a-t1","name":"N1","genres":["x"],"popularity":9,"followers":{"total":5}},{"id":"a-t2","name":"N2","genres":[],"popularity":1,"followers":{"total":1}}]}"""))))
    val artists = Pipelines.latestArtistMessages(spark, dir,
      new SpotifyClient(artistsHttp), "tok", "2025-07-30T00:00:00Z").get

    for (frame <- Seq(tracks, artists)) {
      // connector-accepted types only
      assert(frame.schema.fields.forall(f =>
        Set("key", "value", "topic", "partition", "headers")(f.name)))
      assert(frame.schema.fields.filter(f => f.name == "key" || f.name == "value")
        .forall(f => f.dataType == StringType || f.dataType == BinaryType))
      // value never null (a null value is a tombstone, not a record)
      assert(frame.filter(col("value").isNull).count() === 0)
      // the connector's cast-to-binary round-trips through UTF-8
      val bin = frame.select(col("value").cast(BinaryType).as("vb"))
      val roundTrip = bin.select(col("vb").cast(StringType).as("v"))
        .collect().map(_.getString(0)).sorted
      val original = frame.select("value")
        .collect().map(_.getString(0)).sorted
      assert(roundTrip === original)
    }
    // keyed frame: key = artist_id bytes, preserving per-artist
    // partition affinity under the connector's default partitioner
    val keys = artists.select(col("key").cast(BinaryType).cast(StringType))
      .collect().map(_.getString(0)).sorted
    assert(keys === Array("a-t1", "a-t2"))
  }

  test("K4: topic auto-create only when absent") {
    class Admin(var topics: Set[String]) extends TopicAdmin {
      var created = List.empty[(String, Int, Short)]
      def listTopics(): Set[String] = topics
      def createTopic(name: String, p: Int, r: Short): Unit = {
        created ::= ((name, p, r)); topics += name
      }
    }
    val a = new Admin(Set("existing"))
    assert(TopicAdmin.ensureTopic(a, "ravelytics.spotify.tracks"))
    assert(!TopicAdmin.ensureTopic(a, "ravelytics.spotify.tracks")) // second call: exists
    assert(!TopicAdmin.ensureTopic(a, "existing"))
    assert(a.created === List(("ravelytics.spotify.tracks", 1, 1.toShort)))
  }
}
