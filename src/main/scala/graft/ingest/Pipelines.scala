package graft.ingest

import graft.etl.Normalize
import graft.schema.Schemas
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's DAG task bodies as composable driver functions, with
  * the P4 empty-input guards: every stage *skips* (returns None / lands
  * nothing) on empty input instead of failing —
  * spotify_ingest.py:125-126, spotify_metadata_to_kafka.py:81-89,
  * spotify_artist_genres_to_kafka.py:144-158.
  */
object Pipelines {

  /** S6: read the latest landed playlist file (a single JSON array) with
    * the declared schema — one row per item. None when nothing landed
    * (P4: downstream no-ops).
    */
  def readLatestPlaylist(spark: SparkSession, rawDir: String): Option[DataFrame] =
    Landing.latestRawFile(rawDir).map { f =>
      spark.read
        .schema(Schemas.rawPlaylistItemSchema)
        .option("multiLine", true)
        .json(f.toString)
    }

  /** spotify_ingest DAG: preflight (S3) → paginate (S1) → land (K1).
    * Returns the landed path; None = skipped (preflight failed or the
    * playlist came back empty — P4).
    */
  def ingestPlaylist(client: SpotifyClient, token: String, playlistId: String,
      rawDir: String, now: java.time.Instant): Option[java.nio.file.Path] = {
    if (!client.preflight(token, playlistId)) None
    else {
      val items = client.fetchPlaylistItems(token, playlistId)
      if (items.isEmpty) None
      else Some(Landing.landRaw(items, rawDir, playlistId, now))
    }
  }

  /** spotify_metadata_to_kafka DAG: latest file (S5) → declared-schema
    * read (S6) → normalize+filter (P1/P3) → Kafka-shaped frame (K2).
    * None at any empty stage (P4).
    */
  def latestTrackMessages(spark: SparkSession, rawDir: String,
      ingestTsIso: String): Option[DataFrame] =
    readLatestPlaylist(spark, rawDir).flatMap { items =>
      val tracks = Normalize.tracksFromPlaylistItems(items, ingestTsIso)
      if (tracks.isEmpty) None else Some(KafkaFrames.trackMessages(tracks))
    }

  /** spotify_artist_genres_to_kafka DAG: latest file → distinct sorted
    * artist ids (A3) → chunked enrichment (S4) → normalize (P2) → keyed
    * frame (K3). None at any empty stage (P4).
    */
  def latestArtistMessages(spark: SparkSession, rawDir: String,
      client: SpotifyClient, token: String,
      ingestTsIso: String): Option[DataFrame] =
    readLatestPlaylist(spark, rawDir).flatMap { items =>
      import org.apache.spark.sql.functions._
      // A3: sorted(set(artist_ids)) — distinct+sort before the API fan-out
      val ids = items
        .select(explode(col("track.artists")).as("a"))
        .select(col("a.id").as("id"))
        .where(col("id").isNotNull && col("id") =!= "")
        .distinct().orderBy(col("id"))
        .collect().map(_.getString(0)).toSeq
      if (ids.isEmpty) None
      else {
        val payloads = client.fetchArtists(token, ids)
        if (payloads.isEmpty) None
        else {
          import spark.implicits._
          val raw = spark.read.schema(artistPayloadSchema).json(payloads.toDS())
          val artists = Normalize.artistsFromPayload(raw, ingestTsIso)
          if (artists.isEmpty) None else Some(KafkaFrames.artistMessages(artists))
        }
      }
    }

  /** Shape of a Spotify /v1/artists payload element — the fields P2
    * navigates (spotify_artist_genres_to_kafka.py:94-110).
    */
  val artistPayloadSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("id", StringType),
      StructField("name", StringType),
      StructField("genres", ArrayType(StringType)),
      StructField("popularity", LongType),
      StructField("followers", StructType(Seq(
        StructField("total", LongType),
      ))),
    ))
  }
}
