package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the ravelytics data model.
  *
  * Mirrors the reference's two-schema pattern (schema-on-read raw with
  * all-String temporal fields, validated curated schema):
  * /root/reference/sql/clickhouse/001_init_spotify_tracks.sql:6-19 (curated)
  * and :26-38 (raw Kafka). The `spotify_artists` dimension DDL is absent
  * from the reference repo (002_views_techno.sql:14 reads it but 001 never
  * creates it); its schema is reconstructed from the producer record at
  * airflow/dags/spotify_artist_genres_to_kafka.py:101-108.
  */
object Schemas {

  /** Raw track record as produced to Kafka (JSONEachRow) — temporals are
    * Strings, parsed downstream (001:26-38).
    */
  val rawTrackSchema: StructType = StructType(Seq(
    StructField("ingest_ts", StringType, nullable = true),
    StructField("track_id", StringType, nullable = true),
    StructField("track_name", StringType, nullable = true),
    StructField("artists", ArrayType(StringType), nullable = true),
    StructField("artist_ids", ArrayType(StringType), nullable = true),
    StructField("album_id", StringType, nullable = true),
    StructField("album_name", StringType, nullable = true),
    StructField("release_date", StringType, nullable = true),
    StructField("popularity", IntegerType, nullable = true),
    StructField("added_at", StringType, nullable = true),
    StructField("external_url", StringType, nullable = true),
  ))

  /** Curated fact table (001:6-19). UInt8 popularity → IntegerType (Spark
    * has no unsigned types).
    */
  val trackSchema: StructType = StructType(Seq(
    StructField("ingest_ts", TimestampType, nullable = false),
    StructField("track_id", StringType, nullable = false),
    StructField("track_name", StringType, nullable = false),
    StructField("artists", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("artist_ids", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("album_id", StringType, nullable = false),
    StructField("album_name", StringType, nullable = false),
    StructField("release_date", DateType, nullable = false),
    StructField("popularity", IntegerType, nullable = false),
    StructField("added_at", TimestampType, nullable = false),
    StructField("external_url", StringType, nullable = false),
  ))

  /** Raw artist record on the artists topic
    * (spotify_artist_genres_to_kafka.py:101-108).
    */
  val rawArtistSchema: StructType = StructType(Seq(
    StructField("ingest_ts", StringType, nullable = true),
    StructField("artist_id", StringType, nullable = true),
    StructField("artist_name", StringType, nullable = true),
    StructField("genres", ArrayType(StringType), nullable = true),
    StructField("popularity", IntegerType, nullable = true),
    StructField("followers_total", LongType, nullable = true),
  ))

  /** Curated artists dimension — the reference's missing DDL, made
    * explicit (SURVEY.md §1.4).
    */
  val artistSchema: StructType = StructType(Seq(
    StructField("ingest_ts", TimestampType, nullable = false),
    StructField("artist_id", StringType, nullable = false),
    StructField("artist_name", StringType, nullable = false),
    StructField("genres", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("popularity", IntegerType, nullable = false),
    StructField("followers_total", LongType, nullable = false),
  ))

  /** Shape of a landed playlist item (subset of the Spotify payload the
    * pipeline actually navigates: spotify_metadata_to_kafka.py:30-49,
    * spotify_audio_ingest.py:35-49). Declared, never inferred.
    */
  val rawPlaylistItemSchema: StructType = StructType(Seq(
    StructField("added_at", StringType, nullable = true),
    StructField("track", StructType(Seq(
      StructField("id", StringType, nullable = true),
      StructField("name", StringType, nullable = true),
      StructField("popularity", LongType, nullable = true),
      StructField("preview_url", StringType, nullable = true),
      StructField("external_urls", StructType(Seq(
        StructField("spotify", StringType, nullable = true),
      )), nullable = true),
      StructField("album", StructType(Seq(
        StructField("id", StringType, nullable = true),
        StructField("name", StringType, nullable = true),
        StructField("release_date", StringType, nullable = true),
        StructField("release_date_precision", StringType, nullable = true),
      )), nullable = true),
      StructField("artists", ArrayType(StructType(Seq(
        StructField("id", StringType, nullable = true),
        StructField("name", StringType, nullable = true),
      ))), nullable = true),
    )), nullable = true),
  ))

  /** A landed playlist file is a JSON array of items. */
  val rawPlaylistSchema: ArrayType = ArrayType(rawPlaylistItemSchema)
}
